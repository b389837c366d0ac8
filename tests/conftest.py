"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests (SURVEY.md §4) validate pjit layouts without TPU
hardware via ``--xla_force_host_platform_device_count=8``.  The container's
sitecustomize force-selects the axon TPU platform; we override the config
back to cpu before any backend is initialized (config is applied lazily).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


import pytest  # noqa: E402

# --- smoke tier (VERDICT r04 weak #7): a curated fast subset covering every
# subsystem's main path, for pre-commit verification in minutes instead of
# the full suite's ~70.  tests/smoke_list.txt holds one nodeid (or
# "module.py" for a whole module) per line; `pytest -m smoke` selects them.
_SMOKE_LIST = os.path.join(os.path.dirname(__file__), "smoke_list.txt")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SMOKE_LIST) as f:
            entries = {ln.strip() for ln in f
                       if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    modules = {e for e in entries if e.endswith(".py")}
    for item in items:
        nodeid = item.nodeid.split("/")[-1]  # tests/foo.py::t -> foo.py::t
        mod = nodeid.split("::")[0]
        base = nodeid.split("[")[0]  # parametrized cases inherit the mark
        if mod in modules or nodeid in entries or base in entries:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    One pytest process compiles hundreds of programs across the suite; the
    accumulated live executables eventually segfault XLA's CPU compiler
    mid-suite (observed at ~82% as a faulthandler dump inside
    backend_compile_and_load).  Per-module cache clearing bounds the
    process footprint; modules recompile their own functions anyway, so
    the runtime cost is minimal.
    """
    yield
    import jax

    jax.clear_caches()
