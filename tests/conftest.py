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
