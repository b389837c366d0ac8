from .timer import CPUTimer
from .image_io import load_image, save_image, to_uint8, from_uint8
from .color import parse_color


def enable_compilation_cache(path: str = "/tmp/unitex_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache.

    TPU compiles of the big graphs (binned rasterizer, MMDiT scan) take
    minutes each through a remote-compile service; the on-disk cache makes
    them one-time per machine instead of one-time per process.  CPU-only
    sessions skip it (XLA:CPU AOT reload is machine-feature sensitive and
    CPU compiles are fast anyway)."""
    import jax

    if jax.default_backend() == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
