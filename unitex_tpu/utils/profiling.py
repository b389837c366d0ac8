"""Device profiling (the tracing/observability subsystem, SURVEY.md §5).

The reference has only ad-hoc perf_counter timers (utils/timer.py) and a
peak-VRAM decorator (TSD_SR/utils/vaehook.py:431-455).  TPU-native
equivalents: jax.profiler trace capture (viewable in TensorBoard /
Perfetto), per-stage device-memory snapshots, and a ``profiled`` context
combining a trace with a wall-clock timer."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def profiled(log_dir: str, name: str = "trace") -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.effects_barrier()
        jax.profiler.stop_trace()
        print(f"[profile] {name}: {time.perf_counter() - t0:.3f}s -> {log_dir}")


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Per-device memory stats (bytes_in_use / peak_bytes_in_use / limit)
    where the backend reports them — the peak-VRAM capability of the
    reference's perfcount decorator."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit", "largest_alloc_size")
    return {k: int(stats[k]) for k in keep if k in stats}


def annotate(name: str):
    """TraceAnnotation context: names a region inside a captured trace."""
    return jax.profiler.TraceAnnotation(name)


def empty_cache(max_rounds: int = 8) -> int:
    """Free device memory held only by dead Python references — the TPU
    analog of the reference's empty_cache loop (utils/empty_cache.py: drain
    torch.cuda.memory_allocated via gc + empty_cache until stable).  XLA
    frees a buffer when its last reference drops, so the lever here is
    collecting cycles that pin jax.Arrays; loops until bytes_in_use stops
    shrinking.  Returns bytes freed (0 where the backend has no stats)."""
    import gc

    def in_use() -> int:
        s = device_memory_stats()
        return int(s.get("bytes_in_use", 0))

    start = prev = in_use()
    for _ in range(max_rounds):
        gc.collect()
        cur = in_use()
        if cur >= prev:
            break
        prev = cur
    return start - prev


def hf_snapshot_download(repo_id: str, **kwargs) -> str:
    """Fetch a HuggingFace repo snapshot (utils/hf_download.py capability),
    gated on huggingface_hub + network being available; returns the local
    path.  Offline deployments place checkpoints per WEIGHTS.md instead."""
    try:
        import huggingface_hub
    except Exception as e:  # pragma: no cover - hub ships with transformers
        raise RuntimeError(
            "huggingface_hub unavailable; fetch weights manually (WEIGHTS.md)"
        ) from e
    return huggingface_hub.snapshot_download(repo_id, **kwargs)
