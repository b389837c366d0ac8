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
