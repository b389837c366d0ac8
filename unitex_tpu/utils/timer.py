"""Stage timer (the reference's CPUTimer,
/root/reference/TextureTools/texturetools/utils/timer.py:14-31): context
manager / decorator printing perf_counter deltas, with an optional device
sync so device-async work is included — here ``jax.block_until_ready`` /
barrier instead of ``torch.cuda.synchronize``."""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional


class CPUTimer:
    """with CPUTimer('stage'): ...  — or as a decorator.  Records the last
    duration in ``CPUTimer.records[name]`` for benchmarking."""

    records: Dict[str, float] = {}

    def __init__(self, name: str = "", sync: bool = True, verbose: bool = True):
        self.name = name
        self.sync = sync
        self.verbose = verbose

    def _sync(self):
        if self.sync:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass

    def __enter__(self):
        self._sync()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sync()
        dt = time.perf_counter() - self.t0
        CPUTimer.records[self.name] = dt
        if self.verbose:
            print(f"[timer] {self.name}: {dt:.3f}s")
        return False

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with CPUTimer(self.name or fn.__name__, self.sync, self.verbose):
                return fn(*args, **kwargs)

        return wrapper
