"""Stage timer (the reference's CPUTimer,
/root/reference/TextureTools/texturetools/utils/timer.py:14-31): context
manager / decorator printing perf_counter deltas, with an optional device
sync so device-async work is included — here ``jax.block_until_ready`` /
barrier instead of ``torch.cuda.synchronize``.

Also ``timeout`` — the host-stage hard cap the reference puts on geometry
sampling (@timeout(60), geometry/sampling/__init__.py:18): SIGALRM-based,
main-thread-only, raising TimeoutError."""

from __future__ import annotations

import functools
import signal
import threading
import time
from typing import Dict, Optional


def timeout(seconds: float):
    """Decorator: raise TimeoutError if the host-side call exceeds
    ``seconds``.  No-ops off the main thread (SIGALRM restriction)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if threading.current_thread() is not threading.main_thread():
                return fn(*args, **kwargs)

            def handler(signum, frame):
                raise TimeoutError(
                    f"{fn.__name__} exceeded {seconds}s host time cap"
                )

            old = signal.signal(signal.SIGALRM, handler)
            signal.setitimer(signal.ITIMER_REAL, seconds)
            try:
                return fn(*args, **kwargs)
            finally:
                signal.setitimer(signal.ITIMER_REAL, 0.0)
                signal.signal(signal.SIGALRM, old)

        return wrapper

    return deco


class CPUTimer:
    """with CPUTimer('stage'): ...  — or as a decorator.  Records the last
    duration in ``CPUTimer.records[name]`` for benchmarking."""

    records: Dict[str, float] = {}
    #: when True, every timed boundary drains the device queue with a host
    #: round-trip (dispatch a trivial op and fetch it).  Through the axon
    #: remote-exec tunnel ``block_until_ready``/``effects_barrier`` do NOT
    #: fence (CLAUDE.md measured facts), so async device work otherwise
    #: drains inside whichever LATER stage first touches the host — e.g.
    #: E2E_r04's 56-step denoise (~112 s) was attributed to the bake stage.
    #: Costs one ~38 ms round-trip per boundary; timing harnesses set it.
    fence: bool = False

    def __init__(self, name: str = "", sync: bool = True, verbose: bool = True):
        self.name = name
        self.sync = sync
        self.verbose = verbose

    def _sync(self):
        if self.sync:
            try:
                import jax

                jax.effects_barrier()
                if CPUTimer.fence:
                    import jax.numpy as jnp
                    import numpy as np

                    np.asarray(jnp.zeros((), jnp.float32) + 1.0)
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
