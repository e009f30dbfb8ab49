"""Benchmark/timing utilities.

The reference never timed itself (SURVEY.md section 6: no cudaEvent/chrono
anywhere); the BASELINE metric is paths/sec/chip, so timing is a first-class
subsystem here: warm-up (compile), best-of-N wall clock with
``block_until_ready``, and an optional ``jax.profiler`` trace capture.
"""

from __future__ import annotations

import dataclasses
import time
from contextlib import contextmanager
from typing import Callable, Optional

import jax

__all__ = ["BenchResult", "time_fn", "profile_trace"]


@dataclasses.dataclass(frozen=True)
class BenchResult:
    best_s: float
    mean_s: float
    reps: int
    work: Optional[float] = None     # e.g. paths or path-steps per call

    @property
    def throughput(self) -> Optional[float]:
        return None if self.work is None else self.work / self.best_s

    def __str__(self):
        s = f"best {self.best_s*1e3:.3f} ms / mean {self.mean_s*1e3:.3f} ms"
        if self.work is not None:
            s += f" -> {self.throughput:,.0f} units/sec"
        return s


def time_fn(fn: Callable, *, reps: int = 10, warmup: int = 1,
            work: Optional[float] = None) -> BenchResult:
    """Best-of-reps wall time of ``fn()`` (must return a JAX array or
    pytree).

    Synchronizes by FETCHING a value from every leaf, not
    block_until_ready: remote-tunnel TPU runtimes (axon) return from
    block_until_ready before the device finishes, so only a device->host
    copy is a true sync.  Note the fetch itself can cost ~30 ms through a
    tunnel — for microsecond-scale kernels use the T(K)-T(1) differential
    of bench.py's `kernel_seconds` instead.
    """
    import numpy as np

    def run():
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                np.asarray(leaf)  # true sync: device->host copy
        return out

    for _ in range(warmup):
        run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return BenchResult(best_s=min(times), mean_s=sum(times) / len(times),
                       reps=reps, work=work)


@contextmanager
def profile_trace(logdir: str):
    """Capture a ``jax.profiler`` trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
