"""Timing / profiling helpers.

TPU equivalent of the reference's manual ``torch.cuda.synchronize``
wall-clock timing (``net_panoptic_sparse.py:228-250``, ``ensembler.py:69-113``)
and memory sampling (``:297-308``): ``block_until_ready`` timers plus JAX
profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class Timer:
    """Accumulates blocking wall-clock timings per named region."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.times.setdefault(name, []).append(seconds)

    def mean(self, name: str, skip_first: bool = True) -> float:
        xs = self.times.get(name, [])
        if skip_first and len(xs) > 1:
            xs = xs[1:]
        return sum(xs) / len(xs) if xs else 0.0

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.times}


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """JAX profiler trace context (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device live memory in MiB (replaces ``torch.cuda.mem_get_info``)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = s.get("bytes_in_use", 0) / (1024 * 1024)
        except Exception:
            out[str(d)] = float("nan")
    return out


def set_random_seed(seed: int):
    """Determinism helper (reference ``torch_util.py:19-32``): numpy seeding;
    JAX randomness is already explicit via PRNG keys."""
    import numpy as np

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
