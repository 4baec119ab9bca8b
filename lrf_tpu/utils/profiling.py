"""Tracing and device-time benchmarking.

The reference's entire observability story is a pyinstrument wall-clock wrap
(`lrf/utils/misc.py:90-100` in pashtari/lrf). The TPU-native replacements
(SURVEY.md §5):

- `trace(...)`: context manager around `jax.profiler` emitting a TensorBoard
  / xprof trace directory for kernel-level inspection;
- `device_benchmark(fn, *args)`: compile-excluded, `block_until_ready`-fenced
  timing with warmup and repeats, reporting ms and Mpixels/s;
- `annotate(name)`: `jax.profiler.TraceAnnotation` passthrough for labeling
  host-side stages inside traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np

__all__ = ["trace", "annotate", "device_benchmark"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lrf_tpu_trace", host_tracer_level: int = 2):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def device_benchmark(
    fn: Callable,
    *args,
    warmup: int = 2,
    repeats: int = 10,
    pixels: Optional[int] = None,
):
    """Time `fn(*args)` on device: warmup (includes compile), then fenced
    repeats. Returns a dict with mean/std ms and optional Mpixel/s."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    out = {
        "mean_ms": float(times.mean() * 1e3),
        "std_ms": float(times.std() * 1e3),
        "min_ms": float(times.min() * 1e3),
    }
    if pixels is not None:
        out["mpixels_per_s"] = float(pixels / times.mean() / 1e6)
    return out
