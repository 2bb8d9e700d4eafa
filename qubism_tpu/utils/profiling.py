"""Profiling and timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5). Here:
``trace(...)`` wraps ``jax.profiler`` for Perfetto/XProf dumps, and
``timed_passes`` measures fused-pass throughput against HBM speed-of-light
— the project's headline metric.
"""

from __future__ import annotations

import contextlib
import sys
import time

import jax

#: set by the CLI's --verbose flag: per-event/per-layer timing to stderr
VERBOSE = False


def vlog(msg: str):
    if VERBOSE:
        print(f"[qubism] {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def vtimed(label: str, sync=None):
    """Time a block when VERBOSE; ``sync()`` forces device completion first
    (timing through an async remote dispatch queue is meaningless without a
    readback)."""
    if not VERBOSE:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            sync()
        vlog(f"{label}: {(time.perf_counter() - t0) * 1e3:.1f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 5, warmup: int = 1):
    """Wall-clock a device function with block_until_ready. Returns seconds."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def hbm_fraction(n_qubits: int, passes: int, seconds: float, peak_bw: float = 819e9) -> float:
    """Fraction of HBM speed-of-light achieved by ``passes`` full
    read+write sweeps of a planar-f32 2^n state in ``seconds``."""
    bytes_per_pass = 2 * 8 * (1 << n_qubits)
    return passes * bytes_per_pass / seconds / peak_bw
