"""Shot sampling from a final state.

The reference has no notion of shots (each run samples once, destructively).
For TPU-scale states we sample k shots from |psi|^2 without per-shot passes
over the 2^n amplitudes: a two-level hierarchical inverse-CDF scheme.

  1. partition the index space into 2^m chunks; compute within-chunk
     inclusive prefix sums (one pass) and the chunk-total CDF (tiny);
  2. per shot: binary-search the chunk CDF (tiny, via searchsorted), then
     binary-search inside the chosen chunk with log2(chunk) gathered probes.

Total cost: one pass over the state + O(shots * n) scalar gathers, all on
device. The chunked prefix sums also sidestep float32 precision loss that a
flat 2^30-element cumsum would suffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n", "shots"), donate_argnums=())
def sample_indices(planes, n: int, shots: int, key: jax.Array) -> jnp.ndarray:
    """Sample ``shots`` basis-state indices from an (re, im) state.
    Returns (shots,) int32."""
    re, im = planes
    p = re * re + im * im
    m = max(0, n // 2)          # 2^m chunks
    r = n - m                   # chunk size 2^r
    P = p.reshape(1 << m, 1 << r)
    L = jnp.cumsum(P, axis=1)               # within-chunk inclusive prefix sums
    totals = L[:, -1]
    C = jnp.cumsum(totals)                  # chunk CDF
    total = C[-1]

    u = jax.random.uniform(key, (shots,), dtype=jnp.float32) * total
    c = jnp.clip(jnp.searchsorted(C, u, side="right"), 0, (1 << m) - 1)
    resid = u - jnp.where(c > 0, C[jnp.maximum(c - 1, 0)], 0.0)

    # binary search for the first index with L[c, idx] > resid
    Lflat = L.reshape(-1)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = Lflat[c * (1 << r) + mid]
        go_right = resid >= v
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo = jnp.zeros((shots,), dtype=jnp.int32)
    hi = jnp.full((shots,), (1 << r) - 1, dtype=jnp.int32)
    lo, hi = jax.lax.fori_loop(0, r, body, (lo, hi))
    return (c.astype(jnp.int32) * (1 << r) + lo).astype(jnp.int32)


def sample_counts(planes, n: int, shots: int, key: jax.Array | None = None) -> dict[str, int]:
    """Sample and histogram: returns {big-endian bitstring: count}."""
    if key is None:
        key = jax.random.PRNGKey(0)
    idx = np.asarray(jax.device_get(sample_indices(planes, n, shots, key)))
    vals, counts = np.unique(idx, return_counts=True)
    return {format(int(v), f"0{n}b"): int(c) for v, c in zip(vals, counts)}
