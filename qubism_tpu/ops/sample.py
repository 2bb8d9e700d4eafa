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
def _sample_parts(planes, n: int, shots: int, key: jax.Array):
    """Sample ``shots`` basis states; returns (chunk, within-chunk) int32
    index pairs so the int64 combine can happen on the host (a single int32
    index would overflow past n=31)."""
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
    return c.astype(jnp.int32), lo.astype(jnp.int32)


#: states at or above this use the gather-based 3-level sampler: the
#: 2-level one materializes |psi|^2 AND its prefix sums (= +two state-sized
#: buffers — at n=30 the state is already half of HBM)
_BIG_SAMPLE_BITS = 27
#: leaf width of the 3-level sampler = the canonical (R, 2048) lane dim:
#: leaves ARE layout rows, so chunk masses are a plain axis-1 reduce and
#: leaf gathers index the argument directly. Any other width needs a
#: layout-changing reshape, which XLA materializes as a state-sized HLO
#: temp — at n=30 that (2 planes x 2 shards x 2 GB) OOMs the chip.
_LEAF_BITS = 11


def _rows2d(planes):
    """(re, im) as 2-D row-major views. Canonical (R, 2048) device planes
    pass through UNTOUCHED (see _LEAF_BITS note); flat planes get the same
    row-major split (cheap at the small sizes the flat path carries)."""
    re, im = planes
    if re.ndim == 2:
        return re, im
    w = min(1 << _LEAF_BITS, re.size)
    return re.reshape(-1, w), im.reshape(-1, w)


def _chunk_masses(planes, n: int):
    """Per-leaf(-row) probability masses via a FUSED square+reduce —
    |psi|^2 is never materialized (traced)."""
    re, im = _rows2d(planes)
    return jnp.sum(re * re + im * im, axis=1)


def _top_mid_search(chunk, resid, tm_bits: int):
    """Per-shot chunk selection over a (2^tm_bits,) chunk-mass vector:
    a tiny top CDF plus one gathered mid row per shot — no state-sized
    prefix sums (both the memory and the sequential-float32-cumsum
    accuracy of a flat 2^n scan are avoided). Returns (cidx, resid2)."""
    M = min(10, tm_bits)
    T = tm_bits - M
    top_cdf = jnp.cumsum(jnp.sum(chunk.reshape(1 << T, 1 << M), axis=1))

    t = jnp.clip(jnp.searchsorted(top_cdf, resid, side="right"), 0, (1 << T) - 1)
    resid = resid - jnp.where(t > 0, top_cdf[jnp.maximum(t - 1, 0)], 0.0)

    rows = chunk.reshape(1 << T, 1 << M)[t]             # (shots, 2^M)
    row_cdf = jnp.cumsum(rows, axis=1)
    mid = jnp.clip(jnp.sum(row_cdf <= resid[:, None], axis=1), 0, (1 << M) - 1)
    prev = jnp.take_along_axis(row_cdf, jnp.maximum(mid - 1, 0)[:, None],
                               axis=1)[:, 0]
    resid2 = resid - jnp.where(mid > 0, prev, 0.0)
    return (t << M) | mid, resid2


def _leaf_search(leaf_re, leaf_im, resid2):
    """Final inverse-CDF level on gathered (shots, leaf_width) leaves."""
    leaf_cdf = jnp.cumsum(leaf_re * leaf_re + leaf_im * leaf_im, axis=1)
    return jnp.clip(jnp.sum(leaf_cdf <= resid2[:, None], axis=1),
                    0, leaf_re.shape[1] - 1)


def _leaf_chunk_search(planes, chunk, resid, n: int):
    """Per-shot (chunk, leaf) inverse-CDF search within an n-qubit plane
    pair, given residual masses ``resid`` in [0, total) and precomputed
    ``chunk`` = :func:`_chunk_masses` (traced). 3-level: top/mid over the
    chunk masses, one gathered leaf row per shot."""
    re, im = _rows2d(planes)
    lane_bits = re.shape[1].bit_length() - 1
    cidx, resid2 = _top_mid_search(chunk, resid, n - lane_bits)
    leaf = _leaf_search(re[cidx], im[cidx], resid2)
    return cidx.astype(jnp.int32), leaf.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "shots"), donate_argnums=())
def _sample_parts_big(planes, n: int, shots: int, key: jax.Array):
    """3-level inverse CDF with O(2^n / 2^_LEAF_BITS) memory. Returns
    (chunk, leaf) int32 pairs with 2^_LEAF_BITS-element leaves."""
    chunk = _chunk_masses(planes, n)
    total = jnp.sum(chunk)
    u = jax.random.uniform(key, (shots,), dtype=jnp.float32) * total
    return _leaf_chunk_search(planes, chunk, u, n)


@functools.partial(jax.jit, static_argnames=("m", "shots"), donate_argnums=())
def _sample_parts_big_sharded(shard_planes, m: int, shots: int,
                              key: jax.Array):
    """3-level inverse CDF across a TUPLE of 2^v shard pairs (shard s holds
    the amplitudes whose top v bits equal s) in ONE jitted dispatch: the
    per-shard chunk masses concatenate into exactly the global chunk-mass
    vector, the top/mid search runs on that, and leaves are gathered
    per-shard with a shard-membership select. One dispatch instead of
    2^(v+1) (per-shard norms + per-shard samplers) — through a remote
    tunnel the dispatch latency dominates the sampler's compute."""
    L = _LEAF_BITS
    S = len(shard_planes)
    chunk = jnp.concatenate([_chunk_masses(p, m) for p in shard_planes])
    total = jnp.sum(chunk)
    u = jax.random.uniform(key, (shots,), dtype=jnp.float32) * total
    tm_bits = (m - L) + (S.bit_length() - 1)
    cidx, resid2 = _top_mid_search(chunk, u, tm_bits)

    rows = 1 << (m - L)                     # leaf rows per shard
    leaf_re = jnp.zeros((shots, 1 << L), dtype=jnp.float32)
    leaf_im = jnp.zeros((shots, 1 << L), dtype=jnp.float32)
    for s, planes in enumerate(shard_planes):
        re, im = _rows2d(planes)            # canonical planes: NO reshape
        local = jnp.clip(cidx - s * rows, 0, rows - 1)
        pick = (cidx // rows) == s
        leaf_re = jnp.where(pick[:, None], re[local], leaf_re)
        leaf_im = jnp.where(pick[:, None], im[local], leaf_im)
    leaf = _leaf_search(leaf_re, leaf_im, resid2)
    return cidx.astype(jnp.int32), leaf.astype(jnp.int32)


def _leaf_bits(n: int) -> int:
    return _LEAF_BITS if n >= _BIG_SAMPLE_BITS else n - max(0, n // 2)


def sample_indices_np(planes, n: int, shots: int, key: jax.Array) -> np.ndarray:
    """Sample basis-state indices; (shots,) int64 on the host (safe at any n)."""
    if n >= _BIG_SAMPLE_BITS:
        c, lo = jax.device_get(_sample_parts_big(planes, n, shots, key))
    else:
        c, lo = jax.device_get(_sample_parts(planes, n, shots, key))
    r = _leaf_bits(n)
    return (np.asarray(c).astype(np.int64) << r) | np.asarray(lo).astype(np.int64)


@functools.partial(jax.jit, static_argnames=("n", "shots"), donate_argnums=())
def sample_indices(planes, n: int, shots: int, key: jax.Array) -> jnp.ndarray:
    """Sample ``shots`` basis-state indices from an (re, im) state.
    Returns (shots,) int32 — valid for n <= 30 (use :func:`sample_indices_np`
    past that; a flat int32 index overflows at n=31)."""
    c, lo = _sample_parts(planes, n, shots, key)
    r = n - max(0, n // 2)
    return c * (1 << r) + lo


def sample_indices_sharded(shards, n: int, v: int, shots: int,
                           key: jax.Array) -> np.ndarray:
    """Sample from a virtual-sharded state (tuple of 2^v plane pairs; shard s
    holds the amplitudes whose top v bits equal s). One fused device
    dispatch when the shards are large enough for the 3-level sampler;
    small shards (CPU tests) fall back to a host-side two-level scheme.
    Returns (shots,) int64."""
    m = n - v
    if m > _LEAF_BITS:
        c, lo = jax.device_get(
            _sample_parts_big_sharded(tuple(shards), m, shots, key))
        return ((np.asarray(c).astype(np.int64) << _LEAF_BITS)
                | np.asarray(lo).astype(np.int64))

    from .measure import _norm2

    masses = np.array([float(_norm2(sh)) for sh in shards], dtype=np.float64)
    cdf = np.cumsum(masses)
    key, sub = jax.random.split(key)
    u = np.asarray(jax.device_get(jax.random.uniform(sub, (shots,)))) * cdf[-1]
    shard_of = np.searchsorted(cdf, u, side="right").clip(0, len(shards) - 1)
    out = np.zeros(shots, dtype=np.int64)
    for s in range(len(shards)):
        mine = np.nonzero(shard_of == s)[0]
        if mine.size == 0:
            continue
        key, sub = jax.random.split(key)
        # sample the full shot count (one compiled shape per (m, shots)) and
        # keep this shard's draws — recompiling per ragged count costs more
        # than the extra pass on a remote-compile backend
        loc = sample_indices_np(shards[s], m, shots, sub)
        out[mine] = (np.int64(s) << m) | loc[mine]
    return out


def sample_counts(planes, n: int, shots: int, key: jax.Array | None = None,
                  v: int = 0) -> dict[str, int]:
    """Sample and histogram: returns {big-endian bitstring: count}.
    ``planes`` is a plane pair, or a tuple of 2^v shard pairs when v > 0."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if v > 0:
        idx = sample_indices_sharded(planes, n, v, shots, key)
    else:
        idx = sample_indices_np(planes, n, shots, key)
    vals, counts = np.unique(idx, return_counts=True)
    return {format(int(v_), f"0{n}b"): int(c) for v_, c in zip(vals, counts)}
