"""Measurement, collapse and reset primitives (split-plane states).

Replaces the reference's measurement path (src/Qubism/StateVec.hs:104-137)
with on-device fused kernels and explicit, splittable JAX PRNG keys (the
reference uses an ambient global StdGen and is irreproducible). States are
(re, im) pairs of float32 (2^n,) arrays — see :mod:`qubism_tpu.ops.apply`.

The same TPU layout discipline applies: a qubit in the lane block (last 7)
is handled with a per-lane bit mask over a (rows, 128) view instead of a
reshape with a small trailing dim.

Born rule: the reference samples with ``r < sqrt(p)`` (quirk, see
SURVEY.md §2.4.2). We default to the correct ``r < p``; the quirk is
available via ``config.reference_sqrt_born``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from ..config import config
from .apply import _COL, Planes


def _lane_bits(n: int, q: int) -> np.ndarray:
    """(lanes,) int32 indicator of bit(q)==1 within the lane block."""
    lanes = 1 << min(n, _COL)
    return (((np.arange(lanes) >> (n - 1 - q)) & 1)).astype(np.int32)


def prob_one_traced(planes: Planes, q: int, n: int) -> jnp.ndarray:
    """Inside-jit Born probability that measuring qubit q yields 1."""
    b = max(n - _COL, 0)
    re, im = planes
    if q < b:
        r = re.reshape(1 << q, 2, -1)
        i = im.reshape(1 << q, 2, -1)
        return jnp.sum(r[:, 1, :] ** 2) + jnp.sum(i[:, 1, :] ** 2)
    lanes = 1 << (n - b)
    mask = jnp.asarray(_lane_bits(n, q).astype(np.float32)).reshape(1, lanes)
    r = re.reshape(-1, lanes)
    i = im.reshape(-1, lanes)
    return jnp.sum((r * r + i * i) * mask)


def collapse_traced(planes: Planes, outcome, q: int, n: int,
                    norm_reduce=lambda x: x) -> Planes:
    """Inside-jit projection of qubit q onto ``outcome`` + renormalize.
    ``norm_reduce`` lets sharded callers psum the squared norm."""
    b = max(n - _COL, 0)
    re, im = planes
    if q < b:
        r = re.reshape(1 << q, 2, -1)
        i = im.reshape(1 << q, 2, -1)
        sel = jnp.arange(2).reshape(1, 2, 1) == outcome
    else:
        lanes = 1 << (n - b)
        r = re.reshape(-1, lanes)
        i = im.reshape(-1, lanes)
        sel = jnp.asarray(_lane_bits(n, q)).reshape(1, lanes) == outcome
    mr = jnp.where(sel, r, 0)
    mi = jnp.where(sel, i, 0)
    nrm = jnp.sqrt(norm_reduce(jnp.sum(mr * mr) + jnp.sum(mi * mi)))
    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
    # preserve the caller's device layout (flat or canonical 2-D)
    return ((mr * scale).reshape(re.shape), (mi * scale).reshape(im.shape))


@functools.partial(jax.jit, static_argnames=("q", "n"))
def prob_one(planes: Planes, q: int, n: int) -> jnp.ndarray:
    """Born probability that measuring qubit q yields 1."""
    return prob_one_traced(planes, q, n)


@functools.partial(jax.jit, static_argnames=("q", "n"))
def collapse(planes: Planes, outcome: jnp.ndarray, q: int, n: int) -> Planes:
    """Project qubit q onto ``outcome`` (0/1) and renormalize.

    Mirrors reference ``collapse`` (src/Qubism/StateVec.hs:104-114): mask the
    incompatible half, then L2-normalize. A zero-norm result (projecting onto
    an impossible outcome) returns the zero vector instead of NaNs.
    """
    return collapse_traced(planes, outcome, q, n)


@functools.partial(jax.jit, static_argnames=("q", "n", "sqrt_born"))
def _measure_qubit_impl(planes, key, q: int, n: int, sqrt_born: bool):
    p1 = prob_one_traced(planes, q, n)
    threshold = jnp.sqrt(p1) if sqrt_born else p1
    key, sub = jax.random.split(key)
    r = jax.random.uniform(sub, dtype=threshold.dtype)
    outcome = (r < threshold).astype(jnp.int32)
    new_planes = collapse_traced(planes, outcome, q, n)
    return outcome, new_planes, key


def measure_qubit(planes: Planes, key: jax.Array, q: int, n: int):
    """Sample qubit q, collapse the state. Returns (outcome, planes', key')."""
    return _measure_qubit_impl(planes, key, q, n, config.reference_sqrt_born)


@functools.partial(jax.jit, static_argnames=("qubits", "n", "sqrt_born"))
def _measure_seq_impl(planes, key, qubits: tuple[int, ...], n: int,
                      sqrt_born: bool):
    outcomes = []
    for q in qubits:
        p1 = prob_one_traced(planes, q, n)
        threshold = jnp.sqrt(p1) if sqrt_born else p1
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, dtype=threshold.dtype)
        outcome = (r < threshold).astype(jnp.int32)
        planes = collapse_traced(planes, outcome, q, n)
        outcomes.append(outcome)
    return jnp.stack(outcomes), planes, key


def _marginal_table_traced(planes, n: int, measured: tuple[int, ...]):
    """~ONE state sweep reducing |a|^2 over the unmeasured qubits to a
    (2^k,) table, bit order = sorted(measured), MSB = smallest qubit
    (traced). Unmeasured ROW qubits are summed out one at a time on rank-3
    views (the trailing dim stays >= the lane block, so TPU tiling never
    pads — the first halving reads the full state, the rest are
    geometric); the lane block is then folded and reordered in ONE exact
    0/1 matmul (a rank-3 sum of a lane bit would leave a sub-128 trailing
    dim — a ~32x padding blowup)."""
    re, im = planes
    flat_r = re.reshape(-1)
    flat_i = im.reshape(-1)
    lanes = min(1 << n, 1 << _COL)
    log_c = lanes.bit_length() - 1
    row_cnt = n - log_c
    cur = flat_r * flat_r + flat_i * flat_i
    if row_cnt:
        # ONE multi-axis reduce over the unmeasured row qubits, with
        # contiguous measured/unmeasured runs GROUPED so the tensor rank
        # is the run count, not the qubit count (the reshape only
        # regroups leading dims — the lane axis stays, so TPU tiling
        # never pads). Both a per-qubit elimination chain (many HLOs)
        # and a rank-per-qubit reshape (XLA compile cost explodes with
        # rank past ~10) made programs with many marginal tables — the
        # fused MCWF groups — take minutes to compile.
        runs: list[list] = []              # [log2 size, measured?]
        for q in range(row_cnt):
            keep = q in measured
            if runs and runs[-1][1] == keep:
                runs[-1][0] += 1
            else:
                runs.append([1, keep])
        a = 1                              # kept leading size so far
        for size, keep in runs:
            if keep:
                a <<= size
            else:
                cur = (cur.reshape(a, 1 << size, -1)
                       .sum(axis=1).reshape(-1))
    mlane = [q for q in range(row_cnt, n) if q in measured]
    if log_c:
        # the 0/1 fold matrix is built from iota IN-GRAPH: as a host
        # literal it is (lanes x 2^m) floats — up to 2 MB — and a
        # program with many marginal tables (fused MCWF groups) embeds
        # tens of MB of literals, which the compiler chokes on
        c_iota = lax.iota(jnp.int32, lanes)
        j = jnp.zeros_like(c_iota)
        for q in mlane:
            j = (j << 1) | ((c_iota >> (n - 1 - q)) & 1)
        fold = (j[:, None] == lax.iota(jnp.int32, 1 << len(mlane))[None, :]
                ).astype(jnp.float32)
        cur = jnp.dot(cur.reshape(-1, lanes), fold,
                      precision=jax.lax.Precision.HIGHEST).reshape(-1)
    return cur


def _ancestral_draws_traced(table, qubits: tuple[int, ...], key,
                            sqrt_born: bool, uniforms=None):
    """The k Born draws on a (2^k,) marginal table in the GIVEN qubit
    order with the SAME key-split order and the same conditional
    probabilities as collapse-as-you-go (ancestral sampling:
    p(b_i=1 | b_<i) = mass(prefix,1)/mass(prefix); masked sums with
    host-precomputed bit tables). Returns (outcomes list, mask, key).
    ``uniforms`` (a traced (k,) vector) substitutes pre-drawn operand
    uniforms for the key splits (the fused trajectory engine's
    host-realized stream); ``key`` is then returned untouched."""
    k = len(qubits)
    srt = sorted(qubits)
    tidx = np.arange(1 << k, dtype=np.int64)
    bit1 = {q: jnp.asarray(((tidx >> (k - 1 - s)) & 1).astype(np.float32))
            for s, q in enumerate(srt)}
    outcomes = []
    mask = jnp.ones(1 << k, dtype=table.dtype)
    for i, q in enumerate(qubits):
        masked = table * mask
        tot = jnp.sum(masked)
        m1 = jnp.sum(masked * bit1[q])
        p1 = jnp.where(tot > 0, m1 / tot, 0.0)
        threshold = jnp.sqrt(p1) if sqrt_born else p1
        if uniforms is None:
            key, sub = jax.random.split(key)
            r = jax.random.uniform(sub, dtype=threshold.dtype)
        else:
            r = uniforms[i]
        o = (r < threshold).astype(jnp.int32)
        outcomes.append(o)
        of = o.astype(mask.dtype)
        mask = mask * (bit1[q] * of + (1.0 - bit1[q]) * (1.0 - of))
    return outcomes, mask, key


def _projection_rowcol_traced(outcomes, qubits: tuple[int, ...], n: int,
                              scale, dtype):
    """The joint projection indicator for measured ``qubits`` factorized
    row x lane (rank-2 ops only), scaled by ``scale`` (traced)."""
    C = min(1 << n, 1 << _COL)
    R = (1 << n) // C
    log_c = C.bit_length() - 1
    rowvec = jnp.full(R, scale, dtype=dtype)
    colvec = jnp.ones(C, dtype=dtype)
    for q, o in zip(qubits, outcomes):
        pos = n - 1 - q
        of = o.astype(dtype)
        if pos >= log_c:
            bits = jnp.asarray(
                ((np.arange(R, dtype=np.int64) >> (pos - log_c)) & 1
                 ).astype(np.float32))
            rowvec = rowvec * (bits * of + (1.0 - bits) * (1.0 - of))
        else:
            bits = jnp.asarray(
                ((np.arange(C, dtype=np.int64) >> pos) & 1
                 ).astype(np.float32))
            colvec = colvec * (bits * of + (1.0 - bits) * (1.0 - of))
    return rowvec, colvec


@functools.partial(jax.jit, static_argnames=("qubits", "n", "sqrt_born"))
def _measure_table_impl(planes, key, qubits: tuple[int, ...], n: int,
                        sqrt_born: bool):
    """Sequential measurement via the marginal probability table
    (:func:`_marginal_table_traced` + :func:`_ancestral_draws_traced` +
    one fused projection pass): ~2 sweeps total instead of 2k (reference
    semantics StateVec.hs:133-137 are distribution- AND
    stream-identical)."""
    re, im = planes
    flat_r = re.reshape(-1)
    flat_i = im.reshape(-1)
    cur = _marginal_table_traced(planes, n, qubits)
    outcomes, mask, key = _ancestral_draws_traced(cur, qubits, key, sqrt_born)

    mass = jnp.sum(cur * mask)  # the collapsed norm^2
    scale = jnp.where(mass > 0, 1.0 / jnp.sqrt(mass), 0.0)

    C = min(1 << n, 1 << _COL)
    R = (1 << n) // C
    rowvec, colvec = _projection_rowcol_traced(outcomes, qubits, n, scale,
                                               flat_r.dtype)
    ind_r = rowvec[:, None] * colvec[None, :]
    sel_r = (flat_r.reshape(R, C) * ind_r).reshape(re.shape)
    sel_i = (flat_i.reshape(R, C) * ind_r).reshape(im.shape)
    return jnp.stack(outcomes), (sel_r, sel_i), key


#: above this many qubits per event the 2^k marginal table stops paying
_MEASURE_TABLE_MAX = 16


def measure_qubits(planes: Planes, key: jax.Array, qubits: tuple[int, ...],
                   n: int):
    """Measure ``qubits`` sequentially in order (collapse-as-you-go,
    reference semantics StateVec.hs:133-137) in ONE device program — a
    whole-register measurement is one dispatch instead of two per bit,
    which dominates e.g. the Cuccaro adder through a remote tunnel. The
    key-split order matches per-qubit :func:`measure_qubit` exactly and
    each conditional Born probability is the same mass ratio, so seeded
    outcomes agree with the per-qubit path up to float32 summation order
    (an outcome can differ only when a uniform draw lands within ~1 ulp of
    a threshold). Returns (outcomes (k,), planes', key')."""
    qubits = tuple(qubits)
    if (not config.force_sequential_measure
            and len(qubits) > 0
            and len(set(qubits)) == len(qubits)):
        if len(qubits) <= _MEASURE_TABLE_MAX:
            return _measure_table_impl(planes, key, qubits, n,
                                       config.reference_sqrt_born)
        # wide measurement (e.g. a whole 28-bit register readout): chunks
        # of <= _MEASURE_TABLE_MAX qubits, each one ~2-sweep table
        # dispatch on the progressively collapsed state — the stream
        # semantics (key-split order, conditional Born masses) compose
        # exactly like the sequential path, at ~2 sweeps per 16 qubits
        # instead of 2 per qubit
        outs = []
        for i in range(0, len(qubits), _MEASURE_TABLE_MAX):
            o, planes, key = _measure_table_impl(
                planes, key, qubits[i:i + _MEASURE_TABLE_MAX], n,
                config.reference_sqrt_born)
            outs.append(o)
        return jnp.concatenate(outs), planes, key
    return _measure_seq_impl(planes, key, qubits, n,
                             config.reference_sqrt_born)


@functools.partial(jax.jit, static_argnames=("n",))
def probabilities(planes: Planes, n: int) -> jnp.ndarray:
    """|psi|^2 over the computational basis, shape (2^n,) float32."""
    re, im = planes
    return re * re + im * im


# -- virtual on-chip shards (n past the single-buffer limit) --------------------
#
# State = tuple of 2^v plane pairs; shard s holds the amplitudes whose top v
# index bits (big-endian qubits 0..v-1) equal s. This mirrors
# CompiledCircuit's virtual-shard representation (ops/fusion.py), which the
# TPU backend needs past n=29 (buffers > 2^29 f32 elements fail to compile —
# see ADVICE.md / axon constraints). Each helper is a host-driven loop of
# per-shard jits, so peak HBM stays ~state + one shard.


@jax.jit
def _norm2(planes) -> jnp.ndarray:
    re, im = planes
    return jnp.sum(re * re) + jnp.sum(im * im)


def _sel_views(planes, q: int, n: int):
    """(masked-selector, row-view-re, row-view-im) for qubit q of an n-qubit
    plane pair — shared by the masked-norm and collapse kernels."""
    b = max(n - _COL, 0)
    re, im = planes
    if q < b:
        r = re.reshape(1 << q, 2, -1)
        i = im.reshape(1 << q, 2, -1)
        bits = jnp.arange(2).reshape(1, 2, 1)
    else:
        lanes = 1 << (n - b)
        r = re.reshape(-1, lanes)
        i = im.reshape(-1, lanes)
        bits = jnp.asarray(_lane_bits(n, q)).reshape(1, lanes)
    return bits, r, i


@functools.partial(jax.jit, static_argnames=("q", "n"))
def _masked_norm2(planes, outcome, q: int, n: int) -> jnp.ndarray:
    """Squared norm of the qubit-q == outcome component."""
    bits, r, i = _sel_views(planes, q, n)
    sel = bits == outcome
    mr = jnp.where(sel, r, 0)
    mi = jnp.where(sel, i, 0)
    return jnp.sum(mr * mr) + jnp.sum(mi * mi)


@functools.partial(jax.jit, static_argnames=("q", "n"), donate_argnums=0)
def _collapse_with_scale(planes, outcome, scale, q: int, n: int) -> Planes:
    """Project qubit q onto outcome and multiply by a precomputed scale
    (the global 1/norm — shard-spanning, so it cannot be computed locally)."""
    bits, r, i = _sel_views(planes, q, n)
    sel = bits == outcome
    return ((jnp.where(sel, r, 0) * scale).reshape(planes[0].shape),
            (jnp.where(sel, i, 0) * scale).reshape(planes[1].shape))


@functools.partial(jax.jit, donate_argnums=0)
def _scale_planes(planes, scale) -> Planes:
    return (planes[0] * scale, planes[1] * scale)


def prob_one_sharded(shards, q: int, n: int, v: int) -> float:
    """Born p(1) for qubit q of a virtual-sharded state (host float)."""
    if q < v:
        return float(sum(
            _norm2(sh) for s, sh in enumerate(shards) if (s >> (v - 1 - q)) & 1
        ))
    m = n - v
    return float(sum(_masked_norm2(sh, jnp.int32(1), q - v, m) for sh in shards))


def collapse_sharded(shards, outcome: int, q: int, n: int, v: int):
    """Project qubit q of a virtual-sharded state onto outcome + renormalize.
    Donates the shard buffers (in-place in HBM)."""
    outcome = int(outcome)
    m = n - v
    if q < v:
        matches = [((s >> (v - 1 - q)) & 1) == outcome for s in range(len(shards))]
        tot = float(sum(_norm2(sh) for sh, ok in zip(shards, matches) if ok))
        scale = 0.0 if tot == 0 else 1.0 / np.sqrt(tot)
        return tuple(
            _scale_planes(sh, np.float32(scale if ok else 0.0))
            for sh, ok in zip(shards, matches)
        )
    tot = float(sum(_masked_norm2(sh, jnp.int32(outcome), q - v, m) for sh in shards))
    scale = 0.0 if tot == 0 else 1.0 / np.sqrt(tot)
    return tuple(
        _collapse_with_scale(sh, jnp.int32(outcome), np.float32(scale), q - v, m)
        for sh in shards
    )


def measure_qubit_sharded(shards, key: jax.Array, q: int, n: int, v: int):
    """Sample + collapse qubit q of a virtual-sharded state.
    Returns (outcome, shards', key')."""
    p1 = prob_one_sharded(shards, q, n, v)
    threshold = np.sqrt(p1) if config.reference_sqrt_born else p1
    key, sub = jax.random.split(key)
    outcome = int(float(jax.random.uniform(sub)) < threshold)
    return outcome, collapse_sharded(shards, outcome, q, n, v), key


# ---------------------------------------------------------------------------
# Pauli-string expectation values
# ---------------------------------------------------------------------------


def _lane_flip_matrix(C: int, fc: int) -> np.ndarray:
    """(C, C) 0/1 permutation: right-multiplying a (rows, C) plane XORs the
    lane index by ``fc`` — the lane-safe way to flip low qubits (a rank-3
    reverse there would leave a trailing dim < 128, which the TPU memory
    tiling pads ~32x). Matmul by a 0/1 matrix is exact at any precision."""
    P = np.zeros((C, C), dtype=np.float32)
    idx = np.arange(C)
    P[idx ^ fc, idx] = 1.0
    return P


def _pauli_tables(flip, signq, n: int):
    """Factored layout tables for a Pauli reduction over n qubits:
    (srow (R,), scol (C,), fc) — the +/- sign table as row x lane vectors
    and the lane-bit XOR mask for :func:`_flip_bits`. Shared by the
    single-buffer and mesh paths so the layout rules live once."""
    C = min(1 << n, 1 << _COL)
    R = (1 << n) // C
    log_c = C.bit_length() - 1
    srow = np.ones(R, dtype=np.float32)
    scol = np.ones(C, dtype=np.float32)
    for q in signq:
        pos = n - 1 - q
        if pos >= log_c:
            srow *= 1.0 - 2.0 * ((np.arange(R) >> (pos - log_c)) & 1)
        else:
            scol *= 1.0 - 2.0 * ((np.arange(C) >> pos) & 1)
    fc = 0
    for q in flip:
        pos = n - 1 - q
        if pos < log_c:
            fc |= 1 << pos
    return srow, scol, fc


def _flip_bits(x, n: int, qubits, lane_p=None):
    """b[i] = x[i ^ mask(qubits)] on a flat (2^n,) array: rank-3 reverses
    for high bits, one lane permutation matmul (``lane_p``) for low bits."""
    C = min(1 << n, 1 << _COL)
    log_c = C.bit_length() - 1
    for q in qubits:
        if n - 1 - q >= log_c:
            A = 1 << q
            x = jnp.flip(x.reshape(A, 2, -1), axis=1).reshape(-1)
    if lane_p is not None:
        x = jnp.dot(x.reshape(-1, C), lane_p,
                    precision=jax.lax.Precision.HIGHEST).reshape(-1)
    return x


def apply_pauli_traced(planes, pauli: str, n: int):
    """Inside-jit ``P |psi>`` for a Pauli string (differentiable wrt the
    state planes). P|x> = c(x)|x ^ f| with c(x) = i^{#Y} (-1)^{x.(Y|Z)},
    so (P psi)[y] = i^{#Y} s(y ^ f) psi[y ^ f] — one flip pass plus the
    factored +/- table evaluated at the flipped index (host-permuted), all
    under the lane-safe layout rules of :func:`_flip_bits`."""
    pauli = _check_pauli(pauli, n)
    flip = [q for q, c in enumerate(pauli) if c in "XY"]
    signq = [q for q, c in enumerate(pauli) if c in "YZ"]
    C = min(1 << n, 1 << _COL)
    R = (1 << n) // C
    log_c = C.bit_length() - 1
    srow, scol, fc = _pauli_tables(flip, signq, n)
    f_row = 0
    for q in flip:
        pos = n - 1 - q
        if pos >= log_c:
            f_row |= 1 << (pos - log_c)
    srow_f = jnp.asarray(srow[np.arange(R) ^ f_row])
    scol_f = jnp.asarray(scol[np.arange(C) ^ fc])
    lane_p = jnp.asarray(_lane_flip_matrix(C, fc)) if fc else None
    shape = planes[0].shape
    br = _flip_bits(planes[0].reshape(-1), n, flip, lane_p).reshape(R, C)
    bi = _flip_bits(planes[1].reshape(-1), n, flip, lane_p).reshape(R, C)
    s = srow_f[:, None] * scol_f[None, :]
    br = (br * s).reshape(shape)
    bi = (bi * s).reshape(shape)
    k = sum(1 for c in pauli if c == "Y") % 4
    if k == 0:
        return (br, bi)
    if k == 1:
        return (-bi, br)
    if k == 2:
        return (-br, -bi)
    return (bi, -br)


def apply_pauli_sum_traced(planes, terms, n: int):
    """Inside-jit ``(sum_j c_j P_j) |psi>`` (real coefficients) —
    differentiable; the adjoint-gradient path uses this for H|psi>."""
    out_r = out_i = None
    for coef, pauli in terms:
        pr, pi = apply_pauli_traced(planes, pauli, n)
        c = jnp.float32(coef)
        out_r = c * pr if out_r is None else out_r + c * pr
        out_i = c * pi if out_i is None else out_i + c * pi
    return (out_r, out_i)


@functools.lru_cache(maxsize=None)
def _expectation_pair_fn(pauli: str, n: int):
    """Jitted partial sum sum_x conj(b[x^f]) s(x) a[x] for a Pauli string
    over n qubits (one char per qubit, qubit 0 = leftmost = most
    significant index bit). P|x> = c(x)|x ^ f> with f = the X/Y bit mask
    and c(x) = i^{#Y} * (-1)^{x . (Y|Z mask)}; this computes the reduction
    WITHOUT the i^{#Y} factor, over a (possibly partner) plane pair ``b``
    — so the same kernel serves the single-buffer state (b = a) and the
    virtual-shard / mesh representations (b = the s^f partner shard)."""
    def fn(a_planes, b_planes):
        return _expectation_pair_body(pauli, n, a_planes, b_planes)

    return jax.jit(fn)


def _check_pauli(pauli: str, n: int) -> str:
    pauli = pauli.upper()
    if len(pauli) != n or any(c not in "IXYZ" for c in pauli):
        raise ValueError(f"Pauli string must be {n} chars of I/X/Y/Z: {pauli!r}")
    return pauli


def _apply_iy(tr: float, ti: float, n_y: int) -> complex:
    return complex(tr, ti) * (1j ** (n_y % 4))


def expectation_pauli(planes: Planes, n: int, pauli: str) -> float:
    """<psi|P|psi> for a Pauli string like "XZIIY" (len n; I/X/Y/Z) as ONE
    fused on-device reduction — no dense operator. Hermitian, so the
    result is real (the imaginary part is numerical noise, discarded).
    No analogue in the reference — the engine extension that makes
    VQE-style workloads one reduction instead of a measurement loop."""
    pauli = _check_pauli(pauli, n)
    tr, ti = _expectation_pair_fn(pauli, n)(planes, planes)
    n_y = sum(1 for c in pauli if c == "Y")
    return float(_apply_iy(float(tr), float(ti), n_y).real)


#: row-block height of the blocked multi-term reduction: 4096 x 2048 f32
#: blocks keep per-step temps at ~32 MB while feeding the MXU full tiles
_EXP_BLK_ROWS = 4096


def _canon_width(planes, n: int) -> int:
    """The PHYSICAL lane width the expectation program should use: the
    existing last dim of a 2-D (canonical) plane — reshaping to any other
    width is layout-changing on TPU and materializes state-sized HLO
    temps — or the canonical 2048 for flat planes."""
    x = planes[0]
    if getattr(x, "ndim", 1) == 2:
        return int(x.shape[1])
    return min(1 << n, 2048)


def _exp_masks(pauli: str, n: int, C: int):
    """(row_mask, grp_mask, lo_mask) of a Pauli string's X/Y flip bits in
    the (R, C) view: row bits, lane bits at/above the 128-wide physical
    tile (flipped by a 128-row group gather), lane bits inside it
    (flipped by a small permutation matmul)."""
    log_c = C.bit_length() - 1
    lo_w = min(7, log_c)
    row_mask = grp_mask = lo_mask = 0
    for q, c in enumerate(pauli):
        if c in "XY":
            pos = n - 1 - q
            if pos >= log_c:
                row_mask |= 1 << (pos - log_c)
            elif pos >= lo_w:
                grp_mask |= 1 << (pos - lo_w)
            else:
                lo_mask |= 1 << pos
    return row_mask, grp_mask, lo_mask


def _sign_masks(signq, n: int, C: int):
    """(row_mask, col_mask) index-bit masks of a Y/Z sign set in the
    (R, C) view — s(x) = (-1)^popcount(r & row_mask) *
    (-1)^popcount(c & col_mask)."""
    log_c = C.bit_length() - 1
    row = col = 0
    for q in signq:
        pos = n - 1 - q
        if pos >= log_c:
            row |= 1 << (pos - log_c)
        else:
            col |= 1 << pos
    return row, col


def _parity_pm1(x):
    """Elementwise (-1)^popcount(x) for int32 values (traced)."""
    for sh in (16, 8, 4, 2, 1):
        x = x ^ (x >> sh)
    return 1.0 - 2.0 * (x & 1).astype(jnp.float32)


def _sign_tables_traced(sign_masks, R: int, C: int):
    """(srow (R, k), scol (C, k)) +/-1 tables generated ON DEVICE from
    per-term (row_mask, col_mask) static ints — sign tables cost no big
    trace constants and no operand plumbing (used by the mesh path, where
    extra shard_map operands are awkward)."""
    rm = jnp.asarray([a for a, _ in sign_masks], jnp.int32)[None, :]
    cm = jnp.asarray([b for _, b in sign_masks], jnp.int32)[None, :]
    r = jax.lax.iota(jnp.int32, R)[:, None]
    c = jax.lax.iota(jnp.int32, C)[:, None]
    return _parity_pm1(r & rm), _parity_pm1(c & cm)


def _sign_tables(signq, n: int, C: int):
    """(srow (R,), scol (C,)) +/-1 tables of a Y/Z sign mask for the
    (R, C) view (like :func:`_pauli_tables` but at a caller-chosen lane
    width)."""
    R = (1 << n) // C
    log_c = C.bit_length() - 1
    srow = np.ones(R, dtype=np.float32)
    scol = np.ones(C, dtype=np.float32)
    for q in signq:
        pos = n - 1 - q
        if pos >= log_c:
            srow *= 1.0 - 2.0 * ((np.arange(R) >> (pos - log_c)) & 1)
        else:
            scol *= 1.0 - 2.0 * ((np.arange(C) >> pos) & 1)
    return srow, scol


def _flip_canon(x2d, row_mask: int, grp_mask: int, lo_p):
    """b[r, c] = x[r ^ row_mask, c ^ fc] on the physical (R, C) view:
    an XOR row gather for row bits, an XOR gather over the C/128 lane
    groups, and a (<=128)-wide permutation matmul inside the tile — NO
    layout-changing reshapes."""
    if row_mask:
        x2d = x2d[jnp.arange(x2d.shape[0]) ^ row_mask]
    if grp_mask or lo_p is not None:
        R, C = x2d.shape
        w = min(128, C)
        G = C // w
        x3 = x2d.reshape(R, G, w)
        if grp_mask:
            x3 = x3[:, jnp.arange(G) ^ grp_mask, :]
        if lo_p is not None:
            x3 = jnp.dot(x3, lo_p, precision=jax.lax.Precision.HIGHEST)
        x2d = x3.reshape(R, C)
    return x2d


def _blocked_pair_reduce(ar, ai, br, bi, srow_g, scol_g):
    """(tr, ti) per term of one flip group: a lax.scan over row blocks,
    each step one fused square/cross-product + (blk, C) @ (C, k) MXU
    matmul + sign-weighted row sum. Temps stay O(blk * C) regardless of
    the term count — the naive k-term weighted sums OOM at n >= 28.
    ``br/bi = None`` marks the diagonal (no-flip) group, where
    Im(conj(a) a) = 0 identically and b = a."""
    R, C = ar.shape
    kg = srow_g.shape[1]
    blk = min(_EXP_BLK_ROWS, R)
    steps = R // blk
    hi = jax.lax.Precision.HIGHEST
    diag = br is None

    def step(carry, xs):
        if diag:
            arb, aib, srb = xs
            pr = arb * arb + aib * aib
        else:
            arb, aib, brb, bib, srb = xs
            pr = brb * arb + bib * aib
            pi = brb * aib - bib * arb
        tr = jnp.sum(jnp.dot(pr, scol_g, precision=hi) * srb, axis=0)
        if diag:
            return (carry[0] + tr, carry[1]), None
        ti = jnp.sum(jnp.dot(pi, scol_g, precision=hi) * srb, axis=0)
        return (carry[0] + tr, carry[1] + ti), None

    xs = (ar.reshape(steps, blk, C), ai.reshape(steps, blk, C))
    if not diag:
        xs += (br.reshape(steps, blk, C), bi.reshape(steps, blk, C))
    xs += (srow_g.reshape(steps, blk, kg),)
    zero = jnp.zeros((kg,), dtype=jnp.float32)
    (tr, ti), _ = jax.lax.scan(step, (zero, zero), xs)
    return tr, ti


@functools.lru_cache(maxsize=None)
def _expectation_multi_prepared(paulis: tuple[str, ...], n: int,
                                same: bool, C: int):
    """(jit_fn, device_operands, term_order) computing the (tr, ti)
    reductions for MANY Pauli strings in ONE dispatch (the VQE/Hamiltonian
    shape). ``jit_fn(a_planes, b_planes, *operands)`` reduces
    sum_x conj(b[x^f]) s(x) a[x] per term; ``same=True`` promises b IS a
    (single-buffer state), letting no-flip groups use the diagonal
    shortcut. ``C`` is the physical lane width of the planes
    (:func:`_canon_width`). Terms group by their X/Y flip mask — each
    group shares one flip pass and one blocked MXU reduction against
    stacked +/- sign tables (passed as ARGUMENTS, not trace constants, so
    big tables don't bloat the compiled program). Coefficients and the
    i^{#Y} factors apply host-side so the compiled program depends only
    on the strings."""
    R = (1 << n) // C
    groups: dict[tuple[int, int, int], list[int]] = {}
    for j, p in enumerate(paulis):
        groups.setdefault(_exp_masks(p, n, C), []).append(j)

    glist = []
    operands: list = []
    order: list[int] = []
    for (row_mask, grp_mask, lo_mask), idxs in groups.items():
        srows, scols = [], []
        for j in idxs:
            p = paulis[j]
            signq = [q for q, c in enumerate(p) if c in "YZ"]
            srow, scol = _sign_tables(signq, n, C)
            srows.append(srow)
            scols.append(scol)
        operands.append(jnp.asarray(np.stack(srows, axis=1)))   # (R, kg)
        operands.append(jnp.asarray(np.stack(scols, axis=1)))   # (C, kg)
        has_lo = bool(lo_mask)
        if has_lo:
            operands.append(jnp.asarray(
                _lane_flip_matrix(min(128, C), lo_mask)))
        glist.append((row_mask, grp_mask, has_lo, len(idxs)))
        order.extend(idxs)

    def fn(a_planes, b_planes, *ops_args):
        ar = a_planes[0].reshape(R, C)
        ai = a_planes[1].reshape(R, C)
        xr = b_planes[0].reshape(R, C)
        xi = b_planes[1].reshape(R, C)
        it = iter(ops_args)
        trs, tis = [], []
        for row_mask, grp_mask, has_lo, _ in glist:
            srow_g = next(it)
            scol_g = next(it)
            lo_p = next(it) if has_lo else None
            if same and not (row_mask or grp_mask or has_lo):
                br = bi = None                  # diagonal shortcut (b is a)
            else:
                br = _flip_canon(xr, row_mask, grp_mask, lo_p)
                bi = _flip_canon(xi, row_mask, grp_mask, lo_p)
            tr, ti = _blocked_pair_reduce(ar, ai, br, bi, srow_g, scol_g)
            trs.append(tr)
            tis.append(ti)
        return jnp.concatenate(trs), jnp.concatenate(tis)

    return jax.jit(fn), tuple(operands), tuple(order)


def expectation_pauli_sum(planes: Planes, n: int, terms) -> float:
    """<psi| sum_j c_j P_j |psi> for a Pauli-sum Hamiltonian
    ``terms = [(coef, pauli), ...]`` in ONE device dispatch with bounded
    temps (see :func:`_expectation_multi_prepared`) — a whole diagonal
    (Ising/QAOA) Hamiltonian costs ~one streaming pass at any term count.
    Hermitian for real coefs; the imaginary residue is numerical noise,
    discarded."""
    paulis = tuple(_check_pauli(p, n) for _, p in terms)
    fn, operands, order = _expectation_multi_prepared(
        paulis, n, True, _canon_width(planes, n))
    tr, ti = (np.asarray(x)
              for x in jax.device_get(fn(planes, planes, *operands)))
    total = 0.0
    for pos, j in enumerate(order):
        p = paulis[j]
        n_y = sum(1 for c in p if c == "Y")
        total += terms[j][0] * _apply_iy(float(tr[pos]), float(ti[pos]),
                                         n_y).real
    return float(total)


def _pauli_virtual_split(pauli: str, v: int):
    """(f_virtual, sign_virtual) bit masks of a Pauli string's virtual part."""
    fv = sv = 0
    for q in range(v):
        if pauli[q] in "XY":
            fv |= 1 << (v - 1 - q)
        if pauli[q] in "YZ":
            sv |= 1 << (v - 1 - q)
    return fv, sv


def expectation_pauli_virtual(shards, n: int, v: int, pauli: str) -> float:
    """Pauli expectation over a virtual-sharded state (n > 29 on one chip):
    each shard pairs with its s ^ f_virtual partner, the virtual Y/Z bits
    contribute a per-shard scalar sign, and the local reduction reuses the
    pair kernel."""
    pauli = _check_pauli(pauli, n)
    m = n - v
    fv, sv = _pauli_virtual_split(pauli, v)
    fn = _expectation_pair_fn(pauli[v:], m)
    tr = ti = 0.0
    for s in range(len(shards)):
        pr, pi = fn(shards[s], shards[s ^ fv])
        sign = -1.0 if bin(s & sv).count("1") % 2 else 1.0
        tr += sign * float(pr)
        ti += sign * float(pi)
    n_y = sum(1 for c in pauli if c == "Y")
    return float(_apply_iy(tr, ti, n_y).real)


def _expectation_pair_body(pauli: str, n: int, a_planes, b_planes):
    """The traced reduction of :func:`_expectation_pair_fn` (shared)."""
    flip = [q for q, c in enumerate(pauli) if c in "XY"]
    signq = [q for q, c in enumerate(pauli) if c in "YZ"]
    C = min(1 << n, 1 << _COL)
    R = (1 << n) // C
    srow, scol, fc = _pauli_tables(flip, signq, n)
    srow_d = jnp.asarray(srow)
    scol_d = jnp.asarray(scol)
    lane_p = jnp.asarray(_lane_flip_matrix(C, fc)) if fc else None
    ar = a_planes[0].reshape(-1)
    ai = a_planes[1].reshape(-1)
    br = _flip_bits(b_planes[0].reshape(-1), n, flip, lane_p)
    bi = _flip_bits(b_planes[1].reshape(-1), n, flip, lane_p)
    prod_r = (br * ar + bi * ai).reshape(R, C)   # Re(conj(b) a)
    prod_i = (br * ai - bi * ar).reshape(R, C)   # Im(conj(b) a)
    s = srow_d[:, None] * scol_d[None, :]
    return jnp.sum(prod_r * s), jnp.sum(prod_i * s)


def expectation_pauli_sum_virtual(shards, n: int, v: int, terms) -> float:
    """Pauli-sum Hamiltonian over a virtual-sharded state: dispatch count
    scales with the SHARD-PAIR groups, not with the term count — all
    strings sharing a partner mask reduce in one jitted program per
    shard."""
    paulis = tuple(_check_pauli(p, n) for _, p in terms)
    m = n - v
    # group terms by their virtual flip mask (same partner pairing)
    by_fv: dict[int, list[int]] = {}
    for j, p in enumerate(paulis):
        fv, _ = _pauli_virtual_split(p, v)
        by_fv.setdefault(fv, []).append(j)
    totals = [0.0 + 0.0j] * len(terms)
    for fv, idxs in by_fv.items():
        locals_ = tuple(paulis[j][v:] for j in idxs)
        fn, operands, order = _expectation_multi_prepared(
            locals_, m, fv == 0, _canon_width(shards[0], m))
        for s in range(len(shards)):
            tr, ti = (np.asarray(x) for x in jax.device_get(
                fn(shards[s], shards[s ^ fv], *operands)))
            for row, pos in enumerate(order):
                j = idxs[pos]
                _, sv_mask = _pauli_virtual_split(paulis[j], v)
                sign = -1.0 if bin(s & sv_mask).count("1") % 2 else 1.0
                totals[j] += sign * complex(float(tr[row]), float(ti[row]))
    energy = 0.0
    for (coef, _), p, t in zip(terms, paulis, totals):
        n_y = sum(1 for c in p if c == "Y")
        energy += coef * (t * (1j ** (n_y % 4))).real
    return float(energy)
