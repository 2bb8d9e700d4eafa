"""Stabilizer-tableau (Clifford) simulation engine.

A second simulation backend alongside the dense state-vector engine:
circuits built purely from Clifford gates (H, S, S†, the Paulis, CX, CZ,
SWAP, ...) simulate in O(n^2) *bits* of memory — thousands of qubits —
instead of O(2^n) amplitudes, via the Aaronson–Gottesman
destabilizer/stabilizer tableau (arXiv:quant-ph/0406196).

The reference (qubitrot/qubism) has no such backend; its dense engine caps
at ~13 qubits for *any* circuit (src/Qubism/QGate.hs:80,148-154). This
module gives the framework the standard "second engine" of production
simulators, designed TPU-first:

* **Bit-packed planes.** The tableau is two ``(2n, W)`` uint32 arrays
  (x- and z-bit planes, 32 qubits per word) plus a ``(2n,)`` phase vector.
  A row is the Pauli ``i^s · X^x Z^z`` with ``s`` tracked mod 4 (the
  phase convention of modern bit-sliced implementations — it reduces the
  Aaronson–Gottesman ``g`` function to one AND + popcount).
* **Gates are gather + XOR, vectorized over rows.** Any k-qubit Clifford
  prim is characterized once on the host by its conjugation action on the
  4^k Pauli patterns of its targets (a 4^k-entry lookup table); applying
  it is a per-row table gather plus bitwise scatter across the whole
  tableau — pure VPU work on the 8×128 lanes, with a whole gate chain
  jit-fused into one XLA program. Non-Clifford prims raise
  :class:`NotCliffordError` at table-build time.
* **Measurement** is ``lax.cond`` between the random branch (masked
  row-product fan against the pivot row, ``lax.population_count`` for the
  phase bookkeeping) and the deterministic branch (a masked product scan
  over the stabilizer rows); the qubit index is a traced argument so one
  compiled program serves every qubit.
* **Shot sampling** ``vmap``s independent measure-all sweeps over the
  shots axis — each lane evolves its own tableau copy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "NotCliffordError",
    "Tableau",
    "identity_tableau",
    "apply_prims",
    "affine_support",
    "measure_qubit",
    "sample_bits",
    "expectation",
    "stabilizer_strings",
    "StabilizerSim",
]


class NotCliffordError(ValueError):
    """Raised when a primitive does not normalize the Pauli group."""


# -- host-side Clifford characterization --------------------------------------

_I2 = np.eye(2, dtype=np.complex128)
_X2 = np.array([[0, 1], [1, 0]], dtype=np.complex128)
_Z2 = np.array([[1, 0], [0, -1]], dtype=np.complex128)


def _w_matrix(c: int, k: int) -> np.ndarray:
    """Dense ``X^x Z^z`` for pattern ``c`` (bit 2j = x_j, bit 2j+1 = z_j);
    factor j=0 is the MOST significant kron factor, matching the Prim
    convention targets[0] = MSB (core/gates.py:35-47)."""
    m = np.eye(1, dtype=np.complex128)
    for j in range(k):
        xj = (c >> (2 * j)) & 1
        zj = (c >> (2 * j + 1)) & 1
        f = (_X2 if xj else _I2) @ (_Z2 if zj else _I2)
        m = np.kron(m, f)
    return m


def _w_inverse(c: int, k: int) -> np.ndarray:
    """(X^x Z^z)^{-1} = Z^z X^x per factor."""
    m = np.eye(1, dtype=np.complex128)
    for j in range(k):
        xj = (c >> (2 * j)) & 1
        zj = (c >> (2 * j + 1)) & 1
        f = (_Z2 if zj else _I2) @ (_X2 if xj else _I2)
        m = np.kron(m, f)
    return m


_TABLE_CACHE: dict = {}


def clifford_tables(u: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Characterize a dense 2^k x 2^k unitary by conjugation: for each of
    the 4^k Pauli patterns ``c`` on its targets, ``U W(c) U† = i^ds W(c')``.
    Returns (tx, tz, ts) where tx[c]/tz[c] pack the k new x/z bits (bit j =
    target j) and ts[c] = ds mod 4. Raises NotCliffordError when any image
    is not a single Pauli with a unit fourth-root-of-unity coefficient."""
    u = np.asarray(u, dtype=np.complex128)
    key = (u.shape[0], u.tobytes())
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    dim = u.shape[0]
    k = dim.bit_length() - 1
    if dim != (1 << k):
        raise ValueError(f"not a 2^k x 2^k matrix: {u.shape}")
    ncfg = 4 ** k
    ws = [_w_matrix(c, k) for c in range(ncfg)]
    winv = [_w_inverse(c, k) for c in range(ncfg)]
    tx = np.zeros(ncfg, dtype=np.uint32)
    tz = np.zeros(ncfg, dtype=np.uint32)
    ts = np.zeros(ncfg, dtype=np.uint32)
    udag = u.conj().T
    if not np.allclose(u @ udag, np.eye(dim), atol=1e-8):
        raise NotCliffordError("matrix is not unitary")
    for c in range(ncfg):
        a = u @ ws[c] @ udag
        for c2 in range(ncfg):
            coef = np.trace(winv[c2] @ a) / dim
            if abs(abs(coef) - 1.0) < 1e-8 and np.allclose(a, coef * ws[c2], atol=1e-8):
                ds = int(np.round(np.angle(coef) / (np.pi / 2))) % 4
                if abs(coef - 1j ** ds) > 1e-8:
                    raise NotCliffordError(
                        f"Pauli image carries non-quarter-turn phase {coef:.6f}")
                for j in range(k):
                    tx[c] |= (((c2 >> (2 * j)) & 1) << j)
                    tz[c] |= (((c2 >> (2 * j + 1)) & 1) << j)
                ts[c] = ds
                break
        else:
            raise NotCliffordError(
                "gate does not map Paulis to Paulis under conjugation "
                "(not a Clifford unitary) — the stabilizer backend supports "
                "H, S, S†, X, Y, Z, CX, CZ, SWAP and any other gate whose "
                "matrix is Clifford; use the state-vector backend for "
                "general circuits")
    _TABLE_CACHE[key] = (tx, tz, ts)
    return tx, tz, ts


# -- the tableau --------------------------------------------------------------

def _words(n: int) -> int:
    return (n + 31) // 32


class Tableau(NamedTuple):
    """(x, z, s): two (2n, W) uint32 bit planes + (2n,) uint32 phase mod 4.
    Rows [0, n) are destabilizers, rows [n, 2n) stabilizers. A NamedTuple,
    hence already a pytree."""

    x: jax.Array
    z: jax.Array
    s: jax.Array


def identity_tableau(n: int) -> Tableau:
    """|0...0>: destabilizer i = X_i, stabilizer i = Z_i, all phases +."""
    w = _words(n)
    x = np.zeros((2 * n, w), dtype=np.uint32)
    z = np.zeros((2 * n, w), dtype=np.uint32)
    for i in range(n):
        x[i, i >> 5] |= np.uint32(1 << (i & 31))
        z[n + i, i >> 5] |= np.uint32(1 << (i & 31))
    s = np.zeros(2 * n, dtype=np.uint32)
    return Tableau(jnp.asarray(x), jnp.asarray(z), jnp.asarray(s))


# -- gate application ---------------------------------------------------------

def _apply_one(x, z, s, targets: tuple[int, ...], tx, tz, ts):
    """One table-characterized prim; targets are static Python ints."""
    idx = jnp.zeros(x.shape[0], dtype=jnp.uint32)
    for j, q in enumerate(targets):
        w, off = q >> 5, q & 31
        xb = (x[:, w] >> off) & 1
        zb = (z[:, w] >> off) & 1
        idx = idx | (xb << (2 * j)) | (zb << (2 * j + 1))
    idx = idx.astype(jnp.int32)
    nx = jnp.asarray(tx)[idx]
    nz = jnp.asarray(tz)[idx]
    s = (s + jnp.asarray(ts)[idx]) & 3
    for j, q in enumerate(targets):
        w, off = q >> 5, q & 31
        xb = (x[:, w] >> off) & 1
        zb = (z[:, w] >> off) & 1
        x = x.at[:, w].set(x[:, w] ^ ((xb ^ ((nx >> j) & 1)) << off))
        z = z.at[:, w].set(z[:, w] ^ ((zb ^ ((nz >> j) & 1)) << off))
    return x, z, s


def _prim_key(prim) -> tuple:
    return (prim.u.tobytes(), prim.u.shape, prim.targets, prim.diag)


_CHAIN_CACHE: dict = {}


_STATIC_CHAIN_MAX = 24  # short chains: unroll + fuse into one jit program


def apply_prims(tab: Tableau, prims) -> Tableau:
    """Apply a sequence of Clifford :class:`~qubism_tpu.core.gates.Prim`s.

    Short chains unroll into one fully-fused jit program (cached by gate
    content — the interpreter/REPL pattern of small repeated fragments).
    Long chains lower to ONE ``lax.scan`` over a stacked gate-table array
    (every prim promoted to a generic table-driven 2-qubit gate, chain
    padded to the next power of two): compile cost is a single program
    per (tableau shape, padded length), independent of circuit content —
    a thousand-gate chain applies in milliseconds instead of minutes of
    XLA compilation."""
    prims = tuple(prims)
    if not prims:
        return tab
    n_rows = tab.x.shape[0]
    if len(prims) > _STATIC_CHAIN_MAX and n_rows >= 4:
        packed = _pack_chain(prims, n_rows // 2)
        if packed is not None:
            return _apply_scan(tab, packed)
    return _apply_static(tab, prims)


def _apply_static(tab: Tableau, prims: tuple) -> Tableau:
    plans = [(p.targets, clifford_tables(p.dense())) for p in prims]
    key = (tab.x.shape, tuple(_prim_key(p) for p in prims))
    fn = _CHAIN_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(x, z, s):
            for targets, (tx, tz, ts) in plans:
                x, z, s = _apply_one(x, z, s, targets, tx, tz, ts)
            return x, z, s

        _CHAIN_CACHE[key] = fn
    return Tableau(*fn(tab.x, tab.z, tab.s))


_ID4 = np.eye(4, dtype=np.complex128)


def _pack_chain(prims, n: int):
    """Stack a prim chain as scan data: every gate becomes a 2-qubit
    table gate (1q prims padded with an identity partner). Returns
    (t0, t1, tx, tz, ts) int32/uint32 arrays of length next-pow2, or
    None when a prim has arity > 2 (caller falls back to the static
    path)."""
    t0s, t1s, txs, tzs, tss = [], [], [], [], []
    for p in prims:
        targets = p.targets
        if len(targets) == 1:
            q = targets[0]
            u2 = np.kron(np.eye(2, dtype=np.complex128), p.dense())
            targets = ((q + 1) % n, q)
            tx, tz, ts = clifford_tables(u2)
        elif len(targets) == 2:
            tx, tz, ts = clifford_tables(p.dense())
        else:
            return None
        t0s.append(targets[0])
        t1s.append(targets[1])
        txs.append(tx)
        tzs.append(tz)
        tss.append(ts)
    # pad with identity gates to the next power of two: one compile
    # serves every chain of that padded length
    g = 1 << (len(prims) - 1).bit_length()
    if g > len(prims):
        tx, tz, ts = clifford_tables(_ID4)
        for _ in range(g - len(prims)):
            t0s.append(0)
            t1s.append(1)
            txs.append(tx)
            tzs.append(tz)
            tss.append(ts)
    return (np.asarray(t0s, dtype=np.uint32), np.asarray(t1s, dtype=np.uint32),
            np.stack(txs), np.stack(tzs), np.stack(tss))


def _set_col_bit(mat, w, off, bits):
    """Write per-row ``bits`` into bit ``off`` of word column ``w``
    (w, off traced)."""
    col = jnp.take(mat, w, axis=1)
    cur = (col >> off) & jnp.uint32(1)
    return mat.at[:, w].set(col ^ ((cur ^ bits) << off))


@jax.jit
def _apply_scan_impl(x, z, s, t0, t1, txs, tzs, tss):
    def step(carry, inp):
        x, z, s = carry
        q0, q1, tx, tz, ts = inp
        w0, o0 = (q0 >> 5).astype(jnp.int32), q0 & 31
        w1, o1 = (q1 >> 5).astype(jnp.int32), q1 & 31
        xb0 = _row_bit(x, w0, o0)
        zb0 = _row_bit(z, w0, o0)
        xb1 = _row_bit(x, w1, o1)
        zb1 = _row_bit(z, w1, o1)
        idx = (xb0 | (zb0 << 1) | (xb1 << 2) | (zb1 << 3)).astype(jnp.int32)
        nx = tx[idx]
        nz = tz[idx]
        s = (s + ts[idx]) & 3
        x = _set_col_bit(x, w0, o0, nx & 1)
        x = _set_col_bit(x, w1, o1, (nx >> 1) & 1)
        z = _set_col_bit(z, w0, o0, nz & 1)
        z = _set_col_bit(z, w1, o1, (nz >> 1) & 1)
        return (x, z, s), None

    (x, z, s), _ = lax.scan(step, (x, z, s), (t0, t1, txs, tzs, tss))
    return x, z, s


def _apply_scan(tab: Tableau, packed) -> Tableau:
    t0, t1, txs, tzs, tss = (jnp.asarray(a) for a in packed)
    return Tableau(*_apply_scan_impl(tab.x, tab.z, tab.s, t0, t1, txs, tzs, tss))


# -- measurement --------------------------------------------------------------

def _pc_rows(words) -> jnp.ndarray:
    """popcount summed over the word axis -> (rows,) uint32."""
    return jnp.sum(lax.population_count(words), axis=-1, dtype=jnp.uint32)


def _row_bit(mat, w, off):
    """Bit ``off`` of word column ``w`` for every row (w, off traced)."""
    col = jnp.take(mat, w, axis=1)
    return (col >> off) & jnp.uint32(1)


@functools.partial(jax.jit, static_argnames=("n",))
def _measure_impl(x, z, s, q, rnd_bit, n: int):
    """Measure qubit ``q`` (traced int32) in the Z basis. ``rnd_bit`` is the
    uniform bit consumed only when the outcome is random. Returns
    (outcome, x, z, s)."""
    q = q.astype(jnp.uint32) if hasattr(q, "astype") else jnp.uint32(q)
    w = (q >> 5).astype(jnp.int32)
    off = (q & 31).astype(jnp.uint32)
    xq = _row_bit(x, w, off)                      # (2n,) x-bit at q per row
    rows = x.shape[0]
    has_random = jnp.any(xq[n:] == 1)

    def random_branch(_):
        outcome = rnd_bit.astype(jnp.uint32)
        p = n + jnp.argmax(xq[n:])
        xp = jnp.take(x, p, axis=0)
        zp = jnp.take(z, p, axis=0)
        sp = jnp.take(s, p)
        # every other row with an x-bit at q absorbs row p:
        #   row_j := row_j * row_p, s += s_p + 2*popcount(z_j & x_p)
        mask = xq & (jnp.arange(rows) != p).astype(jnp.uint32)
        cross = jnp.uint32(2) * _pc_rows(z & xp[None, :])
        s2 = (s + mask * (sp + cross)) & 3
        x2 = x ^ (mask[:, None] * xp[None, :])
        z2 = z ^ (mask[:, None] * zp[None, :])
        # the old stabilizer p becomes the destabilizer p-n ...
        x2 = x2.at[p - n].set(xp)
        z2 = z2.at[p - n].set(zp)
        s2 = s2.at[p - n].set(sp)
        # ... and row p becomes (-1)^outcome Z_q
        zq_row = jnp.zeros_like(zp).at[w].set(jnp.uint32(1) << off)
        x2 = x2.at[p].set(jnp.zeros_like(xp))
        z2 = z2.at[p].set(zq_row)
        s2 = s2.at[p].set(jnp.uint32(2) * outcome)
        return outcome, x2, z2, s2

    def det_branch(_):
        # product of the stabilizer rows selected by destabilizer x-bits;
        # stabilizers commute, so the fold order is immaterial
        def body(i, carry):
            sx, sz, ss = carry
            sel = xq[i]
            rx = jnp.take(x, n + i, axis=0)
            rz = jnp.take(z, n + i, axis=0)
            rs = jnp.take(s, n + i)
            cross = jnp.uint32(2) * jnp.sum(
                lax.population_count(sz & rx), dtype=jnp.uint32)
            ss = (ss + sel * (rs + cross)) & 3
            sx = sx ^ (sel * rx)
            sz = sz ^ (sel * rz)
            return sx, sz, ss

        sx0 = jnp.zeros_like(x[0])
        ss = lax.fori_loop(0, n, body, (sx0, sx0, jnp.uint32(0)))[2]
        outcome = (ss >> 1) & 1
        return outcome, x, z, s

    return lax.cond(has_random, random_branch, det_branch, None)


def measure_qubit(tab: Tableau, q, key, n: int):
    """Measure qubit ``q``; returns (outcome int, tableau, next key)."""
    key, sub = jax.random.split(key)
    rnd = jax.random.bernoulli(sub, 0.5)
    out, x, z, s = _measure_impl(tab.x, tab.z, tab.s, jnp.uint32(q), rnd, n)
    return int(out), Tableau(x, z, s), key


@functools.partial(jax.jit, static_argnames=("n",))
def _measure_seq_impl(x, z, s, qs, rnd_bits, n: int):
    """Measure the qubits in ``qs`` sequentially (one lax.scan, dynamic q —
    a single compiled program per (tableau shape, len(qs)) serves any qubit
    list: `measure q -> c` on a thousand-qubit register is one dispatch)."""

    def step(carry, inp):
        x, z, s = carry
        q, rb = inp
        out, x, z, s = _measure_impl(x, z, s, q, rb, n)
        return (x, z, s), out

    (x, z, s), outs = lax.scan(step, (x, z, s), (qs, rnd_bits))
    return outs, x, z, s


#: past this qubit count the mod-4 phase accumulators in the batched
#: deterministic readout (bounded by 3n^2) no longer fit f32 exactly
_DET_BATCH_MAX_N = 2048


def _unpack_words_dev(words, n: int):
    """(rows, W) uint32 -> (rows, n) float32 bit matrix, on device."""
    rows, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(rows, w * 32)[:, :n].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n",))
def _det_outcomes_impl(x, z, s, qs, n: int):
    """Batched DETERMINISTIC Z-measurement: outcomes of every qubit in
    ``qs`` at once, valid only when no listed qubit is random (checked by
    the returned flag; the tableau is unchanged either way, so the caller
    can fall back without damage).

    The sequential fold in ``_measure_impl``'s det branch accumulates
    ``s += s_i + 2*popcount(z_running & x_i)`` over the selected
    stabilizer rows. Because ``2*popcount(a XOR b) == 2*popcount(a) +
    2*popcount(b) (mod 4)``, the running-z cross terms LINEARIZE into a
    pairwise form: ``phase(q) = sel.s + 2 * sel.triu(C,1).sel`` with
    ``C[j,i] = popcount(z_j & x_i)`` over stabilizer rows — three MXU
    matmuls replace one O(n)-step sequential loop per measured qubit.
    All counts stay below 2^24, exact in f32 (guarded by
    ``_DET_BATCH_MAX_N``). Returns ``(any_random, outcomes)``."""
    w = (qs >> 5).astype(jnp.int32)
    off = (qs & 31).astype(jnp.uint32)
    cols = jnp.take(x, w, axis=1)                     # (2n, nq)
    bits = (cols >> off[None, :]) & jnp.uint32(1)
    any_random = jnp.any(bits[n:] == 1)
    sel = bits[:n].T.astype(jnp.float32)              # (nq, n) destab x@q
    zb = _unpack_words_dev(z[n:], n)                  # stabilizer bit planes
    xb = _unpack_words_dev(x[n:], n)
    c = jnp.dot(zb, xb.T, precision=lax.Precision.HIGHEST)
    cut = jnp.triu(c.astype(jnp.int32) & 3, 1).astype(jnp.float32)
    lin = jnp.dot(sel, s[n:].astype(jnp.float32),
                  precision=lax.Precision.HIGHEST)
    quad = jnp.sum(jnp.dot(sel, cut, precision=lax.Precision.HIGHEST) * sel,
                   axis=1)
    phase = (lin.astype(jnp.int32) + 2 * quad.astype(jnp.int32)) & 3
    return any_random, ((phase >> 1) & 1).astype(jnp.uint32)


@jax.jit
def _x_phase_flips_impl(z, s, qs, flips):
    """Apply the sign flips of ``X_q`` for every qubit q in ``qs`` whose
    ``flips`` bit is set, in one fused pass: X_q negates each row with a
    Z at q, so ``s += 2 * sum_q flips_q * zbit(row, q) (mod 4)``."""
    w = (qs >> 5).astype(jnp.int32)
    off = (qs & 31).astype(jnp.uint32)
    zb = (jnp.take(z, w, axis=1) >> off[None, :]) & jnp.uint32(1)  # (2n, nq)
    tot = jnp.sum(zb * flips[None, :].astype(jnp.uint32), axis=1)
    return (s + 2 * (tot & 1)) & 3


def _unpack_bits(words: np.ndarray, n: int) -> np.ndarray:
    """(rows, W) uint32 -> (rows, n) uint8 (bit q of the row = column q)."""
    rows = words.shape[0]
    if rows == 0:
        return np.zeros((0, n), dtype=np.uint8)
    b = words.view(np.uint8).reshape(rows, -1)          # little-endian bytes
    return np.unpackbits(b, axis=1, bitorder="little")[:, :n]


def affine_support(tab: Tableau, n: int) -> tuple[np.ndarray, np.ndarray]:
    """The Z-basis measurement distribution of a stabilizer state is uniform
    over an affine subspace ``{x0 XOR r.V : r in GF(2)^R}`` of basis indices.
    Extract ``(x0, V)`` — x0 a (n,) uint8 bit row, V an (R, n) uint8 basis —
    by one host-side GF(2) Gaussian elimination on the stabilizer rows:

    * rows keeping an X-pivot span the support directions (their X parts
      form V: multiplying a stabilizer ``i^s X^v Z^z`` into the state maps
      basis component ``|x>`` to ``|x XOR v>``, so the support is closed
      under every v);
    * rows eliminated to pure ``Z^z`` (phase ``i^s``, s even) constrain the
      support: ``z.x = s/2 (mod 2)``; back-substitution yields one solution
      x0.

    O(n^2) word operations once per state — then ANY number of shots is a
    single GF(2) matmul (see :func:`sample_bits`)."""
    x = np.array(tab.x)[n:]
    z = np.array(tab.z)[n:]
    s = np.array(tab.s)[n:].astype(np.uint64)
    rows = n

    def mul_into(j_mask, p):
        """Rows selected by boolean j_mask absorb row p (group product)."""
        cross = np.zeros(rows, dtype=np.uint64)
        xp = x[p]
        for w in range(x.shape[1]):
            cross += np.asarray(
                np.bitwise_count(z[:, w] & xp[w]), dtype=np.uint64)
        s[j_mask] = (s[j_mask] + s[p] + 2 * cross[j_mask]) & 3
        x[j_mask] ^= x[p]
        z[j_mask] ^= z[p]

    pivots = []            # (row, qubit) with an X-pivot
    used = np.zeros(rows, dtype=bool)
    for q in range(n):
        w, off = q >> 5, np.uint32(q & 31)
        col = (x[:, w] >> off) & 1
        cand = np.nonzero(col.astype(bool) & ~used)[0]
        if cand.size == 0:
            continue
        p = int(cand[0])
        used[p] = True
        pivots.append((p, q))
        others = col.astype(bool).copy()
        others[p] = False
        if others.any():
            mul_into(others, p)

    V = (_unpack_bits(x[[p for p, _ in pivots]], n)
         if pivots else np.zeros((0, n), dtype=np.uint8))

    # pure-Z constraint rows: z.x0 = s/2 (mod 2); solve by elimination
    zrows = np.nonzero(~used)[0]
    zb = _unpack_bits(z[zrows], n)
    assert not (s[zrows] & 1).any(), "non-Hermitian pure-Z stabilizer row"
    rhs = ((s[zrows] >> 1) & 1).astype(np.uint8)
    x0 = np.zeros(n, dtype=np.uint8)
    done_cols = np.zeros(n, dtype=bool)
    r = 0
    for q in range(n):
        hit = np.nonzero(zb[r:, q] == 1)[0]
        if hit.size == 0:
            continue
        p = r + int(hit[0])
        zb[[r, p]] = zb[[p, r]]
        rhs[[r, p]] = rhs[[p, r]]
        elim = (zb[:, q] == 1)
        elim[r] = False
        zb[elim] ^= zb[r]
        rhs[elim] ^= rhs[r]
        done_cols[q] = True
        r += 1
    # Gauss-Jordan leaves each pivot column with a single 1; with the free
    # variables fixed to 0 the pivot variables read straight off rhs
    for i in range(r):
        q = int(np.argmax(zb[i] == 1))
        x0[q] = rhs[i]
    return x0, V


@functools.partial(jax.jit, static_argnames=("shots",))
def _affine_sample_impl(x0, v, key, shots: int):
    """shots x R uniform bits, one f32 MXU matmul mod 2 (exact: 0/1 values,
    integer sums <= R < 2^24), XOR the base point."""
    r = jax.random.bernoulli(key, 0.5, (shots, v.shape[0])).astype(jnp.float32)
    prod = jnp.dot(r, v.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return (prod.astype(jnp.uint8) ^ x0[None, :]) & 1


def sample_bits(tab: Tableau, shots: int, key, n: int,
                support: tuple[np.ndarray, np.ndarray] | None = None,
                ) -> np.ndarray:
    """``shots`` independent full-register measurements, non-destructive.
    Returns (shots, n) uint8, column j = outcome of qubit j (qubit 0 = most
    significant basis bit, the engine-wide big-endian convention).

    One GF(2) elimination characterizes the distribution (``support``
    pre-computes it for reuse across calls); the shots themselves are a
    single (shots, R) x (R, n) matmul on the MXU — thousand-qubit states
    sample 8192 shots in milliseconds, where a per-shot measurement sweep
    takes minutes."""
    x0, v = affine_support(tab, n) if support is None else support
    if v.shape[0] == 0:
        return np.broadcast_to(x0, (shots, n)).copy()
    bits = _affine_sample_impl(jnp.asarray(x0), jnp.asarray(v), key, shots)
    return np.asarray(bits, dtype=np.uint8)


# -- Pauli-string expectation -------------------------------------------------

def _pack_pauli(pauli: str) -> tuple[np.ndarray, np.ndarray]:
    px = np.zeros(_words(len(pauli)), dtype=np.uint32)
    pz = np.zeros_like(px)
    for q, ch in enumerate(pauli.upper()):
        if ch in "XY":
            px[q >> 5] |= np.uint32(1 << (q & 31))
        if ch in "ZY":
            pz[q >> 5] |= np.uint32(1 << (q & 31))
        if ch not in "IXYZ":
            raise ValueError(f"bad Pauli character {ch!r}")
    return px, pz


@functools.partial(jax.jit, static_argnames=("n",))
def _expect_impl(x, z, s, px, pz, n: int):
    # anticommutes with any stabilizer -> expectation 0
    anti = (_pc_rows(x[n:] & pz[None, :]) + _pc_rows(z[n:] & px[None, :])) & 1
    undetermined = jnp.any(anti == 1)
    # otherwise P = +/- product of the stabilizers selected by the
    # destabilizers that anticommute with P
    sel = (_pc_rows(x[:n] & pz[None, :]) + _pc_rows(z[:n] & px[None, :])) & 1

    def body(i, carry):
        sx, sz, ss = carry
        rx, rz, rs = x[n + i], z[n + i], s[n + i]
        cross = jnp.uint32(2) * jnp.sum(
            lax.population_count(sz & rx), dtype=jnp.uint32)
        ss = (ss + sel[i] * (rs + cross)) & 3
        sx = sx ^ (sel[i] * rx)
        sz = sz ^ (sel[i] * rz)
        return sx, sz, ss

    sx0 = jnp.zeros_like(x[0])
    qx, qz, qs = lax.fori_loop(0, n, body, (sx0, sx0, jnp.uint32(0)))
    # Q = i^qs W(qx,qz) must equal +/- sigma(P) = +/- i^{|px&pz|} W(px,pz)
    matches = jnp.all(qx == px) & jnp.all(qz == pz)
    herm = jnp.sum(lax.population_count(px & pz), dtype=jnp.uint32)
    sign_bit = ((qs - herm) >> 1) & 1
    val = jnp.where(sign_bit == 0, 1.0, -1.0)
    return jnp.where(undetermined | ~matches, 0.0, val)


def expectation(tab: Tableau, pauli: str, n: int) -> float:
    """<P> for a Pauli string (index 0 = qubit 0). Stabilizer states only
    take values in {-1, 0, +1}."""
    if len(pauli) != n:
        raise ValueError(f"Pauli string length {len(pauli)} != n={n}")
    px, pz = _pack_pauli(pauli)
    return float(_expect_impl(tab.x, tab.z, tab.s,
                              jnp.asarray(px), jnp.asarray(pz), n))


# -- inspection ---------------------------------------------------------------

def stabilizer_strings(tab: Tableau, n: int, destabilizers: bool = False):
    """Decode rows to text like ``+XXI`` / ``-IZZ`` (for ``:dump`` and
    debugging)."""
    x = np.asarray(tab.x)
    z = np.asarray(tab.z)
    s = np.asarray(tab.s)
    lo, hi = (0, n) if destabilizers else (n, 2 * n)
    out = []
    for r in range(lo, hi):
        chars = []
        herm = 0
        for q in range(n):
            xb = (x[r, q >> 5] >> (q & 31)) & 1
            zb = (z[r, q >> 5] >> (q & 31)) & 1
            herm += int(xb & zb)
            chars.append("IXZY"[xb + 2 * zb])
        sign = "-" if ((int(s[r]) - herm) >> 1) & 1 else "+"
        out.append(sign + "".join(chars))
    return out


# -- the user-facing simulator ------------------------------------------------

class StabilizerSim:
    """Stateful Clifford simulator mirroring the Session/StateVec surface:
    ``apply`` (Gate or prim stream), ``measure_qubit``, ``reset``,
    ``sample``, ``expectation``, ``stabilizers``."""

    def __init__(self, n: int, seed: int | None = None,
                 key: jax.Array | None = None):
        self.n = n
        self.tab = identity_tableau(n)
        self.key = key if key is not None else jax.random.PRNGKey(
            0 if seed is None else seed)
        self._support = None        # cached affine_support, dropped on mutation

    def apply(self, gate_or_prims) -> "StabilizerSim":
        prims = getattr(gate_or_prims, "prims", gate_or_prims)
        self.tab = apply_prims(self.tab, prims)
        self._support = None
        return self

    def measure_qubit(self, q: int) -> int:
        out, self.tab, self.key = measure_qubit(self.tab, q, self.key, self.n)
        self._support = None
        return out

    def measure_qubits(self, qubits) -> list[int]:
        qubits = list(qubits)
        if len(qubits) <= 2:
            return [self.measure_qubit(q) for q in qubits]
        self.key, sub = jax.random.split(self.key)
        rnd = jax.random.bernoulli(sub, 0.5, (len(qubits),))
        qs = jnp.asarray(np.asarray(qubits, dtype=np.uint32))
        outs, x, z, s = _measure_seq_impl(
            self.tab.x, self.tab.z, self.tab.s, qs, rnd, self.n)
        self.tab = Tableau(x, z, s)
        self._support = None
        return [int(b) for b in np.asarray(outs)]

    def reset(self, q: int) -> None:
        """Project qubit q to |0> — the reference's renormalizing
        projection (Simulation.hs:146-156): measure with a FORCED 0
        outcome, which on a random outcome IS the projection (an
        entangled partner collapses consistently with 0, never via a
        Born draw). The formalism cannot express the zero vector a
        |1>-certain qubit would project to; that (unphysical) case
        falls back to the X flip — the physical reset."""
        out, x, z, s = _measure_impl(self.tab.x, self.tab.z, self.tab.s,
                                     jnp.uint32(q), jnp.bool_(False),
                                     self.n)
        self.tab = Tableau(x, z, s)
        self._support = None
        if int(out):
            from ..core.gates import Prim
            self.apply((Prim(_X2, (q,)),))

    def sample(self, shots: int, key=None) -> np.ndarray:
        if key is None:
            self.key, key = jax.random.split(self.key)
        if self._support is None:
            self._support = affine_support(self.tab, self.n)
        return sample_bits(self.tab, shots, key, self.n,
                           support=self._support)

    def expectation(self, pauli: str) -> float:
        return expectation(self.tab, pauli, self.n)

    def stabilizers(self) -> list[str]:
        return stabilizer_strings(self.tab, self.n)
