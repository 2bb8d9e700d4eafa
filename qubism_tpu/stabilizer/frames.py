"""Pauli-frame fast path for noisy Clifford sampling (Stim-style).

For a Clifford circuit whose only observation is a FINAL measurement,
noisy trajectories do not need one tableau per shot: conjugating a Pauli
error through the rest of the circuit is the same table lookup that
evolves tableau rows, so it suffices to propagate each trajectory's
accumulated ERROR FRAME — one Pauli, (x, z) bit pair per qubit — and
flip the clean outcomes where the final frame has an X component
(the frame technique of Gidney's Stim, arXiv:2103.02202, rebuilt here
on the engine's bit-plane scan machinery).

Cost per trajectory collapses from a full (2n, n/32)-word tableau to a
(2n)-BIT frame row: the frames of ALL trajectories form one (T, n/32)
word matrix per plane, the whole circuit is ONE ``lax.scan`` whose step
does a handful of word-column ops (the same ``_row_bit``/``_set_col_bit``
used on tableau rows — frames are rows here), and the clean outcomes are
one affine GF(2) matmul (``tableau.py:sample_bits``). 8192 noisy
1000-qubit trajectories cost megabytes instead of the ~4 GiB the vmapped
tableaux would need. Phases are irrelevant (a frame flips an outcome iff
it anticommutes with the measured Z — its sign never matters), so the
phase plane is dropped entirely.

Mid-circuit measurement / feed-forward / reset fall back to the exact
vmapped-tableau path (``stabilizer/noise.py``): a frame cannot steer a
data-dependent branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .tableau import (_apply_scan, _pack_chain, _row_bit, _set_col_bit,
                      affine_support, expectation, identity_tableau,
                      sample_bits)

__all__ = ["frame_run_vals", "frame_expectation", "frame_expectation_sum"]


def _xor_col_bit(mat, w, off, bits):
    """XOR per-row ``bits`` into bit ``off`` of word column ``w``."""
    col = jnp.take(mat, w, axis=1)
    return mat.at[:, w].set(col ^ (bits << off))


@jax.jit
def _frame_scan_impl(fx, fz, t0, t1, txs, tzs, flags, cdfs, flags2, cdfs2,
                     keys):
    """Propagate (T, W)-bit error frames through a packed gate chain,
    XOR-injecting per-step sampled Pauli noise on the flagged targets
    (1q channels per qubit; correlated dep2 draws on real 2q gates).
    Same step mechanics as tableau.py:_apply_scan_impl, with frames as
    the rows and no phase plane."""
    n_ch = cdfs.shape[0]
    n_ch2 = cdfs2.shape[0]
    ntraj = fx.shape[0]

    def step(carry, inp):
        fx, fz = carry
        q0, q1, tx, tz, fl, fl2, k = inp
        w0, o0 = (q0 >> 5).astype(jnp.int32), q0 & 31
        w1, o1 = (q1 >> 5).astype(jnp.int32), q1 & 31
        xb0 = _row_bit(fx, w0, o0)
        zb0 = _row_bit(fz, w0, o0)
        xb1 = _row_bit(fx, w1, o1)
        zb1 = _row_bit(fz, w1, o1)
        idx = (xb0 | (zb0 << 1) | (xb1 << 2) | (zb1 << 3)).astype(jnp.int32)
        nx = tx[idx]
        nz = tz[idx]
        fx = _set_col_bit(fx, w0, o0, nx & 1)
        fx = _set_col_bit(fx, w1, o1, (nx >> 1) & 1)
        fz = _set_col_bit(fz, w0, o0, nz & 1)
        fz = _set_col_bit(fz, w1, o1, (nz >> 1) & 1)
        ka, kb = jax.random.split(k)
        if n_ch:
            u = jax.random.uniform(ka, (2, n_ch, ntraj))
            for ci in range(n_ch):
                for j, (w, o) in enumerate(((w0, o0), (w1, o1))):
                    # c = #(cdf <= u) in 0..3 (I X Y Z), masked by whether
                    # this slot is a real circuit qubit
                    c = (jnp.sum((cdfs[ci, :3, None] <= u[j, ci][None, :])
                                 .astype(jnp.uint32), axis=0) * fl[j])
                    fx = _xor_col_bit(fx, w, o, (c ^ (c >> 1)) & 1)  # X, Y
                    fz = _xor_col_bit(fz, w, o, (c >> 1) & 1)        # Y, Z
        if n_ch2:
            u2 = jax.random.uniform(kb, (n_ch2, ntraj))
            for ci in range(n_ch2):
                # joint 16-outcome draw: c >> 2 on t0, c & 3 on t1
                c = (jnp.sum((cdfs2[ci, :15, None] <= u2[ci][None, :])
                             .astype(jnp.uint32), axis=0) * fl2)
                for sub, (w, o) in (((c >> 2), (w0, o0)),
                                    ((c & 3), (w1, o1))):
                    fx = _xor_col_bit(fx, w, o, (sub ^ (sub >> 1)) & 1)
                    fz = _xor_col_bit(fz, w, o, (sub >> 1) & 1)
        return (fx, fz), None

    (fx, fz), _ = lax.scan(step, (fx, fz),
                           (t0, t1, txs, tzs, flags, flags2, keys))
    return fx, fz


def _noise_flags2(prims, length: int) -> np.ndarray:
    """Per-row marker: 1 iff the packed row is a REAL 2-qubit circuit
    gate (the rows dep2-style correlated channels act on)."""
    f2 = np.zeros(length, dtype=np.uint32)
    for k, p in enumerate(prims):
        if len(p.targets) == 2:
            f2[k] = 1
    return f2


def _noise_flags(prims, length: int) -> np.ndarray:
    """Which of each packed row's (t0, t1) slots is a real circuit qubit
    (1q prims promote to a (fake, q) pair in _pack_chain; padding rows
    get none) — the mask that gates noise injection."""
    flags = np.zeros((length, 2), dtype=np.uint32)
    for k, p in enumerate(prims):
        if len(p.targets) == 1:
            flags[k, 1] = 1
        else:
            flags[k] = 1
    return flags


def _propagate(prog, prims, packed, ntraj: int, key):
    """Run the noisy frame scan: (T, W) fx/fz planes after the chain."""
    length = packed[0].shape[0]
    words = (prog.n + 31) // 32
    fx = jnp.zeros((ntraj, words), dtype=jnp.uint32)
    fz = jnp.zeros_like(fx)
    cdfs = jnp.asarray(np.asarray(prog.cdfs, dtype=np.float32)
                       .reshape(-1, 4))
    cdfs2 = jnp.asarray(np.asarray(getattr(prog, "cdfs2",
                                            np.zeros((0, 16), np.float32)),
                                   dtype=np.float32).reshape(-1, 16))
    step_keys = jax.random.split(key, length)
    return _frame_scan_impl(fx, fz, *(jnp.asarray(a) for a in packed[:4]),
                            jnp.asarray(_noise_flags(prims, length)), cdfs,
                            jnp.asarray(_noise_flags2(prims, length)), cdfs2,
                            step_keys)


def _clean_tableau(prog, prims, packed):
    tab = identity_tableau(prog.n)
    return _apply_scan(tab, packed) if prims else tab


def frame_expectation_sum(prog, prims, terms, ntraj: int, key):
    """Monte-Carlo ``<H>`` for ``terms = [(coef, pauli), ...]`` via ONE
    frame propagation: every term's per-trajectory sign is a popcount
    parity against the same (T, n/32) frame planes, so the whole
    Pauli-sum energy (term correlations included in the stderr) costs
    one scan regardless of the term count. Returns (mean, stderr) or
    None when the chain cannot be packed."""
    from .tableau import _pack_pauli, _pc_rows

    n = prog.n
    packed = _pack_chain(prims, n)
    if packed is None:
        return None
    tab = _clean_tableau(prog, prims, packed)
    cleans = [expectation(tab, pauli, n) for _, pauli in terms]
    if all(c == 0.0 for c in cleans):
        # <P> of F|psi> is +-<P> of |psi> for any Pauli frame F: still 0
        return 0.0, 0.0
    fx, fz = _propagate(prog, prims, packed, ntraj, key)
    energies = np.zeros(ntraj, dtype=np.float64)
    for (coef, pauli), clean in zip(terms, cleans):
        if clean == 0.0:
            continue
        px, pz = _pack_pauli(pauli)
        anti = np.asarray((_pc_rows(fx & jnp.asarray(pz)[None, :])
                           + _pc_rows(fz & jnp.asarray(px)[None, :])) & 1)
        energies += coef * clean * (1.0 - 2.0 * anti.astype(np.float64))
    mean = float(energies.mean())
    stderr = (float(energies.std(ddof=1) / np.sqrt(ntraj))
              if ntraj > 1 else 0.0)
    return mean, stderr


def frame_expectation(prog, prims, pauli: str, ntraj: int, key):
    """Monte-Carlo ``<P>``: the one-term case of
    :func:`frame_expectation_sum`."""
    return frame_expectation_sum(prog, prims, ((1.0, pauli),), ntraj, key)


def frame_expectations(prog, prims, paulis, ntraj: int, key):
    """Per-Pauli (mean, stderr) list for MANY strings from ONE frame
    propagation (each string's signs are independent popcount parities
    against the same planes). None when the chain cannot be packed."""
    from .tableau import _pack_pauli, _pc_rows

    n = prog.n
    packed = _pack_chain(prims, n)
    if packed is None:
        return None
    tab = _clean_tableau(prog, prims, packed)
    cleans = [expectation(tab, p, n) for p in paulis]
    if all(c == 0.0 for c in cleans):
        return [(0.0, 0.0)] * len(paulis)
    fx, fz = _propagate(prog, prims, packed, ntraj, key)
    out = []
    for pauli, clean in zip(paulis, cleans):
        if clean == 0.0:
            out.append((0.0, 0.0))
            continue
        px, pz = _pack_pauli(pauli)
        anti = np.asarray((_pc_rows(fx & jnp.asarray(pz)[None, :])
                           + _pc_rows(fz & jnp.asarray(px)[None, :])) & 1)
        signs = clean * (1.0 - 2.0 * anti.astype(np.float64))
        se = (float(signs.std(ddof=1) / np.sqrt(ntraj))
              if ntraj > 1 else 0.0)
        out.append((float(signs.mean()), se))
    return out


def frame_run_vals(prog, prims, measure_event, ntraj: int, key):
    """Run ``ntraj`` noisy trajectories of (Clifford prims -> final
    measurement) via Pauli frames. ``prog`` supplies n / cdfs / creg
    metadata (a StabilizerTrajectoryProgram). Returns the same
    creg-name -> (ntraj, size) int32 dict as ``run_vals``, or None when
    the chain cannot be packed (arity > 2: caller falls back)."""
    n = prog.n
    packed = _pack_chain(prims, n)
    if packed is None:
        return None

    # clean reference state + its measurement distribution (one GF(2)
    # elimination + one matmul for ANY number of shots)
    tab = _clean_tableau(prog, prims, packed)
    support = affine_support(tab, n)
    kf, ks = jax.random.split(key)
    clean = sample_bits(tab, ntraj, ks, n, support=support)  # (T, n) uint8

    fx, _ = _propagate(prog, prims, packed, ntraj, kf)
    fxn = np.asarray(fx)
    qs = np.arange(n)
    flips = ((fxn[:, qs >> 5] >> (qs & 31)) & 1).astype(np.uint8)
    bits = clean ^ flips                                     # (T, n)
    # readout error flips per WRITE, not per qubit: a qubit measured by
    # several merged statements gets independent reported flips (matching
    # the tableau/dense engines)
    ro = None
    if getattr(prog, "readout_p", None):
        kr = jax.random.fold_in(key, 0x0FE0)
        ro = np.asarray(jax.random.bernoulli(
            kr, prog.readout_p,
            (ntraj, len(measure_event.qubits)))).astype(np.uint8)

    vals = {c: np.zeros((ntraj, prog.creg_sizes[c]), dtype=np.int32)
            for c in prog.creg_names}
    off = 0
    for creg, bit_index, count in measure_event.writes:
        for k_, q in enumerate(measure_event.qubits[off:off + count]):
            col = bits[:, q]
            if ro is not None:
                col = col ^ ro[:, off + k_]
            if bit_index is None:
                vals[creg][:, k_] = col
            else:
                vals[creg][:, bit_index] = col
        off += count
    return vals
