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

Mid-circuit **measurement and reset** also run on frames (the full
Stim frame-simulator semantics, arXiv:2103.02202 §4): a measure row
reads the frame's X bit (the trajectory's outcome = clean outcome XOR
that bit) and then XORs a fresh random bit into the frame's Z component
— the collapse destroys the coherence the Z part tracked, and the
randomization is exactly what makes frame sampling produce the correct
joint distribution when the clean circuit's outcomes are themselves
random; a reset row clears the X component and randomizes Z (the new
|0> carries no error, and its phase reference is fresh). The clean
reference record comes from ONE exact tableau simulation. This is the
r-round QEC-memory workload: measure-and-reset syndrome extraction at
1000+ qubits never touches the vmapped-tableau fallback. Only
feed-forward (``if``) still needs exact per-trajectory tableaux — a
frame cannot steer a data-dependent branch.

One semantic caveat: frame reset uses the physical measure-discard-
reprepare semantics (Stim's ``R``). The exact engines implement the
reference's projection-to-|0> reset (renormalizing, no Born draw —
src/Qubism/QASM/Simulation.hs:146-156). The two agree whenever the
reset qubit was just measured (every QEC round) or holds a definite
computational value; programs that reset a superposed/entangled qubit
directly take the exact vmapped path for reference fidelity
(``noise.py`` gates eligibility on that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .tableau import (_apply_scan, _pack_chain, _row_bit, _set_col_bit,
                      affine_support, expectation, identity_tableau,
                      sample_bits)

__all__ = ["frame_run_vals", "frame_run_vals_events", "frame_expectation",
           "frame_expectation_sum"]


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


# ---------------------------------------------------------------------------
# Mid-circuit measurement / reset on frames (Stim frame-simulator semantics)
# ---------------------------------------------------------------------------

#: interleaved-tape opcodes: gate row / measure row / reset row / padding
#: / QUIET gate row (statically noise-free: skips the per-row RNG, which
#: otherwise dominates — a QEC round's syndrome-extraction CXs are ~75%
#: of the tape and carry no channel flags)
_FOP_GATE, _FOP_MEASURE, _FOP_RESET, _FOP_NOP, _FOP_GATEQ = 0, 1, 2, 3, 4


def _pack_frame_tape(events, n: int, identity_noise_only: bool = False):
    """Walk EvGates/EvMeasure/EvReset events into ONE interleaved tape:
    gate rows carry Clifford tables exactly like ``_pack_chain``; each
    measured/reset qubit gets its own row. Returns ``(codes, t0, t1,
    txs, tzs, flags, flags2, meas_rows)`` (numpy, padded to the next
    power of two with NOPs) or None when a gate has arity > 2.
    ``meas_rows`` lists the measurement rows' tape indices in program
    order (one per measured qubit). ``identity_noise_only`` restricts
    noise injection to 1q IDENTITY gate rows — the phenomenological
    noise model of models/qec.py, where explicit id prims mark the
    per-round error locations and the syndrome-extraction gates stay
    noiseless."""
    from ..run.compiler import EvDump, EvGates, EvMeasure, EvReset
    from .tableau import _ID4, clifford_tables

    codes, t0s, t1s, txs, tzs = [], [], [], [], []
    fl1, fl2 = [], []
    meas_rows: list[int] = []
    itx, itz, _ = clifford_tables(_ID4)
    ident2 = np.eye(2, dtype=np.complex128)

    def row(code, q0, q1, tx, tz, f1, f2):
        codes.append(code)
        t0s.append(q0)
        t1s.append(q1)
        txs.append(tx)
        tzs.append(tz)
        fl1.append(f1)
        fl2.append(f2)

    for ev in events:
        if isinstance(ev, EvGates):
            for p in ev.prims:
                targets = p.targets
                if len(targets) == 1:
                    q = targets[0]
                    u2 = np.kron(np.eye(2, dtype=np.complex128), p.dense())
                    tx, tz, _ = clifford_tables(u2)
                    noisy = (not identity_noise_only
                             or np.allclose(p.dense(), ident2))
                    row(_FOP_GATE if noisy else _FOP_GATEQ,
                        (q + 1) % n, q, tx, tz, (0, 1 if noisy else 0), 0)
                elif len(targets) == 2:
                    tx, tz, _ = clifford_tables(p.dense())
                    f = 0 if identity_noise_only else 1
                    row(_FOP_GATE if f else _FOP_GATEQ,
                        targets[0], targets[1], tx, tz, (f, f), f)
                else:
                    return None
        elif isinstance(ev, EvMeasure):
            for q in ev.qubits:
                meas_rows.append(len(codes))
                row(_FOP_MEASURE, q, q, itx, itz, (0, 0), 0)
        elif isinstance(ev, EvReset):
            for q in ev.qubits:
                row(_FOP_RESET, q, q, itx, itz, (0, 0), 0)
        elif isinstance(ev, EvDump):
            continue
        else:  # pragma: no cover - eligibility is checked by the caller
            return None
    if not codes:
        return None
    g = 1 << (len(codes) - 1).bit_length()
    while len(codes) < g:
        row(_FOP_NOP, 0, 1, itx, itz, (0, 0), 0)
    return (np.asarray(codes, np.int32),
            np.asarray(t0s, np.uint32), np.asarray(t1s, np.uint32),
            np.stack(txs), np.stack(tzs),
            np.asarray(fl1, np.uint32), np.asarray(fl2, np.uint32),
            meas_rows)


@jax.jit
def _frame_scan_mc_impl(fx, fz, codes, t0, t1, txs, tzs, flags, cdfs,
                        flags2, cdfs2, keys):
    """The mid-circuit frame scan: gate rows update frames through the
    Clifford tables (with per-step sampled Pauli noise, as
    ``_frame_scan_impl``); measure rows emit the frame's X bit (packed
    to uint32 words across the trajectory axis) and randomize the Z
    component; reset rows clear X and randomize Z."""
    n_ch = cdfs.shape[0]
    n_ch2 = cdfs2.shape[0]
    ntraj = fx.shape[0]          # multiple of 32 (caller pads)
    packer = (jnp.uint32(1) << (jnp.arange(32, dtype=jnp.uint32)))

    def step(carry, inp):
        fx, fz = carry
        code, q0, q1, tx, tz, fl, fl2, k = inp
        w0, o0 = (q0 >> 5).astype(jnp.int32), q0 & 31
        w1, o1 = (q1 >> 5).astype(jnp.int32), q1 & 31
        zero_rec = jnp.zeros(ntraj // 32, jnp.uint32)

        def table_(ops):
            fx, fz = ops
            xb0 = _row_bit(fx, w0, o0)
            zb0 = _row_bit(fz, w0, o0)
            xb1 = _row_bit(fx, w1, o1)
            zb1 = _row_bit(fz, w1, o1)
            idx = (xb0 | (zb0 << 1) | (xb1 << 2)
                   | (zb1 << 3)).astype(jnp.int32)
            nx = tx[idx]
            nz = tz[idx]
            fx2 = _set_col_bit(fx, w0, o0, nx & 1)
            fx2 = _set_col_bit(fx2, w1, o1, (nx >> 1) & 1)
            fz2 = _set_col_bit(fz, w0, o0, nz & 1)
            fz2 = _set_col_bit(fz2, w1, o1, (nz >> 1) & 1)
            return fx2, fz2

        def gate_quiet_(ops):
            fx2, fz2 = table_(ops)
            return fx2, fz2, zero_rec

        def gate_(ops):
            fx2, fz2 = table_(ops)
            ka, kb = jax.random.split(k)
            if n_ch:
                u = jax.random.uniform(ka, (2, n_ch, ntraj))
                for ci in range(n_ch):
                    for j, (w, o) in enumerate(((w0, o0), (w1, o1))):
                        c = (jnp.sum((cdfs[ci, :3, None]
                                      <= u[j, ci][None, :])
                                     .astype(jnp.uint32), axis=0) * fl[j])
                        fx2 = _xor_col_bit(fx2, w, o, (c ^ (c >> 1)) & 1)
                        fz2 = _xor_col_bit(fz2, w, o, (c >> 1) & 1)
            if n_ch2:
                u2 = jax.random.uniform(kb, (n_ch2, ntraj))
                for ci in range(n_ch2):
                    c = (jnp.sum((cdfs2[ci, :15, None] <= u2[ci][None, :])
                                 .astype(jnp.uint32), axis=0) * fl2)
                    for sub, (w, o) in (((c >> 2), (w0, o0)),
                                        ((c & 3), (w1, o1))):
                        fx2 = _xor_col_bit(fx2, w, o, (sub ^ (sub >> 1)) & 1)
                        fz2 = _xor_col_bit(fz2, w, o, (sub >> 1) & 1)
            return fx2, fz2, zero_rec

        def meas_(ops):
            fx, fz = ops
            rec = _row_bit(fx, w0, o0)
            # collapse randomizes the Z frame (Stim M semantics): this is
            # what keeps frame sampling exact when the clean circuit's own
            # outcomes are random
            zr = jax.random.bernoulli(k, 0.5, (ntraj,)).astype(jnp.uint32)
            fz = _xor_col_bit(fz, w0, o0, zr)
            packed = jnp.sum(rec.reshape(-1, 32) * packer[None, :],
                             axis=1, dtype=jnp.uint32)
            return fx, fz, packed

        def reset_(ops):
            fx, fz = ops
            zeros = jnp.zeros(ntraj, jnp.uint32)
            zr = jax.random.bernoulli(k, 0.5, (ntraj,)).astype(jnp.uint32)
            fx = _set_col_bit(fx, w0, o0, zeros)
            fz = _set_col_bit(fz, w0, o0, zr)
            return fx, fz, zero_rec

        def nop_(ops):
            fx, fz = ops
            return fx, fz, zero_rec

        fx, fz, rec = lax.switch(
            code, (gate_, meas_, reset_, nop_, gate_quiet_), (fx, fz))
        return (fx, fz), rec

    (fx, fz), recs = lax.scan(
        step, (fx, fz), (codes, t0, t1, txs, tzs, flags, flags2, keys))
    return fx, fz, recs


def _pad_qs(qs):
    """Pad a measured-qubit index vector to the next power of two by
    repeating entry 0 (deterministic readout never mutates the tableau,
    so duplicates are harmless) — bounds the number of compiled
    ``_det_outcomes_impl`` shapes."""
    g = 1 << (qs.shape[0] - 1).bit_length() if qs.shape[0] > 1 else 1
    if g == qs.shape[0]:
        return qs
    return jnp.concatenate([qs, jnp.broadcast_to(qs[0], (g - qs.shape[0],))])


def _clean_record(n: int, events, key):
    """ONE exact tableau pass over the event stream: the clean reference
    outcomes per measured qubit, in program order. Reset follows the
    reference projection semantics (forced-0 measurement + X flip on a
    |1>-certain qubit — the EvReset branch of noise.py).

    When every qubit of a measure/reset event is DETERMINISTIC (the QEC
    workload: parity ancillas of a stabilizer state), all its outcomes
    come from ``tableau._det_outcomes_impl`` — three MXU matmuls, no
    tableau change — instead of one O(n)-step sequential loop per qubit;
    reset's conditional X-phase flips then fuse into one pass. Events
    with any random outcome fall back to the sequential scan."""
    from ..run.compiler import EvDump, EvGates, EvMeasure, EvReset
    from .noise import _apply_pauli_phase
    from .tableau import (_DET_BATCH_MAX_N, _det_outcomes_impl,
                          _measure_seq_impl, _x_phase_flips_impl,
                          apply_prims, identity_tableau)

    tab = identity_tableau(n)
    x, z, s = tab.x, tab.z, tab.s
    rec: list[np.ndarray] = []
    site = 0
    for ev in events:
        if isinstance(ev, EvGates):
            t = apply_prims(type(tab)(x, z, s), ev.prims)
            x, z, s = t.x, t.z, t.s
        elif isinstance(ev, EvMeasure):
            qs = jnp.asarray(np.asarray(ev.qubits, dtype=np.uint32))
            site += 1
            if n <= _DET_BATCH_MAX_N:
                anyr, outs = _det_outcomes_impl(x, z, s, _pad_qs(qs), n)
                if not bool(anyr):
                    rec.append(np.asarray(outs, dtype=np.uint8)
                               [:len(ev.qubits)])
                    continue
            rnd = jax.random.bernoulli(
                jax.random.fold_in(key, site - 1), 0.5, (len(ev.qubits),))
            outs, x, z, s = _measure_seq_impl(x, z, s, qs, rnd, n)
            rec.append(np.asarray(outs, dtype=np.uint8))
        elif isinstance(ev, EvReset):
            qs = jnp.asarray(np.asarray(ev.qubits, dtype=np.uint32))
            if n <= _DET_BATCH_MAX_N:
                qsp = _pad_qs(qs)
                anyr, outs = _det_outcomes_impl(x, z, s, qsp, n)
                if not bool(anyr):
                    # padded slots repeat qubit 0: zero their flip bits so
                    # the fused X-phase pass sees each real qubit once
                    flips = jnp.where(
                        jnp.arange(qsp.shape[0]) < len(ev.qubits), outs, 0)
                    s = _x_phase_flips_impl(z, s, qsp, flips)
                    continue
            zeros = jnp.zeros((len(ev.qubits),), dtype=bool)
            outs, x, z, s = _measure_seq_impl(x, z, s, qs, zeros, n)
            for q, b in zip(ev.qubits, outs):
                w = jnp.int32(q >> 5)
                off = jnp.uint32(q & 31)
                s = _apply_pauli_phase(x, z, s, w, off,
                                       jnp.uint32(1) * b.astype(jnp.uint32))
        elif isinstance(ev, EvDump):
            continue
    return rec


# -- layered (shot-major) frame executor --------------------------------------
#
# Dropping phases makes ANY Clifford's frame action GF(2)-LINEAR in the
# (x0, z0, x1, z1) bits — a 4x4 bit matrix per prim. Packing the tape
# into LAYERS of disjoint-qubit prims (which commute as index maps) and
# storing frames SHOT-MAJOR (row q = qubit q's bits across trajectories,
# the Stim layout) turns a whole layer into a handful of word-wide
# gather/AND/XOR/scatter ops: a QEC round costs ~5 scan steps instead of
# ~2500, and all per-row RNG collapses into one vectorized draw per
# noisy layer. ~100x on the 1001-qubit repetition-code memory.

_IDENT_MBITS = 0x8421            # 4x4 identity over GF(2), bit i*4+j = M[i,j]
_MBITS_CACHE: dict = {}


def _gf2_mbits(u4: np.ndarray) -> int:
    """The 16-bit GF(2) matrix of a 2q Clifford's phase-free frame
    action: column j (inputs ordered x0, z0, x1, z1) = the conjugation
    table's image of basis pattern ``1 << j``; verified linear against
    all 16 patterns (it must be — phases are dropped)."""
    from .tableau import clifford_tables

    key = (u4.shape[0], u4.tobytes())
    hit = _MBITS_CACHE.get(key)
    if hit is not None:
        return hit
    tx, tz, _ = clifford_tables(u4)

    def outbits(c):
        return (tx[c] & 1, tz[c] & 1, (tx[c] >> 1) & 1, (tz[c] >> 1) & 1)

    mb = 0
    for j in range(4):
        for i, b in enumerate(outbits(1 << j)):
            mb |= int(b) << (i * 4 + j)
    for c in range(16):
        want = outbits(c)
        for i in range(4):
            got = 0
            for j in range(4):
                got ^= ((mb >> (i * 4 + j)) & 1) & ((c >> j) & 1)
            if got != want[i]:       # pragma: no cover - cannot happen
                raise AssertionError("non-linear frame action")
    _MBITS_CACHE[key] = mb
    return mb


def _build_layers(events, n: int, identity_noise_only: bool):
    """Pack EvGates/EvMeasure/EvReset into layers. Gate prims are
    greedily batched while their qubits stay disjoint; measure/reset
    events become their own layers (split on duplicate qubits). Returns
    ``(layers, meas_slots, row_count)`` — layers a list of
    ``(kind, payload)``, meas_slots the program-order (layer, slot) of
    each measured qubit, row_count the old row-scan tape length (for the
    layered-vs-rows heuristic) — or None when a prim has arity > 2."""
    from ..run.compiler import EvDump, EvGates, EvMeasure, EvReset

    ident2 = np.eye(2, dtype=np.complex128)
    layers: list[tuple[str, list]] = []
    meas_slots: list[tuple[int, int]] = []
    rows = 0
    cur: list | None = None
    cur_used: set = set()

    def flush():
        nonlocal cur, cur_used
        if cur:
            layers.append(("g", cur))
        cur = None
        cur_used = set()

    for ev in events:
        if isinstance(ev, EvGates):
            for p in ev.prims:
                t = p.targets
                rows += 1
                if len(t) == 1:
                    q = t[0]
                    dense = p.dense()
                    mb = _gf2_mbits(
                        np.kron(np.eye(2, dtype=np.complex128), dense))
                    noisy = (not identity_noise_only
                             or np.allclose(dense, ident2))
                    entry = (n, q, mb, 0, 1 if noisy else 0, 0)
                    qs = {q}
                elif len(t) == 2:
                    mb = _gf2_mbits(p.dense())
                    f = 0 if identity_noise_only else 1
                    entry = (t[0], t[1], mb, f, f, f)
                    qs = set(t)
                else:
                    return None
                if cur is None or (qs & cur_used):
                    flush()
                    cur = []
                cur.append(entry)
                cur_used |= qs
        elif isinstance(ev, (EvMeasure, EvReset)):
            flush()
            kind = "m" if isinstance(ev, EvMeasure) else "r"
            chunk: list = []
            seen: set = set()
            for q in ev.qubits:
                rows += 1
                if q in seen:
                    layers.append((kind, chunk))
                    if kind == "m":
                        for si in range(len(chunk)):
                            meas_slots.append((len(layers) - 1, si))
                    chunk, seen = [], set()
                chunk.append(q)
                seen.add(q)
            layers.append((kind, chunk))
            if kind == "m":
                for si in range(len(chunk)):
                    meas_slots.append((len(layers) - 1, si))
        elif isinstance(ev, EvDump):
            continue
        else:      # pragma: no cover - eligibility is checked by the caller
            return None
    flush()
    if not layers:
        return None
    return layers, meas_slots, rows


def _pow2(v: int) -> int:
    return 1 << (v - 1).bit_length() if v > 1 else 1


def _pack_layers(layers, n: int):
    """Stack layers into uniform padded scan arrays (pads target the
    scratch row ``n`` with identity action and zero flags). Slot counts
    round up to powers of two so one compiled scan serves a range of
    circuit sizes (pads are word-ops on the scratch row — cheap; remote
    compiles are 30-90 s — not)."""
    P = _pow2(max((len(pl) for k, pl in layers if k == "g"), default=1))
    M = _pow2(max((len(pl) for k, pl in layers if k == "m"), default=1))
    R = _pow2(max((len(pl) for k, pl in layers if k == "r"), default=1))
    L = len(layers)
    q0 = np.full((L, P), n, np.int32)
    q1 = np.full((L, P), n, np.int32)
    mb = np.full((L, P), _IDENT_MBITS, np.uint32)
    nm = np.zeros((L, P, 2), np.uint32)
    nm2 = np.zeros((L, P), np.uint32)
    mq = np.full((L, M), n, np.int32)
    mvalid = np.zeros((L, M), np.uint32)
    rq = np.full((L, R), n, np.int32)
    noisy = np.zeros(L, bool)
    for li, (kind, pl) in enumerate(layers):
        if kind == "g":
            for pi, (a, b, m, f0, f1, f2) in enumerate(pl):
                q0[li, pi] = a
                q1[li, pi] = b
                mb[li, pi] = m
                nm[li, pi] = (f0, f1)
                nm2[li, pi] = f2
            noisy[li] = nm[li].any() or nm2[li].any()
        elif kind == "m":
            for si, q in enumerate(pl):
                mq[li, si] = q
                mvalid[li, si] = 1
        else:
            for si, q in enumerate(pl):
                rq[li, si] = q
    return q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy


def _pack_traj_bits(bits, w: int):
    """(..., T) 0/1 uint32 -> (..., W) packed words (bit t&31 of word
    t>>5 = trajectory t)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.reshape(*bits.shape[:-1], w, 32) << shifts,
                   axis=-1, dtype=jnp.uint32)


@jax.jit
def _layer_scan_impl(fx, fz, q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy,
                     cdfs, cdfs2, keys):
    """Scan over LAYERS: gate layers gather the frame rows of both
    slots, apply the per-prim GF(2) matrices as masked XOR folds, inject
    per-slot Pauli noise (one vectorized draw per noisy layer), and
    scatter back; measure layers emit the X rows (masked) and XOR random
    words into Z; reset layers zero X and randomize Z. Non-applicable
    parts of a layer only touch the scratch row ``n``."""
    n_ch = cdfs.shape[0]
    n_ch2 = cdfs2.shape[0]
    w = fx.shape[1]
    t = w * 32
    mrows = mq.shape[1]
    rrows = rq.shape[1]

    def step(carry, inp):
        fx, fz = carry
        q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy, k = inp
        ins = (fx[q0], fz[q0], fx[q1], fz[q1])            # (P, W) each
        outs = []
        for i in range(4):
            acc = None
            for j in range(4):
                mij = (jnp.uint32(0) - ((mb >> (i * 4 + j))
                                        & jnp.uint32(1)))[:, None]
                v = mij & ins[j]
                acc = v if acc is None else acc ^ v
            outs.append(acc)
        ka, kb, km, kr = jax.random.split(k, 4)

        def inject(o):
            x0o, z0o, x1o, z1o = o
            if n_ch:
                u = jax.random.uniform(ka, (2, n_ch) + x0o.shape[:1] + (t,))
                for ci in range(n_ch):
                    for sl in range(2):
                        c = (jnp.sum((cdfs[ci, :3, None, None]
                                      <= u[sl, ci][None])
                                     .astype(jnp.uint32), axis=0)
                             * nm[:, sl][:, None])
                        xm = _pack_traj_bits((c ^ (c >> 1)) & 1, w)
                        zm = _pack_traj_bits((c >> 1) & 1, w)
                        if sl == 0:
                            x0o, z0o = x0o ^ xm, z0o ^ zm
                        else:
                            x1o, z1o = x1o ^ xm, z1o ^ zm
            if n_ch2:
                u2 = jax.random.uniform(kb, (n_ch2,) + x0o.shape[:1] + (t,))
                for ci in range(n_ch2):
                    c = (jnp.sum((cdfs2[ci, :15, None, None] <= u2[ci][None])
                                 .astype(jnp.uint32), axis=0)
                         * nm2[:, None])
                    for sub, sl in ((c >> 2, 0), (c & 3, 1)):
                        xm = _pack_traj_bits((sub ^ (sub >> 1)) & 1, w)
                        zm = _pack_traj_bits((sub >> 1) & 1, w)
                        if sl == 0:
                            x0o, z0o = x0o ^ xm, z0o ^ zm
                        else:
                            x1o, z1o = x1o ^ xm, z1o ^ zm
            return x0o, z0o, x1o, z1o

        if n_ch or n_ch2:
            outs = lax.cond(noisy, inject, lambda o: o, tuple(outs))
        x0o, z0o, x1o, z1o = outs
        fx = fx.at[q0].set(x0o)
        fx = fx.at[q1].set(x1o)
        fz = fz.at[q0].set(z0o)
        fz = fz.at[q1].set(z1o)
        # measure: record X rows, then randomize Z (collapse)
        rec = fx[mq] & (jnp.uint32(0) - mvalid)[:, None]
        zr = jax.random.bits(km, (mrows, w), dtype=jnp.uint32)
        fz = fz.at[mq].set(fz[mq] ^ zr)
        # reset: clear X, fresh random Z
        rr = jax.random.bits(kr, (rrows, w), dtype=jnp.uint32)
        fx = fx.at[rq].set(jnp.zeros((rrows, w), jnp.uint32))
        fz = fz.at[rq].set(rr)
        return (fx, fz), rec

    (fx, fz), recs = lax.scan(
        step, (fx, fz), (q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy, keys))
    return recs


def frame_run_vals_events(prog, events, ntraj: int, key):
    """Run ``ntraj`` noisy trajectories of a Clifford event stream WITH
    mid-circuit measurement/reset via Pauli frames: one exact tableau
    pass for the clean record, one frame scan for all trajectories,
    outcomes = clean XOR frame-X at each measure row. Same creg-dict
    contract as ``run_vals``; None when a gate cannot be packed (the
    caller falls back to vmapped tableaux). Well-layerable tapes (the
    QEC shape) ride the layered shot-major scan; pathologically
    interleaved ones keep the row scan."""
    n = prog.n
    ino = getattr(prog, "noise_identity_only", False)
    built = _build_layers(events, n, identity_noise_only=ino)
    if built is None:
        return None
    layers, meas_slots, row_count = built
    pk = _pack_layers(layers, n)
    pmax = max(pk[0].shape[1], pk[5].shape[1], pk[7].shape[1])
    if len(layers) * pmax > 8 * row_count:
        return _frame_run_vals_events_rows(prog, events, ntraj, key)

    from ..run.compiler import EvMeasure

    kc, kf, kr = jax.random.split(key, 3)
    clean = _clean_record(n, events, kc)
    tpad = ((ntraj + 31) // 32) * 32
    w = tpad // 32
    fx = jnp.zeros((n + 1, w), dtype=jnp.uint32)
    # random Z on every qubit at t=0 (|0> is Z-invariant): the Stim trick
    # that decorrelates nondeterministic outcomes across trajectories
    kf, kz0 = jax.random.split(kf)
    fz = jax.random.bits(kz0, (n + 1, w), dtype=jnp.uint32)
    cdfs = jnp.asarray(np.asarray(prog.cdfs, np.float32).reshape(-1, 4))
    cdfs2 = jnp.asarray(np.asarray(
        getattr(prog, "cdfs2", np.zeros((0, 16), np.float32)),
        np.float32).reshape(-1, 16))
    q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy = (jnp.asarray(a) for a in pk)
    step_keys = jax.random.split(kf, len(layers))
    recs = np.asarray(jax.device_get(_layer_scan_impl(
        fx, fz, q0, q1, mb, nm, nm2, mq, mvalid, rq, noisy,
        cdfs, cdfs2, step_keys)))                    # (L, M, W)
    j = np.arange(ntraj)
    flips = [((recs[li, si, j >> 5] >> (j & 31)) & 1).astype(np.uint8)
             for (li, si) in meas_slots]

    vals = {c: np.zeros((ntraj, prog.creg_sizes[c]), dtype=np.int32)
            for c in prog.creg_names}
    mi = 0      # measurement-event counter
    ri = 0      # measured-qubit counter (into flips)
    rkey = 0
    for ev in events:
        if not isinstance(ev, EvMeasure):
            continue
        clean_bits = clean[mi]
        mi += 1
        cols = []
        for k_, _q in enumerate(ev.qubits):
            cols.append(clean_bits[k_] ^ flips[ri])
            ri += 1
        if getattr(prog, "readout_p", None):
            ro = np.asarray(jax.random.bernoulli(
                jax.random.fold_in(kr, rkey), prog.readout_p,
                (ntraj, len(ev.qubits)))).astype(np.uint8)
            rkey += 1
        else:
            ro = None
        off = 0
        for creg, bit_index, count in ev.writes:
            for k_ in range(count):
                col = cols[off + k_]
                if ro is not None:
                    col = col ^ ro[:, off + k_]
                if bit_index is None:
                    vals[creg][:, k_] = col
                else:
                    vals[creg][:, bit_index] = col
            off += count
    return vals


def _frame_run_vals_events_rows(prog, events, ntraj: int, key):
    """The row-scan fallback of :func:`frame_run_vals_events` (one tape
    row per prim/measured/reset qubit): kept for tapes whose layering
    would pad pathologically (many singleton layers next to one wide
    one). Semantics identical; RNG stream differs."""
    from ..run.compiler import EvMeasure

    n = prog.n
    packed = _pack_frame_tape(
        events, n,
        identity_noise_only=getattr(prog, "noise_identity_only", False))
    if packed is None:
        return None
    codes, t0, t1, txs, tzs, fl1, fl2, meas_rows = packed
    kc, kf, kr = jax.random.split(key, 3)
    clean = _clean_record(n, events, kc)

    T = ((ntraj + 31) // 32) * 32          # pad the trajectory axis
    words = (n + 31) // 32
    fx = jnp.zeros((T, words), dtype=jnp.uint32)
    # frames INITIALIZE with random Z on every qubit (|0> is Z-invariant,
    # so the state is unchanged) — this is the Stim frame-simulator trick
    # that carries measurement randomness: a later basis change turns the
    # random Z into a random X, which decorrelates nondeterministic
    # outcomes across trajectories even though all share ONE clean
    # reference record (without it, a Bell-pair measurement would return
    # the reference outcome in every trajectory)
    kf, kz0 = jax.random.split(kf)
    fz = jax.random.bits(kz0, (T, words), dtype=jnp.uint32)
    cdfs = jnp.asarray(np.asarray(prog.cdfs, np.float32).reshape(-1, 4))
    cdfs2 = jnp.asarray(np.asarray(
        getattr(prog, "cdfs2", np.zeros((0, 16), np.float32)),
        np.float32).reshape(-1, 16))
    L = codes.shape[0]
    step_keys = jax.random.split(kf, L)
    _, _, recs = _frame_scan_mc_impl(
        fx, fz, jnp.asarray(codes), jnp.asarray(t0), jnp.asarray(t1),
        jnp.asarray(txs), jnp.asarray(tzs), jnp.asarray(fl1), cdfs,
        jnp.asarray(fl2), cdfs2, step_keys)
    recs = np.asarray(jax.device_get(recs))            # (L, T/32) words
    j = np.arange(ntraj)
    flips_at = {r: ((recs[r, j >> 5] >> (j & 31)) & 1).astype(np.uint8)
                for r in meas_rows}

    vals = {c: np.zeros((ntraj, prog.creg_sizes[c]), dtype=np.int32)
            for c in prog.creg_names}
    mi = 0      # measurement-event counter
    ri = 0      # measure-row counter (into meas_rows)
    rkey = 0
    for ev in events:
        if not isinstance(ev, EvMeasure):
            continue
        clean_bits = clean[mi]
        mi += 1
        cols = []
        for k_, _q in enumerate(ev.qubits):
            col = clean_bits[k_] ^ flips_at[meas_rows[ri]]
            ri += 1
            cols.append(col)
        if getattr(prog, "readout_p", None):
            ro = np.asarray(jax.random.bernoulli(
                jax.random.fold_in(kr, rkey), prog.readout_p,
                (ntraj, len(ev.qubits)))).astype(np.uint8)
            rkey += 1
        else:
            ro = None
        off = 0
        for creg, bit_index, count in ev.writes:
            for k_ in range(count):
                col = cols[off + k_]
                if ro is not None:
                    col = col ^ ro[:, off + k_]
                if bit_index is None:
                    vals[creg][:, k_] = col
                else:
                    vals[creg][:, bit_index] = col
            off += count
    return vals
