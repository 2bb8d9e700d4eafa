"""Noisy MPS trajectories: Pauli channels on bounded-entanglement circuits.

The third leg of the trajectory family (dense ``run/noisy.py`` <= ~26
qubits, Clifford-only ``stabilizer/noise.py`` at 1000+): NON-Clifford
noisy circuits at 50-100+ qubits, as long as each trajectory's
entanglement fits the bond cap ``chi``.

Pauli channels (depolarizing / bit-flip / phase-flip / dep2) mirror the
stabilizer unraveling: their branch probabilities are INDEPENDENT of the
state, so a sampled noise event needs no Kraus norm computation — it is
one more 1q row in the MPS replay tape (engine.py:_k_chain) whose 2x2
block each trajectory overwrites with its sampled Pauli (a traced gather
from a (4, 2, 2) table). Amplitude/phase damping change branch weights
WITH the state: those become ``_OP_K1Q`` rows carrying both Kraus blocks,
and the scan body picks the MCWF branch in-trace from
``||K0 psi||^2 / ||psi||^2`` (exact transfer contractions, run only on K
rows — the tape code is unbatched, so lax.switch stays control flow under
vmap). Either way the whole noisy circuit still replays as a single
``lax.scan``; trajectories ``vmap`` over the stacked site planes at
T x 4*n*chi^2 floats.

Measurement, feed-forward and reset are fully traced (unlike MPSSim's
host-control-flow ``measure_qubit``): Born probabilities come from exact
transfer contractions (``_k_expect`` / ``_k_norm2`` — correct in ANY
canonical form, so no orthogonality-center bookkeeping is needed for
readout), projection is a 1q contraction plus a global renormalize.

The reference has no noise story at all (SURVEY §5); this extends its
interpreter semantics (src/Qubism/QASM/Simulation.hs:55-76) to open
systems at scales its O(4^n) engine (src/Qubism/QGate.hs:80) could never
reach.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import config
from ..run.noisy import TrajectoryProgram
from ..stabilizer.noise import NotPauliChannelError, pauli_channel_cdfs
from .engine import (_OP_1Q, _OP_K1Q, _PAULI, _apply_1q_body,
                     _k_chain, _k_expect, _k_norm2, _k_scale_site,
                     build_tape, pack_tape)

__all__ = ["MPSTrajectoryProgram", "split_mps_noise"]


def split_mps_noise(spec: str):
    """Classify a --noise spec for the MPS tape executor, PRESERVING
    SPEC ORDER (non-commuting mixes like ``ad`` + ``dep`` compose
    differently per order, and DensityProgram applies spec order — every
    engine must match). Pauli channels (dep/bf/pf/dep2) pre-sample
    branches OUTSIDE the scan (state-independent probabilities -> CDFs);
    any non-Pauli 2-Kraus 2x2 channel (amplitude/phase damping today —
    dispatched by the parsed Kraus SHAPE, so new ``NOISE_CHANNELS``
    entries route automatically) becomes an ``_OP_K1Q`` row whose MCWF
    branch is chosen IN-scan from ``||K0 psi||^2`` transfer
    contractions. Returns ``[(kind, data, tspec), ...]`` in spec order
    with kind ``"p1"`` (data = (4,) CDF), ``"p2"`` (data = (16,) CDF), or
    ``"k"`` (data = (4, 4) complex, K0 in [:2, :2], K1 in [:2, 2:4] —
    the tape row layout), and tspec the part's unresolved ``@`` qubit
    target string (None = all qubits; the program resolves it against
    its layout). Channels that fit none of these raise the
    mps-labelled :class:`~qubism_tpu.stabilizer.noise.NotPauliChannelError`."""
    from ..run.noisy import parse_noise_spec, split_channel_target

    chans = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        part, tspec = split_channel_target(part)
        try:
            c1, c2 = pauli_channel_cdfs(part, backend="mps")
        except NotPauliChannelError as err:
            # unknown names get parse_noise_spec's clearer error here
            (_, ks), = parse_noise_spec(part)
            ks = [np.asarray(k) for k in ks]
            if not (len(ks) == 2 and ks[0].shape == (2, 2)):
                raise err
            k4 = np.zeros((4, 4), dtype=np.complex128)
            k4[:2, :2] = ks[0]
            k4[:2, 2:4] = ks[1]
            chans.append(("k", k4, tspec))
        else:
            chans.append(("p1", c1[0], tspec) if len(c1)
                         else ("p2", c2[0], tspec))
    return chans

#: (4, 2, 2) split planes of (I, X, Y, Z) — the traced sample gathers here.
_PAULI_R = jnp.asarray(np.stack([
    _PAULI[c].real for c in "IXYZ"]).astype(np.float32))
_PAULI_I = jnp.asarray(np.stack([
    _PAULI[c].imag for c in "IXYZ"]).astype(np.float32))


class MPSTrajectoryProgram(TrajectoryProgram):
    """Noisy QASM as vmapped matrix-product-state trajectories.

    Inherits the creg/feed-forward machinery and the host sampling API
    from :class:`~qubism_tpu.run.noisy.TrajectoryProgram`; the quantum
    state is a (n, chi, 2, chi) split-plane MPS instead of 2^n
    amplitudes. ``trunc_error`` observability: per-trajectory discarded
    weight accumulates in-trace and is returned by ``run_vals(...,
    return_states=True)`` as the third state leaf.
    """

    def __init__(self, ast, noise=None, chi: int = 32):
        from ..run.compiler import elaborate
        from ..run.noisy import split_readout_spec

        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)
        self.chi = chi
        self.readout_p = None
        if isinstance(noise, str):
            from ..run.noisy import resolve_noise_targets

            noise, self.readout_p = split_readout_spec(noise)
            self.chans = [
                (k, d, None if t is None else resolve_noise_targets(
                    t, self.layout, self.qreg_sizes, self.n))
                for k, d, t in split_mps_noise(noise)]
        else:
            self.chans = [("p1", np.asarray(c, dtype=np.float32), None)
                          for c in np.asarray(
                              noise if noise is not None
                              else np.zeros((0, 4), np.float32))]
        self.kraus4s = [d for k, d, _ in self.chans if k == "k"]
        self.noise = [("pauli", None)] if self.chans else []
        self.creg_names = sorted(self.cregs0)
        self.creg_sizes = {c: len(self.cregs0[c].bits)
                           for c in self.creg_names}
        self._site = 0
        self._center = 0

    def _traj_live_cost(self) -> int:
        return max(1, 4 * self.n * self.chi * self.chi + 2 * self.n)

    # -- tape construction (host side, runs once per trace) -----------------

    def _tape(self, prims):
        """Flatten a prim stream into one op tape via the engine's shared
        builder, inserting an identity 1q row after each gate per
        (channel, physical site) — the noise slots a trajectory
        overwrites with its sampled Paulis. Returns the packed host
        arrays plus (noise row indices, per-row channel CDFs)."""
        rows = []                    # tape indices of 1q noise slots
        cdf_rows = []                # the slot's channel CDF (4,)
        rows2a, rows2b = [], []      # PAIRED slots for dep2 (joint draw)
        cdf2_rows = []               # the pair's channel CDF (16,)
        krows = []                   # _OP_K1Q rows (general 2-Kraus)
        eye2 = np.eye(2, dtype=complex)

        def noise_slots(tape, sites, logical):
            # emit slots in SPEC ORDER: the scan executes tape rows in
            # sequence, so interleaving Pauli slots and K rows here is
            # what makes non-commuting mixes match the density engine.
            # ``logical`` carries qubit IDENTITY for targeted (@)
            # channels: routed 2q gates park logical qubit b at physical
            # site a+1 when the slots land (engine.build_tape).
            for kind, data, tset in self.chans:
                if kind == "p1":
                    for t, lq in zip(sites, logical):
                        if tset is not None and lq not in tset:
                            continue
                        rows.append(len(tape))
                        cdf_rows.append(data)
                        tape.append((_OP_1Q, t, eye2))
                elif kind == "p2":
                    if len(sites) == 2 and (tset is None
                                            or set(logical) <= tset):
                        rows2a.append(len(tape))
                        tape.append((_OP_1Q, sites[0], eye2))
                        rows2b.append(len(tape))
                        tape.append((_OP_1Q, sites[1], eye2))
                        cdf2_rows.append(data)
                else:  # "k": Kraus planes are static per program —
                    # packed at build time; only the branch uniform is
                    # per-trajectory
                    for t, lq in zip(sites, logical):
                        if tset is not None and lq not in tset:
                            continue
                        krows.append(len(tape))
                        tape.append((_OP_K1Q, t, data))

        tape, self._center = build_tape(prims, self._center,
                                        on_gate=noise_slots)
        packed = pack_tape(tape, max(1, len(tape)))
        return packed + (np.asarray(rows, dtype=np.int32),
                         np.asarray(cdf_rows, dtype=np.float32)
                         .reshape(-1, 4),
                         np.asarray(rows2a, dtype=np.int32),
                         np.asarray(rows2b, dtype=np.int32),
                         np.asarray(cdf2_rows, dtype=np.float32)
                         .reshape(-1, 16),
                         np.asarray(krows, dtype=np.int32))

    # -- traced execution ---------------------------------------------------

    def _gates(self, state, prims, key):
        re, im, disc = state
        (codes, qs, urs, uis, rows, cdf_rows,
         rows2a, rows2b, cdf2_rows, krows) = self._tape(prims)
        urs = jnp.asarray(urs)
        uis = jnp.asarray(uis)
        us_k = jnp.zeros(len(codes), dtype=jnp.float32)
        if len(krows):
            uk = jax.random.uniform(jax.random.fold_in(key, self._site),
                                    (len(krows),))
            self._site += 1
            us_k = us_k.at[jnp.asarray(krows)].set(uk)
        if len(rows):
            us = jax.random.uniform(jax.random.fold_in(key, self._site),
                                    (len(rows),))
            self._site += 1
            # c = #(cdf[j] <= u, j < 3) in 0..3 — the searchsorted of each
            # row's own CDF, vectorized over slots
            c = jnp.sum((jnp.asarray(cdf_rows)[:, :3] <= us[:, None])
                        .astype(jnp.int32), axis=1)
            urs = urs.at[rows, :2, :2].set(_PAULI_R[c])
            uis = uis.at[rows, :2, :2].set(_PAULI_I[c])
        if len(rows2a):
            u2 = jax.random.uniform(jax.random.fold_in(key, self._site),
                                    (len(rows2a),))
            self._site += 1
            # ONE joint 16-outcome draw per 2q gate per channel:
            # c >> 2 lands on the gate's lower site, c & 3 on the upper
            c2 = jnp.sum((jnp.asarray(cdf2_rows)[:, :15] <= u2[:, None])
                         .astype(jnp.int32), axis=1)
            urs = urs.at[rows2a, :2, :2].set(_PAULI_R[c2 >> 2])
            uis = uis.at[rows2a, :2, :2].set(_PAULI_I[c2 >> 2])
            urs = urs.at[rows2b, :2, :2].set(_PAULI_R[c2 & 3])
            uis = uis.at[rows2b, :2, :2].set(_PAULI_I[c2 & 3])
        # fixed-sweep SVDs here: the whole program is vmapped over
        # trajectories, where the early-exit while_loop runs to the
        # slowest lane anyway and its bookkeeping halved throughput
        re, im, d = _k_chain(re, im, jnp.asarray(codes), jnp.asarray(qs),
                             urs, uis, us_k, early_exit=False)
        return re, im, disc + d

    def _renorm(self, re, im, q):
        n2 = _k_norm2(re, im)
        s = lax.rsqrt(jnp.maximum(n2, jnp.float32(1e-30)))
        return _k_scale_site(re, im, q, s)

    def _measure(self, state, qubits, key):
        re, im, disc = state
        n = self.n
        z2 = jnp.zeros((2, 2), dtype=jnp.float32)
        bits = []
        for q in qubits:
            opr = np.tile(np.eye(2, dtype=np.float32), (n, 1, 1))
            opr[q] = np.diag([0.0, 1.0]).astype(np.float32)
            vr, _ = _k_expect(re, im, jnp.asarray(opr),
                              jnp.zeros((n, 2, 2), dtype=jnp.float32))
            n2 = _k_norm2(re, im)
            p1 = jnp.clip(vr / jnp.maximum(n2, jnp.float32(1e-30)), 0.0, 1.0)
            thr = jnp.sqrt(p1) if config.reference_sqrt_born else p1
            bit = (self._u(key) < thr).astype(jnp.int32)
            proj = jnp.diag((jnp.arange(2) == bit).astype(jnp.float32))
            re, im = _apply_1q_body(re, im, proj, z2, q)
            re, im = self._renorm(re, im, q)
            bits.append(bit)
        return bits, (re, im, disc)

    def _exec(self, events, state, cregs, key, pred):
        from ..run.compiler import (EvCond, EvDump, EvGates, EvMeasure,
                                    EvReset)

        z2 = jnp.zeros((2, 2), dtype=jnp.float32)
        proj0 = jnp.asarray(np.diag([1.0, 0.0]).astype(np.float32))
        for ev in events:
            if isinstance(ev, EvGates):
                new = self._gates(state, ev.prims, key)
                state = self._sel(pred, new, state)
            elif isinstance(ev, EvMeasure):
                bits, new = self._measure(state, ev.qubits, key)
                state = self._sel(pred, new, state)
                self._write_creg_bits(cregs, ev.writes,
                                      self._readout(bits, key), pred)
            elif isinstance(ev, EvReset):
                # the reference's reset: projection to |0> without a Born
                # draw (Simulation.hs:146-156), matching the dense path
                re, im, disc = state
                for q in ev.qubits:
                    re, im = _apply_1q_body(re, im, proj0, z2, q)
                    re, im = self._renorm(re, im, q)
                state = self._sel(pred, (re, im, disc), state)
            elif isinstance(ev, EvCond):
                hit = self._cond_hit(cregs, ev)
                sub = hit if pred is None else jnp.logical_and(pred, hit)
                state, cregs = self._exec(ev.body, state, cregs, key, sub)
            elif isinstance(ev, EvDump):
                pass
            else:  # pragma: no cover
                raise TypeError(f"unknown event {type(ev).__name__}")
        return state, cregs

    def _expect_final(self, state, pauli: str):
        re, im, _ = state
        ops = np.stack([_PAULI[c] for c in pauli])
        vr, _ = _k_expect(re, im,
                          jnp.asarray(ops.real.astype(np.float32)),
                          jnp.asarray(ops.imag.astype(np.float32)))
        n2 = _k_norm2(re, im)
        return vr / jnp.maximum(n2, jnp.float32(1e-30))

    def _run_one(self, key):
        self._site = 0
        self._center = 0
        cregs = {c: jnp.zeros(self.creg_sizes[c], dtype=jnp.int32)
                 for c in self.creg_names}
        if self.n:
            re = np.zeros((self.n, self.chi, 2, self.chi), dtype=np.float32)
            re[:, 0, 0, 0] = 1.0
            state = (jnp.asarray(re), jnp.zeros_like(jnp.asarray(re)),
                     jnp.float32(0))
            state, cregs = self._exec(self.events, state, cregs, key, None)
        else:
            state = None
        vals = tuple(cregs[c] for c in self.creg_names)
        return vals, state
