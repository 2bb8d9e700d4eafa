"""Noisy Clifford trajectories: Pauli channels on the tableau at 1000+ qubits.

A Pauli error applied to a stabilizer state never changes the stabilizer
GROUP's X/Z bit planes — conjugating a row generator g by a Pauli P only
flips its sign when g and P anticommute. So a sampled Pauli channel
(depolarizing, bit-flip, phase-flip) is a PHASE-PLANE update: for the
sampled P on qubit q, add 2 to s (mod 4) on every row whose bit pattern at
q anticommutes with P (X: rows with the z-bit set; Z: x-bit; Y: x xor z).
That costs O(rows) bit math per noise site — no Kraus matrices, no state
branches — and rides INSIDE the same ``lax.scan`` that applies the gate
chain (tableau.py:_apply_scan_impl), so a whole noisy circuit is still
one device program.

Trajectories then vmap over the program exactly like the dense
:class:`~qubism_tpu.run.noisy.TrajectoryProgram` (same creg-as-int32
feed-forward machinery, inherited), but a trajectory's live state is a
bit-packed tableau (~4*n^2/32 words), so thousands of 1000-qubit noisy
Clifford shots fit in one dispatch — a regime no amplitude-based engine
can touch (2^1000 amplitudes), and far beyond the reference's ~13-qubit
O(4^n) ceiling (src/Qubism/QGate.hs:80,148-154).

Amplitude/phase damping are not Pauli channels (not Clifford-conjugation
stable) and are rejected with a pointer to the dense trajectory mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..run.noisy import TrajectoryProgram
from .tableau import (_measure_seq_impl, _pack_chain, _row_bit,
                      identity_tableau)

__all__ = ["StabilizerTrajectoryProgram", "pauli_channel_cdfs",
           "NotPauliChannelError"]


class NotPauliChannelError(ValueError):
    """Raised for noise channels a stabilizer engine cannot unravel."""


#: channel name -> (p) -> (pI, pX, pY, pZ)
_PAULI_CHANNELS = {
    "depolarizing": lambda p: (1 - p, p / 3, p / 3, p / 3),
    "dep": lambda p: (1 - p, p / 3, p / 3, p / 3),
    "bitflip": lambda p: (1 - p, p, 0.0, 0.0),
    "bf": lambda p: (1 - p, p, 0.0, 0.0),
    "phaseflip": lambda p: (1 - p, 0.0, 0.0, p),
    "pf": lambda p: (1 - p, 0.0, 0.0, p),
}


def pauli_channel_cdfs(spec: str, backend: str = "stabilizer"):
    """Parse a --noise spec into stacked Pauli-channel CDFs. Returns
    ``(cdfs1, cdfs2)``: 1-qubit channels as (C1, 4) cumulative
    (pI, pX, pY, pZ) rows, and 2-qubit depolarizing (``dep2:p`` /
    ``depolarizing2:p`` — applied after every 2-qubit gate) as (C2, 16)
    rows whose index c decodes as Pauli ``c >> 2`` on the gate's first
    qubit and ``c & 3`` on its second. Non-Pauli channels
    (amplitude/phase damping) raise :class:`NotPauliChannelError`;
    ``backend`` only labels that error (stabilizer / mps)."""
    cdfs1, cdfs2 = [], []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "@" in part and backend == "stabilizer":
            raise ValueError(
                f"per-qubit noise targeting ({part!r}) is not supported "
                f"on the stabilizer backend; the dense trajectory, "
                f"density, and mps executors support '@'")
        name, sep, val = part.partition(":")
        name = name.strip().lower()
        if not sep:
            raise NotPauliChannelError(
                f"noise channel {name!r} needs a parameter "
                f"(e.g. {name}:0.01)")
        if name in ("dep2", "depolarizing2"):
            p = float(val)
            probs = np.full(16, p / 15.0, dtype=np.float32)
            probs[0] = 1.0 - p
            cdfs2.append(np.cumsum(probs))
            continue
        fac = _PAULI_CHANNELS.get(name)
        if fac is None:
            raise NotPauliChannelError(
                f"noise channel {name!r} is not a Pauli channel; the "
                f"{backend} backend unravels depolarizing/dep2/bitflip/"
                f"phaseflip here (amplitude/phase damping: the dense "
                f"trajectory mode, or the mps backend's in-scan Kraus "
                f"path)")
        probs = np.asarray(fac(float(val)), dtype=np.float32)
        cdfs1.append(np.cumsum(probs))
    return (np.stack(cdfs1) if cdfs1 else np.zeros((0, 4), np.float32),
            np.stack(cdfs2) if cdfs2 else np.zeros((0, 16), np.float32))


def _apply_pauli_phase(x, z, s, w, off, c):
    """Add the sign flips of Pauli c (0=I 1=X 2=Y 3=Z, traced) on the
    qubit at word w / bit off (traced) to the phase plane."""
    xb = _row_bit(x, w, off)
    zb = _row_bit(z, w, off)
    b = jnp.where(c == 1, zb,
                  jnp.where(c == 2, xb ^ zb,
                            jnp.where(c == 3, xb, jnp.zeros_like(xb))))
    return (s + 2 * b) & 3


def _sample_pauli(cdf, u):
    """cdf (4,) cumulative probs, u uniform -> Pauli index uint32."""
    return jnp.minimum(jnp.searchsorted(cdf, u, side="right"),
                       3).astype(jnp.uint32)


def _sample_pauli16(cdf, u):
    """cdf (16,) cumulative 2q-Pauli probs, u uniform -> index uint32
    (c >> 2 = Pauli on t0, c & 3 = Pauli on t1)."""
    return jnp.minimum(jnp.searchsorted(cdf, u, side="right"),
                       15).astype(jnp.uint32)


def _noisy_scan(x, z, s, packed, flags, cdfs, us, flags2, cdfs2, us2):
    """The gate scan of tableau.py:_apply_scan_impl with per-step Pauli
    noise on the real targets: flags (L, 2) marks which of (t0, t1) is a
    genuine circuit qubit (1q prims carry a fake identity partner;
    padding gates carry none), us (L, 2, C) the 1q-channel uniforms;
    flags2 (L,) marks real 2-qubit gates, us2 (L, C2) the correlated
    2q-channel (dep2) uniforms."""
    t0, t1, txs, tzs, tss = (jnp.asarray(a) for a in packed)
    flags = jnp.asarray(flags)
    flags2 = jnp.asarray(flags2)
    us = jnp.asarray(us)
    us2 = jnp.asarray(us2)
    cdfs = jnp.asarray(cdfs)
    cdfs2 = jnp.asarray(cdfs2)
    n_ch = cdfs.shape[0]
    n_ch2 = cdfs2.shape[0]

    def step(carry, inp):
        x, z, s = carry
        q0, q1, tx, tz, ts, fl, uu, fl2, uu2 = inp
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

        def setbit(mat, w, off, bits):
            col = jnp.take(mat, w, axis=1)
            cur = (col >> off) & jnp.uint32(1)
            return mat.at[:, w].set(col ^ ((cur ^ bits) << off))

        x = setbit(x, w0, o0, nx & 1)
        x = setbit(x, w1, o1, (nx >> 1) & 1)
        z = setbit(z, w0, o0, nz & 1)
        z = setbit(z, w1, o1, (nz >> 1) & 1)
        for ci in range(n_ch):
            c0 = _sample_pauli(cdfs[ci], uu[0, ci]) * fl[0]
            c1 = _sample_pauli(cdfs[ci], uu[1, ci]) * fl[1]
            s = _apply_pauli_phase(x, z, s, w0, o0, c0)
            s = _apply_pauli_phase(x, z, s, w1, o1, c1)
        for ci in range(n_ch2):
            c = _sample_pauli16(cdfs2[ci], uu2[ci]) * fl2
            s = _apply_pauli_phase(x, z, s, w0, o0, c >> 2)
            s = _apply_pauli_phase(x, z, s, w1, o1, c & 3)
        return (x, z, s), None

    (x, z, s), _ = lax.scan(step, (x, z, s),
                            (t0, t1, txs, tzs, tss, flags, us, flags2, us2))
    return x, z, s


class StabilizerTrajectoryProgram(TrajectoryProgram):
    """Noisy Clifford QASM as vmapped tableau trajectories.

    Inherits the creg/feed-forward machinery and the host sampling API
    from :class:`TrajectoryProgram`; the quantum state is the bit-packed
    stabilizer tableau instead of 2^n amplitudes.
    """

    def __init__(self, ast, noise=None):
        from ..run.compiler import elaborate
        from ..run.noisy import split_readout_spec

        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)
        self.readout_p = None
        if isinstance(noise, str):
            noise, self.readout_p = split_readout_spec(noise)
            self.cdfs, self.cdfs2 = pauli_channel_cdfs(noise)
        else:
            self.cdfs = np.asarray(noise if noise is not None
                                   else np.zeros((0, 4), np.float32))
            self.cdfs2 = np.zeros((0, 16), np.float32)
        self.noise = ([("pauli", None)]
                      if len(self.cdfs) or len(self.cdfs2) else [])
        self.creg_names = sorted(self.cregs0)
        self.creg_sizes = {c: len(self.cregs0[c].bits)
                           for c in self.creg_names}
        self._site = 0
        self.used_frames = False

    def _traj_live_cost(self) -> int:
        words = (self.n + 31) // 32
        return max(1, 2 * self.n * words * 2 + 2 * self.n)

    # -- traced execution ---------------------------------------------------

    def _gates(self, tab, prims, key):
        from ..core.gates import Prim

        x, z, s = tab
        n = self.n
        packed = _pack_chain(prims, n)
        if packed is None:
            raise NotPauliChannelError(
                "stabilizer trajectories apply 1- and 2-qubit Clifford "
                "prims; decompose wider prims first")
        from .frames import _noise_flags

        length = packed[0].shape[0]
        flags = _noise_flags(prims, length)
        us = jax.random.uniform(jax.random.fold_in(key, self._site),
                                (length, 2, max(len(self.cdfs), 1)))
        self._site += 1
        us2 = jax.random.uniform(jax.random.fold_in(key, self._site),
                                 (length, max(len(self.cdfs2), 1)))
        self._site += 1
        if not len(self.cdfs) and not len(self.cdfs2):
            from .tableau import _apply_scan_impl

            x, z, s = _apply_scan_impl(x, z, s,
                                       *(jnp.asarray(a) for a in packed))
        else:
            from .frames import _noise_flags2

            x, z, s = _noisy_scan(x, z, s, packed, flags, self.cdfs, us,
                                  _noise_flags2(prims, length),
                                  self.cdfs2, us2)
        return (x, z, s)

    def _measure(self, tab, qubits, key):
        x, z, s = tab
        qs = jnp.asarray(np.asarray(qubits, dtype=np.uint32))
        rnd = jax.random.bernoulli(
            jax.random.fold_in(key, self._site), 0.5, (len(qubits),))
        self._site += 1
        outs, x, z, s = _measure_seq_impl(x, z, s, qs, rnd, self.n)
        return [o.astype(jnp.int32) for o in outs], (x, z, s)

    def _exec(self, events, tab, cregs, key, pred):
        from ..run.compiler import (EvCond, EvDump, EvGates, EvMeasure,
                                    EvReset)

        for ev in events:
            if isinstance(ev, EvGates):
                new = self._gates(tab, ev.prims, key)
                tab = self._sel(pred, new, tab)
            elif isinstance(ev, EvMeasure):
                bits, new = self._measure(tab, ev.qubits, key)
                tab = self._sel(pred, new, tab)
                self._write_creg_bits(cregs, ev.writes,
                                      self._readout(bits, key), pred)
            elif isinstance(ev, EvReset):
                # reference reset = projection to |0> (renormalizing,
                # src/Qubism/QASM/Simulation.hs:146-156): measuring with
                # a FORCED 0 outcome makes the random-branch tableau
                # update exactly that projection (an entangled partner
                # collapses consistently with 0, never with a Born draw).
                # A |1>-certain qubit would project to the zero vector —
                # inexpressible in the formalism — and falls back to the
                # X flip below (tableau X = phase flip on rows with the
                # z-bit set), the physical-reset semantics.
                x, z, s = tab
                qs = jnp.asarray(np.asarray(ev.qubits, dtype=np.uint32))
                zeros = jnp.zeros((len(ev.qubits),), dtype=bool)
                outs, x, z, s = _measure_seq_impl(x, z, s, qs, zeros,
                                                  self.n)
                bits = [o.astype(jnp.int32) for o in outs]
                for q, b in zip(ev.qubits, bits):
                    w = jnp.int32(q >> 5)
                    off = jnp.uint32(q & 31)
                    s = _apply_pauli_phase(
                        x, z, s, w, off, jnp.uint32(1) * b.astype(jnp.uint32))
                tab = self._sel(pred, (x, z, s), tab)
            elif isinstance(ev, EvCond):
                hit = self._cond_hit(cregs, ev)
                sub = hit if pred is None else jnp.logical_and(pred, hit)
                tab, cregs = self._exec(ev.body, tab, cregs, key, sub)
            elif isinstance(ev, EvDump):
                pass
            else:  # pragma: no cover
                raise TypeError(f"unknown event {type(ev).__name__}")
        return tab, cregs

    # -- Pauli-frame fast path ---------------------------------------------

    def _frame_plan(self):
        """(prims, final_measure_event) when the program is
        frame-eligible: Clifford gates followed by ONE final measurement
        — no mid-circuit observation, feed-forward, or reset (those need
        the exact per-trajectory tableaux)."""
        from ..run.compiler import EvGates, EvMeasure

        evs = list(self.events)
        if not evs or not isinstance(evs[-1], EvMeasure):
            return None
        if any(not isinstance(e, EvGates) for e in evs[:-1]):
            return None
        return [p for e in evs[:-1] for p in e.prims], evs[-1]

    def _frame_plan_midcircuit(self):
        """The event stream when it is MID-CIRCUIT frame-eligible
        (stabilizer/frames.py:frame_run_vals_events): gates, measurements
        and resets, no feed-forward, at least one measurement — and every
        reset qubit either untouched so far or covered by the immediately
        preceding measurement (where the frame executor's physical-reset
        semantics coincide with the reference's projection reset)."""
        from ..run.compiler import EvDump, EvGates, EvMeasure, EvReset

        evs = [e for e in self.events if not isinstance(e, EvDump)]
        if not any(isinstance(e, EvMeasure) for e in evs):
            return None
        touched: set[int] = set()
        prev = None
        for ev in evs:
            if isinstance(ev, EvGates):
                touched |= {t for p in ev.prims for t in p.targets}
            elif isinstance(ev, EvMeasure):
                touched |= set(ev.qubits)
            elif isinstance(ev, EvReset):
                fresh = all(q not in touched for q in ev.qubits)
                measured = (isinstance(prev, EvMeasure)
                            and set(ev.qubits) <= set(prev.qubits))
                if not (fresh or measured):
                    return None
                touched |= set(ev.qubits)
            else:
                return None
            prev = ev
        return evs

    def run_vals(self, ntraj: int, seed: int | None = None, key=None,
                 return_states: bool = False, mesh=None):
        """Trajectory outcomes; final-measurement-only programs ride the
        Pauli-frame executor (stabilizer/frames.py — (2n)-BIT frames per
        trajectory instead of full tableaux), everything else the exact
        vmapped-tableau path. ``self.used_frames`` records which ran.
        Mid-circuit measure/reset programs WITHOUT feed-forward (the
        r-round QEC-memory shape) ride the Stim-style mid-circuit frame
        scan (``frame_run_vals_events``). The paths draw randomness
        differently, so a given seed's outcomes (not distributions)
        differ between them. The frame paths are one scan + matmul per
        batch — already device-trivial — so ``mesh`` shards only the
        vmapped-tableau fallback."""
        from .frames import frame_run_vals, frame_run_vals_events

        self.used_frames = False
        if not return_states and self.n:
            plan = self._frame_plan()
            if plan is not None:
                if key is None:
                    key = jax.random.PRNGKey(0 if seed is None else seed)
                out = frame_run_vals(self, plan[0], plan[1], ntraj, key)
                if out is not None:
                    self.used_frames = True
                    return out
            else:
                evs = self._frame_plan_midcircuit()
                if evs is not None:
                    if key is None:
                        key = jax.random.PRNGKey(0 if seed is None else seed)
                    out = frame_run_vals_events(self, evs, ntraj, key)
                    if out is not None:
                        self.used_frames = True
                        return out
        return super().run_vals(ntraj, seed=seed, key=key,
                                return_states=return_states, mesh=mesh)

    def expectation(self, pauli: str, ntraj: int, seed: int | None = None,
                    key=None, mesh=None):
        """Monte-Carlo <P>; gates-only programs (no measurement anywhere
        — a frame cannot reproduce post-collapse expectations) ride the
        frame executor: one clean tableau + (T, n/32)-bit frames instead
        of T tableaux. ``self.used_frames`` records which ran."""
        from ..ops.measure import _check_pauli
        from ..run.compiler import EvGates
        from .frames import frame_expectation

        pauli = _check_pauli(pauli, self.n)
        self.used_frames = False
        if self.n and all(isinstance(e, EvGates) for e in self.events):
            if key is None:
                key = jax.random.PRNGKey(0 if seed is None else seed)
            prims = [p for e in self.events for p in e.prims]
            out = frame_expectation(self, prims, pauli, ntraj, key)
            if out is not None:
                self.used_frames = True
                return out
        return super().expectation(pauli, ntraj, seed=seed, key=key,
                                   mesh=mesh)

    def expectations(self, paulis, ntraj: int, seed: int | None = None,
                     key=None, mesh=None):
        """Many <P> at once; gates-only programs evaluate every string
        against ONE frame propagation, otherwise one vector-valued
        tableau run."""
        from ..ops.measure import _check_pauli
        from ..run.compiler import EvGates
        from .frames import frame_expectations

        self.used_frames = False
        if self.n and all(isinstance(e, EvGates) for e in self.events):
            ups = [_check_pauli(p, self.n) for p in paulis]
            if key is None:
                key = jax.random.PRNGKey(0 if seed is None else seed)
            prims = [p for e in self.events for p in e.prims]
            out = frame_expectations(self, prims, ups, ntraj, key)
            if out is not None:
                self.used_frames = True
                return out
        return super().expectations(paulis, ntraj, seed=seed, key=key,
                                    mesh=mesh)

    def expectation_sum(self, terms, ntraj: int, seed: int | None = None,
                        key=None, mesh=None):
        """Monte-Carlo <H> for a Pauli sum; gates-only programs ride ONE
        frame propagation for ALL terms (see frames.py)."""
        from ..ops.measure import _check_pauli
        from ..run.compiler import EvGates
        from .frames import frame_expectation_sum

        terms = tuple((float(c), _check_pauli(p, self.n)) for c, p in terms)
        self.used_frames = False
        if self.n and all(isinstance(e, EvGates) for e in self.events):
            if key is None:
                key = jax.random.PRNGKey(0 if seed is None else seed)
            prims = [p for e in self.events for p in e.prims]
            out = frame_expectation_sum(self, prims, terms, ntraj, key)
            if out is not None:
                self.used_frames = True
                return out
        return super().expectation_sum(terms, ntraj, seed=seed, key=key,
                                       mesh=mesh)

    def _expect_final(self, state, pauli: str):
        from .tableau import _expect_impl, _pack_pauli

        x, z, s = state
        px, pz = _pack_pauli(pauli)
        return _expect_impl(x, z, s, jnp.asarray(px), jnp.asarray(pz),
                            self.n)

    def _run_one(self, key):
        self._site = 0
        cregs = {c: jnp.zeros(self.creg_sizes[c], dtype=jnp.int32)
                 for c in self.creg_names}
        if self.n:
            t0 = identity_tableau(self.n)
            tab = (t0.x, t0.z, t0.s)
            tab, cregs = self._exec(self.events, tab, cregs, key, None)
        else:
            tab = None
        vals = tuple(cregs[c] for c in self.creg_names)
        return vals, tab
