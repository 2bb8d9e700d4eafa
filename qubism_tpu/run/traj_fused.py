"""Fused-Pallas trajectory execution for mixture noise at large n.

The vmapped per-trajectory engine (``run/noisy.py``) re-traces every gate,
noise channel and per-qubit measurement as generic XLA ops: at n=26 a
single trajectory costs ~150 full-state passes, each paying XLA's
transpose/materialization overhead — measured 4.7 s/trajectory on a v5e
(256 trajectories in ~1200 s). For the most common noise family that is
absurd: **mixed-unitary channels** (depolarizing, Pauli, bit/phase-flip —
``_unitary_mix``) have state-INDEPENDENT branch probabilities, so a
trajectory's entire noise realization can be drawn host-side before the
state exists.

This module exploits that: realize every site's unitary on the host, fold
it into the adjacent gate's coefficient table, and run the whole
trajectory through the SAME canonical-layout Pallas kernels as the
noiseless engine — with one crucial property: **every trajectory shares
one compiled program.** All content lives in jit *operands*:

* runs of 1q gates (gate x realized Pauli folded) on row qubits apply as
  one ``_layer1q_fn`` streaming pass (coefficients are an SMEM argument);
* 1q gates on lane qubits fold (kron) into ONE 128x128 ``lane_gate``
  matmul per layer — the matrix is an operand;
* 2q gates (noise folded in) apply via the all-dense ``_gate_fn`` variant
  (``pattern=None``), so realized X/Z insertions cannot change the zero
  pattern and force a recompile;
* the final measurement is ONE joint Born sample from |psi|^2 (exactly
  equivalent to the reference's sequential per-qubit measurement,
  StateVec.hs:133-137, under the correct Born rule) instead of ~2 passes
  per qubit.

A GHZ-26 trajectory is then ~27 fused passes in 2 dispatches + 1 sample
dispatch, ~50x fewer state sweeps than the vmapped path.

Eligibility (checked; ``FusedUnsupported`` otherwise — callers fall back):
every noise channel mixed-unitary, all measurements final, no feed-forward
(``if``)/reset after gates start... i.e. the sampling workload shape. The
reference simulator has no noise story at all (SURVEY.md §5), so this
whole engine is TPU-build extension surface.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import config
from ..core.gates import Prim
from ..ops import apply as _apply
from ..ops import kernels
from ..ops.sample import sample_indices_np
from .compiler import EvDump, EvGates, EvMeasure

#: fused passes per jitted chunk (same rationale as CompiledCircuit)
_CHUNK_PASSES = 16

_PAULI_ID = np.eye(2, dtype=np.complex128)


class FusedUnsupported(ValueError):
    """This program/noise shape cannot take the fused trajectory path."""


def _expand_1q_to_slot(m: np.ndarray, pos: int, k: int) -> np.ndarray:
    """kron-expand a 2x2 onto axis ``pos`` of a k-target slot."""
    out = np.eye(1, dtype=np.complex128)
    for j in range(k):
        out = np.kron(out, m if j == pos else _PAULI_ID)
    return out


class _Site:
    """One stochastic noise site: a static CDF and the branch unitaries
    pre-expanded to the owning slot's 2^k x 2^k dims."""

    __slots__ = ("cdf", "mats")

    def __init__(self, cdf: np.ndarray, mats: np.ndarray):
        self.cdf = np.asarray(cdf, dtype=np.float64)
        self.mats = mats  # (branches, 2^k, 2^k) complex

    def realize(self, u: float) -> np.ndarray:
        j = min(int(np.searchsorted(self.cdf, u, side="right")),
                len(self.cdf) - 1)
        return self.mats[j]


class _Slot:
    """One original gate plus its attached noise sites. ``targets`` are
    sorted ascending; ``base`` is the gate matrix in sorted-target axes."""

    __slots__ = ("targets", "base", "sites")

    def __init__(self, targets, base, sites):
        self.targets = targets
        self.base = base
        self.sites = sites  # applied AFTER base, in order

    def realize(self, us) -> np.ndarray:
        m = self.base
        for site, u in zip(self.sites, us):
            m = site.realize(u) @ m
        return m

    @property
    def n_sites(self) -> int:
        return len(self.sites)


def _build_slots(tprog):
    """Walk the program's events into slots; validate eligibility."""
    if config.reference_sqrt_born:
        raise FusedUnsupported(
            "reference sqrt-Born sampling is sequential-per-qubit; the "
            "fused path's joint Born sample matches only the correct rule")
    # channels: numpy mixture data per (arity, descending?) variant
    chans = []
    for variants, is2q in tprog._kchans:
        nv = []
        for kind, kp in variants:
            if kind != "umix":
                raise FusedUnsupported(
                    "state-dependent Kraus channels (amplitude/phase "
                    "damping) need in-trace MCWF weights; use the vmapped "
                    "engine")
            cdf, urs, uis = (np.asarray(x) for x in kp)
            nv.append((cdf, urs.astype(np.complex128)
                       + 1j * uis.astype(np.complex128)))
        chans.append((nv, is2q))

    slots: list[_Slot] = []
    measures: list[EvMeasure] = []
    for ev in tprog.events:
        if isinstance(ev, EvGates):
            if measures:
                raise FusedUnsupported(
                    "gates after measurement (mid-circuit measurement / "
                    "feed-forward): use the vmapped engine")
            for p in ev.prims:
                if len(p.targets) > 2:
                    raise FusedUnsupported(
                        f"{len(p.targets)}-target primitive")
                u = np.asarray(p.dense() if p.diag else p.u,
                               dtype=np.complex128)
                u, targets = _apply._sort_targets(u, tuple(p.targets))
                k = len(targets)
                sites = []
                for (nv, is2q), tset in zip(chans, tprog._tsets):
                    if is2q:
                        if len(p.targets) != 2:
                            continue
                        if tset is not None and not set(
                                int(q) for q in p.targets) <= tset:
                            continue   # targeted coupler channel
                        # mirror the vmapped engine: descending call-site
                        # targets pick the SWAP-conjugated variant, applied
                        # on sorted axes (noisy.py _exec)
                        cdf, mats = nv[p.targets[0] > p.targets[1]]
                        sites.append(_Site(cdf, mats))
                    else:
                        cdf, mats = nv[0]
                        for q in p.targets:
                            if tset is not None and int(q) not in tset:
                                continue
                            pos = targets.index(int(q))
                            sites.append(_Site(cdf, np.stack([
                                _expand_1q_to_slot(m, pos, k)
                                for m in mats])))
                slots.append(_Slot(targets, u, sites))
        elif isinstance(ev, EvMeasure):
            measures.append(ev)
        elif isinstance(ev, EvDump):
            pass
        else:
            raise FusedUnsupported(
                f"{type(ev).__name__} events: use the vmapped engine")
    return slots, measures


class _LayerStep:
    """A run of disjoint 1q slots: row qubits via one _layer1q_fn pass,
    lane qubits folded (kron) into one 128-wide lane matmul."""

    def __init__(self, slots, n):
        b = max(n - _apply._COL, 0)
        self.row = [s for s in slots if s.targets[0] < b]
        self.lane = [s for s in slots if s.targets[0] >= b]
        self.row.sort(key=lambda s: s.targets[0])
        self.n = n
        self.n_passes = (1 if self.row else 0) + (1 if self.lane else 0)
        self.fns = []
        if self.row:
            self.fns.append(("row", kernels._layer1q_fn(
                tuple(s.targets[0] for s in self.row), n)))
        if self.lane:
            self.fns.append(("lane", kernels._lane_gate_fn(n)))

    def iter_slots(self):
        return self.row + self.lane

    def build_operands(self, mats):
        """mats: realized 2x2 per slot, in iter_slots() order."""
        out = []
        nr = len(self.row)
        if self.row:
            cs = np.stack([np.stack([m.real.astype(np.float32),
                                     m.imag.astype(np.float32)])
                           for m in mats[:nr]])
            out.append(cs)
        if self.lane:
            full = _PAULI_ID
            lane_q = {s.targets[0]: m
                      for s, m in zip(self.lane, mats[nr:])}
            n, b = self.n, max(self.n - _apply._COL, 0)
            full = np.eye(1, dtype=np.complex128)
            for q in range(b, n):
                full = np.kron(full, lane_q.get(q, _PAULI_ID))
            out.append(np.ascontiguousarray(
                full.real.astype(np.float32).T))
            out.append(np.ascontiguousarray(
                full.imag.astype(np.float32).T))
        return out


class _DenseStep:
    """One >=2-target slot: all-dense row/straddle kernel or a pure-lane
    matmul; content enters only through operands."""

    def __init__(self, slot, n):
        self.slot = slot
        self.n = n
        b = max(n - _apply._COL, 0)
        self.n_passes = 1
        if all(t >= b for t in slot.targets):
            self.fns = [("lane", kernels._lane_gate_fn(n))]
            self.pure_lane = True
        else:
            # pattern=None: the shared all-dense compile — realized
            # X/Y/Z insertions must not change the program structure
            self.fns = [("row", kernels._gate_fn(
                slot.targets, n, 0, None, True))]
            self.pure_lane = False

    def iter_slots(self):
        return [self.slot]

    def build_operands(self, mats):
        (m,) = mats
        if self.pure_lane:
            full = _apply.expand_for_view(m, self.n, self.slot.targets)
            return [np.ascontiguousarray(full.real.astype(np.float32).T),
                    np.ascontiguousarray(full.imag.astype(np.float32).T)]
        return [np.stack([m.real.astype(np.float32),
                          m.imag.astype(np.float32)])]


class FusedTrajectories:
    """Compile once, then run trajectories as realized-coefficient sweeps."""

    def __init__(self, tprog):
        self.tprog = tprog
        self.n = tprog.n
        if self.n < 2:
            raise FusedUnsupported("need >= 2 qubits")
        self.slots, self.measures = _build_slots(tprog)

        # group slots into steps: greedy disjoint-1q layers + dense steps
        steps = []
        pend: list[_Slot] = []
        used: set[int] = set()

        def flush():
            nonlocal pend, used
            if pend:
                steps.append(_LayerStep(pend, self.n))
                pend, used = [], set()

        for s in self.slots:
            if len(s.targets) == 1:
                if s.targets[0] in used:
                    flush()
                pend.append(s)
                used.add(s.targets[0])
            else:
                flush()
                steps.append(_DenseStep(s, self.n))
        flush()
        self.steps = steps

        # chunk the steps and jit one body per chunk (structure-stable:
        # operands carry all content)
        self.chunks = []
        cur, passes = [], 0
        for st in steps:
            if cur and passes + st.n_passes > _CHUNK_PASSES:
                self.chunks.append(tuple(cur))
                cur, passes = [], 0
            cur.append(st)
            passes += st.n_passes
        if cur:
            self.chunks.append(tuple(cur))
        self._chunk_fns = [self._make_chunk_fn(c) for c in self.chunks]
        self._init = jax.jit(
            lambda: kernels.to_canon(_apply.zero_state(self.n), self.n))

        # total stochastic sites, in slot order (one uniform each)
        self.total_sites = sum(s.n_sites for s in self.slots)

    @staticmethod
    def _make_chunk_fn(chunk):
        fseq = tuple(kind_fn for st in chunk for kind_fn in st.fns)

        def body(planes, operands):
            it = iter(operands)
            for kind, fn in fseq:
                if kind == "row":
                    planes = fn(planes, next(it))
                else:
                    planes = fn(planes, next(it), next(it))
            return planes

        return jax.jit(body, donate_argnums=0)

    # -- per-trajectory execution -------------------------------------------

    def _realize_operands(self, rng):
        """Draw every site's branch and build the chunked operand lists."""
        us = rng.random(self.total_sites)
        pos = 0
        per_chunk = []
        for chunk in self.chunks:
            ops: list = []
            for st in chunk:
                mats = []
                for s in st.iter_slots():
                    mats.append(s.realize(us[pos:pos + s.n_sites]))
                    pos += s.n_sites
                ops.extend(st.build_operands(mats))
            per_chunk.append(ops)
        return per_chunk

    def run_vals(self, ntraj: int, seed: int | None = None):
        """Same output contract as ``TrajectoryProgram.run_vals``: dict
        creg name -> (ntraj, size) int32 bit arrays (LSB-first columns).
        The random stream is this engine's own (host numpy PCG64 seeded by
        ``seed``) — statistically equivalent to, but not bit-identical
        with, the vmapped engine's key-derived stream."""
        tprog = self.tprog
        rng = np.random.default_rng(0 if seed is None else seed)
        out = {c: np.zeros((ntraj, tprog.creg_sizes[c]), dtype=np.int32)
               for c in tprog.creg_names}
        keys = jax.random.split(
            jax.random.PRNGKey(0 if seed is None else seed), max(ntraj, 1))
        for t in range(ntraj):
            per_chunk = self._realize_operands(rng)
            planes = self._init()
            for fn, ops in zip(self._chunk_fns, per_chunk):
                planes = fn(planes, tuple(jnp.asarray(o) for o in ops))
            if self.measures:
                idx = int(sample_indices_np(planes, self.n, 1, keys[t])[0])
                for ev in self.measures:
                    bits = []
                    for q in ev.qubits:
                        b = (idx >> (self.n - 1 - q)) & 1
                        # readout error flips each REPORTED bit
                        # independently per read (state stays collapsed
                        # on the true bits — noisy.py _readout)
                        if tprog.readout_p and rng.random() < tprog.readout_p:
                            b ^= 1
                        bits.append(b)
                    off = 0
                    for creg, bit_index, count in ev.writes:
                        if bit_index is None:
                            out[creg][t, :count] = bits[off:off + count]
                        else:
                            out[creg][t, bit_index] = bits[off]
                        off += count
            del planes
        return out


def run_vals_fused(tprog, ntraj: int, seed: int | None = None):
    """One-shot helper: build the fused plan and run. Raises
    :class:`FusedUnsupported` when the program shape does not qualify."""
    plan = getattr(tprog, "_fused_plan", None)
    if plan is None:
        plan = FusedTrajectories(tprog)
        tprog._fused_plan = plan
    return plan.run_vals(ntraj, seed=seed)
