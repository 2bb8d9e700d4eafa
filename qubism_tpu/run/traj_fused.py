"""Fused-Pallas trajectory execution for circuit-level noise at large n.

The vmapped per-trajectory engine (``run/noisy.py``) re-traces every gate,
noise channel and per-qubit measurement as generic XLA ops: at n=26 a
single trajectory costs ~150 full-state passes, each paying XLA's
transpose/materialization overhead — measured ~1.1 s/trajectory on a v5e.
This engine instead runs trajectories through the SAME canonical-layout
Pallas kernels as the noiseless engine, with **every trajectory sharing
one compiled program** — all content lives in jit *operands*:

* runs of 1q gates (gate x realized Pauli folded) on row qubits apply as
  one ``_layer1q_fn`` streaming pass (coefficients are an SMEM argument);
* 1q gates on lane qubits fold (kron, traced — tiny 128x128 work) into
  ONE 128-wide ``lane_gate`` matmul per layer;
* 2q gates (noise folded in) apply via the all-dense ``_gate_fn`` variant
  (``pattern=None``), so realized X/Z insertions cannot change the zero
  pattern and force a recompile;
* the final measurement is ONE joint Born sample from |psi|^2 (exactly
  equivalent to the reference's sequential per-qubit measurement,
  src/Qubism/StateVec.hs:133-137, under the correct Born rule) instead
  of ~2 passes per qubit.

**Noise realization.** Mixed-unitary channels (depolarizing, Pauli,
bit/phase-flip — ``_unitary_mix``) have state-INDEPENDENT branch
probabilities, so their realization is drawn host-side and folded into
the adjacent gate's coefficient table — zero extra passes. State-dependent
1q Kraus channels (amplitude/phase damping) run as in-graph **MCWF
norm-branch sites**: one fused reduction computes the jump probability
p_j = <psi| K_j^dag K_j |psi> (K^dag K diagonal for ad/pd, so one
(P0, P1) marginal suffices), the branch index comes from a pre-drawn
host uniform via in-graph searchsorted, and the selected Kraus (scaled
1/sqrt(p_j) — renormalization folded into the coefficients) applies
through the same 1q kernels. One compiled program per circuit shape,
no fallback to the 1.1 s/trajectory vmap path (collapse semantics:
src/Qubism/StateVec.hs:104-129).

**Batched dispatch.** Trajectories run inside ONE device program: the
realized per-trajectory operands stack along a leading batch axis and a
``lax.scan`` sweeps them — state memory stays ONE trajectory (the scan
carry is nothing; each iteration rebuilds |0..0> in place), and the final
Born sample happens inside the scan body. 256 trajectories = 1 dispatch
(vs ~3 dispatches/trajectory sequentially, which through a remote-tunnel
backend was ~2.3x the DMA floor).

Eligibility (checked; ``FusedUnsupported`` otherwise — callers fall back):
all measurements final, no feed-forward (``if``)/reset after gates start,
1q Kraus channels with diagonal K^dag K... i.e. the sampling workload
shape. The reference simulator has no noise story at all (SURVEY.md §5),
so this whole engine is TPU-build extension surface.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import config
from ..ops import apply as _apply
from ..ops import kernels
from ..ops.measure import _marginal_table_traced
from ..ops.sample import (_LEAF_BITS, _sample_parts, _sample_parts_big)
from .compiler import EvDump, EvGates, EvMeasure

_PAULI_ID = np.eye(2, dtype=np.complex128)

#: cap on the stacked-operand upload per batched dispatch (bytes)
_BATCH_OPERAND_CAP = 256 << 20


class FusedUnsupported(ValueError):
    """This program/noise shape cannot take the fused trajectory path."""


def _expand_1q_to_slot(m: np.ndarray, pos: int, k: int) -> np.ndarray:
    """kron-expand a 2x2 onto axis ``pos`` of a k-target slot."""
    out = np.eye(1, dtype=np.complex128)
    for j in range(k):
        out = np.kron(out, m if j == pos else _PAULI_ID)
    return out


def _stack2(m: np.ndarray) -> np.ndarray:
    """complex (d, d) -> (2, d, d) float32 re/im stack."""
    return np.stack([m.real.astype(np.float32), m.imag.astype(np.float32)])


class _Site:
    """One host-realized stochastic noise site: a static CDF and the branch
    unitaries (pre-expanded to the owning slot's 2^k x 2^k dims when
    folded)."""

    __slots__ = ("cdf", "mats")

    def __init__(self, cdf: np.ndarray, mats: np.ndarray):
        self.cdf = np.asarray(cdf, dtype=np.float64)
        self.mats = mats  # (branches, 2^k, 2^k) complex

    def realize(self, u: float) -> np.ndarray:
        j = min(int(np.searchsorted(self.cdf, u, side="right")),
                len(self.cdf) - 1)
        return self.mats[j]


class _Slot:
    """One or more COMPOSED gates plus their noise sites, in program
    order, on a shared sorted target set. ``parts`` is the ordered
    composition: ("fix", matrix) for deterministic gate factors,
    ("site", _Site) for stochastic insertions — so merged slots keep the
    exact gate/noise interleaving of the original stream. ``cond_path``
    is the enclosing feed-forward conditional chain (cond ids): the
    executor selects the realized operand against identity when the
    predicate misses, so a conditional gate costs zero extra passes."""

    __slots__ = ("targets", "parts", "cond_path")

    def __init__(self, targets, base=None, sites=(), parts=None,
                 cond_path=()):
        self.targets = targets
        self.cond_path = tuple(cond_path)
        if parts is not None:
            self.parts = parts
        else:
            self.parts = ([("fix", base)]
                          + [("site", s) for s in sites])

    def realize(self, us) -> np.ndarray:
        m = None
        i = 0
        for kind, payload in self.parts:
            f = payload if kind == "fix" else payload.realize(us[i])
            if kind == "site":
                i += 1
            m = f if m is None else f @ m
        return m

    @property
    def n_sites(self) -> int:
        return sum(1 for k, _ in self.parts if k == "site")


def _expand_to(m: np.ndarray, src, dst) -> np.ndarray:
    """Embed a matrix on ``src`` targets into the ``dst`` target set
    (src a subset of dst, both in MSB-first axis order)."""
    k = len(dst)
    pad = k - len(src)
    m2 = np.kron(np.asarray(m, np.complex128),
                 np.eye(1 << pad, dtype=np.complex128))
    cur = list(src) + [q for q in dst if q not in src]
    perm = [cur.index(q) for q in dst]
    return (m2.reshape((2,) * (2 * k))
            .transpose(perm + [k + p for p in perm])
            .reshape(1 << k, 1 << k))


#: merged-slot width cap: an all-dense 3q block is 8 live terms/row —
#: still DMA-bound on the row kernel (kernels._MAX_STRADDLE_TERMS); 4q
#: (16 terms) measurably leaves the plateau
_MAX_MERGE_TARGETS = 3


def _maybe_merge(a: _Slot, b: _Slot):
    """Compose slot b AFTER slot a on the union target set, or None when
    the merge is not profitable (too wide, or a disjoint-1q pair that
    the layer pass already handles in one sweep) or ILLEGAL (different
    feed-forward predicates select different operands)."""
    if a.cond_path != b.cond_path:
        return None
    dst = tuple(sorted(set(a.targets) | set(b.targets)))
    if len(dst) > _MAX_MERGE_TARGETS:
        return None
    if (len(a.targets) == 1 and len(b.targets) == 1
            and a.targets != b.targets):
        return None

    def lift(slot):
        out = []
        for kind, payload in slot.parts:
            if kind == "fix":
                out.append(("fix", _expand_to(payload, slot.targets, dst)))
            else:
                out.append(("site", _Site(payload.cdf, np.stack(
                    [_expand_to(m, slot.targets, dst)
                     for m in payload.mats]))))
        return out

    return _Slot(dst, parts=lift(a) + lift(b), cond_path=a.cond_path)


class _Mcwf:
    """A state-dependent 1q Kraus channel prepared for in-graph MCWF:
    every K^dag K must be diagonal (true for amplitude/phase damping), so
    branch probabilities are p_j = a_j*P0 + b_j*P1 from one marginal.

    ``monomial`` marks the stronger property that every branch has at
    most one nonzero per COLUMN (ad's {diag, jump}, pd, any Pauli mix):
    then a branch's effect on computational-basis weights is a pure
    reweight-and-REMAP (``rmap[j, b]`` = the row column b maps to), with
    no interference between basis sectors — the condition for the
    deferred-Kraus group path to track marginals exactly. Diagonal-K^dag-K
    channels that are NOT monomial (orthogonal dense columns) still run,
    via the per-site apply step."""

    __slots__ = ("kr", "ki", "ab", "monomial", "rmap")

    def __init__(self, kraus):
        ks = [np.asarray(k, dtype=np.complex128) for k in kraus]
        ab = []
        rmap = []
        self.monomial = True
        for k in ks:
            if k.shape != (2, 2):
                raise FusedUnsupported(
                    "state-dependent Kraus channels on the fused path must "
                    "be single-qubit")
            g = k.conj().T @ k
            if abs(g[0, 1]) > 1e-9 or abs(g[1, 0]) > 1e-9:
                raise FusedUnsupported(
                    "state-dependent Kraus channel with non-diagonal "
                    "K^dag K: needs per-branch norm sweeps; use the "
                    "vmapped engine")
            ab.append((float(g[0, 0].real), float(g[1, 1].real)))
            cols = np.abs(k) > 1e-9
            if (cols.sum(axis=0) > 1).any():
                self.monomial = False
            rmap.append(tuple(int(np.argmax(np.abs(k[:, b])))
                              for b in range(2)))
        self.kr = jnp.asarray(np.stack([k.real for k in ks]), jnp.float32)
        self.ki = jnp.asarray(np.stack([k.imag for k in ks]), jnp.float32)
        self.ab = jnp.asarray(np.asarray(ab), jnp.float32)  # (B, 2)
        self.rmap = jnp.asarray(np.asarray(rmap, np.float32))  # (B, 2)


#: mid-circuit measure/reset events wider than this use the vmapped
#: engine (their 2^k marginal table stops being "tiny")
_MID_MEASURE_MAX = 12


def _build_units(tprog):
    """Walk the program's events into execution units: ("slot", _Slot)
    for gates with folded mixed-unitary noise, ("mcwf", q, _Mcwf, path)
    for in-graph norm-branch sites, ("measure"/"reset", ev, path) for
    mid-circuit collapses, ("cond", cid, creg, value, path) for
    feed-forward predicate evaluation points. The TRAILING run of
    unconditional measure events stays out of the unit stream — it is
    the one joint Born sample. Validates eligibility."""
    if config.reference_sqrt_born:
        raise FusedUnsupported(
            "reference sqrt-Born sampling is sequential-per-qubit; the "
            "fused path's joint Born sample matches only the correct rule")
    # channels: per spec entry, ("umix", numpy mixture data per variant)
    # or ("mcwf", prepared Kraus)
    chans = []
    for (variants, is2q), (_, raw_ks, _) in zip(tprog._kchans, tprog.noise):
        if all(kind == "umix" for kind, _ in variants):
            nv = []
            for _, kp in variants:
                cdf, urs, uis = (np.asarray(x) for x in kp)
                nv.append((cdf, urs.astype(np.complex128)
                           + 1j * uis.astype(np.complex128)))
            chans.append(("umix", nv, is2q))
        else:
            if is2q:
                raise FusedUnsupported(
                    "state-dependent 2q Kraus channels: use the vmapped "
                    "engine")
            chans.append(("mcwf", _Mcwf(raw_ks), False))

    from .compiler import EvCond, EvReset

    units: list[tuple] = []
    cond_ids = iter(range(1 << 30))

    def emit_gates(ev, path):
        for p in ev.prims:
            if len(p.targets) > 2:
                raise FusedUnsupported(
                    f"{len(p.targets)}-target primitive")
            u = np.asarray(p.dense() if p.diag else p.u,
                           dtype=np.complex128)
            u, targets = _apply._sort_targets(u, tuple(p.targets))
            k = len(targets)
            fold: list[_Site] = []
            post: list[tuple] = []   # ("mcwf", ...) | ("slot", _Slot)
            post_qubits: set[int] = set()

            def emit_umix(cdf, mats, qubits, pos=None):
                """Fold when order allows (commutes past post sites on
                other qubits); otherwise a standalone realized unit."""
                if not (set(qubits) & post_qubits):
                    if pos is not None:
                        mats = np.stack([
                            _expand_1q_to_slot(m, pos, k) for m in mats])
                    fold.append(_Site(cdf, mats))
                else:
                    post.append(("slot", _Slot(
                        tuple(sorted(qubits)),
                        np.eye(mats.shape[-1], dtype=np.complex128),
                        [_Site(cdf, mats)], cond_path=path)))

            for (kind, payload, is2q), tset in zip(chans, tprog._tsets):
                if is2q:
                    if len(p.targets) != 2:
                        continue
                    if tset is not None and not set(
                            int(q) for q in p.targets) <= tset:
                        continue   # targeted coupler channel
                    # mirror the vmapped engine: descending call-site
                    # targets pick the SWAP-conjugated variant, applied
                    # on sorted axes (noisy.py _exec)
                    cdf, mats = payload[p.targets[0] > p.targets[1]]
                    emit_umix(cdf, np.asarray(mats), targets)
                elif kind == "umix":
                    cdf, mats = payload[0]
                    for q in p.targets:
                        if tset is not None and int(q) not in tset:
                            continue
                        emit_umix(cdf, np.asarray(mats), (int(q),),
                                  pos=targets.index(int(q)))
                else:   # mcwf
                    for q in p.targets:
                        if tset is not None and int(q) not in tset:
                            continue
                        post.append(("mcwf", int(q), payload, path))
                        post_qubits.add(int(q))
            units.append(("slot", _Slot(targets, u, fold, cond_path=path)))
            units.extend(post)

    def emit(ev, path):
        if isinstance(ev, EvGates):
            emit_gates(ev, path)
        elif isinstance(ev, EvMeasure):
            if len(ev.qubits) > _MID_MEASURE_MAX:
                raise FusedUnsupported(
                    f"mid-circuit measurement of {len(ev.qubits)} qubits: "
                    "use the vmapped engine")
            if len(set(ev.qubits)) != len(ev.qubits):
                raise FusedUnsupported(
                    "mid-circuit re-measurement of a qubit within one "
                    "event: use the vmapped engine")
            units.append(("measure", ev, path))
        elif isinstance(ev, EvReset):
            if len(ev.qubits) > _MID_MEASURE_MAX:
                raise FusedUnsupported(
                    f"reset of {len(ev.qubits)} qubits: use the vmapped "
                    "engine")
            units.append(("reset", ev, path))
        elif isinstance(ev, EvCond):
            cid = next(cond_ids)
            units.append(("cond", cid, ev.creg, ev.value, path))
            for sub in ev.body:
                emit(sub, path + (cid,))
        elif isinstance(ev, EvDump):
            pass
        else:
            raise FusedUnsupported(
                f"{type(ev).__name__} events: use the vmapped engine")

    # the trailing unconditional-measure run is the one joint Born sample;
    # everything before it (including conditional/mid-circuit measures)
    # becomes step units
    evs = [ev for ev in tprog.events if not isinstance(ev, EvDump)]
    cut = len(evs)
    while cut and isinstance(evs[cut - 1], EvMeasure):
        cut -= 1
    measures: list[EvMeasure] = list(evs[cut:])
    for ev in evs[:cut]:
        emit(ev, ())
    return units, measures


# ---------------------------------------------------------------------------
# Traced operand expansion (content stays a tiny operand; the 128-wide lane
# matrices are built in-graph so the host->device upload per trajectory is
# a few hundred bytes, not 128 KB)
# ---------------------------------------------------------------------------


def _kron2(ar, ai, br, bi):
    return (jnp.kron(ar, br) - jnp.kron(ai, bi),
            jnp.kron(ar, bi) + jnp.kron(ai, br))


def _lane_matrix_traced(coefs, positions, n: int):
    """Build the (lanes, lanes) lane-block matrix from per-gate 2x2
    coefficient stacks (L, 2, 2, 2), kron-expanded with identities on the
    untouched lane qubits. Returns (Mr^T, Mi^T) for ``_lane_gate_fn``."""
    b = max(n - _apply._COL, 0)
    mr = jnp.ones((1, 1), jnp.float32)
    mi = jnp.zeros((1, 1), jnp.float32)
    eye = jnp.eye(2, dtype=jnp.float32)
    z2 = jnp.zeros((2, 2), jnp.float32)
    i = 0
    for q in range(b, n):
        if q in positions:
            gr, gi = coefs[i, 0], coefs[i, 1]
            i += 1
        else:
            gr, gi = eye, z2
        mr, mi = _kron2(mr, mi, gr, gi)
    return mr.T, mi.T


def _expand_lane_pair_traced(cs, n: int, targets):
    """Traced ``expand_for_view`` for a pure-lane k-target gate: (2, 2^k,
    2^k) re/im stack -> transposed (lanes, lanes) planes."""
    b = max(n - _apply._COL, 0)
    dst = tuple(range(b, n))
    m, k = len(dst), len(targets)
    extra = [q for q in dst if q not in targets]
    cur = list(targets) + extra
    perm = [cur.index(q) for q in dst]
    eye = jnp.eye(1 << (m - k), dtype=jnp.float32)

    def ex(x):
        full = jnp.kron(x, eye)
        return (full.reshape((2,) * (2 * m))
                .transpose(perm + [m + p for p in perm])
                .reshape(1 << m, 1 << m))

    return ex(cs[0]).T, ex(cs[1]).T


# ---------------------------------------------------------------------------
# Execution steps
# ---------------------------------------------------------------------------
#
# Every step's ``traced(planes, it, pend)`` threads ``pend``: a dict of
# qubit -> (2, 2, 2) traced re/im stack of a chosen-but-UNAPPLIED MCWF
# Kraus composition. A pending operator commutes past gates on other
# qubits, so it is folded (a tiny traced 2x2 matmul) into the next step
# that touches its qubit instead of paying a full state pass of its own;
# whatever is still pending at a new MCWF group is accounted for by
# reweighting the group's joint marginal table (valid because every
# admitted Kraus has <= 1 nonzero per column, so any composition M keeps
# M^dag M diagonal), and a _FlushStep applies leftovers in ONE fused 1q
# layer when the table would outgrow ``_MCWF_TABLE_MAX`` bits.


def _mat2_compose(a, b):
    """(2, d, d) re/im stacks -> a @ b (a applied AFTER b)."""
    hi = jax.lax.Precision.HIGHEST
    ar, ai = a[0], a[1]
    br, bi = b[0], b[1]
    return jnp.stack([
        jnp.dot(ar, br, precision=hi) - jnp.dot(ai, bi, precision=hi),
        jnp.dot(ar, bi, precision=hi) + jnp.dot(ai, br, precision=hi)])


def _expand_1q_traced(m, pos, k: int):
    """Traced (2, 2, 2) -> (2, 2^k, 2^k): identity on the other axes of a
    k-target slot (MSB-first axis order)."""
    eye = jnp.eye(2, dtype=jnp.float32)
    z2 = jnp.zeros((2, 2), jnp.float32)
    mr = jnp.ones((1, 1), jnp.float32)
    mi = jnp.zeros((1, 1), jnp.float32)
    for j in range(k):
        gr, gi = (m[0], m[1]) if j == pos else (eye, z2)
        mr, mi = _kron2(mr, mi, gr, gi)
    return jnp.stack([mr, mi])


class _TraceCtx:
    """Per-trajectory traced state threaded through the steps: classical
    registers (int32 bit vectors, LSB-first columns — the vmapped
    engine's convention) and the feed-forward predicates evaluated so
    far (cond id -> traced bool; nested hits already AND their parent)."""

    __slots__ = ("cregs", "preds", "alive")

    def __init__(self, cregs):
        self.cregs = cregs
        self.preds = {}
        #: False once a projection-reset annihilated the state (resetting
        #: a qubit certain to be |1> — the reference's nonphysical
        #: collapse semantics, Simulation.hs:146-156; the dense engines
        #: define the result as the zero vector, whose measurement reads
        #: all-zero bits). None = no reset step can annihilate.
        self.alive = None

    def pred(self, path):
        """The active predicate for a unit under ``path`` (None = no
        enclosing conditional). Each hit ANDed its parent at evaluation,
        so the innermost id carries the whole chain."""
        return self.preds[path[-1]] if path else None


def _sel_mat(pred, cs):
    """Operand-level feed-forward: the realized matrix stack when
    ``pred`` hits, identity otherwise (dims from cs: (2, d, d))."""
    d = cs.shape[-1]
    eye = jnp.stack([jnp.eye(d, dtype=jnp.float32),
                     jnp.zeros((d, d), jnp.float32)])
    return jnp.where(pred, cs, eye)


class _CondEnterStep:
    """Evaluate `if (creg == value)` at its program position (cregs may
    change at any mid-circuit measurement) and record the traced hit —
    ANDed with the parent predicate for nested conditionals. Touches no
    state."""

    n_sites = 0

    def __init__(self, cid, creg, value, path, size):
        self.cid = cid
        self.creg = creg
        self.value = value
        self.path = path
        self.size = size
        self.fits = not (value >> size)
        self.want = jnp.asarray([(value >> k) & 1 for k in range(size)],
                                dtype=jnp.int32)

    def realize(self, us):
        return []

    def traced(self, planes, it, pend, ctx):
        if not self.fits:            # value cannot fit: never true
            hit = jnp.bool_(False)
        else:
            hit = jnp.all(ctx.cregs[self.creg] == self.want)
        parent = ctx.pred(self.path)
        if parent is not None:
            hit = jnp.logical_and(parent, hit)
        ctx.preds[self.cid] = hit
        return planes


class _MidMeasureStep:
    """Mid-circuit measurement: ONE fused marginal-table sweep + the
    ancestral Born draws (operand uniforms) + one fused projection pass
    collapsing every measured qubit jointly (ops/measure machinery — the
    compiled engine's path, reused verbatim). Under a feed-forward
    predicate the projection vectors and creg writes select against
    no-ops. Readout error flips the REPORTED bits only (the state
    collapses on the true outcome — noisy.py _readout)."""

    def __init__(self, ev, n, path, readout_p):
        self.qubits = tuple(ev.qubits)
        self.writes = tuple(ev.writes)
        self.n = n
        self.path = path
        self.readout_p = float(readout_p) if readout_p else 0.0
        k = len(self.qubits)
        self.n_sites = k * (2 if self.readout_p else 1)

    def realize(self, us):
        return [np.asarray(us, dtype=np.float32)]

    def traced(self, planes, it, pend, ctx):
        from ..ops.measure import (_ancestral_draws_traced,
                                   _projection_rowcol_traced)

        us = next(it)
        k = len(self.qubits)
        cur = _marginal_table_traced(planes, self.n, self.qubits)
        outcomes, mask, _ = _ancestral_draws_traced(
            cur, self.qubits, None, False, uniforms=us[:k])
        mass = jnp.sum(cur * mask)
        scale = jnp.where(mass > 0, 1.0 / jnp.sqrt(mass), 0.0)
        re, im = planes
        rowvec, colvec = _projection_rowcol_traced(
            outcomes, self.qubits, self.n, scale, re.dtype)
        pred = ctx.pred(self.path)
        if pred is not None:
            rowvec = jnp.where(pred, rowvec, jnp.ones_like(rowvec))
            colvec = jnp.where(pred, colvec, jnp.ones_like(colvec))
        r = rowvec.shape[0]
        c = colvec.shape[0]
        ind = rowvec[:, None] * colvec[None, :]
        planes = ((re.reshape(r, c) * ind).reshape(re.shape),
                  (im.reshape(r, c) * ind).reshape(im.shape))
        reported = list(outcomes)
        if self.readout_p:
            for i in range(k):
                flip = (us[k + i] < self.readout_p).astype(jnp.int32)
                reported[i] = reported[i] ^ flip
        off = 0
        for creg, bit_index, count in self.writes:
            old = ctx.cregs[creg]
            if bit_index is None:
                val = jnp.stack([b.astype(jnp.int32)
                                 for b in reported[off:off + count]])
                if val.shape[0] < old.shape[0]:
                    val = jnp.concatenate(
                        [val, old[val.shape[0]:]])
            else:
                val = old.at[bit_index].set(reported[off])
            ctx.cregs[creg] = (val if pred is None
                               else jnp.where(pred, val, old))
            off += count
        return planes


class _ResetStep:
    """Mid-circuit reset: the reference's projection-to-|0> semantics
    (collapse + renormalize, NO Born draw — Simulation.hs:146-156) as one
    marginal sweep + one fused projection pass, predicate-selectable."""

    n_sites = 0

    def __init__(self, ev, n, path):
        self.qubits = tuple(dict.fromkeys(ev.qubits))    # dedupe, ordered
        self.n = n
        self.path = path
        k = len(self.qubits)
        srt = sorted(self.qubits)
        tidx = np.arange(1 << k, dtype=np.int64)
        m = np.ones(1 << k, dtype=np.float32)
        for s, _q in enumerate(srt):
            m *= 1.0 - ((tidx >> (k - 1 - s)) & 1)
        self._mask0 = jnp.asarray(m)

    def realize(self, us):
        return []

    def traced(self, planes, it, pend, ctx):
        from ..ops.measure import _projection_rowcol_traced

        cur = _marginal_table_traced(planes, self.n, self.qubits)
        mass = jnp.sum(cur * self._mask0)
        scale = jnp.where(mass > 0, 1.0 / jnp.sqrt(mass), 0.0)
        re, im = planes
        zeros = [jnp.int32(0)] * len(self.qubits)
        rowvec, colvec = _projection_rowcol_traced(
            zeros, self.qubits, self.n, scale, re.dtype)
        pred = ctx.pred(self.path)
        killed = mass <= 0
        if pred is not None:
            rowvec = jnp.where(pred, rowvec, jnp.ones_like(rowvec))
            colvec = jnp.where(pred, colvec, jnp.ones_like(colvec))
            killed = jnp.logical_and(pred, killed)
        alive = jnp.logical_not(killed)
        ctx.alive = alive if ctx.alive is None else (ctx.alive & alive)
        r = rowvec.shape[0]
        c = colvec.shape[0]
        ind = rowvec[:, None] * colvec[None, :]
        return ((re.reshape(r, c) * ind).reshape(re.shape),
                (im.reshape(r, c) * ind).reshape(im.shape))


def _row_layer_groups(qubits, n: int):
    """Split row-layer qubits into passes obeying the kernel VMEM caps
    (fusion.py's prepass invariants: <= _MAX_AXIS_SLOTS axis-mechanism
    targets and <= _LAYER1Q_MAX sub-gates per _layer1q_fn call — a
    4-axis window is 143 MB > the 128 MB chip VMEM)."""
    from ..ops.fusion import _LAYER1Q_MAX, _MAX_AXIS_SLOTS

    groups: list[list[int]] = []
    cur: list[int] = []
    ax = 0
    for q in qubits:
        is_axis = kernels._mech(q, n)[0] == "axis"
        if cur and (len(cur) >= _LAYER1Q_MAX
                    or (is_axis and ax >= _MAX_AXIS_SLOTS)):
            groups.append(cur)
            cur, ax = [], 0
        cur.append(q)
        ax += is_axis
    if cur:
        groups.append(cur)
    return groups


class _LayerStep:
    """A run of disjoint 1q slots: row qubits via _layer1q_fn passes
    (chunked to the kernel's VMEM caps — usually one), lane qubits
    folded (traced kron) into one 128-wide lane matmul. ``absorb`` (set
    by the planner) lists pending-Kraus qubits composed into the
    matching slot's coefficients."""

    def __init__(self, slots, n, absorb=()):
        b = max(n - _apply._COL, 0)
        self.row = [s for s in slots if s.targets[0] < b]
        self.lane = [s for s in slots if s.targets[0] >= b]
        self.row.sort(key=lambda s: s.targets[0])
        self.lane.sort(key=lambda s: s.targets[0])
        self.n = n
        self.n_sites = sum(s.n_sites for s in self.row + self.lane)
        self.absorb_row = tuple(
            (i, s.targets[0]) for i, s in enumerate(self.row)
            if s.targets[0] in absorb)
        self.absorb_lane = tuple(
            (i, s.targets[0]) for i, s in enumerate(self.lane)
            if s.targets[0] in absorb)
        if self.row:
            row_qs = [s.targets[0] for s in self.row]
            self._row_groups = []              # (slice, fn) per pass
            off = 0
            for grp in _row_layer_groups(row_qs, n):
                fn = kernels._layer1q_fn(tuple(grp), n, donate=False)
                self._row_groups.append((slice(off, off + len(grp)), fn))
                off += len(grp)
        if self.lane:
            self._lane_fn = kernels._lane_gate_fn(n, donate=False)
            self._lane_pos = tuple(s.targets[0] for s in self.lane)

    def realize(self, us):
        mats, pos = [], 0
        for s in self.row + self.lane:
            mats.append(s.realize(us[pos:pos + s.n_sites]))
            pos += s.n_sites
        out = []
        nr = len(self.row)
        if self.row:
            out.append(np.stack([_stack2(m) for m in mats[:nr]]))
        if self.lane:
            out.append(np.stack([_stack2(m) for m in mats[nr:]]))
        return out

    def traced(self, planes, it, pend, ctx):
        def conds(cs, slots):
            for i, s in enumerate(slots):
                pred = ctx.pred(s.cond_path)
                if pred is not None:
                    cs = cs.at[i].set(_sel_mat(pred, cs[i]))
            return cs

        if self.row:
            cs = conds(next(it), self.row)
            for i, q in self.absorb_row:
                cs = cs.at[i].set(_mat2_compose(cs[i], pend.pop(q)))
            for sl, fn in self._row_groups:
                planes = fn(planes, cs[sl])
        if self.lane:
            cs = conds(next(it), self.lane)
            for i, q in self.absorb_lane:
                cs = cs.at[i].set(_mat2_compose(cs[i], pend.pop(q)))
            mr, mi = _lane_matrix_traced(cs, self._lane_pos, self.n)
            planes = self._lane_fn(planes, mr, mi)
        return planes


class _DenseStep:
    """One >=2-target slot: all-dense row/straddle kernel or a pure-lane
    matmul; content enters only through a (2, 2^k, 2^k) operand.
    Pending Kraus on ``absorb`` qubits compose into the operand."""

    def __init__(self, slot, n, absorb=()):
        self.slot = slot
        self.n = n
        self.n_sites = slot.n_sites
        self.absorb = tuple(q for q in slot.targets if q in absorb)
        b = max(n - _apply._COL, 0)
        self.pure_lane = all(t >= b for t in slot.targets)
        if self.pure_lane:
            self._fn = kernels._lane_gate_fn(n, donate=False)
        else:
            # pattern=None: the shared all-dense compile — realized
            # X/Y/Z insertions must not change the program structure
            self._fn = kernels._gate_fn(slot.targets, n, 0, None,
                                        donate=False)

    def realize(self, us):
        return [_stack2(self.slot.realize(us))]

    def traced(self, planes, it, pend, ctx):
        cs = next(it)
        pred = ctx.pred(self.slot.cond_path)
        if pred is not None:
            cs = _sel_mat(pred, cs)
        k = len(self.slot.targets)
        for q in self.absorb:
            cs = _mat2_compose(cs, _expand_1q_traced(
                pend.pop(q), self.slot.targets.index(q), k))
        if self.pure_lane:
            mr, mi = _expand_lane_pair_traced(cs, self.n, self.slot.targets)
            return self._fn(planes, mr, mi)
        return self._fn(planes, cs)


class _FlushStep:
    """Apply every pending Kraus on ``qubits`` in ONE fused pass (they
    sit on distinct qubits, so a 1q layer covers all of them)."""

    n_sites = 0

    def __init__(self, qubits, n):
        b = max(n - _apply._COL, 0)
        self.n = n
        self.row_qs = tuple(sorted(q for q in qubits if q < b))
        self.lane_qs = tuple(sorted(q for q in qubits if q >= b))
        if self.row_qs:
            self._row_groups = [
                (tuple(grp), kernels._layer1q_fn(tuple(grp), n,
                                                 donate=False))
                for grp in _row_layer_groups(list(self.row_qs), n)]
        if self.lane_qs:
            self._lane_fn = kernels._lane_gate_fn(n, donate=False)

    def realize(self, us):
        return []

    def traced(self, planes, it, pend, ctx):
        if self.row_qs:
            for grp, fn in self._row_groups:
                cs = jnp.stack([pend.pop(q) for q in grp])
                planes = fn(planes, cs)
        if self.lane_qs:
            cs = jnp.stack([pend.pop(q) for q in self.lane_qs])
            mr, mi = _lane_matrix_traced(cs, self.lane_qs, self.n)
            planes = self._lane_fn(planes, mr, mi)
        return planes


class _McwfApplyStep:
    """Per-site MCWF fallback for diagonal-K^dag-K channels whose
    branches are NOT monomial (orthogonal dense columns — e.g. a
    Hadamard-like branch): one fused (P0, P1) reduction on the CURRENT
    state, then the chosen renormalized Kraus applied as its own 1q
    pass. The planner flushes every pending Kraus first, so the
    reduction sees the true state."""

    n_sites = 1

    def __init__(self, q, mcwf, n, path=()):
        self.q, self.mc, self.n = q, mcwf, n
        self.path = path
        b = max(n - _apply._COL, 0)
        self.lane = q >= b
        if self.lane:
            self._fn = kernels._lane_gate_fn(n, donate=False)
        else:
            self._fn = kernels._layer1q_fn((q,), n, donate=False)

    def realize(self, us):
        return [np.float32(us[0])]

    def traced(self, planes, it, pend, ctx):
        assert not pend      # planner flushed before this step
        u = next(it)
        w = _marginal_table_traced(planes, self.n, (self.q,))
        p0, p1 = w[0], w[1]
        probs = self.mc.ab[:, 0] * p0 + self.mc.ab[:, 1] * p1      # (B,)
        cdf = jnp.cumsum(probs)
        j = jnp.clip(jnp.searchsorted(cdf, u * cdf[-1], side="right"),
                     0, probs.shape[0] - 1)
        inv = jax.lax.rsqrt(jnp.maximum(probs[j] / jnp.maximum(
            p0 + p1, jnp.float32(1e-30)), jnp.float32(1e-30)))
        coefs = jnp.stack([self.mc.kr[j], self.mc.ki[j]]) * inv
        pred = ctx.pred(self.path)
        if pred is not None:
            coefs = _sel_mat(pred, coefs)
        coefs = coefs[None]
        if self.lane:
            mr, mi = _lane_matrix_traced(coefs, (self.q,), self.n)
            return self._fn(planes, mr, mi)
        return self._fn(planes, coefs)


#: joint-marginal width cap for an MCWF group (sites + pending qubits);
#: the table is 2^k scalars — tiny — but the lane fold matrix in
#: _marginal_table_traced grows as (2048, 2^{lane bits}), so keep k small
_MCWF_TABLE_MAX = 8


class _McwfGroupStep:
    """A run of in-graph MCWF norm-branch sites sharing ONE fused joint
    marginal: |a|^2 reduces over everything but the sites' qubits and the
    currently-pending qubits; pending compositions reweight the table
    (their K^dag K is diagonal); each site's branch then draws from the
    table, updates it, and COMPOSES its chosen (renormalized) Kraus into
    ``pend`` instead of paying an apply pass."""

    def __init__(self, sites, tableqs, pend_qs, n):
        self.sites = tuple(sites)              # ordered (q, _Mcwf, path)
        self.tableqs = tuple(tableqs)          # sorted
        self.pend_qs = tuple(pend_qs)
        self.n = n
        self.n_sites = len(self.sites)
        k = len(self.tableqs)
        idx = np.arange(1 << k)
        self._mask1 = {
            q: jnp.asarray(((idx >> (k - 1 - self.tableqs.index(q))) & 1)
                           .astype(np.float32))
            for q in self.tableqs}
        self._swap = {
            q: jnp.asarray(idx ^ (1 << (k - 1 - self.tableqs.index(q))))
            for q in self.tableqs}

    def realize(self, us):
        return [np.asarray(us, dtype=np.float32)]

    def _remap(self, w, q, c0, c1, r0, r1):
        """Monomial-branch weight update on the table: column b of the
        chosen operator carries weight ``cb`` to bit value ``rb`` —
        reweight both bit sectors AND move them to their target bit."""
        mask1 = self._mask1[q]
        w0 = w * (1.0 - mask1)
        w1 = w * mask1
        sw0 = jnp.take(w0, self._swap[q])       # b=0 weights at bit-1 slots
        sw1 = jnp.take(w1, self._swap[q])
        return (c0 * ((1.0 - r0) * w0 + r0 * sw0)
                + c1 * (r1 * w1 + (1.0 - r1) * sw1))

    def traced(self, planes, it, pend, ctx):
        us = next(it)
        w = _marginal_table_traced(planes, self.n, self.tableqs)
        for q in self.pend_qs:
            m = pend[q]
            c0 = jnp.sum(m[:, :, 0] ** 2)      # column norms of the scaled
            c1 = jnp.sum(m[:, :, 1] ** 2)      # composition = K^dag K diag
            # monomial composition: the nonzero row of each column
            r0 = (m[0, 1, 0] ** 2 + m[1, 1, 0] ** 2
                  > m[0, 0, 0] ** 2 + m[1, 0, 0] ** 2).astype(jnp.float32)
            r1 = (m[0, 1, 1] ** 2 + m[1, 1, 1] ** 2
                  > m[0, 0, 1] ** 2 + m[1, 0, 1] ** 2).astype(jnp.float32)
            w = self._remap(w, q, c0, c1, r0, r1)
        for si, (q, mc, path) in enumerate(self.sites):
            mask1 = self._mask1[q]
            tot = jnp.sum(w)
            p1 = jnp.sum(w * mask1)
            p0 = jnp.maximum(tot - p1, 0.0)
            probs = mc.ab[:, 0] * p0 + mc.ab[:, 1] * p1        # (B,)
            cdf = jnp.cumsum(probs)
            j = jnp.clip(jnp.searchsorted(cdf, us[si] * cdf[-1],
                                          side="right"),
                         0, probs.shape[0] - 1)
            pj = jnp.maximum(probs[j], jnp.float32(1e-30))
            inv = jnp.sqrt(tot) * jax.lax.rsqrt(pj)
            coef = jnp.stack([mc.kr[j], mc.ki[j]]) * inv
            wn = self._remap(w, q, mc.ab[j, 0], mc.ab[j, 1],
                             mc.rmap[j, 0], mc.rmap[j, 1]) * (tot / pj)
            pred = ctx.pred(path)
            if pred is not None:
                coef = _sel_mat(pred, coef)
                wn = jnp.where(pred, wn, w)
            prev = pend.get(q)
            pend[q] = coef if prev is None else _mat2_compose(coef, prev)
            # keep w the weights of the TRUE (renormalized) state so the
            # next site's conditionals read straight off it
            w = wn
        return planes


class FusedTrajectories:
    """Compile once, then run trajectory batches as realized-coefficient
    sweeps inside ONE dispatched ``lax.scan`` program per batch."""

    def __init__(self, tprog):
        self.tprog = tprog
        self.n = tprog.n
        if self.n < 2:
            raise FusedUnsupported("need >= 2 qubits")
        units, self.measures = _build_units(tprog)
        #: any mid-circuit measurement step (cregs come back from the scan)
        self.has_mid = False

        # greedy slot merging: compose consecutive gates (noise sites
        # kept in order) into <= _MAX_MERGE_TARGETS-qubit dense blocks —
        # a CX ladder's one-pass-per-gate stream collapses ~2x (a GHZ-26
        # trajectory: 27 -> ~14 fused passes), and the all-dense row
        # kernel stays DMA-bound at 8 terms/row. MCWF units are natural
        # barriers (state-dependent: cannot commute into a composition).
        fused: list[tuple] = []
        for unit in units:
            if (unit[0] == "slot" and fused and fused[-1][0] == "slot"):
                m = _maybe_merge(fused[-1][1], unit[1])
                if m is not None:
                    fused[-1] = ("slot", m)
                    continue
            fused.append(unit)
        units = fused

        # group units into steps: greedy disjoint-1q layers, dense slots,
        # MCWF groups. ``pend_set`` statically tracks which qubits carry a
        # deferred (chosen-but-unapplied) Kraus at each point: gate steps
        # absorb them, MCWF groups reweight their tables by them, and a
        # _FlushStep applies leftovers when a group's table would outgrow
        # _MCWF_TABLE_MAX bits (and once at the end, before sampling).
        steps: list = []
        lay: list[_Slot] = []
        used: set[int] = set()
        pend_set: list[int] = []

        def flush_layer():
            nonlocal lay, used
            if lay:
                absorb = {s.targets[0] for s in lay} & set(pend_set)
                steps.append(_LayerStep(lay, self.n, absorb=absorb))
                for q in absorb:
                    pend_set.remove(q)
                lay, used = [], set()

        def flush_pend():
            nonlocal pend_set
            if pend_set:
                steps.append(_FlushStep(tuple(pend_set), self.n))
                pend_set = []

        i = 0
        while i < len(units):
            unit = units[i]
            if unit[0] == "mcwf":
                flush_layer()
                if not unit[2].monomial:
                    # interference within a basis sector: marginal tables
                    # cannot track it — apply per site on the true state
                    flush_pend()
                    steps.append(_McwfApplyStep(unit[1], unit[2], self.n,
                                                unit[3]))
                    i += 1
                    continue
                run = []
                while (i < len(units) and units[i][0] == "mcwf"
                       and units[i][2].monomial):
                    run.append((units[i][1], units[i][2], units[i][3]))
                    i += 1
                while run:
                    chunk: list = []
                    cq: set[int] = set()
                    while run and len(cq | {run[0][0]}) <= _MCWF_TABLE_MAX:
                        q, mc, path = run.pop(0)
                        chunk.append((q, mc, path))
                        cq.add(q)
                    tqs = sorted(cq | set(pend_set))
                    if len(tqs) > _MCWF_TABLE_MAX:
                        flush_pend()
                        tqs = sorted(cq)
                    steps.append(_McwfGroupStep(
                        chunk, tqs, tuple(pend_set), self.n))
                    for q, _, _ in chunk:
                        if q not in pend_set:
                            pend_set.append(q)
                continue
            if unit[0] == "cond":
                _, cid, creg, value, path = unit
                steps.append(_CondEnterStep(
                    cid, creg, value, path, tprog.creg_sizes[creg]))
                i += 1
                continue
            if unit[0] == "measure":
                flush_layer()
                flush_pend()    # the marginal must see the true state
                steps.append(_MidMeasureStep(unit[1], self.n, unit[2],
                                             tprog.readout_p))
                self.has_mid = True
                i += 1
                continue
            if unit[0] == "reset":
                flush_layer()
                flush_pend()
                steps.append(_ResetStep(unit[1], self.n, unit[2]))
                i += 1
                continue
            s = unit[1]
            i += 1
            if len(s.targets) == 1:
                if s.targets[0] in used:
                    flush_layer()
                lay.append(s)
                used.add(s.targets[0])
            else:
                flush_layer()
                absorb = set(s.targets) & set(pend_set)
                steps.append(_DenseStep(s, self.n, absorb=absorb))
                for q in absorb:
                    pend_set.remove(q)
        flush_layer()
        flush_pend()
        self.steps = steps

        # total stochastic sites, in step order (one uniform each)
        self.total_sites = sum(st.n_sites for st in self.steps)
        self._bfn_cache: dict[int, object] = {}
        #: device programs dispatched by run_vals (test observability)
        self.dispatch_count = 0
        #: in-scan sampler choice (see _traced_one) + its leaf split
        self._big_sample = self.n >= 18
        self._leaf_r = (_LEAF_BITS if self._big_sample
                        else self.n - max(0, self.n // 2))

    # -- realization ----------------------------------------------------------

    def _realize_operands(self, rng):
        """Draw every site's branch/uniform and build the per-step operand
        lists for ONE trajectory."""
        us = rng.random(self.total_sites)
        pos = 0
        per_step = []
        for st in self.steps:
            per_step.append(st.realize(us[pos:pos + st.n_sites]))
            pos += st.n_sites
        return per_step

    # -- batched device program ----------------------------------------------

    def _traced_one(self, ops, key):
        """One trajectory, traced: |0..0> -> all steps -> one Born sample.
        Returns ((chunk, leaf) int32 sample parts — combined on the host,
        a flat int32 index would overflow past n=31 — and the mid-circuit
        creg vectors in ``creg_names`` order)."""
        R, C = kernels.canon_shape(self.n)
        re = jnp.zeros((R, C), jnp.float32).at[0, 0].set(1.0)
        planes = (re, jnp.zeros((R, C), jnp.float32))
        it = iter(ops)
        pend: dict = {}
        ctx = _TraceCtx({c: jnp.zeros(self.tprog.creg_sizes[c], jnp.int32)
                         for c in self.tprog.creg_names})
        for st in self.steps:
            planes = st.traced(planes, it, pend, ctx)
        assert not pend, "planner left a Kraus pending past the last flush"
        cregs = tuple(ctx.cregs[c] for c in self.tprog.creg_names)
        if not self.measures:
            z = jnp.int32(0)
            return z, z, cregs
        if self._big_sample:
            # the 3-level gather sampler: one fused square+reduce over
            # canonical rows + tiny searches. The flat-cumsum sampler's
            # state-sized prefix scan costs several extra full-state
            # passes PER TRAJECTORY inside the scan body (measured ~20%
            # of the n=26 fused bench), so the threshold here is lower
            # than sample_indices_np's memory-motivated one.
            c, lo = _sample_parts_big(planes, self.n, 1, key)
        else:
            c, lo = _sample_parts(planes, self.n, 1, key)
        c, lo = c[0], lo[0]
        if ctx.alive is not None:
            # an annihilated (zero) state measures as all-zero bits,
            # matching collapse_traced's zero-vector convention
            c = jnp.where(ctx.alive, c, 0)
            lo = jnp.where(ctx.alive, lo, 0)
        return c, lo, cregs

    def _batched_fn(self, T: int):
        fn = self._bfn_cache.get(T)
        if fn is None:
            def run(stacked, keys):
                def body(_, xs):
                    ops, key = xs
                    return 0, self._traced_one(list(ops), key)

                _, (cs, los, cregs) = jax.lax.scan(body, 0, (stacked, keys))
                return cs, los, cregs

            fn = self._bfn_cache[T] = jax.jit(run)
        return fn

    def _auto_batch(self, ops0, ntraj: int) -> int:
        per = sum(int(np.asarray(o).nbytes) for o in ops0)
        return int(max(1, min(ntraj, _BATCH_OPERAND_CAP // max(per, 1))))

    # -- host API -------------------------------------------------------------

    def run_vals(self, ntraj: int, seed: int | None = None,
                 batch: int | None = None):
        """Same output contract as ``TrajectoryProgram.run_vals``: dict
        creg name -> (ntraj, size) int32 bit arrays (LSB-first columns).
        The random stream is this engine's own (host numpy PCG64 seeded by
        ``seed`` for noise realization/readout; key-derived device draws
        for Born sampling and MCWF branch thresholds come through operands
        from the same host stream) — statistically equivalent to, but not
        bit-identical with, the vmapped engine's. ``batch`` overrides the
        operand-budget batch size (results are batch-size invariant: the
        scan body is identical per trajectory)."""
        if batch is not None:
            batch = int(batch)           # numpy ints lack bit_length
            if batch < 1:
                raise ValueError(f"batch must be >= 1, got {batch}")
        tprog = self.tprog
        rng = np.random.default_rng(0 if seed is None else seed)
        out = {c: np.zeros((ntraj, tprog.creg_sizes[c]), dtype=np.int32)
               for c in tprog.creg_names}
        nbits = sum(len(ev.qubits) for ev in self.measures)
        per_traj, flips = [], []
        for _ in range(ntraj):
            ops = self._realize_operands(rng)
            per_traj.append([o for step_ops in ops for o in step_ops])
            if tprog.readout_p:
                # same draw order as the per-trajectory engine: noise
                # realization first, then one reporting flip per read
                flips.append([rng.random() < tprog.readout_p
                              for _ in range(nbits)])
        if ntraj == 0 or not (self.measures or self.has_mid):
            return out

        keys = jax.random.split(
            jax.random.PRNGKey(0 if seed is None else seed), max(ntraj, 1))
        T = batch if batch is not None else self._auto_batch(
            per_traj[0], ntraj)
        # floor the chunk size to a power of two so full chunks are
        # bucket-exact and only the final remainder pays padding
        T = max(1, 1 << (T.bit_length() - 1))
        n_ops = len(per_traj[0])
        idx = np.empty(ntraj, dtype=np.int64)
        r = self._leaf_r
        for lo in range(0, ntraj, T):
            hi = min(lo + T, ntraj)
            cnt = hi - lo
            # pad short batches to the next power of two (repeat the last
            # trajectory, discard its extra outputs): scan length is baked
            # into the compiled program, so bucketing bounds the number of
            # distinct compiles per circuit shape to log2(batch)
            Tb = 1 << (cnt - 1).bit_length()
            sel = list(range(lo, hi)) + [hi - 1] * (Tb - cnt)
            fn = self._batched_fn(Tb)
            stacked = tuple(
                jnp.asarray(np.stack([per_traj[t][i] for t in sel]))
                for i in range(n_ops))
            cs, los, crs = jax.device_get(fn(stacked, keys[np.asarray(sel)]))
            self.dispatch_count += 1
            idx[lo:hi] = ((np.asarray(cs[:cnt]).astype(np.int64) << r)
                          | np.asarray(los[:cnt]).astype(np.int64))
            if self.has_mid:
                # mid-circuit creg writes come back from the scan; the
                # final-measure writes below overwrite them in program
                # order (they are the trailing events)
                for ci, c in enumerate(tprog.creg_names):
                    out[c][lo:hi] = np.asarray(crs[ci][:cnt])

        for t in range(ntraj):
            k = 0
            for ev in self.measures:
                bits = []
                for q in ev.qubits:
                    b = int((idx[t] >> (self.n - 1 - q)) & 1)
                    # readout error flips each REPORTED bit independently
                    # per read (state stays collapsed on the true bits —
                    # noisy.py _readout)
                    if tprog.readout_p and flips[t][k]:
                        b ^= 1
                    k += 1
                    bits.append(b)
                off = 0
                for creg, bit_index, count in ev.writes:
                    if bit_index is None:
                        out[creg][t, :count] = bits[off:off + count]
                    else:
                        out[creg][t, bit_index] = bits[off]
                    off += count
        return out


def run_vals_fused(tprog, ntraj: int, seed: int | None = None):
    """One-shot helper: build the fused plan and run. Raises
    :class:`FusedUnsupported` when the program shape does not qualify."""
    plan = getattr(tprog, "_fused_plan", None)
    if plan is None:
        plan = FusedTrajectories(tprog)
        tprog._fused_plan = plan
    return plan.run_vals(ntraj, seed=seed)
