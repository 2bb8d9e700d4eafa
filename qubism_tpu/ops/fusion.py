"""Gate fusion and the compiled circuit executor.

The interpreter applies one primitive per device step; for deep
measurement-free circuit segments that wastes HBM bandwidth (every gate
reads and writes all 2^n amplitudes). This module lowers a primitive stream
into **fused ops** and compiles the whole segment into one XLA program:

* **Dense block fusion** (qsim-style): consecutive primitives whose combined
  target set stays within ``max_block`` qubits are multiplied (host-side,
  tiny matrices) into a single 2^k x 2^k block — one einsum pass applies
  many gates.
* **Diagonal layers**: diagonal primitives (phase/cz/cu1/rz...) commute with
  each other; consecutive diagonal blocks merge into a :class:`DiagLayer`
  whose factors are applied as broadcast multiplies — XLA fuses an entire
  layer of controlled-phase ladders into ONE elementwise pass over the
  state. This is what makes a 30-qubit QFT bandwidth-bound: each stage is
  one small dense block + one fused diagonal pass instead of ~30 passes.

The executor jits the fused stream with buffer donation, so a step is
in-place in HBM (peak memory ~one state vector, not two).
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gates import Prim, is_diagonal
from . import apply as _apply

DEFAULT_MAX_BLOCK = 5


def default_virtual_shards(n: int) -> int:
    """TPU compilers reject several op patterns on > 2^29-element buffers;
    past n=29 the state is held as 2^v on-chip shards of n-v qubits each
    (the single-chip analog of mesh sharding)."""
    return max(0, n - 29) if jax.default_backend() == "tpu" else 0


def engine_uses_pallas(n: int) -> bool:
    """Whether the compiled engine takes the Pallas path for this size.
    The XLA backend does not fuse multi-op elementwise chains on TPU (one
    HBM pass per op, and slow ones); Pallas kernels give single-sweep ops
    and in-place aliasing."""
    return jax.default_backend() == "tpu" and n >= 14


def zero_state_virtual(n: int, v: int, canonical: bool | None = None):
    """|0...0> as a plane pair (v=0) or a tuple of 2^v shard pairs.

    ``canonical`` selects the Pallas path's 2-D (R, 2048) layout (defaults
    to whether that path will execute the state — see ops/kernels.py on why
    the layout must not change between kernels)."""
    from . import kernels

    if canonical is None:
        # v>0 always runs the (possibly interpreted) pallas shard plan
        canonical = engine_uses_pallas(n - v) or v > 0

    def zeros(m: int, first: bool):
        if canonical:
            re = jnp.zeros(kernels.canon_shape(m), jnp.float32)
            return (re.at[0, 0].set(1) if first else re,
                    jnp.zeros(kernels.canon_shape(m), jnp.float32))
        re = jnp.zeros(1 << m, jnp.float32)
        return (re.at[0].set(1) if first else re, jnp.zeros(1 << m, jnp.float32))

    if v == 0:
        return zeros(n, True)
    return tuple(zeros(n - v, s == 0) for s in range(1 << v))


def state_to_complex_virtual(state, v: int) -> np.ndarray:
    """Host-side numpy complex amplitudes for either representation."""
    if v == 0:
        return _apply.complex_from_planes(state)
    return np.concatenate([_apply.complex_from_planes(sh) for sh in state])


@dataclass(frozen=True)
class DenseOp:
    u: np.ndarray  # (2^k, 2^k) complex128, targets sorted ascending
    targets: tuple[int, ...]


@dataclass(frozen=True)
class StageOp:
    """A 1-qubit dense gate on row qubit q fused with a controlled-phase
    ladder sharing q (the QFT stage shape): one kernel pass
    (kernels.stage_prepare / _stage_fn)."""

    u: np.ndarray                       # (2, 2) complex
    q: int
    factors: tuple                      # ((d (4,), (q, j)), ...) with j > q

    @property
    def targets(self):  # for stats/debug
        return (self.q,)


@dataclass(frozen=True)
class StageBlockOp:
    """Up to FOUR consecutive fused stages on adjacent qubits (the QFT
    shape) collapsed into ONE kernel pass: the intra-block ladder factors
    and all the 1q gates fold into a constant 2^k x 2^k coefficient block,
    and each branch multiplies its own factorized external phase tables
    (kernels.stage_block_prepare)."""

    stages: tuple  # ((u (2,2), q, factors), ...), q strictly ascending

    @property
    def targets(self):  # for stats/debug
        return tuple(q for _, q, _ in self.stages)


@dataclass(frozen=True)
class Layer1QOp:
    """A run of disjoint single-qubit dense gates applied in ONE pass,
    each as a 2-term butterfly while the block sits in VMEM
    (kernels.layer1q_prepare) — the generic RCS u3-layer shape."""

    gates: tuple  # ((u (2,2) complex, q), ...), q ascending, distinct

    @property
    def targets(self):
        return tuple(q for _, q in self.gates)


@dataclass(frozen=True)
class DiagLayer:
    """A product of commuting diagonal factors, applied in one fused pass."""

    factors: tuple[tuple[np.ndarray, tuple[int, ...]], ...]  # (2^k diag, targets)


def _expand(u: np.ndarray, src: tuple[int, ...], dst: tuple[int, ...]) -> np.ndarray:
    """Expand a gate on qubits ``src`` to the superset ``dst`` (both in the
    matrix's bit order; dst sorted ascending) by tensoring identities."""
    m = len(dst)
    k = len(src)
    extra = [q for q in dst if q not in src]
    # current qubit order after kron: src + extra ; permute to dst order
    cur = list(src) + extra
    perm = [cur.index(q) for q in dst]
    full = np.kron(u, np.eye(1 << (m - k), dtype=np.complex128))
    full = (
        full.reshape((2,) * (2 * m))
        .transpose(perm + [m + p for p in perm])
        .reshape(1 << m, 1 << m)
    )
    return full


def _prim_sorted_dense(p: Prim) -> tuple[np.ndarray, tuple[int, ...]]:
    """Primitive as a dense matrix with sorted targets."""
    u = np.asarray(p.dense(), dtype=np.complex128)
    u, targets = _apply._sort_targets(u, p.targets)
    return u, targets


def _union_ok(union: tuple[int, ...], n: int, max_block: int,
              keep_separate_below: int = 0,
              mixed_lane: bool = False) -> bool:
    """Fusion admission by region. Pure-lane unions (all targets in the
    last 7 qubits) are free at any size: they apply as one 128-wide matmul.
    Row-only unions are capped by max_block. Row+lane MIXED unions depend
    on the backend: the Pallas row kernel reaches lane targets as lane
    rolls, so with ``mixed_lane`` they merge like row blocks (<= 4 targets,
    cost-gated by _merge_pays); the XLA path would expand them over the
    whole 128-lane block, so without it they stay separate."""
    if any(t < keep_separate_below for t in union) and len(union) > 1:
        # gates on virtual-shard qubits stay unfused: the cross-shard
        # executor handles single prims cheaply (zero/identity block elision)
        return False
    b = max(n - _apply._COL, 0)
    row = [t for t in union if t < b]
    if any(t >= b for t in union):
        if len(row) == 0:
            return True
        return mixed_lane and len(union) <= min(max_block, 4)
    return len(union) <= max_block


def _pass_cost(u: np.ndarray) -> float:
    """Relative cost of one row-kernel pass applying ``u``, in units of a
    DMA-bound state sweep. Measured on v5e (n=28 steady state): dense k<=2
    blocks run at the 512 GB/s streaming plateau (~8.5 ms), dense k=3 at
    ~10.6 ms, dense k=4 at ~19 ms — the mixing sum (nonzero terms per output
    row; structural zeros are skipped via kernels._zero_pattern) turns the
    kernel compute-bound past ~7 terms. Permutation-like blocks (CX/Toffoli
    chains: 1 term/row) stay DMA-bound at any width."""
    nnz_per_row = float((np.abs(u) > 1e-12).sum(axis=1).mean())
    return max(1.0, nnz_per_row / 7.0)


def _merge_pays(cur_u: np.ndarray, fused_u: np.ndarray, new_u: np.ndarray,
                union: tuple[int, ...], n: int) -> bool:
    """Cost-based fusion admission for row blocks: merge only if one fused
    pass beats the two separate passes (pure-lane unions are matmul-path
    free and skip this)."""
    b = max(n - _apply._COL, 0)
    if all(t >= b for t in union):
        return True
    return _pass_cost(fused_u) < _pass_cost(cur_u) + _pass_cost(new_u)


def _stage_prepass(prims, n: int, keep_separate_below: int = 0):
    """Detect [1q dense on row qubit q] + [run of 2q diagonals (q, j), j>q,
    with trivial q=0 branch] and fuse each into a StageOp — the dominant
    pattern of the QFT (one kernel pass instead of up to four)."""
    b_lane = max(n - _apply._COL, 0)
    out: list = []
    i = 0
    prims = list(prims)
    while i < len(prims):
        p = prims[i]
        ok_head = (not p.diag and len(p.targets) == 1
                   and keep_separate_below <= p.targets[0] < b_lane)
        if ok_head:
            q = p.targets[0]
            ladder = []
            j = i + 1
            while j < len(prims):
                nxt = prims[j]
                if not (nxt.diag and len(nxt.targets) == 2 and q in nxt.targets):
                    break
                other = nxt.targets[0] if nxt.targets[1] == q else nxt.targets[1]
                if other <= q:
                    break
                d = np.asarray(nxt.u, dtype=np.complex128)
                if nxt.targets[0] == other:  # stored (other, q): permute to (q, other)
                    d = d.reshape(2, 2).T.reshape(-1)
                if not (d[0] == 1 and d[1] == 1):
                    break
                ladder.append((d, (q, other)))
                j += 1
            if ladder:
                out.append(StageOp(np.asarray(p.u, dtype=np.complex128), q,
                                   tuple(ladder)))
                i = j
                continue
        out.append(p)
        i += 1
    return out


#: default stage-group width. Measured on v5e (QFT-28, 3-rep steady state):
#: k=2 runs 12 passes in 99 ms — exactly the chip's 512 GB/s streaming
#: plateau — while k=3 (8-10 passes, 104-116 ms) and k=4 (7-9 passes,
#: 152 ms) go COMPUTE-bound: the mixing sum grows 4^k per element and roll
#: targets add 2^rolls select trees, so fewer passes lose to slower passes.
#: k=2 is the sweet spot where the kernel stays DMA-bound.
STAGE_GROUP = 2

#: max "axis"-mechanism targets per stage block (VMEM hard cap: window bytes
#: scale as 2^axis x 128 rows x 2048 lanes x 4 B, double-buffered, in+out —
#: 4 axis slots = 143 MB > the 128 MB chip VMEM, a compile error)
_MAX_AXIS_SLOTS = 3


#: sub-gate cap per 1q layer pass. Each sub-gate costs ~2 complex muls per
#: element and the measured v5e budget before a pass leaves the 512 GB/s
#: DMA plateau is ~8 muls, so ~4 gates ride free and 6 balances pass count
#: against VPU time (a 14-gate pass measured ~4x plateau; 6-gate ~1.5x)
_LAYER1Q_MAX = 6


def _layer1q_prepass(items, n: int, keep_separate_below: int = 0,
                     max_axis_slots: int | None = None):
    """Group runs of consecutive dense 1q prims on DISTINCT row qubits into
    Layer1QOp passes. Disjoint 1q gates commute, so each maximal run is
    repartitioned freely: up to _MAX_AXIS_SLOTS axis-mechanism targets per
    pass (VMEM: each costs a block slot doubling) with roll-mechanism
    targets (cheap: one translate + 2 muls each) filling to _LAYER1Q_MAX.
    Runs shorter than 4 stay prims — greedy dense fusion handles those at
    the same cost and can absorb neighboring 2q gates. Items may include
    StageOps from the stage prepass — they break runs and pass through."""
    from .kernels import _mech

    if max_axis_slots is None:
        max_axis_slots = _MAX_AXIS_SLOTS
    b_lane = max(n - _apply._COL, 0)
    out: list = []
    run: list = []  # [(u, q)]

    def flush():
        if len(run) < 4:
            out.extend(Prim(u, (q,)) for u, q in run)
            run.clear()
            return
        ax = [(u, q) for u, q in run if _mech(q, n)[0] == "axis"]
        rl = [(u, q) for u, q in run if _mech(q, n)[0] != "axis"]
        while ax or rl:
            chunk = ax[:max_axis_slots]
            ax = ax[max_axis_slots:]
            take = _LAYER1Q_MAX - len(chunk)
            chunk += rl[:take]
            rl = rl[take:]
            if len(chunk) == 1:
                out.append(Prim(chunk[0][0], (chunk[0][1],)))
            else:
                out.append(Layer1QOp(tuple(sorted(chunk, key=lambda g: g[1]))))
        run.clear()

    for p in items:
        ok = (isinstance(p, Prim) and not p.diag and len(p.targets) == 1
              and keep_separate_below <= p.targets[0] < b_lane)
        if not ok:
            flush()
            out.append(p)
            continue
        q = p.targets[0]
        if any(q == g[1] for g in run):
            flush()
        run.append((np.asarray(p.u, dtype=np.complex128), q))
    flush()
    return out


def fuse(prims, n: int, max_block: int = DEFAULT_MAX_BLOCK,
         keep_separate_below: int = 0,
         stage_group: int | None = None,
         max_axis_slots: int | None = None,
         mixed_lane: bool = False) -> list:
    """Greedy fusion: prims -> [StageBlockOp | Layer1QOp | DenseOp |
    DiagLayer]."""
    if stage_group is None:
        stage_group = STAGE_GROUP
    if max_axis_slots is None:
        max_axis_slots = _MAX_AXIS_SLOTS
    prims = _stage_prepass(prims, n, keep_separate_below)
    prims = _layer1q_prepass(prims, n, keep_separate_below, max_axis_slots)
    blocks: list = []
    cur_u: np.ndarray | None = None
    cur_t: tuple[int, ...] = ()

    def flush():
        nonlocal cur_u, cur_t
        if cur_u is not None:
            blocks.append(DenseOp(cur_u, cur_t))
            cur_u, cur_t = None, ()

    for p in prims:
        if isinstance(p, (StageOp, Layer1QOp)):
            flush()
            blocks.append(p)
            continue
        if p.diag and len(p.targets) > 4:
            # wide diagonals (e.g. a whole-register Grover oracle) go
            # straight to a DiagLayer factor — densifying a 2^k x 2^k
            # matrix just to re-extract its diagonal would explode
            flush()
            d = np.asarray(p.u, dtype=np.complex128)
            order = tuple(sorted(range(len(p.targets)),
                                 key=lambda i: p.targets[i]))
            if order != tuple(range(len(p.targets))):
                d = d.reshape((2,) * len(p.targets)).transpose(order).reshape(-1)
            blocks.append(DiagLayer(((d, tuple(sorted(p.targets))),)))
            continue
        u, t = _prim_sorted_dense(p)
        if cur_u is None:
            cur_u, cur_t = u, t
            continue
        union = tuple(sorted(set(cur_t) | set(t)))
        if _union_ok(union, n, max_block, keep_separate_below, mixed_lane):
            a = _expand(cur_u, cur_t, union)
            b = _expand(u, t, union)
            fused = b @ a  # p applies after the block
            # the per-pass cost model is measured on the Pallas row kernel
            # (mixed_lane backend); the XLA/traced path keeps the old
            # unconditional merge — wider einsum blocks still pay there
            if not mixed_lane or _merge_pays(cur_u, fused, u, union, n):
                cur_u, cur_t = fused, union
                continue
        flush()
        cur_u, cur_t = u, t
    flush()

    # merge consecutive diagonal blocks into broadcast layers
    out: list = []
    for b in blocks:
        if isinstance(b, (StageOp, Layer1QOp)):
            out.append(b)
            continue
        if isinstance(b, DiagLayer):
            if out and isinstance(out[-1], DiagLayer):
                out[-1] = DiagLayer(out[-1].factors + b.factors)
            else:
                out.append(b)
            continue
        if is_diagonal(b.u):
            d = np.diag(b.u).copy()
            if out and isinstance(out[-1], DiagLayer):
                out[-1] = DiagLayer(out[-1].factors + ((d, b.targets),))
            else:
                out.append(DiagLayer(((d, b.targets),)))
        else:
            out.append(b)

    # group runs of consecutive stages on adjacent qubits into blocks of up
    # to ``stage_group`` (a k-block cuts QFT pass count by k). The VMEM cap:
    # each "axis"-mechanism target doubles the kernel's block footprint
    # (stage tables force >= 128 trailing rows), so groups keep at most
    # _MAX_AXIS_SLOTS axis targets — beyond that the double-buffered blocks
    # exceed the chip's VMEM.
    from .kernels import _mech

    grouped: list = []
    i = 0
    while i < len(out):
        a = out[i]
        if not isinstance(a, StageOp):
            grouped.append(a)
            i += 1
            continue
        grp = [a]
        n_axis = 1 if _mech(a.q, n)[0] == "axis" else 0
        while len(grp) < stage_group and i + len(grp) < len(out):
            b = out[i + len(grp)]
            if not (isinstance(b, StageOp) and b.q == grp[-1].q + 1):
                break
            b_axis = 1 if _mech(b.q, n)[0] == "axis" else 0
            if n_axis + b_axis > max_axis_slots:
                break
            n_axis += b_axis
            grp.append(b)
        grouped.append(StageBlockOp(tuple((s.u, s.q, s.factors) for s in grp)))
        i += len(grp)
    return grouped


def _op_content_key(op, n: int):
    """Content hash of a fused op: plan caches MUST NOT key on ``id(op)`` —
    callers like the mesh path lower temporary op objects, and a recycled
    id would serve a stale plan with the wrong gate tables. Content keys
    also dedup identical ops across segments."""
    if isinstance(op, StageBlockOp):
        return ("stageblk", n, tuple(
            (u.tobytes(), q, tuple((d.tobytes(), t) for d, t in factors))
            for u, q, factors in op.stages))
    if isinstance(op, Layer1QOp):
        return ("layer1q", n, tuple((u.tobytes(), q) for u, q in op.gates))
    if isinstance(op, DiagLayer):
        return ("diaglayer", n,
                tuple((np.asarray(d).tobytes(), t) for d, t in op.factors))
    return ("dense", n, op.u.tobytes(), op.targets)


class OpPlanner:
    """Per-op dispatch plans with device-resident operands, built once per
    (op content, n) (re-uploading gate tables per call costs more than the
    kernels through a remote-device tunnel). Used by the compiled executor
    and the mesh path — both run the SAME Pallas kernel plans. LRU-bounded
    (like apply._operand_cache): a parameter sweep re-planning a circuit
    with fresh angles must not grow device-resident operands forever."""

    def __init__(self, maxlen: int = 512):
        self._cache: "OrderedDict" = OrderedDict()
        self._maxlen = maxlen

    def __call__(self, op, n: int):
        from . import kernels

        key = _op_content_key(op, n)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        if isinstance(op, StageBlockOp):
            plan = ("stageblk", kernels.stage_block_prepare(op.stages, n))
        elif isinstance(op, Layer1QOp):
            # fn(state, coefs): same dispatch shape as a row gate
            plan = ("row", kernels.layer1q_prepare(op.gates, n))
        elif isinstance(op, DiagLayer):
            plan = ("diag", kernels.diag_layer_prepare(op.factors, n))
        else:
            b = max(n - _apply._COL, 0)
            if op.targets and all(t >= b for t in op.targets):
                # pure-lane blocks: one expanded 128-wide MXU matmul
                u = _apply.expand_for_view(op.u, n, op.targets)
                plan = ("lane", kernels.lane_gate_prepare(u, n))
            elif 1 <= len(op.targets) <= 4:
                # row and row/lane-straddling gates: axis/roll kernel
                plan = ("row", kernels.row_gate_prepare(op.u, op.targets, n))
            else:
                plan = ("xla", None)
        self._cache[key] = plan
        if len(self._cache) > self._maxlen:
            self._cache.popitem(last=False)
        return plan


def plan_chunk(ops, n: int, prepared):
    """Lower a run of fused ops into (plans, operands): per-op dispatch
    plans (with the lru-cached kernel fns) plus the flat list of
    device-resident gate operands, split out as jit ARGUMENTS so
    same-shaped chunks share one compile. ``prepared`` is a per-op plan
    cache callable ``(op, n) -> (kind, prep)`` (see
    :meth:`CompiledCircuit._prepared`). Execute with :func:`run_plans`."""
    plans: list = []
    operands: list = []
    for op in ops:
        kind, prep = prepared(op, n)
        if kind == "stageblk":
            plans.append(("stageblk", prep[0], len(prep) - 1))
            operands.extend(prep[1:])
        elif kind == "diag":
            plans.append(("diag", tuple(p[0] for p in prep), None))
            for _, rt, ct in prep:
                operands.extend([rt, ct])
        elif kind == "lane":
            fn, mr, mi = prep
            plans.append(("lane", fn, None))
            operands.extend([mr, mi])
        elif kind == "row":
            fn, coef = prep
            plans.append(("row", fn, None))
            operands.append(coef)
        else:
            plans.append(("xla", op, None))
    return tuple(plans), tuple(operands)


def plan_sig(plans) -> tuple:
    """Structural signature of a plan list for jit-cache keying: the kernel
    fns are lru-cached by (targets, n, ...), so identical structure gives
    identical fn identities. XLA-fallback ops trace their matrix as a
    CONSTANT, so their signature must carry the matrix content."""
    sig: list = []
    for kind, payload, extra in plans:
        if kind == "diag":
            sig.append((kind, tuple(id(f) for f in payload), extra))
        elif kind == "xla":
            sig.append((kind, (payload.targets, payload.u.tobytes()), extra))
        else:
            sig.append((kind, id(payload), extra))
    return tuple(sig)


def run_plans(state, plans, ops_args, n: int):
    """Traced executor for :func:`plan_chunk` output: applies every op to
    canonical planes, consuming operands from ``ops_args`` in order."""
    from . import kernels

    it = iter(ops_args)
    for kind, payload, extra in plans:
        if kind == "stageblk":
            args = [next(it) for _ in range(extra)]
            state = payload(state, *args)
        elif kind == "diag":
            for fn in payload:
                state = fn(state, next(it), next(it))
        elif kind == "lane":
            state = payload(state, next(it), next(it))
        elif kind == "row":
            state = payload(state, next(it))
        else:
            state = kernels.like_shape(
                _apply.apply_gate_traced(state, payload.u, payload.targets, n),
                state)
    return state


#: process-wide planner + chunk-fn cache for apply_prims_fused (content
#: keyed, so sharing across interpreters is safe). Both LRU-bounded: an
#: interpreter-driven parameter sweep (fresh angles = fresh content keys
#: every run) must not accumulate jitted programs / device operands forever.
_GLOBAL_PLANNER = OpPlanner()
_CHUNK_FN_LRU_MAX = 128
_chunk_fn_cache: "OrderedDict" = OrderedDict()


def _cached_chunk_fn(key, build):
    fn = _chunk_fn_cache.get(key)
    if fn is None:
        fn = _chunk_fn_cache[key] = build()
        if len(_chunk_fn_cache) > _CHUNK_FN_LRU_MAX:
            _chunk_fn_cache.popitem(last=False)
    else:
        _chunk_fn_cache.move_to_end(key)
    return fn


def apply_prims_fused(planes, prims, n: int):
    """Apply a run of prims to an n-qubit plane pair as ONE jitted fused
    chunk (non-donating: callers like the interpreter hold shared
    references to the input planes). The interpreter's lazy gate queue
    flushes through this — per-statement dispatch latency (~30-100 ms
    through a remote tunnel) then amortizes over whole measurement-free
    runs, while observable semantics are untouched (flushes happen at
    every observation point). State returns in the engine's canonical
    layout on the Pallas path."""
    use_pallas = engine_uses_pallas(n)
    ops = fuse(list(prims), n, max_block=(4 if use_pallas else
                                          DEFAULT_MAX_BLOCK),
               mixed_lane=use_pallas)
    if not use_pallas:
        # XLA/trace path (CPU tests, small n): matrices fold as constants,
        # so the jit cache must key on op CONTENT
        key = ("interp-xla", n, tuple(_op_content_key(op, n) for op in ops))

        def build_xla(ops=tuple(ops)):
            def run(st):
                for op in ops:
                    if isinstance(op, DiagLayer):
                        st = _apply_diag_layer_traced(st, op, n)
                    elif isinstance(op, StageBlockOp):
                        for u, q, factors in op.stages:
                            st = _apply_dense_traced(st, u, (q,), n)
                            if factors:
                                st = _apply_diag_layer_traced(
                                    st, DiagLayer(factors), n)
                    elif isinstance(op, Layer1QOp):
                        for u, q in op.gates:
                            st = _apply_dense_traced(st, u, (q,), n)
                    else:
                        st = _apply_dense_traced(st, op.u, op.targets, n)
                return st

            return jax.jit(run)

        return _cached_chunk_fn(key, build_xla)(planes)

    from . import kernels

    plans, operands = plan_chunk(ops, n, _GLOBAL_PLANNER)
    key = ("interp-chunk", n, plan_sig(plans))

    def build_chunk(plans=plans):
        def chunk_fn(st, args):
            return run_plans(st, plans, args, n)

        return jax.jit(chunk_fn)  # NOT donated: input planes stay valid

    return _cached_chunk_fn(key, build_chunk)(
        kernels.to_canon(planes, n), operands)


def split_op_virtual(op, v: int):
    """Specialize one fused op (targets in (v + m)-space, virtual/bank bits
    at positions 0..v-1) for the 2^v shards. Returns
    ("per_shard", [op_for_shard_s]) — every shard's op in m-space — or
    ("cross", DenseOp) for dense ops touching virtual bits (the caller
    runs those as cross-shard butterflies / block decompositions). Shared
    by the single-chip virtual-shard executor and the mesh path's
    per-device sub-shard banks."""
    if isinstance(op, StageBlockOp):
        # the stage prepass never creates stages touching virtual bits
        shifted = StageBlockOp(tuple(
            (u, q - v,
             tuple((d, (t[0] - v, t[1] - v)) for d, t in factors))
            for u, q, factors in op.stages))
        return ("per_shard", [shifted] * (1 << v))
    if isinstance(op, Layer1QOp):
        # the 1q-layer prepass never groups virtual-bit targets
        shifted = Layer1QOp(tuple((u, q - v) for u, q in op.gates))
        return ("per_shard", [shifted] * (1 << v))
    if isinstance(op, DiagLayer):
        per = []
        for s in range(1 << v):
            facs = []
            for d, targets in op.factors:
                virt = [t for t in targets if t < v]
                real = tuple(t - v for t in targets if t >= v)
                if virt:
                    # fix the virtual bits to this shard's values
                    dk = d.reshape((2,) * len(targets))
                    idx = tuple(
                        ((s >> (v - 1 - t)) & 1) if t < v else slice(None)
                        for t in targets
                    )
                    dsub = np.asarray(dk[idx]).reshape(-1)
                else:
                    dsub = d
                facs.append((dsub, real))
            per.append(DiagLayer(tuple(facs)))
        return ("per_shard", per)
    if all(t >= v for t in op.targets):
        shifted = DenseOp(op.u, tuple(t - v for t in op.targets))
        return ("per_shard", [shifted] * (1 << v))
    return ("cross", op)


def _apply_dense_traced(planes, u: np.ndarray, targets: tuple[int, ...], n: int):
    """Inside-jit dense block application (matrix becomes an XLA constant):
    row-qubit butterfly or lane-block matmul, zero entries skipped."""
    return _apply.apply_gate_traced(planes, u, targets, n)


def _apply_diag_layer_traced(planes, layer: DiagLayer, n: int):
    """Inside-jit fused diagonal pass: one elementwise sweep for all factors
    (tables are constants; the lane expansion constant-folds)."""
    xr, xi = planes
    for d, targets in layer.factors:
        dr = jnp.asarray(d.real.astype(np.float32))
        di = jnp.asarray(d.imag.astype(np.float32))
        tr, ti, row, has_lane = _apply.expand_diag_traced(dr, di, n, targets)
        xr, xi = _apply.diag_factor_traced(xr, xi, tr, ti, row, has_lane, n)
    return (xr, xi)


class CompiledCircuit:
    """A measurement-free circuit segment compiled into XLA programs.

    Applies with buffer donation: ``state = circuit(state)`` reuses the HBM
    buffer, so peak memory stays ~one amplitude vector.

    For large states the fused op stream is split into chunks of
    ``chunk_passes`` ops, each jitted separately: XLA compile time (and the
    compiler's own memory) scales badly with monolithic program size at
    multi-GiB buffer shapes, while per-chunk dispatch overhead is microseconds
    against ~10ms per pass. ``chunk_passes=None`` picks a default by n.
    """

    def __init__(self, n: int, prims, max_block: int = DEFAULT_MAX_BLOCK,
                 optimize: bool = True, chunk_passes: int | None = None,
                 use_pallas: bool | None = None, virtual_shards: int | None = None):
        self.n = n
        self.prims = tuple(prims)
        if virtual_shards is None:
            virtual_shards = default_virtual_shards(n)
        self.v = virtual_shards
        if use_pallas is None:
            use_pallas = engine_uses_pallas(n)
        self.use_pallas = use_pallas
        if use_pallas:
            # the pallas row kernel handles <= 4 targets (16x16 butterflies;
            # wider blocks would fall back to the slow XLA path)
            max_block = min(max_block, 4)
        self.ops = fuse(self.prims, n, max_block, self.v,
                        mixed_lane=use_pallas) if optimize else [
            DenseOp(*_prim_sorted_dense(p)) for p in self.prims
        ]
        if chunk_passes is None:
            # remote dispatch latency is ~30-100 ms per jitted call, so larger
            # chunks amortize it; small circuits compile as one program. Under
            # virtual sharding the per-op dispatch+readback (x 2^v shards)
            # dominates wall-clock, so chunks matter even more; the in-place
            # pallas alias chains keep chunk intermediates from doubling HBM
            if self.v > 0:
                chunk_passes = 8
            else:
                # 16 puts a whole QFT-28 (12 passes) in ONE dispatch:
                # measured 0.1146 vs 0.1207 s at 8 (each extra dispatch
                # costs ~6-9 ms through the remote tunnel; trace-derived
                # device time is 89 ms — experiments/roofline_r04.json)
                chunk_passes = len(self.ops) if n <= 22 else 16
        self.chunk_passes = max(1, chunk_passes)
        self._planner = OpPlanner()
        # keep the async dispatch queue bounded on large states (temporaries
        # and un-aliased outputs of queued ops stay live until the device
        # catches up); at n=30 the state alone is half of HBM. Measured:
        # every-chunk syncing cost ~70 ms of tunnel round-trips per QFT-30
        # run; 3 chunks in flight still fit (the chains are fully aliased)
        self._sync_every = 3 if n >= 30 else (6 if n >= 26 else 10 ** 9)
        self._sharded_plan_cache = None
        if self.v > 0:
            self._build_sharded()
        elif use_pallas:
            self._fns = None
            self._build_pallas_chunks()
        else:
            self._chunks = [
                self.ops[i : i + self.chunk_passes]
                for i in range(0, len(self.ops), self.chunk_passes)
            ]
            self._fns = [
                jax.jit(functools.partial(self._run_ops, tuple(chunk)), donate_argnums=0)
                for chunk in self._chunks
            ]

    @property
    def num_passes(self) -> int:
        return len(self.ops)

    def stats(self) -> dict:
        """Fusion statistics (observability; the reference had none)."""
        dense = [op for op in self.ops if isinstance(op, DenseOp)]
        layers = [op for op in self.ops if isinstance(op, DiagLayer)]
        blocks = [op for op in self.ops if isinstance(op, StageBlockOp)]
        layers1q = [op for op in self.ops if isinstance(op, Layer1QOp)]
        return {
            "layer1q_passes": len(layers1q),
            "layer1q_gates": sum(len(l.gates) for l in layers1q),
            "n": self.n,
            "prims": len(self.prims),
            "fused_ops": len(self.ops),
            "dense_blocks": len(dense),
            "diag_layers": len(layers),
            "diag_factors": sum(len(l.factors) for l in layers),
            "fused_stage_blocks": len(blocks),
            "fused_stages": sum(len(b.stages) for b in blocks),
            "max_stage_group": max((len(b.stages) for b in blocks), default=0),
            "max_block_qubits": max((len(op.targets) for op in dense), default=0),
            "backend": "pallas" if self.use_pallas else "xla",
            "virtual_shards": self.v,
        }

    def _run_ops(self, ops, state):
        for op in ops:
            state = self._run_op(op, state)
        return state

    def _run_op(self, op, state):
        return self._run_op_at(op, state, self.n)

    def _prepared(self, op, n):
        return self._planner(op, n)

    def _run_op_at(self, op, state, n):
        from . import kernels

        if isinstance(op, StageBlockOp):
            if self.use_pallas:
                fn, coef, *tabs = self._prepared(op, n)[1]
                return fn(state, coef, *tabs)
            for u, q, factors in op.stages:
                state = _apply_dense_traced(state, u, (q,), n)
                if factors:
                    state = _apply_diag_layer_traced(
                        state, DiagLayer(factors), n)
            return state
        if isinstance(op, Layer1QOp):
            if self.use_pallas:
                fn, coefs = self._prepared(op, n)[1]
                return fn(state, coefs)
            for u, q in op.gates:
                state = _apply_dense_traced(state, u, (q,), n)
            return state
        if isinstance(op, DiagLayer):
            if self.use_pallas:
                return kernels.diag_layer(state, op.factors, n)
            return _apply_diag_layer_traced(state, op, n)
        if self.use_pallas and op.targets:
            b = max(n - _apply._COL, 0)
            if all(t >= b for t in op.targets):
                u = _apply.expand_for_view(op.u, n, op.targets)
                return kernels.lane_gate(state, u, n)
            if len(op.targets) <= 4:
                return kernels.row_gate(state, op.u, op.targets, n)
            # very wide blocks: XLA fallback (shape-restoring, so the
            # canonical chain stays intact around it)
            return kernels.like_shape(
                _apply_dense_traced(state, op.u, op.targets, n), state)
        return _apply_dense_traced(state, op.u, op.targets, n)

    def _run(self, state):
        return self._run_ops(tuple(self.ops), state)

    # -- virtual on-chip sharding (n > 29) ----------------------------------------

    def init_state(self):
        """The |0...0> state in this circuit's representation: a plane pair
        for v=0 (canonical 2-D on the pallas path), else a tuple of 2^v
        canonical shard plane pairs."""
        return zero_state_virtual(self.n, self.v,
                                  canonical=self.use_pallas or self.v > 0)

    def state_to_complex(self, state):
        """Host-side numpy complex amplitudes for any representation."""
        return state_to_complex_virtual(state, self.v)

    def _build_sharded(self):
        v, m = self.v, self.n - self.v
        self._events = [split_op_virtual(op, v) for op in self.ops]
        self._cross_fns: dict = {}

    def _cross_fn(self, op: DenseOp):
        """Dense op involving virtual bits.

        Targets entirely within the virtual bits run as ONE in-place Pallas
        butterfly across whole shards (kernels.shard_butterfly_prepare) —
        peak HBM stays at the state itself, which is what n=30 (state = half
        of HBM) requires.

        Mixed virtual+local targets block-decompose over shards:
        out_s = sum_s' A[s,s'] applied to shard s' on the remaining targets;
        identity blocks are passthrough, zero blocks skipped (so
        virtually-controlled gates reduce to per-shard ops), and each output
        shard is computed by its own jit so peak HBM stays ~state + one
        shard."""
        key = id(op)
        if key not in self._cross_fns:
            v, m = self.v, self.n - self.v
            if all(t < v for t in op.targets):
                self._cross_fns[key] = self._cross_butterfly(op)
                return self._cross_fns[key]
            rest = tuple(t - v for t in op.targets if t >= v)
            h = 1 << len(rest)
            S = 1 << v
            vbits = [t for t in op.targets if t < v]

            def shard_block_index(s):
                out = 0
                for t in vbits:
                    out = (out << 1) | ((s >> (v - 1 - t)) & 1)
                return out

            mask = 0
            for t in range(v):
                if t not in vbits:
                    mask |= 1 << (v - 1 - t)

            eye = np.eye(h)

            def term_kind(blk):
                if not blk.any():
                    return "zero"
                if np.allclose(blk, eye, atol=1e-14):
                    return "ident"
                return "mat"

            def local_apply(planes, blk):
                """Apply blk on ``rest`` within a shard, staying canonical
                (a flat reshape here would cost a 4 GiB temp at n=30)."""
                from . import kernels

                b = max(m - _apply._COL, 0)
                if rest and all(t >= b for t in rest):
                    u = _apply.expand_for_view(blk, m, rest)
                    fn, mr, mi = kernels.lane_gate_prepare(u, m)
                    return fn(planes, mr, mi)
                if 1 <= len(rest) <= 2:
                    fn, coef = kernels.row_gate_prepare(blk, rest, m)
                    return fn(planes, coef)
                return kernels.like_shape(
                    _apply.apply_gate_traced(planes, blk, rest, m), planes)

            def analyze_out(s_out):
                terms = []
                for s_in in range(S):
                    if (s_out & mask) != (s_in & mask):
                        continue
                    bi, bj = shard_block_index(s_out), shard_block_index(s_in)
                    blk = op.u[bi * h : (bi + 1) * h, bj * h : (bj + 1) * h]
                    kind = term_kind(blk)
                    if kind != "zero":
                        terms.append((s_in, kind, blk))
                if len(terms) == 1 and terms[0][1] == "ident":
                    return ("passthrough", terms[0][0], [])
                reads = [t[0] for t in terms]

                def run(*inputs):
                    by_sin = dict(zip(reads, inputs))
                    acc = None
                    for s_in, kind, blk in terms:
                        if kind == "ident":
                            term = by_sin[s_in]
                        elif rest:
                            term = local_apply(by_sin[s_in], blk)
                        else:
                            c = complex(blk[0, 0])
                            xr, xi = by_sin[s_in]
                            term = (np.float32(c.real) * xr - np.float32(c.imag) * xi,
                                    np.float32(c.real) * xi + np.float32(c.imag) * xr)
                        acc = term if acc is None else (acc[0] + term[0], acc[1] + term[1])
                    return acc

                return ("jit", run, reads)

            out_plans = [analyze_out(s) for s in range(S)]
            passthrough_srcs = {p for k, p, _ in out_plans if k == "passthrough"}
            # the LAST jit output may donate its inputs (nothing reads the old
            # shards afterwards) — this keeps peak HBM at ~state + one shard
            last_jit = max((i for i, (k, _, _) in enumerate(out_plans) if k == "jit"),
                           default=None)
            compiled = []
            for i, (kind, payload, reads) in enumerate(out_plans):
                if kind == "jit":
                    donate = (i == last_jit)
                    argnums = tuple(
                        j for j, s_in in enumerate(reads)
                        if donate and s_in not in passthrough_srcs
                    )
                    compiled.append(("jit", jax.jit(payload, donate_argnums=argnums), reads))
                else:
                    compiled.append((kind, payload, reads))

            def apply_cross(shards):
                new = []
                for kind, payload, reads in compiled:
                    if kind == "passthrough":
                        new.append(shards[payload])
                    else:
                        new.append(payload(*(shards[s] for s in reads)))
                return tuple(new)

            self._cross_fns[key] = apply_cross
        return self._cross_fns[key]

    def _cross_butterfly(self, op: DenseOp):
        """All targets are virtual bits: group shards whose non-target bits
        agree and run the in-place whole-shard butterfly per group."""
        from . import kernels

        v, m = self.v, self.n - self.v
        targets = op.targets  # sorted ascending; first target = MSB of u index
        fn, coef = kernels.shard_butterfly_prepare(op.u, m)
        nontarget = [t for t in range(v) if t not in targets]

        groups = []
        for bits in range(1 << len(nontarget)):
            base = 0
            for j, t in enumerate(nontarget):
                base |= ((bits >> (len(nontarget) - 1 - j)) & 1) << (v - 1 - t)
            members = []
            for val in range(1 << len(targets)):
                s = base
                for j, t in enumerate(targets):
                    s |= ((val >> (len(targets) - 1 - j)) & 1) << (v - 1 - t)
                members.append(s)
            groups.append(members)

        def apply_cross(shards):
            new = list(shards)
            for members in groups:
                pairs = tuple(kernels.to_canon(shards[s], m) for s in members)
                outs = fn(pairs, coef)
                for s, pair in zip(members, outs):
                    # keep each shard in the executor's layout (canonical on
                    # the pallas path; flat in XLA mode)
                    new[s] = kernels.like_shape(pair, shards[s])
            return tuple(new)

        return apply_cross

    @staticmethod
    def _force(planes):
        """Block until a state's queue has drained (a scalar readback — on
        remote-execution backends block_until_ready can return early, and an
        unbounded async dispatch queue keeps every op's temporaries live)."""
        x = planes[0]
        float(x[(0,) * getattr(x, "ndim", 1)])

    def _sharded_plan(self):
        """Group consecutive per-shard events into chunks (dispatch latency,
        see _build_pallas_chunks). Returns [("cross", op) | ("chunk",
        per-shard list of (jit_fn, operands))]."""
        if getattr(self, "_sharded_plan_cache", None) is not None:
            return self._sharded_plan_cache
        m = self.n - self.v
        S = 1 << self.v
        plan = []
        run: list = []  # consecutive per-shard events

        jit_by_sig: dict = getattr(self, "_shard_jit_cache", None) or {}
        self._shard_jit_cache = jit_by_sig

        def flush():
            if not run:
                return
            per_shard = []
            for s in range(S):
                plans, operands = plan_chunk([payload[s] for payload in run],
                                             m, self._prepared)
                # shards usually share the plan STRUCTURE (only operand
                # values differ) — one jit per plan_sig instead of 2^v
                # redundant traces of the same program
                sig = plan_sig(plans)
                fn = jit_by_sig.get(sig)
                if fn is None:
                    def chunk_fn(state, ops_args, plans=plans):
                        return run_plans(state, plans, ops_args, m)

                    fn = jit_by_sig[sig] = jax.jit(chunk_fn, donate_argnums=0)
                per_shard.append((fn, operands))
            plan.append(("chunk", per_shard))
            run.clear()

        for kind, payload in self._events:
            if kind == "cross":
                flush()
                plan.append(("cross", payload))
            else:
                run.append(payload)
                if len(run) >= self.chunk_passes:
                    flush()
        flush()
        self._sharded_plan_cache = plan
        return plan

    def _call_sharded(self, shards):
        shards = list(shards)
        since_sync = 0
        for kind, payload in self._sharded_plan():
            if kind == "cross":
                shards = list(self._cross_fn(payload)(shards))
            else:
                for s in range(len(shards)):
                    fn, operands = payload[s]
                    shards[s] = fn(shards[s], operands)
            since_sync += 1
            if since_sync >= self._sync_every:
                self._force(shards[0])
                since_sync = 0
        return tuple(shards)

    def _build_pallas_chunks(self):
        """Group fused ops into jitted chunks: each remote dispatch carries
        ~100 ms of tunnel latency, so per-op dispatch dominates wall-clock.
        A chunk is one jit whose args are the chunk's device-resident gate
        operands; the pallas aliasing chains keep it in-place."""
        n = self.n
        self._pallas_chunks = []
        for i in range(0, len(self.ops), self.chunk_passes):
            chunk = self.ops[i : i + self.chunk_passes]
            plans, operands = plan_chunk(chunk, n, self._prepared)

            def chunk_fn(state, ops_args, plans=plans):
                return run_plans(state, plans, ops_args, n)

            self._pallas_chunks.append(
                (jax.jit(chunk_fn, donate_argnums=0), operands)
            )

    def __call__(self, state):
        from . import kernels

        if self.v:
            # the virtual-shard plan always runs pallas kernels (interpreted
            # off-TPU), so shards are always canonical
            m = self.n - self.v
            state = [kernels.to_canon(sh, m) for sh in state]
            return self._call_sharded(state)
        if self.use_pallas:
            state = kernels.to_canon(state, self.n)
        if self._fns is None:  # pallas backend: chunked jits
            since_sync = 0
            for fn, operands in self._pallas_chunks:
                state = fn(state, operands)
                since_sync += 1
                if since_sync >= self._sync_every:
                    self._force(state)
                    since_sync = 0
            return state
        for fn in self._fns:
            state = fn(state)
        return state

    def lower_text(self) -> str:  # pragma: no cover - debugging aid
        shape = jax.ShapeDtypeStruct((1 << self.n,), jnp.float32)
        return jax.jit(self._run).lower((shape, shape)).as_text()
