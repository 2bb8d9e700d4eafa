"""Pallas TPU kernels — the speed-of-light path.

The XLA backend applies one HBM pass per *operation* (measured: it does not
fuse broadcast-multiply chains or reversed views into single sweeps on this
TPU), so deep circuits pay one full state read+write per gate. These kernels
restore the intended cost model: one streaming pass per fused op, in place.

**Canonical layout.** On the Pallas path the state planes are 2-D
``(R, 2048)`` float32 arrays (R = 2^n / 2048), and every kernel keeps that
trailing dim. Measured on this backend (experiments/bw_probe.py): XLA only
collapses a donated input and an aliased pallas output into ONE buffer when
no trailing-dim reshape sits between them — a ``(2^n,) <-> (R, C)`` reshape
at the jit boundary materializes a full state-sized temp (which is what made
n=30 chunks exhaust HBM), while leading-dim regroupings are free bitcasts.
So: jit args/results stay ``(R, 2048)``; kernels view them as
``(A, 2, ..., trail, 2048)`` (leading-dim regroups only).

**Gate mechanics.** A row qubit t (pair stride s = 2^(n-1-t) >= 128) is
reached one of three ways, chosen per target:

* ``axis``  (s >= 128*2048): the pair axis is a real array axis in a
  leading-dim regroup; the kernel addresses both branches as block slots.
  (The 128-row threshold keeps table blocks sliced in lockstep with the
  trailing row dim at a lane-legal >= 128 width — see :func:`_mech`.)
* ``rowroll`` (2048 <= s < 128*2048): the partner row is fetched with a
  sublane ``pltpu.roll`` (amount 1..64) inside the block and branches are
  selected by an iota mask. (A regroup would leave a second-to-last dim
  < 8, which the (8, 128) physical tile pads — measured 16-28x
  slowdowns; rolls run at the same streaming plateau as axis.)
* ``laneroll`` (128 <= s < 2048): same trick along the lane axis.

Dense gates on the last 7 ("lane") qubits run as 128-wide MXU matmuls with
the gate expanded over the lane block (:func:`lane_gate`), reshaping block
VALUES in-kernel (free) rather than the array. Whole layers of commuting
diagonal factors run in ONE pass (:func:`diag_layer`). Dense gates on
virtual-shard index bits run as an in-place butterfly across whole shards
(:func:`shard_butterfly_prepare`).

All kernels alias their outputs onto their inputs (``input_output_aliases``)
so a fused chunk is in place in HBM: peak memory stays one state vector —
which is what makes n=30 (2 x 4 GiB planes) fit on a 16 GiB chip.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .apply import _COL, Planes

#: canonical trailing dim of the 2-D state planes
_C0 = 2048

#: rows per block for plain (R, 2048) streaming kernels
_BLOCK_ROWS = 128

#: set True to run kernels in interpreter mode (CPU tests)
INTERPRET = False


def _interpret():
    if INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def _vmem_kwargs():
    if _interpret():
        return {}
    # default scoped VMEM is 16 MB; v5e has 128 MB physical — more room for
    # multiple buffering of 2 MB blocks
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2**20)}


def canon_cols(n: int) -> int:
    return min(_C0, 1 << n)


def canon_shape(n: int) -> tuple[int, int]:
    """The canonical 2-D plane shape for an n-qubit state (n >= 14 on the
    pallas path, so R >= 8; smaller states collapse to one row)."""
    C = canon_cols(n)
    return ((1 << n) // C, C)


def to_canon(planes: Planes, n: int) -> Planes:
    """Reshape planes to canonical 2-D (host-level; a device copy when the
    input is flat — use only at path boundaries, never between kernels)."""
    shape = canon_shape(n)
    return tuple(x if x.shape == shape else x.reshape(shape) for x in planes)


def like_shape(out: Planes, ref: Planes) -> Planes:
    return tuple(o if o.shape == r.shape else o.reshape(r.shape)
                 for o, r in zip(out, ref))


# ---------------------------------------------------------------------------
# Target mechanics
# ---------------------------------------------------------------------------


def _mech(t: int, n: int):
    """How qubit t is reached on the canonical view. The axis threshold is
    128 rows so table blocks sliced in lockstep with the trailing row dim
    keep a lane-legal (>= 128) width; rolls run at the same plateau."""
    C = canon_cols(n)
    log_c = C.bit_length() - 1
    s = 1 << (n - 1 - t)
    if s >= 128 * C:
        return ("axis", n - 1 - t - log_c)  # row-bit position (>= 7)
    if s >= C:
        return ("rowroll", s // C)          # sublane roll amount in {1..64}
    return ("laneroll", s)                  # lane roll amount (< C)


def _subsets(items):
    for r in range(len(items) + 1):
        yield from itertools.combinations(items, r)


def _trail_rows(targets: tuple[int, ...], n: int) -> int:
    """The trailing row-dim of _gate_fn's view (= the phase tables' period:
    every ladder phase bit sits below the lowest axis target)."""
    C = canon_cols(n)
    ps = [p for kind, p in (_mech(t, n) for t in targets) if kind == "axis"]
    return (1 << min(ps)) if ps else (1 << n) // C


class _RowPlan:
    """Shared view/block/grid planning for row kernels over the canonical
    (R, 2048) planes: a leading-dim regroup exposing each "axis" target as
    a block slot, trailing rows blocked to BT, lanes resident. Both the
    dense/stage kernel (:func:`_gate_fn`) and the sequential 1q-layer
    kernel (:func:`_layer1q_fn`) build from this one planner, so the
    alignment invariants (BT >= 2*sr_max so sublane rolls wrap inside a
    block; trailing-block grid axis iterates fastest for contiguous DMA)
    live in exactly one place."""

    def __init__(self, targets: tuple[int, ...], n: int,
                 table_blocks: bool = False):
        C = canon_cols(n)
        mechs = [_mech(t, n) for t in targets]
        self.C = C
        self.R = (1 << n) // C
        self.axis = [(i, p) for i, (kind, p) in enumerate(mechs)
                     if kind == "axis"]
        self.rolls = [(i, kind, v) for i, (kind, v) in enumerate(mechs)
                      if kind != "axis"]
        row_bits = n - (C.bit_length() - 1)

        self.axis_sorted = sorted(self.axis, key=lambda ip: -ip[1])
        dims: list[int] = []
        self.tdim: dict[int, int] = {}
        cur_top = row_bits
        for i, p in self.axis_sorted:
            seg = cur_top - (p + 1)
            if seg > 0:
                dims.append(1 << seg)
            self.tdim[i] = len(dims)
            dims.append(2)
            cur_top = p
        self.trail = 1 << cur_top
        dims.append(self.trail)
        dims.append(C)
        self.dims = dims
        rank = len(dims)
        self.rank = rank
        self.trail_pos = rank - 2

        target_elems = max(8, (1 << 21) // 4 // C)  # ~2 MB blocks per plane
        BT = max(8, target_elems // (1 << len(self.axis)))
        sr_max = max((v for _, kind, v in self.rolls if kind == "rowroll"),
                     default=0)
        BT = max(BT, 2 * sr_max)
        if table_blocks:
            # block-sliced (2, BT) operand tables: lane tiling demands
            # BT >= 128 unless the block covers the whole table (== trail)
            BT = max(BT, min(128, self.trail))
        BT = min(BT, self.trail)
        while self.trail % BT:
            BT //= 2
        BT = max(BT, 1)
        assert BT >= 2 * sr_max, (targets, n, BT, sr_max)
        assert not table_blocks or BT >= 128 or BT == self.trail, \
            (targets, n, BT, self.trail)
        self.BT = BT

        block = [1] * rank
        for i, _ in self.axis_sorted:
            block[self.tdim[i]] = 2
        block[self.trail_pos] = BT
        block[rank - 1] = C
        self.block = block

        slot_dims = {self.tdim[i] for i, _ in self.axis_sorted}
        grid_axes = [a for a in range(rank)
                     if a not in slot_dims and a != rank - 1
                     and not (a == self.trail_pos and BT == self.trail)]
        if self.trail_pos in grid_axes:
            # trailing-block axis iterates fastest (contiguous DMA)
            grid_axes.remove(self.trail_pos)
            grid_axes.append(self.trail_pos)
        self.grid_axes = grid_axes
        self.grid = tuple(dims[a] // block[a] for a in grid_axes) or (1,)

        def index_map(*gids):
            out = [0] * rank
            for g, a in zip(gids, grid_axes):
                out[a] = g
            return tuple(out)

        self.index_map = index_map
        self.spec = pl.BlockSpec(tuple(block), index_map,
                                 memory_space=pltpu.VMEM)
        self.shape = jax.ShapeDtypeStruct(tuple(dims), jnp.float32)

    def slot(self, bits_by_axis):
        """Block index tuple selecting one assignment of the axis slots."""
        idx: list = [0] * self.rank
        for (i, _), b in zip(self.axis_sorted, bits_by_axis):
            idx[self.tdim[i]] = b
        idx[self.trail_pos] = slice(None)
        idx[self.rank - 1] = slice(None)
        return tuple(idx)

    def make_masks(self):
        """In-kernel per-roll-target bit masks (block-local iota is the
        absolute bit: blocks are aligned, BT is a multiple of 2*sr)."""
        masks = []
        for _, kind, v in self.rolls:
            ax = 0 if kind == "rowroll" else 1
            it = jax.lax.broadcasted_iota(jnp.int32, (self.BT, self.C), ax)
            masks.append((it & v) > 0)
        return masks

    def make_fetch(self, masks):
        """In-kernel partner fetch: x[index XOR roll stride]."""
        def fetch(x, ridx):
            _, kind, v = self.rolls[ridx]
            ax, size = (0, self.BT) if kind == "rowroll" else (1, self.C)
            return jnp.where(masks[ridx], pltpu.roll(x, v, ax),
                             pltpu.roll(x, (size - v) % size, ax))

        return fetch


@functools.lru_cache(maxsize=None)
def _gate_fn(targets: tuple[int, ...], n: int, stage: int,
             pattern: tuple | None = None, donate: bool = True):
    """Dense gate on <=4 row qubits over canonical planes, optionally fused
    with per-branch diagonal ladder phases ("stages"). Returns a jitted
    ``fn(planes, coef, *(bt_i, ct_i)*stage)`` with every state buffer
    aliased in place.

    ``stage`` = how many targets carry a ladder phase (0 = plain dense;
    1 = the QFT stage H+ladder; 2 = a fused PAIR of stages — the whole
    4x4 mixing collapses into ``coef`` and each branch multiplies its own
    row x lane phase tables, so two QFT stages cost ONE state sweep).
    Phase i multiplies elements whose targets[i] bit is 1; its bt table has
    period ``_trail_rows`` (ladder bits sit below every axis target).

    Gate coefficients live in SMEM as a (2, 2^k, 2^k) argument whose index
    bit order is targets ascending (first target = MSB), so every gate with
    the same target positions shares one compile.

    ``pattern`` (optional) is a static (2^k, 2^k) tuple-of-tuples zero mask:
    True = entry may be nonzero. Terms whose every contributing entry is a
    structural zero are skipped at trace time — for permutation-like fused
    blocks (CX / Toffoli chains: 2^k nonzeros out of 4^k) this removes
    nearly all the mixing arithmetic AND the roll translates feeding it,
    keeping the pass DMA-bound. Compiles are keyed by the mask, so the
    all-dense mask (None) still shares one compile per target shape."""
    k = len(targets)
    assert 1 <= k <= 4
    plan = _RowPlan(targets, n, table_blocks=bool(stage))
    C, R, BT, trail = plan.C, plan.R, plan.BT, plan.trail
    dims, trail_pos = plan.dims, plan.trail_pos
    axis_sorted, rolls = plan.axis_sorted, plan.rolls
    grid_axes, grid, spec, slot = plan.grid_axes, plan.grid, plan.spec, plan.slot

    cf_spec = pl.BlockSpec((2, 1 << k, 1 << k), lambda *g: (0, 0, 0),
                           memory_space=pltpu.SMEM)

    # -- stage phase tables ---------------------------------------------------
    # bt_i: (2, trail) row-phase table (period = trail: ladder bits sit
    # below every axis target), block-sliced in lockstep with the trailing
    # row blocks; ct_i: (2, C) lane-phase table, resident.
    if stage:
        def bt_index(*gids):
            j = gids[-1] if trail_pos in grid_axes else 0
            return (0, j)

        bt_spec = pl.BlockSpec((2, BT), bt_index, memory_space=pltpu.VMEM)
        ct_spec = pl.BlockSpec((2, C), lambda *g: (0, 0),
                               memory_space=pltpu.VMEM)

    # -- in-kernel helpers ------------------------------------------------------
    def u_index(axis_bits, roll_bits):
        """Matrix index from per-target bits (targets ascending = MSB first)."""
        bits = [0] * k
        for (i, _), b in zip(axis_sorted, axis_bits):
            bits[i] = b
        for (i, _, _), b in zip(rolls, roll_bits):
            bits[i] = b
        out = 0
        for b in bits:
            out = (out << 1) | b
        return out

    n_ax = len(axis_sorted)
    n_rl = len(rolls)
    axis_assigns = list(itertools.product((0, 1), repeat=n_ax))
    roll_assigns = list(itertools.product((0, 1), repeat=n_rl))

    ax_pos = {i: a for a, (i, _) in enumerate(axis_sorted)}
    roll_pos = {i: r for r, (i, _, _) in enumerate(rolls)}

    def kernel(*refs):
        re_ref, im_ref, cf_ref = refs[:3]
        tables = refs[3:3 + 2 * stage]
        ro_ref, io_ref = refs[3 + 2 * stage:]

        masks = plan.make_masks()
        fetch = plan.make_fetch(masks)

        # load slots, build roll translates lazily
        base = {ja: (re_ref[slot(ja)], im_ref[slot(ja)]) for ja in axis_assigns}
        translates: dict = {}

        def X(ja, S):
            key = (ja, S)
            if key not in translates:
                if not S:
                    translates[key] = base[ja]
                else:
                    xr, xi = X(ja, S[:-1])
                    translates[key] = (fetch(xr, S[-1]), fetch(xi, S[-1]))
            return translates[key]

        def coef(part, ia, ja, S):
            """u[(ia, b), (ja, b ^ S)] selected over element roll bits b."""
            def entry(b):
                bj = tuple(bb ^ (1 if ridx in S else 0)
                           for ridx, bb in enumerate(b))
                if pattern is not None and not pattern[
                        u_index(ia, tuple(b))][u_index(ja, bj)]:
                    return jnp.float32(0.0)  # structural zero: constant-folds
                return cf_ref[part, u_index(ia, tuple(b)), u_index(ja, bj)]

            def tree(prefix):
                if len(prefix) == n_rl:
                    return entry(prefix)
                d = len(prefix)
                return jnp.where(masks[d], tree(prefix + (1,)),
                                 tree(prefix + (0,)))

            return tree(())

        def term_live(ia, ja, S):
            """Does u have any maybe-nonzero entry feeding term (ja, S)?"""
            if pattern is None:
                return True
            for b in roll_assigns:
                bj = tuple(bb ^ (1 if ridx in S else 0)
                           for ridx, bb in enumerate(b))
                if pattern[u_index(ia, b)][u_index(ja, bj)]:
                    return True
            return False

        phases = []
        for t in range(stage):
            bt_ref, ct_ref = tables[2 * t], tables[2 * t + 1]
            prr = bt_ref[0, :].reshape(BT, 1)
            pri = bt_ref[1, :].reshape(BT, 1)
            pcr = ct_ref[0, :].reshape(1, C)
            pci = ct_ref[1, :].reshape(1, C)
            phases.append((prr * pcr - pri * pci, prr * pci + pri * pcr))

        for ia in axis_assigns:
            yr, yi = None, None
            for ja in axis_assigns:
                for S in _subsets(range(n_rl)):
                    if not term_live(ia, ja, S):
                        continue
                    xr, xi = X(ja, S)
                    cr = coef(0, ia, ja, S)
                    ci = coef(1, ia, ja, S)
                    tr = cr * xr - ci * xi
                    ti = cr * xi + ci * xr
                    yr = tr if yr is None else yr + tr
                    yi = ti if yi is None else yi + ti
            if yr is None:  # unreachable for a unitary; keep shapes legal
                yr = jnp.zeros((BT, C), jnp.float32)
                yi = jnp.zeros((BT, C), jnp.float32)
            for t in range(stage):
                phr, phi = phases[t]
                if t in ax_pos:
                    if ia[ax_pos[t]] == 1:  # the |1> branch slot of target t
                        yr, yi = yr * phr - yi * phi, yr * phi + yi * phr
                else:
                    zr = yr * phr - yi * phi
                    zi = yr * phi + yi * phr
                    m = masks[roll_pos[t]]
                    yr = jnp.where(m, zr, yr)
                    yi = jnp.where(m, zi, yi)
            ro_ref[slot(ia)] = yr
            io_ref[slot(ia)] = yi

    shape = jax.ShapeDtypeStruct(tuple(dims), jnp.float32)

    in_specs = [spec, spec, cf_spec] + ([bt_spec, ct_spec] * stage if stage else [])

    def run(planes, coef, *tabs):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=in_specs,
            out_specs=(spec, spec),
            grid=grid,
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(dims), im.reshape(dims), coef, *tabs)
        return (ro.reshape(R, C), io.reshape(R, C))

    return jax.jit(run, donate_argnums=0) if donate else jax.jit(run)


# ---------------------------------------------------------------------------
# Row-qubit dense gates
# ---------------------------------------------------------------------------


#: specialize the kernel on the zero mask only when it pays: sparser than
#: this fraction of nonzeros (permutation-like blocks: CX/Toffoli chains)
_PATTERN_NNZ_MAX = 0.5


def _zero_pattern(cu: np.ndarray) -> tuple | None:
    """Static zero mask for _gate_fn, or None for dense-ish matrices (which
    then share the one all-dense compile per target shape)."""
    nz = np.abs(cu) > 1e-12
    if nz.mean() > _PATTERN_NNZ_MAX:
        return None
    return tuple(tuple(bool(x) for x in row) for row in nz)


def row_gate_prepare(u: np.ndarray, targets: tuple[int, ...], n: int,
                     donate: bool = True):
    """Host->device once: returns (fn, device operands) for repeated use.
    ``donate=False`` builds a functional variant that leaves the input
    planes valid (XLA inserts the defensive copy) — required by callers
    holding shared references, e.g. the interpreter's checkpointable
    ProgState."""
    cu = np.asarray(u, dtype=np.complex128)
    coef = np.stack([cu.real.astype(np.float32), cu.imag.astype(np.float32)])
    return (_gate_fn(tuple(targets), n, 0, _zero_pattern(cu), donate),
            jnp.asarray(coef))


def row_gate(planes: Planes, u: np.ndarray, targets: tuple[int, ...], n: int) -> Planes:
    """Apply a dense gate (complex (2^k, 2^k), sorted row targets) in place.
    Accepts flat or canonical planes; returns the input's shape."""
    fn, coef = row_gate_prepare(u, targets, n)
    return like_shape(fn(to_canon(planes, n), coef), planes)


# ---------------------------------------------------------------------------
# Sequential 1q layers: many disjoint single-qubit gates in one pass
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _layer1q_fn(targets: tuple[int, ...], n: int, donate: bool = True):
    """Many disjoint single-qubit gates applied SEQUENTIALLY to each block
    while it sits in VMEM — one streaming pass for a whole 1q layer (the
    generic RCS shape). Cost per element is 2 complex muls per sub-gate,
    vs 2^k for the dense fused block of the same targets: a layer of m
    gates stays near the DMA plateau instead of going compute-bound.

    Coefficients: (m, 2, 2, 2) SMEM argument (sub-gate, re/im, 2x2) in
    ``targets`` order (disjoint 1q gates commute, so order is free);
    every layer with the same target positions shares one compile."""
    k = len(targets)
    assert k >= 1
    plan = _RowPlan(targets, n)
    R, C = plan.R, plan.C
    dims, grid, spec, slot = plan.dims, plan.grid, plan.spec, plan.slot
    axis_sorted, rolls = plan.axis_sorted, plan.rolls

    cf_spec = pl.BlockSpec((k, 2, 2, 2), lambda *g: (0, 0, 0, 0),
                           memory_space=pltpu.SMEM)

    axis_assigns = list(itertools.product((0, 1), repeat=len(axis_sorted)))
    ax_slot = {i: a for a, (i, _) in enumerate(axis_sorted)}
    roll_of = {i: r for r, (i, _, _) in enumerate(rolls)}

    def kernel(re_ref, im_ref, cf_ref, ro_ref, io_ref):
        masks = plan.make_masks()
        fetch = plan.make_fetch(masks)

        vals = {ja: (re_ref[slot(ja)], im_ref[slot(ja)])
                for ja in axis_assigns}

        for g in range(k):
            c = [[(cf_ref[g, 0, i, j], cf_ref[g, 1, i, j])
                  for j in range(2)] for i in range(2)]
            if g in ax_slot:
                a = ax_slot[g]
                for ja in axis_assigns:
                    if ja[a] == 1:
                        continue
                    jb = ja[:a] + (1,) + ja[a + 1:]
                    x0r, x0i = vals[ja]
                    x1r, x1i = vals[jb]
                    (r00, i00), (r01, i01) = c[0]
                    (r10, i10), (r11, i11) = c[1]
                    vals[ja] = (r00 * x0r - i00 * x0i + r01 * x1r - i01 * x1i,
                                r00 * x0i + i00 * x0r + r01 * x1i + i01 * x1r)
                    vals[jb] = (r10 * x0r - i10 * x0i + r11 * x1r - i11 * x1i,
                                r10 * x0i + i10 * x0r + r11 * x1i + i11 * x1r)
            else:
                ridx = roll_of[g]
                m = masks[ridx]
                (r00, i00), (r01, i01) = c[0]
                (r10, i10), (r11, i11) = c[1]
                # bit=0 elements: y = u00 x + u01 partner
                # bit=1 elements: y = u11 x + u10 partner
                cxr = jnp.where(m, r11, r00)
                cxi = jnp.where(m, i11, i00)
                cpr = jnp.where(m, r10, r01)
                cpi = jnp.where(m, i10, i01)
                for ja in axis_assigns:
                    xr, xi = vals[ja]
                    pr = fetch(xr, ridx)
                    pi = fetch(xi, ridx)
                    vals[ja] = (cxr * xr - cxi * xi + cpr * pr - cpi * pi,
                                cxr * xi + cxi * xr + cpr * pi + cpi * pr)

        for ja in axis_assigns:
            yr, yi = vals[ja]
            ro_ref[slot(ja)] = yr
            io_ref[slot(ja)] = yi

    shape = jax.ShapeDtypeStruct(tuple(dims), jnp.float32)

    def run(planes, coefs):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, cf_spec],
            out_specs=(spec, spec),
            grid=grid,
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(dims), im.reshape(dims), coefs)
        return (ro.reshape(R, C), io.reshape(R, C))

    return jax.jit(run, donate_argnums=0) if donate else jax.jit(run)


def layer1q_prepare(gates, n: int):
    """Host->device for a disjoint-1q layer: ``gates`` = ((u (2,2), q), ...)
    with distinct row qubits q. Returns (fn, coefs)."""
    order = sorted(range(len(gates)), key=lambda i: gates[i][1])
    targets = tuple(gates[i][1] for i in order)
    cs = np.stack([
        np.stack([np.asarray(gates[i][0]).real.astype(np.float32),
                  np.asarray(gates[i][0]).imag.astype(np.float32)])
        for i in order
    ])
    return (_layer1q_fn(targets, n), jnp.asarray(cs))


# ---------------------------------------------------------------------------
# Fused diagonal layer
# ---------------------------------------------------------------------------


def _diag_tables(factors, n: int, C: int):
    """Host-side decomposition of a diagonal layer over the (R, C) view.

    Every factor's value is multilinear in its target bits. Factors entirely
    within the row bits fold into one complex row-phase vector Prow[r];
    factors within the col bits fold into Pcol[c]; a straddling factor with
    row bits RB and col bits CB expands as a sum over row-bit assignments:
      v[r, c] = sum_{a in {0,1}^|RB|} Ind_a[r] * T_a[c]
    with Ind_a a 0/1 row vector and T_a = d[a, colbits] a col vector.

    Returns (row_tables (F_r, R) f32, col_tables (F_c, C) f32, terms) where
    terms lists, per straddling factor, the (row_index, col_re_index,
    col_im_index) triples of its sum terms. The total phase is
      P = Prow * Pcol * prod_s ( sum_j Ind_j * T_j ).
    """
    R = 1 << (n - (C.bit_length() - 1))
    log_c = C.bit_length() - 1
    rows = np.arange(R, dtype=np.int64)
    cols = np.arange(C, dtype=np.int64)

    def bitvec(t):
        pos = n - 1 - t
        if pos >= log_c:
            return ((rows >> (pos - log_c)) & 1), True
        return ((cols >> pos) & 1), False

    prow = np.ones(R, dtype=np.complex128)
    pcol = np.ones(C, dtype=np.complex128)
    straddle = []
    for d, targets in factors:
        d = np.asarray(d, dtype=np.complex128)
        k = len(targets)
        vecs = [bitvec(t) for t in targets]
        if all(is_row for _, is_row in vecs):
            idx = np.zeros(R, dtype=np.int64)
            for bv, _ in vecs:
                idx = (idx << 1) | bv
            prow *= d[idx]
        elif all(not is_row for _, is_row in vecs):
            idx = np.zeros(C, dtype=np.int64)
            for bv, _ in vecs:
                idx = (idx << 1) | bv
            pcol *= d[idx]
        else:
            rbs = [(bv, t) for (bv, is_row), t in zip(vecs, targets) if is_row]
            cbs = [(bv, t) for (bv, is_row), t in zip(vecs, targets) if not is_row]
            kr = len(rbs)
            # permute the table so row bits lead: d[a_row..., b_col...]
            order = [targets.index(t) for _, t in rbs] + [targets.index(t) for _, t in cbs]
            dk = d.reshape((2,) * k).transpose(order).reshape(1 << kr, -1)
            cidx = np.zeros(C, dtype=np.int64)
            for bv, _ in cbs:
                cidx = (cidx << 1) | bv
            def ind_of(a):
                ind = np.ones(R, dtype=np.float32)
                for j, (bv, _) in enumerate(rbs):
                    want = (a >> (kr - 1 - j)) & 1
                    ind *= (bv == want).astype(np.float32)
                return ind

            terms = [(ind_of(a), dk[a][cidx]) for a in range(1 << kr)]
            # common-vector extraction: v = T_base + sum_{a: T_a != base}
            # Ind_a (T_a - base). A one-point diagonal (e.g. a Grover
            # oracle's phase flip over the whole register) collapses from
            # 2^kr terms to 2 regardless of width.
            keys = [dk[a].tobytes() for a in range(1 << kr)]
            base_key = max(set(keys), key=keys.count)
            a0 = keys.index(base_key)
            alt = [(ind_of(a), (dk[a] - dk[a0])[cidx])
                   for a in range(1 << kr) if keys[a] != base_key]
            if 1 + len(alt) < len(terms):
                terms = [(np.ones(R, dtype=np.float32), dk[a0][cidx])] + alt
            straddle.append(terms)

    row_tables = [prow.real.astype(np.float32), prow.imag.astype(np.float32)]
    col_tables = [pcol.real.astype(np.float32), pcol.imag.astype(np.float32)]
    factor_terms = []
    for terms in straddle:
        tlist = []
        for ind, tcol in terms:
            tlist.append((len(row_tables), len(col_tables), len(col_tables) + 1))
            row_tables.append(ind)
            col_tables.extend([tcol.real.astype(np.float32),
                               tcol.imag.astype(np.float32)])
        factor_terms.append(tuple(tlist))
    return np.stack(row_tables), np.stack(col_tables), tuple(factor_terms)


#: max straddle TERMS (sum-of-products row entries) per diag kernel pass —
#: this TPU's compiler rejects larger fused bodies at >= 2^27 states
#: (empirically: 8 terms compile at n=28, 10 do not)
_MAX_STRADDLE_TERMS = 8


def _pad8(a):
    f = a.shape[0]
    pad = (-f) % 8
    if pad:
        a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _straddle_weight(f, b: int) -> int:
    """Straddle terms this factor contributes to a pass: 0 if it folds into
    Prow/Pcol, else the COMPRESSED term count _diag_tables will emit (the
    common-vector extraction there collapses e.g. a one-point oracle from
    2^kr terms to 2 — grouping must account the same way or it both
    over-splits passes and misses real overflows)."""
    d, targets = f
    kr = sum(1 for t in targets if t < b)
    k = len(targets)
    if kr == 0 or kr == k:
        return 0
    worst = 1 << kr
    d = np.asarray(d, dtype=np.complex128).reshape((2,) * k)
    order = ([i for i, t in enumerate(targets) if t < b]
             + [i for i, t in enumerate(targets) if t >= b])
    dk = d.transpose(order).reshape(worst, -1)
    keys = [dk[a].tobytes() for a in range(worst)]
    base = max(set(keys), key=keys.count)
    alt = sum(1 for kk in keys if kk != base)
    return min(worst, 1 + alt)


def _split_factor_phases(f):
    """Exact multiplicative split of one diagonal factor into
    multi-controlled-phase factors, each of which compresses to <= 2
    straddle terms regardless of width.

    Writes d[bits] = exp(L[bits]) and expands L multilinearly over the
    bit lattice (Moebius transform): L[b] = sum_{S subseteq b} c_S, so
    d = prod_S cphase(exp(c_S) on targets S). Exact for any zero-free
    diagonal (unitary diagonals are unit-modulus; branch cuts cancel in
    exp). Returns None when d has zero entries (log undefined) — the
    caller keeps the factor whole."""
    d, targets = f
    k = len(targets)
    d = np.asarray(d, dtype=np.complex128).ravel()
    if np.any(np.abs(d) < 1e-300):
        return None
    c = np.log(d.copy())
    for j in range(k):
        bit = 1 << j
        hi = (np.arange(1 << k) & bit).astype(bool)
        c[hi] -= c[np.arange(1 << k)[hi] ^ bit]
    # array index bit (k-1-j) corresponds to targets[j] (MSB-first, as in
    # _diag_tables' idx construction)
    out = []
    for s in range(1, 1 << k):
        if abs(c[s]) < 1e-14:
            continue
        sub = tuple(targets[j] for j in range(k) if s & (1 << (k - 1 - j)))
        m = len(sub)
        ds = np.ones(1 << m, dtype=np.complex128)
        ds[-1] = np.exp(c[s])
        out.append((ds, sub))
    glob = np.exp(c[0])
    if abs(glob - 1.0) > 1e-14:
        if out:
            d0, t0 = out[0]
            out[0] = (d0 * glob, t0)
        else:
            out.append((np.array([glob, glob]), (targets[0],)))
    return out


def _diag_groups(factors, n: int):
    """Group a diagonal layer into as few passes as the compiler allows:
    all row-only/col-only factors fold into the first pass for free;
    row/col-straddling factors are packed subject to _MAX_STRADDLE_TERMS
    per pass (compressed term counts). A single factor that alone exceeds
    the cap (incompressible diagonal with >3 row bits) is split exactly
    into controlled-phase factors of <= 2 terms each first."""
    log_c = min(_C0, 1 << n).bit_length() - 1
    b = n - log_c

    items: list[tuple] = []  # (factor, weight)
    for f in factors:
        w = _straddle_weight(f, b)
        if w > _MAX_STRADDLE_TERMS:
            parts = _split_factor_phases(f)
            if parts is not None:
                items.extend((p, _straddle_weight(p, b)) for p in parts)
                continue
        items.append((f, w))

    plain = [f for f, w in items if w == 0]
    strad = [(f, w) for f, w in items if w > 0]
    groups: list[list] = [list(plain)]
    w = 0
    for f, fw in strad:
        if w + fw > _MAX_STRADDLE_TERMS and w > 0:
            groups.append([])
            w = 0
        groups[-1].append(f)
        w += fw
    return [g for g in groups if g]


def diag_layer_prepare(factors, n: int, donate: bool = True):
    """Host->device once: [(fn, row_tables_dev, col_tables_dev)] per pass.

    Moving the phase tables to device once matters: rebuilding + re-uploading
    them per call costs more than the kernel itself through a remote-device
    tunnel."""
    prepared = []
    for g in _diag_groups(factors, n):
        C = min(_C0, 1 << n)
        row_t, col_t, factor_terms = _diag_tables(g, n, C)
        row_t, col_t = _pad8(row_t), _pad8(col_t)
        fn = _diag_pass_fn(factor_terms, n, row_t.shape[0], col_t.shape[0],
                           donate)
        prepared.append((fn, jnp.asarray(row_t), jnp.asarray(col_t)))
    return prepared


def diag_layer_apply(planes: Planes, prepared) -> Planes:
    for fn, rt, ct in prepared:
        planes = fn(planes, rt, ct)
    return planes


def diag_layer(planes: Planes, factors, n: int) -> Planes:
    cp = to_canon(planes, n)
    return like_shape(diag_layer_apply(cp, diag_layer_prepare(factors, n)), planes)


@functools.lru_cache(maxsize=None)
def _diag_pass_fn(factor_terms, n: int, FR: int, FC: int,
                  donate: bool = True):
    # BR must be lane-aligned (128) because the row tables' blocks use it as
    # their last dim; C stays a multiple of 128 for the state blocks
    C = min(_C0, 1 << n)
    R = (1 << n) // C
    BR = min(R, 128)

    def kernel(re_ref, im_ref, rt_ref, ct_ref, ro_ref, io_ref):
        # phase P = Prow * Pcol * prod_factors (sum_j Ind_j * T_j)
        prr = rt_ref[0, :].reshape(BR, 1)
        pri = rt_ref[1, :].reshape(BR, 1)
        pcr = ct_ref[0, :].reshape(1, C)
        pci = ct_ref[1, :].reshape(1, C)
        pr = prr * pcr - pri * pci
        pi = prr * pci + pri * pcr
        for terms in factor_terms:
            vr, vi = None, None
            for ri, cri, cii in terms:
                ind = rt_ref[ri, :].reshape(BR, 1)
                tr = ct_ref[cri, :].reshape(1, C)
                ti = ct_ref[cii, :].reshape(1, C)
                ar = ind * tr
                ai = ind * ti
                vr = ar if vr is None else vr + ar
                vi = ai if vi is None else vi + ai
            pr, pi = pr * vr - pi * vi, pr * vi + pi * vr
        xr_ = re_ref[...]
        xi_ = im_ref[...]
        ro_ref[...] = xr_ * pr - xi_ * pi
        io_ref[...] = xr_ * pi + xi_ * pr

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec((FR, BR), lambda i: (0, i), memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((FC, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes, row_t, col_t):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, rt_spec, ct_spec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re, im, row_t, col_t)
        return (ro, io)

    return jax.jit(run, donate_argnums=0) if donate else jax.jit(run)


# ---------------------------------------------------------------------------
# Lane-block dense gates (targets within the last _COL qubits)
# ---------------------------------------------------------------------------


def lane_gate_prepare(u: np.ndarray, n: int, donate: bool = True):
    """Host->device once: (fn, Mr_dev, Mi_dev) for repeated use."""
    mr = np.ascontiguousarray(u.real.astype(np.float32).T)  # (in, out)
    mi = np.ascontiguousarray(u.imag.astype(np.float32).T)
    return (_lane_gate_fn(n, donate), jnp.asarray(mr), jnp.asarray(mi))


def lane_gate(planes: Planes, u: np.ndarray, n: int) -> Planes:
    """Apply a dense gate pre-expanded over the whole lane block
    (u: (2^_COL, 2^_COL) complex) as MXU matmuls, in place. One compile
    per n — the matrix is an argument."""
    fn, mr, mi = lane_gate_prepare(u, n)
    return like_shape(fn(to_canon(planes, n), mr, mi), planes)


@functools.lru_cache(maxsize=None)
def _lane_gate_fn(n: int, donate: bool = True):
    C = canon_cols(n)
    lanes = 1 << min(n, _COL)
    groups = C // lanes
    R = (1 << n) // C
    BR = min(R, 128)

    def kernel(re_ref, im_ref, mr_ref, mi_ref, ro_ref, io_ref):
        # reshape VALUES (not the array) so the last 7 bits become the
        # matmul axis — in-kernel value reshapes are free of HBM traffic
        xr = re_ref[...].reshape(BR * groups, lanes)
        xi = im_ref[...].reshape(BR * groups, lanes)
        mrc = mr_ref[...]
        mic = mi_ref[...]
        hi = jax.lax.Precision.HIGHEST
        rr = jnp.dot(xr, mrc, precision=hi, preferred_element_type=jnp.float32)
        ii = jnp.dot(xi, mic, precision=hi, preferred_element_type=jnp.float32)
        ri = jnp.dot(xr, mic, precision=hi, preferred_element_type=jnp.float32)
        ir = jnp.dot(xi, mrc, precision=hi, preferred_element_type=jnp.float32)
        ro_ref[...] = (rr - ii).reshape(BR, C)
        io_ref[...] = (ri + ir).reshape(BR, C)

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((lanes, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes, mr, mi):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, mspec, mspec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re, im, mr, mi)
        return (ro, io)

    return jax.jit(run, donate_argnums=0) if donate else jax.jit(run)


# ---------------------------------------------------------------------------
# Cross-shard butterfly: dense gate on VIRTUAL-shard index bits, in place
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _shard_butterfly_fn(k: int, m: int):
    """Dense (2^k, 2^k) gate across 2^k whole shards of 2^m amplitudes:
    one streaming pass with EVERY shard buffer aliased in place — the
    jit-sum fallback peaks at state + one shard, which is what exhausted
    HBM at n=30 (state = half of HBM)."""
    C = min(_C0, 1 << m)
    R = (1 << m) // C
    BR = min(R, 128)
    S = 1 << k

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((2, S, S), lambda i: (0, 0, 0),
                           memory_space=pltpu.SMEM)

    def kernel(*refs):
        ins, cf_ref, outs = refs[: 2 * S], refs[2 * S], refs[2 * S + 1:]
        xs = [(ins[2 * j][...], ins[2 * j + 1][...]) for j in range(S)]
        for i in range(S):
            yr, yi = None, None
            for j in range(S):
                cr = cf_ref[0, i, j]
                ci = cf_ref[1, i, j]
                xr, xi = xs[j]
                tr = cr * xr - ci * xi
                ti = cr * xi + ci * xr
                yr = tr if yr is None else yr + tr
                yi = ti if yi is None else yi + ti
            outs[2 * i][...] = yr
            outs[2 * i + 1][...] = yi

    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(pairs, coef):
        args = []
        for re, im in pairs:
            args.extend([re, im])
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(shape for _ in range(2 * S)),
            in_specs=[spec] * (2 * S) + [cf_spec],
            out_specs=tuple(spec for _ in range(2 * S)),
            grid=(R // BR,),
            input_output_aliases={j: j for j in range(2 * S)},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(*args, coef)
        return tuple((outs[2 * i], outs[2 * i + 1]) for i in range(S))

    return jax.jit(run, donate_argnums=0)


def shard_butterfly_prepare(u: np.ndarray, m: int):
    """(fn, coef) applying dense ``u`` across 2^k canonical shard pairs of
    2^m amps each."""
    S = u.shape[0]
    k = S.bit_length() - 1
    cu = np.asarray(u, dtype=np.complex128)
    coef = np.stack([cu.real.astype(np.float32), cu.imag.astype(np.float32)])
    return _shard_butterfly_fn(k, m), jnp.asarray(coef)


# ---------------------------------------------------------------------------
# Fused stage kernel: 1q row gate + controlled-phase ladder in ONE pass
# ---------------------------------------------------------------------------


def _phase_tables(factors, q: int, targets: tuple[int, ...], n: int):
    """(bt (2, trail), ct (2, C)) for a ladder of 2q diagonal factors
    (q, j), j > q: the phase applied on the |1>_q branch, factorized into a
    trailing-row table x a lane table (ladder bits sit below every axis
    target of ``targets``, so the row table has period _trail_rows)."""
    C = canon_cols(n)
    log_c = C.bit_length() - 1
    T = _trail_rows(targets, n)

    brow = np.ones(T, dtype=np.complex128)
    ccol = np.ones(C, dtype=np.complex128)
    ridx = np.arange(T, dtype=np.int64)
    cidx = np.arange(C, dtype=np.int64)
    for d, (qq, j) in factors:
        assert qq == q and j > q
        d = np.asarray(d, dtype=np.complex128)
        # phase applied on the |1>_q branch when bit j is 1: d[3] (vs d[2]=1)
        on, off = d[3], d[2]
        pos = n - 1 - j
        if pos >= log_c:
            bit = (ridx >> (pos - log_c)) & 1
            brow *= np.where(bit == 1, on, off)
        else:
            bit = (cidx >> pos) & 1
            ccol *= np.where(bit == 1, on, off)

    bt = np.stack([brow.real.astype(np.float32), brow.imag.astype(np.float32)])
    ct = np.stack([ccol.real.astype(np.float32), ccol.imag.astype(np.float32)])
    return jnp.asarray(bt), jnp.asarray(ct)


def stage_block_prepare(stages, n: int):
    """Host->device for a fused BLOCK of k <= 4 stages: the circuit
    U1(q1); D1(q1,*); U2(q2); D2(q2,*); ...; Uk(qk); Dk(qk,*) with
    q1 < q2 < ... < qk in ONE state sweep.

    ``stages`` = ((u (2,2) complex, q, factors), ...) where each ``factors``
    is a ladder ((d (4,), (q, j)), ...) with j > q. The (q_t, q_s) factors
    internal to the block see U_t's OUTPUT bit i_t and U_s's INPUT bit j_s
    (D_t sits between them), so the whole mixing folds into a constant
    2^k x 2^k coefficient block:

        y(i1..ik) = prod_t P_t^{i_t} * sum_{j1..jk}
                    prod_t U_t[i_t, j_t] * prod_{t<s} d_ts[(i_t<<1)|j_s]
                    * x(j1..jk)

    where P_t are the per-stage EXTERNAL ladders' phases, factorized into
    row x lane tables (valid because grouping is over consecutive q's, so
    every external j exceeds the block's max target and its bit sits below
    every target). Returns (fn, coef, bt_1, ct_1, ..., bt_k, ct_k)."""
    k = len(stages)
    assert 1 <= k <= 4
    targets = tuple(q for _, q, _ in stages)
    assert all(targets[i] < targets[i + 1] for i in range(k - 1)), targets
    pos = {q: t for t, q in enumerate(targets)}

    intra: dict[tuple[int, int], np.ndarray] = {}
    tables = []
    for t, (_, q, factors) in enumerate(stages):
        rest = []
        for d, (qq, j) in factors:
            if j in pos:
                intra[(t, pos[j])] = np.asarray(d, dtype=np.complex128)
            else:
                assert j > targets[-1], (targets, j)
                rest.append((d, (qq, j)))
        tables.extend(_phase_tables(rest, q, targets, n))

    us = [np.asarray(u, dtype=np.complex128) for u, _, _ in stages]
    dim = 1 << k
    cmat = np.zeros((dim, dim), dtype=np.complex128)
    for i in range(dim):
        ib = [(i >> (k - 1 - t)) & 1 for t in range(k)]
        for j in range(dim):
            jb = [(j >> (k - 1 - t)) & 1 for t in range(k)]
            val = np.complex128(1)
            for t in range(k):
                val *= us[t][ib[t], jb[t]]
            for (t, s), d in intra.items():
                val *= d[(ib[t] << 1) | jb[s]]
            cmat[i, j] = val
    coef = np.stack([cmat.real.astype(np.float32),
                     cmat.imag.astype(np.float32)])
    return (_gate_fn(targets, n, k), jnp.asarray(coef), *tables)


def stage_prepare(u: np.ndarray, q: int, factors, n: int):
    """One fused stage (u on q + its ladder): stage_block_prepare k=1."""
    return stage_block_prepare(((u, q, factors),), n)


def stage2_prepare(u1: np.ndarray, q1: int, factors1, u2: np.ndarray,
                   q2: int, factors2, n: int):
    """A fused pair of stages: stage_block_prepare k=2."""
    return stage_block_prepare(((u1, q1, factors1), (u2, q2, factors2)), n)
