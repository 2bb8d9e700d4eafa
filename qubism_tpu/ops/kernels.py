"""Pallas TPU kernels — the speed-of-light path.

The XLA backend applies one HBM pass per *operation* (measured: it does not
fuse broadcast-multiply chains or reversed views into single sweeps on this
TPU), so deep circuits pay one full state read+write per gate. These kernels
restore the intended cost model:

* :func:`row_gate` — strided index-pair butterfly for dense gates on "row"
  qubits (pair stride >= 128): each grid block holds all 2^k target-bit
  combinations in VMEM and recombines them with constant coefficients —
  one read+write of the state per gate, pure VPU.
* :func:`diag_layer` — an ENTIRE layer of commuting diagonal factors
  (controlled-phase ladders, CZ bricks, rz...) in ONE pass: per block, the
  phase product is evaluated from index bits via iota/shift/select, then
  multiplied in. 16 factors cost the same single sweep as one.
* :func:`lane_gate` — dense gates on the last 7 ("lane") qubits as 128-wide
  real matmuls on the MXU, with the gate expanded over the lane block.

All kernels run **in place** (``input_output_aliases``): peak HBM stays one
state vector, which is what makes n=30 (2 x 4 GiB planes) fit on a 16 GiB
chip.

Blocks are (rows, C) tiles with C a multiple of 128 (lane tiling) and the
pair axis kept inside the block, so no kernel ever materializes a
small-trailing-dim view (see ops/apply.py's layout discipline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .apply import _COL, Planes

#: target elements per block per plane (f32): 8192 lanes x 8 sublanes
_BLOCK_C = 8192
_BLOCK_ROWS = 8

#: set True to run kernels in interpreter mode (CPU tests)
INTERPRET = False


def _interpret():
    if INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# Row-qubit dense gates (pair stride >= 2^_COL)
# ---------------------------------------------------------------------------


#: tails at or below this use the flat (rows, 2*tail) view: the classic
#: interleaved view's trailing (B, C) dims get too small and the (8, 128)
#: physical tile pads them (measured 16-28x slowdowns for the last QFT
#: stages at n=28); the flat view keeps every block (>=8, >=256) and runs
#: at the streaming plateau (see experiments/bw_probe.py)
_FLAT_TAIL_MAX = 32768


def _flat_rows(A: int, W: int, block_bytes: int = 1 << 21) -> int:
    """Rows per block for a flat (A, W) view: ~2 MB blocks, >= 8 rows."""
    br = max(8, block_bytes // (W * 4))
    br = min(br, A)
    while A % br:
        br //= 2
    return max(br, 1)


def _row_plan(n: int, targets: tuple[int, ...]):
    """View + block plan for a dense gate on sorted row targets.

    View: interleaved (seg, 2, seg, 2, ..., tail) with the trailing segment
    tail = 2^(n-1-max(targets)) >= 2^_COL split as (B, C) when large.
    Blocks slice every non-target axis; each block holds all 2^k combos.
    """
    k = len(targets)
    dims: list[int] = []
    tpos: list[int] = []
    prev = 0
    for t in targets:
        if t - prev > 0:
            dims.append(1 << (t - prev))
        tpos.append(len(dims))
        dims.append(2)
        prev = t + 1
    tail = 1 << (n - prev)
    if tail > _BLOCK_C:
        dims.append(tail // _BLOCK_C)
        dims.append(_BLOCK_C)
    else:
        dims.append(tail)
    return tuple(dims), tuple(tpos)


@functools.lru_cache(maxsize=None)
def _row_gate_fn(targets: tuple[int, ...], n: int):
    """Cached jitted kernel for dense row gates on ``targets`` (sorted).
    Gate coefficients are an SMEM argument, so every gate with the same
    target positions shares ONE compile.

    Dispatch: gates whose innermost target has a narrow tail use flat
    (rows, width) views (see _FLAT_TAIL_MAX); wide tails use the classic
    interleaved view."""
    tail = 1 << (n - 1 - targets[-1])
    if tail <= _FLAT_TAIL_MAX and len(targets) <= 2:
        if len(targets) == 1:
            return _row_flat_1q_fn(targets[0], n)
        t1, t2 = targets
        if (1 << (t2 - t1 - 1)) >= 8:
            return _row_flat_2q_blocked_fn(t1, t2, n)
        return _row_flat_2q_inrow_fn(t1, t2, n)
    return _row_gate_classic_fn(targets, n)


def _complex_butterfly(cf_ref, k: int, xs):
    """ys[i] = sum_j u[i,j] xs[j] with u from the (2, 2^k, 2^k) SMEM ref."""
    ys = []
    for i in range(1 << k):
        yr, yi = None, None
        for j in range(1 << k):
            cr = cf_ref[0, i, j]
            ci = cf_ref[1, i, j]
            xr, xi = xs[j]
            tr = cr * xr - ci * xi
            ti = cr * xi + ci * xr
            yr = tr if yr is None else yr + tr
            yi = ti if yi is None else yi + ti
        ys.append((yr, yi))
    return ys


def _cf_spec(k: int, grid_rank: int):
    zero = (lambda *g: (0, 0, 0))
    return pl.BlockSpec((2, 1 << k, 1 << k), zero, memory_space=pltpu.SMEM)


@functools.lru_cache(maxsize=None)
def _row_flat_1q_fn(t: int, n: int):
    """1q dense on row qubit t with tail <= _FLAT_TAIL_MAX: flat (A, 2*tail)
    view, the pair halves are static lane slices."""
    tail = 1 << (n - 1 - t)
    A = 1 << t
    W = 2 * tail
    BR = _flat_rows(A, W)

    spec = pl.BlockSpec((BR, W), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, cf_ref, ro_ref, io_ref):
        xs = [(re_ref[:, :tail], im_ref[:, :tail]),
              (re_ref[:, tail:], im_ref[:, tail:])]
        (y0r, y0i), (y1r, y1i) = _complex_butterfly(cf_ref, 1, xs)
        ro_ref[:, :tail] = y0r
        io_ref[:, :tail] = y0i
        ro_ref[:, tail:] = y1r
        io_ref[:, tail:] = y1i

    shape = jax.ShapeDtypeStruct((A, W), jnp.float32)

    def run(planes, coef):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, _cf_spec(1, 1)],
            out_specs=(spec, spec),
            grid=(A // BR,),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(A, W), im.reshape(A, W), coef)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def _row_flat_2q_blocked_fn(t1: int, t2: int, n: int):
    """2q dense, t2's tail narrow, gap B = 2^(t2-t1-1) >= 8: view
    (A1, 2, B, 2*tail2), block (1, 2, BB, 2*tail2)."""
    tail = 1 << (n - 1 - t2)
    W = 2 * tail
    A = 1 << t1
    B = 1 << (t2 - t1 - 1)
    BB = _flat_rows(B, W)

    spec = pl.BlockSpec((1, 2, BB, W), lambda a, j: (a, 0, j, 0),
                        memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, cf_ref, ro_ref, io_ref):
        def sl(j):
            b1, b2 = (j >> 1) & 1, j & 1
            return (0, b1, slice(None), slice(b2 * tail, (b2 + 1) * tail))

        xs = [(re_ref[sl(j)], im_ref[sl(j)]) for j in range(4)]
        ys = _complex_butterfly(cf_ref, 2, xs)
        for i in range(4):
            ro_ref[sl(i)] = ys[i][0]
            io_ref[sl(i)] = ys[i][1]

    dims = (A, 2, B, W)
    shape = jax.ShapeDtypeStruct(dims, jnp.float32)

    def run(planes, coef):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, _cf_spec(2, 2)],
            out_specs=(spec, spec),
            grid=(A, B // BB),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(dims), im.reshape(dims), coef)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def _row_flat_2q_inrow_fn(t1: int, t2: int, n: int):
    """2q dense, t2's tail narrow, gap B < 8 (adjacent/near targets): flat
    (A1, 2^(n-t1)) view with BOTH pairs in-row; a static sub-row loop walks
    the B interleaved chunks."""
    tail = 1 << (n - 1 - t2)
    B = 1 << (t2 - t1 - 1)
    A = 1 << t1
    WF = 1 << (n - t1)
    s1 = WF // 2
    BR = _flat_rows(A, WF)

    spec = pl.BlockSpec((BR, WF), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, cf_ref, ro_ref, io_ref):
        for g in range(B):
            def sl(j, g=g):
                b1, b2 = (j >> 1) & 1, j & 1
                off = b1 * s1 + g * 2 * tail + b2 * tail
                return (slice(None), slice(off, off + tail))

            xs = [(re_ref[sl(j)], im_ref[sl(j)]) for j in range(4)]
            ys = _complex_butterfly(cf_ref, 2, xs)
            for i in range(4):
                ro_ref[sl(i)] = ys[i][0]
                io_ref[sl(i)] = ys[i][1]

    shape = jax.ShapeDtypeStruct((A, WF), jnp.float32)

    def run(planes, coef):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, _cf_spec(2, 1)],
            out_specs=(spec, spec),
            grid=(A // BR,),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(A, WF), im.reshape(A, WF), coef)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


def _vmem_kwargs():
    if _interpret():
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2**20)}


@functools.lru_cache(maxsize=None)
def _row_gate_classic_fn(targets: tuple[int, ...], n: int):
    """Classic interleaved view (wide tails)."""
    k = len(targets)
    dims, tpos = _row_plan(n, targets)
    rank = len(dims)

    grid_axes = [a for a in range(rank) if a not in tpos]
    block_shape = [1] * rank
    for p in tpos:
        block_shape[p] = 2
    block_shape[-1] = dims[-1]  # full trailing dim (>= 128)
    if rank - 1 in grid_axes:
        grid_axes.remove(rank - 1)
    if grid_axes and grid_axes[-1] == rank - 2 and rank - 2 not in tpos:
        depth = min(dims[rank - 2], _BLOCK_ROWS)
        if dims[rank - 2] % depth == 0:
            block_shape[rank - 2] = depth
    grid = tuple(dims[a] // block_shape[a] for a in grid_axes)

    def index_map(*gids):
        out = [0] * rank
        for g, a in zip(gids, grid_axes):
            out[a] = g
        return tuple(out)

    spec = pl.BlockSpec(tuple(block_shape), index_map, memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((2, 1 << k, 1 << k),
                           (lambda *gids: (0, 0, 0)), memory_space=pltpu.SMEM)

    def kernel(re_ref, im_ref, cf_ref, ro_ref, io_ref):
        def slot(j):
            idx = [0] * rank
            for b, p in enumerate(tpos):
                idx[p] = (j >> (k - 1 - b)) & 1
            idx[-1] = slice(None)
            if block_shape[-2] > 1 and (rank - 2) not in tpos:
                idx[-2] = slice(None)
            return tuple(idx)

        xs = [(re_ref[slot(j)], im_ref[slot(j)]) for j in range(1 << k)]
        for i in range(1 << k):
            yr, yi = None, None
            for j in range(1 << k):
                cr = cf_ref[0, i, j]
                ci = cf_ref[1, i, j]
                xr, xi = xs[j]
                tr = cr * xr - ci * xi
                ti = cr * xi + ci * xr
                yr = tr if yr is None else yr + tr
                yi = ti if yi is None else yi + ti
            ro_ref[slot(i)] = yr
            io_ref[slot(i)] = yi

    shape = jax.ShapeDtypeStruct(tuple(dims), jnp.float32)

    def run(planes, coef):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, cf_spec],
            out_specs=(spec, spec),
            grid=grid,
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
        )(re.reshape(dims), im.reshape(dims), coef)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


def row_gate_prepare(u: np.ndarray, targets: tuple[int, ...], n: int):
    """Host->device once: returns (fn, device operands) for repeated use."""
    cu = np.asarray(u, dtype=np.complex128)
    coef = np.stack([cu.real.astype(np.float32), cu.imag.astype(np.float32)])
    return (_row_gate_fn(tuple(targets), n), jnp.asarray(coef))


def row_gate(planes: Planes, u: np.ndarray, targets: tuple[int, ...], n: int) -> Planes:
    """Apply a dense gate (complex (2^k, 2^k), sorted row targets) in place."""
    fn, coef = row_gate_prepare(u, targets, n)
    return fn(planes, coef)


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
            terms = []
            for a in range(1 << kr):
                ind = np.ones(R, dtype=np.float32)
                for j, (bv, _) in enumerate(rbs):
                    want = (a >> (kr - 1 - j)) & 1
                    ind *= (bv == want).astype(np.float32)
                terms.append((ind, dk[a][cidx]))
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


def _diag_groups(factors, n: int):
    """Group a diagonal layer into as few passes as the compiler allows:
    all row-only/col-only factors fold into the first pass for free;
    row/col-straddling factors are packed subject to _MAX_STRADDLE_TERMS
    per pass."""
    log_c = min(2048, 1 << n).bit_length() - 1
    b = n - log_c

    def weight(f):
        _, targets = f
        kr = sum(1 for t in targets if t < b)
        if kr == 0 or kr == len(targets):
            return 0  # folds into Prow/Pcol for free
        return 1 << kr  # sum-of-products terms

    plain = [f for f in factors if weight(f) == 0]
    strad = [f for f in factors if weight(f) > 0]
    groups: list[list] = [list(plain)]
    w = 0
    for f in strad:
        if w + weight(f) > _MAX_STRADDLE_TERMS and w > 0:
            groups.append([])
            w = 0
        groups[-1].append(f)
        w += weight(f)
    return [g for g in groups if g]


def diag_layer_prepare(factors, n: int):
    """Host->device once: [(fn, row_tables_dev, col_tables_dev)] per pass.

    Moving the phase tables to device once matters: rebuilding + re-uploading
    them per call costs more than the kernel itself through a remote-device
    tunnel."""
    prepared = []
    for g in _diag_groups(factors, n):
        C = min(2048, 1 << n)
        row_t, col_t, factor_terms = _diag_tables(g, n, C)
        row_t, col_t = _pad8(row_t), _pad8(col_t)
        fn = _diag_pass_fn(factor_terms, n, row_t.shape[0], col_t.shape[0])
        prepared.append((fn, jnp.asarray(row_t), jnp.asarray(col_t)))
    return prepared


def diag_layer_apply(planes: Planes, prepared) -> Planes:
    for fn, rt, ct in prepared:
        planes = fn(planes, rt, ct)
    return planes


def diag_layer(planes: Planes, factors, n: int) -> Planes:
    return diag_layer_apply(planes, diag_layer_prepare(factors, n))


@functools.lru_cache(maxsize=None)
def _diag_pass_fn(factor_terms, n: int, FR: int, FC: int):
    # BR must be lane-aligned (128) because the row tables' blocks use it as
    # their last dim; C stays a multiple of 128 for the state blocks
    C = min(2048, 1 << n)
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
        )(re.reshape(R, C), im.reshape(R, C), row_t, col_t)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


# ---------------------------------------------------------------------------
# Lane-block dense gates (targets within the last _COL qubits)
# ---------------------------------------------------------------------------


def lane_gate_prepare(u: np.ndarray, n: int):
    """Host->device once: (fn, Mr_dev, Mi_dev) for repeated use."""
    mr = np.ascontiguousarray(u.real.astype(np.float32).T)  # (in, out)
    mi = np.ascontiguousarray(u.imag.astype(np.float32).T)
    return (_lane_gate_fn(n), jnp.asarray(mr), jnp.asarray(mi))


def lane_gate(planes: Planes, u: np.ndarray, n: int) -> Planes:
    """Apply a dense gate pre-expanded over the whole lane block
    (u: (2^_COL, 2^_COL) complex) as MXU matmuls, in place. One compile
    per n — the matrix is an argument."""
    fn, mr, mi = lane_gate_prepare(u, n)
    return fn(planes, mr, mi)


@functools.lru_cache(maxsize=None)
def _lane_gate_fn(n: int):
    lanes = 1 << min(n, _COL)
    R = (1 << n) // lanes
    BR = min(R, 512)

    def kernel(re_ref, im_ref, mr_ref, mi_ref, ro_ref, io_ref):
        xr = re_ref[...]
        xi = im_ref[...]
        mrc = mr_ref[...]
        mic = mi_ref[...]
        hi = jax.lax.Precision.HIGHEST
        rr = jnp.dot(xr, mrc, precision=hi, preferred_element_type=jnp.float32)
        ii = jnp.dot(xi, mic, precision=hi, preferred_element_type=jnp.float32)
        ri = jnp.dot(xr, mic, precision=hi, preferred_element_type=jnp.float32)
        ir = jnp.dot(xi, mrc, precision=hi, preferred_element_type=jnp.float32)
        ro_ref[...] = rr - ii
        io_ref[...] = ri + ir

    spec = pl.BlockSpec((BR, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((lanes, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, lanes), jnp.float32)

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
        )(re.reshape(R, lanes), im.reshape(R, lanes), mr, mi)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


# ---------------------------------------------------------------------------
# Cross-shard butterfly: dense gate on VIRTUAL-shard index bits, in place
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _shard_butterfly_fn(k: int, m: int):
    """Dense (2^k, 2^k) gate across 2^k whole shards of 2^m amplitudes:
    one streaming pass with EVERY shard buffer aliased in place — the
    jit-sum fallback peaks at state + one shard, which is what exhausted
    HBM at n=30 (state = half of HBM)."""
    C = min(2048, 1 << m)
    R = (1 << m) // C
    BR = min(R, 128)
    S = 1 << k

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((2, S, S), lambda i: (0, 0, 0),
                           memory_space=pltpu.SMEM)

    def kernel(*refs):
        ins, cf_ref, outs = refs[: 2 * S], refs[2 * S], refs[2 * S + 1:]
        xs = [(ins[2 * j][...], ins[2 * j + 1][...]) for j in range(S)]
        ys = _complex_butterfly(cf_ref, k, xs)
        for i in range(S):
            outs[2 * i][...] = ys[i][0]
            outs[2 * i + 1][...] = ys[i][1]

    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(pairs, coef):
        args = []
        for re, im in pairs:
            args.extend([re.reshape(R, C), im.reshape(R, C)])
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
        return tuple(
            (outs[2 * i].reshape(-1), outs[2 * i + 1].reshape(-1))
            for i in range(S)
        )

    return jax.jit(run, donate_argnums=0)


def shard_butterfly_prepare(u: np.ndarray, m: int):
    """(fn, coef) applying dense ``u`` across 2^k shards of 2^m amps each."""
    S = u.shape[0]
    k = S.bit_length() - 1
    cu = np.asarray(u, dtype=np.complex128)
    coef = np.stack([cu.real.astype(np.float32), cu.imag.astype(np.float32)])
    return _shard_butterfly_fn(k, m), jnp.asarray(coef)


# ---------------------------------------------------------------------------
# Fused stage kernel: 1q row gate + controlled-phase ladder in ONE pass
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stage_fn(q: int, n: int):
    """Cached kernel for a "QFT stage": a 1-qubit gate on row qubit q fused
    with any product of 2-qubit diagonal factors (q, j), j > q. The ladder
    phase applies only on the qubit-q |1> branch and factorizes over the
    remaining index bits into a B-axis table x a C-axis (lane) table, so the
    whole stage is ONE read+write of the state:

        y0 = u00 x0 + u01 x1
        y1 = (u10 x0 + u11 x1) * Brow[b] * Ccol[c]

    Narrow tails dispatch to the flat variant (same signature); wide tails
    use the classic (A, 2, B, C) view below.
    """
    tail = 1 << (n - q - 1)
    if tail <= _FLAT_TAIL_MAX:
        return _stage_flat_fn(q, n)
    # default scoped VMEM is 16 MB; we raise it via CompilerParams (v5e has
    # 128 MB physical) so blocks can be 2 MB -> better DMA pipelining
    C = min(2048, tail)
    B = tail // C
    A = 1 << q
    BB = min(B, 128)
    Bpad = max(B, 128)

    spec = pl.BlockSpec((1, 2, BB, C), lambda a, j: (a, 0, j, 0),
                        memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((2, 2, 2), lambda a, j: (0, 0, 0),
                           memory_space=pltpu.SMEM)
    # the B-axis table is block-sliced in lockstep with the state's B blocks
    # (BlockSpec slicing; dynamic in-kernel lane slices don't lower)
    if B >= 128:
        bt_spec = pl.BlockSpec((2, 128), lambda a, j: (0, j),
                               memory_space=pltpu.VMEM)
    else:
        bt_spec = pl.BlockSpec((2, 128), lambda a, j: (0, 0),
                               memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((2, C), lambda a, j: (0, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, cf_ref, bt_ref, ct_ref, ro_ref, io_ref):
        x0r = re_ref[0, 0, :, :]
        x1r = re_ref[0, 1, :, :]
        x0i = im_ref[0, 0, :, :]
        x1i = im_ref[0, 1, :, :]
        u = [[(cf_ref[0, i, j], cf_ref[1, i, j]) for j in range(2)] for i in range(2)]
        (ar, ai), (br_, bi_) = u[0]
        (cr_, ci_), (dr_, di_) = u[1]
        y0r = ar * x0r - ai * x0i + br_ * x1r - bi_ * x1i
        y0i = ar * x0i + ai * x0r + br_ * x1i + bi_ * x1r
        y1r = cr_ * x0r - ci_ * x0i + dr_ * x1r - di_ * x1i
        y1i = cr_ * x0i + ci_ * x0r + dr_ * x1i + di_ * x1r
        # phase = Brow[b] * Ccol[c] on the |1>_q branch
        brow_r = bt_ref[0, :BB].reshape(BB, 1)
        brow_i = bt_ref[1, :BB].reshape(BB, 1)
        ccol_r = ct_ref[0, :].reshape(1, C)
        ccol_i = ct_ref[1, :].reshape(1, C)
        pr = brow_r * ccol_r - brow_i * ccol_i
        pi = brow_r * ccol_i + brow_i * ccol_r
        ro_ref[0, 0, :, :] = y0r
        io_ref[0, 0, :, :] = y0i
        ro_ref[0, 1, :, :] = y1r * pr - y1i * pi
        io_ref[0, 1, :, :] = y1r * pi + y1i * pr

    dims = (A, 2, B, C)
    shape = jax.ShapeDtypeStruct(dims, jnp.float32)

    def run(planes, coef, bt, ct):
        re, im = planes
        kwargs = {}
        if not _interpret():
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20)
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, cf_spec, bt_spec, ct_spec],
            out_specs=(spec, spec),
            grid=(A, B // BB),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **kwargs,
        )(re.reshape(dims), im.reshape(dims), coef, bt, ct)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def _stage_flat_fn(q: int, n: int):
    """Narrow-tail stage: flat (2^q, 2*tail) view; the whole ladder phase is
    one in-row table on the |1> half. bt is accepted (and ignored) so the
    signature matches the classic kernel's (fn, coef, bt, ct) plumbing."""
    tail = 1 << (n - q - 1)
    A = 1 << q
    W = 2 * tail
    BR = _flat_rows(A, W)

    spec = pl.BlockSpec((BR, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((2, 2, 2), lambda i: (0, 0, 0),
                           memory_space=pltpu.SMEM)
    bt_spec = pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((2, tail), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, cf_ref, bt_ref, ct_ref, ro_ref, io_ref):
        xs = [(re_ref[:, :tail], im_ref[:, :tail]),
              (re_ref[:, tail:], im_ref[:, tail:])]
        (y0r, y0i), (y1r, y1i) = _complex_butterfly(cf_ref, 1, xs)
        pr = ct_ref[0, :].reshape(1, tail)
        pi = ct_ref[1, :].reshape(1, tail)
        ro_ref[:, :tail] = y0r
        io_ref[:, :tail] = y0i
        ro_ref[:, tail:] = y1r * pr - y1i * pi
        io_ref[:, tail:] = y1r * pi + y1i * pr

    shape = jax.ShapeDtypeStruct((A, W), jnp.float32)

    def run(planes, coef, bt, ct):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, cf_spec, bt_spec, ct_spec],
            out_specs=(spec, spec),
            grid=(A // BR,),
            input_output_aliases={0: 0, 1: 1},
            interpret=_interpret(),
            **_vmem_kwargs(),
        )(re.reshape(A, W), im.reshape(A, W), coef, bt, ct)
        return (ro.reshape(-1), io.reshape(-1))

    return jax.jit(run, donate_argnums=0)


def stage_prepare(u: np.ndarray, q: int, factors, n: int):
    """Host->device for a fused stage: ``u`` (2, 2) complex on qubit q, plus
    2-qubit diagonal ``factors`` [(d (4,), (q, j))] with j > q. Returns
    (fn, coef, Btable, Ctable)."""
    tail = 1 << (n - q - 1)
    C = tail if tail <= _FLAT_TAIL_MAX else min(2048, tail)
    B = tail // C
    Bpad = max(B, 128)
    log_c = C.bit_length() - 1

    brow = np.ones(B, dtype=np.complex128)
    ccol = np.ones(C, dtype=np.complex128)
    bidx = np.arange(B, dtype=np.int64)
    cidx = np.arange(C, dtype=np.int64)
    for d, (qq, j) in factors:
        assert qq == q and j > q
        d = np.asarray(d, dtype=np.complex128)
        # phase applied on the |1>_q branch when bit j is 1: d[3] (vs d[2]=1)
        on, off = d[3], d[2]
        pos = n - 1 - j  # bit position in the tail index (b*C + c)
        if pos >= log_c:
            bit = (bidx >> (pos - log_c)) & 1
            brow *= np.where(bit == 1, on, off)
        else:
            bit = (cidx >> pos) & 1
            ccol *= np.where(bit == 1, on, off)

    bt = np.zeros((2, Bpad), dtype=np.float32)
    bt[0, :B] = brow.real
    bt[1, :B] = brow.imag
    ct = np.stack([ccol.real.astype(np.float32), ccol.imag.astype(np.float32)])
    cu = np.asarray(u, dtype=np.complex128)
    coef = np.stack([cu.real.astype(np.float32), cu.imag.astype(np.float32)])
    return (_stage_fn(q, n), jnp.asarray(coef), jnp.asarray(bt), jnp.asarray(ct))
