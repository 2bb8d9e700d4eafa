"""Gate application primitives.

This is the TPU-native replacement for the reference's dense-matrix engine:
the reference materializes a 2^n x 2^n matrix per gate and does a dense GEMV
(``src/Qubism/QGate.hs:79-80,148-154`` — O(4^n) per gate). Here a k-qubit
gate touches only its 2^k-dimensional target subspace — O(2^n * 4^k) work
and one read+write of the amplitude array per fused pass.

**Split-plane amplitude layout.** A state is a pair ``(re, im)`` of float32
arrays of shape (2^n,). Complex dtypes never exist on device (TPU runtimes
may not implement complex transfers, and complex buffers at 2^30 elements
break TPU compilers), and the planes are SEPARATE buffers: a single
interleaved (2, 2^n) array is an 8 GiB buffer at n=30, which this TPU
compiler rejects outright — two 4 GiB plane buffers compile fine and are
also the layout Pallas kernels want.

**TPU layout discipline.** TPU memory is tiled over the last two dims with
128-wide lanes, so any reshape with a small trailing dim materializes with
catastrophic padding (observed: 32x — 256 GiB for an 8 GiB state). Every
view keeps a trailing axis of >= 2^7 = 128 (the "lane block" = the last 7
qubits):

* gates on *row* qubits (q < n-7) use the classic strided index-pair
  butterfly: slice the target-bit combinations on middle axes and recombine
  with gate coefficients — pure elementwise VPU work, bandwidth-bound, no
  transposes (a generic einsum here lowers to a pathological
  tiny-contraction dot_general: measured 42 s/pass at n=26);
* gates touching *lane* qubits (q >= n-7) are expanded over the whole lane
  block and applied as 128-wide matmuls on the MXU (4 real matmuls per
  pass), ~64 FLOP/byte — riding the v5e's compute/bandwidth balance.

Qubit-index convention (matches the reference, src/Qubism/StateVec.hs:65-67):
**big-endian** — qubit 0 is the most significant bit of the amplitude index.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
import string

import jax
import jax.numpy as jnp
import numpy as np

# Letters for programmatic einsum construction.
_LETTERS = string.ascii_lowercase + string.ascii_uppercase

#: log2 of the lane block: the last _COL qubits live inside the 128-wide
#: trailing axis of every device view.
_COL = 7

#: A state: (re, im) pair of float32 (2^n,) device arrays.
Planes = tuple


# ---------------------------------------------------------------------------
# Host boundary
# ---------------------------------------------------------------------------


def planes_from_complex(a, dtype=np.float32):
    """Host-side: complex array-like -> (re, im) numpy pair."""
    a = np.asarray(a)
    return a.real.astype(dtype), a.imag.astype(dtype)


def planar_from_complex(a, dtype=np.float32) -> np.ndarray:
    """Host-side: complex array-like -> stacked (2, ...) float array (for
    small operands like gate tables)."""
    a = np.asarray(a)
    return np.stack([a.real.astype(dtype), a.imag.astype(dtype)])


def complex_from_planes(planes) -> np.ndarray:
    """Host-side: (re, im) pair (or stacked (2,...) array) -> numpy complex128.
    A plane PAIR (state) is flattened to 1-D regardless of its device layout
    (flat or canonical 2-D); stacked arrays keep their shape."""
    if isinstance(planes, (tuple, list)):
        re, im = (np.asarray(jax.device_get(p)).reshape(-1) for p in planes)
    else:
        p = np.asarray(jax.device_get(planes))
        re, im = p[0], p[1]
    return re.astype(np.float64) + 1j * im.astype(np.float64)


# backwards-compatible name
complex_from_planar = complex_from_planes


def zero_state(n: int, dtype=jnp.float32) -> Planes:
    """|0...0> as an (re, im) plane pair."""
    re = jnp.zeros(1 << n, dtype=dtype).at[0].set(1)
    im = jnp.zeros(1 << n, dtype=dtype)
    return (re, im)


# ---------------------------------------------------------------------------
# View planning
# ---------------------------------------------------------------------------


def _expand_np(u: np.ndarray, src: tuple[int, ...], dst: tuple[int, ...]) -> np.ndarray:
    """Expand a gate on qubit set ``src`` (matrix bit order) to the superset
    ``dst`` by tensoring identities, host-side."""
    m, k = len(dst), len(src)
    if m == k:
        return u
    extra = [q for q in dst if q not in src]
    cur = list(src) + extra
    perm = [cur.index(q) for q in dst]
    full = np.kron(u, np.eye(1 << (m - k), dtype=u.dtype))
    return (
        full.reshape((2,) * (2 * m))
        .transpose(perm + [m + p for p in perm])
        .reshape(1 << m, 1 << m)
    )


def plan_view(n: int, targets: tuple[int, ...]):
    """Plan the device view for a gate on sorted ``targets``.

    Returns (dims, axis_positions, lane_in_matrix):
      dims — per-plane state reshape; the trailing dim is always the full
        2^min(n,_COL) lane block;
      axis_positions — view axes carrying matrix bits, in matrix bit order
        (row targets first, then — iff lane_in_matrix — the lane axis);
      lane_in_matrix — True when the gate matrix must be pre-expanded over
        the whole lane block (``expand_for_view``).
    """
    b = max(n - _COL, 0)
    row = [t for t in targets if t < b]
    lane_in_matrix = any(t >= b for t in targets)
    dims: list[int] = []
    tpos: list[int] = []
    prev = 0
    for t in row:
        if t - prev > 0:
            dims.append(1 << (t - prev))
        tpos.append(len(dims))
        dims.append(2)
        prev = t + 1
    if lane_in_matrix:
        # split the lane block off as an explicit trailing 128 axis
        if b - prev > 0:
            dims.append(1 << (b - prev))
        tpos.append(len(dims))
        dims.append(1 << (n - b))
    else:
        # row-only: keep the rank minimal — one merged trailing segment
        # (always >= 2^_COL = 128, so TPU lane tiling never pads)
        dims.append(1 << (n - prev))
    return tuple(dims), tuple(tpos), lane_in_matrix


def expand_for_view(u: np.ndarray, n: int, targets: tuple[int, ...]) -> np.ndarray:
    """Expand a (sorted-target) gate matrix to the view's matrix bits:
    row targets + (if it touches the lane block) all lane qubits."""
    b = max(n - _COL, 0)
    if not any(t >= b for t in targets):
        return u
    dst = tuple(t for t in targets if t < b) + tuple(range(b, n))
    return _expand_np(u, targets, dst)


def _sort_targets(u: np.ndarray, targets: tuple[int, ...]) -> tuple[np.ndarray, tuple[int, ...]]:
    """Host-side: reorder a (2^k, 2^k) gate matrix from its given target
    order to sorted order. Row/column index bit j (MSB-first) corresponds to
    targets[j]."""
    k = len(targets)
    order = tuple(sorted(range(k), key=lambda j: targets[j]))
    if order != tuple(range(k)):
        u = (
            u.reshape((2,) * (2 * k))
            .transpose(tuple(order) + tuple(k + j for j in order))
            .reshape(1 << k, 1 << k)
        )
    return u, tuple(sorted(targets))


# ---------------------------------------------------------------------------
# Dense gates
# ---------------------------------------------------------------------------


def _lane_spec(dims, tpos) -> tuple[str, tuple[int, ...]]:
    """Einsum spec contracting the view axes in ``tpos`` with one real
    matrix factor (per-plane lane matmul path)."""
    rank = len(dims)
    st_sub = list(_LETTERS[:rank])
    out_letters = _LETTERS[rank : rank + len(tpos)]
    u_sub = list(out_letters)
    out_sub = list(st_sub)
    for j, p in enumerate(tpos):
        u_sub.append(st_sub[p])
        out_sub[p] = out_letters[j]
    spec = f"{''.join(u_sub)},{''.join(st_sub)}->{''.join(out_sub)}"
    axes = tuple(dims[p] for p in tpos)
    return spec, axes


def apply_gate_lane_traced(planes: Planes, u_planes, dims, tpos) -> Planes:
    """Inside-jit: lane-block path — the (pre-expanded) gate applies as four
    real 128-wide matmuls on the MXU. ``u_planes`` = (Ur, Im) each (D, D)."""
    spec, axes = _lane_spec(dims, tpos)
    xr, xi = (p.reshape(dims) for p in planes)
    ur = jnp.asarray(u_planes[0]).reshape(axes + axes)
    ui = jnp.asarray(u_planes[1]).reshape(axes + axes)
    hi = jax.lax.Precision.HIGHEST
    rr = jnp.einsum(spec, ur, xr, precision=hi)
    ii = jnp.einsum(spec, ui, xi, precision=hi)
    ri = jnp.einsum(spec, ui, xr, precision=hi)
    ir = jnp.einsum(spec, ur, xi, precision=hi)
    return ((rr - ii).reshape(-1), (ri + ir).reshape(-1))


def apply_gate_row_traced(planes: Planes, table, dims, tpos) -> Planes:
    """Inside-jit: row-qubit path via **flip-and-accumulate**.

    out = sum_m C_m ⊙ rev_m(x): for each XOR mask m over the k target bits,
    reverse the state view along the masked target axes (``lax.rev`` — a
    static relabeling XLA fuses into the elementwise loop) and accumulate
    with the coefficient table C_m[b] = U[b, b^m] broadcast over the target
    axes. Pure fused elementwise work at XLA streaming bandwidth — both the
    einsum (tiny-contraction dot_general, 42 s/pass) and a slice+stack
    butterfly (~13 memory sweeps) lower pathologically on TPU.

    ``table(m) -> (cr, ci) | None``: per-mask coefficient vectors of length
    2^k ((b,)-indexed), already broadcast-shaped by the caller; None skips an
    all-zero mask (sparse gates like CNOT blocks cost only their terms).
    """
    k = len(tpos)
    xr = planes[0].reshape(dims)
    xi = planes[1].reshape(dims)
    out_r, out_i = None, None
    for m in range(1 << k):
        c = table(m)
        if c is None:
            continue
        cr, ci = c
        rev_axes = [tpos[b] for b in range(k) if (m >> (k - 1 - b)) & 1]
        vr = jax.lax.rev(xr, rev_axes) if rev_axes else xr
        vi = jax.lax.rev(xi, rev_axes) if rev_axes else xi
        tr = cr * vr - ci * vi
        ti = cr * vi + ci * vr
        out_r = tr if out_r is None else out_r + tr
        out_i = ti if out_i is None else out_i + ti
    return (out_r.reshape(-1), out_i.reshape(-1))


def _bshape(dims, tpos):
    bshape = [1] * len(dims)
    for p in tpos:
        bshape[p] = 2
    return bshape


def _row_table_const(u: np.ndarray, dims, tpos):
    """Coefficient-table closure for a host-constant matrix (zero masks and
    zero entries fold away)."""
    k = len(tpos)
    bshape = _bshape(dims, tpos)

    def table(m):
        b = np.arange(1 << k)
        col = u[b, b ^ m]
        if not col.any():
            return None
        return (col.real.astype(np.float32).reshape(bshape),
                col.imag.astype(np.float32).reshape(bshape))

    return table


def _row_table_dyn(ur, ui, dims, tpos):
    """Coefficient-table closure for traced (device) matrix planes."""
    k = len(tpos)
    bshape = _bshape(dims, tpos)
    b = jnp.arange(1 << k)

    def table(m):
        return (ur[b, b ^ m].reshape(bshape), ui[b, b ^ m].reshape(bshape))

    return table


def apply_gate_traced(planes: Planes, u: np.ndarray, targets: tuple[int, ...], n: int) -> Planes:
    """Inside-jit application of a host-constant complex gate matrix on
    sorted ``targets`` (used by the fused executor; constants fold)."""
    dims, tpos, lane = plan_view(n, targets)
    if lane:
        u2 = expand_for_view(u, n, targets)
        return apply_gate_lane_traced(
            planes, (u2.real.astype(np.float32), u2.imag.astype(np.float32)), dims, tpos
        )

    return apply_gate_row_traced(planes, _row_table_const(u, dims, tpos), dims, tpos)


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_gate_lane_impl(planes, u_planes, targets: tuple[int, ...], n: int):
    dims, tpos, _ = plan_view(n, targets)
    return apply_gate_lane_traced(planes, u_planes, dims, tpos)


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_gate_row_impl(planes, u_planes, targets: tuple[int, ...], n: int):
    dims, tpos, _ = plan_view(n, targets)
    ur, ui = u_planes
    return apply_gate_row_traced(planes, _row_table_dyn(ur, ui, dims, tpos), dims, tpos)


def _apply_gate_impl(planes, u_planes, targets: tuple[int, ...], n: int):
    """Dispatch on the view plan. ``u_planes`` = (Ur, Ui) pair from
    ``prepare_gate`` (lane path: pre-expanded over the lane block)."""
    _, _, lane = plan_view(n, targets)
    if lane:
        return _apply_gate_lane_impl(planes, u_planes, targets, n)
    return _apply_gate_row_impl(planes, u_planes, targets, n)


def prepare_gate(u: np.ndarray, targets: tuple[int, ...], n: int):
    """Host-side: the (Ur, Ui) device operands for ``_apply_gate_impl``."""
    u = expand_for_view(u, n, targets)
    return (u.real.astype(np.float32), u.imag.astype(np.float32))


#: device-resident gate operands, keyed by table content (LRU): repeated
#: applications of the same gate shape must not pay a host->device upload
#: per op — through a remote-device tunnel the transfer costs more than the
#: kernel (interpreter/REPL/mesh paths; the compiled path has its own
#: per-op plan cache in ops/fusion.py)
_OPERAND_LRU_MAX = 512
_operand_cache: "OrderedDict[tuple, tuple]" = OrderedDict()


def _cached_operands(kind: str, table_bytes: bytes, shape, targets, n, build):
    key = (kind, table_bytes, shape, targets, n)
    hit = _operand_cache.get(key)
    if hit is not None:
        _operand_cache.move_to_end(key)
        return hit
    val = build()
    _operand_cache[key] = val
    if len(_operand_cache) > _OPERAND_LRU_MAX:
        _operand_cache.popitem(last=False)
    return val


def _engine_pallas(n: int) -> bool:
    from . import fusion  # lazy: fusion imports this module

    return fusion.engine_uses_pallas(n)


def apply_gate(planes: Planes, u, targets: tuple[int, ...], n: int) -> Planes:
    """Apply a k-qubit unitary to ``targets`` of an n-qubit state.

    ``u`` is a host-side complex (2^k, 2^k) matrix. ``targets`` are distinct
    qubit indices; targets[0] is the most significant bit of the gate's
    local index (so ``cnot`` with targets (c, t) uses the standard |c t>
    ordered matrix).

    On the Pallas engine (TPU, n >= 14) this routes through the fused
    kernels in NON-donating mode — the interpreter's per-statement path
    then runs at engine speed (VERDICT r2 item 7) while shared ProgState
    buffers stay valid (REPL atomic-line contract). The state's device
    layout becomes canonical (R, 2048) after the first such gate and stays
    there (``to_canon`` is an identity once canonical)."""
    tgts = tuple(int(t) for t in targets)
    un = np.asarray(u, dtype=np.complex128)
    un, sorted_targets = _sort_targets(un, tgts)
    if _engine_pallas(n):
        from . import kernels

        b = max(n - _COL, 0)
        if all(t >= b for t in sorted_targets):
            fn, mr, mi = _cached_operands(
                "klane", un.tobytes(), un.shape, sorted_targets, n,
                lambda: kernels.lane_gate_prepare(
                    expand_for_view(un, n, sorted_targets), n, donate=False))
            return fn(kernels.to_canon(planes, n), mr, mi)
        if 1 <= len(sorted_targets) <= 4:
            fn, coef = _cached_operands(
                "krow", un.tobytes(), un.shape, sorted_targets, n,
                lambda: kernels.row_gate_prepare(un, sorted_targets, n,
                                                 donate=False))
            return fn(kernels.to_canon(planes, n), coef)
    operands = _cached_operands(
        "gate", un.tobytes(), un.shape, sorted_targets, n,
        lambda: tuple(jnp.asarray(x) for x in prepare_gate(un, sorted_targets, n)))
    return _apply_gate_impl(planes, operands, sorted_targets, n)


# ---------------------------------------------------------------------------
# Diagonal gates
# ---------------------------------------------------------------------------


def expand_diag_traced(d_r, d_i, n: int, targets: tuple[int, ...]):
    """Inside-jit: expand a flat (2^k,) diagonal's lane-block part so the
    broadcast never creates a small trailing dim. ``targets`` sorted, static.
    Returns (table_r, table_i, row_targets, has_lane); tables broadcast over
    plan_view(n, row_targets) dims. Constant-folds when d is a constant."""
    assert tuple(sorted(targets)) == tuple(targets), "targets must be sorted"
    b = max(n - _COL, 0)
    row = tuple(t for t in targets if t < b)
    lane = tuple(t for t in targets if t >= b)
    k = len(targets)
    if not lane:
        return d_r.reshape((2,) * k), d_i.reshape((2,) * k), row, False
    dst = row + tuple(range(b, n))
    shape = [2 if q in targets else 1 for q in dst]
    ones = jnp.ones((2,) * len(dst), dtype=jnp.float32)
    out_shape = (2,) * len(row) + (1 << (n - b),)
    tr = (ones * d_r.reshape((2,) * k).reshape(shape)).reshape(out_shape)
    ti = (ones * d_i.reshape((2,) * k).reshape(shape)).reshape(out_shape)
    return tr, ti, row, True


def _diag_view(n: int, row: tuple[int, ...], has_lane: bool):
    """View dims for a diagonal factor: explicit axes for the row targets,
    plus an explicit trailing lane axis when the factor has lane-block bits
    (plan_view merges the trailing segment for row-only gates)."""
    if not has_lane:
        return plan_view(n, row)[:2]
    b = max(n - _COL, 0)
    dims: list[int] = []
    tpos: list[int] = []
    prev = 0
    for t in row:
        if t - prev > 0:
            dims.append(1 << (t - prev))
        tpos.append(len(dims))
        dims.append(2)
        prev = t + 1
    if b - prev > 0:
        dims.append(1 << (b - prev))
    dims.append(1 << (n - b))
    return tuple(dims), tuple(tpos)


def diag_factor_traced(state_r, state_i, table_r, table_i, row: tuple[int, ...],
                       has_lane: bool, n: int):
    """Inside-jit: multiply planes (flat or view-shaped) by one expanded
    diagonal factor."""
    dims, tpos = _diag_view(n, row, has_lane)
    bshape = [1] * len(dims)
    for p in tpos:
        bshape[p] = 2
    if has_lane:
        bshape[-1] = dims[-1]
    tr = table_r.reshape(bshape)
    ti = table_i.reshape(bshape)
    xr = state_r.reshape(dims)
    xi = state_i.reshape(dims)
    out_r = (xr * tr - xi * ti).reshape(-1)
    out_i = (xr * ti + xi * tr).reshape(-1)
    return out_r, out_i


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_diag_impl(planes, table, targets: tuple[int, ...], n: int) -> Planes:
    """Apply a diagonal on sorted ``targets``; ``table`` = (d_r, d_i) flat pair."""
    tr, ti, row, has_lane = expand_diag_traced(table[0], table[1], n, targets)
    return diag_factor_traced(planes[0], planes[1], tr, ti, row, has_lane, n)


def apply_diag(planes: Planes, d, targets: tuple[int, ...], n: int) -> Planes:
    """Apply a diagonal k-qubit gate given as its 2^k diagonal ``d``.
    Routes through the fused diag kernel (non-donating) on the Pallas
    engine — see :func:`apply_gate`."""
    k = len(targets)
    tgts = tuple(int(t) for t in targets)
    dn = np.asarray(d, dtype=np.complex128)
    order = tuple(sorted(range(k), key=lambda j: tgts[j]))
    if order != tuple(range(k)):
        dn = dn.reshape((2,) * k).transpose(order).reshape(-1)
    sorted_tgts = tuple(sorted(tgts))
    if _engine_pallas(n):
        from . import kernels

        prepared = _cached_operands(
            "kdiag", dn.tobytes(), dn.shape, sorted_tgts, n,
            lambda: tuple(kernels.diag_layer_prepare(
                ((dn, sorted_tgts),), n, donate=False)))
        out = kernels.to_canon(planes, n)
        for fn, rt, ct in prepared:
            out = fn(out, rt, ct)
        return out
    table = _cached_operands(
        "diag", dn.tobytes(), dn.shape, sorted_tgts, n,
        lambda: (jnp.asarray(dn.real.astype(np.float32)),
                 jnp.asarray(dn.imag.astype(np.float32))))
    return _apply_diag_impl(planes, table, sorted_tgts, n)


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


@jax.jit
def tensor(a: Planes, b: Planes) -> Planes:
    """Kronecker/tensor product of two states (a ⊗ b).

    Mirrors reference ``tensor`` (src/Qubism/StateVec.hs:98-100): the first
    operand's qubits become the most significant index bits.
    """
    ar, ai = a
    br, bi = b
    re = jnp.outer(ar, br) - jnp.outer(ai, bi)
    im = jnp.outer(ar, bi) + jnp.outer(ai, br)
    return (re.reshape(-1), im.reshape(-1))


@jax.jit
def normalize(planes: Planes) -> Planes:
    """L2-normalize (|z|^2 = re^2 + im^2 summed over planes)."""
    re, im = planes
    nrm = jnp.sqrt(jnp.sum(re * re) + jnp.sum(im * im))
    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
    return (re * scale, im * scale)


@jax.jit
def inner_planes(a: Planes, b: Planes) -> jnp.ndarray:
    """<a|b> (conjugate-linear in a), as a (2,) [re, im] array."""
    ar, ai = a
    br, bi = b
    re = jnp.vdot(ar, br) + jnp.vdot(ai, bi)
    im = jnp.vdot(ar, bi) - jnp.vdot(ai, br)
    return jnp.stack([re, im])
