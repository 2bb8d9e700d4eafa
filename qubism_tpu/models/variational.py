"""Differentiable variational circuits: VQE / QAOA via ``jax.grad``.

The reference has no autodiff story at all (pure Haskell, impure RNG,
dense O(4^n) gates — src/Qubism/QGate.hs:79-80). On this engine the whole
pipeline — parameterized gate matrices built *inside the trace* from a
``theta`` vector, state evolution through the split-plane appliers, and
the Pauli-sum energy reduction — is ONE jit-compiled, differentiable JAX
program. ``jax.value_and_grad`` flows through every gate, and the full
optax optimization loop compiles into a single ``lax.scan`` device
program: a complete VQE run is one dispatch.

Design notes (TPU-first):

* Parameters stay real float32; gate operands are (re, im) plane pairs —
  complex dtypes never appear (TPU transfer/compile constraints, see
  ops/apply.py module docstring).
* Parameterized gates route through the SAME traced appliers the fused
  engine uses (`apply_gate_row_traced` with a traced coefficient table,
  `apply_gate_lane_traced`, `diag_factor_traced`), so the lane-block
  layout discipline holds under autodiff too.
* Fixed (non-parameterized) prims keep host-constant numpy matrices, so
  XLA constant-folds their coefficient tables exactly as in the compiled
  path.
* Parameter *sharing* is index-based: a gate's ``pidx`` names positions
  in ``theta``, so QAOA's per-layer (gamma, beta) pairs drive every edge
  /qubit in the layer from two scalars — gradients accumulate naturally.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gates import Prim
from ..ops.apply import (_sort_targets, apply_gate_lane_traced,
                         apply_gate_row_traced, diag_factor_traced,
                         expand_diag_traced, plan_view, zero_state, _COL)
from ..ops.measure import _check_pauli


# ---------------------------------------------------------------------------
# Parameterized gate builders (traced: theta slices -> (re, im) operands)
# ---------------------------------------------------------------------------


def _z(x):
    return jnp.zeros_like(x)


def _o(x):
    return jnp.ones_like(x)


def _rx(t):
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    ur = jnp.stack([jnp.stack([c, _z(c)]), jnp.stack([_z(c), c])])
    ui = jnp.stack([jnp.stack([_z(s), -s]), jnp.stack([-s, _z(s)])])
    return ("dense", ur, ui)


def _ry(t):
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    ur = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return ("dense", ur, _z(ur))


def _rz(t):
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    return ("diag", jnp.stack([c, c]), jnp.stack([-s, s]))


def _phase(lam):
    return ("diag", jnp.stack([_o(lam), jnp.cos(lam)]),
            jnp.stack([_z(lam), jnp.sin(lam)]))


def _u3(t, p, l):
    ct, st = jnp.cos(t / 2), jnp.sin(t / 2)
    ur = jnp.stack([jnp.stack([ct, -jnp.cos(l) * st]),
                    jnp.stack([jnp.cos(p) * st, jnp.cos(p + l) * ct])])
    ui = jnp.stack([jnp.stack([_z(ct), -jnp.sin(l) * st]),
                    jnp.stack([jnp.sin(p) * st, jnp.sin(p + l) * ct])])
    return ("dense", ur, ui)


def _cphase(lam):
    one = _o(lam)
    zero = _z(lam)
    return ("diag", jnp.stack([one, one, one, jnp.cos(lam)]),
            jnp.stack([zero, zero, zero, jnp.sin(lam)]))


def _crz(lam):
    c, s = jnp.cos(lam / 2), jnp.sin(lam / 2)
    one = _o(lam)
    zero = _z(lam)
    return ("diag", jnp.stack([one, one, c, c]),
            jnp.stack([zero, zero, -s, s]))


def _rzz(t):
    # exp(-i t/2 Z (x) Z): diag(e^{-it/2}, e^{it/2}, e^{it/2}, e^{-it/2})
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    return ("diag", jnp.stack([c, c, c, c]), jnp.stack([-s, s, s, -s]))


def _cry(t):
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    one = _o(t)
    zero = _z(t)
    ur = jnp.stack([jnp.stack([one, zero, zero, zero]),
                    jnp.stack([zero, one, zero, zero]),
                    jnp.stack([zero, zero, c, -s]),
                    jnp.stack([zero, zero, s, c])])
    return ("dense", ur, _z(ur))


def _crx(t):
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    one = _o(t)
    zero = _z(t)
    ur = jnp.stack([jnp.stack([one, zero, zero, zero]),
                    jnp.stack([zero, one, zero, zero]),
                    jnp.stack([zero, zero, c, zero]),
                    jnp.stack([zero, zero, zero, c])])
    ui = jnp.stack([jnp.stack([zero, zero, zero, zero]),
                    jnp.stack([zero, zero, zero, zero]),
                    jnp.stack([zero, zero, zero, -s]),
                    jnp.stack([zero, zero, -s, zero])])
    return ("dense", ur, ui)


def _rxx(t):
    # exp(-i t/2 X(x)X) = cos(t/2) I - i sin(t/2) XX
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    z = _z(t)
    ur = jnp.stack([jnp.stack([c, z, z, z]), jnp.stack([z, c, z, z]),
                    jnp.stack([z, z, c, z]), jnp.stack([z, z, z, c])])
    ui = jnp.stack([jnp.stack([z, z, z, -s]), jnp.stack([z, z, -s, z]),
                    jnp.stack([z, -s, z, z]), jnp.stack([-s, z, z, z])])
    return ("dense", ur, ui)


def _ryy(t):
    # exp(-i t/2 Y(x)Y) = cos(t/2) I - i sin(t/2) YY  (YY is real)
    c, s = jnp.cos(t / 2), jnp.sin(t / 2)
    z = _z(t)
    ur = jnp.stack([jnp.stack([c, z, z, z]), jnp.stack([z, c, z, z]),
                    jnp.stack([z, z, c, z]), jnp.stack([z, z, z, c])])
    ui = jnp.stack([jnp.stack([z, z, z, s]), jnp.stack([z, z, -s, z]),
                    jnp.stack([z, -s, z, z]), jnp.stack([s, z, z, z])])
    return ("dense", ur, ui)


#: name -> (builder, arity): builder takes ``arity`` traced scalars.
BUILDERS = {
    "rx": (_rx, 1),
    "ry": (_ry, 1),
    "rz": (_rz, 1),
    "phase": (_phase, 1),
    "u3": (_u3, 3),
    "cphase": (_cphase, 1),
    "crz": (_crz, 1),
    "crx": (_crx, 1),
    "cry": (_cry, 1),
    "rzz": (_rzz, 1),
    "rxx": (_rxx, 1),
    "ryy": (_ryy, 1),
}


@dataclass(frozen=True)
class PGate:
    """A parameterized gate: ``BUILDERS[name]`` applied to
    ``theta[pidx[0]], ...`` on ``targets`` (targets[0] = MSB of the gate's
    local index). ``scale`` premultiplies each parameter (so e.g. QAOA's
    ``rx(2*beta)`` shares beta's raw index)."""

    name: str
    targets: tuple[int, ...]
    pidx: tuple[int, ...]
    scale: float = 1.0

    def __post_init__(self):
        if self.name not in BUILDERS:
            raise ValueError(f"unknown parameterized gate {self.name!r}")
        if len(self.pidx) != BUILDERS[self.name][1]:
            raise ValueError(
                f"{self.name} takes {BUILDERS[self.name][1]} parameter(s), "
                f"got indices {self.pidx}")


@dataclass(frozen=True)
class Ansatz:
    """A circuit of fixed :class:`Prim` and parameterized :class:`PGate`
    ops on ``n`` qubits, driven by a flat ``theta`` of ``num_params``."""

    n: int
    ops: tuple
    num_params: int

    def __post_init__(self):
        for op in self.ops:
            hi = max(op.targets)
            if hi >= self.n:
                raise ValueError(f"target {hi} out of range for n={self.n}")
            if isinstance(op, PGate) and max(op.pidx) >= self.num_params:
                raise ValueError(f"param index {max(op.pidx)} out of range "
                                 f"for num_params={self.num_params}")


# ---------------------------------------------------------------------------
# Traced application of parameterized operands
# ---------------------------------------------------------------------------


def _sort_planes(ur, ui, targets):
    """Reorder traced (2^k, 2^k) operand planes from the given target order
    to sorted target order (static permutation)."""
    k = len(targets)
    order = tuple(sorted(range(k), key=lambda j: targets[j]))
    if order != tuple(range(k)):
        perm = tuple(order) + tuple(k + j for j in order)
        ur = ur.reshape((2,) * (2 * k)).transpose(perm).reshape(1 << k, 1 << k)
        ui = ui.reshape((2,) * (2 * k)).transpose(perm).reshape(1 << k, 1 << k)
    return ur, ui, tuple(sorted(targets))


def _sort_diag(dr, di, targets):
    k = len(targets)
    order = tuple(sorted(range(k), key=lambda j: targets[j]))
    if order != tuple(range(k)):
        dr = dr.reshape((2,) * k).transpose(order).reshape(-1)
        di = di.reshape((2,) * k).transpose(order).reshape(-1)
    return dr, di, tuple(sorted(targets))


def _expand_planes(ur, ui, n, targets):
    """Traced mirror of ops.apply.expand_for_view: tensor identities so the
    operand covers its row targets plus the whole lane block."""
    b = max(n - _COL, 0)
    if not any(t >= b for t in targets):
        return ur, ui
    dst = tuple(t for t in targets if t < b) + tuple(range(b, n))
    m, k = len(dst), len(targets)
    if m != k:
        eye = jnp.eye(1 << (m - k), dtype=ur.dtype)
        extra = [q for q in dst if q not in targets]
        cur = list(targets) + extra
        perm = [cur.index(q) for q in dst]
        tperm = tuple(perm) + tuple(m + p for p in perm)
        ur = (jnp.kron(ur, eye).reshape((2,) * (2 * m))
              .transpose(tperm).reshape(1 << m, 1 << m))
        ui = (jnp.kron(ui, eye).reshape((2,) * (2 * m))
              .transpose(tperm).reshape(1 << m, 1 << m))
    return ur, ui


def _apply_dense_traced(planes, ur, ui, targets, n):
    dims, tpos, lane = plan_view(n, targets)
    if lane:
        ur, ui = _expand_planes(ur, ui, n, targets)
        return apply_gate_lane_traced(planes, (ur, ui), dims, tpos)
    k = len(targets)
    b = jnp.arange(1 << k)
    bshape = [1] * len(dims)
    for p in tpos:
        bshape[p] = 2

    def table(m):
        return (ur[b, b ^ m].reshape(bshape), ui[b, b ^ m].reshape(bshape))

    return apply_gate_row_traced(planes, table, dims, tpos)


def _apply_diag_traced(planes, dr, di, targets, n):
    tr, ti, row, has_lane = expand_diag_traced(dr, di, n, targets)
    return diag_factor_traced(planes[0], planes[1], tr, ti, row, has_lane, n)


def _apply_op(planes, op, theta, n):
    if isinstance(op, PGate):
        builder, _ = BUILDERS[op.name]
        args = [op.scale * theta[j] for j in op.pidx]
        kind, a, b = builder(*args)
        if kind == "diag":
            dr, di, tgts = _sort_diag(a, b, op.targets)
            return _apply_diag_traced(planes, dr, di, tgts, n)
        ur, ui, tgts = _sort_planes(a, b, op.targets)
        return _apply_dense_traced(planes, ur, ui, tgts, n)
    # fixed Prim: host-constant operands (XLA constant-folds the tables)
    if op.diag:
        dn = np.asarray(op.u, dtype=np.complex128)
        dr, di, tgts = _sort_diag(dn.real.astype(np.float32),
                                  dn.imag.astype(np.float32), op.targets)
        return _apply_diag_traced(planes, jnp.asarray(dr), jnp.asarray(di),
                                  tgts, n)
    un, tgts = _sort_targets(np.asarray(op.u, dtype=np.complex128), op.targets)
    return _apply_dense_traced(planes,
                               jnp.asarray(un.real.astype(np.float32)),
                               jnp.asarray(un.imag.astype(np.float32)),
                               tgts, n)


# ---------------------------------------------------------------------------
# Energy / gradient / optimization
# ---------------------------------------------------------------------------


def _amp_sharding(mesh):
    """NamedSharding partitioning the flat amplitude axis over ``mesh``'s
    first axis (top log2(D) qubits live on the device axis — the same
    amplitude-sharding layout as ``parallel.ShardedSim``), or None."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as _P
    return NamedSharding(mesh, _P(mesh.axis_names[0]))


def _cstr(planes, sharding):
    """Pin (re, im) planes to the amplitude sharding inside a trace.

    Semantically the identity — GSPMD inserts whatever collectives the
    surrounding ops need (measured on the QAOA pipeline: lax.rev on a
    device bit lowers to a collective-permute, energy reductions to one
    all-reduce; no all-gathers) — but it guarantees every intermediate
    state stays 2^n/D per device, which is the point of running on a
    mesh."""
    if sharding is None:
        return planes
    return (jax.lax.with_sharding_constraint(planes[0], sharding),
            jax.lax.with_sharding_constraint(planes[1], sharding))


def state_fn(ansatz: Ansatz, mesh=None):
    """``theta -> (re, im) planes``: the traced, differentiable state
    preparation. Jit-compatible; compose freely.

    ``mesh``: a ``jax.sharding.Mesh`` shards the state's amplitude axis
    over the mesh's first axis for the WHOLE pipeline (see
    :func:`_cstr`) — variational circuits then differentiate at sizes no
    single device can hold."""
    sh = _amp_sharding(mesh)

    def run(theta):
        planes = _cstr(zero_state(ansatz.n), sh)
        for op in ansatz.ops:
            planes = _cstr(_apply_op(planes, op, theta, ansatz.n), sh)
        return planes

    return run


def _terms_energy(planes, n, terms, paulis):
    """Traced, differentiable <psi|sum c_j P_j|psi>: terms group by flip
    mask and reduce via the blocked MXU sign-table path (bounded temps at
    any term count — the per-term reductions OOM past n~27), with sign
    tables generated on device (no big trace constants)."""
    from ..ops.measure import (_blocked_pair_reduce, _canon_width,
                               _exp_masks, _flip_canon, _lane_flip_matrix,
                               _sign_masks, _sign_tables_traced)

    C = _canon_width(planes, n)
    R = (1 << n) // C
    groups: dict[tuple[int, int, int], list[int]] = {}
    for j, p in enumerate(paulis):
        groups.setdefault(_exp_masks(p, n, C), []).append(j)
    ar = planes[0].reshape(R, C)
    ai = planes[1].reshape(R, C)
    e = jnp.float32(0.0)
    for (row_mask, grp_mask, lo_mask), idxs in groups.items():
        smasks = [_sign_masks([q for q, ch in enumerate(paulis[j])
                               if ch in "YZ"], n, C) for j in idxs]
        srow_g, scol_g = _sign_tables_traced(smasks, R, C)
        lo_p = (jnp.asarray(_lane_flip_matrix(min(128, C), lo_mask))
                if lo_mask else None)
        if row_mask or grp_mask or lo_mask:
            br = _flip_canon(ar, row_mask, grp_mask, lo_p)
            bi = _flip_canon(ai, row_mask, grp_mask, lo_p)
        else:
            br = bi = None                      # diagonal shortcut (b is a)
        tr, ti = _blocked_pair_reduce(ar, ai, br, bi, srow_g, scol_g)
        for pos, j in enumerate(idxs):
            k = sum(1 for c in paulis[j] if c == "Y") % 4
            val = (tr[pos], -ti[pos], -tr[pos], ti[pos])[k]
            e = e + jnp.float32(terms[j][0]) * val
    return e


def energy_fn(ansatz: Ansatz, terms, constant: float = 0.0, mesh=None):
    """``theta -> <psi(theta)| sum_j c_j P_j |psi(theta)> + constant`` as a
    pure traced function (differentiable; wrap in jit/grad at will).
    ``terms`` = [(coef, pauli_string), ...]. ``mesh`` shards the state
    (see :func:`state_fn`); gradients flow through the collectives."""
    paulis = tuple(_check_pauli(p, ansatz.n) for _, p in terms)
    run = state_fn(ansatz, mesh=mesh)

    def energy(theta):
        planes = run(theta)
        return _terms_energy(planes, ansatz.n, terms, paulis) + jnp.float32(
            constant)

    return energy


def value_and_grad_fn(ansatz: Ansatz, terms, constant: float = 0.0,
                      mesh=None):
    """Jitted ``theta -> (energy, dE/dtheta)`` — one compiled program
    (one SPMD program over ``mesh`` when given)."""
    return jax.jit(jax.value_and_grad(
        energy_fn(ansatz, terms, constant, mesh=mesh)))


def vqe_minimize(ansatz: Ansatz, terms, theta0, steps: int = 200,
                 optimizer=None, constant: float = 0.0,
                 grad: str = "auto", scan: bool = True,
                 segment_size: int | None = None, mesh=None):
    """Gradient-descent VQE. The ENTIRE optimization — ``steps`` iterations
    of value_and_grad + optax update — compiles into one ``lax.scan``
    device program: a full VQE run is a single dispatch.

    ``grad="auto"`` uses reverse-mode autodiff (stores one state per gate
    — fastest at small n); ``grad="adjoint"`` uses the constant-memory
    adjoint sweep (the choice at large n, where a state is gigabytes).

    ``scan=True`` (default) fuses all steps into the one-dispatch scan;
    ``scan=False`` jits a single step and loops on the host — the right
    mode at large n, where tracing ``steps`` copies of a deep circuit
    would blow up compile time (the step program is compiled once).

    Returns ``(theta_opt, energies)`` with ``energies[i]`` the energy at
    step i's parameters (before that step's update)."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(0.1)
    if grad == "adjoint":
        vg = adjoint_value_and_grad_fn(ansatz, terms, constant,
                                       segment_size=segment_size, mesh=mesh)
    elif grad == "auto":
        vg = jax.value_and_grad(energy_fn(ansatz, terms, constant, mesh=mesh))
    else:
        raise ValueError(f"grad must be 'auto' or 'adjoint', got {grad!r}")

    theta0 = jnp.asarray(theta0, dtype=jnp.float32)
    if getattr(vg, "_host_composed", False):
        # segmented adjoint: vg composes jits on the host, so the step
        # cannot be traced — host loop with a jitted optax update
        @jax.jit
        def apply_update(g, opt_state, th):
            updates, opt_state = opt.update(g, opt_state, th)
            return optax.apply_updates(th, updates), opt_state

        th, opt_state = theta0, opt.init(theta0)
        hist = []
        for _ in range(steps):
            e, g = vg(th)
            th, opt_state = apply_update(g, opt_state, th)
            hist.append(e)
        return th, jnp.stack(hist)

    @jax.jit
    def one_step(th, opt_state):
        e, g = vg(th)
        updates, opt_state = opt.update(g, opt_state, th)
        th = optax.apply_updates(th, updates)
        return th, opt_state, e

    if not scan:
        th, opt_state = theta0, opt.init(theta0)
        hist = []
        for _ in range(steps):
            th, opt_state, e = one_step(th, opt_state)
            hist.append(e)
        return th, jnp.stack(hist)

    @jax.jit
    def run(theta):
        def step(carry, _):
            th, opt_state = carry
            th, opt_state, e = one_step(th, opt_state)
            return (th, opt_state), e

        (th, _), hist = jax.lax.scan(step, (theta, opt.init(theta)),
                                     xs=None, length=steps)
        return th, hist

    theta, hist = run(theta0)
    return theta, hist


# ---------------------------------------------------------------------------
# Adjoint-method gradients (constant memory in circuit depth)
# ---------------------------------------------------------------------------

#: static op kind per builder (dense operand planes vs diagonal pair)
_KIND = {"rx": "dense", "ry": "dense", "rz": "diag", "phase": "diag",
         "u3": "dense", "cphase": "diag", "crz": "diag", "crx": "dense",
         "cry": "dense", "rzz": "diag", "rxx": "dense", "ryy": "dense"}


def _apply_op_dag(planes, op, theta, n):
    """Apply U^dag of an op (the reverse-sweep step of the adjoint method)."""
    if isinstance(op, PGate):
        builder, _ = BUILDERS[op.name]
        args = [op.scale * theta[j] for j in op.pidx]
        kind, a, b = builder(*args)
        if kind == "diag":
            dr, di, tgts = _sort_diag(a, -b, op.targets)
            return _apply_diag_traced(planes, dr, di, tgts, n)
        ur, ui, tgts = _sort_planes(a.T, -b.T, op.targets)
        return _apply_dense_traced(planes, ur, ui, tgts, n)
    if op.diag:
        dn = np.conj(np.asarray(op.u, dtype=np.complex128))
        dr, di, tgts = _sort_diag(dn.real.astype(np.float32),
                                  dn.imag.astype(np.float32), op.targets)
        return _apply_diag_traced(planes, jnp.asarray(dr), jnp.asarray(di),
                                  tgts, n)
    un, tgts = _sort_targets(
        np.conj(np.asarray(op.u, dtype=np.complex128)).T, op.targets)
    return _apply_dense_traced(planes,
                               jnp.asarray(un.real.astype(np.float32)),
                               jnp.asarray(un.imag.astype(np.float32)),
                               tgts, n)


def _builder_jvp(name, args, i):
    """(d a/d args[i], d b/d args[i]) of a builder's operand planes at
    ``args`` — exact forward-mode derivative of the tiny gate matrix."""
    builder, _ = BUILDERS[name]

    def f(*a):
        _, x, y = builder(*a)
        return (x, y)

    tangents = tuple(jnp.float32(1.0) if j == i else jnp.float32(0.0)
                     for j in range(len(args)))
    _, (da, db) = jax.jvp(f, tuple(args), tangents)
    return da, db


#: Pauli generator of each one-parameter builder, as (coef, chars-on-targets)
#: terms with U(t) = e^{i eta(t)} exp(-i t G) — the global phase eta drops
#: out of every gradient (2 Re<lam|ic|phi> = 2c Re(iE) = 0 since the
#: overlap is the real energy). Controlled gates expand their projector:
#: P1 (x) A = ((I-Z)/2) (x) A; the I(x)A piece of crz/cphase is itself a
#: Pauli term, NOT a phase, so it stays.
_GEN = {
    "rx": ((0.5, "X"),), "ry": ((0.5, "Y"),), "rz": ((0.5, "Z"),),
    "rzz": ((0.5, "ZZ"),), "rxx": ((0.5, "XX"),), "ryy": ((0.5, "YY"),),
    "phase": ((0.5, "Z"),),                      # diag(1,e^{il}): G=-(I-Z)/2
    "cphase": ((0.25, "IZ"), (0.25, "ZI"), (-0.25, "ZZ")),   # G = -P1(x)P1
    "crz": ((0.25, "IZ"), (-0.25, "ZZ")),        # G = P1 (x) Z/2
    "crx": ((0.25, "IX"), (-0.25, "ZX")),        # G = P1 (x) X/2
    "cry": ((0.25, "IY"), (-0.25, "ZY")),        # G = P1 (x) Y/2
}


def _gen_terms(op, n):
    """``_GEN[op.name]`` expanded to n-qubit Pauli strings on
    ``op.targets`` (targets[0] = first char = MSB of the gate index)."""
    out = []
    for coef, chars in _GEN[op.name]:
        s = ["I"] * n
        for t, ch in zip(op.targets, chars):
            s[t] = ch
        out.append((coef, "".join(s)))
    return tuple(out)


def _adjoint_bwd_step(op, theta, phi, lam, g, n, barrier=False):
    """One reverse-sweep step: contract this op's parameter gradient
    against lam, then un-apply ``op`` from phi and lam. Returns
    (phi', lam', g').

    One-parameter gates are Pauli exponentials U = e^{i eta} exp(-i s
    theta_j G) (generator table :data:`_GEN`), so ``dU/dtheta|psi_before>
    = -i s G |psi_after>`` and the gradient is ``2 s Im <lam|G phi>`` —
    one cheap Pauli-sum pass (a sign flip for Z-strings) + one reduction,
    instead of materializing dU and a full dense apply. Multi-parameter
    builders (u3) keep the exact dense-JVP path.

    ``barrier=True`` (the segmented large-n mode) pins the schedule with
    ``optimization_barrier``s: without them XLA's scheduler floats the
    gradient reductions to the end of the segment, holding EVERY step's
    phi alive at once (measured at n=28: 28-32 GiB assigned for a 16-op
    segment on a 16 GiB chip — a compile-time OOM — and ~290 s of
    scheduler/memory-assignment retries even when a program fits;
    barriers bound the live set at the per-step peak and compile in
    seconds). Left off for the small-n single-program path, where
    cross-op fusion freedom is worth more than bounded liveness."""
    if isinstance(op, PGate) and op.name in _GEN and len(op.pidx) == 1:
        from ..ops.measure import apply_pauli_sum_traced
        gr, gi = apply_pauli_sum_traced(phi, _gen_terms(op, n), n)
        contrib = 2.0 * jnp.float32(op.scale) * (
            jnp.vdot(lam[0], gi) - jnp.vdot(lam[1], gr))
        g = g.at[op.pidx[0]].add(contrib)
        if barrier:
            # mid-step barrier: the G phi temp must be DEAD before the
            # dagger applications allocate their outputs
            phi, lam, g = jax.lax.optimization_barrier((phi, lam, g))
        phi = _apply_op_dag(phi, op, theta, n)
        lam = _apply_op_dag(lam, op, theta, n)
        if barrier:
            phi, lam, g = jax.lax.optimization_barrier((phi, lam, g))
        return phi, lam, g
    phi = _apply_op_dag(phi, op, theta, n)  # psi before this op
    if isinstance(op, PGate):
        args = [op.scale * theta[j] for j in op.pidx]
        kind = _KIND[op.name]
        for li, j in enumerate(op.pidx):
            da, db = _builder_jvp(op.name, args, li)
            if kind == "diag":
                dr, di, tgts = _sort_diag(da, db, op.targets)
                dphi = _apply_diag_traced(phi, dr, di, tgts, n)
            else:
                ur, ui, tgts = _sort_planes(da, db, op.targets)
                dphi = _apply_dense_traced(phi, ur, ui, tgts, n)
            contrib = 2.0 * (jnp.vdot(lam[0], dphi[0])
                             + jnp.vdot(lam[1], dphi[1]))
            g = g.at[j].add(jnp.float32(op.scale) * contrib)
    lam = _apply_op_dag(lam, op, theta, n)
    if barrier:
        phi, lam, g = jax.lax.optimization_barrier((phi, lam, g))
    return phi, lam, g


def adjoint_value_and_grad_fn(ansatz: Ansatz, terms, constant: float = 0.0,
                              segment_size: int | None = None, mesh=None,
                              engine: str = "auto"):
    """``theta -> (energy, dE/dtheta)`` by the ADJOINT method
    (PennyLane-lightning style): one forward sweep, then a reverse sweep
    that un-applies each gate and contracts ``2 Re <lam| dU/dtheta |psi>``
    — memory stays ~4 state vectors REGARDLESS of circuit depth (reverse
    autodiff stores one state per gate). The natural choice at large n,
    where a single state is gigabytes.

    ``segment_size=None`` compiles the whole sweep as one jitted program.
    For DEEP circuits at LARGE n that single program's HLO can exceed the
    compiler's memory (observed: a remote v5e compiler SIGKILLed on QAOA
    n=24 p=2, ~340 gate applications); an int splits the sweep into
    bounded jitted segments composed on the host — compile memory stays
    flat in depth, at a few extra dispatches per step. The returned
    callable then carries ``_host_composed = True`` (``vqe_minimize``
    drops to its host loop automatically).

    ``mesh`` shards phi AND lam over the mesh's first axis (see
    :func:`state_fn`), so the ~4-state working set is 4 * 2^n/D per
    device: with the constant-depth memory of the adjoint sweep this is
    the largest-n gradient path in the framework (n = 32 on a v5e-8 is
    4 GiB per chip per state).

    ``engine``: "pallas" runs the sweep through the canonical-layout
    Pallas kernels with theta entering as runtime operands
    (:mod:`.adjoint_engine` — one compile for every theta, DMA-bound
    passes; with ``mesh`` the same unit plans run per device inside
    shard_map, :mod:`.adjoint_mesh`); "xla" is the traced applier path
    above; "auto" picks pallas at n >= 14 when applicable (where the
    XLA rev/elementwise lowering measured ~15x off the streaming
    floor)."""
    paulis = tuple(_check_pauli(p, ansatz.n) for _, p in terms)
    checked = tuple((c, p) for (c, _), p in zip(terms, paulis))
    from ..ops.measure import apply_pauli_sum_traced

    n = ansatz.n
    if engine not in ("auto", "xla", "pallas"):
        raise ValueError(f"engine must be auto|xla|pallas, got {engine!r}")
    if engine != "xla" and mesh is None:
        from .adjoint_engine import pallas_adjoint_value_and_grad_fn, supports
        if engine == "pallas" or (n >= 14 and supports(ansatz)):
            return pallas_adjoint_value_and_grad_fn(ansatz, terms, constant)
    elif engine != "xla":
        from .adjoint_mesh import mesh_adjoint_value_and_grad_fn
        if engine == "pallas":
            # explicit request: unsupported shapes raise
            return mesh_adjoint_value_and_grad_fn(ansatz, terms, mesh,
                                                  constant)
        if n >= 14:       # same threshold as the single-device router
            try:
                return mesh_adjoint_value_and_grad_fn(ansatz, terms, mesh,
                                                      constant)
            except ValueError:
                pass
    sh = _amp_sharding(mesh)

    if segment_size is None:
        def vg(theta):
            phi = _cstr(zero_state(n), sh)
            for op in ansatz.ops:
                phi = _cstr(_apply_op(phi, op, theta, n), sh)
            e = _terms_energy(phi, n, terms, paulis) + jnp.float32(constant)
            lam = _cstr(apply_pauli_sum_traced(phi, checked, n), sh)
            g = jnp.zeros(ansatz.num_params, jnp.float32)
            for op in reversed(ansatz.ops):
                phi, lam, g = _adjoint_bwd_step(op, theta, phi, lam, g, n)
                phi, lam = _cstr(phi, sh), _cstr(lam, sh)
            return e, g

        return jax.jit(vg)

    segs = [ansatz.ops[i:i + segment_size]
            for i in range(0, len(ansatz.ops), segment_size)]

    def _fwd(seg):
        def f(theta, planes):
            for op in seg:
                planes = _cstr(_apply_op(planes, op, theta, n), sh)
                # per-op schedule pin (see _adjoint_bwd_step's barrier
                # note): an unpinned 16-op forward segment at n=28 spent
                # ~290 s in compile-time scheduling retries; pinned, 5 s
                planes = jax.lax.optimization_barrier(planes)
            return planes

        # donate the state: each value flows through the host loop exactly
        # once, and aliasing keeps the sweep near the ~4-state floor at
        # large n (an undonated 40-op segment measured 30 GiB of HLO
        # temps at n=28 — an XLA compile-time OOM on a 16 GB chip)
        return jax.jit(f, donate_argnums=(1,))

    def _bwd(seg):
        def f(theta, phi, lam):
            g = jnp.zeros(ansatz.num_params, jnp.float32)
            for op in reversed(seg):
                phi, lam, g = _adjoint_bwd_step(op, theta, phi, lam, g, n,
                                                barrier=True)
                phi, lam = _cstr(phi, sh), _cstr(lam, sh)
            return phi, lam, g

        return jax.jit(f, donate_argnums=(1, 2))

    fwd_fns = [_fwd(s) for s in segs]
    bwd_fns = [_bwd(s) for s in segs]

    @jax.jit
    def head(planes):
        e = _terms_energy(planes, n, terms, paulis) + jnp.float32(constant)
        return e, _cstr(apply_pauli_sum_traced(planes, checked, n), sh)

    def vg_segmented(theta):
        theta = jnp.asarray(theta, dtype=jnp.float32)
        init = zero_state(n)
        if sh is not None:
            # materialize the seed SHARDED so the first donated dispatch
            # (and via donation every later one) carries the layout
            init = (jax.device_put(init[0], sh), jax.device_put(init[1], sh))
        planes = fwd_fns[0](theta, init)
        for f in fwd_fns[1:]:
            planes = f(theta, planes)
        e, lam = head(planes)
        phi, g = planes, None
        for f in reversed(bwd_fns):
            phi, lam, gs = f(theta, phi, lam)
            g = gs if g is None else g + gs
        return e, g

    vg_segmented._host_composed = True
    vg_segmented._engine = "xla"
    return vg_segmented


# ---------------------------------------------------------------------------
# Ansatz families
# ---------------------------------------------------------------------------


def hea_ansatz(n: int, layers: int) -> Ansatz:
    """Hardware-efficient ansatz: per layer, ry+rz on every qubit followed
    by a CNOT ring; one trailing rotation layer. 2*n*(layers+1) params."""
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 0, 1], [0, 0, 1, 0]], dtype=np.complex128)
    ops = []
    p = 0
    for l in range(layers + 1):
        for q in range(n):
            ops.append(PGate("ry", (q,), (p,)))
            ops.append(PGate("rz", (q,), (p + 1,)))
            p += 2
        if l < layers and n > 1:
            for q in range(n):
                ops.append(Prim(cnot, (q, (q + 1) % n)))
    return Ansatz(n, tuple(ops), p)


def qaoa_maxcut_ansatz(n: int, edges, p_layers: int) -> Ansatz:
    """Differentiable QAOA MaxCut ansatz matching
    :func:`qubism_tpu.models.circuits.qaoa_prims` exactly: theta layout is
    ``[gamma_0..gamma_{p-1}, beta_0..beta_{p-1}]``; the cost layer applies
    ``exp(-i gamma Z_i Z_j)`` (= rzz(2 gamma)) per edge and the mixer is
    ``rx(2 beta)`` per qubit, every gate in layer l sharing that layer's
    scalar."""
    h = np.array([[1, 1], [1, -1]], dtype=np.complex128) / math.sqrt(2)
    ops: list = [Prim(h, (q,)) for q in range(n)]
    for l in range(p_layers):
        for i, j in edges:
            a, b = (i, j) if i < j else (j, i)
            ops.append(PGate("rzz", (a, b), (l,), scale=2.0))
        for q in range(n):
            ops.append(PGate("rx", (q,), (p_layers + l,), scale=2.0))
    return Ansatz(n, tuple(ops), 2 * p_layers)


def sample_fn(ansatz: Ansatz):
    """``(theta, shots, key=None) -> {bitstring: count}``: prepare the
    ansatz state (one jitted program) and draw shots with the hierarchical
    sampler — the QAOA/VQE readout path."""
    import jax as _jax

    from ..ops.sample import sample_counts

    run = _jax.jit(state_fn(ansatz))

    def sample(theta, shots: int, key=None):
        planes = run(jnp.asarray(theta, dtype=jnp.float32))
        return sample_counts(planes, ansatz.n, shots, key)

    return sample


def bind(ansatz: Ansatz, theta) -> list[Prim]:
    """Evaluate every parameterized gate at ``theta`` into a host-constant
    :class:`Prim` stream — the bridge to the compiled engine, the mesh
    executor, and (via :func:`models.circuits.prims_qasm`) the QASM
    surfaces."""
    theta = np.asarray(theta, dtype=np.float64)
    prims: list[Prim] = []
    for op in ansatz.ops:
        if not isinstance(op, PGate):
            prims.append(op)
            continue
        builder, _ = BUILDERS[op.name]
        args = [float(op.scale * theta[j]) for j in op.pidx]
        kind, a, b = builder(*args)
        u = np.asarray(a, dtype=np.float64) + 1j * np.asarray(b, np.float64)
        prims.append(Prim(u, op.targets, diag=(kind == "diag")))
    return prims


def ansatz_qasm(ansatz: Ansatz, theta, measure: bool = False) -> str:
    """OpenQASM 2.0 text of the ansatz bound at ``theta`` (state equal up
    to a global phase) — optimized variational circuits run unchanged on
    the interpreter, REPL, ``--compile`` and ``--mesh`` paths."""
    from .circuits import prims_qasm

    return prims_qasm(ansatz.n, bind(ansatz, theta), measure=measure)


def tfim_hva_ansatz(n: int, layers: int, periodic: bool = False) -> Ansatz:
    """Hamiltonian-variational ansatz for the transverse-field Ising model
    (H = -J sum ZZ - h sum X): start from |+>^n (the h-term ground state),
    then alternate e^{-i theta_l sum ZZ} (rzz bond layers, one shared
    parameter) and e^{-i phi_l sum X} (rx site layers). 2*layers params:
    ``[theta_0, phi_0, theta_1, phi_1, ...]``."""
    h = np.array([[1, 1], [1, -1]], dtype=np.complex128) / math.sqrt(2)
    ops: list = [Prim(h, (q,)) for q in range(n)]
    last = n if periodic and n > 2 else n - 1
    for l in range(layers):
        for q in range(last):
            ops.append(PGate("rzz", (q, (q + 1) % n) if q + 1 < n
                             else (0, q), (2 * l,), scale=2.0))
        for q in range(n):
            ops.append(PGate("rx", (q,), (2 * l + 1,), scale=2.0))
    return Ansatz(n, tuple(ops), 2 * layers)


def maxcut_terms(n: int, edges):
    """(terms, constant) so that constant + sum terms = the MaxCut value
    <sum_edges (1 - Z_i Z_j)/2>."""
    terms = []
    for i, j in edges:
        p = ["I"] * n
        p[i] = p[j] = "Z"
        terms.append((-0.5, "".join(p)))
    return terms, 0.5 * len(edges)
