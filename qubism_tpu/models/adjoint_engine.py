"""Pallas-backed adjoint gradients: the large-n engine for
:func:`qubism_tpu.models.variational.adjoint_value_and_grad_fn`.

The traced XLA appliers in ``variational.py`` are correct at any size but
lower each gate to ``lax.rev`` + elementwise chains that XLA neither
fuses nor streams well on TPU (measured at n=28: ~100 ms/op vs the
~7 ms/pass DMA floor — the same pathology that pushed the noiseless
engine onto Pallas, README "Pallas for the hot path"). This module runs
the SAME adjoint sweep through the engine's canonical-layout Pallas
kernels, with every theta-dependent quantity entering as a runtime
operand (the ``run/traj_fused.py`` trick), so one compile serves every
theta:

* disjoint 1q gate runs -> ``kernels._layer1q_fn`` SMEM-coefficient
  passes (chunked to <= 3 axis targets per pass, mirroring
  ``ops.fusion._MAX_AXIS_SLOTS``) + ONE traced-kron lane matmul for the
  lane-block qubits;
* diagonal runs (rz/rzz/cphase/crz ladders — the QAOA/HVA cost layers)
  -> ``kernels._diag_pass_fn`` with TRACED phase tables
  (:func:`_diag_tables_traced`, the traced mirror of
  ``kernels._diag_tables``);
* fixed dense prims (CNOT rings) -> the host-constant
  ``row_gate_prepare`` / lane paths;
* gradient contractions -> per shared-parameter unit, the generator
  identity ``dE/dtheta_j = 2 s Im <lam|G phi>`` evaluated for ALL of a
  unit's generator terms in one blocked MXU sign-table reduction
  (:func:`_pair_pauli_values`, the two-state generalization of
  ``variational._terms_energy``).

No reference analogue (the Haskell engine has no autodiff at all,
src/Qubism/QGate.hs:79-80); this is the "training step" of the
framework at the sizes where a state is gigabytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gates import Prim
from ..ops import kernels
from ..ops.kernels import (_diag_pass_fn, _layer1q_fn, _lane_gate_fn,
                           _mech, canon_cols, canon_shape, row_gate_prepare,
                           to_canon)

#: mirror of ops.fusion._MAX_AXIS_SLOTS — block size doubles per axis slot
_MAX_AXIS_SLOTS = 3
#: mirror of kernels._MAX_STRADDLE_TERMS
_MAX_STRADDLE_TERMS = 8


# ---------------------------------------------------------------------------
# Traced diagonal tables (the traced mirror of kernels._diag_tables)
# ---------------------------------------------------------------------------


def _pad8_traced(a):
    f = a.shape[0]
    pad = (-f) % 8
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _diag_tables_traced(factors, n: int, C: int):
    """Traced phase tables for a diagonal pass: ``factors`` =
    [((dr, di) traced (2^k,) float32 planes, targets)]. The returned
    ``factor_terms`` (and the table counts) depend only on the STATIC
    factor structure, so ``kernels._diag_pass_fn`` can be fetched at
    trace time; the table VALUES are traced. Mirrors
    ``kernels._diag_tables`` minus the value-dependent common-vector
    compression (which would make program structure data-dependent)."""
    R = (1 << n) // C
    log_c = C.bit_length() - 1
    rows = np.arange(R, dtype=np.int64)
    cols = np.arange(C, dtype=np.int64)

    def bitvec(t):
        pos = n - 1 - t
        if pos >= log_c:
            return ((rows >> (pos - log_c)) & 1), True
        return ((cols >> pos) & 1), False

    prow_r = jnp.ones(R, jnp.float32)
    prow_i = jnp.zeros(R, jnp.float32)
    pcol_r = jnp.ones(C, jnp.float32)
    pcol_i = jnp.zeros(C, jnp.float32)
    straddle = []
    for (dr, di), targets in factors:
        k = len(targets)
        dr = jnp.asarray(dr, jnp.float32)
        di = jnp.asarray(di, jnp.float32)
        vecs = [bitvec(t) for t in targets]
        if all(is_row for _, is_row in vecs):
            idx = np.zeros(R, dtype=np.int64)
            for bv, _ in vecs:
                idx = (idx << 1) | bv
            gr, gi = dr[idx], di[idx]
            prow_r, prow_i = (prow_r * gr - prow_i * gi,
                              prow_r * gi + prow_i * gr)
        elif all(not is_row for _, is_row in vecs):
            idx = np.zeros(C, dtype=np.int64)
            for bv, _ in vecs:
                idx = (idx << 1) | bv
            gr, gi = dr[idx], di[idx]
            pcol_r, pcol_i = (pcol_r * gr - pcol_i * gi,
                              pcol_r * gi + pcol_i * gr)
        else:
            rbs = [(bv, t) for (bv, is_row), t in zip(vecs, targets) if is_row]
            cbs = [(bv, t) for (bv, is_row), t in zip(vecs, targets)
                   if not is_row]
            kr = len(rbs)
            order = ([targets.index(t) for _, t in rbs]
                     + [targets.index(t) for _, t in cbs])
            dkr = dr.reshape((2,) * k).transpose(order).reshape(1 << kr, -1)
            dki = di.reshape((2,) * k).transpose(order).reshape(1 << kr, -1)
            cidx = np.zeros(C, dtype=np.int64)
            for bv, _ in cbs:
                cidx = (cidx << 1) | bv
            terms = []
            for a in range(1 << kr):
                ind = np.ones(R, dtype=np.float32)
                for j, (bv, _) in enumerate(rbs):
                    want = (a >> (kr - 1 - j)) & 1
                    ind *= (bv == want).astype(np.float32)
                terms.append((jnp.asarray(ind), dkr[a][cidx], dki[a][cidx]))
            straddle.append(terms)

    row_tables = [prow_r, prow_i]
    col_tables = [pcol_r, pcol_i]
    factor_terms = []
    for terms in straddle:
        tl = []
        for ind, tcr, tci in terms:
            tl.append((len(row_tables), len(col_tables),
                       len(col_tables) + 1))
            row_tables.append(ind)
            col_tables.extend([tcr, tci])
        factor_terms.append(tuple(tl))
    row_t = _pad8_traced(jnp.stack(row_tables))
    col_t = _pad8_traced(jnp.stack(col_tables))
    return row_t, col_t, tuple(factor_terms)


def _diag_struct_weight(targets, n: int, C: int) -> int:
    """Straddle terms a factor contributes, from structure alone."""
    log_c = C.bit_length() - 1
    kr = sum(1 for t in targets if (n - 1 - t) >= log_c)
    k = len(targets)
    if kr == 0 or kr == k:
        return 0
    return 1 << kr


# ---------------------------------------------------------------------------
# Unit planning
# ---------------------------------------------------------------------------


def _op_class(op, KIND, GEN):
    if isinstance(op, Prim):
        if op.diag:
            return "diag"
        return "1q" if len(op.targets) == 1 else "prim"
    # PGate: the gradient contraction needs the Pauli-generator identity,
    # so multi-parameter builders (u3: dense-JVP only) have no lowering
    if op.name not in GEN or len(op.pidx) != 1:
        return None
    if KIND[op.name] == "diag":
        return "diag"
    return "1q" if len(op.targets) == 1 else None


def plan_units(ops, n: int):
    """Group an op stream into commuting kernel units: maximal runs of
    diagonal ops, maximal runs of DISJOINT-target 1q ops, and single
    fixed dense prims. Returns None when some op has no Pallas lowering
    (a traced dense >= 2q gate, or a diag factor too wide for one pass)
    — the caller falls back to the XLA engine."""
    from .variational import _GEN, _KIND

    C = canon_cols(n)
    units: list[tuple[str, list]] = []
    for op in ops:
        cls = _op_class(op, _KIND, _GEN)
        if cls is None:
            return None
        if cls == "diag" and _diag_struct_weight(
                op.targets, n, C) > _MAX_STRADDLE_TERMS:
            return None
        if cls == "prim":
            units.append(("prim", [op]))
            continue
        if (units and units[-1][0] == cls
                and (cls == "diag"
                     or not (set(op.targets)
                             & {t for o in units[-1][1] for t in o.targets}))):
            units[-1][1].append(op)
        else:
            units.append((cls, [op]))
    return units


def supports(ansatz) -> bool:
    """True when every op of the ansatz has a Pallas lowering here."""
    return plan_units(ansatz.ops, ansatz.n) is not None


# ---------------------------------------------------------------------------
# Traced operand builders
# ---------------------------------------------------------------------------


def _op_values(op, theta, dag: bool):
    """Traced ((2,2) | (2^k,)) operand planes of an op at theta."""
    from .variational import BUILDERS

    if isinstance(op, Prim):
        u = np.asarray(op.u, dtype=np.complex128)
        if dag:
            u = np.conj(u.T) if not op.diag else np.conj(u)
        return (jnp.asarray(u.real.astype(np.float32)),
                jnp.asarray(u.imag.astype(np.float32)))
    builder, _ = BUILDERS[op.name]
    args = [op.scale * theta[j] for j in op.pidx]
    kind, a, b = builder(*args)
    if dag:
        return (a, -b) if kind == "diag" else (a.T, -b.T)
    return a, b


def _kron_c(ar, ai, br, bi):
    return (jnp.kron(ar, br) - jnp.kron(ai, bi),
            jnp.kron(ar, bi) + jnp.kron(ai, br))


def _apply_1q_unit(planes, ops, theta, n: int, dag: bool):
    """A disjoint-1q run: row qubits via _layer1q_fn SMEM passes
    (<= _MAX_AXIS_SLOTS axis targets each; rolls ride the first chunk),
    lane-block qubits folded into one traced-kron lane matmul."""
    b = max(n - kernels._COL, 0)
    row = sorted((op for op in ops if op.targets[0] < b),
                 key=lambda o: o.targets[0])
    lane = [op for op in ops if op.targets[0] >= b]

    # chunk row targets by axis-slot budget
    axis_ops = [op for op in row
                if _mech(op.targets[0], n)[0] == "axis"]
    roll_ops = [op for op in row
                if _mech(op.targets[0], n)[0] != "axis"]
    chunks = []
    while axis_ops or roll_ops:
        take = axis_ops[:_MAX_AXIS_SLOTS]
        axis_ops = axis_ops[_MAX_AXIS_SLOTS:]
        chunk = sorted(take + roll_ops, key=lambda o: o.targets[0])
        roll_ops = []
        if chunk:
            chunks.append(chunk)
    for chunk in chunks:
        targets = tuple(op.targets[0] for op in chunk)
        coefs = jnp.stack([jnp.stack(_op_values(op, theta, dag))
                           for op in chunk])
        planes = _layer1q_fn(targets, n, donate=False)(planes, coefs)
    if lane:
        lanes = 1 << min(n, kernels._COL)
        by_q = {op.targets[0]: op for op in lane}
        fr = jnp.ones((1, 1), jnp.float32)
        fi = jnp.zeros((1, 1), jnp.float32)
        eye = jnp.eye(2, dtype=jnp.float32)
        zer = jnp.zeros((2, 2), jnp.float32)
        for q in range(b, n):
            if q in by_q:
                gr, gi = _op_values(by_q[q], theta, dag)
            else:
                gr, gi = eye, zer
            fr, fi = _kron_c(fr, fi, gr, gi)
        assert fr.shape == (lanes, lanes)
        planes = _lane_gate_fn(n, donate=False)(planes, fr.T, fi.T)
    return planes


def _apply_diag_unit(planes, ops, theta, n: int, dag: bool):
    """A diagonal run as few _diag_pass_fn sweeps (structural packing)."""
    C = canon_cols(n)
    groups: list[list] = [[]]
    w = 0
    for op in ops:
        fw = _diag_struct_weight(op.targets, n, C)
        if fw and w + fw > _MAX_STRADDLE_TERMS and w > 0:
            groups.append([])
            w = 0
        groups[-1].append(op)
        w += fw
    for grp in groups:
        if not grp:
            continue
        factors = [(_op_values(op, theta, dag), op.targets) for op in grp]
        row_t, col_t, fterms = _diag_tables_traced(factors, n, C)
        fn = _diag_pass_fn(fterms, n, row_t.shape[0], col_t.shape[0],
                           donate=False)
        planes = fn(planes, row_t, col_t)
    return planes


def _apply_prim_unit(planes, op, n: int, dag: bool):
    from ..ops.apply import _sort_targets

    u = np.asarray(op.u, dtype=np.complex128)
    if dag:
        u = np.conj(u.T)
    u, targets = _sort_targets(u, tuple(op.targets))
    b = max(n - kernels._COL, 0)
    if all(t >= b for t in targets):
        from ..ops.apply import expand_for_view
        full = expand_for_view(u, n, targets)
        mr = jnp.asarray(np.ascontiguousarray(full.real.astype(np.float32).T))
        mi = jnp.asarray(np.ascontiguousarray(full.imag.astype(np.float32).T))
        return _lane_gate_fn(n, donate=False)(planes, mr, mi)
    fn, coef = row_gate_prepare(u, targets, n, donate=False)
    return fn(planes, coef)


def _apply_unit(planes, unit, theta, n: int, dag: bool = False):
    kind, ops = unit
    seq = list(reversed(ops)) if dag else ops
    if kind == "1q":
        return _apply_1q_unit(planes, seq, theta, n, dag)
    if kind == "diag":
        return _apply_diag_unit(planes, seq, theta, n, dag)
    return _apply_prim_unit(planes, seq[0], n, dag)


# ---------------------------------------------------------------------------
# Pairwise Pauli values (the gradient contraction)
# ---------------------------------------------------------------------------


def _scan_single_flip(ar, ai, br0, bi0, cls: str, C: int, flips, srms, scms):
    """(tr, ti) vectors for MANY flip groups of identical structure (one
    term each, one nonzero flip-mask component): ONE ``lax.scan`` whose
    body compiles once — the flip mask and the sign masks enter as
    scanned runtime operands. An rx/ry mixer layer at n=28 otherwise
    lowers ~n structurally identical gather+reduce graphs (measured:
    minutes of XLA compile for one backward chunk); the scan also
    serializes the full-state flipped temps for free (no
    optimization_barrier pinning needed)."""
    from ..ops.measure import _blocked_pair_reduce, _parity_pm1

    R = ar.shape[0]
    w = min(128, C)
    G = C // w
    hi = jax.lax.Precision.HIGHEST

    def body(_, xs):
        fm, rm, cm = xs
        if cls == "row":
            idx = jax.lax.iota(jnp.int32, R) ^ fm
            br, bi = br0[idx], bi0[idx]
        elif cls == "grp":
            idx = jax.lax.iota(jnp.int32, G) ^ fm
            br = br0.reshape(R, G, w)[:, idx, :].reshape(R, C)
            bi = bi0.reshape(R, G, w)[:, idx, :].reshape(R, C)
        else:  # "lo": in-tile lane flip as an XOR permutation matmul
            a = jax.lax.iota(jnp.int32, w)
            P = ((a[:, None] ^ fm) == a[None, :]).astype(jnp.float32)
            br = jnp.dot(br0.reshape(R, G, w), P, precision=hi).reshape(R, C)
            bi = jnp.dot(bi0.reshape(R, G, w), P, precision=hi).reshape(R, C)
        srow = _parity_pm1(jax.lax.iota(jnp.int32, R)[:, None] & rm)
        scol = _parity_pm1(jax.lax.iota(jnp.int32, C)[:, None] & cm)
        tr, ti = _blocked_pair_reduce(ar, ai, br, bi, srow, scol)
        return None, (tr[0], ti[0])

    xs = (jnp.asarray(flips, jnp.int32), jnp.asarray(srms, jnp.int32),
          jnp.asarray(scms, jnp.int32))
    _, (trs, tis) = jax.lax.scan(body, None, xs)
    return trs, tis


def _pair_pauli_values(a_planes, b_planes, n: int, paulis):
    """Per-string complex ``<b|P_j|a>`` for MANY Pauli strings in one
    blocked MXU sign-table sweep per flip group — the two-state
    generalization of ``variational._terms_energy`` (same grouping, with
    the FLIPPED partner being b instead of a). Returns (re, im) lists
    aligned with ``paulis``."""
    from ..ops.measure import (_blocked_pair_reduce, _canon_width,
                               _exp_masks, _flip_canon, _lane_flip_matrix,
                               _sign_masks, _sign_tables_traced)

    C = _canon_width(a_planes, n)
    R = (1 << n) // C
    groups: dict[tuple[int, int, int], list[int]] = {}
    for j, p in enumerate(paulis):
        groups.setdefault(_exp_masks(p, n, C), []).append(j)
    ar = a_planes[0].reshape(R, C)
    ai = a_planes[1].reshape(R, C)
    br0 = b_planes[0].reshape(R, C)
    bi0 = b_planes[1].reshape(R, C)
    re = [None] * len(paulis)
    im = [None] * len(paulis)

    def _finish(j, tr, ti):
        k = sum(1 for c in paulis[j] if c == "Y") % 4
        re[j] = (tr, -ti, -tr, ti)[k]
        im[j] = (ti, tr, -ti, -tr)[k]

    # Batch the dominant shape — one-term groups whose flip mask lives in
    # a single class (a whole rx/ry mixer layer is n such groups, one per
    # qubit) — into ONE lax.scan per class: the body compiles once
    # instead of n times (minutes of XLA compile per backward chunk at
    # n=28) and the scan serializes the state-sized flipped temps.
    batched: dict[str, list[tuple[int, int]]] = {"row": [], "grp": [],
                                                 "lo": []}
    rest = []
    for key, idxs in groups.items():
        nz = [m for m in key if m]
        if len(idxs) == 1 and len(nz) == 1:
            cls = "row" if key[0] else ("grp" if key[1] else "lo")
            batched[cls].append((nz[0], idxs[0]))
        else:
            rest.append((key, idxs))
    for cls, ents in batched.items():
        if len(ents) < 2:
            for fm, j in ents:
                key = {"row": (fm, 0, 0), "grp": (0, fm, 0),
                       "lo": (0, 0, fm)}[cls]
                rest.append((key, [j]))
            continue
        srms, scms = zip(*(_sign_masks(
            [q for q, ch in enumerate(paulis[j]) if ch in "YZ"], n, C)
            for _, j in ents))
        trs, tis = _scan_single_flip(ar, ai, br0, bi0, cls, C,
                                     [f for f, _ in ents], srms, scms)
        for pos, (_, j) in enumerate(ents):
            _finish(j, trs[pos], tis[pos])

    for (row_mask, grp_mask, lo_mask), idxs in rest:
        smasks = [_sign_masks([q for q, ch in enumerate(paulis[j])
                               if ch in "YZ"], n, C) for j in idxs]
        srow_g, scol_g = _sign_tables_traced(smasks, R, C)
        lo_p = (jnp.asarray(_lane_flip_matrix(min(128, C), lo_mask))
                if lo_mask else None)
        if row_mask or grp_mask or lo_mask:
            br = _flip_canon(br0, row_mask, grp_mask, lo_p)
            bi = _flip_canon(bi0, row_mask, grp_mask, lo_p)
        else:
            br, bi = br0, bi0
        tr, ti = _blocked_pair_reduce(ar, ai, br, bi, srow_g, scol_g)
        # serialize the groups: each flip group materializes a full
        # flipped copy of b — unpinned, the scheduler overlaps many of
        # them (a 1q unit at n=28 has ~28 single-X groups; measured HBM
        # blowups past the chip)
        br0, bi0, tr, ti = jax.lax.optimization_barrier((br0, bi0, tr, ti))
        for pos, j in enumerate(idxs):
            _finish(j, tr[pos], ti[pos])
    return re, im


def _unit_grad(phi, lam, unit, n: int, num_params: int):
    """All gradient contributions of a unit from the (phi, lam) pair at
    the unit's AFTER boundary: every op in a unit commutes with the
    others AND with their Pauli generators (diag units are all-diagonal;
    1q units are target-disjoint), so ``2 s Im <lam|G_k phi>`` is valid
    for each op without intra-unit un-applies. Returns a (num_params,)
    contribution vector (zeros when the unit holds no PGate)."""
    from .variational import PGate, _GEN, _gen_terms

    entries = []  # (pidx, scale*coef, pauli)
    for op in unit[1]:
        if isinstance(op, PGate):
            for coef, pauli in _gen_terms(op, n):
                entries.append((op.pidx[0], op.scale * coef, pauli))
    if not entries:
        return None
    paulis = [p for _, _, p in entries]
    _, ims = _pair_pauli_values(phi, lam, n, paulis)
    g = jnp.zeros(num_params, jnp.float32)
    for (j, sc, _), iv in zip(entries, ims):
        g = g.at[j].add(2.0 * jnp.float32(sc) * iv)
    return g


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------


def pallas_adjoint_value_and_grad_fn(ansatz, terms, constant: float = 0.0,
                                     units_per_chunk: int = 4):
    """``theta -> (energy, dE/dtheta)``: the adjoint sweep on the Pallas
    kernel path. Host-composed chunk jits (``units_per_chunk`` units per
    program, donated in-place planes) keep both HBM liveness and compile
    time bounded at any depth; the returned callable carries
    ``_host_composed = True``. Raises ValueError when some op has no
    Pallas lowering — use ``variational.adjoint_value_and_grad_fn`` (its
    ``engine="auto"`` does the dispatch)."""
    from .variational import _check_pauli, _terms_energy

    n = ansatz.n
    units = plan_units(ansatz.ops, n)
    if units is None:
        raise ValueError("ansatz has ops without a Pallas lowering "
                         "(traced dense >= 2q gate or too-wide diagonal)")
    paulis = tuple(_check_pauli(p, n) for _, p in terms)
    checked = tuple((c, p) for (c, _), p in zip(terms, paulis))
    R, C = canon_shape(n)

    chunks = [units[i:i + units_per_chunk]
              for i in range(0, len(units), units_per_chunk)]

    def _fwd(chunk):
        def f(theta, planes):
            for unit in chunk:
                planes = _apply_unit(planes, unit, theta, n)
                planes = jax.lax.optimization_barrier(planes)
            return planes

        return jax.jit(f, donate_argnums=(1,))

    def _bwd(chunk):
        def f(theta, phi, lam):
            g = jnp.zeros(ansatz.num_params, jnp.float32)
            for unit in reversed(chunk):
                gu = _unit_grad(phi, lam, unit, n, ansatz.num_params)
                if gu is not None:
                    g = g + gu
                    phi, lam, g = jax.lax.optimization_barrier((phi, lam, g))
                phi = _apply_unit(phi, unit, theta, n, dag=True)
                lam = _apply_unit(lam, unit, theta, n, dag=True)
                phi, lam, g = jax.lax.optimization_barrier((phi, lam, g))
            return phi, lam, g

        return jax.jit(f, donate_argnums=(1, 2))

    fwd_fns = [_fwd(c) for c in chunks]
    bwd_fns = [_bwd(c) for c in chunks]

    all_diag = all(all(ch in "IZ" for ch in p) for p in paulis)

    if all_diag:
        # Diagonal H (the QAOA/Ising shape): lam(x) = w(x) phi(x) with the
        # theta-independent weight table w = srow diag(c) scol^T built by
        # ONE (R, k) @ (k, C) MXU matmul — and <phi|H|phi> is the same
        # table contracted with |phi|^2, so the whole head is one pass
        # over the state instead of one apply_pauli_traced per term.
        from ..ops.measure import _sign_masks, _sign_tables_traced

        smasks = tuple(_sign_masks(
            [q for q, ch in enumerate(p) if ch == "Z"], n, C)
            for p in paulis)
        coefs = np.asarray([c for c, _ in checked], np.float32)

        @jax.jit
        def head(planes):
            pr, pi = planes
            srow_g, scol_g = _sign_tables_traced(smasks, R, C)
            w = jnp.dot(srow_g * jnp.asarray(coefs)[None, :], scol_g.T,
                        precision=jax.lax.Precision.HIGHEST)
            e = jnp.sum(jnp.sum(w * (pr * pr + pi * pi), axis=1))
            return e + jnp.float32(constant), (w * pr, w * pi)
    else:
        @jax.jit
        def head(planes):
            from ..ops.measure import apply_pauli_traced

            e = _terms_energy(planes, n, terms, paulis) + jnp.float32(constant)
            # lam = H|phi> with per-term schedule pins (the shared
            # apply_pauli_sum_traced leaves every term's full-state temp
            # schedulable in parallel)
            out_r = out_i = None
            for coef, pauli in checked:
                pr, pi = apply_pauli_traced(planes, pauli, n)
                c = jnp.float32(coef)
                out_r = c * pr if out_r is None else out_r + c * pr
                out_i = c * pi if out_i is None else out_i + c * pi
                out_r, out_i = jax.lax.optimization_barrier((out_r, out_i))
            return e, (out_r.reshape(R, C), out_i.reshape(R, C))

    def _init():
        re = jnp.zeros((R, C), jnp.float32).at[0, 0].set(1.0)
        return (re, jnp.zeros((R, C), jnp.float32))

    def vg(theta):
        theta = jnp.asarray(theta, dtype=jnp.float32)
        planes = _init()
        for f in fwd_fns:
            planes = f(theta, planes)
        e, lam = head(planes)
        phi, g = planes, None
        for f in reversed(bwd_fns):
            phi, lam, gs = f(theta, phi, lam)
            g = gs if g is None else g + gs
        return e, g

    vg._host_composed = True
    vg._engine = "pallas"
    return vg
