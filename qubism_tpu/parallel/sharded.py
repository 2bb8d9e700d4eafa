"""Amplitude-sharded simulation over a TPU mesh.

The one parallelism axis of a state-vector simulator is the amplitude index:
the (re, im) plane pair is sharded along the amplitude axis over a 1-D mesh
of D = 2^d devices, so the **top d index bits (big-endian qubits 0..d-1)
select the device** and the remaining n-d bits are shard-local.

Operation taxonomy (SURVEY.md §2.3):

* gates whose physical targets are all local: embarrassingly parallel
  (``shard_map`` with no collectives);
* **diagonal** gates on any targets (incl. global): zero-communication —
  each device selects its sub-table from its global bits;
* dense gates on global qubits: made local by a **qubit-relabeling swap**
  (the ICI path): exchange half-blocks with the partner device via
  ``ppermute`` to swap a global physical position with a local one, and
  track the logical→physical permutation host-side so the cost amortizes;
* measurement/collapse: local reductions + ``psum``;
* shot sampling: a device-level CDF choice + per-shard inverse-CDF search,
  merged with ``psum``.

This module is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and drives real ICI collectives
unchanged on a TPU slice.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import config
from ..core.gates import Prim
from ..ops import apply as _apply
from ..ops.measure import collapse_traced, prob_one_traced
from .mesh import make_mesh

AXIS = "amp"

#: shard_map spec for an (re, im) plane pair
_STATE_SPEC = (P(AXIS), P(AXIS))


class ShardedSim:
    """An n-qubit state-vector simulator sharded over a device mesh."""

    def __init__(self, n: int, mesh: Mesh | None = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = self.mesh.devices.size
        self.d = int(math.log2(self.D))
        if (1 << self.d) != self.D:
            raise ValueError(f"mesh size {self.D} is not a power of two")
        if n < self.d:
            raise ValueError(f"need at least {self.d} qubits for {self.D} shards")
        if n - self.d < 2 and n >= 2:
            raise ValueError(
                f"{self.D} shards leave {n - self.d} local qubit(s); dense "
                f"2-qubit gates need 2 — use at most {1 << (n - 2)} devices")
        self.n = n
        # logical qubit -> physical bit position (and inverse)
        self.perm = list(range(n))
        self.inv = list(range(n))
        sh = NamedSharding(self.mesh, P(AXIS))
        self.planes = jax.jit(
            lambda: _apply.zero_state(n), out_shardings=(sh, sh)
        )()
        self._cache: dict = {}
        #: jitted dispatches issued (observability: each costs a full tunnel
        #: round-trip on remote backends, so fusion quality = this counter)
        self.dispatch_count = 0

    # -- shard_map plumbing ---------------------------------------------------

    def _smap(self, body, out_specs=_STATE_SPEC, in_extra=()):
        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(_STATE_SPEC,) + tuple(in_extra),
                out_specs=out_specs,
            )
        )

    @property
    def n_local(self) -> int:
        return self.n - self.d

    # -- permutation bookkeeping -------------------------------------------------

    def phys(self, logical: int) -> int:
        return self.perm[logical]

    def _swap_positions(self, pg: int, pl: int):
        """Record that physical positions pg and pl exchanged contents."""
        lg, ll = self.inv[pg], self.inv[pl]
        self.perm[lg], self.perm[ll] = pl, pg
        self.inv[pg], self.inv[pl] = ll, lg

    # -- qubit-relabeling swap (global <-> local) over ICI -------------------------

    def _swap_fn(self, pg: int, pl: int):
        key = ("swap", pg, pl)
        if key not in self._cache:
            d, D = self.d, self.D
            gmask = 1 << (d - 1 - pg)
            a = 1 << (pl - d)
            pairs = [(i, i ^ gmask) for i in range(D)]

            def swap_plane(x, bit):
                x3 = x.reshape(a, 2, -1)
                half0, half1 = x3[:, 0, :], x3[:, 1, :]
                send = jnp.where(bit, half0, half1)   # the λ = 1-β half leaves
                recv = jax.lax.ppermute(send, AXIS, pairs)
                keep = jnp.where(bit, half1, half0)   # the λ = β half stays
                new0 = jnp.where(bit, recv, keep)
                new1 = jnp.where(bit, keep, recv)
                return jnp.stack([new0, new1], axis=1).reshape(-1)

            def body(planes):
                idx = jax.lax.axis_index(AXIS)
                bit = (idx & gmask) > 0
                return (swap_plane(planes[0], bit), swap_plane(planes[1], bit))

            self._cache[key] = self._smap(body)
        return self._cache[key]

    def swap_global_local(self, pg: int, pl: int):
        """Exchange global physical position pg (< d) with local pl (>= d)."""
        assert pg < self.d <= pl
        self.planes = self._swap_fn(pg, pl)(self.planes)
        self.dispatch_count += 1
        self._swap_positions(pg, pl)

    def _pick_local_slot(self, avoid: set[int]) -> int:
        # prefer OUTERMOST local positions: the swap kernel's view then keeps
        # a large trailing dim (TPU tiling), and the new local qubit lands in
        # the cheap "row" region of subsequent gate applications
        for pos in range(self.d, self.n):
            if pos not in avoid:
                return pos
        raise RuntimeError("no free local position for qubit swap")

    def localize(self, logical_targets: tuple[int, ...]) -> tuple[int, ...]:
        """Ensure all targets are physically local, swapping if needed.
        Returns their physical positions."""
        avoid = {self.perm[q] for q in logical_targets}
        for q in logical_targets:
            p = self.perm[q]
            if p < self.d:
                slot = self._pick_local_slot(avoid)
                self.swap_global_local(p, slot)
                avoid.discard(p)
                avoid.add(slot)
        return tuple(self.perm[q] for q in logical_targets)

    # -- gate application ------------------------------------------------------------

    def _local_dense_fn(self, local_targets: tuple[int, ...]):
        key = ("dense", local_targets)
        if key not in self._cache:
            n_local = self.n_local

            def body(planes, op):
                dims, tpos, lane = _apply.plan_view(n_local, local_targets)
                if lane:
                    return _apply.apply_gate_lane_traced(planes, op, dims, tpos)
                table = _apply._row_table_dyn(op[0], op[1], dims, tpos)
                return _apply.apply_gate_row_traced(planes, table, dims, tpos)

            self._cache[key] = self._smap(body, in_extra=((P(), P()),))
        return self._cache[key]

    def _global_diag_fn(self, gpos: tuple[int, ...], lpos: tuple[int, ...]):
        key = ("diag", gpos, lpos)
        if key not in self._cache:
            d, n_local = self.d, self.n_local
            kg, kl = len(gpos), len(lpos)
            local_targets = tuple(p - d for p in lpos)

            def body(planes, table):
                # table = (d_r, d_i), axes: global bits (MSB-first) then local
                idx = jax.lax.axis_index(AXIS)
                gidx = jnp.int32(0)
                for g in gpos:
                    bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                    gidx = (gidx << 1) | bit
                rows = tuple(
                    jax.lax.dynamic_index_in_dim(
                        t.reshape(1 << kg, 1 << kl), gidx, axis=0, keepdims=False
                    )
                    for t in table
                )  # ((2^kl,), (2^kl,))
                if kl == 0:
                    rr, ri = rows[0][0], rows[1][0]
                    return (planes[0] * rr - planes[1] * ri,
                            planes[0] * ri + planes[1] * rr)
                tr, ti, rrow, has_lane = _apply.expand_diag_traced(
                    rows[0], rows[1], n_local, local_targets)
                return _apply.diag_factor_traced(
                    planes[0], planes[1], tr, ti, rrow, has_lane, n_local)

            self._cache[key] = self._smap(body, in_extra=((P(), P()),))
        return self._cache[key]

    # -- fused segment execution -------------------------------------------------

    def _lower_segment(self, prims):
        """Lower a run of prims (dense targets already physically local under
        the current perm) into (sig, steps, operands): a structural signature
        for jit reuse, per-step metadata, and the device operand list."""
        from ..ops.fusion import (DenseOp, DiagLayer, Layer1QOp, StageBlockOp,
                                  fuse)

        d, m = self.d, self.n_local
        steps: list = []
        operands: list = []
        sig: list = []

        def flush_dense(run):
            if not run:
                return
            for op in fuse(run, m):
                if isinstance(op, StageBlockOp):
                    # decompose: the XLA traced path has no fused-stage kernel
                    ops = []
                    for u, q, factors in op.stages:
                        ops.append(DenseOp(np.asarray(u), (q,)))
                        if factors:
                            ops.append(DiagLayer(factors))
                elif isinstance(op, Layer1QOp):
                    ops = [DenseOp(np.asarray(u), (q,)) for u, q in op.gates]
                else:
                    ops = [op]
                for o in ops:
                    if isinstance(o, DiagLayer):
                        steps.append(("ldiag", tuple(t for _, t in o.factors)))
                        sig.append(("ldiag", tuple(t for _, t in o.factors)))
                        for dtab, _ in o.factors:
                            dtab = np.asarray(dtab, dtype=np.complex128)
                            operands.append((
                                jnp.asarray(dtab.real.astype(np.float32)),
                                jnp.asarray(dtab.imag.astype(np.float32))))
                    else:
                        ur, ui = _apply.prepare_gate(
                            np.asarray(o.u, dtype=np.complex128), o.targets, m)
                        steps.append(("dense", o.targets))
                        sig.append(("dense", o.targets, ur.shape))
                        operands.append((jnp.asarray(ur), jnp.asarray(ui)))
            run.clear()

        dense_run: list = []
        for p in prims:
            if p.diag:
                flush_dense(dense_run)
                phys = [self.perm[q] for q in p.targets]
                order = sorted(range(len(phys)),
                               key=lambda j: (phys[j] >= d, phys[j]))
                dn = np.asarray(p.u, dtype=np.complex128).reshape((2,) * len(phys))
                dn = dn.transpose(order).reshape(-1)
                sphys = [phys[j] for j in order]
                kg = sum(1 for x in sphys if x < d)
                gpos, lpos = tuple(sphys[:kg]), tuple(sphys[kg:])
                steps.append(("gdiag", gpos, lpos))
                sig.append(("gdiag", gpos, lpos))
                operands.append((jnp.asarray(dn.real.astype(np.float32)),
                                 jnp.asarray(dn.imag.astype(np.float32))))
            else:
                u = np.asarray(p.dense(), dtype=np.complex128)
                u, sorted_phys = _apply._sort_targets(
                    u, tuple(self.perm[q] for q in p.targets))
                dense_run.append(Prim(u, tuple(x - d for x in sorted_phys)))
        flush_dense(dense_run)
        return tuple(sig), steps, operands

    def _segment_fn(self, sig, steps):
        """One jitted shard_map applying a whole fused segment (the operand
        tables are arguments, so same-shaped segments share a compile)."""
        key = ("segment", sig)
        if key not in self._cache:
            d, m = self.d, self.n_local

            def body(planes, operands):
                it = iter(operands)
                for step in steps:
                    if step[0] == "dense":
                        _, targets = step
                        op = next(it)
                        dims, tpos, lane = _apply.plan_view(m, targets)
                        if lane:
                            planes = _apply.apply_gate_lane_traced(
                                planes, op, dims, tpos)
                        else:
                            table = _apply._row_table_dyn(op[0], op[1], dims, tpos)
                            planes = _apply.apply_gate_row_traced(
                                planes, table, dims, tpos)
                    elif step[0] == "ldiag":
                        _, factor_targets = step
                        for targets in factor_targets:
                            dr, di = next(it)
                            tr, ti, rrow, has_lane = _apply.expand_diag_traced(
                                dr, di, m, targets)
                            planes = _apply.diag_factor_traced(
                                planes[0], planes[1], tr, ti, rrow, has_lane, m)
                    else:  # gdiag
                        _, gpos, lpos = step
                        table = next(it)
                        kg, kl = len(gpos), len(lpos)
                        local_targets = tuple(p - d for p in lpos)
                        idx = jax.lax.axis_index(AXIS)
                        gidx = jnp.int32(0)
                        for g in gpos:
                            bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                            gidx = (gidx << 1) | bit
                        rows = tuple(
                            jax.lax.dynamic_index_in_dim(
                                t.reshape(1 << kg, 1 << kl), gidx, axis=0,
                                keepdims=False)
                            for t in table)
                        if kl == 0:
                            rr, ri = rows[0][0], rows[1][0]
                            planes = (planes[0] * rr - planes[1] * ri,
                                      planes[0] * ri + planes[1] * rr)
                        else:
                            tr, ti, rrow, has_lane = _apply.expand_diag_traced(
                                rows[0], rows[1], m, local_targets)
                            planes = _apply.diag_factor_traced(
                                planes[0], planes[1], tr, ti, rrow, has_lane, m)
                return planes

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def apply_fused(self, prims):
        """Apply a primitive stream with whole-segment fusion: one jitted
        shard_map per run of communication-free prims, relabel swaps only at
        segment boundaries (SURVEY §7.6: plan relabelings over the stream,
        not per gate). Diagonals never break a segment (zero-communication
        for any targets)."""
        seg: list = []

        def flush():
            if not seg:
                return
            sig, steps, operands = self._lower_segment(seg)
            fn = self._segment_fn(sig, steps)
            self.planes = fn(self.planes, tuple(operands))
            self.dispatch_count += 1
            seg.clear()

        for p in prims:
            if not p.diag:
                phys = [self.perm[q] for q in p.targets]
                if any(t < self.d for t in phys):
                    flush()
                    self.localize(tuple(p.targets))
            seg.append(p)
        flush()
        return self

    def apply_prim(self, p: Prim):
        """Apply one primitive at LOGICAL targets."""
        if p.diag:
            # diagonals never need communication: split targets by locality
            phys = [self.perm[q] for q in p.targets]
            order = sorted(range(len(phys)), key=lambda j: (phys[j] >= self.d, phys[j]))
            # global positions first (ascending), then local (ascending)
            dn = np.asarray(p.u, dtype=np.complex128).reshape((2,) * len(phys))
            dn = dn.transpose(order).reshape(-1)
            sphys = [phys[j] for j in order]
            kg = sum(1 for x in sphys if x < self.d)
            gpos, lpos = tuple(sphys[:kg]), tuple(sphys[kg:])
            fn = self._global_diag_fn(gpos, lpos)
            table = (jnp.asarray(dn.real.astype(np.float32)),
                     jnp.asarray(dn.imag.astype(np.float32)))
            self.planes = fn(self.planes, table)
            self.dispatch_count += 1
        else:
            phys = self.localize(tuple(p.targets))
            u = np.asarray(p.dense(), dtype=np.complex128)
            u, sorted_phys = _apply._sort_targets(u, phys)
            local_targets = tuple(x - self.d for x in sorted_phys)
            ur, ui = _apply.prepare_gate(u, local_targets, self.n_local)
            fn = self._local_dense_fn(local_targets)
            self.planes = fn(self.planes, (jnp.asarray(ur), jnp.asarray(ui)))
            self.dispatch_count += 1

    def apply(self, prims, fused: bool = True):
        """Apply a primitive stream. ``fused`` (default) batches
        communication-free runs into single shard_map dispatches —
        essential through a high-latency dispatch tunnel; ``fused=False``
        keeps the one-dispatch-per-prim reference path."""
        if fused:
            return self.apply_fused(prims)
        for p in prims:
            self.apply_prim(p)
        return self

    # -- measurement -------------------------------------------------------------------

    def _prob_one_fn(self, phys: int):
        key = ("prob", phys)
        if key not in self._cache:
            d, n_local = self.d, self.n_local

            if phys >= self.d:
                lq = phys - d

                def body(planes):
                    return jax.lax.psum(prob_one_traced(planes, lq, n_local), AXIS)
            else:
                gmask = 1 << (d - 1 - phys)

                def body(planes):
                    idx = jax.lax.axis_index(AXIS)
                    mass = jnp.sum(planes[0] ** 2) + jnp.sum(planes[1] ** 2)
                    return jax.lax.psum(jnp.where((idx & gmask) > 0, mass, 0.0), AXIS)

            self._cache[key] = self._smap(body, out_specs=P())
        return self._cache[key]

    def _collapse_fn(self, phys: int):
        key = ("collapse", phys)
        if key not in self._cache:
            d, n_local = self.d, self.n_local

            if phys >= self.d:
                lq = phys - d

                def body(planes, outcome):
                    return collapse_traced(planes, outcome, lq, n_local,
                                           norm_reduce=lambda x: jax.lax.psum(x, AXIS))
            else:
                gmask = 1 << (d - 1 - phys)

                def body(planes, outcome):
                    idx = jax.lax.axis_index(AXIS)
                    bit = ((idx & gmask) > 0).astype(jnp.int32)
                    mr = jnp.where(bit == outcome, planes[0], jnp.zeros_like(planes[0]))
                    mi = jnp.where(bit == outcome, planes[1], jnp.zeros_like(planes[1]))
                    nrm = jnp.sqrt(jax.lax.psum(jnp.sum(mr * mr) + jnp.sum(mi * mi), AXIS))
                    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
                    return (mr * scale, mi * scale)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def prob_one(self, logical_q: int) -> float:
        return float(self._prob_one_fn(self.perm[logical_q])(self.planes))

    def collapse(self, logical_q: int, outcome: int):
        fn = self._collapse_fn(self.perm[logical_q])
        self.planes = fn(self.planes, jnp.int32(outcome))
        return self

    def measure_qubit(self, logical_q: int, key: jax.Array):
        p1 = self.prob_one(logical_q)
        # honor the reference's r < sqrt(p) quirk like every other path
        # (src/Qubism/StateVec.hs:121-129, SURVEY.md §2.4.2)
        threshold = math.sqrt(p1) if config.reference_sqrt_born else p1
        key, sub = jax.random.split(key)
        outcome = int(jax.random.uniform(sub) < threshold)
        self.collapse(logical_q, outcome)
        return outcome, key

    # -- observables -------------------------------------------------------------------

    def _expectation_fn(self, phys_pauli: str):
        """<psi|P|psi> over the mesh: P|x> = c(x)|x ^ f>. The local part of
        f is an in-shard flipped view; a nonzero GLOBAL part means the
        partner amplitudes live on device i ^ f_g — ONE ppermute pairs the
        devices up. Signs factor into a per-device scalar (global Y/Z bits
        of the axis index) times broadcast per-axis tables; one psum ends
        it. ``phys_pauli`` is in PHYSICAL bit order."""
        key = ("expect", phys_pauli)
        if key not in self._cache:
            d, m = self.d, self.n_local
            fg = 0
            for q in range(d):
                if phys_pauli[q] in "XY":
                    fg |= 1 << (d - 1 - q)
            sg = 0
            for q in range(d):
                if phys_pauli[q] in "YZ":
                    sg |= 1 << (d - 1 - q)
            lflip = [q - d for q in range(d, self.n) if phys_pauli[q] in "XY"]
            lsign = [q - d for q in range(d, self.n) if phys_pauli[q] in "YZ"]

            # rank-3 flips for high bits, a lane permutation matmul for low
            # bits, and a factored rank-2 sign table (TPU rejects rank-m
            # tensors and pads sub-128 trailing dims ~32x; see
            # ops/measure._expectation_pair_fn — same helpers, same rules)
            from ..ops.measure import (_flip_bits, _lane_flip_matrix,
                                       _pauli_tables)

            C = min(1 << m, 1 << _apply._COL)
            R = (1 << m) // C
            srow, scol, fc = _pauli_tables(lflip, lsign, m)
            srow_d = jnp.asarray(srow)
            scol_d = jnp.asarray(scol)
            lane_p = jnp.asarray(_lane_flip_matrix(C, fc)) if fc else None

            def body(planes):
                ar = planes[0].reshape(-1)
                ai = planes[1].reshape(-1)
                br = _flip_bits(ar, m, lflip, lane_p)
                bi = _flip_bits(ai, m, lflip, lane_p)
                if fg:
                    perm = [(i, i ^ fg) for i in range(1 << d)]
                    br = jax.lax.ppermute(br, AXIS, perm)
                    bi = jax.lax.ppermute(bi, AXIS, perm)
                pr = (br * ar + bi * ai).reshape(R, C)   # Re(conj(b) a)
                pi = (br * ai - bi * ar).reshape(R, C)   # Im(conj(b) a)
                s = srow_d[:, None] * scol_d[None, :]
                tr, ti = jnp.sum(pr * s), jnp.sum(pi * s)
                if sg:
                    idx = jax.lax.axis_index(AXIS)
                    bits = jnp.int32(0)
                    x = idx & sg
                    for _ in range(d):
                        bits = bits + (x & 1)
                        x = x >> 1
                    sign = jnp.where(bits % 2 == 1, -1.0, 1.0)
                    tr, ti = tr * sign, ti * sign
                return jax.lax.psum(tr, AXIS), jax.lax.psum(ti, AXIS)

            self._cache[key] = self._smap(body, out_specs=(P(), P()))
        return self._cache[key]

    def expectation(self, pauli: str) -> float:
        """Pauli-string expectation (logical qubit order, I/X/Y/Z)."""
        pauli = pauli.upper()
        if len(pauli) != self.n or any(c not in "IXYZ" for c in pauli):
            raise ValueError(
                f"Pauli string must be {self.n} chars of I/X/Y/Z: {pauli!r}")
        phys = ["I"] * self.n
        for q, c in enumerate(pauli):
            phys[self.perm[q]] = c
        tr, ti = self._expectation_fn("".join(phys))(self.planes)
        n_y = sum(1 for c in pauli if c == "Y")
        val = complex(float(tr), float(ti)) * (1j ** n_y)
        return float(val.real)

    # -- sampling --------------------------------------------------------------------

    def _sample_fn(self, shots: int):
        key = ("sample", shots)
        if key not in self._cache:
            n_local, D = self.n_local, self.D

            def body(planes, u):  # u: (shots,) replicated uniforms in [0,1)
                i = jax.lax.axis_index(AXIS)
                re, im = planes
                p = re * re + im * im
                local_cdf = jnp.cumsum(p)
                mass = local_cdf[-1]
                masses = jax.lax.all_gather(mass, AXIS)  # (D,) — tiny
                dev_cdf = jnp.cumsum(masses)
                total = dev_cdf[-1]
                uu = u * total
                dev = jnp.clip(jnp.searchsorted(dev_cdf, uu, side="right"), 0, D - 1)
                resid = uu - jnp.where(dev > 0, dev_cdf[jnp.maximum(dev - 1, 0)], 0.0)
                local_idx = jnp.clip(
                    jnp.searchsorted(local_cdf, resid, side="right"), 0, (1 << n_local) - 1
                )
                mine = dev == i
                # device index and local index psum'd SEPARATELY: a flat
                # (i << n_local) + local_idx int32 overflows at n >= 31
                # (BASELINE asks for up to 34 qubits); combined on the host
                # in int64
                dev_part = jnp.where(mine, i, 0).astype(jnp.int32)
                loc_part = jnp.where(mine, local_idx, 0).astype(jnp.int32)
                return (jax.lax.psum(dev_part, AXIS), jax.lax.psum(loc_part, AXIS))

            self._cache[key] = self._smap(body, out_specs=(P(), P()), in_extra=(P(),))
        return self._cache[key]

    def sample(self, shots: int, key: jax.Array) -> np.ndarray:
        """Sample basis-state indices (converted to logical qubit order).
        Returns (shots,) int64 numpy."""
        u = jax.random.uniform(key, (shots,), dtype=jnp.float32)
        dev, loc = jax.device_get(self._sample_fn(shots)(self.planes, u))
        phys_idx = (np.asarray(dev).astype(np.int64) << self.n_local) | \
            np.asarray(loc).astype(np.int64)
        return self._to_logical_indices(phys_idx)

    def _to_logical_indices(self, phys_idx: np.ndarray) -> np.ndarray:
        if self.perm == list(range(self.n)):
            return phys_idx.astype(np.int64)
        out = np.zeros_like(phys_idx, dtype=np.int64)
        for logical in range(self.n):
            p = self.perm[logical]
            bit = (phys_idx >> (self.n - 1 - p)) & 1
            out |= bit.astype(np.int64) << (self.n - 1 - logical)
        return out

    # -- host access (tests / small n) ---------------------------------------------------

    def amplitudes(self) -> np.ndarray:
        """Gather to host in LOGICAL qubit order (small n only)."""
        z = _apply.complex_from_planes(self.planes)
        if self.perm == list(range(self.n)):
            return z
        t = z.reshape((2,) * self.n)
        # axis p of the physical tensor holds logical qubit inv[p]; we want
        # axis q (logical) = physical axis perm[q]
        t = t.transpose([self.perm[q] for q in range(self.n)])
        return t.reshape(-1)
