"""Amplitude-sharded simulation over a TPU mesh — the Pallas path.

Physical bit layout (big-endian, qubit 0 = most significant index bit):

* positions ``[0, d)``     — **device** bits: select the mesh device;
* positions ``[d, d+w)``   — **bank** bits: select one of 2^w per-device
  sub-shard banks;
* positions ``[d+w, n)``   — **local** bits: index within a device's
  canonical ``(R, C)`` block (``ops/kernels.py`` layout).

The state is a tuple of 2^w *bank* plane pairs; each bank is ONE sharded
``jax.Array`` of shape ``(D * R_m, C)`` float32 whose leading rows split
across the mesh, so every device holds a canonical m-qubit block per bank
(m = n - d - w). Banks exist because this TPU stack rejects buffers past
2^29 f32 elements (ops/fusion.py:default_virtual_shards): at n = 33-34 over
a v5e-8 the per-device state exceeds that, so ``w`` defaults to
``max(0, n - d - 29)`` and per-device buffers stay compilable.

Operation taxonomy (SURVEY.md §2.3):

* dense gates on LOCAL targets run the SAME fused Pallas kernel plans as
  the single-chip engine (stage blocks / 1q layers / diag layers /
  row+lane gates — ops/kernels.py) on each device's block INSIDE
  ``shard_map`` — zero communication, single-chip throughput per chip;
* dense gates on BANK targets: an in-place cross-bank butterfly
  (``kernels.shard_butterfly_prepare``), or a block decomposition with
  identity/zero elision for mixed bank+local targets — still per-device,
  zero communication;
* dense gates on DEVICE targets are made local first by a
  **qubit-relabeling swap** (the ICI path): ``ppermute`` half-block
  exchanges with the partner device, tracked host-side in the
  logical→physical permutation so the cost amortizes over the stream;
* **diagonal** gates are zero-communication for ANY targets: device bits
  select a per-device sub-table via ``axis_index``, bank bits specialize
  the table per bank host-side, local bits fold into the fused diag
  kernels;
* measurement/collapse: local reductions + ``psum``; shot sampling: a
  device → bank → local hierarchical inverse-CDF with an ``all_gather``
  of the tiny per-device masses.

Whole runs of communication-free prims compile into ONE buffer-donating
``shard_map`` program (relabel swaps only at segment boundaries — SURVEY
§7.6: plan relabelings over the stream, not per gate), so peak HBM stays
~one state vector and per-chip throughput matches the single-chip plateau.
Validated on a virtual CPU mesh (kernels in interpret mode); identical
code drives real ICI collectives on a TPU slice.
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
from ..ops import kernels
from ..ops.fusion import (OpPlanner, fuse, plan_chunk, plan_sig, run_plans,
                          split_op_virtual)
from ..ops.measure import (_lane_flip_matrix, _sel_views, prob_one_traced)
from .mesh import make_mesh

AXIS = "amp"

#: per-device plane buffers above 2^LOCAL_MAX f32 elements fail to compile
#: on this TPU stack (same limit as ops/fusion.default_virtual_shards)
LOCAL_MAX = 29


def default_banks(n: int, d: int) -> int:
    """log2 bank count keeping per-device plane buffers <= 2^LOCAL_MAX."""
    return max(0, n - d - LOCAL_MAX)


class ShardedSim:
    """An n-qubit state-vector simulator sharded over a device mesh."""

    def __init__(self, n: int, mesh: Mesh | None = None,
                 banks: int | None = None, allocate: bool = True):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = self.mesh.devices.size
        self.d = int(math.log2(self.D))
        if (1 << self.d) != self.D:
            raise ValueError(f"mesh size {self.D} is not a power of two")
        if n < self.d:
            raise ValueError(f"need at least {self.d} qubits for {self.D} shards")
        self.w = default_banks(n, self.d) if banks is None else banks
        self.m = n - self.d - self.w
        if self.m < 2 and n >= 2:
            raise ValueError(
                f"{self.D} shards x 2^{self.w} banks leave {self.m} local "
                f"qubit(s); dense 2-qubit gates need 2")
        self.n = n
        self.C = kernels.canon_cols(self.m)
        self.Rm = (1 << self.m) // self.C
        # logical qubit -> physical bit position (and inverse)
        self.perm = list(range(n))
        self.inv = list(range(n))
        self._bank_specs = tuple((P(AXIS), P(AXIS)) for _ in range(1 << self.w))
        #: None until allocated (allocate=False = plan-only mode: segments
        #: lower/compile abstractly — shape feasibility at n = 33-34
        #: without the state)
        self.banks = None
        self._planner = OpPlanner()
        self._cache: dict = {}
        #: jitted dispatches issued (observability: each costs a full tunnel
        #: round-trip on remote backends, so fusion quality = this counter)
        self.dispatch_count = 0
        #: fused passes per jitted sub-segment: XLA compile time (and the
        #: compiler's own memory) scales badly with monolithic program size
        #: at multi-GiB per-device shapes (same rationale as
        #: CompiledCircuit.chunk_passes)
        #: (16 matches CompiledCircuit: a QFT-28 segment then lands in ONE
        #: dispatch — each extra dispatch costs ~6-9 ms through the tunnel;
        #: at 30+ local qubits stay at 8 for compile-time/-memory sanity)
        self._chunk_passes = (8 if self.m + self.w >= 30 else
                              16 if self.m + self.w > 22 else 10 ** 9)
        #: bound the async dispatch queue at large per-device states: a
        #: queued-but-not-executed chunk pins BOTH its input and output
        #: buffers through the remote runtime, so when the per-device state
        #: is ~half of HBM even two chunks in flight exhaust it (measured:
        #: QFT-30 mesh=1 OOMs at 2 in flight, runs drained per-dispatch)
        self._sync_every = 1 if self.m + self.w >= 30 else (
            6 if self.m + self.w >= 26 else 10 ** 9)
        self._since_sync = 0
        if allocate:
            self.reset_state()

    def reset_state(self):
        """Back to |0...0> with identity qubit labeling, KEEPING the traced
        segment/measure caches — repeated runs (benchmarks, shot loops)
        then skip jit re-tracing entirely."""
        # drop the old state BEFORE allocating: at near-HBM sizes holding
        # both briefly is an OOM (remote runtimes free with lag)
        self.banks = None
        sh = NamedSharding(self.mesh, P(AXIS))
        shape = (self.D * self.Rm, self.C)

        def init():
            out = []
            for s in range(1 << self.w):
                re = jnp.zeros(shape, jnp.float32)
                if s == 0:
                    re = re.at[0, 0].set(1.0)
                out.append((re, jnp.zeros(shape, jnp.float32)))
            return tuple(out)

        self.banks = jax.jit(
            init, out_shardings=tuple((sh, sh) for _ in range(1 << self.w))
        )()
        self.perm = list(range(self.n))
        self.inv = list(range(self.n))
        self._since_sync = 0
        return self

    # -- shard_map plumbing ---------------------------------------------------

    def _smap(self, body, out_specs=None, in_extra=(), donate=True):
        """jit(shard_map(body)) over (banks, *extra). ``donate`` aliases the
        bank buffers in place — peak HBM stays ~one state (VERDICT r2 §3)."""
        if out_specs is None:
            out_specs = self._bank_specs
        f = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(self._bank_specs,) + tuple(in_extra),
            out_specs=out_specs,
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )
        return jax.jit(f, donate_argnums=(0,) if donate else ())

    @property
    def n_local(self) -> int:
        """Shard-local qubits per device (bank + local bits)."""
        return self.n - self.d

    # -- permutation bookkeeping ----------------------------------------------

    def phys(self, logical: int) -> int:
        return self.perm[logical]

    def _swap_positions(self, pg: int, pl: int):
        """Record that physical positions pg and pl exchanged contents."""
        lg, ll = self.inv[pg], self.inv[pl]
        self.perm[lg], self.perm[ll] = pl, pg
        self.inv[pg], self.inv[pl] = ll, lg

    # -- qubit-relabeling swap (device <-> local) over ICI ----------------------

    def _swap_fn(self, pg: int, pl: int):
        key = ("swap", pg, pl)
        if key not in self._cache:
            d, Rm, C = self.d, self.Rm, self.C
            gmask = 1 << (d - 1 - pg)
            q_loc = pl - d - self.w
            log_c = C.bit_length() - 1
            row_bit = q_loc < self.m - log_c
            pairs = [(i, i ^ gmask) for i in range(self.D)]

            def swap_plane(x, bit):
                if row_bit:
                    # leading-dim regroup of the canonical block: free
                    A = 1 << q_loc
                    x4 = x.reshape(A, 2, -1, C)
                    h0, h1 = x4[:, 0], x4[:, 1]
                else:
                    # lane-bit slot: only reachable on tiny (test) blocks
                    # where every local bit is a lane bit
                    a = 1 << q_loc
                    x3 = x.reshape(a, 2, -1)
                    h0, h1 = x3[:, 0], x3[:, 1]
                send = jnp.where(bit, h0, h1)   # the 1-β half leaves
                recv = jax.lax.ppermute(send, AXIS, pairs)
                keep = jnp.where(bit, h1, h0)   # the β half stays
                n0 = jnp.where(bit, recv, keep)
                n1 = jnp.where(bit, keep, recv)
                return jnp.stack([n0, n1], axis=1).reshape(Rm, C)

            def body(banks):
                idx = jax.lax.axis_index(AXIS)
                bit = (idx & gmask) > 0
                return tuple(
                    (swap_plane(b[0], bit), swap_plane(b[1], bit))
                    for b in banks)

            self._cache[key] = self._smap(body)
        return self._cache[key]

    def swap_global_local(self, pg: int, pl: int):
        """Exchange device physical position pg (< d) with local pl (>= d+w)."""
        assert pg < self.d and pl >= self.d + self.w
        self.banks = self._swap_fn(pg, pl)(self.banks)
        self.dispatch_count += 1
        self._swap_positions(pg, pl)

    def _pick_local_slot(self, avoid: set[int]) -> int:
        # prefer OUTERMOST local positions: the new local qubit is then a
        # ROW bit of the canonical block (free leading-dim regroup in the
        # swap, cheap axis mechanics in subsequent kernels)
        for pos in range(self.d + self.w, self.n):
            if pos not in avoid:
                return pos
        raise RuntimeError("no free local position for qubit swap")

    def localize(self, logical_targets: tuple[int, ...]) -> tuple[int, ...]:
        """Ensure no target sits on a DEVICE bit, swapping if needed (bank
        bits stay: cross-bank ops are communication-free). Returns the
        physical positions."""
        avoid = {self.perm[q] for q in logical_targets}
        for q in logical_targets:
            p = self.perm[q]
            if p < self.d:
                slot = self._pick_local_slot(avoid)
                self.swap_global_local(p, slot)
                avoid.discard(p)
                avoid.add(slot)
        return tuple(self.perm[q] for q in logical_targets)

    # -- fused segment execution ------------------------------------------------

    def _segment_content_key(self, prims):
        """Content key for a communication-free segment under the CURRENT
        physical labeling: lowering (fusion + plan building + operand-table
        uploads) costs ~30 ms of host time per call at QFT-28 scale — more
        than the 18 ms mesh-vs-single-chip gap VERDICT r3 flagged — so
        repeated segments (benchmark reps, shot loops, per-trajectory
        re-runs) must reuse the lowered chunks, not just the jitted
        programs. The key folds in each prim's matrix bytes and its
        PHYSICAL targets (the only way ``self.perm`` enters lowering)."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        for p in prims:
            u = np.ascontiguousarray(p.u)
            # length/shape prefixes delimit the variable-size fields:
            # without them, distinct prim streams could concatenate to
            # the same byte stream and alias a wrong lowered segment
            h.update(np.asarray(u.shape, np.int16).tobytes())
            h.update(u.tobytes())
            h.update(bytes((1 if p.diag else 0, len(p.targets))))
            h.update(np.asarray(
                [self.perm[q] for q in p.targets], np.int16).tobytes())
        return h.digest()

    #: content-keyed lowered segments pin uploaded operand arrays in HBM;
    #: value-varying workloads (parameter sweeps, per-seed random
    #: circuits) mint a new key per distinct matrix set, so this cache
    #: must evict — LRU, unlike the structure-keyed jit cache whose key
    #: space is bounded by program shapes
    _LOWERED_LRU = 32

    def _lower_segment_cached(self, prims):
        import collections

        lru = getattr(self, "_lowered_lru", None)
        if lru is None:
            lru = self._lowered_lru = collections.OrderedDict()
        key = self._segment_content_key(prims)
        hit = lru.get(key)
        if hit is not None:
            lru.move_to_end(key)
            return hit
        val = self._lower_segment(prims)
        lru[key] = val
        if len(lru) > self._LOWERED_LRU:
            lru.popitem(last=False)
        return val

    def _lower_segment(self, prims):
        """Lower a run of prims (dense targets already off the device bits
        under the current perm) into a list of (sig, steps, operands)
        sub-segment chunks (<= _chunk_passes fused passes each): a
        structural signature for jit reuse, per-step metadata, and the flat
        device operand list the chunk body consumes in order."""
        d, w, m = self.d, self.w, self.m
        M = w + m
        chunks: list = []
        steps: list = []
        operands: list = []
        sig: list = []
        dense_run: list = []
        passes = 0

        def flush_chunk():
            nonlocal steps, operands, sig, passes
            if steps:
                chunks.append((tuple(sig), steps, operands))
                steps, operands, sig, passes = [], [], [], 0

        def cut(weight: int):
            nonlocal passes
            if steps and passes + weight > self._chunk_passes:
                flush_chunk()
            passes += weight

        def emit_bankrun(bank_ops):
            while bank_ops:
                if passes >= self._chunk_passes:
                    flush_chunk()
                take = min(max(1, self._chunk_passes - passes), len(bank_ops))
                part, bank_ops = bank_ops[:take], bank_ops[take:]
                cut(len(part))
                per_bank = []
                for s in range(1 << w):
                    plans, opnds = plan_chunk([ev[s] for ev in part], m,
                                              self._planner)
                    per_bank.append(plans)
                    operands.extend(opnds)
                steps.append(("banks", tuple(per_bank)))
                sig.append(("banks", tuple(plan_sig(p) for p in per_bank)))

        def emit_cross(op):
            cut(1)
            if all(t < w for t in op.targets):
                steps.append(("bfly", self._bfly_plan(op)))
                sig.append(("bfly", op.targets, op.u.tobytes()))
            else:
                steps.append(("crossmix", self._crossmix_plan(op)))
                sig.append(("crossmix", op.targets, op.u.tobytes()))

        def flush_dense():
            if not dense_run:
                return
            ops = fuse(dense_run, M, max_block=4, keep_separate_below=w,
                       mixed_lane=True)
            bank_ops: list = []
            for op in ops:
                kind, payload = split_op_virtual(op, w)
                if kind == "per_shard":
                    bank_ops.append(payload)
                else:
                    if bank_ops:
                        emit_bankrun(bank_ops)
                        bank_ops = []
                    emit_cross(payload)
            if bank_ops:
                emit_bankrun(bank_ops)
            dense_run.clear()

        for p in prims:
            phys = [self.perm[q] for q in p.targets]
            if p.diag and any(t < d for t in phys):
                # device-bit diagonal: zero-communication axis_index select
                flush_dense()
                cut(1)
                step, table_ops = self._gdiag_plan(p, phys)
                steps.append(step)
                sig.append(step[:1] + step[2:])  # structure w/o per-bank data
                operands.extend(table_ops)
                continue
            if p.diag:
                order = sorted(range(len(phys)), key=lambda j: phys[j])
                dn = np.asarray(p.u, dtype=np.complex128)
                if len(phys) > 1:
                    dn = dn.reshape((2,) * len(phys)).transpose(order).reshape(-1)
                dense_run.append(Prim(dn, tuple(phys[j] - d for j in order),
                                      diag=True))
            else:
                assert all(t >= d for t in phys), (p.targets, phys)
                u = np.asarray(p.dense(), dtype=np.complex128)
                u, sorted_phys = _apply._sort_targets(u, tuple(phys))
                dense_run.append(Prim(u, tuple(t - d for t in sorted_phys)))
        flush_dense()
        flush_chunk()
        return chunks

    # -- cross-bank dense plans (zero communication) ------------------------------

    def _bfly_plan(self, op):
        """All targets on bank bits: whole-block butterflies across banks,
        grouped by the non-target bank bits (kernels._shard_butterfly_fn,
        every block aliased in place)."""
        w, m = self.w, self.m
        fn, coef = kernels.shard_butterfly_prepare(op.u, m)
        targets = op.targets
        nontarget = [t for t in range(w) if t not in targets]
        groups = []
        for bits in range(1 << len(nontarget)):
            base = 0
            for j, t in enumerate(nontarget):
                base |= ((bits >> (len(nontarget) - 1 - j)) & 1) << (w - 1 - t)
            members = []
            for val in range(1 << len(targets)):
                s = base
                for j, t in enumerate(targets):
                    s |= ((val >> (len(targets) - 1 - j)) & 1) << (w - 1 - t)
                members.append(s)
            groups.append(members)
        return (fn, tuple(map(tuple, groups)), coef)

    def _crossmix_plan(self, op):
        """Mixed bank+local dense targets: block-decompose over the bank
        bits — out_bank = sum_in blk[out, in] applied on the local targets
        of bank ``in``; identity blocks pass through, zero blocks are
        skipped (so bank-controlled gates reduce to per-bank ops). The tiny
        block matrices become trace constants."""
        w, m = self.w, self.m
        rest = tuple(t - w for t in op.targets if t >= w)
        h = 1 << len(rest)
        S = 1 << w
        vbits = [t for t in op.targets if t < w]

        def bank_block_index(s):
            out = 0
            for t in vbits:
                out = (out << 1) | ((s >> (w - 1 - t)) & 1)
            return out

        mask = 0
        for t in range(w):
            if t not in vbits:
                mask |= 1 << (w - 1 - t)

        eye = np.eye(h)

        def term_kind(blk):
            if not blk.any():
                return "zero"
            if np.allclose(blk, eye, atol=1e-14):
                return "ident"
            return "mat"

        def local_thunk(blk):
            """planes -> planes applying blk on ``rest`` within a canonical
            m-qubit block (the same kernel taxonomy as OpPlanner)."""
            if not rest:
                c = complex(blk[0, 0])
                cr, ci = np.float32(c.real), np.float32(c.imag)
                return lambda pl: (cr * pl[0] - ci * pl[1],
                                   cr * pl[1] + ci * pl[0])
            b = max(m - _apply._COL, 0)
            if all(t >= b for t in rest):
                u = _apply.expand_for_view(blk, m, rest)
                fn, mr, mi = kernels.lane_gate_prepare(u, m)
                return lambda pl: fn(pl, mr, mi)
            if len(rest) <= 4:
                fn, coef = kernels.row_gate_prepare(blk, rest, m)
                return lambda pl: fn(pl, coef)
            return lambda pl: kernels.like_shape(
                _apply.apply_gate_traced(pl, blk, rest, m), pl)

        out_plans = []
        for s_out in range(S):
            terms = []
            for s_in in range(S):
                if (s_out & mask) != (s_in & mask):
                    continue
                bi, bj = bank_block_index(s_out), bank_block_index(s_in)
                blk = op.u[bi * h:(bi + 1) * h, bj * h:(bj + 1) * h]
                kind = term_kind(blk)
                if kind == "ident":
                    terms.append((s_in, None))
                elif kind == "mat":
                    terms.append((s_in, local_thunk(blk)))
            if len(terms) == 1 and terms[0][1] is None:
                out_plans.append(("pass", terms[0][0]))
            else:
                out_plans.append(("sum", tuple(terms)))
        return tuple(out_plans)

    # -- device-bit diagonals (zero communication) --------------------------------

    def _gdiag_plan(self, p: Prim, phys):
        """Diagonal with device-bit targets: sort targets device/bank/local,
        fix bank bits per bank host-side, select the device row at runtime
        with axis_index. Returns (step, per-bank table operands)."""
        d, w, m = self.d, self.w, self.m
        order = sorted(range(len(phys)),
                       key=lambda j: (phys[j] >= d, phys[j] >= d + w, phys[j]))
        dn = np.asarray(p.u, dtype=np.complex128)
        if len(phys) > 1:
            dn = dn.reshape((2,) * len(phys)).transpose(order).reshape(-1)
        sphys = [phys[j] for j in order]
        gpos = tuple(t for t in sphys if t < d)
        bpos = tuple(t for t in sphys if d <= t < d + w)
        lpos = tuple(t for t in sphys if t >= d + w)
        kg, kb, kl = len(gpos), len(bpos), len(lpos)
        dk = dn.reshape((2,) * (kg + kb + kl))
        table_ops = []
        for s in range(1 << w):
            idx = tuple([slice(None)] * kg
                        + [((s >> (w - 1 - (t - d))) & 1) for t in bpos])
            dsub = np.asarray(dk[idx]).reshape(1 << kg, 1 << kl)
            table_ops.append(jnp.asarray(dsub.real.astype(np.float32)))
            table_ops.append(jnp.asarray(dsub.imag.astype(np.float32)))
        local_targets = tuple(t - d - w for t in lpos)
        return ("gdiag", None, gpos, local_targets, kg, kl), table_ops

    def _segment_fn(self, sig, steps):
        """One jitted shard_map applying a whole fused segment (operand
        tables are arguments, so same-shaped segments share a compile)."""
        key = ("segment", sig)
        if key not in self._cache:
            d, w, m = self.d, self.w, self.m
            Rm, C = self.Rm, self.C

            def body(banks, operands):
                it = iter(operands)
                states = list(banks)
                for step in steps:
                    kind = step[0]
                    if kind == "banks":
                        per_bank = step[1]
                        states = [run_plans(states[s], per_bank[s], it, m)
                                  for s in range(len(states))]
                    elif kind == "bfly":
                        fn, groups, coef = step[1]
                        for members in groups:
                            outs = fn(tuple(states[s] for s in members), coef)
                            for s, pair in zip(members, outs):
                                states[s] = pair
                    elif kind == "crossmix":
                        new = []
                        for entry in step[1]:
                            if entry[0] == "pass":
                                new.append(states[entry[1]])
                            else:
                                acc = None
                                for s_in, thunk in entry[1]:
                                    t = (states[s_in] if thunk is None
                                         else thunk(states[s_in]))
                                    t = kernels.to_canon(t, m)
                                    acc = t if acc is None else (
                                        acc[0] + t[0], acc[1] + t[1])
                                new.append(acc)
                        states = new
                    else:  # gdiag
                        _, _, gpos, local_targets, kg, kl = step
                        idx = jax.lax.axis_index(AXIS)
                        gidx = jnp.int32(0)
                        for g in gpos:
                            bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                            gidx = (gidx << 1) | bit
                        for s in range(len(states)):
                            dr, di = next(it), next(it)
                            rr = jax.lax.dynamic_index_in_dim(
                                dr, gidx, axis=0, keepdims=False)
                            ri = jax.lax.dynamic_index_in_dim(
                                di, gidx, axis=0, keepdims=False)
                            xr, xi = states[s]
                            if kl == 0:
                                states[s] = (xr * rr[0] - xi * ri[0],
                                             xr * ri[0] + xi * rr[0])
                            else:
                                tr, ti, row, has_lane = \
                                    _apply.expand_diag_traced(
                                        rr, ri, m, local_targets)
                                orr, oii = _apply.diag_factor_traced(
                                    xr, xi, tr, ti, row, has_lane, m)
                                states[s] = (orr.reshape(Rm, C),
                                             oii.reshape(Rm, C))
                return tuple(states)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def apply_fused(self, prims):
        """Apply a primitive stream with whole-segment fusion: one jitted
        shard_map per run of communication-free prims, relabel swaps only
        at segment boundaries (SURVEY §7.6). Diagonals never break a
        segment (zero-communication for any targets)."""
        seg: list = []

        def flush():
            if not seg:
                return
            for sig, steps, operands in self._lower_segment_cached(seg):
                fn = self._segment_fn(sig, steps)
                self.banks = fn(self.banks, tuple(operands))
                self.dispatch_count += 1
                self._since_sync += 1
                if self._since_sync >= self._sync_every:
                    # scalar readback: drain the async dispatch queue so
                    # queued ops' un-aliased outputs don't pile up in HBM
                    float(self.banks[0][0][0, 0])
                    self._since_sync = 0
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
        """Apply one primitive at LOGICAL targets (one dispatch)."""
        return self.apply_fused([p])

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

    # -- measurement ------------------------------------------------------------

    def _bank_sel(self, phys: int):
        """Banks whose bit at bank position (phys - d) is 1."""
        b = phys - self.d
        return [s for s in range(1 << self.w)
                if (s >> (self.w - 1 - b)) & 1]

    def _prob_one_fn(self, phys: int):
        key = ("prob", phys)
        if key not in self._cache:
            d, w, m = self.d, self.w, self.m

            def norm2(b):
                return jnp.sum(b[0] * b[0]) + jnp.sum(b[1] * b[1])

            if phys < d:
                gmask = 1 << (d - 1 - phys)

                def body(banks):
                    idx = jax.lax.axis_index(AXIS)
                    mass = sum(norm2(b) for b in banks)
                    return jax.lax.psum(
                        jnp.where((idx & gmask) > 0, mass, 0.0), AXIS)
            elif phys < d + w:
                sel = self._bank_sel(phys)

                def body(banks):
                    mass = sum(norm2(banks[s]) for s in sel)
                    return jax.lax.psum(mass, AXIS)
            else:
                lq = phys - d - w

                def body(banks):
                    return jax.lax.psum(
                        sum(prob_one_traced(b, lq, m) for b in banks), AXIS)

            self._cache[key] = self._smap(body, out_specs=P(), donate=False)
        return self._cache[key]

    def _collapse_fn(self, phys: int):
        key = ("collapse", phys)
        if key not in self._cache:
            d, w, m = self.d, self.w, self.m
            Rm, C = self.Rm, self.C

            if phys < d:
                gmask = 1 << (d - 1 - phys)

                def body(banks, outcome):
                    idx = jax.lax.axis_index(AXIS)
                    bit = ((idx & gmask) > 0).astype(jnp.int32)
                    keep = (bit == outcome)
                    masked = [(jnp.where(keep, b[0], 0.0),
                               jnp.where(keep, b[1], 0.0)) for b in banks]
                    nrm2 = jax.lax.psum(
                        sum(jnp.sum(r * r) + jnp.sum(i * i)
                            for r, i in masked), AXIS)
                    nrm = jnp.sqrt(nrm2)
                    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
                    return tuple((r * scale, i * scale) for r, i in masked)
            elif phys < d + w:
                bbit = phys - d

                def body(banks, outcome):
                    masked = []
                    for s, b in enumerate(banks):
                        sbit = (s >> (w - 1 - bbit)) & 1
                        keep = (outcome == sbit).astype(jnp.float32)
                        masked.append((b[0] * keep, b[1] * keep))
                    nrm2 = jax.lax.psum(
                        sum(jnp.sum(r * r) + jnp.sum(i * i)
                            for r, i in masked), AXIS)
                    nrm = jnp.sqrt(nrm2)
                    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
                    return tuple((r * scale, i * scale) for r, i in masked)
            else:
                lq = phys - d - w

                def body(banks, outcome):
                    masked = []
                    for b in banks:
                        bits, r, i = _sel_views(b, lq, m)
                        sel = bits == outcome
                        masked.append((jnp.where(sel, r, 0.0),
                                       jnp.where(sel, i, 0.0)))
                    nrm2 = jax.lax.psum(
                        sum(jnp.sum(r * r) + jnp.sum(i * i)
                            for r, i in masked), AXIS)
                    nrm = jnp.sqrt(nrm2)
                    scale = 1.0 / jnp.where(nrm == 0, 1, nrm)
                    return tuple(((r * scale).reshape(Rm, C),
                                  (i * scale).reshape(Rm, C))
                                 for r, i in masked)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def prob_one(self, logical_q: int) -> float:
        return float(self._prob_one_fn(self.perm[logical_q])(self.banks))

    def collapse(self, logical_q: int, outcome: int):
        fn = self._collapse_fn(self.perm[logical_q])
        self.banks = fn(self.banks, jnp.int32(outcome))
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

    # -- batched register measurement (one dispatch) ------------------------------

    def _measure_qubits_fn(self, phys: tuple[int, ...]):
        """ONE shard_map program measuring ``phys`` (physical positions,
        given order) sequentially: the 2^k marginal table is assembled
        from per-bank local reductions (table bit order = sorted
        positions, so the [device|bank|local] regions are CONTIGUOUS index
        fields — each bank's local table lands at one dynamic offset),
        psum'd, the k ancestral Born draws run replicated on the tiny
        table with the standard key-split order, and one fused pass
        projects + renormalizes every bank. Same semantics as 2k
        prob/collapse dispatches (reference StateVec.hs:133-137)."""
        # the Born-rule quirk is baked into the traced draws, so it is part
        # of the cache key (a mid-session config toggle must not serve a
        # stale program)
        key = ("measq", phys, config.reference_sqrt_born)
        if key not in self._cache:
            from ..ops.measure import (_ancestral_draws_traced,
                                       _marginal_table_traced,
                                       _projection_rowcol_traced)

            d, w, m = self.d, self.w, self.m
            Rm, C = self.Rm, self.C
            k = len(phys)
            srt = sorted(phys)
            gq = [p for p in srt if p < d]
            bq = [p for p in srt if d <= p < d + w]
            lq = [p for p in srt if p >= d + w]
            kg, kb, kl = len(gq), len(bq), len(lq)
            local_meas = tuple(p - d - w for p in lq)
            # outcome position of each measured qubit within the draws
            pos_of = {p: i for i, p in enumerate(phys)}

            def b_idx(s: int) -> int:
                out = 0
                for p in bq:
                    out = (out << 1) | ((s >> (w - 1 - (p - d))) & 1)
                return out

            sqrt_born = config.reference_sqrt_born

            def body(banks, key):
                idx = jax.lax.axis_index(AXIS)
                gidx = jnp.int32(0)
                for g in gq:
                    bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                    gidx = (gidx << 1) | bit
                full = jnp.zeros(1 << k, jnp.float32)
                for s, b in enumerate(banks):
                    tl = _marginal_table_traced(b, m, local_meas)
                    off = gidx * (1 << (kb + kl)) + (b_idx(s) << kl)
                    cur = jax.lax.dynamic_slice(full, (off,), (1 << kl,))
                    full = jax.lax.dynamic_update_slice(full, cur + tl, (off,))
                table = jax.lax.psum(full, AXIS)

                outcomes, mask, key = _ancestral_draws_traced(
                    table, phys, key, sqrt_born)
                mass = jnp.sum(table * mask)
                scale = jnp.where(mass > 0, 1.0 / jnp.sqrt(mass), 0.0)

                # device-bit keep factor (0/1 per device)
                keep = scale
                for g in gq:
                    bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                    keep = keep * (bit == outcomes[pos_of[g]]).astype(
                        jnp.float32)
                local_out = [outcomes[pos_of[p]] for p in lq]
                rowvec, colvec = _projection_rowcol_traced(
                    local_out, local_meas, m, 1.0, jnp.float32)
                new = []
                for s, b in enumerate(banks):
                    kb_s = keep
                    for p in bq:
                        sbit = (s >> (w - 1 - (p - d))) & 1
                        kb_s = kb_s * (outcomes[pos_of[p]] == sbit).astype(
                            jnp.float32)
                    ind = (rowvec * kb_s)[:, None] * colvec[None, :]
                    new.append(((b[0].reshape(ind.shape) * ind).reshape(Rm, C),
                                (b[1].reshape(ind.shape) * ind).reshape(Rm, C)))
                return jnp.stack(outcomes), key, tuple(new)

            self._cache[key] = self._smap(
                body, out_specs=(P(), P(), self._bank_specs),
                in_extra=(P(),))
        return self._cache[key]

    def measure_qubits(self, logical_qs, key: jax.Array):
        """Measure ``logical_qs`` sequentially in order — ONE dispatch for
        up to 16 distinct qubits via the marginal-table path (same
        key-split order and conditional probabilities as per-qubit
        :meth:`measure_qubit`); falls back to the per-qubit stream beyond
        that or under ``config.force_sequential_measure``. Returns
        (list of outcomes, key')."""
        logical_qs = list(logical_qs)
        if (config.force_sequential_measure or len(logical_qs) > 16
                or len(set(logical_qs)) != len(logical_qs)
                or not logical_qs):
            outs = []
            for q in logical_qs:
                o, key = self.measure_qubit(q, key)
                outs.append(o)
            return outs, key
        phys = tuple(self.perm[q] for q in logical_qs)
        fn = self._measure_qubits_fn(phys)
        outcomes, key, self.banks = fn(self.banks, key)
        self.dispatch_count += 1
        return [int(o) for o in np.asarray(outcomes)], key

    # -- observables -------------------------------------------------------------

    def _expectation_fn(self, phys_pauli: str):
        """<psi|P|psi> over the mesh for one string — the 1-term case of
        :meth:`_expectation_sum_body`. Returns a fn producing ((1,), (1,))
        psum'ed reductions."""
        key = ("expect", phys_pauli)
        if key not in self._cache:
            body, _ = self._expectation_sum_body((phys_pauli,))
            self._cache[key] = self._smap(body, out_specs=(P(), P()),
                                          donate=False)
        return self._cache[key]

    def _expectation_sum_body(self, phys_paulis: tuple[str, ...]):
        """(traced body, term order) reducing MANY Pauli strings over the
        mesh in one dispatch. P|x> = c(x)|x ^ f>: the local part of f is
        an in-shard flipped view on the CANONICAL (Rm, C) layout (XOR
        row/group gathers + a <=128-wide permutation matmul — never a
        layout-changing reshape); bank-bit flips pair bank s with bank
        s ^ f_b (free); a nonzero DEVICE part means the partner amplitudes
        live on device i ^ f_g — ONE ppermute per bank pairs the devices
        up. Terms group by their flip signature; each group reduces via
        the blocked MXU sign-table matmuls of
        :func:`qubism_tpu.ops.measure._blocked_pair_reduce` (bounded
        temps at any term count), with per-bank/per-device +/- sign
        vectors applied to the (k,) partials. One psum ends it.
        ``phys_paulis`` are in PHYSICAL bit order."""
        from ..ops.measure import (_blocked_pair_reduce, _exp_masks,
                                   _flip_canon, _parity_pm1, _sign_masks,
                                   _sign_tables_traced)

        d, w, m = self.d, self.w, self.m
        C, Rm = self.C, self.Rm
        infos = []
        for p in phys_paulis:
            fg = sg = fb = sb = 0
            for q in range(d):
                if p[q] in "XY":
                    fg |= 1 << (d - 1 - q)
                if p[q] in "YZ":
                    sg |= 1 << (d - 1 - q)
            for q in range(d, d + w):
                if p[q] in "XY":
                    fb |= 1 << (w - 1 - (q - d))
                if p[q] in "YZ":
                    sb |= 1 << (w - 1 - (q - d))
            pl = p[d + w:]
            row_mask, grp_mask, lo_mask = _exp_masks(pl, m, C)
            smask = _sign_masks([q for q, ch in enumerate(pl)
                                 if ch in "YZ"], m, C)
            infos.append((fg, sg, fb, sb, row_mask, grp_mask, lo_mask,
                          smask))

        groups: dict[tuple, list[int]] = {}
        for j, info in enumerate(infos):
            groups.setdefault((info[0], info[2], info[4], info[5],
                               info[6]), []).append(j)
        glist = [(k, tuple(idxs)) for k, idxs in groups.items()]
        order = tuple(j for _, idxs in glist for j in idxs)

        def body(banks):
            trs, tis = [], []
            for (fg, fb, row_mask, grp_mask, lo_mask), idxs in glist:
                kg = len(idxs)
                srow_g, scol_g = _sign_tables_traced(
                    [infos[j][7] for j in idxs], Rm, C)
                lo_p = (jnp.asarray(_lane_flip_matrix(min(128, C), lo_mask))
                        if lo_mask else None)
                diag = (fg == 0 and fb == 0 and row_mask == 0
                        and grp_mask == 0 and lo_mask == 0)
                tr_acc = jnp.zeros((kg,), jnp.float32)
                ti_acc = jnp.zeros((kg,), jnp.float32)
                for s in range(1 << w):
                    ar, ai = banks[s]
                    if diag:
                        br = bi = None
                    else:
                        xr, xi = banks[s ^ fb]
                        br = _flip_canon(xr, row_mask, grp_mask, lo_p)
                        bi = _flip_canon(xi, row_mask, grp_mask, lo_p)
                        if fg:
                            perm = [(i, i ^ fg) for i in range(1 << d)]
                            br = jax.lax.ppermute(br, AXIS, perm)
                            bi = jax.lax.ppermute(bi, AXIS, perm)
                    tr, ti = _blocked_pair_reduce(ar, ai, br, bi,
                                                  srow_g, scol_g)
                    bsign = jnp.asarray(np.array(
                        [-1.0 if bin(s & infos[j][3]).count("1") % 2
                         else 1.0 for j in idxs], np.float32))
                    tr_acc = tr_acc + bsign * tr
                    ti_acc = ti_acc + bsign * ti
                if any(infos[j][1] for j in idxs):
                    sgs = jnp.asarray([infos[j][1] for j in idxs],
                                      jnp.int32)
                    dsign = _parity_pm1(
                        jax.lax.axis_index(AXIS).astype(jnp.int32) & sgs)
                    tr_acc = tr_acc * dsign
                    ti_acc = ti_acc * dsign
                trs.append(tr_acc)
                tis.append(ti_acc)
            return (jax.lax.psum(jnp.concatenate(trs), AXIS),
                    jax.lax.psum(jnp.concatenate(tis), AXIS))

        return body, order

    def _to_phys_pauli(self, pauli: str) -> str:
        pauli = pauli.upper()
        if len(pauli) != self.n or any(c not in "IXYZ" for c in pauli):
            raise ValueError(
                f"Pauli string must be {self.n} chars of I/X/Y/Z: {pauli!r}")
        phys = ["I"] * self.n
        for q, c in enumerate(pauli):
            phys[self.perm[q]] = c
        return "".join(phys)

    def expectation(self, pauli: str) -> float:
        """Pauli-string expectation (logical qubit order, I/X/Y/Z)."""
        phys_pauli = self._to_phys_pauli(pauli)
        tr, ti = jax.device_get(self._expectation_fn(phys_pauli)(self.banks))
        # count on the PHYSICAL string: _to_phys_pauli uppercased it
        # (counting the raw input would drop the i^{#Y} factor for
        # lowercase 'y'), and relabeling preserves the letter multiset
        n_y = sum(1 for c in phys_pauli if c == "Y")
        val = complex(float(tr[0]), float(ti[0])) * (1j ** n_y)
        return float(val.real)

    def expectation_sum(self, terms) -> float:
        """<psi| sum_j c_j P_j |psi> for ``terms = [(coef, pauli), ...]``
        in ONE shard_map dispatch (the VQE/Hamiltonian shape): terms group
        by flip signature and reduce via blocked MXU sign-table matmuls —
        bounded temps at any term count (see _expectation_sum_body)."""
        phys_paulis = tuple(self._to_phys_pauli(p) for _, p in terms)
        key = ("expectsum", phys_paulis)
        if key not in self._cache:
            body, order = self._expectation_sum_body(phys_paulis)
            self._cache[key] = (self._smap(body, out_specs=(P(), P()),
                                           donate=False), order)
        fn, order = self._cache[key]
        tr, ti = (np.asarray(x) for x in jax.device_get(fn(self.banks)))
        total = 0.0
        for pos, j in enumerate(order):
            n_y = sum(1 for c in phys_paulis[j] if c == "Y")
            val = complex(float(tr[pos]), float(ti[pos])) * (1j ** n_y)
            total += terms[j][0] * val.real
        return float(total)

    # -- sampling ----------------------------------------------------------------

    def _sample_fn(self, shots: int):
        key = ("sample", shots)
        if key not in self._cache:
            from ..ops import sample as _sample

            w, m, D = self.w, self.m, self.D
            W = 1 << w
            # large per-device blocks use the 3-level leaf-chunk search:
            # a flat 2^m float32 cumsum would cost +2 state-sized buffers
            # (n=33: past HBM) AND sequential-scan precision
            big = m >= _sample._BIG_SAMPLE_BITS

            def body(banks, u):  # u: (shots,) replicated uniforms in [0,1)
                i = jax.lax.axis_index(AXIS)
                if big:
                    chunks = [_sample._chunk_masses(b, m) for b in banks]
                    bank_masses = jnp.stack([jnp.sum(c) for c in chunks])
                else:
                    local_cdfs = []
                    for b in banks:
                        p = (b[0] * b[0] + b[1] * b[1]).reshape(-1)
                        local_cdfs.append(jnp.cumsum(p))
                    bank_masses = jnp.stack([c[-1] for c in local_cdfs])
                bank_cdf = jnp.cumsum(bank_masses)
                mass = bank_cdf[-1]
                masses = jax.lax.all_gather(mass, AXIS)  # (D,) — tiny
                dev_cdf = jnp.cumsum(masses)
                total = dev_cdf[-1]
                uu = u * total
                dev = jnp.clip(jnp.searchsorted(dev_cdf, uu, side="right"),
                               0, D - 1)
                resid = uu - jnp.where(
                    dev > 0, dev_cdf[jnp.maximum(dev - 1, 0)], 0.0)
                bank = jnp.clip(jnp.searchsorted(bank_cdf, resid,
                                                 side="right"), 0, W - 1)
                resid2 = resid - jnp.where(
                    bank > 0, bank_cdf[jnp.maximum(bank - 1, 0)], 0.0)
                local_idx = jnp.zeros(u.shape, jnp.int32)
                for s in range(W):
                    if big:
                        c_, l_ = _sample._leaf_chunk_search(
                            banks[s], chunks[s], resid2, m)
                        ls = (c_ << _sample._LEAF_BITS) | l_
                    else:
                        ls = jnp.clip(
                            jnp.searchsorted(local_cdfs[s], resid2,
                                             side="right"),
                            0, (1 << m) - 1).astype(jnp.int32)
                    local_idx = jnp.where(bank == s, ls, local_idx)
                mine = dev == i
                # device/bank/local parts psum'd SEPARATELY: a flat combined
                # int32 index overflows at n >= 31 (BASELINE asks for up to
                # 34 qubits); combined on the host in int64
                dev_part = jnp.where(mine, i, 0).astype(jnp.int32)
                bank_part = jnp.where(mine, bank, 0).astype(jnp.int32)
                loc_part = jnp.where(mine, local_idx, 0).astype(jnp.int32)
                return (jax.lax.psum(dev_part, AXIS),
                        jax.lax.psum(bank_part, AXIS),
                        jax.lax.psum(loc_part, AXIS))

            self._cache[key] = self._smap(body, out_specs=(P(), P(), P()),
                                          in_extra=(P(),), donate=False)
        return self._cache[key]

    def sample(self, shots: int, key: jax.Array) -> np.ndarray:
        """Sample basis-state indices (converted to logical qubit order).
        Returns (shots,) int64 numpy."""
        u = jax.random.uniform(key, (shots,), dtype=jnp.float32)
        dev, bank, loc = jax.device_get(self._sample_fn(shots)(self.banks, u))
        phys_idx = ((np.asarray(dev).astype(np.int64) << (self.w + self.m))
                    | (np.asarray(bank).astype(np.int64) << self.m)
                    | np.asarray(loc).astype(np.int64))
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

    # -- host access (tests / small n) --------------------------------------------

    def amplitudes(self) -> np.ndarray:
        """Gather to host in LOGICAL qubit order (small n only)."""
        zb = [
            _apply.complex_from_planes(b).reshape(self.D, 1 << self.m)
            for b in self.banks
        ]  # bank s: [device][local]
        z = np.stack(zb, axis=1).reshape(-1)  # [device][bank][local]
        if self.perm == list(range(self.n)):
            return z
        t = z.reshape((2,) * self.n)
        # axis p of the physical tensor holds logical qubit inv[p]; we want
        # axis q (logical) = physical axis perm[q]
        t = t.transpose([self.perm[q] for q in range(self.n)])
        return t.reshape(-1)
