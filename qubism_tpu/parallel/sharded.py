"""Amplitude-sharded simulation over a TPU mesh.

The one parallelism axis of a state-vector simulator is the amplitude index:
the planar (2, 2^n) state is sharded along the amplitude axis over a 1-D
mesh of D = 2^d devices, so the **top d index bits (big-endian qubits
0..d-1) select the device** and the remaining n-d bits are shard-local.

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

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.gates import Prim
from ..ops import apply as _apply
from .mesh import make_mesh

AXIS = "amp"


class ShardedSim:
    """An n-qubit state-vector simulator sharded over a device mesh."""

    def __init__(self, n: int, mesh: Mesh | None = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        (self.D,) = (self.mesh.devices.size,)
        self.d = int(math.log2(self.D))
        if (1 << self.d) != self.D:
            raise ValueError(f"mesh size {self.D} is not a power of two")
        if n < self.d:
            raise ValueError(f"need at least {self.d} qubits for {self.D} shards")
        self.n = n
        # logical qubit -> physical bit position (and inverse)
        self.perm = list(range(n))
        self.inv = list(range(n))
        self.sharding = NamedSharding(self.mesh, P(None, AXIS))
        self.planar = jax.jit(
            lambda: _apply.zero_state(n), out_shardings=self.sharding
        )()
        self._cache: dict = {}

    # -- shard_map plumbing ---------------------------------------------------

    def _smap(self, body, out_specs=P(None, AXIS), in_extra=()):
        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(None, AXIS),) + tuple(in_extra),
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
            d, n_local, D = self.d, self.n_local, self.D
            gmask = 1 << (d - 1 - pg)
            l_loc = pl - d
            a = 1 << l_loc
            pairs = [(i, i ^ gmask) for i in range(D)]

            def body(blk):  # blk: (2, 2^{n_local})
                idx = jax.lax.axis_index(AXIS)
                bit = (idx & gmask) > 0
                blk4 = blk.reshape(2, a, 2, -1)
                half0, half1 = blk4[:, :, 0, :], blk4[:, :, 1, :]
                send = jnp.where(bit, half0, half1)   # the λ = 1-β half leaves
                recv = jax.lax.ppermute(send, AXIS, pairs)
                keep = jnp.where(bit, half1, half0)   # the λ = β half stays
                new0 = jnp.where(bit, recv, keep)
                new1 = jnp.where(bit, keep, recv)
                return jnp.stack([new0, new1], axis=2).reshape(2, -1)

            self._cache[key] = self._smap(body)
        return self._cache[key]

    def swap_global_local(self, pg: int, pl: int):
        """Exchange global physical position pg (< d) with local pl (>= d)."""
        assert pg < self.d <= pl
        self.planar = self._swap_fn(pg, pl)(self.planar)
        self._swap_positions(pg, pl)

    def _pick_local_slot(self, avoid: set[int]) -> int:
        for pos in range(self.n - 1, self.d - 1, -1):
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

            def body(blk, u_planar):
                return _apply._apply_gate_impl(blk, u_planar, local_targets, n_local)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def _global_diag_fn(self, gpos: tuple[int, ...], lpos: tuple[int, ...]):
        key = ("diag", gpos, lpos)
        if key not in self._cache:
            d, n_local = self.d, self.n_local
            kg, kl = len(gpos), len(lpos)
            local_targets = tuple(p - d for p in lpos)

            def body(blk, table_planar):
                # table axes: global bits (MSB-first) then local bits
                idx = jax.lax.axis_index(AXIS)
                gidx = jnp.int32(0)
                for g in gpos:
                    bit = ((idx >> (d - 1 - g)) & 1).astype(jnp.int32)
                    gidx = (gidx << 1) | bit
                row = jax.lax.dynamic_index_in_dim(
                    table_planar.reshape(2, 1 << kg, 1 << kl), gidx, axis=1,
                    keepdims=False,
                )  # (2, 2^kl) planar
                if kl == 0:
                    z = _apply.as_complex(blk) * _apply.as_complex(row)[0]
                    return _apply.as_planar(z)
                return _apply._apply_diag_impl(blk, row, local_targets, n_local)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

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
            table = jnp.asarray(_apply.planar_from_complex(dn.reshape(1 << kg, 1 << len(lpos))))
            self.planar = fn(self.planar, table)
        else:
            phys = self.localize(tuple(p.targets))
            u = np.asarray(p.dense(), dtype=np.complex128)
            u, sorted_phys = _apply._sort_targets(u, phys)
            local_targets = tuple(x - self.d for x in sorted_phys)
            fn = self._local_dense_fn(local_targets)
            self.planar = fn(self.planar, jnp.asarray(_apply.planar_from_complex(u)))

    def apply(self, prims):
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

                def body(blk):
                    st = blk.reshape(2, 1 << lq, 2, -1)
                    return jax.lax.psum(jnp.sum(st[:, :, 1, :] ** 2), AXIS)
            else:
                gmask = 1 << (d - 1 - phys)

                def body(blk):
                    idx = jax.lax.axis_index(AXIS)
                    mass = jnp.sum(blk * blk)
                    return jax.lax.psum(jnp.where((idx & gmask) > 0, mass, 0.0), AXIS)

            self._cache[key] = self._smap(body, out_specs=P())
        return self._cache[key]

    def _collapse_fn(self, phys: int):
        key = ("collapse", phys)
        if key not in self._cache:
            d, n_local = self.d, self.n_local

            if phys >= self.d:
                lq = phys - d

                def body(blk, outcome):
                    st = blk.reshape(2, 1 << lq, 2, -1)
                    sel = jnp.arange(2).reshape(1, 1, 2, 1) == outcome
                    masked = jnp.where(sel, st, 0)
                    nrm = jnp.sqrt(jax.lax.psum(jnp.sum(masked * masked), AXIS))
                    return (masked / jnp.where(nrm == 0, 1, nrm)).reshape(2, -1)
            else:
                gmask = 1 << (d - 1 - phys)

                def body(blk, outcome):
                    idx = jax.lax.axis_index(AXIS)
                    bit = ((idx & gmask) > 0).astype(jnp.int32)
                    masked = jnp.where(bit == outcome, blk, jnp.zeros_like(blk))
                    nrm = jnp.sqrt(jax.lax.psum(jnp.sum(masked * masked), AXIS))
                    return masked / jnp.where(nrm == 0, 1, nrm)

            self._cache[key] = self._smap(body, in_extra=(P(),))
        return self._cache[key]

    def prob_one(self, logical_q: int) -> float:
        return float(self._prob_one_fn(self.perm[logical_q])(self.planar))

    def collapse(self, logical_q: int, outcome: int):
        fn = self._collapse_fn(self.perm[logical_q])
        self.planar = fn(self.planar, jnp.int32(outcome))
        return self

    def measure_qubit(self, logical_q: int, key: jax.Array):
        p1 = self.prob_one(logical_q)
        key, sub = jax.random.split(key)
        outcome = int(jax.random.uniform(sub) < p1)
        self.collapse(logical_q, outcome)
        return outcome, key

    # -- sampling --------------------------------------------------------------------

    def _sample_fn(self, shots: int):
        key = ("sample", shots)
        if key not in self._cache:
            d, n_local, D = self.d, self.n_local, self.D

            def body(blk, u):  # u: (shots,) replicated uniforms in [0,1)
                i = jax.lax.axis_index(AXIS)
                p = jnp.sum(blk * blk, axis=0)  # (2^{n_local},)
                local_cdf = jnp.cumsum(p)
                mass = local_cdf[-1]
                # device CDF: all-gather the D masses (tiny)
                masses = jax.lax.all_gather(mass, AXIS)  # (D,)
                dev_cdf = jnp.cumsum(masses)
                total = dev_cdf[-1]
                uu = u * total
                dev = jnp.clip(jnp.searchsorted(dev_cdf, uu, side="right"), 0, D - 1)
                resid = uu - jnp.where(dev > 0, dev_cdf[jnp.maximum(dev - 1, 0)], 0.0)
                local_idx = jnp.clip(
                    jnp.searchsorted(local_cdf, resid, side="right"), 0, (1 << n_local) - 1
                )
                mine = dev == i
                contrib = jnp.where(mine, (i << n_local) + local_idx, 0)
                return jax.lax.psum(contrib.astype(jnp.int32), AXIS)

            self._cache[key] = self._smap(body, out_specs=P(), in_extra=(P(),))
        return self._cache[key]

    def sample(self, shots: int, key: jax.Array) -> np.ndarray:
        """Sample basis-state indices (in PHYSICAL bit order, then converted
        to logical order host-side). Returns (shots,) int64 numpy."""
        u = jax.random.uniform(key, (shots,), dtype=jnp.float32)
        phys_idx = np.asarray(jax.device_get(self._sample_fn(shots)(self.planar, u)))
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
        z = _apply.complex_from_planar(self.planar)
        if self.perm == list(range(self.n)):
            return z
        t = z.reshape((2,) * self.n)
        # axis p of the physical tensor holds logical qubit inv[p]; we want
        # axis q (logical) = physical axis perm[q]
        t = t.transpose([self.perm[q] for q in range(self.n)])
        return t.reshape(-1)
