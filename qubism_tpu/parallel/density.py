"""Mesh-sharded density matrices: exact open-system simulation past the
single-buffer cap.

The vectorized density matrix |rho>> is just a 2n-qubit split-plane
state (``core/density.py``), so everything the amplitude-sharding
machinery does for pure states applies verbatim: this class runs rho on
a :class:`~qubism_tpu.parallel.sharded.ShardedSim` of 2n qubits —
unitaries as (U row, conj(U) col) prim pairs through the SAME fused
kernel segments and ICI relabel swaps, Kraus channels as one
``shard_map`` program per channel shape (terms accumulated on local
blocks after a localize), and every readout as an indexed-gather psum
(diagonal entries and Pauli-trace pairs are only 2^n amplitudes — tiny
against the 2^2n state, so gathers ride host-computed per-device index
operands).

This lifts the exact-Lindblad ceiling from the n=14 single-buffer cap
(VERDICT r4 weak #4) to the mesh: n=16 is 4 GiB/device on 8 shards,
n=17 on 32. Validated against the dense :class:`DensityMatrix` and the
n<=7 Liouvillian oracle on a virtual CPU mesh (tests/test_density_mesh.py);
``models.dynamics.lindblad_evolve`` accepts this class unchanged (same
apply/apply_channel/expectation surface).

No reference analogue: the Haskell engine has no mixed states and no
parallelism at all (SURVEY.md §2.3, §5).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.gates import Prim
from ..ops import apply as _apply
from ..ops import kernels
from .sharded import LOCAL_MAX, ShardedSim

__all__ = ["ShardedDensityMatrix"]




class ShardedDensityMatrix:
    """An n-qubit mixed state rho, vectorized over a device mesh.

    Same evolution surface as :class:`~qubism_tpu.core.density.
    DensityMatrix` (``apply`` for unitary prim streams, ``apply_channel``
    for Kraus maps, ``expectation``/``probs``/``trace``/``purity``), so
    :func:`~qubism_tpu.models.dynamics.lindblad_evolve` integrates on it
    unchanged.
    """

    def __init__(self, n: int, mesh=None, allocate: bool = True):
        self.n = n
        # validate the shape BEFORE allocating: with allocate=True an
        # oversized rho would otherwise try to materialize its (possibly
        # 32 GiB) buffers before the clean error below could fire
        self.sim = ShardedSim(2 * n, mesh, banks=0, allocate=False)
        if self.sim.m > LOCAL_MAX:
            raise ValueError(
                f"per-device block of {self.sim.m} qubits (n={n} over "
                f"{self.sim.D} shards) exceeds the single-buffer limit "
                f"{LOCAL_MAX}; use a larger mesh")
        if allocate:
            self.sim.reset_state()
        self._cache: dict = {}

    # -- evolution ----------------------------------------------------------

    def apply(self, prims) -> "ShardedDensityMatrix":
        """Unitary prims: U on row qubits, conj(U) on column qubits, one
        fused sharded segment for the whole doubled stream."""
        if isinstance(prims, Prim):
            prims = [prims]
        stream = []
        for p in prims:
            u = np.asarray(p.u, dtype=np.complex128)
            stream.append(Prim(u, tuple(p.targets), p.diag))
            stream.append(Prim(np.conj(u),
                               tuple(t + self.n for t in p.targets), p.diag))
        self.sim.apply(stream)
        return self

    def apply_channel(self, kraus, targets) -> "ShardedDensityMatrix":
        """rho -> sum_i K_i rho K_i^dag: localize the row+column target
        positions, then ONE shard_map accumulating every Kraus term's
        (K row, conj(K) col) application on each device's local block.
        The K_i are trace constants (same discipline as the single-chip
        channel path); compiles are keyed by content + local positions."""
        if isinstance(targets, int):
            targets = (targets,)
        row = tuple(int(t) for t in targets)
        col = tuple(t + self.n for t in row)
        phys = self.sim.localize(row + col)
        d = self.sim.d
        rowloc = tuple(p - d for p in phys[:len(row)])
        colloc = tuple(p - d for p in phys[len(row):])
        ks = [np.asarray(k, dtype=np.complex128) for k in kraus]
        key = ("chan", rowloc, colloc,
               tuple(k.tobytes() for k in ks))
        fn = self._cache.get(key)
        if fn is None:
            m = self.sim.m
            plans = []
            for k in ks:
                kr, rs = _apply._sort_targets(k, rowloc)
                kc, cs = _apply._sort_targets(np.conj(k), colloc)
                plans.append((kr, rs, kc, cs))

            def body(banks):
                x = banks[0]
                acc = None
                for kr, rs, kc, cs in plans:
                    t = _apply.apply_gate_traced(x, kr, rs, m)
                    t = _apply.apply_gate_traced(t, kc, cs, m)
                    t = kernels.to_canon(t, m)
                    acc = t if acc is None else (acc[0] + t[0],
                                                 acc[1] + t[1])
                return (acc,)

            fn = self._cache[key] = self.sim._smap(body)
        self.sim.banks = fn(self.sim.banks)
        self.sim.dispatch_count += 1
        return self

    def reset(self, q: int) -> "ShardedDensityMatrix":
        """Projection to |0> + renormalize by the trace (reference reset
        semantics, src/Qubism/QASM/Simulation.hs:146-156)."""
        proj = np.array([1.0, 0.0], dtype=complex)
        self.apply_channel([np.diag(proj)], (q,))
        tr = self.trace()
        self._scale(0.0 if tr == 0 else 1.0 / tr)
        return self

    def _scale(self, s: float):
        key = "scale"
        fn = self._cache.get(key)
        if fn is None:
            import jax.numpy as jnp
            from jax.sharding import PartitionSpec as P

            def body(banks, s):
                (xr, xi) = banks[0]
                return ((xr * s, xi * s),)

            fn = self._cache[key] = self.sim._smap(body, in_extra=(P(),))
        import jax.numpy as jnp

        self.sim.banks = fn(self.sim.banks, jnp.float32(s))

    # -- indexed gathers (diag / Pauli-trace pairs are 2^n amplitudes) -------

    def _gather_fn(self, K: int, scatter: bool):
        """One shard_map gathering K per-device flat local indices; with
        ``scatter`` the masked values psum-scatter into a (2^n,) table
        (the diagonal), else they reduce to one psum'd complex pair."""
        key = ("gather", K, scatter)
        fn = self._cache.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp
            from jax.sharding import PartitionSpec as P

            n = self.n

            def body(banks, loc, wr, wi, pos):
                (xr, xi) = banks[0]
                fr = xr.reshape(-1)[loc[0]]
                fi = xi.reshape(-1)[loc[0]]
                vr = fr * wr[0] - fi * wi[0]
                vi = fr * wi[0] + fi * wr[0]
                if scatter:
                    out_r = jnp.zeros(1 << n, jnp.float32).at[pos[0]].add(vr)
                    out_i = jnp.zeros(1 << n, jnp.float32).at[pos[0]].add(vi)
                    return (jax.lax.psum(out_r, "amp"),
                            jax.lax.psum(out_i, "amp"))
                return (jax.lax.psum(jnp.sum(vr), "amp"),
                        jax.lax.psum(jnp.sum(vi), "amp"))

            fn = self._cache[key] = self.sim._smap(
                body, out_specs=(P(), P()),
                in_extra=(P("amp"), P("amp"), P("amp"), P("amp")),
                donate=False)
        return fn

    def _gather(self, ys: np.ndarray, flip: int, weights: np.ndarray,
                scatter: bool):
        """Gather rho[y, y ^ flip] * weights[y] over all 2^n row indices
        y, respecting the sim's current qubit relabeling. Returns the
        psum'd (re, im) — a (2^n,) pair when ``scatter`` (values land at
        position y) else scalars."""
        import jax.numpy as jnp

        n, sim = self.n, self.sim
        logical = (ys.astype(np.int64) << n) | (ys ^ np.int64(flip))
        N2 = 2 * n
        perm = sim.perm
        if perm == list(range(N2)):
            phys = logical
        else:
            phys = np.zeros_like(logical)
            for lq in range(N2):
                bit = (logical >> (N2 - 1 - lq)) & 1
                phys |= bit << (N2 - 1 - perm[lq])
        m, D = sim.m, sim.D
        dev = (phys >> m).astype(np.int64)
        loc = (phys & ((1 << m) - 1)).astype(np.int64)
        order = np.argsort(dev, kind="stable")
        counts = np.bincount(dev, minlength=D)
        K = int(counts.max()) if counts.size else 1
        K = max(K, 1)
        locs = np.zeros((D, K), np.int32)
        wr = np.zeros((D, K), np.float32)
        wi = np.zeros((D, K), np.float32)
        pos = np.zeros((D, K), np.int32)
        w = np.asarray(weights, np.complex128)
        off = 0
        for dv in range(D):
            c = counts[dv]
            sel = order[off:off + c]
            off += c
            locs[dv, :c] = loc[sel]
            wr[dv, :c] = w[sel].real
            wi[dv, :c] = w[sel].imag
            pos[dv, :c] = ys[sel]
        fn = self._gather_fn(K, scatter)
        return fn(self.sim.banks, jnp.asarray(locs), jnp.asarray(wr),
                  jnp.asarray(wi), jnp.asarray(pos))

    # -- readout --------------------------------------------------------------

    def probs(self) -> np.ndarray:
        """(2^n,) computational-basis probabilities (the diagonal)."""
        import jax

        ys = np.arange(1 << self.n, dtype=np.int64)
        re, _ = jax.device_get(self._gather(
            ys, 0, np.ones(ys.size), scatter=True))
        return np.asarray(re, dtype=np.float64)

    def trace(self) -> float:
        import jax

        ys = np.arange(1 << self.n, dtype=np.int64)
        re, _ = jax.device_get(self._gather(
            ys, 0, np.ones(ys.size), scatter=False))
        return float(re)

    def purity(self) -> float:
        """Tr(rho^2) = the vectorized norm squared, one psum."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        key = "purity"
        fn = self._cache.get(key)
        if fn is None:
            def body(banks):
                (xr, xi) = banks[0]
                return jax.lax.psum(jnp.sum(xr * xr) + jnp.sum(xi * xi),
                                    "amp")

            fn = self._cache[key] = self.sim._smap(body, out_specs=P(),
                                                   donate=False)
        return float(fn(self.sim.banks))

    def expectation(self, pauli: str) -> float:
        """Tr(P rho) = sum_y P[y^f, y] rho[y, y^f]: one indexed-gather
        psum over the 2^n (row, flipped-column) pairs."""
        from ..ops.measure import _check_pauli

        pauli = _check_pauli(pauli, self.n)
        n = self.n
        flip = 0
        yz = 0
        n_y = 0
        for q, ch in enumerate(pauli):
            if ch in "XY":
                flip |= 1 << (n - 1 - q)
            if ch in "YZ":
                yz |= 1 << (n - 1 - q)
            if ch == "Y":
                n_y += 1
        from ..models.estimation import _parity_pm1_np

        ys = np.arange(1 << n, dtype=np.int64)
        signs = _parity_pm1_np(ys & yz)
        import jax

        re, im = (float(x) for x in jax.device_get(
            self._gather(ys, flip, signs, scatter=False)))
        val = complex(re, im) * (1j ** n_y)
        return float(val.real)

    def expectation_sum(self, terms) -> float:
        return float(sum(c * self.expectation(p) for c, p in terms))

    def prob_one(self, q: int) -> float:
        d = self.probs()
        idx = np.arange(1 << self.n)
        return float(d[(idx >> (self.n - 1 - q)) & 1 == 1].sum())

    def measure_qubit(self, q: int, key):
        """Sample qubit q, project rho, renormalize by the trace — same
        contract (and reference sqrt-Born quirk handling) as the dense
        :meth:`DensityMatrix.measure_qubit`. Returns (outcome, key')."""
        import jax

        from ..config import config

        p1 = self.prob_one(q)
        key, sub = jax.random.split(key)
        thr = (math.sqrt(max(p1, 0.0)) if config.reference_sqrt_born
               else p1)
        outcome = int(float(jax.random.uniform(sub)) < thr)
        proj = np.diag([1.0 - outcome, float(outcome)]).astype(complex)
        self.apply_channel([proj], (q,))
        tr = self.trace()
        self._scale(0.0 if tr == 0 else 1.0 / tr)
        return outcome, key

    def sample(self, shots: int, key=None) -> dict[str, int]:
        """Non-destructive shot sampling from the diagonal (same contract
        as the dense engine: {big-endian bitstring: count})."""
        import jax

        if key is None:
            key = jax.random.PRNGKey(0)
        p = np.clip(self.probs().astype(np.float64), 0.0, None)
        p /= p.sum()
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        idx = np.random.default_rng(seed).choice(p.size, size=shots, p=p)
        vals, counts = np.unique(idx, return_counts=True)
        return {format(int(v), f"0{self.n}b"): int(c)
                for v, c in zip(vals, counts)}
