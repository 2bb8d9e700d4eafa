"""Mixed states: density matrices and noise channels on the SAME engine.

The reference (and our L1 core) simulates pure states only. This module
adds open-system simulation with zero new kernel code via vectorization:
an n-qubit density matrix rho_{r,c} is stored as the 2^{2n} split-plane
state |rho>> with the ROW index in the top n qubits — exactly the layout
:func:`qubism_tpu.ops.apply.tensor` produces for |psi><psi| = psi (x)
conj(psi). Then

* a unitary U on qubits T maps rho -> U rho U^dag, i.e. U on row qubits T
  and conj(U) on column qubits T+n of |rho>> — two ordinary engine gate
  applications (Pallas-routed on TPU at 2n >= 14);
* a Kraus channel sum_i K_i rho K_i^dag is a sum of such applications;
* Tr(P rho) reuses the Pauli flip machinery; measurement probabilities
  are diagonal marginals; purity Tr(rho^2) is just the squared norm.

Memory is 2^{2n} amplitudes, so n <= 14 on one v5e chip — the standard
density-matrix scaling, not an engine limitation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..ops import apply as A
from .gates import Prim


# ---------------------------------------------------------------------------
# Standard single-qubit Kraus channels
# ---------------------------------------------------------------------------


def depolarizing(p: float) -> list[np.ndarray]:
    """With probability p, replace the qubit state by the maximally mixed
    state: K = {sqrt(1-p) I, sqrt(p/3) X, sqrt(p/3) Y, sqrt(p/3) Z}."""
    s = math.sqrt(p / 3.0)
    return [math.sqrt(1.0 - p) * np.eye(2, dtype=complex),
            s * np.array([[0, 1], [1, 0]], dtype=complex),
            s * np.array([[0, -1j], [1j, 0]], dtype=complex),
            s * np.array([[1, 0], [0, -1]], dtype=complex)]


def depolarizing2(p: float) -> list[np.ndarray]:
    """Two-qubit depolarizing: with probability p, replace the PAIR by
    the maximally mixed state — K = {sqrt(1-p) I4} + {sqrt(p/15) Pa x Pb
    for the 15 non-identity Pauli pairs}. The standard model for noisy
    entangling gates (typically ~10x the 1q rate)."""
    paulis = [np.eye(2, dtype=complex),
              np.array([[0, 1], [1, 0]], dtype=complex),
              np.array([[0, -1j], [1j, 0]], dtype=complex),
              np.diag([1.0, -1.0]).astype(complex)]
    s = math.sqrt(p / 15.0)
    ks = [math.sqrt(1.0 - p) * np.eye(4, dtype=complex)]
    for a in range(4):
        for b in range(4):
            if a == 0 and b == 0:
                continue
            ks.append(s * np.kron(paulis[a], paulis[b]))
    return ks


def amplitude_damping(gamma: float) -> list[np.ndarray]:
    """|1> decays to |0> with probability gamma (T1 noise)."""
    return [np.array([[1, 0], [0, math.sqrt(1.0 - gamma)]], dtype=complex),
            np.array([[0, math.sqrt(gamma)], [0, 0]], dtype=complex)]


def phase_damping(gamma: float) -> list[np.ndarray]:
    """Pure dephasing (T2 noise): off-diagonals shrink by sqrt(1-gamma)."""
    return [np.array([[1, 0], [0, math.sqrt(1.0 - gamma)]], dtype=complex),
            np.array([[0, 0], [0, math.sqrt(gamma)]], dtype=complex)]


def bit_flip(p: float) -> list[np.ndarray]:
    return [math.sqrt(1.0 - p) * np.eye(2, dtype=complex),
            math.sqrt(p) * np.array([[0, 1], [1, 0]], dtype=complex)]


def phase_flip(p: float) -> list[np.ndarray]:
    return [math.sqrt(1.0 - p) * np.eye(2, dtype=complex),
            math.sqrt(p) * np.array([[1, 0], [0, -1]], dtype=complex)]


# ---------------------------------------------------------------------------
# Jitted helpers on the vectorized representation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n",))
def _diag_probs(planes, n: int):
    """(2^n,) real diagonal of rho (the computational-basis probabilities)."""
    d = 1 << n
    re = planes[0].reshape(d, d)
    return jnp.diagonal(re)


@functools.partial(jax.jit, static_argnames=("n",))
def _trace(planes, n: int):
    return jnp.sum(_diag_probs(planes, n))


@jax.jit
def _purity(planes):
    re, im = planes
    return jnp.sum(re * re) + jnp.sum(im * im)


@jax.jit
def _scale(planes, s):
    return (planes[0] * s, planes[1] * s)


@jax.jit
def _add(a, b):
    return (a[0] + b[0], a[1] + b[1])


@functools.lru_cache(maxsize=None)
def _tr_pauli(pauli: str, n: int):
    """Jitted Tr(P rho) over the vectorized planes (cached per string)."""
    from ..ops.measure import apply_pauli_traced

    def fn(planes):
        p = apply_pauli_traced(planes, pauli + "I" * n, 2 * n)
        return jnp.sum(jnp.diagonal(p[0].reshape(1 << n, -1)))

    return jax.jit(fn)


class DensityMatrix:
    """An n-qubit mixed state rho, stored vectorized on the engine.

    Supports everything the pure-state path does (gates as :class:`Prim`
    streams, measurement, Pauli expectations) plus Kraus noise channels —
    the open-system surface the reference has no analogue for.
    """

    def __init__(self, n: int, planes=None):
        self.n = n
        self.planes = A.zero_state(2 * n) if planes is None else planes

    @classmethod
    def from_statevec(cls, sv) -> "DensityMatrix":
        """|psi><psi| from a StateVec or a flat plane pair."""
        planes = getattr(sv, "planes", sv)
        n = (planes[0].size).bit_length() - 1
        flat = (planes[0].reshape(-1), planes[1].reshape(-1))
        conj = (flat[0], -flat[1])
        return cls(n, A.tensor(flat, conj))

    def matrix(self) -> np.ndarray:
        """Host-side dense (2^n, 2^n) complex rho (tests / small n)."""
        if self.n > 12:
            raise ValueError("matrix() materializes 4^n entries; n > 12 "
                             "refused — use probs()/expectation() instead")
        d = 1 << self.n
        return A.complex_from_planes(self.planes).reshape(d, d)

    # -- evolution ----------------------------------------------------------

    def apply(self, prims) -> "DensityMatrix":
        """Apply unitary prims: U on the row qubits, conj(U) on the column
        qubits (order irrelevant — they commute)."""
        if isinstance(prims, Prim):
            prims = [prims]
        planes = self.planes
        for p in prims:
            row = p.targets
            col = tuple(t + self.n for t in p.targets)
            u = np.asarray(p.u, dtype=np.complex128)
            if p.diag:
                planes = A.apply_diag(planes, u, row, 2 * self.n)
                planes = A.apply_diag(planes, np.conj(u), col, 2 * self.n)
            else:
                planes = A.apply_gate(planes, u, row, 2 * self.n)
                planes = A.apply_gate(planes, np.conj(u), col, 2 * self.n)
        self.planes = planes
        return self

    def apply_channel(self, kraus, targets) -> "DensityMatrix":
        """rho -> sum_i K_i rho K_i^dag for Kraus operators on ``targets``
        (a qubit index or tuple). Each K_i is a (2^k, 2^k) matrix."""
        if isinstance(targets, int):
            targets = (targets,)
        row = tuple(targets)
        col = tuple(t + self.n for t in targets)
        acc = None
        for k in kraus:
            k = np.asarray(k, dtype=np.complex128)
            term = A.apply_gate(self.planes, k, row, 2 * self.n)
            term = A.apply_gate(term, np.conj(k), col, 2 * self.n)
            acc = term if acc is None else _add(acc, term)
        self.planes = acc
        return self

    # -- readout ------------------------------------------------------------

    def probs(self) -> np.ndarray:
        """(2^n,) computational-basis probabilities (the diagonal)."""
        return np.asarray(jax.device_get(_diag_probs(self.planes, self.n)))

    def trace(self) -> float:
        return float(_trace(self.planes, self.n))

    def purity(self) -> float:
        """Tr(rho^2) — 1.0 iff pure. (The vectorized norm squared.)"""
        return float(_purity(self.planes))

    def expectation(self, pauli: str) -> float:
        """Tr(P rho): apply P to the row side, sum the diagonal."""
        from ..ops.measure import _check_pauli

        return float(_tr_pauli(_check_pauli(pauli, self.n), self.n)(
            self.planes))

    def expectation_sum(self, terms) -> float:
        return float(sum(c * self.expectation(p) for c, p in terms))

    def sample(self, shots: int, key=None) -> dict[str, int]:
        """Non-destructive computational-basis shot sampling from the
        diagonal: {big-endian bitstring: count}."""
        if key is None:
            key = jax.random.PRNGKey(0)
        p = np.clip(self.probs().astype(np.float64), 0.0, None)
        p /= p.sum()
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        idx = np.random.default_rng(seed).choice(p.size, size=shots, p=p)
        vals, counts = np.unique(idx, return_counts=True)
        return {format(int(v), f"0{self.n}b"): int(c)
                for v, c in zip(vals, counts)}

    def prob_one(self, q: int) -> float:
        """Born probability that measuring qubit q yields 1."""
        d = self.probs()
        idx = np.arange(1 << self.n)
        mask = (idx >> (self.n - 1 - q)) & 1
        return float(d[mask == 1].sum())

    def reset(self, q: int) -> "DensityMatrix":
        """Project qubit q onto |0> and renormalize by the trace — the
        reference's reset semantics (projection WITHOUT a Born draw,
        src/Qubism/QASM/Simulation.hs:146-156)."""
        proj = np.array([1.0, 0.0], dtype=complex)
        self.planes = A.apply_diag(self.planes, proj, (q,), 2 * self.n)
        self.planes = A.apply_diag(self.planes, proj, (q + self.n,),
                                   2 * self.n)
        tr = self.trace()
        self.planes = _scale(self.planes, np.float32(0.0 if tr == 0
                                                     else 1.0 / tr))
        return self

    def measure_qubit(self, q: int, key):
        """Sample qubit q, project rho, renormalize by the trace.
        Returns (outcome, key')."""
        p1 = self.prob_one(q)
        key, sub = jax.random.split(key)
        # honor the reference sqrt-Born quirk exactly like the dense /
        # trajectory engines, so --reference-compat keeps DensityProgram
        # and TrajectoryProgram sampling the same branch distribution
        thr = math.sqrt(max(p1, 0.0)) if config.reference_sqrt_born else p1
        outcome = int(float(jax.random.uniform(sub)) < thr)
        proj = np.array([1.0 - outcome, float(outcome)], dtype=complex)
        self.planes = A.apply_diag(self.planes, proj, (q,), 2 * self.n)
        self.planes = A.apply_diag(self.planes, proj, (q + self.n,),
                                   2 * self.n)
        tr = self.trace()
        self.planes = _scale(self.planes, np.float32(0.0 if tr == 0
                                                     else 1.0 / tr))
        return outcome, key
