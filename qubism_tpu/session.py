"""Stateful DSL session: the Python mirror of the reference's
``StateT (StateVec n) m`` computations (examples/Teleportation.hs:20-29).

The Haskell DSL threads a state vector and an ambient RNG through a monad;
here a :class:`Session` owns a StateVec and a JAX PRNG key and mutates them
in place, so circuits with mid-circuit measurement and classical
feed-forward read naturally:

    import qubism_tpu as qt

    s = qt.Session(qt.mk_state_vec(3), seed=0)
    s.gate(qt.cnot(0, 1, n=3))
    c0 = s.measure_qubit(0)
    s.gate(qt.if_bit(c0, qt.on_just(2, qt.pauli_z(), 3)))
"""

from __future__ import annotations

import jax

from .core.creg import CReg
from .core.gates import Gate
from .core.statevec import StateVec


class Session:
    """Owns a state vector and a PRNG key; applies gates and measurements."""

    def __init__(self, sv: StateVec, seed: int | None = None, key: jax.Array | None = None):
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        self.sv = sv
        self.key = key

    @property
    def n(self) -> int:
        return self.sv.n

    def gate(self, g: Gate) -> "Session":
        """Apply a gate (reference ``gate``, QGate.hs:83-84)."""
        self.sv = g(self.sv)
        return self

    def measure_qubit(self, i: int) -> int:
        """Sample qubit i, collapse the state, return the classical bit."""
        b, self.sv, self.key = self.sv.measure_qubit(i, self.key)
        return b

    def measure(self) -> CReg:
        """Measure all qubits sequentially (reference ``measure``)."""
        cr, self.sv, self.key = self.sv.measure(self.key)
        return cr

    def expectation(self, pauli: str) -> float:
        """<psi|P|psi> for a Pauli string (non-destructive)."""
        return self.sv.expectation(pauli)

    def expectation_sum(self, terms) -> float:
        """<psi| sum_j c_j P_j |psi> for ``[(coef, pauli), ...]`` — a whole
        Hamiltonian in one device dispatch (non-destructive)."""
        return self.sv.expectation_sum(terms)

    def state(self) -> StateVec:
        return self.sv
