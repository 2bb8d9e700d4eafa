"""Quantum teleportation in the Python circuit DSL.

Mirror of the reference's Haskell DSL example
(examples/Teleportation.hs:20-29): build a Bell pair with combinators,
tensor in Alice's qubit, then run a stateful computation with mid-circuit
measurement and classical feed-forward.

Run:  python examples/teleportation.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import qubism_tpu as qt


def teleport1(alice: qt.StateVec, seed: int = 0) -> qt.StateVec:
    """Teleport a 1-qubit state. Alice's state ends up on qubit 2."""
    # Bell pair: (cnot 0 1 <> onJust 0 hadamard) #> mkStateVec
    pair = (qt.cnot(0, 1, 2) @ qt.on_just(0, qt.hadamard(), 2))(qt.mk_state_vec(2))
    total = alice.tensor(pair)

    s = qt.Session(total, seed=seed)
    s.gate(qt.cnot(0, 1, 3))
    s.gate(qt.on_just(0, qt.hadamard(), 3))
    c0 = s.measure_qubit(0)
    c1 = s.measure_qubit(1)
    s.gate(qt.if_bit(c0, qt.on_just(2, qt.pauli_z(), 3)))
    s.gate(qt.if_bit(c1, qt.on_just(2, qt.pauli_x(), 3)))
    return s.state()


if __name__ == "__main__":
    alice = qt.StateVec.qubit(0.6, 0.8j)
    print("Alice's qubit:")
    print(alice)
    out = teleport1(alice, seed=42)
    print("Total state after teleportation (qubit 2 holds Alice's state):")
    print(out)
    # sanity: the marginal on qubit 2 matches |0.6|^2 / |0.8|^2
    p1 = out.prob_one(2)
    print(f"P(qubit 2 = 1) = {p1:.4f} (expected {0.8 ** 2:.4f})")
    assert abs(p1 - 0.64) < 1e-5
    print("OK")
