"""VQE on the reduced 2-qubit H2 Hamiltonian — differentiable-simulation
demo (no reference analogue; the Haskell engine has no autodiff story).

The Hamiltonian uses the O'Malley et al. (2016) coefficients at the
equilibrium bond length. The ENTIRE optimization — 300 steps of
value-and-grad through the state evolution plus the Adam update — is one
jit-compiled ``lax.scan`` device program.

Run from the repo root:  python examples/vqe_h2.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from qubism_tpu.models import energy_fn, hea_ansatz, vqe_minimize

TERMS = [(0.3435, "ZI"), (-0.4347, "IZ"), (0.5716, "ZZ"),
         (0.0910, "XX"), (0.0910, "YY")]
CONST = -0.4804


def dense_ground_energy():
    paulis = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
              "Y": np.array([[0, -1j], [1j, 0]]),
              "Z": np.array([[1, 0], [0, -1]])}
    h = np.zeros((4, 4), dtype=complex)
    for coef, p in TERMS:
        h += coef * np.kron(paulis[p[0]], paulis[p[1]])
    return float(np.linalg.eigvalsh(h).min()) + CONST


def main():
    ansatz = hea_ansatz(2, layers=2)
    rng = np.random.default_rng(0)
    theta0 = rng.uniform(-0.3, 0.3, ansatz.num_params).astype(np.float32)

    theta, history = vqe_minimize(ansatz, TERMS, theta0, steps=300,
                                  constant=CONST)
    final = float(energy_fn(ansatz, TERMS, constant=CONST)(theta))

    print(f"initial energy : {float(history[0]):+.6f} Ha")
    print(f"VQE energy     : {final:+.6f} Ha")
    print(f"exact ground   : {dense_ground_energy():+.6f} Ha")


if __name__ == "__main__":
    main()
