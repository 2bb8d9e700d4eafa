"""Open-system dynamics: a driven, decaying qubit three ways.

The damped Rabi problem — H = (Omega/2) X driving |1> <-> |0| while
amplitude damping (jump operator sigma-, rate gamma) pulls population
to |0> — solved with every open-system surface in the framework, all
agreeing:

1. **Exact master equation** (`lindblad_evolve`): Strang-split into
   exact CPTP factors on the vectorized density engine.
2. **MCWF trajectories** (`lindblad_mcwf`): the same Strang step
   unraveled into pure-state trajectories, one vmapped device program —
   the route past the 2^2n density wall.
3. **Dense Liouvillian expm**: the 4x4 oracle, exact to machine
   precision at this size.

Also checks the two closed-form laws the integrator must reproduce:
pure T1 decay exp(-gamma t) and Ramsey coherence decay exp(-2 gamma t)
under dephasing.

Run: python examples/lindblad_rabi.py          (CPU: ~30 s)
"""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from qubism_tpu.core.density import DensityMatrix  # noqa: E402
from qubism_tpu.core.gates import Prim  # noqa: E402
from qubism_tpu.models.dynamics import (  # noqa: E402
    _expm, lindblad_evolve, lindblad_mcwf)

SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)
H2 = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)


def liouvillian(h, collapse):
    d = h.shape[0]
    eye = np.eye(d, dtype=complex)
    sup = -1j * (np.kron(h, eye) - np.kron(eye, h.T))
    for rate, L in collapse:
        ldl = L.conj().T @ L
        sup += rate * (np.kron(L, np.conj(L)) - 0.5 * np.kron(ldl, eye)
                       - 0.5 * np.kron(eye, ldl.T))
    return sup


def main():
    omega, gamma, t = 3.0, 0.6, 2.0
    h_terms = [(omega / 2.0, "X")]

    # 3. dense oracle
    rho0 = np.diag([0.0, 1.0]).astype(complex)  # |1><1|
    sup = liouvillian((omega / 2.0) * X, [(gamma, SM)])
    z_oracle = float(np.real(np.trace(
        Z @ (_expm(sup * t) @ rho0.reshape(-1)).reshape(2, 2))))

    # 1. exact master equation on the density engine
    rho = DensityMatrix(1).apply(Prim(X, (0,)))
    _, vals = lindblad_evolve(rho, h_terms, [(gamma, SM, 0)], t,
                              steps=200, observables=["Z"])
    z_exact = float(vals[-1][0])

    # 2. MCWF trajectories of the same generator
    _, est = lindblad_mcwf(1, [Prim(X, (0,))], h_terms,
                           [(gamma, SM, 0)], t, steps=200, ntraj=2000,
                           observables=["Z"], seed=7)
    z_mcwf, se = est[0]

    print(f"damped Rabi <Z>(t={t}):  oracle {z_oracle:+.5f}")
    print(f"  density engine (200 Strang steps)   {z_exact:+.5f}  "
          f"|err| = {abs(z_exact - z_oracle):.2e}")
    print(f"  MCWF (2000 trajectories)            {z_mcwf:+.5f} "
          f"+- {se:.4f}")
    assert abs(z_exact - z_oracle) < 1e-3
    assert abs(z_mcwf - z_oracle) < 4 * se + 0.01

    # closed-form laws
    rho = DensityMatrix(1).apply(Prim(X, (0,)))
    lindblad_evolve(rho, [], [(gamma, SM, 0)], t, steps=3)
    p1 = rho.prob_one(0)
    print(f"T1 decay:    P(1) = {p1:.5f}  "
          f"(law {math.exp(-gamma * t):.5f})")
    assert abs(p1 - math.exp(-gamma * t)) < 1e-5

    rho = DensityMatrix(1).apply(Prim(H2, (0,)))
    lindblad_evolve(rho, [], [(0.4, Z, 0)], 1.0, steps=3)
    x = rho.expectation("X")
    print(f"Ramsey decay: <X> = {x:.5f}  (law {math.exp(-0.8):.5f})")
    assert abs(x - math.exp(-0.8)) < 1e-5
    print("All checks passed.")


if __name__ == "__main__":
    main()
