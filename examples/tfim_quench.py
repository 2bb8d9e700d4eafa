"""Quench dynamics under the transverse-field Ising model.

Prepare |0...0> (all spins up), switch on the critical TFIM
H = -J sum Z Z - h sum X at t=0, and watch the order parameter
<Z_0>(t) collapse while the Trotterized evolution conserves <H>.

The whole pipeline is the framework's normal compiled path: Trotter
steps become fused diagonal-ladder + 1q-layer passes, and each recorded
point is one Pauli-sum reduction. The reference simulator has no notion
of Hamiltonians or time evolution at all.

Run:  python examples/tfim_quench.py [n]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from qubism_tpu.core.statevec import StateVec
from qubism_tpu.models.dynamics import evolve_observed
from qubism_tpu.models.hamiltonians import tfim


def main(n: int = 12) -> None:
    terms, _ = tfim(n, j=1.0, h=1.0)  # critical point
    mag = [(1.0 / n, "I" * q + "Z" + "I" * (n - 1 - q)) for q in range(n)]

    times, values, _ = evolve_observed(
        StateVec.zero(n), terms,
        observables=[mag, terms],  # mean magnetization and the energy
        t=2.0, steps=128, record_every=16)

    print(f"TFIM quench, n={n}, J=h=1 (critical), strang dt={2.0 / 128}")
    print(f"{'t':>6} {'<m_z>':>9} {'<H>':>10}")
    for t, (m, e) in zip(times, values):
        print(f"{t:6.3f} {m:9.5f} {e:10.5f}")

    drift = max(abs(values[i][1] - values[0][1]) for i in range(len(times)))
    print(f"energy drift (Trotter + f32): {drift:.2e}")
    assert values[-1][0] < 0.8, "magnetization should decay after the quench"
    assert drift < 0.05


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
