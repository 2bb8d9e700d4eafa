"""Repetition-code memory on the Pauli-frame executor — runnable demo.

Sweeps the physical error rate through the pseudo-threshold of a
distance-d repetition code under phenomenological bit-flip noise and
compares the measured logical error rate (4096 frame trajectories per
point — ONE lax.scan each, even at hundreds of qubits) with the
closed-form law. Run:

    python examples/qec_memory.py [d] [rounds]

The reference's errorCorrection.qasm is a single 3-qubit round of
exactly this code; this is the scaled TPU-native version of that
example's physics (see qubism_tpu/models/qec.py).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from qubism_tpu.models.qec import repetition_logical_rate, repetition_memory


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ntraj = 4096
    print(f"distance-{d} repetition code ({2 * d - 1} qubits), "
          f"{rounds} rounds, {ntraj} trajectories/point")
    print(f"{'p_phys':>8} {'p_log measured':>15} {'p_log analytic':>15}")
    for p in (0.01, 0.05, 0.1, 0.2, 0.3, 0.4):
        res = repetition_memory(d, rounds, p, ntraj, seed=7)
        assert res.syndrome_consistent
        print(f"{p:8.2f} {res.logical_rate:15.4f} "
              f"{repetition_logical_rate(d, rounds, p):15.4f}")
    print("below ~0.5/round the code SUPPRESSES errors; the two columns "
          "must track each other (5-sigma gates in tests/test_qec.py)")


if __name__ == "__main__":
    main()
