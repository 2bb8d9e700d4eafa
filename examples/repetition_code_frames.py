"""Logical error rate of a bit-flip repetition-code memory, via Pauli frames.

The use case the frame executor (qubism_tpu/stabilizer/frames.py) exists
for: estimating logical error rates needs MANY noisy shots of a Clifford
circuit, and each shot is only a (2n)-bit frame — so sweeping distances
and physical error rates over tens of thousands of trajectories is
interactive even on CPU.

The experiment is the textbook code-capacity memory: |0...0> IS the
logical zero of the distance-d repetition code, each round of "idle"
gates (U(0,0,0) — identity, but a gate, so the --noise model attaches a
bit-flip site to it) exposes every data qubit to iid X errors, and the
final readout is majority-voted. Expected: logical rate ~ C(d, ceil(d/2))
p^{ceil(d/2)} — d=3 goes like 3p^2, and larger d suppresses errors
below threshold, which the printed sweep shows directly.

(Noising the CNOT fan-out *encoder* instead is also physical but
uninteresting: an early X on the control copies to every target, a
correlated error majority vote cannot fix — real codes fight this
with repeated syndrome extraction, which ALSO rides frames now:
examples/qec_memory.py runs the r-round measure-and-reset memory on
the mid-circuit frame executor.)

Run: python examples/repetition_code_frames.py            (CPU: seconds)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from qubism_tpu import StabilizerTrajectoryProgram  # noqa: E402
from qubism_tpu.qasm.parser import parse_openqasm  # noqa: E402


def memory_program(d: int, p: float) -> StabilizerTrajectoryProgram:
    lines = [f"qreg q[{d}]; creg c[{d}];"]
    lines += [f"U(0, 0, 0) q[{k}];" for k in range(d)]     # one idle round
    lines += ["measure q -> c;"]
    return StabilizerTrajectoryProgram(
        parse_openqasm("<rep>", "\n".join(lines)), noise=f"bitflip:{p}")


def logical_error_rate(d: int, p: float, shots: int = 40000,
                       seed: int = 0) -> float:
    prog = memory_program(d, p)
    bits = prog.run_vals(shots, seed=seed)["c"]
    assert prog.used_frames, "final-measure circuit should ride frames"
    decoded = bits.sum(axis=1) > d // 2          # majority vote
    return float(decoded.mean())


if __name__ == "__main__":
    print(f"{'p':>8} {'d=3':>10} {'d=5':>10} {'d=7':>10}   (3p^2 for d=3)")
    for p in (0.01, 0.02, 0.05, 0.1):
        rates = [logical_error_rate(d, p) for d in (3, 5, 7)]
        print(f"{p:>8} " + " ".join(f"{r:>10.5f}" for r in rates)
              + f"   {3 * p * p:>10.5f}")
