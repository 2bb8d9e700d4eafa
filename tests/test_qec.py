"""Mid-circuit Pauli-frame executor + repetition-code memory (VERDICT r4
item 5): the Stim-style frame scan (measure rows read the frame's X bit
and randomize Z; reset rows clear X and randomize Z; frames INITIALIZE
with random Z — arXiv:2103.02202 §4) must reproduce the exact vmapped
tableau engine's distributions, and the phenomenological repetition-code
memory must match its closed-form logical error law."""

import numpy as np
import pytest

from qubism_tpu.models.qec import (repetition_logical_rate,
                                   repetition_memory)
from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.noisy import TrajectoryProgram
from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

H_GATE = "U(1.5707963267948966, 0, 3.141592653589793)"


def _ast(src):
    return parse_openqasm("<test>", src)


MIDCIRCUIT = f"""qreg q[3]; creg c[1]; creg m[3];
{H_GATE} q[0];
CX q[0], q[1];
measure q[1] -> c[0];
reset q[1];
CX q[0], q[2];
measure q -> m;
"""


def test_midcircuit_rides_frames_and_matches_exact_marginals():
    sp = StabilizerTrajectoryProgram(_ast(MIDCIRCUIT), noise="bf:0.05")
    out = sp.run_vals(6000, seed=0)
    assert sp.used_frames
    exact = TrajectoryProgram.run_vals(
        StabilizerTrajectoryProgram(_ast(MIDCIRCUIT), noise="bf:0.05"),
        6000, seed=1)
    for reg in ("c", "m"):
        pa = out[reg].mean(axis=0)
        pb = exact[reg].mean(axis=0)
        assert (np.abs(pa - pb) < 0.03).all(), (reg, pa, pb)
    # joint statistics, not just marginals: the pre-reset q1 outcome and
    # the final q0 outcome are perfectly correlated up to noise flips
    agree = (out["c"][:, 0] == out["m"][:, 0]).mean()
    agree_e = (exact["c"][:, 0] == exact["m"][:, 0]).mean()
    assert abs(agree - agree_e) < 0.03


def test_midcircuit_nondeterministic_outcomes_decorrelate():
    """The random-Z frame init is load-bearing: a Bell measurement must
    be a fair coin ACROSS trajectories even though all share one clean
    reference record."""
    src = (f"qreg q[2]; creg c[1];\n{H_GATE} q[0];\nCX q[0], q[1];\n"
           "measure q[0] -> c[0];\nreset q[0];\n"
           "measure q[0] -> c[0];\n")
    sp = StabilizerTrajectoryProgram(_ast(src), noise="bf:0.01")
    out = sp.run_vals(4096, seed=0)
    assert sp.used_frames
    # second measurement overwrote c[0] with the freshly-reset qubit:
    # ~0 up to one bf site on... no gate touches q0 after reset -> 0
    assert out["c"].mean() < 0.01
    # marginal of the FIRST measurement: re-run without the overwrite
    src1 = (f"qreg q[2]; creg c[1];\n{H_GATE} q[0];\nCX q[0], q[1];\n"
            "measure q[0] -> c[0];\n")
    sp1 = StabilizerTrajectoryProgram(_ast(src1), noise="bf:0.0")
    out1 = sp1.run_vals(4096, seed=0)
    m = out1["c"].mean()
    assert abs(m - 0.5) < 4 * 0.5 / 64  # 4 sigma at 4096 shots


def test_feed_forward_still_exact_path():
    src = (f"qreg q[2]; creg c[1]; creg d[1];\n{H_GATE} q[0];\n"
           "measure q[0] -> c[0];\n"
           "if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];\n"
           "measure q[1] -> d[0];\n")
    sp = StabilizerTrajectoryProgram(_ast(src), noise="bf:0.02")
    out = sp.run_vals(512, seed=0)
    assert not sp.used_frames
    # feed-forward correctness: d mirrors c up to noise
    agree = (out["c"][:, 0] == out["d"][:, 0]).mean()
    assert agree > 0.9


def test_reset_of_superposed_qubit_falls_back():
    """Projection-reset of an unmeasured superposed qubit is reference
    semantics the frame executor cannot represent — exact path."""
    src = (f"qreg q[1]; creg c[1];\n{H_GATE} q[0];\nreset q[0];\n"
           "measure q[0] -> c[0];\n")
    sp = StabilizerTrajectoryProgram(_ast(src), noise="bf:0.0")
    out = sp.run_vals(64, seed=0)
    assert not sp.used_frames
    assert out["c"].sum() == 0  # projection to |0>


@pytest.mark.parametrize("d,rounds,p", [(3, 4, 0.08), (5, 3, 0.1),
                                        (7, 2, 0.12)])
def test_repetition_memory_matches_analytic_law(d, rounds, p):
    ntraj = 4000
    res = repetition_memory(d, rounds, p, ntraj, seed=2)
    assert res.syndrome_consistent
    sig = (res.analytic * (1 - res.analytic) / ntraj) ** 0.5
    assert abs(res.logical_rate - res.analytic) < 4 * sig + 0.005, (
        res.logical_rate, res.analytic)


def test_repetition_memory_noiseless_is_silent():
    res = repetition_memory(3, 3, 0.0, 64, seed=4)
    assert res.logical_rate == 0.0
    assert res.data.sum() == 0
    assert all(s.sum() == 0 for s in res.syndromes)
    assert res.syndrome_consistent


def test_repetition_memory_validates_args():
    with pytest.raises(ValueError, match="odd d"):
        repetition_memory(4, 2, 0.1, 8)
    with pytest.raises(ValueError, match="rounds"):
        repetition_memory(3, 0, 0.1, 8)


def test_logical_rate_monotone_in_rounds():
    rates = [repetition_logical_rate(5, r, 0.05) for r in (1, 2, 4, 8)]
    assert all(a < b for a, b in zip(rates, rates[1:]))
    assert rates[0] == pytest.approx(
        sum(__import__("math").comb(5, k) * 0.05 ** k * 0.95 ** (5 - k)
            for k in (3, 4, 5)))


def test_memory_scales_to_1000_qubits():
    """The executor's reason to exist: a 1001-qubit (d=501) memory, one
    frame scan for all trajectories. Smoke-scale here (CI is CPU);
    bench.py carries the 4096-trajectory timing."""
    res = repetition_memory(501, 2, 0.001, 64, seed=5)
    assert res.syndrome_consistent
    assert res.logical_rate < 0.05
