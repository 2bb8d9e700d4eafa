"""Per-qubit noise targeting: ``--noise dep:0.01@q[2]+anc``.

The calibrated-device model — every real chip has per-qubit error
rates. A targeted channel fires only on gate qubits in its ``@`` set
(2q channels: only when BOTH gate qubits are in the set). The reference
has no noise story at all (SURVEY.md §5); these tests pin the targeting
semantics identically across the vmapped dense, exact density, fused
dense, and MPS executors.
"""

import numpy as np
import pytest

from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.noisy import (DensityProgram, TrajectoryProgram,
                                  noise_spec_targets, parse_noise_spec,
                                  resolve_noise_targets,
                                  split_channel_target)

PI = "3.141592653589793"


def _ast(src):
    return parse_openqasm(None, src)


X2 = f"""
qreg q[2]; creg c[2];
U({PI},0,{PI}) q[0];
U({PI},0,{PI}) q[1];
measure q -> c;
"""


# -- spec parsing / resolution -------------------------------------------


def test_split_channel_target():
    assert split_channel_target("dep:0.01") == ("dep:0.01", None)
    assert split_channel_target(" dep:0.01 @ q[2]+anc ") == (
        "dep:0.01", "q[2]+anc")
    with pytest.raises(ValueError, match="empty '@' target"):
        split_channel_target("dep:0.01@")


def test_noise_spec_targets_order_and_labels():
    spec = "dep:0.01@q[0],ad:0.05,bf:0.1@anc"
    assert noise_spec_targets(spec) == ["q[0]", None, "anc"]
    labels = [lbl for lbl, _ in parse_noise_spec(spec)]
    assert labels == ["dep:0.01@q[0]", "ad:0.05", "bf:0.1@anc"]


def test_resolve_targets_formats():
    layout, sizes = {"q": 0, "anc": 3}, {"q": 3, "anc": 2}
    r = lambda t: resolve_noise_targets(t, layout, sizes, 5)
    assert r("q[1]") == {1}
    assert r("anc") == {3, 4}
    assert r("4") == {4}
    assert r("q[0]+anc[1]+2") == {0, 4, 2}


@pytest.mark.parametrize("bad,msg", [
    ("nope", "no qreg named"),
    ("q[7]", "out of bounds"),
    ("9", "out of range"),
    ("q[x]", "malformed"),
    ("q[0]++anc", "empty item"),
])
def test_resolve_targets_errors(bad, msg):
    with pytest.raises(ValueError, match=msg):
        resolve_noise_targets(bad, {"q": 0, "anc": 3}, {"q": 3, "anc": 2}, 5)


def test_readout_targeting_rejected():
    with pytest.raises(ValueError, match="readout"):
        TrajectoryProgram(_ast(X2), noise="ro:0.01@q[0]")


# -- dense vmapped + exact density ----------------------------------------


def test_targeted_bitflip_only_hits_its_qubit():
    """bf:1.0@q[0] after X X: qubit 0 flips back deterministically,
    qubit 1 is untouched — on the trajectory AND density engines."""
    vals = TrajectoryProgram(_ast(X2), noise="bitflip:1.0@q[0]").run_vals(
        16, seed=0)
    c = np.asarray(vals["c"])
    assert (c[:, 0] == 0).all() and (c[:, 1] == 1).all()

    rho, _ = DensityProgram(_ast(X2), noise="bitflip:1.0@q[0]").run(seed=0)
    probs = np.asarray(rho.probs())
    assert abs(probs[0b01] - 1.0) < 1e-6  # big-endian |01>: q0=0, q1=1


def test_density_targeted_matches_kraus_oracle():
    """dep:0.2@q[0] on a Bell state == the hand-applied Kraus channel on
    qubit 0 only (after each gate that touches it)."""
    from qubism_tpu.core.density import DensityMatrix, depolarizing

    src = f"""
    qreg q[2];
    U({PI}/2,0,{PI}) q[0];
    CX q[0], q[1];
    """
    rho, _ = DensityProgram(_ast(src), noise="dep:0.2@q[0]").run(seed=0)

    ks = depolarizing(0.2)
    want = DensityMatrix(2)
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    from qubism_tpu.core.gates import Prim
    want.apply([Prim(h, (0,))])
    want.apply_channel(ks, (0,))          # H touches q0
    cx = np.eye(4)[[0, 1, 3, 2]]
    want.apply([Prim(cx, (0, 1))])
    want.apply_channel(ks, (0,))          # CX touches q0 (and q1: excluded)
    np.testing.assert_allclose(np.asarray(rho.matrix()),
                               np.asarray(want.matrix()), atol=1e-6)


def test_trajectory_targeted_matches_density():
    """Targeted mixed spec (dep@q[0] + ad@q[1]): the vmapped trajectory
    mean of P(bit=1) matches the exact density marginals within 4
    sigma."""
    noise = "dep:0.15@q[0],ad:0.3@q[1]"
    rho, _ = DensityProgram(_ast(X2.split("measure")[0]),
                            noise=noise).run(seed=0)
    p_exact = [float(rho.prob_one(q)) for q in range(2)]

    prog = TrajectoryProgram(_ast(X2), noise=noise)
    c = np.asarray(prog.run_vals(1024, seed=3)["c"])
    for q in range(2):
        p_hat = c[:, q].mean()
        sig = max(np.sqrt(p_exact[q] * (1 - p_exact[q]) / 1024), 1e-3)
        assert abs(p_hat - p_exact[q]) < 4 * sig, (q, p_hat, p_exact[q])


def test_dep2_coupler_targeting():
    """dep2:p@q[0]+q[1] fires on CX q[0],q[1] but NOT on CX q[1],q[2]
    (2q channels need BOTH gate qubits in the set)."""
    src = """
    qreg q[3];
    CX q[0], q[1];
    CX q[1], q[2];
    """
    prog = TrajectoryProgram(_ast(src), noise="dep2:0.5@q[0]+q[1]")
    # exactly ONE stochastic noise site: the first CX
    from qubism_tpu.run.traj_fused import FusedTrajectories
    plan = FusedTrajectories(prog)
    assert plan.total_sites == 1
    # and the density engine leaves the state invariant under the
    # second CX's (identity-action) noise: |000> stays diagonal with
    # support only where the FIRST coupler's depolarizing can reach
    rho, _ = DensityProgram(_ast(src), noise="dep2:0.5@q[1]+q[2]").run()
    probs = np.asarray(rho.probs())
    # noise only after CX q[1],q[2]: qubit 0 must remain |0> exactly
    assert probs[4:].sum() < 1e-7


def test_fused_engine_respects_targets():
    """The fused-Pallas trajectory engine builds noise sites only on
    targeted qubits and its outcomes keep untargeted qubits clean."""
    prog = TrajectoryProgram(_ast(X2), noise="bf:0.3@q[0]")
    c = np.asarray(prog.run_vals(256, seed=1, engine="fused")["c"])
    assert (c[:, 1] == 1).all()
    frac = (c[:, 0] == 0).mean()
    assert abs(frac - 0.3) < 4 * np.sqrt(0.3 * 0.7 / 256)


def test_programmatic_three_tuple_entries():
    """noise=[(label, ks, qubits)] targets without a spec string."""
    from qubism_tpu.core.density import bit_flip

    prog = TrajectoryProgram(_ast(X2),
                             noise=[("bf:1.0", bit_flip(1.0), (0,))])
    c = np.asarray(prog.run_vals(8, seed=0)["c"])
    assert (c[:, 0] == 0).all() and (c[:, 1] == 1).all()


# -- mps + stabilizer ------------------------------------------------------


def test_mps_targeted_noise_follows_logical_qubit():
    """bf:1.0@q[2] with a ROUTED gate CX q[0],q[2]: the noise slot must
    land on logical qubit 2 (parked at physical site 1 when slots are
    emitted), not on whatever sits at site 2."""
    from qubism_tpu.mps.noise import MPSTrajectoryProgram

    src = f"""
    qreg q[3]; creg c[3];
    U({PI},0,{PI}) q[1];
    CX q[0], q[2];
    measure q -> c;
    """
    prog = MPSTrajectoryProgram(_ast(src), noise="bf:1.0@q[2]", chi=4)
    c = np.asarray(prog.run_vals(8, seed=0)["c"])
    # noise fires after the X (touches q1: excluded) and after the CX
    # (touches q0 excluded, q2 INCLUDED -> exactly one flip of q2)
    assert (c[:, 0] == 0).all()
    assert (c[:, 1] == 1).all()
    assert (c[:, 2] == 1).all()


def test_mps_targeted_matches_density():
    from qubism_tpu.mps.noise import MPSTrajectoryProgram

    noise = "dep:0.2@q[1]"
    rho, _ = DensityProgram(_ast(X2.split("measure")[0]),
                            noise=noise).run(seed=0)
    p_exact = [float(rho.prob_one(q)) for q in range(2)]
    prog = MPSTrajectoryProgram(_ast(X2), noise=noise, chi=4)
    c = np.asarray(prog.run_vals(1024, seed=5)["c"])
    assert (c[:, 0] == 1).all()   # q0 untargeted: stays |1> exactly
    p_hat = c[:, 1].mean()
    sig = np.sqrt(p_exact[1] * (1 - p_exact[1]) / 1024)
    assert abs(p_hat - p_exact[1]) < 4 * sig


def test_stabilizer_rejects_targeting_clearly():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    with pytest.raises(ValueError, match="not supported on the stabilizer"):
        StabilizerTrajectoryProgram(_ast("qreg q[2];"), noise="bf:0.1@q[0]")


def test_three_tuple_out_of_range_raises():
    """ADVICE r4: programmatic (label, ks, qubits) entries validate qubit
    indices against n — a stale index must error, not silently no-op."""
    from qubism_tpu.core.density import bit_flip

    with pytest.raises(ValueError, match="out of range"):
        TrajectoryProgram(_ast(X2), noise=[("bf:1.0", bit_flip(1.0), (7,))])
    with pytest.raises(ValueError, match="out of range"):
        TrajectoryProgram(_ast(X2), noise=[("bf:1.0", bit_flip(1.0), (-1,))])


def test_noise_round_trip_preserves_targeting():
    """ADVICE r4: prog.noise entries are (label, ks, tset) triples, so
    feeding one program's noise into another keeps the '@' targeting the
    label still displays."""
    p1 = TrajectoryProgram(_ast(X2), noise="bf:1.0@q[0]")
    assert p1.noise[0][2] == frozenset({0})
    p2 = TrajectoryProgram(_ast(X2), noise=p1.noise)
    assert p2._tsets == p1._tsets
    c = np.asarray(p2.run_vals(8, seed=0)["c"])
    # bf:1.0 on q[0] only: the X2 circuit's |11> flips q0 back to 0
    assert (c[:, 0] == 0).all() and (c[:, 1] == 1).all()
