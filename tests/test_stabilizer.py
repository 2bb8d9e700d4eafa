"""Stabilizer (Clifford tableau) backend tests.

Differential against the dense state-vector engine (which is itself
golden-tested against analytic states): random Clifford circuits must
agree on every Pauli expectation, on measurement determinism/probability,
and on post-measurement states. Plus scaling smoke tests far beyond any
dense engine's reach, and the QASM program path with feed-forward.
"""

import numpy as np
import pytest

import qubism_tpu as qt
from qubism_tpu.core.gates import Prim
from qubism_tpu.core.statevec import StateVec
from qubism_tpu.ops import apply as _apply
from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.stabilizer import (NotCliffordError, StabilizerProgram,
                                   StabilizerSim, clifford_tables)

_H = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)
_X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
_Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
_Z = np.diag([1.0, -1.0]).astype(np.complex128)
_S = np.diag([1.0, 1j]).astype(np.complex128)
_SDG = np.diag([1.0, -1j]).astype(np.complex128)
_CX = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
               dtype=np.complex128)
_CZ = np.diag([1.0, 1.0, 1.0, -1.0]).astype(np.complex128)
_SWAP = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                 dtype=np.complex128)

_ONE_Q = [_H, _X, _Y, _Z, _S, _SDG]
_TWO_Q = [_CX, _CZ, _SWAP]


def _random_clifford_prims(n, depth, rng):
    prims = []
    for _ in range(depth):
        if n >= 2 and rng.random() < 0.4:
            a, b = rng.choice(n, size=2, replace=False)
            prims.append(Prim(_TWO_Q[rng.integers(len(_TWO_Q))],
                              (int(a), int(b))))
        else:
            q = int(rng.integers(n))
            prims.append(Prim(_ONE_Q[rng.integers(len(_ONE_Q))], (q,)))
    return prims


def _dense_state(n, prims):
    sv = StateVec.zero(n)
    planes = sv.planes
    for p in prims:
        if p.diag:
            planes = _apply.apply_diag(planes, p.u, p.targets, n)
        else:
            planes = _apply.apply_gate(planes, p.u, p.targets, n)
    return StateVec(n, planes)


def _random_pauli(n, rng):
    return "".join(rng.choice(list("IXYZ")) for _ in range(n))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_clifford_expectations_match_dense(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 6))
    prims = _random_clifford_prims(n, 40, rng)
    sv = _dense_state(n, prims)
    sim = StabilizerSim(n).apply(prims)
    for _ in range(25):
        p = _random_pauli(n, rng)
        want = sv.expectation(p)
        got = sim.expectation(p)
        assert got == pytest.approx(want, abs=1e-5), (p, got, want)


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_measurement_probability_and_collapse_match_dense(seed):
    rng = np.random.default_rng(seed)
    n = 4
    prims = _random_clifford_prims(n, 30, rng)
    sv = _dense_state(n, prims)
    for q in range(n):
        p1 = sv.prob_one(q)
        sim = StabilizerSim(n, seed=seed).apply(prims)
        out = sim.measure_qubit(q)
        if p1 < 1e-6:
            assert out == 0
        elif p1 > 1 - 1e-6:
            assert out == 1
        else:
            # random outcome: p must be exactly 1/2 for stabilizer states
            assert p1 == pytest.approx(0.5, abs=1e-5)
        # post-measurement state must agree with the dense engine
        # collapsed to the SAME outcome
        sv_post = sv.collapse(q, out)
        for _ in range(10):
            pauli = _random_pauli(n, rng)
            assert sim.expectation(pauli) == pytest.approx(
                sv_post.expectation(pauli), abs=1e-5), pauli


def test_sequential_register_measurement_matches_dense_distribution():
    # GHZ(3): sampling must give only 000 / 111, ~50/50
    prims = [Prim(_H, (0,)), Prim(_CX, (0, 1)), Prim(_CX, (1, 2))]
    sim = StabilizerSim(3, seed=0).apply(prims)
    bits = sim.sample(400)
    assert bits.shape == (400, 3)
    same = (bits == bits[:, :1]).all(axis=1)
    assert same.all()
    ones = bits[:, 0].mean()
    assert 0.4 < ones < 0.6


def test_plus_state_sampling_is_uniform():
    n = 3
    sim = StabilizerSim(n, seed=1).apply([Prim(_H, (q,)) for q in range(n)])
    bits = sim.sample(800)
    idx = (bits * (1 << np.arange(n - 1, -1, -1))).sum(axis=1)
    counts = np.bincount(idx, minlength=8)
    # chi^2 with 7 dof; 99.9th percentile ~ 24.3
    chi2 = (((counts - 100.0) ** 2) / 100.0).sum()
    assert chi2 < 24.3, counts


@pytest.mark.parametrize("seed", [12, 13, 14])
def test_affine_sampler_matches_dense_distribution(seed):
    """The GF(2)-affine shot sampler must reproduce the dense engine's
    full-register Born distribution (chi^2 over all 2^n bins)."""
    rng = np.random.default_rng(seed)
    n = 4
    prims = _random_clifford_prims(n, 35, rng)
    sv = _dense_state(n, prims)
    probs = np.abs(sv.amps) ** 2
    sim = StabilizerSim(n, seed=seed).apply(prims)
    shots = 2000
    bits = sim.sample(shots)
    idx = (bits.astype(np.int64) * (1 << np.arange(n - 1, -1, -1))).sum(axis=1)
    counts = np.bincount(idx, minlength=1 << n)
    # impossible outcomes must never appear
    assert (counts[probs < 1e-9] == 0).all()
    live = probs > 1e-9
    expected = probs[live] * shots
    chi2 = (((counts[live] - expected) ** 2) / expected).sum()
    dof = live.sum() - 1
    # 99.9th percentile of chi^2_k is ~ k + 3.1*sqrt(2k) + 4
    assert chi2 < dof + 3.1 * np.sqrt(2 * dof) + 4, (chi2, dof, counts)


def test_affine_sampler_after_collapse_respects_outcome():
    # measure q0 of GHZ(4), then every sample must agree with the outcome
    prims = [Prim(_H, (0,))] + [Prim(_CX, (q, q + 1)) for q in range(3)]
    sim = StabilizerSim(4, seed=7).apply(prims)
    out = sim.measure_qubit(0)
    bits = sim.sample(200)
    assert (bits == out).all()


def test_sample_8192_shots_at_1000_qubits():
    n = 1000
    prims = [Prim(_H, (0,))] + [Prim(_CX, (q, q + 1)) for q in range(n - 1)]
    sim = StabilizerSim(n, seed=0).apply(prims)
    bits = sim.sample(8192)
    assert bits.shape == (8192, n)
    same = (bits == bits[:, :1]).all(axis=1)
    assert same.all()
    frac = bits[:, 0].mean()
    assert 0.45 < frac < 0.55


def test_measure_qubits_scan_path_matches_semantics():
    # >2 qubits routes through the one-dispatch scan; GHZ outcomes must
    # still be perfectly correlated and the collapse persistent
    prims = [Prim(_H, (0,))] + [Prim(_CX, (q, q + 1)) for q in range(4)]
    sim = StabilizerSim(5, seed=9).apply(prims)
    outs = sim.measure_qubits(range(5))
    assert len(set(outs)) == 1
    assert sim.measure_qubit(3) == outs[0]


def test_measure_qubit_idempotent():
    rng = np.random.default_rng(11)
    prims = _random_clifford_prims(4, 25, rng)
    sim = StabilizerSim(4, seed=3).apply(prims)
    first = sim.measure_qubit(2)
    for _ in range(5):
        assert sim.measure_qubit(2) == first


def test_reset_projects_to_zero():
    sim = StabilizerSim(2, seed=0).apply([Prim(_H, (0,)), Prim(_CX, (0, 1))])
    sim.reset(0)
    assert sim.expectation("ZI") == pytest.approx(1.0)
    assert sim.measure_qubit(0) == 0


def test_non_clifford_rejected_with_clear_error():
    t = np.diag([1.0, np.exp(1j * np.pi / 4)]).astype(np.complex128)
    with pytest.raises(NotCliffordError, match="stabilizer backend supports"):
        StabilizerSim(1).apply([Prim(t, (0,))])
    # non-unitary is also rejected
    with pytest.raises(NotCliffordError):
        clifford_tables(np.array([[1, 1], [0, 1]], dtype=np.complex128))


def test_diag_prims_supported():
    # CZ as a diagonal prim (the elaborator's preferred encoding)
    sim = StabilizerSim(2).apply([
        Prim(_H, (0,)), Prim(_H, (1,)),
        Prim(np.array([1, 1, 1, -1], dtype=np.complex128), (0, 1), diag=True),
    ])
    assert sim.expectation("XZ") == pytest.approx(1.0)
    assert sim.expectation("ZX") == pytest.approx(1.0)


def test_ghz_1000_qubits_scales():
    n = 1000
    prims = [Prim(_H, (0,))] + [Prim(_CX, (q, q + 1)) for q in range(n - 1)]
    sim = StabilizerSim(n, seed=0).apply(prims)
    assert sim.expectation("Z" * n) == pytest.approx(1.0)
    assert sim.expectation("X" * n) == pytest.approx(1.0)
    assert sim.expectation("Z" + "I" * (n - 1)) == pytest.approx(0.0)
    bits = sim.sample(8)
    same = (bits == bits[:, :1]).all(axis=1)
    assert same.all()


def test_stabilizer_strings_readable():
    sim = StabilizerSim(2).apply([Prim(_H, (0,)), Prim(_CX, (0, 1))])
    assert sim.stabilizers() == ["+XX", "+ZZ"]
    sim.apply([Prim(_Z, (0,))])
    assert sim.stabilizers() == ["-XX", "+ZZ"]


# -- QASM program path --------------------------------------------------------

def _parse(src):
    return parse_openqasm("<test>", src)


def test_qasm_bell_with_feedforward():
    src = """
    qreg q[2]; creg c[2];
    U(pi/2, 0, pi) q[0];
    CX q[0], q[1];
    measure q[0] -> c[0];
    if (c == 1) CX q[0], q[1];
    if (c == 1) U(pi, 0, pi) q[0];
    measure q -> c;
    """
    for seed in range(6):
        prog = StabilizerProgram(_parse(src))
        sim, cregs = prog.run(seed=seed)
        # after correction both qubits are |0> whenever c0 was 1; when c0
        # was 0 the state was already |00>
        assert cregs["c"].to_natural() == 0


def test_qasm_teleportation_of_plus_state():
    """Clifford teleportation: |+> on q[0] teleported to q[2] (the bundled
    teleportation.qasm opens with a non-Clifford u3 tomography rotation, so
    this inline variant teleports a stabilizer state instead)."""
    src = """
    qreg q[3]; creg c0[1]; creg c1[1];
    U(pi/2, 0, pi) q[0];                      // the state to teleport: |+>
    U(pi/2, 0, pi) q[1]; CX q[1], q[2];      // Bell pair
    CX q[0], q[1]; U(pi/2, 0, pi) q[0];
    measure q[0] -> c0[0];
    measure q[1] -> c1[0];
    if (c0 == 1) U(0, 0, pi) q[2];           // Z correction
    if (c1 == 1) U(pi, 0, pi) q[2];          // X correction
    """
    for seed in (0, 1, 2, 3):
        prog = StabilizerProgram(_parse(src))
        sim, cregs = prog.run(seed=seed)
        # q[2] now holds |+>: <X> = +1 regardless of the measured bits
        assert sim.expectation("IIX") == pytest.approx(1.0)


def test_qasm_non_clifford_raises():
    src = "qreg q[1]; U(pi/4, 0, 0) q[0];"
    with pytest.raises(NotCliffordError):
        StabilizerProgram(_parse(src)).run()


def test_qasm_dump_prints_stabilizers():
    src = "qreg q[2]; U(pi/2,0,pi) q[0]; CX q[0],q[1]; :dump;"
    chunks = []
    prog = StabilizerProgram(_parse(src))
    prog.run(dump_writer=chunks.append)
    text = "".join(chunks)
    assert "+XX" in text and "+ZZ" in text


def test_seeded_runs_reproducible():
    rng = np.random.default_rng(21)
    prims = _random_clifford_prims(5, 30, rng)

    def run():
        sim = StabilizerSim(5, seed=42).apply(prims)
        return [sim.measure_qubit(q) for q in range(5)]

    assert run() == run()


# -- noisy Clifford trajectories (stabilizer/noise.py) ------------------------


def _traj_ast(src):
    from qubism_tpu.qasm.parser import parse_openqasm

    return parse_openqasm("<t>", src)


def test_stab_trajectories_deterministic():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[2]; creg c[2];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """))
    bits = prog.run_vals(16, seed=0)["c"]
    assert (bits[:, 0] == 1).all() and (bits[:, 1] == 0).all()


def test_stab_trajectories_bitflip_rate():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.25
    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """), noise=f"bitflip:{p}")
    bits = prog.run_vals(4096, seed=1)["c"][:, 0]
    sigma = np.sqrt(p * (1 - p) / 4096)
    assert abs(float((bits == 0).mean()) - p) < 5 * sigma


def test_stab_trajectories_match_exact_density():
    """GHZ-2 + depolarizing: tableau-trajectory marginals against the
    exact vectorized DensityMatrix (same noise model and placement)."""
    from qubism_tpu.run.noisy import DensityProgram
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.15
    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """
    rho, _ = DensityProgram(_traj_ast(src.replace("measure q -> c;", "")),
                            noise=f"depolarizing:{p}").run(seed=0)
    exact = np.asarray(rho.probs())
    ntraj = 8192
    bits = StabilizerTrajectoryProgram(_traj_ast(src),
                                       noise=f"depolarizing:{p}").run_vals(
        ntraj, seed=2)["c"]
    idx = 2 * bits[:, 0] + bits[:, 1]
    got = np.bincount(idx, minlength=4) / ntraj
    assert np.all(np.abs(got - exact)
                  < 5 * np.sqrt(exact * (1 - exact) / ntraj) + 1e-3)


def test_stab_trajectories_feed_forward_and_reset():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[2]; creg c[1]; creg d[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        measure q[0] -> c[0];
        if (c == 0) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """))
    vals = prog.run_vals(128, seed=3)
    c, d = vals["c"][:, 0], vals["d"][:, 0]
    assert (d == 1 - c).all()
    assert 0 < c.mean() < 1
    prog2 = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[1]; creg c[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        reset q[0];
        measure q -> c;
    """))
    assert (prog2.run_vals(64, seed=4)["c"] == 0).all()


def test_stab_trajectories_wide_creg_ghz():
    """60-qubit noisy GHZ: creg bits stay exact past any packed-integer
    width; every noiseless trajectory is perfectly correlated."""
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    n = 60
    lines = [f"qreg q[{n}]; creg c[{n}];",
             "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
    lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n - 1)]
    lines += ["measure q -> c;"]
    prog = StabilizerTrajectoryProgram(_traj_ast("\n".join(lines)))
    bits = prog.run_vals(32, seed=5)["c"]
    assert bits.shape == (32, n)
    assert (bits == bits[:, :1]).all()
    assert 0 < bits[:, 0].mean() < 1


def test_stab_trajectories_reject_non_pauli():
    import pytest as _pytest

    from qubism_tpu.stabilizer.noise import (NotPauliChannelError,
                                             pauli_channel_cdfs)

    with _pytest.raises(NotPauliChannelError, match="not a Pauli channel"):
        pauli_channel_cdfs("ad:0.1")
    cdfs, cdfs2 = pauli_channel_cdfs("depolarizing:0.3,bitflip:0.1,dep2:0.2")
    assert cdfs.shape == (2, 4) and cdfs2.shape == (1, 16)
    assert np.allclose(cdfs[:, -1], 1.0)
    assert np.allclose(cdfs2[:, -1], 1.0)


# -- Pauli-frame fast path (stabilizer/frames.py) -----------------------------


def test_frames_used_for_final_measure_only():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[2]; creg c[2];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """), noise="bitflip:0.0")
    bits = prog.run_vals(32, seed=0)["c"]
    assert prog.used_frames
    assert (bits[:, 0] == 1).all() and (bits[:, 1] == 0).all()


def test_frames_bitflip_rate():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.25
    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """), noise=f"bitflip:{p}")
    bits = prog.run_vals(8192, seed=1)["c"][:, 0]
    assert prog.used_frames
    sigma = np.sqrt(p * (1 - p) / 8192)
    assert abs(float((bits == 0).mean()) - p) < 5 * sigma


def test_frames_match_tableau_distribution():
    """Frames and exact vmapped tableaux sample the same distribution
    (GHZ-3 + depolarizing): compare 8-bin histograms."""
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    src = """
        qreg q[3]; creg c[3];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1]; CX q[1], q[2];
        measure q -> c;
    """
    p = 0.1
    ntraj = 8192
    fr = StabilizerTrajectoryProgram(_traj_ast(src), noise=f"dep:{p}")
    fb = fr.run_vals(ntraj, seed=2)["c"]
    assert fr.used_frames
    tb = StabilizerTrajectoryProgram(_traj_ast(src), noise=f"dep:{p}")
    tb._frame_plan = lambda: None         # force the exact tableau path
    tb._frame_plan_midcircuit = lambda: None
    tbits = tb.run_vals(ntraj, seed=3)["c"]
    assert not tb.used_frames
    fi = (fb * (1 << np.arange(3))).sum(axis=1)
    ti = (tbits * (1 << np.arange(3))).sum(axis=1)
    fh = np.bincount(fi, minlength=8) / ntraj
    th = np.bincount(ti, minlength=8) / ntraj
    assert np.all(np.abs(fh - th)
                  < 5 * np.sqrt(np.maximum(th * (1 - th), 1e-4) / ntraj)
                  + 2e-2)


def test_frames_fall_back_on_mid_circuit():
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    prog = StabilizerTrajectoryProgram(_traj_ast("""
        qreg q[2]; creg c[1]; creg d[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        measure q[0] -> c[0];
        if (c == 0) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """))
    vals = prog.run_vals(64, seed=4)
    assert not prog.used_frames
    assert (vals["d"][:, 0] == 1 - vals["c"][:, 0]).all()


def test_frames_scale_smoke():
    """300-qubit noisy GHZ, 2048 trajectories: the regime where vmapped
    tableaux (~n^2 bits each) stop being practical."""
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    n = 300
    lines = [f"qreg q[{n}]; creg c[{n}];",
             "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
    lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n - 1)]
    lines += ["measure q -> c;"]
    prog = StabilizerTrajectoryProgram(_traj_ast("\n".join(lines)),
                                       noise="depolarizing:0.001")
    bits = prog.run_vals(2048, seed=5)["c"]
    assert prog.used_frames
    clean = float((bits == bits[:, :1]).all(axis=1).mean())
    # 599 sites; Z invisible in Z basis: clean ~ (1 - 2p/3)^599 ~ 0.67
    assert 0.5 < clean < 0.85
    assert 0 < bits[:, 0].mean() < 1


def test_frames_expectation_matches_density():
    from qubism_tpu.run.noisy import DensityProgram
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.1
    src = """
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """
    rho, _ = DensityProgram(_traj_ast(src), noise=f"depolarizing:{p}").run(
        seed=0)
    prog = StabilizerTrajectoryProgram(_traj_ast(src), noise=f"dep:{p}")
    for pauli in ("ZZ", "XX", "ZI"):
        mean, se = prog.expectation(pauli, 8192, seed=7)
        assert prog.used_frames
        exact = rho.expectation(pauli)
        assert abs(mean - exact) < 5 * se + 1e-3, (pauli, mean, exact)
    # a measuring program cannot use frames for expectation (post-collapse)
    prog2 = StabilizerTrajectoryProgram(_traj_ast(
        src + "creg c[2]; measure q -> c;"), noise=f"dep:{p}")
    mean, se = prog2.expectation("ZZ", 256, seed=8)
    assert not prog2.used_frames
    assert abs(mean) <= 1.0


def test_frames_expectation_sum_matches_density():
    from qubism_tpu.run.noisy import DensityProgram
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.1
    src = """
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """
    terms = [(1.0, "ZZ"), (0.5, "XX"), (-0.25, "II")]
    rho, _ = DensityProgram(_traj_ast(src), noise=f"depolarizing:{p}").run(
        seed=0)
    exact = rho.expectation_sum(terms)
    prog = StabilizerTrajectoryProgram(_traj_ast(src), noise=f"dep:{p}")
    mean, se = prog.expectation_sum(terms, 8192, seed=9)
    assert prog.used_frames
    assert abs(mean - exact) < 5 * se + 1e-3, (mean, exact)


@pytest.mark.parametrize("seed", [21, 22])
def test_frames_fuzz_random_clifford_vs_tableau(seed):
    """Random Clifford circuit + depolarizing noise: the frame executor
    and the exact vmapped-tableau path must sample the same joint
    distribution (chi^2-style bound per bin)."""
    from qubism_tpu.core.gates import Gate
    from qubism_tpu.models.circuits import prims_qasm
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    import os

    rng = np.random.default_rng(seed)
    n = 4
    prims = _random_clifford_prims(n, 30, rng)
    src = prims_qasm(n, prims)
    src += "creg c[4];\nmeasure q -> c;\n"
    examples = os.path.join(os.path.dirname(__file__), "..", "examples")
    ast = parse_openqasm(os.path.join(examples, "<fuzz>"), src)
    ntraj = 4096
    fr = StabilizerTrajectoryProgram(ast, noise="dep:0.08")
    fbits = fr.run_vals(ntraj, seed=seed)["c"]
    assert fr.used_frames
    tb = StabilizerTrajectoryProgram(ast, noise="dep:0.08")
    tb._frame_plan = lambda: None
    tbits = tb.run_vals(ntraj, seed=seed + 100)["c"]
    fh = np.bincount((fbits * (1 << np.arange(n))).sum(axis=1),
                     minlength=1 << n) / ntraj
    th = np.bincount((tbits * (1 << np.arange(n))).sum(axis=1),
                     minlength=1 << n) / ntraj
    assert np.all(np.abs(fh - th)
                  < 5 * np.sqrt(np.maximum(th * (1 - th), 1e-4) / ntraj)
                  + 2e-2)


def test_repetition_code_example_scaling():
    """examples/repetition_code_frames.py: the d=3 logical rate at
    p=0.05 must match the ~3p^2 code-capacity prediction and beat d=5."""
    import runpy

    mod = runpy.run_path("examples/repetition_code_frames.py")
    r3 = mod["logical_error_rate"](3, 0.05, shots=40000)
    r5 = mod["logical_error_rate"](5, 0.05, shots=40000)
    assert abs(r3 - 3 * 0.05 ** 2) < 0.003
    assert r5 < r3


def test_frames_expectations_batch_matches_singles():
    from qubism_tpu import StabilizerTrajectoryProgram

    src = """
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """
    prog = StabilizerTrajectoryProgram(_traj_ast(src), noise="dep:0.1")
    batch = prog.expectations(["ZZ", "XX", "ZI"], 4096, seed=7)
    assert prog.used_frames
    for pauli, (bm, bs) in zip(("ZZ", "XX", "ZI"), batch):
        sm, ss = prog.expectation(pauli, 4096, seed=7)
        assert abs(bm - sm) < 5 * (bs + ss) + 1e-3


def test_det_outcomes_batch_matches_sequential_measure():
    """The batched deterministic readout (three MXU matmuls — the
    mod-4 phase linearizes because 2*popcount(a^b) == 2*popcount(a) +
    2*popcount(b) mod 4) must agree with the sequential det branch of
    _measure_impl on random Clifford tableaux, qubit by qubit."""
    import jax.numpy as jnp

    from qubism_tpu.stabilizer import tableau as tb

    rng = np.random.default_rng(11)
    h = (1 / np.sqrt(2)) * np.array([[1, 1], [1, -1]], dtype=complex)
    s_g = np.diag([1, 1j]).astype(complex)
    cx = np.eye(4, dtype=complex)[[0, 1, 3, 2]]
    cz = np.diag([1, 1, 1, -1]).astype(complex)
    checked = 0
    for _ in range(12):
        n = int(rng.integers(3, 12))
        tab = tb.identity_tableau(n)
        prims = []
        for _ in range(40):
            r = rng.integers(0, 4)
            if r == 0:
                prims.append(Prim(h, (int(rng.integers(n)),)))
            elif r == 1:
                prims.append(Prim(s_g, (int(rng.integers(n)),)))
            else:
                a, b = rng.choice(n, 2, replace=False)
                prims.append(Prim(cx if r == 2 else cz, (int(a), int(b))))
        tab = tb.apply_prims(tab, prims)
        xn = np.asarray(tab.x)[n:]
        det_qs = [q for q in range(n)
                  if not ((xn[:, q >> 5] >> (q & 31)) & 1).any()]
        if not det_qs:
            continue
        qs = jnp.asarray(np.asarray(det_qs, np.uint32))
        anyr, outs = tb._det_outcomes_impl(tab.x, tab.z, tab.s, qs, n)
        assert not bool(anyr)
        for q, got in zip(det_qs, np.asarray(outs)):
            ref, _, _, _ = tb._measure_impl(
                tab.x, tab.z, tab.s, jnp.uint32(q), jnp.asarray(False), n)
            assert int(got) == int(ref)
            checked += 1
    assert checked > 20     # the sweep actually exercised outcomes


def test_det_outcomes_batch_flags_random_qubits():
    import jax.numpy as jnp

    from qubism_tpu.stabilizer import tableau as tb

    h = (1 / np.sqrt(2)) * np.array([[1, 1], [1, -1]], dtype=complex)
    tab = tb.apply_prims(tb.identity_tableau(2), [Prim(h, (0,))])
    anyr, _ = tb._det_outcomes_impl(
        tab.x, tab.z, tab.s, jnp.asarray(np.asarray([0], np.uint32)), 2)
    assert bool(anyr)       # H|0> measurement is random -> caller falls back


def test_frame_layering_packs_qec_round_into_few_layers():
    """The repetition-code round (ids; two disjoint CX fans; measure;
    reset) must pack into ~5 layers/round, not one row per prim."""
    from qubism_tpu.models.qec import _CX, _FrameProg, _I2
    from qubism_tpu.run.compiler import EvGates, EvMeasure, EvReset
    from qubism_tpu.stabilizer.frames import _build_layers

    d = 11
    n = 2 * d - 1
    events = []
    for _ in range(2):
        events.append(EvGates(tuple(Prim(_I2, (q,)) for q in range(d))))
        events.append(EvGates(tuple(Prim(_CX, (i, d + i))
                                    for i in range(d - 1))))
        events.append(EvGates(tuple(Prim(_CX, (i + 1, d + i))
                                    for i in range(d - 1))))
        events.append(EvMeasure(tuple(range(d, n)), (("s", None, d - 1),)))
        events.append(EvReset(tuple(range(d, n))))
    events.append(EvMeasure(tuple(range(d)), (("m", None, d),)))
    layers, meas_slots, rows = _build_layers(events, n,
                                             identity_noise_only=True)
    assert len(layers) == 2 * 5 + 1
    assert len(meas_slots) == 2 * (d - 1) + d
    assert rows == 2 * (d + 2 * (d - 1) + 2 * (d - 1)) + d


def test_gf2_mbits_identity_and_cx():
    from qubism_tpu.stabilizer.frames import _IDENT_MBITS, _gf2_mbits

    assert _gf2_mbits(np.eye(4, dtype=np.complex128)) == _IDENT_MBITS
    cx = np.eye(4, dtype=np.complex128)[[0, 1, 3, 2]]
    mb = _gf2_mbits(cx)
    # CX frame action (control=slot0, target=slot1): x1' = x1^x0,
    # z0' = z0^z1, x0/z1 unchanged
    m = np.array([[(mb >> (i * 4 + j)) & 1 for j in range(4)]
                  for i in range(4)])
    want = np.array([[1, 0, 0, 0],
                     [0, 1, 0, 1],
                     [1, 0, 1, 0],
                     [0, 0, 0, 1]])
    assert (m == want).all()
