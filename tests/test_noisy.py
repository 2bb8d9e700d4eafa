"""Whole-program trajectories (run/noisy.py): noisy QASM as one vmapped
device program, pinned against analytic channel probabilities and the
exact DensityMatrix."""

import numpy as np
import pytest

from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.noisy import (NOISE_CHANNELS, TrajectoryProgram,
                                  parse_noise_spec)


def _ast(src):
    return parse_openqasm("<test>", src)


def test_noiseless_deterministic():
    prog = TrajectoryProgram(_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];  // x
        measure q -> c;
    """))
    vals = prog.run_vals(32, seed=0)
    assert (vals["c"] == 1).all()


def test_bitflip_probability():
    """bitflip:p after the X flips the readout with probability p."""
    p = 0.3
    prog = TrajectoryProgram(_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """), noise=f"bitflip:{p}")
    ntraj = 4096
    vals = prog.run_vals(ntraj, seed=1)
    frac0 = float((vals["c"] == 0).mean())
    sigma = np.sqrt(p * (1 - p) / ntraj)
    assert abs(frac0 - p) < 5 * sigma


def test_feed_forward_per_trajectory():
    """if (c==1) x q[1]: every trajectory takes its OWN branch; the
    corrected qubit always reads 1."""
    prog = TrajectoryProgram(_ast("""
        qreg q[2]; creg c[1]; creg d[1];
        U(1.2, 0.3, 0.7) q[0];                              // superposition
        measure q[0] -> c[0];
        if (c == 0) U(3.141592653589793, 0, 3.141592653589793) q[1];
        if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];
        if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """))
    # c==0 -> one X (|1>); c==1 -> two X (|0> then |1>... two X = identity)
    vals = prog.run_vals(256, seed=2)
    c, d = vals["c"], vals["d"]
    assert set(np.unique(c)) <= {0, 1}
    assert ((c == 0) <= (d == 1)).all()      # c=0 branch applied one X
    assert ((c == 1) <= (d == 0)).all()      # c=1 branch applied two Xs
    assert 0 < c.mean() < 1                  # both branches actually taken


def test_reset_is_projection():
    prog = TrajectoryProgram(_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        reset q[0];
        measure q -> c;
    """))
    vals = prog.run_vals(16, seed=3)
    assert (vals["c"] == 0).all()


@pytest.mark.slow
def test_entangled_reset_projects_partner_on_every_engine():
    """Reference reset = projection onto |0> (NOT measure-then-flip):
    resetting one half of a Bell pair must leave the ENTANGLED PARTNER
    at |0> in 100% of runs on every engine. Measure-then-flip would
    leave the partner uniform — a 0.0-vs-0.5 divergence."""
    from qubism_tpu import MPSTrajectoryProgram, TrajectoryProgram
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        reset q[0];
        measure q -> c;
    """
    for mk in (lambda a: TrajectoryProgram(a),
               lambda a: StabilizerTrajectoryProgram(a),
               lambda a: MPSTrajectoryProgram(a, chi=4)):
        vals = mk(_ast(src)).run_vals(64, seed=5)
        assert (vals["c"] == 0).all(), mk

    # host-level sims too
    from qubism_tpu.core.gates import Prim
    from qubism_tpu.mps import MPSSim
    from qubism_tpu.stabilizer import StabilizerSim

    h = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                   [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    for k in range(4):
        sim = StabilizerSim(2, seed=k).apply(
            [Prim(h, (0,)), Prim(cx, (0, 1))])
        sim.reset(0)
        assert sim.expectation("IZ") == pytest.approx(1.0)
        m = MPSSim(2, chi=4, seed=k).apply(
            [Prim(h, (0,)), Prim(cx, (0, 1))])
        m.reset(0)
        assert m.prob_one(1) < 1e-6

    # the inexpressible corner: reset of a |1>-CERTAIN qubit (projection
    # would give the zero vector) falls back to the physical X flip on
    # the formalism engines
    x = np.array([[0, 1], [1, 0]], dtype=complex)
    sim = StabilizerSim(1, seed=0).apply([Prim(x, (0,))])
    sim.reset(0)
    assert sim.measure_qubit(0) == 0
    m = MPSSim(1, chi=2, seed=0).apply([Prim(x, (0,))])
    m.reset(0)
    assert m.prob_one(0) < 1e-6


def test_depolarizing_matches_density_matrix():
    """GHZ-2 + depolarizing on every touched qubit: trajectory marginals
    against the exact vectorized DensityMatrix."""
    import qubism_tpu as qt
    from qubism_tpu.core.density import DensityMatrix, depolarizing

    p = 0.15
    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];   // h
        CX q[0], q[1];
        measure q -> c;
    """
    prog = TrajectoryProgram(_ast(src), noise=f"depolarizing:{p}")

    rho = DensityMatrix.from_statevec(qt.mk_state_vec(2))
    ks = depolarizing(p)
    rho = rho.apply(qt.on_just(0, qt.hadamard(), 2).prims)
    rho = rho.apply_channel(ks, (0,))
    rho = rho.apply(qt.cnot(0, 1, 2).prims)
    rho = rho.apply_channel(ks, (0,)).apply_channel(ks, (1,))
    exact = np.asarray(rho.probs())          # big-endian basis order

    ntraj = 8192
    bits = prog.run_vals(ntraj, seed=4)["c"]      # (T, 2) bit columns
    # creg bit k comes from qubit k; basis index is big-endian
    idx = 2 * bits[:, 0] + bits[:, 1]
    got = np.bincount(idx, minlength=4) / ntraj
    assert np.all(np.abs(got - exact) < 5 * np.sqrt(exact * (1 - exact) / ntraj) + 1e-3)


def test_counts_rendering():
    prog = TrajectoryProgram(_ast("""
        qreg q[2]; creg c[2];
        U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q -> c;
    """))
    counts = prog.counts(8, seed=5)
    assert counts == {"c=01": 8}             # LSB-first CReg rendering


def test_parse_noise_spec():
    spec = parse_noise_spec("depolarizing:0.01, ad:0.1")
    assert [s[0] for s in spec] == ["depolarizing:0.01", "ad:0.1"]
    with pytest.raises(ValueError, match="unknown noise channel"):
        parse_noise_spec("nope:0.1")
    with pytest.raises(ValueError, match="needs a parameter"):
        parse_noise_spec("depolarizing")
    assert "depolarizing" in NOISE_CHANNELS


def test_final_states_returned():
    prog = TrajectoryProgram(_ast("""
        qreg q[1]; creg c[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
    """))
    vals, states = prog.run_vals(4, seed=6, return_states=True)
    re, im = states
    amps = np.asarray(re) + 1j * np.asarray(im)
    assert amps.shape == (4, 2)
    assert np.allclose(np.abs(amps) ** 2, 0.5, atol=1e-5)


def test_density_program_matches_trajectories():
    """DensityProgram is the exact counterpart of TrajectoryProgram:
    same noise model, same placement — sampled counts converge to the
    exact diagonal."""
    from qubism_tpu.run.noisy import DensityProgram

    p = 0.1
    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """
    dprog = DensityProgram(_ast(src), noise=f"depolarizing:{p}")
    # exact diagonal BEFORE measurement: rebuild without the measure stmt
    dprog2 = DensityProgram(_ast(src.replace("measure q -> c;", "")),
                            noise=f"depolarizing:{p}")
    rho, _ = dprog2.run(seed=0)
    exact = np.asarray(rho.probs())

    ntraj = 8192
    bits = TrajectoryProgram(_ast(src), noise=f"depolarizing:{p}").run_vals(
        ntraj, seed=1)["c"]
    idx = 2 * bits[:, 0] + bits[:, 1]
    got = np.bincount(idx, minlength=4) / ntraj
    assert np.all(np.abs(got - exact)
                  < 5 * np.sqrt(exact * (1 - exact) / ntraj) + 1e-3)
    # and the measured run writes cregs consistent with one sampled path
    _, cregs = dprog.run(seed=2)
    assert str(cregs["c"]) in {"00", "11", "01", "10"}


def test_density_program_feed_forward():
    from qubism_tpu.run.noisy import DensityProgram

    prog = DensityProgram(_ast("""
        qreg q[2]; creg c[1]; creg d[1];
        U(1.2, 0.3, 0.7) q[0];
        measure q[0] -> c[0];
        if (c == 0) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """))
    for seed in range(4):
        _, cregs = prog.run(seed=seed)
        c, d = cregs["c"].to_natural(), cregs["d"].to_natural()
        assert d == (1 - c)


def test_density_program_reset_and_guard():
    from qubism_tpu.run.noisy import DensityProgram

    prog = DensityProgram(_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        reset q[0];
        measure q -> c;
    """), noise="ad:0.3")
    _, cregs = prog.run(seed=0)
    assert cregs["c"].to_natural() == 0
    with pytest.raises(ValueError, match="4\\^n"):
        DensityProgram(_ast("qreg q[15];"))


# -- Monte-Carlo observables over trajectories --------------------------------


@pytest.mark.parametrize("engine", ["dense", "stabilizer", "mps"])
def test_trajectory_expectation_matches_density(engine):
    """<ZZ>/<XX> on noisy GHZ-2: every trajectory engine's Monte-Carlo
    estimator agrees with the exact density matrix within its stderr."""
    from qubism_tpu.mps.noise import MPSTrajectoryProgram
    from qubism_tpu.run.noisy import DensityProgram
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    p = 0.1
    ast = _ast("""
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """)
    rho, _ = DensityProgram(ast, noise=f"depolarizing:{p}").run(seed=0)
    prog = {
        "dense": lambda: TrajectoryProgram(ast, noise=f"depolarizing:{p}"),
        "stabilizer": lambda: StabilizerTrajectoryProgram(ast,
                                                          noise=f"dep:{p}"),
        "mps": lambda: MPSTrajectoryProgram(ast, noise=f"dep:{p}", chi=4),
    }[engine]()
    for pauli, ntraj in [("ZZ", 4096), ("XX", 2048)]:
        mean, stderr = prog.expectation(pauli, ntraj, seed=7)
        exact = rho.expectation(pauli)
        assert abs(mean - exact) < 5 * stderr + 1e-3, (pauli, mean, exact)
        assert stderr < 0.05


def test_trajectory_expectation_noiseless_exact():
    """Noiseless trajectories with no measurement are deterministic:
    stderr collapses and the mean is the pure-state value."""
    prog = TrajectoryProgram(_ast("""
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """))
    mean, stderr = prog.expectation("ZZ", 64, seed=0)
    assert abs(mean - 1.0) < 1e-5 and stderr < 1e-5
    mean, stderr = prog.expectation("ZI", 64, seed=0)
    assert abs(mean) < 1e-5


def test_trajectory_expectation_feed_forward():
    """Mid-circuit measurement + feed-forward participate in the
    estimator: deterministic teleport-style correction leaves q[1]
    in |1> regardless of the measured branch."""
    prog = TrajectoryProgram(_ast("""
        qreg q[2]; creg c[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        measure q[0] -> c[0];
        if (c == 0) U(3.141592653589793, 0, 3.141592653589793) q[1];
        if (c == 1) CX q[0], q[1];
    """))
    mean, stderr = prog.expectation("IZ", 256, seed=1)
    assert abs(mean - (-1.0)) < 1e-5     # q[1] is |1>: <Z> = -1


def test_trajectory_expectation_sum():
    """<H> for a Pauli sum reduces per trajectory (term correlations in
    the stderr); noiseless GHZ-2: <ZZ + 0.5 XX - II> = 0.5."""
    prog = TrajectoryProgram(_ast("""
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """))
    mean, stderr = prog.expectation_sum(
        [(1.0, "ZZ"), (0.5, "XX"), (-1.0, "II")], 64, seed=0)
    assert abs(mean - 0.5) < 1e-5 and stderr < 1e-5


def test_readout_error_all_engines():
    """ro:p flips each REPORTED bit with probability p while the state
    collapses on the true outcome — identical semantics on the dense,
    stabilizer (frames + tableau) and MPS trajectory engines."""
    from qubism_tpu import (MPSTrajectoryProgram,
                            StabilizerTrajectoryProgram, TrajectoryProgram)

    p = 0.25
    ast = _ast("qreg q[2]; creg c[2];\nmeasure q -> c;")   # state stays |00>
    sigma = np.sqrt(p * (1 - p) / 4096)
    for prog in (TrajectoryProgram(ast, noise=f"ro:{p}"),
                 MPSTrajectoryProgram(ast, noise=f"ro:{p}", chi=2),
                 StabilizerTrajectoryProgram(ast, noise=f"readout:{p}")):
        bits = prog.run_vals(4096, seed=1)["c"]
        assert np.all(np.abs(bits.mean(axis=0) - p) < 5 * sigma), type(prog)
    # mid-circuit (tableau fallback): feed-forward keys off the REPORTED bit
    mid = _ast("""
        qreg q[1]; creg c[1]; creg d[1];
        measure q[0] -> c[0];
        if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q[0] -> d[0];
    """)
    prog = StabilizerTrajectoryProgram(mid, noise=f"ro:{p}")
    v = prog.run_vals(4096, seed=3)
    assert not prog.used_frames
    # true outcome of the 2nd measure = c (X applied iff c reported 1),
    # then reported d flips again with p: P(d=1) = c*(1-p) + (1-c)*p ...
    c, d = v["c"][:, 0], v["d"][:, 0]
    agree = float((d == c).mean())           # = (1-p) in expectation
    assert abs(agree - (1 - p)) < 5 * sigma
    # spec composes with quantum channels and strips cleanly
    tp = TrajectoryProgram(ast, noise=f"dep:0.1,ro:{p}")
    assert len(tp.noise) == 1 and tp.readout_p == p


def test_readout_error_density_rejected():
    from qubism_tpu.run.noisy import DensityProgram

    with pytest.raises(ValueError, match="readout"):
        DensityProgram(_ast("qreg q[1];"), noise="ro:0.1")


def test_readout_error_per_write_on_frames():
    """A qubit measured by two merged statements must get INDEPENDENT
    reported flips on the frame path (regression: one flip per qubit
    made the two creg bits perfectly correlated)."""
    from qubism_tpu import StabilizerTrajectoryProgram

    p = 0.25
    prog = StabilizerTrajectoryProgram(_ast("""
        qreg q[1]; creg c[1]; creg d[1];
        measure q[0] -> c[0];
        measure q[0] -> d[0];
    """), noise=f"ro:{p}")
    v = prog.run_vals(8192, seed=0)
    assert prog.used_frames
    diff = float((v["c"][:, 0] != v["d"][:, 0]).mean())
    want = 2 * p * (1 - p)
    assert abs(diff - want) < 5 * np.sqrt(want * (1 - want) / 8192)


def test_new_engines_seed_reproducible():
    """Same seed -> bit-identical outcomes on every new executor
    (frames, tableau fallback, MPS trajectories) — the reproducibility
    the reference never had (SURVEY §5 RNG row)."""
    from qubism_tpu import (MPSTrajectoryProgram,
                            StabilizerTrajectoryProgram)

    src = """
        qreg q[3]; creg c[3];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1]; CX q[1], q[2];
        measure q -> c;
    """
    mid = src + "if (c == 7) U(3.141592653589793, 0, 3.141592653589793) q[0];"
    for make in (
        lambda: StabilizerTrajectoryProgram(_ast(src), noise="dep:0.05"),
        lambda: StabilizerTrajectoryProgram(_ast(mid), noise="dep:0.05"),
        lambda: MPSTrajectoryProgram(_ast(src), noise="bf:0.05,ro:0.02",
                                     chi=4),
    ):
        a = make().run_vals(256, seed=5)["c"]
        b = make().run_vals(256, seed=5)["c"]
        assert (a == b).all(), type(make()).__name__


def test_dep2_all_engines_match_density():
    """Two-qubit depolarizing (dep2: applied after every 2q gate, one
    JOINT 16-outcome draw) pinned against the exact density matrix on
    every trajectory executor: dense, Pauli frames, tableau fallback,
    MPS."""
    from qubism_tpu import (MPSTrajectoryProgram,
                            StabilizerTrajectoryProgram, TrajectoryProgram)
    from qubism_tpu.run.noisy import DensityProgram

    p = 0.3
    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """
    rho, _ = DensityProgram(_ast(src.replace("measure q -> c;", "")),
                            noise=f"dep2:{p}").run(seed=0)
    exact = np.asarray(rho.probs())
    ntraj = 8192
    progs = [
        TrajectoryProgram(_ast(src), noise=f"dep2:{p}"),
        StabilizerTrajectoryProgram(_ast(src), noise=f"dep2:{p}"),
        MPSTrajectoryProgram(_ast(src), noise=f"dep2:{p}", chi=4),
        StabilizerTrajectoryProgram(          # tableau fallback
            _ast(src + "if (c == 0) U(0,0,0) q[0];"), noise=f"dep2:{p}"),
    ]
    for prog in progs:
        bits = prog.run_vals(ntraj, seed=2)["c"]
        idx = 2 * bits[:, 0] + bits[:, 1]
        got = np.bincount(idx, minlength=4) / ntraj
        assert np.all(np.abs(got - exact)
                      < 5 * np.sqrt(exact * (1 - exact) / ntraj) + 1e-3), (
            type(prog).__name__, got, exact)
    assert progs[1].used_frames and not progs[3].used_frames
    # dep2 never fires on 1q-gate-only circuits
    only1q = TrajectoryProgram(_ast("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """), noise="dep2:0.5")
    assert (only1q.run_vals(256, seed=0)["c"][:, 0] == 1).all()


def test_channel_order_matches_density():
    """Non-commuting channel mixes compose in SPEC ORDER on every
    engine. Amplitude damping is non-unital, so ``dep2,ad`` and
    ``ad,dep2`` are DIFFERENT channels (the exact distributions differ
    by >4% here); the sampled engines must track the density matrix for
    both orders, not a fixed internal ordering."""
    from qubism_tpu import MPSTrajectoryProgram, TrajectoryProgram
    from qubism_tpu.run.noisy import DensityProgram

    src = """
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """
    ast_m, ast_p = _ast(src), _ast(src.replace("measure q -> c;", ""))
    ntraj = 8192

    def emp(prog):
        bits = prog.run_vals(ntraj, seed=2)["c"]
        return np.bincount(2 * bits[:, 0] + bits[:, 1],
                           minlength=4) / ntraj

    def exact(spec):
        rho, _ = DensityProgram(ast_p, noise=spec).run(seed=0)
        return np.asarray(rho.probs())

    cases = [("dense", "dep2:0.3,ad:0.3", "ad:0.3,dep2:0.3",
              lambda s: TrajectoryProgram(ast_m, noise=s)),
             ("mps", "dep:0.1,ad:0.3", "ad:0.3,dep:0.1",
              lambda s: MPSTrajectoryProgram(ast_m, noise=s, chi=4))]
    for name, s1, s2, mk in cases:
        e1, e2 = exact(s1), exact(s2)
        assert np.abs(e1 - e2).max() > 0.04, (name, e1, e2)  # order matters
        for spec, ex in ((s1, e1), (s2, e2)):
            got = emp(mk(spec))
            tol = 5 * np.sqrt(ex * (1 - ex) / ntraj) + 1e-3
            assert np.all(np.abs(got - ex) < tol), (name, spec, got, ex)


def test_unitary_mix_fast_path_selected():
    """Pauli channels (state-independent branch probabilities) ride the
    one-application mixed-unitary fast path; amplitude damping keeps the
    state-dependent Kraus path."""
    from qubism_tpu import TrajectoryProgram

    src = "qreg q[1]; creg c[1]; U(0,0,0) q[0]; measure q -> c;"
    kinds = [variants[0][0] for variants, _ in
             TrajectoryProgram(_ast(src), noise="dep:0.1,ad:0.1,bf:0.2,"
                                                "dep2:0.3")._kchans]
    assert kinds == ["umix", "kraus", "umix", "umix"]


@pytest.mark.slow
def test_dep2_descending_targets():
    """2q channels fire on gates written with DESCENDING targets too
    (`CX q[2], q[0]` at row-qubit n): the dense applier needs ascending
    targets, so the executor picks the SWAP-conjugated channel variant.
    Regression: this crashed at trace time with a reshape error."""
    from qubism_tpu import TrajectoryProgram
    from qubism_tpu.run.noisy import DensityProgram

    src = """
        qreg q[10]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[2];
        CX q[2], q[0];
        measure q[0] -> c[0]; measure q[2] -> c[1];
    """
    ntraj = 4096
    bits = TrajectoryProgram(_ast(src), noise="dep2:0.2,ad:0.1").run_vals(
        ntraj, seed=3)["c"]
    got = np.bincount(2 * bits[:, 0] + bits[:, 1], minlength=4) / ntraj
    rho, _ = DensityProgram(
        _ast(src.replace("measure q[0] -> c[0]; measure q[2] -> c[1];",
                         "")), noise="dep2:0.2,ad:0.1").run(seed=0)
    probs = np.asarray(rho.probs()).reshape([2] * 10)
    # c maps LSB-first: c bit0 = q[0] (MSB axis 0), c bit1 = q[2]
    ex = probs.sum(axis=tuple(i for i in range(10) if i not in (0, 2)))
    ex = np.array([ex[0, 0], ex[0, 1], ex[1, 0], ex[1, 1]])
    tol = 5 * np.sqrt(ex * (1 - ex) / ntraj) + 1e-3
    assert np.all(np.abs(got - ex) < tol), (got, ex)


# -- mesh-sharded trajectory batches -----------------------------------------
# Trajectories are embarrassingly parallel: --mesh D in trajectory mode
# shards the vmapped BATCH axis over devices (run/noisy.py:
# resolve_traj_mesh) — no amplitude sharding, no collectives. Results must
# be BIT-IDENTICAL to the unsharded run with the same seed: sharding only
# places lanes, and jax.random.split(key, n) is prefix-stable in n, so the
# padding keys (batch rounded up to a device multiple) never change the
# first ntraj outcomes.


def test_mesh_run_vals_bit_identical():
    src = """
        qreg q[2]; creg c[1]; creg d[1];
        U(1.2, 0.3, 0.7) q[0];
        CX q[0], q[1];
        measure q[0] -> c[0];
        if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """
    a = TrajectoryProgram(_ast(src), noise="dep:0.05,ro:0.02")
    b = TrajectoryProgram(_ast(src), noise="dep:0.05,ro:0.02")
    va = a.run_vals(10, seed=5)                    # 10 % 8 != 0: pad path
    vb = b.run_vals(10, seed=5, mesh=8)
    for c in va:
        assert (va[c] == vb[c]).all()


def test_mesh_estimators_bit_identical():
    src = """
        qreg q[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """
    a = TrajectoryProgram(_ast(src), noise="dep:0.1")
    b = TrajectoryProgram(_ast(src), noise="dep:0.1")
    ea = a.expectation_sum([(0.5, "ZZ"), (0.25, "XX")], 24, seed=3)
    eb = b.expectation_sum([(0.5, "ZZ"), (0.25, "XX")], 24, seed=3, mesh=8)
    assert ea == eb
    pa = a.expectations(["ZZ", "XI"], 24, seed=4)
    pb = b.expectations(["ZZ", "XI"], 24, seed=4, mesh=8)
    assert pa == pb


@pytest.mark.slow
def test_mesh_stabilizer_and_mps_engines():
    from qubism_tpu import MPSTrajectoryProgram, StabilizerTrajectoryProgram

    # mid-circuit feed-forward forces the vmapped-tableau path (frames
    # would ignore the mesh; here the sharded fallback must match)
    src = """
        qreg q[2]; creg c[1]; creg d[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        measure q[0] -> c[0];
        if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];
        measure q[1] -> d[0];
    """
    for mk in (lambda: StabilizerTrajectoryProgram(_ast(src),
                                                   noise="dep:0.05"),
               lambda: MPSTrajectoryProgram(_ast(src), noise="dep:0.05",
                                            chi=4)):
        a, b = mk(), mk()
        va = a.run_vals(12, seed=7)
        vb = b.run_vals(12, seed=7, mesh=8)
        for c in va:
            assert (va[c] == vb[c]).all(), type(a).__name__
        assert not getattr(a, "used_frames", False)


def test_mesh_errors():
    from qubism_tpu.run.noisy import resolve_traj_mesh

    with pytest.raises(ValueError, match="device"):
        resolve_traj_mesh(4096)
    assert resolve_traj_mesh(None) is None
    assert resolve_traj_mesh(1) is None


def test_t1_t2_example_recovers_gamma():
    """examples/t1_t2_characterization.py: the log-linear fit over the
    Monte-Carlo trajectory curves recovers the true damping parameter
    (self-asserting main, run on fewer points here for speed)."""
    import runpy

    mod = runpy.run_path("examples/t1_t2_characterization.py")
    ks = [0, 4, 12]
    rows = mod["decay_curve"]("U(3.141592653589793, 0, 3.141592653589793) "
                              "q[0];", "Z", "ad:0.1", ks, ntraj=2048)
    for k, (mean, err, exact) in zip(ks, rows):
        assert abs(mean - exact) < 5 * err + 1e-3
        assert abs(exact - (1.0 - 2.0 * 0.9 ** (k + 1))) < 1e-5
    g = mod["fit_gamma"](ks, [(1 - m) / 2 for m, _, _ in rows], 1.0)
    assert abs(g - 0.1) < 0.02


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.slow
def test_fuzz_noisy_engines_vs_density(seed):
    """Randomized differential across the sampled noise executors: a
    random non-Clifford circuit (u3 + CX, DESCENDING targets included)
    with a random ordered channel mix from {dep, bf, pf, ad, pd, dep2}
    — the dense and MPS trajectory engines must both converge to the
    exact DensityProgram distribution (binomial 5-sigma + slack per
    basis state)."""
    from qubism_tpu import MPSTrajectoryProgram
    from qubism_tpu.run.noisy import DensityProgram

    rng = np.random.default_rng(seed + 77)
    n = 3
    lines = [f"qreg q[{n}]; creg c[{n}];"]
    for _ in range(8):
        if rng.random() < 0.45:
            a, b = rng.choice(n, size=2, replace=False)
            lines.append(f"CX q[{a}], q[{b}];")
        else:
            th, ph, la = (float(v) for v in rng.uniform(0, 2 * np.pi, 3))
            lines.append(f"U({th}, {ph}, {la}) q[{rng.integers(n)}];")
    body = "\n".join(lines)
    chans = list(rng.choice(["dep", "bf", "pf", "ad", "pd", "dep2"],
                            size=rng.integers(2, 4), replace=False))
    spec = ",".join(f"{c}:{rng.uniform(0.05, 0.2):.3f}" for c in chans)

    rho, _ = DensityProgram(_ast(body), noise=spec).run(seed=0)
    exact = np.asarray(rho.probs())          # big-endian basis order

    src = body + "\nmeasure q -> c;"
    ntraj = 8192
    weights = 1 << (n - 1 - np.arange(n))    # creg bit k = qubit k (MSB 0)
    tol = 5 * np.sqrt(np.maximum(exact * (1 - exact), 1e-4) / ntraj) + 3e-3
    for mk in (lambda a: TrajectoryProgram(a, noise=spec),
               lambda a: MPSTrajectoryProgram(a, noise=spec, chi=8)):
        bits = mk(_ast(src)).run_vals(ntraj, seed=seed)["c"]
        got = np.bincount((bits * weights).sum(axis=1),
                          minlength=1 << n) / ntraj
        assert np.all(np.abs(got - exact) < tol), (spec, body, got, exact)
