"""Fused-Pallas trajectory engine (run/traj_fused.py): structure-stable
realized-noise execution must match the vmapped engine statistically, the
DensityMatrix oracle exactly on deterministic channels, and refuse programs
that need in-trace stochastics."""

import numpy as np
import pytest

from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.noisy import DensityProgram, TrajectoryProgram
from qubism_tpu.run.traj_fused import FusedTrajectories, FusedUnsupported

X = np.array([[0, 1], [1, 0]], dtype=complex)

PI = 3.141592653589793
H_GATE = f"U(1.5707963267948966, 0, {PI})"
X_GATE = f"U({PI}, 0, {PI})"


def parse(src):
    return parse_openqasm("<test>", src)


def ghz_src(n):
    lines = [f"qreg q[{n}]; creg c[{n}];", f"{H_GATE} q[0];"]
    lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n - 1)]
    lines += ["measure q -> c;"]
    return "\n".join(lines)


def test_noiseless_ghz_matches_born():
    tp = TrajectoryProgram(parse(ghz_src(6)))
    bits = FusedTrajectories(tp).run_vals(400, seed=3)["c"]
    assert (bits == bits[:, :1]).all()          # perfect GHZ correlations
    frac = bits[:, 0].mean()
    assert abs(frac - 0.5) < 4 * (0.25 / 400) ** 0.5


def test_deterministic_forced_x_matches_density():
    # a single-Kraus "always X" channel is a deterministic unitary mixture:
    # the fused engine's realized stream must match the exact density
    # matrix oracle bit for bit
    src = (f"qreg q[3]; creg c[3];\n{X_GATE} q[0];\nCX q[0], q[1];\n"
           "measure q -> c;")
    noise = [("x!", [X])]
    bits = FusedTrajectories(
        TrajectoryProgram(parse(src), noise=noise)).run_vals(16, seed=0)["c"]
    assert (bits == bits[0]).all()  # deterministic
    dp = DensityProgram(parse(src), noise=noise)
    _, cregs = dp.run(seed=0)
    want = [int(b) for b in str(cregs["c"])]
    # CReg __str__ prints bit 0 first (LSB-first, reference CReg.hs:24-25)
    assert list(bits[0]) == want


def test_fused_matches_vmap_statistically():
    n, T = 6, 1500
    tp1 = TrajectoryProgram(parse(ghz_src(n)), noise="depolarizing:0.05")
    tp2 = TrajectoryProgram(parse(ghz_src(n)), noise="depolarizing:0.05")
    fused = FusedTrajectories(tp1).run_vals(T, seed=1)["c"]
    vmap = tp2.run_vals(T, seed=2)["c"]
    cf, cv = [(b == b[:, :1]).all(axis=1).mean() for b in (fused, vmap)]
    # both estimate the same clean-GHZ probability; 4-sigma two-sample gate
    sig = (cf * (1 - cf) / T + cv * (1 - cv) / T) ** 0.5
    assert abs(cf - cv) < 4 * max(sig, 1e-3), (cf, cv)
    # per-bit means agree too
    mf, mv = fused.mean(axis=0), vmap.mean(axis=0)
    assert np.abs(mf - mv).max() < 4 * (0.25 / T) ** 0.5 + 0.02


def test_straddling_and_descending_cx():
    # CX with descending targets exercises the SWAP-conjugated 2q-channel
    # variant; targets far apart exercise the row/lane straddle kernel
    n = 10
    src = (f"qreg q[{n}]; creg c[{n}];\n{X_GATE} q[8];\n"
           "CX q[8], q[2];\n"          # descending, straddling
           "measure q -> c;")
    tp = TrajectoryProgram(parse(src), noise="dep2:0.0001")
    bits = FusedTrajectories(tp).run_vals(64, seed=0)["c"]
    # with p ~ 1e-4, nearly every trajectory is the clean |..1..1..> state
    want = np.zeros(n, dtype=np.int32)
    want[8] = want[2] = 1
    clean = (bits == want).all(axis=1).mean()
    assert clean > 0.95


def test_readout_error_flip_rate():
    src = f"qreg q[2]; creg c[2];\n{X_GATE} q[0];\nmeasure q -> c;"
    tp = TrajectoryProgram(parse(src), noise="readout:0.25")
    bits = FusedTrajectories(tp).run_vals(2000, seed=5)["c"]
    # true bits are (1, 0); each reported bit flips with p=0.25
    assert abs((1 - bits[:, 0]).mean() - 0.25) < 0.05
    assert abs(bits[:, 1].mean() - 0.25) < 0.05


def test_engine_flag_and_fallbacks():
    tp = TrajectoryProgram(parse(ghz_src(4)), noise="depolarizing:0.01")
    out = tp.run_vals(32, seed=0, engine="fused")
    assert out["c"].shape == (32, 4)
    # state-dependent Kraus (amplitude damping) rides the fused MCWF path
    tp_ad = TrajectoryProgram(parse(ghz_src(4)), noise="ad:0.1")
    out = tp_ad.run_vals(8, seed=0, engine="fused")
    assert out["c"].shape == (8, 4)
    # feed-forward programs ride the fused path too (predicate-selected
    # operands): d must mirror c exactly in the noiseless case
    src = (f"qreg q[2]; creg c[1]; creg d[1];\n{H_GATE} q[0];\n"
           "measure q[0] -> c[0];\n"
           f"if (c == 1) {X_GATE} q[1];\n"
           "measure q[1] -> d[0];")
    tp_ff = TrajectoryProgram(parse(src), noise=None)
    out = tp_ff.run_vals(64, seed=0, engine="fused")
    assert out["d"].shape == (64, 1)
    assert (out["c"] == out["d"]).all()
    assert 5 < out["c"].sum() < 59          # both branches exercised
    # reference sqrt-Born sampling stays vmap-only (sequential per qubit)
    from qubism_tpu.config import config as _cfg

    tp_sq = TrajectoryProgram(parse(ghz_src(4)), noise="depolarizing:0.01")
    _cfg.reference_sqrt_born = True
    try:
        with pytest.raises(FusedUnsupported):
            FusedTrajectories(tp_sq)
    finally:
        _cfg.reference_sqrt_born = False


def test_fused_seed_reproducible():
    tp = TrajectoryProgram(parse(ghz_src(5)), noise="depolarizing:0.1")
    plan = FusedTrajectories(tp)
    a = plan.run_vals(64, seed=9)["c"]
    b = plan.run_vals(64, seed=9)["c"]
    assert (a == b).all()
    c = plan.run_vals(64, seed=10)["c"]
    assert (a != c).any()


def test_chunking_structure_is_content_stable():
    # the whole point: two different realizations share ALL compiled
    # programs (same step fns, same operand shapes)
    tp = TrajectoryProgram(parse(ghz_src(8)), noise="depolarizing:0.2")
    plan = FusedTrajectories(tp)
    rng1 = np.random.default_rng(1)
    rng2 = np.random.default_rng(2)
    ops1 = plan._realize_operands(rng1)
    ops2 = plan._realize_operands(rng2)
    shapes = lambda pc: [[np.asarray(o).shape for o in ops] for ops in pc]
    assert shapes(ops1) == shapes(ops2)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for ch1, ch2 in zip(ops1, ops2) for a, b in zip(ch1, ch2))
    assert changed  # realizations actually differ


def test_fused_key_argument_changes_stream():
    # run_vals(key=...) is the documented alternative to seed=; the
    # fused dispatch must not silently drop it (regression: identical
    # outcomes for every key)
    import jax

    tp = TrajectoryProgram(parse(ghz_src(5)), noise="depolarizing:0.1")
    a = tp.run_vals(64, key=jax.random.PRNGKey(1), engine="fused")["c"]
    b = tp.run_vals(64, key=jax.random.PRNGKey(2), engine="fused")["c"]
    c = tp.run_vals(64, key=jax.random.PRNGKey(1), engine="fused")["c"]
    assert (a != b).any()
    assert (a == c).all()


def test_counts_engine_auto_on_stabilizer_program():
    # counts(engine="auto") must not crash on subclasses that override
    # run_vals without the engine kwarg; "fused" there is a ValueError
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

    sp = StabilizerTrajectoryProgram(parse(ghz_src(4)),
                                     noise="depolarizing:0.05")
    counts = sp.counts(16, seed=0, engine="auto")
    assert sum(counts.values()) == 16
    with pytest.raises(ValueError, match="fused"):
        sp.counts(8, seed=0, engine="fused")


def test_batched_scan_single_dispatch_and_batch_invariance():
    """VERDICT r4 item 1: one device dispatch per trajectory BATCH, and
    results must not depend on the batch split (the scan body is identical
    per trajectory)."""
    tp = TrajectoryProgram(parse(ghz_src(6)), noise="depolarizing:0.05")
    plan = FusedTrajectories(tp)
    a = plan.run_vals(64, seed=7)
    assert plan.dispatch_count == 1        # all 64 in one scan program
    plan2 = FusedTrajectories(tp)
    b = plan2.run_vals(64, seed=7, batch=16)
    assert plan2.dispatch_count == 4
    assert (a["c"] == b["c"]).all()


def _ad_populations(bits):
    """Per-qubit P(1) estimates from a (T, n) bit array."""
    return bits.mean(axis=0)


def test_mcwf_amplitude_damping_matches_density():
    """Fused MCWF (VERDICT r4 item 2) pinned against the exact
    DensityMatrix channel application: GHZ-5 + ad, per-qubit marginals."""
    n, T = 5, 3000
    src = ghz_src(n)
    tp = TrajectoryProgram(parse(src), noise="ad:0.2")
    bits = FusedTrajectories(tp).run_vals(T, seed=11)["c"]
    # oracle: same circuit WITHOUT the final measure (measure collapses rho)
    nomeas = "\n".join(src.splitlines()[:-1])
    dp = DensityProgram(parse(nomeas), noise="ad:0.2")
    rho, _ = dp.run(seed=0)
    probs = np.asarray(rho.probs())
    # exact per-qubit P(1): sum over basis states with that bit set
    idx = np.arange(1 << n)
    want = np.array([(probs[(idx >> (n - 1 - q)) & 1 == 1]).sum()
                     for q in range(n)])
    got = _ad_populations(bits)
    sig = np.sqrt(np.maximum(want * (1 - want), 1e-4) / T)
    assert (np.abs(got - want) < 5 * sig + 0.01).all(), (got, want)


def test_mcwf_phase_damping_preserves_populations():
    # phase damping never changes populations: X q[0]; CX -> |11>
    src = (f"qreg q[2]; creg c[2];\n{X_GATE} q[0];\nCX q[0], q[1];\n"
           "measure q -> c;")
    tp = TrajectoryProgram(parse(src), noise="pd:0.5")
    bits = FusedTrajectories(tp).run_vals(64, seed=0)["c"]
    assert (bits == 1).all()


def test_mcwf_on_row_qubit_larger_n():
    """n=10 puts q0..q2 in the ROW region (n - 7 = 3): the MCWF reduce +
    layer1q apply must work off the lane fast path too. |1> on q0 with
    ad:gamma decays to P(1) = 1 - gamma after one site."""
    n, T, g = 10, 2000, 0.3
    src = (f"qreg q[{n}]; creg c[{n}];\n{X_GATE} q[0];\n"
           "measure q -> c;")
    tp = TrajectoryProgram(parse(src), noise=f"ad:{g}")
    bits = FusedTrajectories(tp).run_vals(T, seed=3)["c"]
    p1 = bits[:, 0].mean()
    want = 1 - g
    assert abs(p1 - want) < 5 * np.sqrt(want * (1 - want) / T)
    assert (bits[:, 1:] == 0).all()        # untouched qubits stay |0>


def test_mixed_umix_and_mcwf_channel_order():
    """Spec order must be preserved when mixing foldable (dep) and MCWF
    (ad) channels: 'ad,bf' on the same qubit composes ad THEN bitflip,
    checked against the exact density oracle."""
    g, p, T = 0.4, 0.3, 4000
    src = f"qreg q[2]; creg c[2];\n{X_GATE} q[0];\nmeasure q -> c;"
    nomeas = "\n".join(src.splitlines()[:-1])
    for spec in (f"ad:{g},bf:{p}", f"bf:{p},ad:{g}"):
        tp = TrajectoryProgram(parse(src), noise=spec)
        bits = FusedTrajectories(tp).run_vals(T, seed=5)["c"]
        dp = DensityProgram(parse(nomeas), noise=spec)
        rho, _ = dp.run(seed=0)
        probs = np.asarray(rho.probs())
        want = probs[2] + probs[3]         # P(q0 = 1), q0 is the MSB
        got = bits[:, 0].mean()
        assert abs(got - want) < 5 * np.sqrt(want * (1 - want) / T) + 0.01, (
            spec, got, want)


def test_mcwf_group_pending_flush_matches_density():
    """GHZ-9 + ad drives the WHOLE deferred-Kraus pipeline: multi-site
    joint-marginal groups, pending-table reweighting, absorption into CX
    operands, and (at 9 qubits the pending set outgrows the 8-bit table
    cap) a mid-circuit _FlushStep — all pinned against the exact density
    oracle's per-qubit marginals."""
    from qubism_tpu.run.traj_fused import (_FlushStep, _McwfGroupStep,
                                           _MCWF_TABLE_MAX)

    n, T = 9, 3000
    src = ghz_src(n)
    tp = TrajectoryProgram(parse(src), noise="ad:0.15")
    plan = FusedTrajectories(tp)
    groups = [s for s in plan.steps if isinstance(s, _McwfGroupStep)]
    assert groups and any(len(g.sites) == 2 for g in groups)
    assert any(g.pend_qs for g in groups)          # reweighting exercised
    assert any(isinstance(s, _FlushStep) for s in plan.steps[:-1]), \
        "expected a mid-circuit flush at the table cap"
    assert all(len(g.tableqs) <= _MCWF_TABLE_MAX for g in groups)
    bits = plan.run_vals(T, seed=5)["c"]
    nomeas = "\n".join(src.splitlines()[:-1])
    dp = DensityProgram(parse(nomeas), noise="ad:0.15")
    rho, _ = dp.run(seed=0)
    probs = np.asarray(rho.probs())
    idx = np.arange(1 << n)
    want = np.array([(probs[(idx >> (n - 1 - q)) & 1 == 1]).sum()
                     for q in range(n)])
    got = _ad_populations(bits)
    sig = np.sqrt(np.maximum(want * (1 - want), 1e-4) / T)
    assert (np.abs(got - want) < 5 * sig + 0.01).all(), (got, want)


def test_mcwf_repeated_channel_same_qubit_composes_pending():
    """Two ad channels in one spec hit the same qubit back to back inside
    one group: the second site's conditionals must account for the first
    site's (unapplied) composition. One X + double-damping: P(1) =
    (1-g1)(1-g2)."""
    g1, g2, T = 0.3, 0.2, 4000
    src = f"qreg q[2]; creg c[2];\n{X_GATE} q[0];\nmeasure q -> c;"
    tp = TrajectoryProgram(parse(src), noise=f"ad:{g1},ad:{g2}")
    bits = FusedTrajectories(tp).run_vals(T, seed=9)["c"]
    want = (1 - g1) * (1 - g2)
    got = bits[:, 0].mean()
    assert abs(got - want) < 5 * np.sqrt(want * (1 - want) / T), (got, want)
    assert (bits[:, 1] == 0).all()


def _teleport_src():
    h, x = H_GATE, X_GATE
    z = "U(0, 0, 3.141592653589793)"
    return (f"qreg q[3]; creg c0[1]; creg c1[1]; creg m[1];\n"
            f"{h} q[0];\n"                       # teleport |+>
            f"{h} q[1];\nCX q[1], q[2];\n"       # Bell pair
            f"CX q[0], q[1];\n{h} q[0];\n"
            "measure q[0] -> c0[0];\nmeasure q[1] -> c1[0];\n"
            f"if (c1 == 1) {x} q[2];\n"
            f"if (c0 == 1) {z} q[2];\n"
            f"{h} q[2];\nmeasure q[2] -> m[0];\n")


@pytest.mark.parametrize("noise", [None, "dep:0.02", "ad:0.05"])
def test_feed_forward_teleportation_matches_vmap(noise):
    """The fused engine's mid-circuit measurement + predicate-selected
    operands, against the vmapped engine on noisy teleportation: the
    teleported |+> must measure 0 in the X basis (up to noise), and the
    mid-circuit registers must be fair coins."""
    T = 6000
    f = FusedTrajectories(
        TrajectoryProgram(parse(_teleport_src()), noise=noise)).run_vals(
            T, seed=3)
    v = TrajectoryProgram(parse(_teleport_src()), noise=noise).run_vals(
        T, seed=4, engine="vmap")
    for reg in ("c0", "c1", "m"):
        assert abs(f[reg].mean() - v[reg].mean()) < 0.035, (
            reg, f[reg].mean(), v[reg].mean())
    if noise is None:
        assert f["m"].sum() == 0        # exact teleportation


def test_fused_measure_reset_reuse_matches_vmap():
    """measure -> reset -> measure: the second read must be 0 (fresh
    |0>), the first a fair coin — the reset is the reference projection
    + the zero-state annihilation convention of collapse_traced."""
    src = (f"qreg q[2]; creg a[1]; creg b[1];\n{H_GATE} q[0];\n"
           "CX q[0], q[1];\n"
           "measure q[0] -> a[0];\nreset q[0];\nmeasure q[0] -> b[0];\n")
    f = FusedTrajectories(
        TrajectoryProgram(parse(src), noise="bf:0.03")).run_vals(
            4000, seed=1)
    assert abs(f["a"].mean() - 0.5) < 0.04
    assert f["b"].mean() < 0.01


def test_fused_annihilating_reset_reads_zero():
    """Projection-reset of a certain-|1> qubit annihilates the state
    (reference Simulation.hs:146-156 semantics as defined by
    collapse_traced's zero-vector convention): every later read is 0,
    matching the vmapped engine."""
    src = (f"qreg q[2]; creg c[2];\n{X_GATE} q[0];\n"
           "reset q[0];\nmeasure q -> c;\n")
    f = FusedTrajectories(
        TrajectoryProgram(parse(src), noise=None)).run_vals(32, seed=0)
    v = TrajectoryProgram(parse(src), noise=None).run_vals(
        32, seed=1, engine="vmap")
    assert f["c"].sum() == 0
    assert v["c"].sum() == 0


def test_fused_mid_circuit_only_program_runs():
    """A program whose ONLY outputs are mid-circuit (a gate after the
    last measure) must still dispatch and return the scanned cregs."""
    src = (f"qreg q[2]; creg c[1];\n{H_GATE} q[0];\n"
           "measure q[0] -> c[0];\n"
           f"{X_GATE} q[1];\n")
    plan = FusedTrajectories(TrajectoryProgram(parse(src), noise=None))
    assert plan.has_mid and not plan.measures
    out = plan.run_vals(2000, seed=2)
    assert abs(out["c"].mean() - 0.5) < 0.05


def test_fused_nested_conditionals():
    """Nested `if` ANDs its parent predicate: the inner X fires only
    when both registers read 1 (noiseless: q2 mirrors c0 AND c1)."""
    src = (f"qreg q[3]; creg a[1]; creg b[1]; creg m[1];\n"
           f"{H_GATE} q[0];\n{H_GATE} q[1];\n"
           "measure q[0] -> a[0];\nmeasure q[1] -> b[0];\n"
           f"if (a == 1) if (b == 1) {X_GATE} q[2];\n"
           "measure q[2] -> m[0];\n")
    try:
        ast = parse(src)
    except Exception:
        pytest.skip("grammar has no nested if")
    out = FusedTrajectories(
        TrajectoryProgram(ast, noise=None)).run_vals(2000, seed=7)
    want = out["a"][:, 0] & out["b"][:, 0]
    assert (out["m"][:, 0] == want).all()


def test_fused_readout_error_mid_circuit():
    """ro flips the REPORTED mid-circuit bit; the state collapses on the
    true outcome — feed-forward then steers on the reported value
    (noisy.py semantics). X q0 -> measure (true 1, reported flips w.p.
    p) -> if(c==1) X q1: P(q1 unset) = p."""
    p, T = 0.2, 6000
    src = (f"qreg q[2]; creg c[1]; creg d[1];\n{X_GATE} q[0];\n"
           "measure q[0] -> c[0];\n"
           f"if (c == 1) {X_GATE} q[1];\n"
           "measure q[1] -> d[0];\n")
    out = FusedTrajectories(
        TrajectoryProgram(parse(src), noise=f"ro:{p}")).run_vals(T, seed=8)
    # c is the reported (flipped) bit; d mirrors the c-steered branch up
    # to ITS own readout flip
    assert abs(out["c"].mean() - (1 - p)) < 0.03
    agree = (out["c"][:, 0] == out["d"][:, 0]).mean()
    assert agree > (1 - p) * (1 - p) + p * p - 0.04
