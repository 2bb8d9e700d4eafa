"""Sampler calibration with principled thresholds + mutation power
checks (VERDICT r4 item 7).

Every engine's Born sampler must pass a chi-square goodness-of-fit test
against its exact distribution at a STATED significance (inverse-CDF
critical value, ``utils/stats.py``) — and the SAME test, at the same
shot count and distribution, must REJECT a deliberately biased
sampler (p -> p^gamma, renormalized: wrong but perfectly normalized).
A check that can't fail the mutant proves nothing about the sampler.
"""

import math

import jax
import numpy as np
import pytest

from qubism_tpu.utils.stats import chi2_quantile, chi2_test, normal_quantile

ALPHA = 1e-3          # acceptance significance for every engine check
DELTA = 0.15          # mutation tilt: q ~ p * (1 +- DELTA) (normalized)


def _mutant_counts(probs, shots, seed=123, delta=DELTA):
    """A wrong-but-normalized sampler: tilt the distribution by +-delta
    on alternating support bins. (A power bias p^gamma would be a NO-OP
    on uniform-support distributions — exactly the stabilizer case —
    so the mutation must break uniformity, not sharpen peaks.)"""
    p = np.asarray(probs, np.float64)
    sup = np.flatnonzero(p > 0)
    tilt = np.ones_like(p)
    tilt[sup[::2]] += delta
    tilt[sup[1::2]] -= delta
    q = p * tilt
    q /= q.sum()
    idx = np.random.default_rng(seed).choice(q.size, size=shots, p=q)
    return np.bincount(idx, minlength=q.size)


def _assert_pass_and_mutant_fails(counts, probs, label):
    res = chi2_test(counts, probs, alpha=ALPHA)
    assert res.ok, (label, res)
    shots = int(np.asarray(counts).sum())
    mut = chi2_test(_mutant_counts(probs, shots), probs, alpha=ALPHA)
    assert not mut.ok, (label, "mutation NOT rejected", mut)


# -- threshold machinery --------------------------------------------------------


def test_quantiles_match_scipy():
    scipy = pytest.importorskip("scipy")
    from scipy import stats as ss

    for p in (1e-6, 0.025, 0.5, 0.975, 1 - 1e-6):
        assert abs(normal_quantile(p) - ss.norm.ppf(p)) < 1e-7
    for dof in (1, 2, 3, 7, 15, 63, 255):
        for alpha in (1e-2, 1e-3, 1e-6):
            want = ss.chi2.ppf(1 - alpha, dof)
            got = chi2_quantile(dof, alpha)
            assert abs(got - want) / want < 1e-6, (dof, alpha, got, want)


def test_chi2_test_pools_small_bins():
    probs = np.asarray([0.5, 0.5 - 1e-6] + [2.5e-7] * 4)
    counts = np.asarray([2050, 2046, 0, 0, 0, 0])
    res = chi2_test(counts, probs)
    assert res.pooled_bins == 4 and res.ok


def test_chi2_test_rejects_impossible_outcomes():
    probs = np.asarray([1.0, 0.0])
    assert not chi2_test(np.asarray([4095, 1]), probs).ok


# -- per-engine calibration -----------------------------------------------------


def _dense_state(n, depth=4, seed=7):
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops.apply import complex_from_planes, zero_state
    from qubism_tpu.ops.fusion import CompiledCircuit

    prims = brickwork_prims(n, depth=depth, seed=seed)
    st = CompiledCircuit(n, prims)(zero_state(n))
    return prims, st, np.abs(complex_from_planes(st).reshape(-1)) ** 2


def test_dense_sampler_calibrated():
    from qubism_tpu.ops.sample import sample_indices_np

    n, shots = 8, 8192
    _, st, probs = _dense_state(n)
    idx = np.asarray(sample_indices_np(st, n, shots, jax.random.PRNGKey(3)))
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "dense")


def test_mesh_sharded_sampler_calibrated():
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim
    from qubism_tpu.models.circuits import brickwork_prims

    n, shots = 8, 8192
    prims, _, probs = _dense_state(n)
    sim = ShardedSim(n, make_mesh(8)).apply(prims)
    idx = sim.sample(shots, jax.random.PRNGKey(5))
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "mesh")


def test_stabilizer_sampler_calibrated():
    from qubism_tpu.core.gates import Prim
    from qubism_tpu.stabilizer import StabilizerSim

    n, shots = 6, 8192
    h = (np.array([[1, 1], [1, -1]]) / np.sqrt(2)).astype(complex)
    s_gate = np.diag([1.0, 1j])
    cx = np.eye(4, dtype=complex)[[0, 1, 3, 2]]
    prims = ([Prim(h, (q,)) for q in (0, 2, 4)]
             + [Prim(cx, (q, q + 1)) for q in range(n - 1)]
             + [Prim(s_gate, (1,)), Prim(h, (1,))])
    # dense oracle for the Born distribution
    from qubism_tpu.ops.apply import complex_from_planes, zero_state
    from qubism_tpu.ops.fusion import CompiledCircuit

    probs = np.abs(complex_from_planes(
        CompiledCircuit(n, prims, optimize=False)(
            zero_state(n))).reshape(-1)) ** 2
    bits = StabilizerSim(n, seed=0).apply(prims).sample(shots)
    idx = (bits.astype(np.int64)
           << (n - 1 - np.arange(n))[None, :]).sum(axis=1)
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "stabilizer")


def test_mps_sampler_calibrated():
    from qubism_tpu.mps import MPSSim

    n, shots = 8, 8192
    prims, _, probs = _dense_state(n)
    m = MPSSim(n, chi=16, seed=0).apply(prims)
    assert m.trunc_error == 0.0
    bits = m.sample(shots, jax.random.PRNGKey(9))
    idx = (bits.astype(np.int64)
           << (n - 1 - np.arange(n))[None, :]).sum(axis=1)
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "mps")


def _traj_setup(n):
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.noisy import DensityProgram

    lines = [f"qreg q[{n}]; creg c[{n}];",
             "U(1.5707963267948966, 0, 3.141592653589793) q[0];",
             "U(0.7, 0.2, 0.4) q[2];"]
    lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n - 1)]
    src_nomeas = "\n".join(lines)
    src = src_nomeas + "\nmeasure q -> c;"
    ast = parse_openqasm("<cal>", src)
    rho, _ = DensityProgram(parse_openqasm("<cal>", src_nomeas),
                            noise="dep:0.03").run(seed=0)
    return ast, np.clip(np.asarray(rho.probs(), np.float64), 0, None)


def test_trajectory_vmap_sampler_calibrated():
    from qubism_tpu.run.noisy import TrajectoryProgram

    n, shots = 5, 8192
    ast, probs = _traj_setup(n)
    probs /= probs.sum()
    bits = TrajectoryProgram(ast, noise="dep:0.03").run_vals(
        shots, seed=1)["c"]
    # creg bits are LSB-first columns: column k = qubit k outcome
    idx = (bits.astype(np.int64)
           << (n - 1 - np.arange(n))[None, :]).sum(axis=1)
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "traj-vmap")


def test_trajectory_fused_sampler_calibrated():
    from qubism_tpu.run.noisy import TrajectoryProgram

    n, shots = 5, 8192
    ast, probs = _traj_setup(n)
    probs /= probs.sum()
    bits = TrajectoryProgram(ast, noise="dep:0.03").run_vals(
        shots, seed=2, engine="fused")["c"]
    idx = (bits.astype(np.int64)
           << (n - 1 - np.arange(n))[None, :]).sum(axis=1)
    _assert_pass_and_mutant_fails(
        np.bincount(idx, minlength=1 << n), probs, "traj-fused")
