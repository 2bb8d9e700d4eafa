"""Cross-entropy benchmarking (models/xeb.py).

Oracles: the full Born distribution at small n (probs()), exact
Porter-Thomas expectations for ideal/uniform/mixed samplers."""

import jax
import numpy as np
import pytest

from qubism_tpu.core.statevec import StateVec
from qubism_tpu.models.circuits import brickwork_prims
from qubism_tpu.models.xeb import (counts_to_indices, linear_xeb, log_xeb,
                                   sampled_probabilities, xeb_stderr)
from qubism_tpu.ops.fusion import CompiledCircuit


def _brickwork_state(n: int, depth: int, seed: int = 1) -> StateVec:
    circ = CompiledCircuit(n, brickwork_prims(n, depth, seed=seed),
                           virtual_shards=0)
    return StateVec(n, circ(circ.init_state()))


def test_sampled_probabilities_match_full_distribution():
    sv = _brickwork_state(8, 6)
    probs = sv.probs()
    idx = np.array([0, 3, 17, 255, 128, 64])
    got = sampled_probabilities(sv, idx)
    assert np.allclose(got, probs[idx], atol=1e-6)


def test_counts_roundtrip():
    counts = {"0101": 3, "1111": 2}
    idx = counts_to_indices(counts)
    assert sorted(idx.tolist()) == [5, 5, 5, 15, 15]


def test_ideal_sampler_matches_collision_number():
    """Sampling from the exact distribution: E[F_XEB] = D sum p^2 - 1
    EXACTLY (no Porter-Thomas assumption) — this pins the estimator."""
    n, shots = 10, 8192
    sv = _brickwork_state(n, 8)
    counts = sv.sample(shots, seed=7)
    idx = counts_to_indices(counts)
    f, se = xeb_stderr(sv, idx)
    probs = sv.probs()
    expected = (1 << n) * float(np.sum(probs ** 2)) - 1.0
    assert f == pytest.approx(expected, abs=6 * se)
    assert linear_xeb(sv, idx) == pytest.approx(f, abs=1e-12)


def test_deep_brickwork_approaches_porter_thomas():
    """At depth 24 the collision number D sum p^2 is near the PT value 2
    (so ideal-sampler XEB reads ~1, uniform ~0 — the RCS benchmark
    regime)."""
    sv = _brickwork_state(10, 24)
    probs = sv.probs()
    assert 2.0 < (1 << 10) * float(np.sum(probs ** 2)) < 2.6


def test_uniform_sampler_scores_near_zero():
    n, shots = 10, 8192
    sv = _brickwork_state(n, 8)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 1 << n, size=shots)
    f, se = xeb_stderr(sv, idx)
    assert abs(f) < 6 * se + 0.02


def test_mixed_sampler_interpolates():
    """50% ideal + 50% uniform samples -> F = F_ideal/2 (the
    depolarized-device model XEB is designed to estimate)."""
    n, shots = 10, 8192
    sv = _brickwork_state(n, 8)
    ideal = counts_to_indices(sv.sample(shots // 2, seed=3))
    rng = np.random.default_rng(1)
    uniform = rng.integers(0, 1 << n, size=shots // 2)
    f = linear_xeb(sv, np.concatenate([ideal, uniform]))
    probs = sv.probs()
    expected = ((1 << n) * float(np.sum(probs ** 2)) - 1.0) / 2.0
    assert f == pytest.approx(expected, abs=0.15)


def test_log_xeb_endpoints():
    """Exact expectations from the state's own distribution:
    ideal sampling E = sum p log(Dp) + gamma, uniform E = mean log(Dp)
    + gamma (equal to 1 and 0 only in the PT limit)."""
    n, shots = 10, 8192
    d = 1 << n
    sv = _brickwork_state(n, 8)
    probs = np.maximum(sv.probs(), 1e-38)
    gamma = 0.5772156649015329
    want_ideal = float(np.sum(probs * np.log(d * probs))) + gamma
    want_unif = float(np.mean(np.log(d * probs))) + gamma
    ideal = counts_to_indices(sv.sample(shots, seed=5))
    rng = np.random.default_rng(2)
    uniform = rng.integers(0, d, size=shots)
    assert log_xeb(sv, ideal) == pytest.approx(want_ideal, abs=0.1)
    assert log_xeb(sv, uniform) == pytest.approx(want_unif, abs=0.1)
    assert want_ideal > want_unif + 0.5  # the two regimes are separable


def test_works_on_flat_planes():
    """Plane-pair (non-StateVec) input with explicit n."""
    sv = _brickwork_state(6, 4)
    flat = tuple(p.reshape(-1) for p in sv.planes)
    idx = np.arange(1 << 6)
    got = sampled_probabilities(flat, idx)
    assert np.allclose(got, sv.probs(), atol=1e-6)
    assert linear_xeb(flat, counts_to_indices(sv.sample(512, seed=1)), n=6) \
        == pytest.approx(linear_xeb(sv, counts_to_indices(sv.sample(512,
                                                                    seed=1))),
                         abs=1e-9)


def test_works_on_canonical_2d_planes():
    """The TPU path keeps planes in the canonical (R, 2048) layout; the
    gather must do the row/col split, not a state-sized reshape."""
    from qubism_tpu.ops.kernels import to_canon

    sv = _brickwork_state(16, 6)
    canon = to_canon(sv.planes, 16)
    assert canon[0].ndim == 2
    idx = np.array([0, 1, 2047, 2048, 65535, 40000])
    got = sampled_probabilities(canon, idx)
    want = sampled_probabilities(sv, idx)
    assert np.allclose(got, want, atol=1e-7)
