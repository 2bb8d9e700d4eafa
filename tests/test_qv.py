"""Quantum volume protocol (models/qv.py).

Engine extension — the reference has no benchmarking protocols or noise
model (src/Qubism/StateVec.hs is pure states only)."""

import numpy as np
import pytest

from qubism_tpu.core.density import depolarizing2
from qubism_tpu.models.qv import (
    QVResult,
    haar_su4,
    heavy_mass,
    heavy_set,
    ideal_probs,
    qv_experiment,
    qv_prims,
)


def test_haar_su4_is_special_unitary():
    rng = np.random.default_rng(0)
    for _ in range(5):
        u = haar_su4(rng)
        assert np.allclose(u @ u.conj().T, np.eye(4), atol=1e-10)
        assert abs(np.linalg.det(u) - 1.0) < 1e-10


def test_qv_prims_layer_count():
    rng = np.random.default_rng(1)
    for m in (2, 3, 5):
        prims = qv_prims(m, rng)
        assert len(prims) == m * (m // 2)
        for p in prims:
            assert len(p.targets) == 2
            assert all(0 <= t < m for t in p.targets)


def test_heavy_set_median_split():
    probs = np.array([0.1, 0.4, 0.2, 0.3])
    heavy = heavy_set(probs)
    assert set(heavy) == {1, 3}
    assert abs(heavy_mass(probs, heavy) - 0.7) < 1e-12


def test_noiseless_hop_near_asymptote():
    """Ideal heavy-output probability concentrates near (1+ln2)/2 ~ 0.847
    and passes the 2/3 criterion comfortably."""
    res = qv_experiment(m=4, n_circuits=20, seed=7)
    assert 0.75 < res.hop_mean < 0.95, res
    assert res.passed
    assert res.quantum_volume == 16


def test_depolarized_device_fails():
    """Strong 2q depolarizing after every block drives the output toward
    uniform: heavy mass -> 1/2 < 2/3, so the width must FAIL."""
    res = qv_experiment(m=3, n_circuits=10, seed=3,
                        kraus2=depolarizing2(0.5))
    assert res.hop_mean < 0.62, res
    assert not res.passed
    assert res.quantum_volume == 0


def test_mild_noise_sits_between():
    clean = qv_experiment(m=3, n_circuits=8, seed=5)
    noisy = qv_experiment(m=3, n_circuits=8, seed=5,
                          kraus2=depolarizing2(0.05))
    assert noisy.hop_mean < clean.hop_mean
    assert noisy.hop_mean > 0.55


def test_trajectory_executor_tracks_exact():
    exact = qv_experiment(m=3, n_circuits=3, seed=11,
                          kraus2=depolarizing2(0.1))
    est = qv_experiment(m=3, n_circuits=3, seed=11,
                        kraus2=depolarizing2(0.1),
                        executor="trajectories", ntraj=512)
    for e, s in zip(exact.hops, est.hops):
        assert abs(e - s) < 0.08, (exact.hops, est.hops)


def test_shot_sampling_reproducible():
    r1 = qv_experiment(m=3, n_circuits=5, shots=200, seed=2)
    r2 = qv_experiment(m=3, n_circuits=5, shots=200, seed=2)
    assert isinstance(r1, QVResult)
    assert r1 == r2
    assert all(abs(h * 200 - round(h * 200)) < 1e-9 for h in r1.hops)


def test_ideal_probs_normalized():
    rng = np.random.default_rng(4)
    p = ideal_probs(qv_prims(3, rng), 3)
    assert abs(p.sum() - 1.0) < 1e-6
    assert (p >= 0).all()
