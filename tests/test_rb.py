"""Randomized benchmarking (models/rb.py): Clifford group generation and
decay-rate recovery on the exact and trajectory noise engines.

Engine extension — the reference has no noise model or benchmarking
protocols (src/Qubism/StateVec.hs is pure states only)."""

import math

import numpy as np
import pytest

from qubism_tpu.core.density import DensityMatrix, depolarizing, depolarizing2
from qubism_tpu.models.rb import (
    clifford_group,
    fit_rb,
    inverse_index,
    rb_experiment,
    rb_prims,
    rb_sequence,
    rb_survivals,
)


def test_clifford_group_sizes():
    assert len(clifford_group(1)) == 24
    assert len(clifford_group(2)) == 11520


@pytest.mark.parametrize("k", [1, 2])
def test_clifford_elements_unitary_and_invertible(k):
    group = clifford_group(k)
    rng = np.random.default_rng(0)
    eye = np.eye(1 << k)
    for i in rng.choice(len(group), size=12, replace=False):
        u = group[i]
        assert np.allclose(u @ u.conj().T, eye, atol=1e-8)
        v = group[inverse_index(k, u)]
        w = v @ u
        # identity up to global phase
        assert np.allclose(np.abs(w), eye, atol=1e-8)


@pytest.mark.parametrize("k", [1, 2])
def test_sequence_inverts_to_identity(k):
    rng = np.random.default_rng(3)
    for m in (0, 1, 5):
        seq = rb_sequence(k, m, rng)
        rho = DensityMatrix(k).apply(rb_prims(k, seq))
        p = rho.probs()
        assert abs(p[0] - 1.0) < 1e-6, (k, m, p)


def test_noise_free_survival_is_one():
    surv = rb_survivals(1, [1, 4, 16], kraus=None, n_seq=3, seed=1)
    assert np.allclose(surv, 1.0, atol=1e-6)


def test_rb_decay_matches_depolarizing_1q():
    """The engine's random-Pauli depolarizing (prob p of a uniform X/Y/Z)
    shrinks the polarization by alpha = 1 - 4p/3 and commutes with every
    unitary, so survival is exactly 1/2 + 1/2 alpha^m for EVERY sequence,
    and the fit recovers alpha and r = (1-alpha)/2 = 2p/3."""
    p = 0.02
    alpha_true = 1 - 4 * p / 3
    ms = [1, 2, 4, 8, 16]
    surv = rb_survivals(1, ms, depolarizing(p), n_seq=4, seed=5)
    for m, s in zip(ms, surv):
        assert abs(s - (0.5 + 0.5 * alpha_true ** m)) < 1e-6, (m, s)
    alpha, r = fit_rb(ms, surv, 1)
    assert abs(alpha - alpha_true) < 1e-6
    assert abs(r - 2 * p / 3) < 1e-6


def test_rb_decay_matches_depolarizing_2q():
    p = 0.03
    alpha_true = 1 - 16 * p / 15
    ms = [1, 2, 4, 8]
    surv = rb_survivals(2, ms, depolarizing2(p), n_seq=3, seed=2)
    for m, s in zip(ms, surv):
        assert abs(s - (0.25 + 0.75 * alpha_true ** m)) < 1e-6, (m, s)
    alpha, r = fit_rb(ms, surv, 2)
    assert abs(alpha - alpha_true) < 1e-6
    assert abs(r - 0.75 * (1 - alpha_true)) < 1e-6


def test_rb_experiment_end_to_end():
    p = 0.05
    ms, surv, alpha, r = rb_experiment(1, depolarizing(p),
                                       ms=(1, 2, 4), n_seq=3, seed=9)
    assert len(surv) == 3
    assert abs(alpha - (1 - 4 * p / 3)) < 1e-6
    assert abs(r - 2 * p / 3) < 1e-6


def test_rb_trajectories_agrees_with_density():
    """The MCWF executor converges to the exact decay (5-sigma band on a
    seeded run; stderr ~ 1/sqrt(ntraj))."""
    p = 0.1
    ms = [2, 6]
    exact = rb_survivals(1, ms, depolarizing(p), n_seq=2, seed=4)
    est = rb_survivals(1, ms, depolarizing(p), n_seq=2, seed=4,
                       executor="trajectories", ntraj=768)
    for e, s in zip(exact, est):
        sigma = math.sqrt(e * (1 - e) / 768) + 1e-9
        assert abs(e - s) < 5 * sigma + 0.02, (e, s)


def test_interleaved_rb_recovers_gate_error():
    """IRB with depolarizing background (alpha1) and a private depolarizing
    channel on the interleaved gate (alpha2): every interleaved step decays
    by alpha1^2 * alpha2 exactly (G is a physical gate, so it carries the
    background channel too), and r_G = (1 - alpha1*alpha2)/2 — the full
    error attributed to G."""
    from qubism_tpu.models.rb import irb_experiment

    p1, p2 = 0.02, 0.05
    a1 = 1 - 4 * p1 / 3
    a2 = 1 - 4 * p2 / 3
    alpha_ref, alpha_int, r_gate = irb_experiment(
        1, gate_idx=3, kraus=depolarizing(p1), gate_kraus=depolarizing(p2),
        ms=(1, 2, 4), n_seq=3, seed=1)
    assert abs(alpha_ref - a1) < 1e-6
    assert abs(alpha_int - a1 * a1 * a2) < 1e-6
    assert abs(r_gate - 0.5 * (1 - a1 * a2)) < 1e-6


def test_interleaved_rb_clean_gate_measures_background():
    """A noiseless interleaved gate still picks up the background channel:
    r_G = (1 - alpha1)/2, i.e. one extra gate's worth of noise."""
    from qubism_tpu.models.rb import irb_experiment

    p = 0.03
    a = 1 - 4 * p / 3
    alpha_ref, alpha_int, r_gate = irb_experiment(
        1, gate_idx=7, kraus=depolarizing(p), gate_kraus=None,
        ms=(1, 2, 4), n_seq=3, seed=2)
    assert abs(alpha_int - a * a) < 1e-6
    assert abs(r_gate - 0.5 * (1 - a)) < 1e-6


def test_clifford_words_reconstruct_group():
    from qubism_tpu.models.rb import clifford_words, clifford_group, _canon
    import numpy as _np

    group = clifford_group(1)
    words = clifford_words()
    _H1 = _np.array([[1, 1], [1, -1]], dtype=complex) / _np.sqrt(2)
    _S1 = _np.diag([1, 1j]).astype(complex)
    gens = {"h": _H1, "s": _S1}
    assert len(words) == 24
    for i, w in enumerate(words):
        u = _np.eye(2, dtype=complex)
        for g in w:
            u = gens[g] @ u
        assert _canon(u) == _canon(group[i]), (i, w)


def test_simultaneous_rb_at_scale_on_frames():
    """Simultaneous 1q RB on 64 qubits rides the Pauli-frame executor as
    ONE program; every qubit's survival matches the exact per-gate-count
    depolarizing law within 5-sigma binomial bands."""
    from qubism_tpu.models.rb import simultaneous_rb_survivals

    n, m, p, T = 64, 4, 0.02, 2048
    surv, expected, used_frames = simultaneous_rb_survivals(n, m, p,
                                                            ntraj=T, seed=6)
    assert used_frames
    assert surv.shape == (n,)
    sigma = np.sqrt(expected * (1 - expected) / T)
    assert (np.abs(surv - expected) < 5 * sigma + 1e-9).all(), (
        np.abs(surv - expected).max(), sigma.max())


def test_simultaneous_rb_noise_free_is_perfect():
    from qubism_tpu.models.rb import simultaneous_rb_survivals

    surv, expected, _ = simultaneous_rb_survivals(16, 3, 0.0, ntraj=64,
                                                  seed=2)
    assert np.allclose(surv, 1.0)
    assert np.allclose(expected, 1.0)
