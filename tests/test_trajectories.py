"""Quantum-trajectory unraveling vs the exact DensityMatrix engine.

MCWF estimates carry ~1/sqrt(T) sampling error; statistical assertions
use 5-sigma bands on seeded runs (deterministic, so no flakes)."""

import numpy as np
import pytest

import qubism_tpu as qt
from qubism_tpu.core.density import (DensityMatrix, amplitude_damping,
                                     bit_flip, depolarizing, phase_damping)
from qubism_tpu.core.gates import Prim
from qubism_tpu.models.trajectories import (ChannelOp, run_trajectories,
                                            trajectory_expectation,
                                            trajectory_pauli_sum,
                                            trajectory_probs)

_H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
_X = np.array([[0, 1], [1, 0]], dtype=complex)
_CX = np.eye(4, dtype=complex)[[0, 1, 3, 2]]


def _bell_prims():
    return [Prim(_H, (0,)), Prim(_CX, (0, 1))]


def test_channelop_rejects_non_cptp():
    with pytest.raises(ValueError):
        ChannelOp([0.5 * np.eye(2)], (0,))
    with pytest.raises(ValueError):
        ChannelOp([np.eye(2)], (0, 1))


def test_no_channels_matches_dense_exactly():
    n = 3
    prog = [Prim(_H, (0,)), Prim(_CX, (0, 1)), Prim(_CX, (1, 2))]
    planes = run_trajectories(n, prog, ntraj=4, seed=0)
    sv = qt.mk_state_vec(n)
    for p in prog:
        sv = qt.Gate(n, [p])(sv)
    amps = sv.amps
    for t in range(4):
        got = np.asarray(planes[0][t]) + 1j * np.asarray(planes[1][t])
        assert np.allclose(got, amps, atol=1e-6)


def test_single_kraus_unitary_channel_is_deterministic():
    # a channel whose only Kraus op is H acts exactly like the unitary
    n = 1
    planes = run_trajectories(n, [ChannelOp([_H], (0,))], ntraj=8, seed=1)
    got = np.asarray(planes[0]) + 1j * np.asarray(planes[1])
    assert np.allclose(got, np.full((8, 2), 1 / np.sqrt(2)), atol=1e-6)


@pytest.mark.parametrize("chan,q", [
    (depolarizing(0.3), 0),
    (amplitude_damping(0.4), 1),
    (phase_damping(0.25), 0),
    (bit_flip(0.2), 1),
])
def test_trajectory_mean_matches_density_matrix(chan, q):
    n = 2
    prog = _bell_prims() + [ChannelOp(chan, (q,))]
    planes = run_trajectories(n, prog, ntraj=3000, seed=3)

    rho = DensityMatrix(n).apply(_bell_prims()).apply_channel(chan, (q,))
    for pauli in ("ZZ", "XX", "ZI", "IZ"):
        exact = rho.expectation(pauli)
        mean, se = trajectory_expectation(planes, pauli, n)
        band = 5 * max(se, 1e-3)
        assert abs(mean - exact) < band, (pauli, mean, exact, se)
    # averaged Born probabilities
    probs = trajectory_probs(planes)
    np.testing.assert_allclose(probs, rho.probs(), atol=0.05)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)


def test_amplitude_damping_decay_on_excited_state():
    gamma = 0.35
    planes = run_trajectories(
        1, [Prim(_X, (0,)), ChannelOp(amplitude_damping(gamma), (0,))],
        ntraj=4000, seed=5)
    probs = trajectory_probs(planes)
    assert abs(probs[1] - (1 - gamma)) < 0.04


def test_two_qubit_channel():
    # 2q depolarizing built from tensor-product Paulis
    p = 0.25
    paulis = [np.eye(2), _X,
              np.array([[0, -1j], [1j, 0]]), np.diag([1, -1]).astype(complex)]
    kraus = []
    for i, a in enumerate(paulis):
        for j, b in enumerate(paulis):
            w = np.sqrt(1 - p) if i == j == 0 else np.sqrt(p / 15)
            kraus.append(w * np.kron(a, b))
    prog = _bell_prims() + [ChannelOp(kraus, (0, 1))]
    planes = run_trajectories(2, prog, ntraj=3000, seed=7)
    rho = DensityMatrix(2).apply(_bell_prims()).apply_channel(kraus, (0, 1))
    for pauli in ("ZZ", "XX"):
        mean, se = trajectory_expectation(planes, pauli, 2)
        assert abs(mean - rho.expectation(pauli)) < 5 * max(se, 1e-3)


def test_pauli_sum_energy_with_noise():
    n = 2
    terms = [(0.5, "ZZ"), (0.25, "XI"), (-0.75, "XX")]
    chan = depolarizing(0.15)
    prog = _bell_prims() + [ChannelOp(chan, (0,)), ChannelOp(chan, (1,))]
    planes = run_trajectories(n, prog, ntraj=3000, seed=11)
    rho = (DensityMatrix(n).apply(_bell_prims())
           .apply_channel(chan, (0,)).apply_channel(chan, (1,)))
    exact = rho.expectation_sum(terms) + 1.5
    mean, se = trajectory_pauli_sum(planes, terms, n, constant=1.5)
    assert abs(mean - exact) < 5 * max(se, 1e-3)


def test_seeded_reproducibility():
    prog = _bell_prims() + [ChannelOp(depolarizing(0.3), (0,))]
    a = run_trajectories(2, prog, ntraj=64, seed=13)
    b = run_trajectories(2, prog, ntraj=64, seed=13)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    c = run_trajectories(2, prog, ntraj=64, seed=14)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_states_stay_normalized():
    prog = _bell_prims() + [ChannelOp(amplitude_damping(0.5), (0,)),
                            ChannelOp(depolarizing(0.4), (1,))]
    planes = run_trajectories(2, prog, ntraj=32, seed=17)
    norms = (np.asarray(planes[0]) ** 2 + np.asarray(planes[1]) ** 2).sum(1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_gate_objects_accepted_in_program():
    n = 2
    prog = [qt.on_just(0, qt.hadamard(), n), qt.cnot(0, 1, n),
            ChannelOp(phase_damping(0.2), (1,))]
    planes = run_trajectories(n, prog, ntraj=500, seed=19)
    mean, se = trajectory_expectation(planes, "ZZ", n)
    # phase damping never flips Z: ZZ stays exactly +1 on every trajectory
    assert abs(mean - 1.0) < 1e-5


def test_trajectory_sample_distribution():
    chan = depolarizing(0.25)
    prog = _bell_prims() + [ChannelOp(chan, (0,))]
    planes = run_trajectories(2, prog, ntraj=4000, seed=23)
    rho = DensityMatrix(2).apply(_bell_prims()).apply_channel(chan, (0,))
    from qubism_tpu.models.trajectories import trajectory_sample
    bits = trajectory_sample(planes, seed=1)
    assert bits.shape == (4000, 2)
    idx = bits[:, 0] * 2 + bits[:, 1]
    counts = np.bincount(idx, minlength=4)
    expected = rho.probs() * 4000
    chi2 = (((counts - expected) ** 2) / np.maximum(expected, 1e-9)).sum()
    assert chi2 < 25, (counts, expected)
