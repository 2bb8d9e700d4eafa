"""Density-matrix simulation (core/density.py) vs an independent dense
numpy oracle: unitary evolution, Kraus channels, measurement, purity,
expectations, and consistency with the pure-state path."""

import math

import jax
import numpy as np

from qubism_tpu.core.density import (DensityMatrix, amplitude_damping,
                                     bit_flip, depolarizing, phase_damping,
                                     phase_flip)
from qubism_tpu.core.gates import Prim
from qubism_tpu.models.circuits import brickwork_prims, ghz_prims
from qubism_tpu.ops.apply import complex_from_planes
from qubism_tpu.ops.fusion import CompiledCircuit

_H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
_CNOT = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                  [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
_PAULI = {"I": np.eye(2, dtype=complex),
          "X": np.array([[0, 1], [1, 0]], dtype=complex),
          "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
          "Z": np.array([[1, 0], [0, -1]], dtype=complex)}


def embed(u, targets, n):
    k = len(targets)
    full = np.kron(u, np.eye(1 << (n - k), dtype=complex))
    cur = list(targets) + [q for q in range(n) if q not in targets]
    perm = [cur.index(q) for q in range(n)]
    return (full.reshape((2,) * (2 * n))
            .transpose(perm + [n + p for p in perm])
            .reshape(1 << n, 1 << n))


def dense_pauli(pauli):
    m = np.array([[1.0]], dtype=complex)
    for c in pauli:
        m = np.kron(m, _PAULI[c])
    return m


def test_unitary_evolution_matches_dense():
    n = 3
    prims = brickwork_prims(n, depth=2, seed=3)
    dm = DensityMatrix(n).apply(prims)
    rho = np.zeros((8, 8), dtype=complex)
    rho[0, 0] = 1
    for p in prims:
        u = embed(p.dense(), p.targets, n)
        rho = u @ rho @ u.conj().T
    assert np.abs(dm.matrix() - rho).max() < 1e-5
    assert abs(dm.purity() - 1.0) < 1e-5
    assert abs(dm.trace() - 1.0) < 1e-5


def test_from_statevec_matches_projector():
    n = 3
    circ = CompiledCircuit(n, ghz_prims(n))
    planes = circ(circ.init_state())
    psi = complex_from_planes(planes)
    dm = DensityMatrix.from_statevec(planes)
    assert np.abs(dm.matrix() - np.outer(psi, psi.conj())).max() < 1e-5


def test_channels_match_dense_kraus():
    """Each standard channel, applied mid-circuit on each qubit of an
    entangled 2q state, matches the dense Kraus sum."""
    n = 2
    for chan in (depolarizing(0.2), amplitude_damping(0.35),
                 phase_damping(0.5), bit_flip(0.1), phase_flip(0.25)):
        for q in (0, 1):
            dm = DensityMatrix(n).apply(
                [Prim(_H, (0,)), Prim(_CNOT, (0, 1))])
            rho = dm.matrix()
            dm.apply_channel(chan, q)
            want = sum(embed(k, (q,), n) @ rho @ embed(k, (q,), n).conj().T
                       for k in chan)
            assert np.abs(dm.matrix() - want).max() < 1e-5
            assert abs(dm.trace() - 1.0) < 1e-5  # trace-preserving


def test_depolarizing_kills_purity_and_parity():
    """Full depolarization of one GHZ qubit: purity drops to 1/2 and the
    ZZ correlation with the untouched qubit dies."""
    dm = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_CNOT, (0, 1))])
    assert abs(dm.expectation("ZZ") - 1.0) < 1e-5
    assert abs(dm.expectation("XX") - 1.0) < 1e-5
    dm.apply_channel(depolarizing(0.75), 0)   # p=3/4: complete depolarize
    assert abs(dm.expectation("ZZ")) < 1e-5
    assert abs(dm.expectation("XX")) < 1e-5
    # I_0/2 (x) Tr_0(bell) = I/4: the maximally mixed 2q state
    assert abs(dm.purity() - 0.25) < 1e-5


def test_amplitude_damping_decay():
    """|1> under repeated T1 damping decays exponentially to |0>."""
    x = np.array([[0, 1], [1, 0]], dtype=complex)
    dm = DensityMatrix(1).apply(Prim(x, (0,)))
    for _ in range(3):
        dm.apply_channel(amplitude_damping(0.3), 0)
    assert abs(dm.prob_one(0) - 0.7 ** 3) < 1e-5


def test_expectation_matches_dense_and_statevec():
    n = 3
    prims = brickwork_prims(n, depth=2, seed=11)
    dm = DensityMatrix(n).apply(prims)
    rho = dm.matrix()
    from qubism_tpu.ops.measure import expectation_pauli

    circ = CompiledCircuit(n, prims)
    planes = circ(circ.init_state())
    for pauli in ("ZZI", "XIY", "IZX", "YYZ"):
        want = float(np.real(np.trace(dense_pauli(pauli) @ rho)))
        assert abs(dm.expectation(pauli) - want) < 1e-4
        assert abs(expectation_pauli(planes, n, pauli) - want) < 1e-4
    terms = [(0.5, "ZZI"), (-1.2, "XIY")]
    want = sum(c * float(np.real(np.trace(dense_pauli(p) @ rho)))
               for c, p in terms)
    assert abs(dm.expectation_sum(terms) - want) < 1e-4


def test_measure_qubit_collapses_ghz():
    counts = {0: 0, 1: 0}
    for seed in range(40):
        dm = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_CNOT, (0, 1))])
        out, _ = dm.measure_qubit(0, jax.random.PRNGKey(seed))
        counts[out] += 1
        # post-measurement: the OTHER qubit is perfectly correlated
        assert abs(dm.prob_one(1) - out) < 1e-5
        assert abs(dm.trace() - 1.0) < 1e-5
    assert counts[0] > 5 and counts[1] > 5


def test_noisy_circuit_probs_stay_normalized():
    """Interleave gates and noise on 4 qubits; diagonal stays a proper
    distribution and matches the dense oracle."""
    n = 4
    rng = np.random.default_rng(5)
    dm = DensityMatrix(n)
    rho = np.zeros((16, 16), dtype=complex)
    rho[0, 0] = 1
    for layer in range(3):
        for q in range(n):
            th, ph, lm = rng.uniform(0, 2 * math.pi, 3)
            from qubism_tpu.core.gates import u3_matrix

            u = u3_matrix(th, ph, lm, reference_bug=False)
            dm.apply(Prim(u, (q,)))
            rho = embed(u, (q,), n) @ rho @ embed(u, (q,), n).conj().T
        dm.apply(Prim(_CNOT, (layer % n, (layer + 1) % n)))
        c = embed(_CNOT, (layer % n, (layer + 1) % n), n)
        rho = c @ rho @ c.conj().T
        chan = depolarizing(0.1)
        q = layer % n
        dm.apply_channel(chan, q)
        rho = sum(embed(k, (q,), n) @ rho @ embed(k, (q,), n).conj().T
                  for k in chan)
    assert np.abs(dm.probs() - np.real(np.diag(rho))).max() < 1e-5
    assert abs(dm.probs().sum() - 1.0) < 1e-5
    assert np.abs(dm.matrix() - rho).max() < 1e-5


def test_sample_noisy_bell():
    """Sampling a bit-flipped Bell pair: the flip error shows up in the
    histogram at its channel rate."""
    dm = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_CNOT, (0, 1))])
    dm.apply_channel(bit_flip(0.2), 1)
    counts = dm.sample(20000, jax.random.PRNGKey(3))
    assert sum(counts.values()) == 20000
    good = (counts.get("00", 0) + counts.get("11", 0)) / 20000
    bad = (counts.get("01", 0) + counts.get("10", 0)) / 20000
    assert abs(good - 0.8) < 0.02 and abs(bad - 0.2) < 0.02
    # sampling is non-destructive
    assert abs(dm.trace() - 1.0) < 1e-5


def test_two_qubit_kraus_channel():
    """Multi-qubit Kraus sets route through the same path: a correlated
    two-qubit depolarizing channel matches the dense sum."""
    p = 0.3
    kraus = [math.sqrt(1 - p) * np.eye(4, dtype=complex)] + [
        math.sqrt(p / 3) * np.kron(_PAULI[a], _PAULI[a])
        for a in ("X", "Y", "Z")]
    dm = DensityMatrix(3).apply([Prim(_H, (0,)), Prim(_CNOT, (0, 2))])
    rho = dm.matrix()
    dm.apply_channel(kraus, (0, 2))
    want = sum(embed(k, (0, 2), 3) @ rho @ embed(k, (0, 2), 3).conj().T
               for k in kraus)
    assert np.abs(dm.matrix() - want).max() < 1e-5
    assert abs(dm.trace() - 1.0) < 1e-5
