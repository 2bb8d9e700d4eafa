"""Lindblad master-equation integration (models/dynamics.py tail).

Oracles: closed-form decay laws (amplitude damping, dephasing), the
textbook amplitude-damping Kraus pair, CPTP algebra (sum K^dag K = I),
and a dense superoperator expm of the FULL Liouvillian for coupled
Hamiltonian + dissipation evolution.
"""

import math

import numpy as np
import pytest

from qubism_tpu.core.density import DensityMatrix
from qubism_tpu.core.gates import Prim
from qubism_tpu.models.dynamics import (_expm, dissipator_kraus,
                                        lindblad_evolve)

_SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)  # sigma_minus
_X = np.array([[0, 1], [1, 0]], dtype=complex)
_Z = np.diag([1.0, -1.0]).astype(complex)
_H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)


def _liouvillian(h: np.ndarray, collapse) -> np.ndarray:
    """Dense row-major-vec Liouvillian for the oracle."""
    d = h.shape[0]
    eye = np.eye(d, dtype=complex)
    sup = -1j * (np.kron(h, eye) - np.kron(eye, h.T))
    for rate, L in collapse:
        ldl = L.conj().T @ L
        sup += rate * (np.kron(L, np.conj(L)) - 0.5 * np.kron(ldl, eye)
                       - 0.5 * np.kron(eye, ldl.T))
    return sup


def test_expm_matches_eig_oracle():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6))
    w, v = np.linalg.eig(a)
    want = v @ np.diag(np.exp(w)) @ np.linalg.inv(v)
    assert np.allclose(_expm(a), want, atol=1e-9)


def test_dissipator_kraus_is_amplitude_damping():
    # exp(dt D_{sigma-}) IS the amplitude-damping channel with
    # g = 1 - exp(-rate dt)
    rate, dt = 0.7, 0.3
    kraus = dissipator_kraus(_SM, rate, dt)
    g = 1.0 - math.exp(-rate * dt)
    want = [np.diag([1.0, math.sqrt(1.0 - g)]),
            np.array([[0.0, math.sqrt(g)], [0.0, 0.0]])]
    # compare as channels (Kraus sets are gauge-equivalent): act on a
    # basis of matrices
    for a in range(2):
        for b in range(2):
            e = np.zeros((2, 2), complex)
            e[a, b] = 1.0
            got = sum(k @ e @ k.conj().T for k in kraus)
            ref = sum(k @ e @ k.conj().T for k in want)
            assert np.allclose(got, ref, atol=1e-9), (a, b)


def test_dissipator_kraus_trace_preserving():
    rng = np.random.default_rng(3)
    for d in (2, 4):
        L = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        kraus = dissipator_kraus(L, 0.5, 0.2)
        tp = sum(k.conj().T @ k for k in kraus)
        assert np.allclose(tp, np.eye(d), atol=1e-9)


def test_pure_decay_exponential():
    # |1> under sigma- decay, no H: P(1)(t) = exp(-rate t), EXACT at any
    # step count (single dissipator, no splitting error)
    rate, t = 0.9, 1.3
    rho = DensityMatrix(1).apply(Prim(_X, (0,)))
    lindblad_evolve(rho, [], [(rate, _SM, 0)], t, steps=3)
    assert rho.prob_one(0) == pytest.approx(math.exp(-rate * t), abs=1e-6)
    assert rho.trace() == pytest.approx(1.0, abs=1e-6)


def test_dephasing_decay_of_coherence():
    # |+> under sigma_z dephasing: <X>(t) = exp(-2 rate t)
    rate, t = 0.4, 0.8
    rho = DensityMatrix(1).apply(Prim(_H, (0,)))
    _, vals = lindblad_evolve(rho, [], [(rate, _Z, 0)], t, steps=4,
                              observables=["X"])
    assert vals[0][0] == pytest.approx(1.0, abs=1e-6)
    assert vals[-1][0] == pytest.approx(math.exp(-2 * rate * t), abs=1e-6)


def test_rabi_with_decay_vs_dense_oracle():
    # H = (Omega/2) X with sigma- decay from |1>: compare <Z>(t) against
    # the exact expm of the full Liouvillian
    omega, rate, t = 2.0, 0.5, 1.5
    h_terms = [(omega / 2.0, "X")]
    rho = DensityMatrix(1).apply(Prim(_X, (0,)))
    rho0 = rho.matrix()
    lindblad_evolve(rho, h_terms, [(rate, _SM, 0)], t, steps=400)
    sup = _liouvillian((omega / 2.0) * _X, [(rate, _SM)])
    want = (_expm(sup * t) @ rho0.reshape(-1)).reshape(2, 2)
    assert np.allclose(rho.matrix(), want, atol=2e-4)
    assert rho.expectation("Z") == pytest.approx(
        float(np.real(np.trace(_Z @ want))), abs=2e-4)


def test_two_qubit_coupled_vs_dense_oracle():
    # H = ZZ + 0.7(XI + IX), decay on qubit 1 only: full 4x4 oracle
    t, rate = 0.9, 0.6
    h_terms = [(1.0, "ZZ"), (0.7, "XI"), (0.7, "IX")]
    rho = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_X, (1,))])
    rho0 = rho.matrix()
    _, vals = lindblad_evolve(rho, h_terms, [(rate, _SM, 1)], t,
                              steps=300, observables=["ZI", "IZ", "XX"])
    zz = np.kron(_Z, np.eye(2))
    h = (np.kron(_Z, _Z) + 0.7 * (np.kron(_X, np.eye(2))
                                  + 0.7 / 0.7 * np.kron(np.eye(2), _X)))
    L1 = np.kron(np.eye(2), _SM)
    want = (_expm(_liouvillian(h, [(rate, L1)]) * t)
            @ rho0.reshape(-1)).reshape(4, 4)
    assert np.allclose(rho.matrix(), want, atol=5e-4)
    assert vals[-1][0] == pytest.approx(
        float(np.real(np.trace(zz @ want))), abs=5e-4)
    # f32 engine: ~1e-7 relative rounding per channel/prim application
    # accumulates over 300 steps
    assert rho.trace() == pytest.approx(1.0, abs=1e-4)


def test_strang_order_two_convergence():
    # splitting error ~ 1/steps^2: quartering steps should grow the
    # error ~16x (allow a loose window)
    omega, rate, t = 2.0, 0.8, 1.0
    sup = _liouvillian((omega / 2.0) * _X, [(rate, _SM)])
    errs = []
    for steps in (40, 10):
        rho = DensityMatrix(1).apply(Prim(_X, (0,)))
        lindblad_evolve(rho, [(omega / 2.0, "X")], [(rate, _SM, 0)], t,
                        steps=steps)
        want = (_expm(sup * t)
                @ np.diag([0.0, 1.0]).astype(complex).reshape(-1)
                ).reshape(2, 2)
        errs.append(float(np.abs(rho.matrix() - want).max()))
    ratio = errs[1] / max(errs[0], 1e-15)
    assert 6.0 < ratio < 40.0, (errs, ratio)


def test_purity_decreases_trace_stays():
    rho = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_H, (1,))])
    p0 = rho.purity()
    lindblad_evolve(rho, [(0.5, "ZZ")], [(0.3, _Z, 0), (0.2, _SM, 1)],
                    1.0, steps=20)
    assert rho.purity() < p0 - 0.05
    assert rho.trace() == pytest.approx(1.0, abs=1e-4)


# -- MCWF unraveling --------------------------------------------------------------


@pytest.mark.slow
def test_mcwf_matches_exact_density():
    # damped Rabi at n=1: trajectory means converge to lindblad_evolve
    from qubism_tpu.models.dynamics import lindblad_mcwf

    omega, rate, t = 2.0, 0.5, 1.2
    h_terms = [(omega / 2.0, "X")]
    rho = DensityMatrix(1).apply(Prim(_X, (0,)))
    lindblad_evolve(rho, h_terms, [(rate, _SM, 0)], t, steps=60)
    want = rho.expectation("Z")
    _, est = lindblad_mcwf(1, [Prim(_X, (0,))], h_terms,
                           [(rate, _SM, 0)], t, steps=60, ntraj=800,
                           observables=["Z"], seed=2)
    mean, se = est[0]
    assert se > 0.0
    assert abs(mean - want) < 4 * se + 0.01


@pytest.mark.slow
def test_mcwf_two_qubit_dephasing():
    from qubism_tpu.models.dynamics import lindblad_mcwf

    rate, t = 0.4, 0.7
    rho = DensityMatrix(2).apply([Prim(_H, (0,)), Prim(_H, (1,))])
    lindblad_evolve(rho, [(1.0, "ZZ")], [(rate, _Z, 0)], t, steps=40)
    _, est = lindblad_mcwf(2, [Prim(_H, (0,)), Prim(_H, (1,))],
                           [(1.0, "ZZ")], [(rate, _Z, 0)], t, steps=40,
                           ntraj=600, observables=["XX", "ZI"], seed=5)
    for pauli, (mean, se) in zip(["XX", "ZI"], est):
        assert abs(mean - rho.expectation(pauli)) < 4 * se + 0.02, pauli


def test_mcwf_scales_to_ten_qubits():
    # the point of the unraveling: n=10 (rho would be 2^20) runs light
    from qubism_tpu.models.dynamics import lindblad_mcwf

    h_terms = [(0.5, "Z" + "I" * 9)]
    planes, est = lindblad_mcwf(10, [Prim(_H, (0,))], h_terms,
                                [(0.3, _SM, 0)], 0.5, steps=5, ntraj=32,
                                observables=["Z" + "I" * 9], seed=1)
    assert planes[0].shape == (32, 1 << 10)
    mean, se = est[0]
    assert np.isfinite(mean) and np.isfinite(se)
    # sigma- decay pushes <Z> up from 0 toward +1 (|0> is the sink)
    assert mean > 0.0
