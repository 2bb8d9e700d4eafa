"""Trotterized Hamiltonian dynamics (models/dynamics.py).

Oracles: dense numpy evolution — exact ``expm(-iHt)`` via Hermitian
eigendecomposition, and the exact per-term product for the Trotter
sequence itself (so engine application is pinned at 1e-6 independently
of Trotter error, and the Trotter error RATES are pinned against the
exact propagator).
"""

import numpy as np
import pytest

from qubism_tpu.core.statevec import StateVec
from qubism_tpu.models.dynamics import (evolve, evolve_observed,
                                        pauli_rotation_prim,
                                        trotter_prims, trotter_step_prims)
from qubism_tpu.models.hamiltonians import heisenberg_xxz, tfim

_PAULI = {"I": np.eye(2, dtype=complex),
          "X": np.array([[0, 1], [1, 0]], dtype=complex),
          "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
          "Z": np.array([[1, 0], [0, -1]], dtype=complex)}


def _dense_pauli(pauli: str) -> np.ndarray:
    m = np.array([[1.0 + 0j]])
    for c in pauli:
        m = np.kron(m, _PAULI[c])
    return m


def _dense_h(terms, n: int) -> np.ndarray:
    h = np.zeros((1 << n, 1 << n), dtype=complex)
    for c, p in terms:
        h += c * _dense_pauli(p)
    return h


def _expm_herm(h: np.ndarray, t: float) -> np.ndarray:
    """exp(-i h t) for Hermitian h."""
    w, v = np.linalg.eigh(h)
    return (v * np.exp(-1j * w * t)) @ v.conj().T


def _prim_dense(prim, n: int) -> np.ndarray:
    """Embed a Prim into the full 2^n x 2^n matrix (targets[0] = MSB)."""
    u = prim.dense()
    k = len(prim.targets)
    full = np.zeros((1 << n, 1 << n), dtype=complex)
    others = [q for q in range(n) if q not in prim.targets]
    for col in range(1 << n):
        loc = 0
        for j, q in enumerate(prim.targets):
            loc |= ((col >> (n - 1 - q)) & 1) << (k - 1 - j)
        for loc2 in range(1 << k):
            row = col
            for j, q in enumerate(prim.targets):
                bit = (loc2 >> (k - 1 - j)) & 1
                row = (row & ~(1 << (n - 1 - q))) | (bit << (n - 1 - q))
            full[row, col] += u[loc2, loc]
        _ = others
    return full


def _random_state(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return v / np.linalg.norm(v)


# -- pauli_rotation_prim ------------------------------------------------------

@pytest.mark.parametrize("pauli", ["XX", "ZZ", "YY", "XY", "ZIZ", "IZI",
                                   "XIZ", "Y", "ZZZ"])
def test_rotation_prim_is_exact_exponential(pauli):
    theta = 0.731
    prim = pauli_rotation_prim(theta, pauli)
    n = len(pauli)
    got = _prim_dense(prim, n)
    want = _expm_herm(_dense_pauli(pauli), theta / 2.0)
    assert np.allclose(got, want, atol=1e-12)


def test_rotation_prim_z_strings_are_diagonal():
    prim = pauli_rotation_prim(0.4, "ZIZZ")
    assert prim.diag
    assert prim.targets == (0, 2, 3)


def test_rotation_prim_identity_is_none():
    assert pauli_rotation_prim(0.9, "III") is None


def test_rotation_prim_rejects_wide_support():
    with pytest.raises(ValueError, match="weight"):
        pauli_rotation_prim(0.1, "X" * 7)


def test_trotter_rejects_bad_order():
    with pytest.raises(ValueError, match="order"):
        trotter_step_prims([(1.0, "XX")], 0.1, order=3)
    with pytest.raises(ValueError, match="steps"):
        trotter_prims([(1.0, "XX")], 0.1, steps=0)


# -- engine application matches the dense per-term product -------------------

@pytest.mark.parametrize("order", [1, 2])
def test_engine_matches_dense_trotter_product(order):
    n = 4
    terms, _ = tfim(n, j=0.9, h=0.6)
    t, steps = 0.37, 3
    prims = trotter_prims(terms, t, steps, order)
    psi0 = _random_state(n, seed=5)

    want = psi0.copy()
    for p in prims:
        want = _prim_dense(p, n) @ want

    sv = evolve(StateVec.from_amplitudes(psi0), terms, t, steps, order)
    assert np.linalg.norm(sv.amps - want) < 1e-5


# -- Trotter error rates vs the exact propagator ------------------------------

def _trotter_error(terms, n, t, steps, order, psi0):
    exact = _expm_herm(_dense_h(terms, n), t) @ psi0
    got = evolve(StateVec.from_amplitudes(psi0), terms, t, steps, order).amps
    return np.linalg.norm(got - exact)


def test_first_order_converges_linearly():
    n = 3
    terms, _ = heisenberg_xxz(n, jxy=0.8, jz=0.5, field=0.3)
    psi0 = _random_state(n, seed=11)
    e1 = _trotter_error(terms, n, 0.9, 8, 1, psi0)
    e2 = _trotter_error(terms, n, 0.9, 16, 1, psi0)
    assert e1 > 1e-4  # the probe is actually sensitive
    assert e1 / e2 == pytest.approx(2.0, rel=0.35)


def test_strang_converges_quadratically_and_beats_first_order():
    n = 3
    terms, _ = heisenberg_xxz(n, jxy=0.8, jz=0.5, field=0.3)
    psi0 = _random_state(n, seed=11)
    e1 = _trotter_error(terms, n, 0.9, 8, 2, psi0)
    e2 = _trotter_error(terms, n, 0.9, 16, 2, psi0)
    assert e1 / e2 == pytest.approx(4.0, rel=0.35)
    assert e1 < _trotter_error(terms, n, 0.9, 8, 1, psi0)


def test_tfim_quench_matches_exact_propagator():
    """A physical quench: |0...0> under critical TFIM, strang steps."""
    n = 5
    terms, _ = tfim(n, j=1.0, h=1.0)
    psi0 = np.zeros(1 << n, dtype=complex)
    psi0[0] = 1.0
    err = _trotter_error(terms, n, 1.0, 64, 2, psi0)
    assert err < 2e-3


# -- evolve_observed -----------------------------------------------------------

def test_evolve_observed_records_magnetization():
    n = 4
    terms, _ = tfim(n, j=1.0, h=1.0)
    sv = StateVec.zero(n)
    obs = ["Z" + "I" * (n - 1), terms]  # single string and a Pauli-sum
    times, values, final = evolve_observed(sv, terms, obs, t=0.8, steps=16,
                                           record_every=4)
    assert times.shape == (5,)
    assert values.shape == (5, 2)
    # t=0 point: <Z_0> = 1 on |0...0>, and <H>(0) = sum of -h X terms = 0
    # offsets... compute directly:
    assert values[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert values[0, 1] == pytest.approx(StateVec.zero(n).expectation_sum(terms),
                                         abs=1e-6)
    # energy is conserved by exp(-iHt); Trotter breaks it only at O(dt^2)
    assert np.all(np.abs(values[:, 1] - values[0, 1]) < 2e-2)
    # magnetization decays from 1 under the transverse field
    assert values[-1, 0] < 0.95
    # the returned final state matches a direct evolve()
    direct = evolve(StateVec.zero(n), terms, 0.8, 16)
    assert np.linalg.norm(final.amps - direct.amps) < 1e-5


def test_evolve_observed_rejects_bad_record_every():
    sv = StateVec.zero(2)
    terms, _ = tfim(2)
    with pytest.raises(ValueError, match="record_every"):
        evolve_observed(sv, terms, ["ZI"], t=0.1, steps=5, record_every=2)


def test_evolve_does_not_invalidate_input_state():
    n = 3
    terms, _ = tfim(n)
    sv = StateVec.zero(n)
    _ = evolve(sv, terms, 0.3, 4)
    # the original state must still be readable (no donated-buffer error)
    assert sv.amps[0] == pytest.approx(1.0, abs=1e-6)


# -- imaginary-time evolution ---------------------------------------------------

from qubism_tpu.models.dynamics import (imaginary_time_evolve,  # noqa: E402
                                        ite_step_prims, pauli_exp_prim)


@pytest.mark.parametrize("pauli", ["XX", "ZZ", "XY", "ZIZ", "Y"])
def test_pauli_exp_prim_is_exact(pauli):
    a = 0.37
    prim = pauli_exp_prim(a, pauli)
    n = len(pauli)
    got = _prim_dense(prim, n)
    w, v = np.linalg.eigh(_dense_pauli(pauli))
    want = (v * np.exp(-a * w)) @ v.conj().T
    assert np.allclose(got, want, atol=1e-12)


def test_pauli_exp_prim_z_is_diag_identity_none():
    assert pauli_exp_prim(0.2, "ZZI").diag
    assert pauli_exp_prim(0.2, "II") is None
    with pytest.raises(ValueError, match="order"):
        ite_step_prims([(1.0, "X")], 0.1, order=3)


def test_ite_matches_dense_projection():
    """The Trotterized exp(-tau H) matches the dense operator (normalized)."""
    n = 3
    terms, _ = tfim(n, j=1.1, h=0.7)
    psi0 = _random_state(n, seed=2)
    tau, steps = 0.6, 48
    want = _expm_herm(_dense_h(terms, n), -1j * tau) @ psi0  # exp(-tau H)
    want = want / np.linalg.norm(want)
    got, _ = imaginary_time_evolve(StateVec.from_amplitudes(psi0), terms,
                                   tau, steps)
    assert np.linalg.norm(got.amps - want) < 2e-3


def test_ite_converges_to_ground_state():
    n = 5
    terms, _ = tfim(n, j=1.0, h=1.0)
    h = _dense_h(terms, n)
    e0 = np.linalg.eigvalsh(h)[0]
    sv, energies = imaginary_time_evolve(StateVec.zero(n), terms,
                                         tau=6.0, steps=120,
                                         record_energy=True)
    assert energies[-1] == pytest.approx(e0, abs=2e-2)
    # monotone decrease up to Trotter/f32 noise
    e = np.array(energies)
    assert np.all(np.diff(e) < 1e-3)
    # agrees with the variational surface's independent energy
    assert sv.expectation_sum(terms) == pytest.approx(e0, abs=2e-2)


def test_ite_input_state_survives():
    sv = StateVec.zero(3)
    terms, _ = tfim(3)
    imaginary_time_evolve(sv, terms, 0.5, 4)
    assert sv.amps[0] == pytest.approx(1.0, abs=1e-6)


# -- dynamic correlation functions ------------------------------------------------


def test_correlation_single_qubit_phase():
    # H = -(w/2) Z: |0> is the ground state (E = -w/2), X connects it to
    # |1> (E = +w/2), so C(t) = <X(t)X> = e^{-i w t} exactly (diagonal
    # Trotter factors are exact)
    from qubism_tpu.models.dynamics import correlation_observed

    w, t, steps = 2.0, 3.0, 48
    times, corr = correlation_observed(StateVec.zero(1), [(-w / 2.0, "Z")],
                                       "X", "X", t, steps)
    assert len(times) == steps + 1
    want = np.exp(-1j * w * times)
    assert np.allclose(corr, want, atol=1e-5)


def test_correlation_matches_dense_oracle():
    # 3-qubit XXZ chain, C(t) = <psi| Z1(t) X0 |psi> from a random state:
    # dense expm oracle
    from qubism_tpu.models.dynamics import _expm, correlation_observed
    from qubism_tpu.models.hamiltonians import heisenberg_xxz
    from qubism_tpu.models.tomography import pauli_matrix

    n, t, steps = 3, 1.0, 400
    terms = heisenberg_xxz(n, jxy=1.0, jz=0.7)
    if isinstance(terms, tuple):
        terms = terms[0]
    rng = np.random.default_rng(5)
    psi0 = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi0 /= np.linalg.norm(psi0)
    times, corr = correlation_observed(StateVec.from_amplitudes(psi0),
                                       terms, "IZI", "XII", t, steps,
                                       record_every=100)
    h = sum(c * pauli_matrix(p) for c, p in terms)
    a = pauli_matrix("IZI")
    b = pauli_matrix("XII")
    for tk, ck in zip(times, corr):
        u = _expm(-1j * h * tk)
        want = psi0.conj() @ (u.conj().T @ a @ u @ b @ psi0)
        assert abs(ck - want) < 2e-3, (tk, ck, want)


def test_spectral_peak_at_excitation_energy():
    from qubism_tpu.models.dynamics import (correlation_observed,
                                            spectral_function)

    w = 3.0
    # long record for frequency resolution; exact factors (diagonal H)
    times, corr = correlation_observed(StateVec.zero(1), [(-w / 2.0, "Z")],
                                       "X", "X", 2.0 * np.pi * 8 / w, 256)
    omegas, s = spectral_function(times, corr)
    peak = float(omegas[int(np.argmax(np.abs(s)))])
    # resolution = 2 pi / t_max = w / 8
    assert abs(peak - w) < w / 8 + 1e-9


def test_correlation_rejects_bad_record_every():
    from qubism_tpu.models.dynamics import correlation_observed

    with pytest.raises(ValueError):
        correlation_observed(StateVec.zero(1), [(1.0, "Z")], "X", "X",
                             1.0, 10, record_every=3)
