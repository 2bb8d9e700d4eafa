"""State and process tomography (models/tomography.py).

Engine extension — the reference has neither mixed states nor tomography
(src/Qubism/StateVec.hs)."""

import math

import numpy as np
import pytest

from qubism_tpu.core.density import (DensityMatrix, amplitude_damping,
                                     depolarizing, depolarizing2)
from qubism_tpu.models.circuits import ghz_prims, w_state_prims
from qubism_tpu.models.tomography import (
    _BASIS_ROT,
    choi_from_kraus,
    exact_state_tomography,
    fidelity,
    pauli_matrix,
    pauli_strings,
    process_fidelity,
    process_tomography,
    project_to_physical,
    reconstruct_state,
    sampled_state_tomography,
)

_Z = np.diag([1.0, -1.0])
_H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)


def test_basis_rotations_map_to_z():
    for axis, u in _BASIS_ROT.items():
        p = pauli_matrix(axis)
        assert np.allclose(u @ p @ u.conj().T, _Z, atol=1e-12), axis


def test_exact_tomography_reconstructs_ghz():
    n = 3
    rho = DensityMatrix(n).apply(ghz_prims(n))
    exps = exact_state_tomography(rho)
    assert len(exps) == 4 ** n
    rec = reconstruct_state(exps, n)
    assert np.allclose(rec, rho.matrix(), atol=1e-5)


def test_exact_tomography_mixed_state():
    rho = DensityMatrix(1).apply([__import__("qubism_tpu").Prim(_H, (0,))]) \
        .apply_channel(depolarizing(0.3), (0,))
    rec = reconstruct_state(exact_state_tomography(rho), 1)
    assert np.allclose(rec, rho.matrix(), atol=1e-6)
    assert abs(np.trace(rec).real - 1.0) < 1e-6


def test_project_to_physical():
    # an unphysical linear-inversion artifact: negative eigenvalue
    rho = np.diag([0.7, 0.5, -0.2, 0.0]).astype(complex)
    phys = project_to_physical(rho)
    w = np.linalg.eigvalsh(phys)
    assert (w > -1e-12).all()
    assert abs(np.trace(phys).real - 1.0) < 1e-12
    # already-physical states pass through unchanged
    good = np.diag([0.25, 0.25, 0.25, 0.25]).astype(complex)
    assert np.allclose(project_to_physical(good), good, atol=1e-12)


def test_fidelity_properties():
    n = 2
    rho = DensityMatrix(n).apply(ghz_prims(n)).matrix()
    assert abs(fidelity(rho, rho) - 1.0) < 1e-6
    other = DensityMatrix(n).apply(w_state_prims(n)).matrix()
    f = fidelity(rho, other)
    assert 0.0 <= f < 1.0
    # pure states: F = |<a|b>|^2 = 1/2 for GHZ2 vs W2 = (|10>+|01>)/sqrt2? -> 0
    assert f < 0.1


def test_sampled_tomography_ghz():
    n = 2
    exps = sampled_state_tomography(ghz_prims(n), n, shots=4096, seed=3)
    rec = project_to_physical(reconstruct_state(exps, n))
    ideal = DensityMatrix(n).apply(ghz_prims(n)).matrix()
    assert fidelity(rec, ideal) > 0.97


def test_process_tomography_identity_and_unitary():
    k = 1
    choi_id = process_tomography(lambda r: r, k)
    assert np.allclose(choi_id, choi_from_kraus([np.eye(2)]), atol=1e-6)
    from qubism_tpu.core.gates import Prim
    choi_h = process_tomography(lambda r: r.apply([Prim(_H, (0,))]), k)
    assert np.allclose(choi_h, choi_from_kraus([_H]), atol=1e-6)
    assert abs(process_fidelity(choi_h, _H) - 1.0) < 1e-6
    # H vs the WRONG ideal (identity): F = |tr(I^dag H)|^2/d^2 = 0 (H traceless)
    assert abs(process_fidelity(choi_h, np.eye(2))) < 1e-6
    # and vs Z (also |tr(Z H)|^2/4 = |sqrt2|^2/4 = 1/2)
    assert abs(process_fidelity(choi_h, _Z.astype(complex)) - 0.5) < 1e-6


def test_process_tomography_depolarizing():
    p = 0.2
    kraus = depolarizing(p)
    choi = process_tomography(lambda r: r.apply_channel(kraus, (0,)), 1)
    assert np.allclose(choi, choi_from_kraus(kraus), atol=1e-6)
    # process fidelity of random-Pauli depolarizing vs identity = 1 - p
    assert abs(process_fidelity(choi, np.eye(2)) - (1 - p)) < 1e-6


def test_process_tomography_amplitude_damping():
    g = 0.35
    kraus = amplitude_damping(g)
    choi = process_tomography(lambda r: r.apply_channel(kraus, (0,)), 1)
    assert np.allclose(choi, choi_from_kraus(kraus), atol=1e-6)


def test_process_tomography_2q():
    p = 0.1
    kraus = depolarizing2(p)
    choi = process_tomography(lambda r: r.apply_channel(kraus, (0, 1)), 2)
    assert np.allclose(choi, choi_from_kraus(kraus), atol=1e-5)
    assert abs(process_fidelity(choi, np.eye(4)) - (1 - p)) < 1e-5


def test_pauli_strings_count():
    assert len(pauli_strings(3)) == 64
    with pytest.raises(ValueError):
        exact_state_tomography(DensityMatrix(6))


def test_characteristic_fn_pure_state_norm():
    from qubism_tpu.models.tomography import characteristic_fn

    n = 3
    chi = characteristic_fn(ghz_prims(n), n)
    # purity: sum chi^2 = 2^n; and chi(I..I) = 1
    assert abs(sum(v * v for v in chi.values()) - 2 ** n) < 1e-4
    assert abs(chi["I" * n] - 1.0) < 1e-6
    # GHZ stabilizers appear with chi = +-1
    assert abs(chi["XXX"] - 1.0) < 1e-5
    assert abs(chi["ZZI"] - 1.0) < 1e-5


def test_direct_fidelity_estimate_matches_overlap():
    """DFE of a depolarized GHZ state converges to the exact overlap
    <psi|rho|psi> computed from the density engine."""
    from qubism_tpu.models.tomography import direct_fidelity_estimate
    from qubism_tpu.ops.fusion import CompiledCircuit as _CC

    n = 3
    prims = ghz_prims(n)
    rho = DensityMatrix(n).apply(prims)
    for q in range(n):
        rho = rho.apply_channel(depolarizing(0.05), (q,))
    c = _CC(n, prims)
    psi = c.state_to_complex(c(c.init_state()))
    exact = float(np.real(psi.conj() @ rho.matrix() @ psi))
    est, se = direct_fidelity_estimate(
        prims, n, lambda p: rho.expectation(p), n_paulis=96, seed=1)
    assert abs(est - exact) < max(5 * se, 0.02), (est, exact, se)


def test_direct_fidelity_noiseless_is_one():
    from qubism_tpu.models.tomography import direct_fidelity_estimate

    n = 2
    rho = DensityMatrix(n).apply(ghz_prims(n))
    est, se = direct_fidelity_estimate(
        ghz_prims(n), n, lambda p: rho.expectation(p), n_paulis=16, seed=0)
    assert abs(est - 1.0) < 1e-5
    assert se < 1e-5
