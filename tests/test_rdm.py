"""Reduced density matrices / entanglement entropies vs dense partial
traces."""

import math

import numpy as np

from qubism_tpu.models.circuits import brickwork_prims, ghz_prims
from qubism_tpu.ops.apply import complex_from_planes, zero_state
from qubism_tpu.ops.fusion import CompiledCircuit
from qubism_tpu.ops.rdm import (entanglement_entropy,
                                reduced_density_matrix, renyi2_entropy)


def state(n, prims):
    circ = CompiledCircuit(n, prims)
    return circ(circ.init_state())


def dense_rdm(psi, n, subset):
    """Independent dense partial trace (subset order = row bit order)."""
    keep = list(subset)
    rest = [q for q in range(n) if q not in keep]
    perm = keep + rest
    t = psi.reshape((2,) * n).transpose(perm).reshape(1 << len(keep), -1)
    return t @ t.conj().T


def test_ghz_single_qubit_entropy():
    n = 6
    planes = state(n, ghz_prims(n))
    for q in (0, 3, 5):
        s = entanglement_entropy(planes, n, (q,))
        assert abs(s - math.log(2)) < 1e-5
        assert abs(entanglement_entropy(planes, n, (q,), base=2) - 1.0) < 1e-5
    # any bipartition of GHZ has entropy ln 2
    assert abs(entanglement_entropy(planes, n, (0, 1, 2)) - math.log(2)) < 1e-5


def test_product_state_zero_entropy():
    from qubism_tpu.core.gates import Prim

    h = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
    n = 4
    planes = state(n, [Prim(h, (q,)) for q in range(n)])
    assert abs(entanglement_entropy(planes, n, (1, 2))) < 1e-5
    assert abs(renyi2_entropy(planes, n, (0, 3))) < 1e-5


def test_rdm_matches_dense_partial_trace():
    n = 6
    prims = brickwork_prims(n, depth=3, seed=7)
    planes = state(n, prims)
    psi = complex_from_planes(planes)
    for subset in ((0,), (2, 4), (5, 1), (0, 1, 2), (4, 2, 0)):
        got = reduced_density_matrix(planes, n, subset)
        want = dense_rdm(psi, n, subset)
        assert np.abs(got - want).max() < 1e-5, subset
        # entropies against dense eigenvalues
        w = np.linalg.eigvalsh(want)
        w = w[w > 1e-12]
        s_want = float(-(w * np.log(w)).sum())
        assert abs(entanglement_entropy(planes, n, subset) - s_want) < 1e-4
        r2 = -np.log(np.real(np.trace(want @ want)))
        assert abs(renyi2_entropy(planes, n, subset) - r2) < 1e-4


def test_rdm_validation():
    import pytest

    planes = state(3, ghz_prims(3))
    with pytest.raises(ValueError):
        reduced_density_matrix(planes, 3, (0, 0))
    with pytest.raises(ValueError):
        reduced_density_matrix(planes, 3, (5,))


def test_statevec_methods():
    import qubism_tpu as qt

    sv = (qt.cnot(0, 1, 2) @ qt.on_just(0, qt.hadamard(), 2))(
        qt.mk_state_vec(2))
    assert abs(sv.entanglement_entropy((0,), base=2) - 1.0) < 1e-5
    rho = sv.reduced_density_matrix((1,))
    assert np.abs(rho - np.eye(2) / 2).max() < 1e-5
