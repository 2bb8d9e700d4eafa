"""Shor order finding + factoring (models/shor.py).

Oracles: number theory — orders verified by pow(a, r, N), factors by
multiplication."""

import math

import numpy as np
import pytest

from qubism_tpu.models.shor import (controlled_mod_mult_prim, estimate_order,
                                    mod_mult_matrix, phase_to_order,
                                    shor_factor, shor_order_prims)


def test_mod_mult_matrix_is_permutation_and_correct():
    u = mod_mult_matrix(7, 15, 4)
    assert np.allclose(u @ u.conj().T, np.eye(16))
    for x in range(15):
        y = np.argmax(np.abs(u[:, x]))
        assert y == (7 * x) % 15
    assert u[15, 15] == 1  # unused basis state fixed


def test_mod_mult_matrix_validates():
    with pytest.raises(ValueError, match="factor"):
        mod_mult_matrix(6, 15, 4)
    with pytest.raises(ValueError, match="2\\^"):
        mod_mult_matrix(7, 15, 3)


def test_controlled_prim_blocks():
    p = controlled_mod_mult_prim(2, 5, 0, (1, 2, 3))
    u = p.u
    assert np.allclose(u[:8, :8], np.eye(8))        # control=0: identity
    assert np.allclose(u[8:, 8:], mod_mult_matrix(2, 5, 3))


def test_phase_to_order():
    assert 4 in phase_to_order(0.25, 15)
    assert 3 in phase_to_order(1.0 / 3.0, 15)
    assert phase_to_order(0.0, 15) == []
    # 1/6 measured with t=9 bits: 85/512 = 0.166015 still decodes to 6
    assert 6 in phase_to_order(85.0 / 512.0, 21)


@pytest.mark.parametrize("a,n_mod,t,want", [
    (7, 15, 6, 4), (4, 15, 6, 2), (11, 15, 6, 2), (2, 15, 6, 4),
    (2, 21, 9, 6),
])
def test_estimate_order(a, n_mod, t, want):
    r = estimate_order(a, n_mod, t=t, shots=48, seed=3)
    assert r == want
    assert pow(a, r, n_mod) == 1


def test_order_circuit_shape():
    prims, n = shor_order_prims(7, 15, t=5)
    assert n == 5 + 4
    # 1 X + 5 H + 5 controlled mults + inverse QFT (10 diag + 5 H)
    assert len(prims) == 1 + 5 + 5 + 10 + 5


def test_shor_factors_15():
    p, q = shor_factor(15, seed=1)
    assert sorted((p, q)) == [3, 5]


def test_shor_factors_21():
    p, q = shor_factor(21, seed=1, t=9)
    assert sorted((p, q)) == [3, 7]


def test_classical_shortcuts():
    assert shor_factor(8) == (2, 4)
    assert sorted(shor_factor(9)) == [3, 3]
    assert sorted(shor_factor(25)) == [5, 5]
    with pytest.raises(ValueError):
        shor_factor(3)


def test_factors_multiply_back():
    for n_mod in (15, 21):
        p, q = shor_factor(n_mod, seed=2, t=9)
        assert p * q == n_mod and 1 < p < n_mod
        assert math.gcd(p, q) in (1, p)
