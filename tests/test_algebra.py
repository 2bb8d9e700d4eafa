"""Law-based property tests for the algebra layer.

Ports the reference's property library (test/Qubism/AlgebraTests.hs:25-59):
vector-space laws, Hilbert-space laws, algebra bilinearity — plus the
commutator identities. Random instances, fixed seed, tolerant comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qubism_tpu.core import algebra as alg

TOL = 1e-5


def rand_vec(rng, dim):
    v = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    return jnp.asarray(v.astype(np.complex64))


def rand_mat(rng, dim):
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    return jnp.asarray(m.astype(np.complex64))


def close(a, b, tol=TOL):
    return float(jnp.linalg.norm(jnp.asarray(a) - jnp.asarray(b))) < tol


@pytest.mark.parametrize("dim", [2, 8])
def test_vector_space_laws(rng, dim):
    for _ in range(20):
        a, b, c = (rand_vec(rng, dim) for _ in range(3))
        z = complex(rng.normal(), rng.normal())
        w = complex(rng.normal(), rng.normal())
        # associativity & commutativity of +:
        assert close(alg.add(alg.add(a, b), c), alg.add(a, alg.add(b, c)))
        assert close(alg.add(a, b), alg.add(b, a))
        # identity & inverse
        assert close(alg.add(a, alg.zero_like(a)), a)
        assert close(alg.add(a, alg.neg(a)), alg.zero_like(a))
        # distributivity of .: over +: and scalar addition
        assert close(alg.scale(z, alg.add(a, b)), alg.add(alg.scale(z, a), alg.scale(z, b)))
        assert close(alg.scale(z + w, a), alg.add(alg.scale(z, a), alg.scale(w, a)))
        # compatibility of scalar multiplication
        assert close(alg.scale(z * w, a), alg.scale(z, alg.scale(w, a)))


@pytest.mark.parametrize("dim", [2, 8])
def test_hilbert_space_laws(rng, dim):
    for _ in range(20):
        a, b, c = (rand_vec(rng, dim) for _ in range(3))
        z = complex(rng.normal(), rng.normal())
        # linearity in the second argument
        lhs = alg.inner(a, alg.add(alg.scale(z, b), c))
        rhs = z * alg.inner(a, b) + alg.inner(a, c)
        assert abs(complex(lhs) - complex(rhs)) < TOL * 10
        # conjugate symmetry
        assert abs(complex(alg.inner(a, b)) - complex(alg.inner(b, a)).conjugate()) < TOL
        # norm is induced by the inner product and non-negative
        assert abs(float(alg.norm(a)) ** 2 - complex(alg.inner(a, a)).real) < TOL * 10


@pytest.mark.parametrize("dim", [2, 4])
def test_algebra_bilinearity(rng, dim):
    for _ in range(20):
        a, b, c = (rand_mat(rng, dim) for _ in range(3))
        z = complex(rng.normal(), rng.normal())
        assert close(alg.mul(alg.add(a, b), c), alg.add(alg.mul(a, c), alg.mul(b, c)), 1e-3)
        assert close(alg.mul(a, alg.add(b, c)), alg.add(alg.mul(a, b), alg.mul(a, c)), 1e-3)
        assert close(alg.mul(alg.scale(z, a), b), alg.scale(z, alg.mul(a, b)), 1e-3)


def test_commutator_identities(rng):
    a, b = rand_mat(rng, 4), rand_mat(rng, 4)
    assert close(alg.commutator(a, b), alg.neg(alg.commutator(b, a)), 1e-3)
    assert close(
        alg.add(alg.commutator(a, b), alg.anticommutator(a, b)),
        alg.scale(2.0, alg.mul(a, b)),
        1e-3,
    )


def test_pauli_commutators():
    from qubism_tpu.core.gates import pauli_x, pauli_y, pauli_z

    X = pauli_x().matrix()
    Y = pauli_y().matrix()
    Z = pauli_z().matrix()
    # [X, Y] = 2iZ; {X, Y} = 0
    assert close(alg.commutator(X, Y), alg.scale(2j, Z))
    assert close(alg.anticommutator(X, Y), alg.zero_like(X))
