"""Gate constructors, combinators, and application.

Covers what test/Qubism/QGateSpec.hs covers (algebraic structure of random
unitaries) plus what the reference never tested: unitarity (which would have
caught its u3 bug), combinator semantics against dense numpy kron references,
and the DSL teleportation example end-to-end."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qubism_tpu as qt
from qubism_tpu.core.gates import u3_matrix
from qubism_tpu.ops.apply import apply_gate

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Z = np.diag([1, -1]).astype(complex)
H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)


def mat(g):
    return np.asarray(g.matrix(jnp.complex64))


def kron(*ms):
    out = np.array([[1.0 + 0j]])
    for m in ms:
        out = np.kron(out, m)
    return out


def test_pauli_and_hadamard_matrices():
    assert np.allclose(mat(qt.pauli_x()), X, atol=1e-6)
    assert np.allclose(mat(qt.pauli_z()), Z, atol=1e-6)
    assert np.allclose(mat(qt.hadamard()), H, atol=1e-6)
    Y = np.array([[0, -1j], [1j, 0]])
    assert np.allclose(mat(qt.pauli_y()), Y, atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_u3_is_unitary(seed):
    rng = np.random.default_rng(seed)
    th, ph, lm = rng.uniform(0, 4 * np.pi, size=3)
    u = u3_matrix(th, ph, lm)
    assert np.allclose(u @ u.conj().T, I2, atol=1e-12)


def test_u3_special_values():
    # u1(λ) = U(0,0,λ) = diag(1, e^{iλ}) per spec
    lam = 0.7
    u = u3_matrix(0, 0, lam)
    assert np.allclose(u, np.diag([1, np.exp(1j * lam)]), atol=1e-12)
    # X = u3(pi, 0, pi)
    assert np.allclose(u3_matrix(np.pi, 0, np.pi), X, atol=1e-12)
    # H = u2(0, pi) = u3(pi/2, 0, pi)
    assert np.allclose(u3_matrix(np.pi / 2, 0, np.pi), H, atol=1e-12)


def test_u3_reference_bug_flag():
    """The compat flag reproduces the reference's broken u3: u1(λ) becomes a
    global phase e^{iλ/2}·I instead of diag(1, e^{iλ}) (SURVEY.md §2.4.1)."""
    lam = 0.7
    u = u3_matrix(0, 0, lam, reference_bug=True)
    assert np.allclose(u, np.exp(1j * lam / 2) * I2, atol=1e-12)
    # and non-unitary for generic parameters
    u2 = u3_matrix(np.pi / 3, 0.2, 0.7, reference_bug=True)
    assert not np.allclose(u2 @ u2.conj().T, I2, atol=1e-6)


def test_on_just_matches_kron():
    g = qt.on_just(1, qt.hadamard(), 3)
    assert np.allclose(mat(g), kron(I2, H, I2), atol=1e-6)
    g0 = qt.on_just(0, qt.pauli_x(), 2)
    assert np.allclose(mat(g0), kron(X, I2), atol=1e-6)


def test_on_every_and_on_range():
    assert np.allclose(mat(qt.on_every(qt.hadamard(), 2)), kron(H, H), atol=1e-6)
    g = qt.on_range(1, 2, qt.pauli_x(), 3)
    assert np.allclose(mat(g), kron(I2, X, X), atol=1e-6)


def test_cnot_matrix():
    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    assert np.allclose(mat(qt.cnot(0, 1, 2)), cx, atol=1e-6)
    # reversed control/target
    cx_rev = np.array([[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]], dtype=complex)
    assert np.allclose(mat(qt.cnot(1, 0, 2)), cx_rev, atol=1e-6)


def test_controlled_general():
    # controlled-H on qubit 0 controlling qubit 1
    ch = qt.controlled(0, qt.on_just(1, qt.hadamard(), 2))
    expected = np.eye(4, dtype=complex)
    expected[2:, 2:] = H
    assert np.allclose(mat(ch), expected, atol=1e-6)
    # controlled diag
    cz = qt.controlled(0, qt.on_just(1, qt.pauli_z(), 2))
    assert np.allclose(mat(cz), np.diag([1, 1, 1, -1]), atol=1e-6)


def test_composition_order():
    # (a @ b) applies b first, matching the reference Semigroup
    g = qt.pauli_x() @ qt.hadamard()
    assert np.allclose(mat(g), X @ H, atol=1e-6)
    assert np.allclose(mat(qt.hadamard().then(qt.pauli_x())), X @ H, atol=1e-6)


def test_kronecker():
    g = qt.kronecker(qt.pauli_x(), qt.hadamard())
    assert np.allclose(mat(g), kron(X, H), atol=1e-6)


def test_if_bit():
    g1 = qt.if_bit(1, qt.on_just(0, qt.pauli_x(), 1))
    g0 = qt.if_bit(0, qt.on_just(0, qt.pauli_x(), 1))
    assert np.allclose(mat(g1), X, atol=1e-6)
    assert np.allclose(mat(g0), I2, atol=1e-6)


def test_gate_equality():
    assert qt.hadamard() @ qt.hadamard() == qt.ident(1)
    assert qt.pauli_x() != qt.pauli_z()


def test_apply_gate_arbitrary_target_order(rng):
    """apply_gate must honor target ordering (targets[0] = MSB of gate index)."""
    n = 3
    v = rng.normal(size=8) + 1j * rng.normal(size=8)
    v = (v / np.linalg.norm(v)).astype(np.complex64)
    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    # control qubit 2, target qubit 0 — unsorted targets
    from qubism_tpu.ops.apply import complex_from_planar, planar_from_complex

    got = complex_from_planar(apply_gate(jnp.asarray(planar_from_complex(v)), cx, (2, 0), n))
    # dense reference: embed via permutation of kron(cx, I) with qubit order (2,0,1)
    full = np.zeros((8, 8), dtype=complex)
    for idx in range(8):
        b = [(idx >> (n - 1 - q)) & 1 for q in range(n)]  # big-endian bits
        c, t = b[2], b[0]
        t2 = t ^ c
        out = (t2 << 2) | (b[1] << 1) | b[2]
        full[out, idx] = 1
    assert np.allclose(got, full @ v, atol=1e-6)


def test_teleportation_dsl():
    """Port of examples/Teleportation.hs:20-29 — teleport a random qubit."""
    rng = np.random.default_rng(42)
    for seed in range(6):
        a, b = rng.normal(size=2) + 1j * rng.normal(size=2)
        nrm = np.sqrt(abs(a) ** 2 + abs(b) ** 2)
        alice = qt.StateVec(1, jnp.array([a / nrm, b / nrm], dtype=jnp.complex64))

        pair = (qt.cnot(0, 1, 2) @ qt.on_just(0, qt.hadamard(), 2))(qt.mk_state_vec(2))
        total = alice.tensor(pair)

        s = qt.Session(total, seed=seed)
        s.gate(qt.cnot(0, 1, 3))
        s.gate(qt.on_just(0, qt.hadamard(), 3))
        c0 = s.measure_qubit(0)
        c1 = s.measure_qubit(1)
        s.gate(qt.if_bit(c0, qt.on_just(2, qt.pauli_z(), 3)))
        s.gate(qt.if_bit(c1, qt.on_just(2, qt.pauli_x(), 3)))

        # qubit 2 must now hold alice's state: trace out 0,1 (they are collapsed)
        amps = np.asarray(s.sv.amps).reshape(2, 2, 2)
        i, j = c0, c1
        tele = amps[i, j, :]
        tele = tele / np.linalg.norm(tele)
        target = np.array([a / nrm, b / nrm])
        # up to global phase
        phase = tele[np.argmax(np.abs(tele))] / target[np.argmax(np.abs(tele))]
        assert np.allclose(tele, target * phase, atol=1e-5)


def test_measurement_key_determinism():
    """Same PRNG key => identical outcomes (the reference, on a global StdGen,
    could not offer this)."""
    bell = (qt.cnot(0, 1, 2) @ qt.on_just(0, qt.hadamard(), 2))(qt.mk_state_vec(2))
    outs = set()
    for _ in range(3):
        s = qt.Session(bell, seed=123)
        outs.add((s.measure_qubit(0), s.measure_qubit(1)))
    assert len(outs) == 1
    b0, b1 = outs.pop()
    assert b0 == b1  # Bell correlations


def test_matrix_guard_refuses_large_n():
    """Gate.matrix() is O(4^n) + one dispatch per column; refuse past n=12
    with a clear error instead of silently hanging (VERDICT r2 weak #6)."""
    import pytest

    from qubism_tpu.core.gates import hadamard, on_just

    g = on_just(0, hadamard(), 13)
    with pytest.raises(ValueError, match="refusing past"):
        g.matrix()
