"""StateVec behavior: ports test/Qubism/StateVecSpec.hs and adds coverage
the reference lacked (Born statistics, collapse correctness, pretty-print)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qubism_tpu import StateVec, mk_state_vec, mk_qubit


def rand_state(rng, n):
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v = v / np.linalg.norm(v)
    return StateVec(n, jnp.asarray(v.astype(np.complex64)))


def test_init_to_zero_ket():
    sv = mk_state_vec(3)
    amps = np.asarray(sv.amps)
    assert amps[0] == 1
    assert np.all(amps[1:] == 0)
    assert sv.dimension == 3
    assert mk_qubit().n == 1


def test_tensor_outer_product(rng):
    a, b = rand_state(rng, 2), rand_state(rng, 1)
    t = a.tensor(b)
    expected = np.kron(np.asarray(a.amps), np.asarray(b.amps))
    assert np.allclose(np.asarray(t.amps), expected, atol=1e-6)
    assert t.n == 3


def test_approx_equality(rng):
    a = rand_state(rng, 3)
    b = StateVec(3, a.amps + 1e-8)
    c = StateVec(3, a.amps + 1e-2)
    assert a == b
    assert a != c


def test_collapse_big_endian():
    # |ψ> = (|00> + |11>)/√2; collapse qubit 0 (MSB) to 1 must give |11>.
    bell = StateVec(2, jnp.array([1, 0, 0, 1], dtype=jnp.complex64) / np.sqrt(2))
    c = bell.collapse(0, 1)
    assert np.allclose(np.asarray(c.amps), [0, 0, 0, 1], atol=1e-6)
    c0 = bell.collapse(1, 0)
    assert np.allclose(np.asarray(c0.amps), [1, 0, 0, 0], atol=1e-6)


def test_measurement_idempotence(rng):
    """measure >> measure == measure (StateVecSpec.hs:35-44), same key."""
    for trial in range(5):
        sv = rand_state(rng, 3)
        key = jax.random.PRNGKey(trial)
        cr1, sv1, key1 = sv.measure(key)
        cr2, sv2, _ = sv1.measure(key1)
        assert cr1.bits == cr2.bits or sv1 == sv2  # second measure is deterministic
        # post-measurement state is a computational basis state
        amps = np.abs(np.asarray(sv1.amps)) ** 2
        assert np.max(amps) > 1 - 1e-5


def test_measure_qubit_idempotent(rng):
    sv = rand_state(rng, 2)
    key = jax.random.PRNGKey(7)
    b1, sv1, key1 = sv.measure_qubit(0, key)
    b2, sv2, _ = sv1.measure_qubit(0, key1)
    assert b1 == b2
    assert sv1 == sv2


def test_born_statistics():
    """Correct Born rule: p(1) for amplitude sqrt(0.2) must be ~0.2 — the
    reference's sqrt-quirk would give ~0.447 (SURVEY.md §2.4.2)."""
    p_target = 0.2
    sv = StateVec(1, jnp.array([np.sqrt(1 - p_target), np.sqrt(p_target)], dtype=jnp.complex64))
    key = jax.random.PRNGKey(0)
    ones = 0
    trials = 4000
    keys = jax.random.split(key, trials)
    for k in keys:
        b, _, _ = sv.measure_qubit(0, k)
        ones += b
    freq = ones / trials
    assert abs(freq - p_target) < 0.03


def test_sqrt_born_compat_flag():
    from qubism_tpu.config import config

    p_target = 0.2
    sv = StateVec(1, jnp.array([np.sqrt(1 - p_target), np.sqrt(p_target)], dtype=jnp.complex64))
    config.reference_sqrt_born = True
    try:
        ones = 0
        trials = 2000
        for k in jax.random.split(jax.random.PRNGKey(1), trials):
            b, _, _ = sv.measure_qubit(0, k)
            ones += b
        freq = ones / trials
        assert abs(freq - np.sqrt(p_target)) < 0.05  # quirk: r < sqrt(p)
    finally:
        config.reference_sqrt_born = False


def test_show_format():
    sv = mk_state_vec(1)
    s = str(sv)
    assert s == " 1.0000  +  0.0000i  |0>\n 0.0000  +  0.0000i  |1>\n"


def test_norm_and_normalize(rng):
    sv = StateVec(2, jnp.array([3, 0, 4, 0], dtype=jnp.complex64))
    assert abs(sv.norm() - 5) < 1e-5
    assert abs(sv.normalize().norm() - 1) < 1e-6


def test_bad_shape_rejected():
    with pytest.raises(ValueError):
        StateVec(2, jnp.zeros(3, dtype=jnp.complex64))


def test_adjoint_conjugates():
    import numpy as np

    from qubism_tpu.core.statevec import StateVec

    sv = StateVec.from_amplitudes(np.array([0.6, 0.8j], dtype=np.complex128))
    adj = sv.adjoint()
    assert np.allclose(adj.amps, np.conj(sv.amps), atol=1e-7)
    assert np.isclose(sv.adjoint().inner(sv.adjoint()), 1.0)


# -- amplitude queries / sampling conveniences --------------------------------

def _bell():
    return StateVec.from_amplitudes(
        np.array([1, 0, 0, 1], dtype=complex) / np.sqrt(2))


def test_amplitude_accepts_int_string_and_bits(rng):
    sv = rand_state(rng, 3)
    amps = np.asarray(sv.amps)
    for idx in range(8):
        s = format(idx, "03b")
        a = sv.amplitude(idx)
        assert a == pytest.approx(amps[idx], abs=1e-6)
        assert sv.amplitude(s) == pytest.approx(a, abs=1e-12)
        assert sv.amplitude([int(c) for c in s]) == pytest.approx(a, abs=1e-12)


def test_amplitude_bad_inputs():
    sv = _bell()
    with pytest.raises(ValueError):
        sv.amplitude("012")
    with pytest.raises(ValueError):
        sv.amplitude("0")
    with pytest.raises(ValueError):
        sv.amplitude(4)
    with pytest.raises(ValueError):
        sv.amplitude([0, 1, 1])


def test_probability_and_probs(rng):
    sv = rand_state(rng, 4)
    probs = sv.probs()
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    for idx in (0, 7, 15):
        assert sv.probability(idx) == pytest.approx(probs[idx], abs=1e-6)


def test_probs_guard():
    sv = StateVec.zero(2)
    object.__setattr__(sv, "n", 27)  # shape check would OOM; fake the guard
    with pytest.raises(ValueError, match="probs"):
        sv.probs()


def test_sample_is_nondestructive_and_born():
    sv = _bell()
    counts = sv.sample(4096, seed=3)
    assert set(counts) <= {"00", "11"}
    assert sum(counts.values()) == 4096
    assert abs(counts.get("00", 0) - 2048) < 4 * np.sqrt(1024)
    # the state is untouched
    assert sv.probability("00") == pytest.approx(0.5, abs=1e-6)


def test_sample_seed_reproducible():
    sv = _bell()
    assert sv.sample(256, seed=9) == sv.sample(256, seed=9)
