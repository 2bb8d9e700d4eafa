"""Shot-sampler statistics: chi-squared goodness of fit against |psi|^2,
plus hierarchical-sampler edge cases."""

import jax
import numpy as np
import pytest

from qubism_tpu.ops.apply import planar_from_complex
from qubism_tpu.ops.sample import sample_counts, sample_indices


def planar_state(amps):
    amps = np.asarray(amps, dtype=complex)
    amps = amps / np.linalg.norm(amps)
    import jax.numpy as jnp

    return jnp.asarray(planar_from_complex(amps)), amps


def chi2(observed, expected_probs, shots):
    expected = expected_probs * shots
    mask = expected > 5
    return float(np.sum((observed[mask] - expected[mask]) ** 2 / expected[mask])), int(mask.sum())


@pytest.mark.parametrize("n,seed", [(4, 0), (6, 1), (9, 2)])
def test_chi_squared_random_state(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    planar, amps = planar_state(v)
    probs = np.abs(amps) ** 2
    shots = 20000
    idx = np.asarray(sample_indices(planar, n, shots, jax.random.PRNGKey(seed)))
    hist = np.bincount(idx, minlength=1 << n)
    stat, dof = chi2(hist, probs, shots)
    # chi2 critical value ~ dof + 4*sqrt(2*dof) (way beyond p=0.999)
    assert stat < dof + 4 * np.sqrt(2 * dof) + 10


def test_deterministic_state_sampling():
    planar, _ = planar_state([0, 0, 1, 0])
    counts = sample_counts(planar, 2, 100, jax.random.PRNGKey(0))
    assert counts == {"10": 100}


def test_sampling_reproducible():
    planar, _ = planar_state(np.ones(16))
    a = np.asarray(sample_indices(planar, 4, 256, jax.random.PRNGKey(5)))
    b = np.asarray(sample_indices(planar, 4, 256, jax.random.PRNGKey(5)))
    assert np.array_equal(a, b)


def test_odd_qubit_count_chunking():
    # n odd exercises the m = n//2 chunk split
    planar, amps = planar_state(np.arange(1, 33))
    probs = np.abs(amps) ** 2
    idx = np.asarray(sample_indices(planar, 5, 8192, jax.random.PRNGKey(9)))
    hist = np.bincount(idx, minlength=32) / 8192
    assert 0.5 * np.abs(hist - probs).sum() < 0.05


def test_zero_amplitude_regions_never_sampled():
    amps = np.zeros(64)
    amps[7] = 1 / np.sqrt(2)
    amps[42] = 1 / np.sqrt(2)
    planar, _ = planar_state(amps)
    idx = np.asarray(sample_indices(planar, 6, 4096, jax.random.PRNGKey(3)))
    assert set(np.unique(idx)) <= {7, 42}


def test_big_sampler_matches_small_distribution():
    """The 3-level gather sampler (n >= _BIG_SAMPLE_BITS) must agree with
    the 2-level one; forced at a small n for testability."""
    import jax
    import numpy as np

    from qubism_tpu.ops import sample as S
    from qubism_tpu.ops.apply import planes_from_complex

    rng = np.random.default_rng(9)
    n = 12
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    import jax.numpy as jnp

    re, im = planes_from_complex(v)
    planes = (jnp.asarray(re), jnp.asarray(im))
    shots = 4000
    key = jax.random.PRNGKey(3)
    c, lo = jax.device_get(S._sample_parts_big(planes, n, shots, key))
    idx = (np.asarray(c).astype(np.int64) << S._LEAF_BITS) | np.asarray(lo)
    assert idx.min() >= 0 and idx.max() < (1 << n)
    # chi-squared-ish sanity on coarse bins vs true probabilities
    p = np.abs(v) ** 2
    bins = p.reshape(16, -1).sum(1)
    counts = np.bincount(idx >> (n - 4), minlength=16)
    expected = bins * shots
    chi2 = float(((counts - expected) ** 2 / np.maximum(expected, 1e-9)).sum())
    assert chi2 < 60, chi2  # 15 dof; ~25 typical, 60 = far tail


@pytest.mark.parametrize("v", [1, 2])
def test_fused_sharded_sampler_distribution(v):
    """The one-dispatch multi-shard sampler: correct distribution across
    shard boundaries, reproducible, and exact on zero-mass shards."""
    import jax.numpy as jnp

    from qubism_tpu.ops import sample as S
    from qubism_tpu.ops.apply import planes_from_complex

    rng = np.random.default_rng(21 + v)
    n = 14
    m = n - v
    amps = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    amps /= np.linalg.norm(amps)
    shards = []
    for s in range(1 << v):
        re, im = planes_from_complex(amps[s << m:(s + 1) << m])
        shards.append((jnp.asarray(re), jnp.asarray(im)))
    assert m > S._LEAF_BITS  # exercises the fused path
    shots = 20000
    idx = S.sample_indices_sharded(tuple(shards), n, v, shots,
                                   jax.random.PRNGKey(4))
    assert idx.min() >= 0 and idx.max() < (1 << n)
    p = np.abs(amps) ** 2
    bins = p.reshape(32, -1).sum(1)
    counts = np.bincount(idx >> (n - 5), minlength=32)
    expected = bins * shots
    chi2v = float(((counts - expected) ** 2 / np.maximum(expected, 1e-9)).sum())
    assert chi2v < 80, chi2v  # 31 dof; ~45 typical, 80 far tail
    # per-shard masses respected (coarsest marginal = shard choice)
    sh_counts = np.bincount(idx >> m, minlength=1 << v)
    sh_expect = p.reshape(1 << v, -1).sum(1) * shots
    assert (np.abs(sh_counts - sh_expect) < 5 * np.sqrt(sh_expect + 1)).all()
    # reproducible
    idx2 = S.sample_indices_sharded(tuple(shards), n, v, shots,
                                    jax.random.PRNGKey(4))
    assert np.array_equal(idx, idx2)


def test_fused_sharded_sampler_zero_mass_shard():
    """A shard with zero amplitude mass must never be sampled."""
    import jax.numpy as jnp

    from qubism_tpu.ops import sample as S
    from qubism_tpu.ops.apply import planes_from_complex

    n, v = 14, 1
    m = n - v
    amps = np.zeros(1 << n, dtype=complex)
    amps[5] = amps[77] = 1 / np.sqrt(2)      # both in shard 0
    shards = []
    for s in range(2):
        re, im = planes_from_complex(amps[s << m:(s + 1) << m])
        shards.append((jnp.asarray(re), jnp.asarray(im)))
    idx = S.sample_indices_sharded(tuple(shards), n, v, 4096,
                                   jax.random.PRNGKey(8))
    assert set(np.unique(idx)) <= {5, 77}


@pytest.mark.parametrize("n,qubits,sqrt_born", [
    (9, (3, 0, 7, 5, 8), False),        # all-lane (n < row threshold)
    (13, (0, 4, 11, 12, 2), False),     # mixed row+lane, unmeasured rows
    (13, (1, 3, 9), True),              # sqrt-Born quirk path
    (14, tuple(range(6)), False),       # pure-row measured, lanes summed
])
def test_measure_qubits_table_matches_sequential(n, qubits, sqrt_born):
    """The marginal-table fast path must produce the SAME outcomes and the
    same collapsed state as collapse-as-you-go for the same key — across
    row/lane mechanics and the reference sqrt-Born quirk."""
    import jax
    import numpy as np

    from qubism_tpu.ops import measure as M
    from qubism_tpu.ops.apply import complex_from_planes, planes_from_complex

    rng = np.random.default_rng(5 + n)
    for seed in range(8):
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v /= np.linalg.norm(v)
        key = jax.random.PRNGKey(seed)
        o1, p1, k1 = M._measure_seq_impl(
            planes_from_complex(v), key, qubits, n, sqrt_born)
        o2, p2, k2 = M._measure_table_impl(
            planes_from_complex(v), key, qubits, n, sqrt_born)
        assert np.array_equal(np.asarray(o1), np.asarray(o2)), seed
        a, b = complex_from_planes(p1), complex_from_planes(p2)
        assert np.linalg.norm(a - b) < 1e-5, seed
        assert np.array_equal(np.asarray(k1), np.asarray(k2))


def test_measure_qubits_chunked_wide_matches_sequential():
    """Measuring > _MEASURE_TABLE_MAX qubits goes through chunked table
    dispatches whose outcomes and collapsed state must match
    collapse-as-you-go for the same key."""
    import jax
    import numpy as np

    from qubism_tpu.ops import measure as M
    from qubism_tpu.ops.apply import complex_from_planes, planes_from_complex

    n = 9
    rng = np.random.default_rng(31)
    qubits = tuple(np.random.default_rng(7).permutation(n))  # all 9 qubits
    assert len(qubits) > 2
    for seed in range(6):
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v /= np.linalg.norm(v)
        key = jax.random.PRNGKey(seed)
        import unittest.mock as mock

        o1, p1, k1 = M._measure_seq_impl(
            planes_from_complex(v), key, qubits, n, False)
        with mock.patch.object(M, "_MEASURE_TABLE_MAX", 4):
            o2, p2, k2 = M.measure_qubits(
                planes_from_complex(v), key, qubits, n)
        assert np.array_equal(np.asarray(o1), np.asarray(o2)), seed
        a, b = complex_from_planes(p1), complex_from_planes(p2)
        assert np.linalg.norm(a - b) < 1e-5, seed
        assert np.array_equal(np.asarray(k1), np.asarray(k2))


def test_force_sequential_measure_escape_hatch():
    """config.force_sequential_measure pins measure_qubits to the per-qubit
    stream (cross-version bit-for-bit seeded reproducibility; ADVICE r2)."""
    import jax
    import numpy as np

    from qubism_tpu.config import config
    from qubism_tpu.ops import measure as M
    from qubism_tpu.ops.apply import planes_from_complex

    rng = np.random.default_rng(11)
    v = rng.normal(size=1 << 8) + 1j * rng.normal(size=1 << 8)
    v /= np.linalg.norm(v)
    key = jax.random.PRNGKey(7)
    qubits = (2, 0, 5)
    ref, _, _ = M._measure_seq_impl(planes_from_complex(v), key, qubits, 8, False)
    config.force_sequential_measure = True
    try:
        got, _, _ = M.measure_qubits(planes_from_complex(v), key, qubits, 8)
    finally:
        config.force_sequential_measure = False
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_marginal_table_matches_numpy_oracle():
    """The run-grouped marginal-table reduce (rewritten for compile
    scaling in round 5) against a brute-force numpy marginal, over
    random states and measured sets — including interleaved row runs
    and lane qubits."""
    import itertools

    import jax
    import numpy as np

    from qubism_tpu.ops.measure import _marginal_table_traced

    rng = np.random.default_rng(3)
    for n, msets in [
        (4, [(0,), (3,), (1, 2), (0, 3), (0, 1, 2, 3)]),
        (9, [(0,), (8,), (0, 4, 8), (1, 3, 5, 7), (2, 6), (0, 1, 2)]),
    ]:
        dim = 1 << n
        v = rng.normal(size=dim) + 1j * rng.normal(size=dim)
        v /= np.linalg.norm(v)
        planes = (jax.numpy.asarray(v.real.astype(np.float32)),
                  jax.numpy.asarray(v.imag.astype(np.float32)))
        p = np.abs(v) ** 2
        for mset in msets:
            got = np.asarray(jax.jit(
                lambda pl: _marginal_table_traced(pl, n, mset))(planes))
            k = len(mset)
            srt = sorted(mset)
            want = np.zeros(1 << k)
            for idx in range(dim):
                j = 0
                for q in srt:
                    j = (j << 1) | ((idx >> (n - 1 - q)) & 1)
                want[j] += p[idx]
            assert np.allclose(got, want, atol=1e-5), (n, mset)
