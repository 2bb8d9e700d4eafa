"""Shot-based Hamiltonian estimation (models/estimation.py).

Oracles: exact expectations from the dense engine / analytic values,
binomial/CLT error bars at fixed seeds, and the exact optimum of the
objectives SPSA minimizes.
"""

import math

import numpy as np
import pytest

from qubism_tpu.core.gates import Prim
from qubism_tpu.models.estimation import (EnergyEstimator,
                                          estimate_energy_fn,
                                          estimate_pauli_sum, qwc_groups,
                                          spsa_minimize)

_H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
_X = np.array([[0, 1], [1, 0]], dtype=complex)
_CX = np.eye(4, dtype=complex)[[0, 1, 3, 2]]


def _qwc(p, q):
    return all(a == "I" or b == "I" or a == b for a, b in zip(p, q))


# -- grouping ---------------------------------------------------------------------


def test_qwc_groups_partition_and_validity():
    paulis = ["ZZI", "IZZ", "XXI", "IXX", "ZIZ", "YYI", "IIZ"]
    groups, bases = qwc_groups(paulis)
    # every index exactly once
    flat = sorted(j for g in groups for j in g)
    assert flat == list(range(len(paulis)))
    for g, basis in zip(groups, bases):
        for j in g:
            # member is measurable in the group basis
            assert all(c == "I" or basis[q] == c
                       for q, c in enumerate(paulis[j])), (paulis[j], basis)
        for j in g:
            for k in g:
                assert _qwc(paulis[j], paulis[k])


def test_qwc_groups_h2_shape():
    # ZI/IZ/ZZ share a basis; XX and YY anticommute qubit-wise with it
    # and each other -> exactly 3 groups
    groups, bases = qwc_groups(["ZI", "IZ", "ZZ", "XX", "YY"])
    assert len(groups) == 3
    assert groups[0] == [0, 1, 2] and bases[0] == "ZZ"
    assert bases[1] == "XX" and bases[2] == "YY"


def test_qwc_all_commuting_is_one_group():
    groups, bases = qwc_groups(["ZIII", "IZII", "IIZI", "ZZZZ"])
    assert len(groups) == 1 and bases[0] == "ZZZZ"


# -- estimation on a Bell state ---------------------------------------------------


def _bell_prims():
    return [Prim(_H, (0,)), Prim(_CX, (0, 1))]


def test_estimate_bell_matches_exact():
    # |Phi+>: <ZZ> = <XX> = 1 (zero variance in their bases), <ZI> = 0
    terms = [(0.5, "ZZ"), (0.25, "XX"), (1.0, "ZI")]
    mean, err = estimate_pauli_sum(_bell_prims(), 2, terms, shots=4096,
                                   seed=3)
    assert err > 0.0
    # exact value 0.75; ZI is the only noisy term
    assert abs(mean - 0.75) < 4 * err + 1e-9
    assert err < 0.05


def test_estimate_identity_and_constant_exact():
    terms = [(2.0, "II"), (1.0, "ZZ")]
    mean, err = estimate_pauli_sum(_bell_prims(), 2, terms, shots=256,
                                   seed=0, constant=-0.5)
    # ZZ on |Phi+> is +1 on every shot: the whole thing is exact
    assert mean == pytest.approx(2.5, abs=1e-9)
    assert err == pytest.approx(0.0, abs=1e-12)


def test_grouping_none_matches_qwc_in_expectation():
    terms = [(0.7, "ZZ"), (-0.3, "ZI"), (0.2, "XX")]
    exact = 0.7 * 1.0 - 0.3 * 0.0 + 0.2 * 1.0
    for grouping in ("qwc", "none"):
        for allocation in ("weighted", "uniform"):
            mean, err = estimate_pauli_sum(
                _bell_prims(), 2, terms, shots=8192, seed=11,
                grouping=grouping, allocation=allocation)
            assert abs(mean - exact) < 4 * err + 1e-9, (grouping, allocation)


def test_estimator_reuse_does_not_mutate_state():
    import jax

    from qubism_tpu.ops.fusion import CompiledCircuit

    est = EnergyEstimator(2, [(1.0, "XX"), (1.0, "ZZ")], shots=512)
    assert est.num_groups == 2
    c = CompiledCircuit(2, _bell_prims())
    planes = c(c.init_state())
    before = np.asarray(c.state_to_complex(planes)).copy()
    m1, _ = est.estimate(planes, jax.random.PRNGKey(0))
    m2, _ = est.estimate(planes, jax.random.PRNGKey(0))
    after = np.asarray(c.state_to_complex(planes))
    assert np.allclose(before, after)  # rotation ran on copies
    assert m1 == pytest.approx(m2)  # same key -> same estimate
    assert m1 == pytest.approx(2.0, abs=1e-9)  # both terms exact on Bell


def test_estimate_stderr_is_calibrated():
    # <ZI> on |+>|0> is a fair coin: stderr should track 1/sqrt(shots)
    prims = [Prim(_H, (0,))]
    vals, errs = [], []
    for seed in range(8):
        m, e = estimate_pauli_sum(prims, 2, [(1.0, "ZI")], shots=1024,
                                  seed=seed)
        vals.append(m)
        errs.append(e)
    want = 1.0 / math.sqrt(1024)
    assert abs(np.mean(errs) - want) < 0.2 * want
    assert np.std(vals) < 4 * want


# -- the VQE loop -----------------------------------------------------------------


def test_estimate_energy_fn_h2():
    from qubism_tpu.models.hamiltonians import h2_minimal
    from qubism_tpu.models.variational import (energy_fn, hea_ansatz,
                                               vqe_minimize)
    import jax.numpy as jnp

    terms, const = h2_minimal()
    ans = hea_ansatz(2, 2)
    theta0 = np.linspace(0.1, 1.0, ans.num_params).astype(np.float32)
    theta, _ = vqe_minimize(ans, terms, theta0, steps=200, constant=const)
    e_exact = float(energy_fn(ans, terms, constant=const)(theta))
    f = estimate_energy_fn(ans, terms, shots=8192, constant=const)
    m, err = f(theta, seed=7)
    assert err > 0.0
    assert abs(m - e_exact) < 4 * err + 1e-9
    assert abs(m - (-1.8512)) < 0.05


def test_spsa_noiseless_quadratic():
    opt = np.array([0.3, -1.2, 2.0])

    def f(theta, seed=0):
        return float(np.sum((np.asarray(theta) - opt) ** 2))

    theta, hist = spsa_minimize(f, np.zeros(3), steps=300, a=0.4, c=0.05,
                                seed=1)
    assert np.allclose(theta, opt, atol=0.05)
    assert hist[-1] < hist[0]


def test_spsa_on_shot_noise_vqe():
    from qubism_tpu.models.hamiltonians import h2_minimal
    from qubism_tpu.models.variational import energy_fn, hea_ansatz

    terms, const = h2_minimal()
    ans = hea_ansatz(2, 1)
    f = estimate_energy_fn(ans, terms, shots=2048, constant=const)
    theta0 = np.full(ans.num_params, 0.3)
    theta, hist = spsa_minimize(f, theta0, steps=100, a=1.0, c=0.15, seed=4)
    e_end = float(energy_fn(ans, terms, constant=const)(
        np.asarray(theta, np.float32)))
    e_start = float(energy_fn(ans, terms, constant=const)(
        theta0.astype(np.float32)))
    assert e_end < e_start - 0.1  # made real progress through the noise
    assert e_end < -1.8  # near the -1.8512 ground state


def test_estimator_rejects_bad_args():
    with pytest.raises(ValueError):
        EnergyEstimator(2, [(1.0, "ZZ")], grouping="graph")
    with pytest.raises(ValueError):
        EnergyEstimator(2, [(1.0, "ZZ")], allocation="optimal")
    with pytest.raises(ValueError):
        EnergyEstimator(2, [(1.0, "ZA")])
