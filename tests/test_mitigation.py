"""Zero-noise extrapolation + readout mitigation (models/mitigation.py).

Engine extension — the reference has no noise model to mitigate
(src/Qubism/StateVec.hs is pure states only)."""

import math

import numpy as np
import pytest

from qubism_tpu.core.density import DensityMatrix, depolarizing, depolarizing2
from qubism_tpu.core.gates import Prim
from qubism_tpu.models.mitigation import (
    confusion_matrix,
    exp_extrapolate,
    fold_prims,
    linear_extrapolate,
    mitigate_counts,
    mitigate_z_expectation,
    richardson_extrapolate,
    zne_expectation,
)
from qubism_tpu.models.circuits import ghz_prims
from qubism_tpu.ops.fusion import CompiledCircuit

_H = np.array([[1, 1], [1, -1]], dtype=np.complex128) / math.sqrt(2)


def test_fold_prims_noiseless_identity():
    n = 3
    prims = ghz_prims(n)
    c1 = CompiledCircuit(n, prims)
    c3 = CompiledCircuit(n, fold_prims(prims, 3))
    a1 = c1.state_to_complex(c1(c1.init_state()))
    a3 = c3.state_to_complex(c3(c3.init_state()))
    assert np.linalg.norm(a1 - a3) < 1e-5
    assert len(fold_prims(prims, 5)) == 5 * len(prims)
    with pytest.raises(ValueError):
        fold_prims(prims, 2)


def test_zne_exp_exact_for_depolarizing():
    """Under per-gate depolarizing, <ZZ> on a GHZ pair decays geometrically
    in the fold scale, so the exponential extrapolator recovers the ideal
    value essentially exactly."""
    n = 2
    prims = ghz_prims(n)
    est, vals = zne_expectation(prims, n, "ZZ",
                                kraus1=depolarizing(0.03),
                                kraus2=depolarizing2(0.05),
                                scales=(1, 3, 5), method="exp")
    assert vals[0] < 0.95          # unmitigated is visibly damaged
    assert vals[0] > vals[1] > vals[2]  # monotone decay in scale
    assert abs(est - 1.0) < 5e-3, (est, vals)


def test_zne_richardson_and_linear_improve():
    n = 2
    prims = ghz_prims(n)
    kw = dict(kraus1=depolarizing(0.02), kraus2=depolarizing2(0.04))
    est_r, vals = zne_expectation(prims, n, "ZZ", scales=(1, 3, 5),
                                  method="richardson", **kw)
    est_l, _ = zne_expectation(prims, n, "ZZ", scales=(1, 3, 5),
                               method="linear", **kw)
    raw_err = abs(vals[0] - 1.0)
    assert abs(est_r - 1.0) < raw_err / 3
    assert abs(est_l - 1.0) < raw_err


def test_zne_trajectories_executor():
    n = 2
    est, vals = zne_expectation(ghz_prims(n), n, "ZZ",
                                kraus1=depolarizing(0.05),
                                scales=(1, 3, 5), method="linear",
                                executor="trajectories", ntraj=1024, seed=1)
    exact_est, exact_vals = zne_expectation(ghz_prims(n), n, "ZZ",
                                            kraus1=depolarizing(0.05),
                                            scales=(1, 3, 5), method="linear")
    for v, e in zip(vals, exact_vals):
        assert abs(v - e) < 0.08, (vals, exact_vals)
    assert abs(est - exact_est) < 0.15


def test_extrapolators_on_synthetic_data():
    # exact quadratic -> Richardson exact at 0
    s = [1, 3, 5]
    v = [2 - 0.3 * x + 0.01 * x * x for x in s]
    assert abs(richardson_extrapolate(s, v) - 2.0) < 1e-12
    # exact geometric -> exp extrapolator exact
    v = [1.7 * 0.8 ** x for x in s]
    assert abs(exp_extrapolate(s, v) - 1.7) < 1e-9
    # exact line -> linear exact
    v = [0.5 - 0.1 * x for x in s]
    assert abs(linear_extrapolate(s, v) - 0.5) < 1e-12


def test_confusion_matrix_inverse_roundtrip():
    n, p = 3, 0.07
    a = confusion_matrix(n, p)
    assert np.allclose(a.sum(axis=0), 1.0)
    true = np.zeros(1 << n)
    true[5] = 0.75
    true[2] = 0.25
    noisy = a @ true
    counts = {format(i, f"0{n}b"): int(round(noisy[i] * 10 ** 7))
              for i in range(1 << n)}
    mitigated = mitigate_counts(counts, p)
    assert abs(mitigated.get("101", 0.0) - 0.75) < 1e-5
    assert abs(mitigated.get("010", 0.0) - 0.25) < 1e-5
    other = sum(v for k, v in mitigated.items() if k not in ("101", "010"))
    assert abs(other) < 1e-4


def test_mitigate_z_expectation_matches_matrix_form():
    """Scalar 1/(1-2p)^w form agrees with full confusion-matrix inversion
    on a sampled GHZ run with readout flips."""
    p = 0.06
    rho = DensityMatrix(2).apply(ghz_prims(2))
    z_true = rho.expectation("ZZ")
    z_meas = z_true * (1 - 2 * p) ** 2  # iid flips shrink each Z factor
    assert abs(mitigate_z_expectation(z_meas, p, weight=2) - z_true) < 1e-12


def test_mitigate_counts_rejects_p_half():
    with pytest.raises(ValueError):
        mitigate_counts({"0": 1}, 0.5)
