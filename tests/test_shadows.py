"""Classical shadows (models/shadows.py).

Oracles: exact expectations on small states, the protocol's analytic
single-snapshot estimator values (match -> 3 * (+-1), miss -> 0), and
CLT error windows at fixed seeds.
"""

import math

import numpy as np
import pytest

from qubism_tpu.core.gates import Prim
from qubism_tpu.models.shadows import (ShadowRecord, shadow_expectation,
                                       shadow_pauli_sum, shadow_snapshots)

_H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
_X = np.array([[0, 1], [1, 0]], dtype=complex)
_CX = np.eye(4, dtype=complex)[[0, 1, 3, 2]]


def _bell():
    return [Prim(_H, (0,)), Prim(_CX, (0, 1))]


def test_record_shapes_and_reproducible():
    rec = shadow_snapshots(_bell(), 2, 300, seed=5)
    rec2 = shadow_snapshots(_bell(), 2, 300, seed=5)
    assert rec.bases.shape == (300, 2) and rec.bits.shape == (300, 2)
    assert set(np.unique(rec.bases)) <= {0, 1, 2}
    assert set(np.unique(rec.bits)) <= {0, 1}
    assert np.array_equal(rec.bases, rec2.bases)
    assert np.array_equal(rec.bits, rec2.bits)


def test_snapshot_values_structure():
    # per-snapshot estimator of a weight-1 Pauli is in {0, +-3};
    # weight-2 in {0, +-9}; basis-miss rows are exactly 0
    rec = shadow_snapshots(_bell(), 2, 400, seed=1)
    v1 = rec.pauli_values("ZI")
    assert set(np.unique(v1)) <= {-3.0, 0.0, 3.0}
    miss = rec.bases[:, 0] != 2
    assert np.all(v1[miss] == 0.0)
    v2 = rec.pauli_values("XX")
    assert set(np.unique(v2)) <= {-9.0, 0.0, 9.0}


def test_bell_expectations():
    # |Phi+>: <XX> = <ZZ> = 1, <YY> = -1, <ZI> = <IX> = 0
    rec = shadow_snapshots(_bell(), 2, 6000, seed=3)
    # weight-2 variance ~ 9/T -> stderr ~ 0.039; 5 sigma windows
    assert abs(shadow_expectation(rec, "XX") - 1.0) < 0.2
    assert abs(shadow_expectation(rec, "ZZ") - 1.0) < 0.2
    assert abs(shadow_expectation(rec, "YY") + 1.0) < 0.2
    assert abs(shadow_expectation(rec, "ZI")) < 0.1
    assert abs(shadow_expectation(rec, "IX")) < 0.1


def test_product_state_z():
    # X on qubit 1 of |00> -> |01>: <IZ> = -1, <ZI> = +1
    prims = [Prim(_X, (1,))]
    rec = shadow_snapshots(prims, 2, 4000, seed=7)
    assert abs(shadow_expectation(rec, "IZ") + 1.0) < 0.15
    assert abs(shadow_expectation(rec, "ZI") - 1.0) < 0.15


def test_pauli_sum_and_identity():
    rec = shadow_snapshots(_bell(), 2, 6000, seed=11)
    # H = 2*II + ZZ + XX - YY has exact value 2 + 1 + 1 + 1 = 5 on |Phi+>
    got = shadow_pauli_sum(rec, [(2.0, "II"), (1.0, "ZZ"), (1.0, "XX"),
                                 (-1.0, "YY")], constant=0.5)
    assert abs(got - 5.5) < 0.5


def test_error_shrinks_with_snapshots():
    errs = []
    for T in (500, 8000):
        es = [abs(shadow_expectation(
            shadow_snapshots(_bell(), 2, T, seed=s), "ZZ") - 1.0)
            for s in range(3)]
        errs.append(np.mean(es))
    assert errs[1] < errs[0]


def test_chunking_matches_single_batch():
    # identical records regardless of chunk split (same seeds drive the
    # same per-snapshot keys)
    r1 = shadow_snapshots(_bell(), 2, 100, seed=9, chunk=256)
    r2 = shadow_snapshots(_bell(), 2, 100, seed=9, chunk=32)
    assert np.array_equal(r1.bases, r2.bases)
    # chunk boundaries change key splitting, so bits may differ; both
    # must still be valid estimates
    assert abs(shadow_expectation(r1, "ZZ")
               - shadow_expectation(r2, "ZZ")) < 1.0


def test_three_qubit_ghz():
    prims = [Prim(_H, (0,)), Prim(_CX, (0, 1)), Prim(_CX, (1, 2))]
    rec = shadow_snapshots(prims, 3, 8000, seed=2)
    assert abs(shadow_expectation(rec, "ZZI") - 1.0) < 0.2
    assert abs(shadow_expectation(rec, "IZZ") - 1.0) < 0.2
    assert abs(shadow_expectation(rec, "XXX") - 1.0) < 0.4
    assert abs(shadow_expectation(rec, "ZII")) < 0.15


def test_bad_inputs():
    rec = shadow_snapshots(_bell(), 2, 50, seed=0)
    with pytest.raises(ValueError):
        rec.pauli_values("ZZZ")
    with pytest.raises(ValueError):
        rec.pauli_values("ZA")
