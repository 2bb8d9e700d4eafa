"""Pallas kernel correctness (interpreter mode on CPU): the speed-of-light
kernels must agree with the XLA reference path to 1e-6."""

import math

import numpy as np
import pytest

import qubism_tpu.ops.kernels as K
from qubism_tpu.core.gates import Prim, u3_matrix
from qubism_tpu.ops.apply import (
    apply_diag,
    apply_gate,
    complex_from_planes,
    expand_for_view,
    zero_state,
)

H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
CX = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    yield
    K.INTERPRET = False


def rand_planes(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    import jax.numpy as jnp

    return (jnp.asarray(v.real.astype(np.float32)), jnp.asarray(v.imag.astype(np.float32))), v


@pytest.mark.parametrize("n,targets", [
    (8, (0,)), (8, (3,)), (10, (0, 4)), (10, (2, 3)), (9, (0, 1)),
    (15, (2,)),  # tail split into (B, C) with _BLOCK_C
])
def test_row_gate_matches_reference(n, targets):
    planes, _ = rand_planes(n, 42)
    k = len(targets)
    rng = np.random.default_rng(1)
    if k == 1:
        u = u3_matrix(*rng.uniform(0, 2 * math.pi, 3), reference_bug=False)
    else:
        u = CX
    expected = complex_from_planes(apply_gate(planes, u, targets, n))
    got = complex_from_planes(K.row_gate(planes, u, targets, n))
    assert np.linalg.norm(got - expected) < 1e-5


def test_row_gate_h_on_zero_state():
    n = 9
    got = complex_from_planes(K.row_gate(zero_state(n), H, (0,), n))
    expected = np.zeros(1 << n, dtype=complex)
    expected[0] = expected[1 << (n - 1)] = 1 / math.sqrt(2)
    assert np.linalg.norm(got - expected) < 1e-6


@pytest.mark.parametrize("n", [8, 11])
def test_diag_layer_matches_reference(n):
    planes, _ = rand_planes(n, 7)
    cz = np.array([1, 1, 1, -1], dtype=complex)
    cu1 = np.array([1, 1, 1, np.exp(0.3j)], dtype=complex)
    ph = np.array([1, 1j], dtype=complex)
    factors = [(cz, (0, n - 1)), (cu1, (1, 2)), (ph, (n - 2,)), (cu1, (0, n - 2))]
    expected = planes
    for d, t in factors:
        expected = apply_diag(expected, d, t, n)
    expected = complex_from_planes(expected)
    got = complex_from_planes(K.diag_layer(planes, factors, n))
    assert np.linalg.norm(got - expected) < 1e-5


@pytest.mark.parametrize("n", [8, 10])
def test_lane_gate_matches_reference(n):
    planes, _ = rand_planes(n, 3)
    q = n - 2  # lane qubit
    expected = complex_from_planes(apply_gate(planes, H, (q,), n))
    u = expand_for_view(H, n, (q,))
    got = complex_from_planes(K.lane_gate(planes, u, n))
    assert np.linalg.norm(got - expected) < 1e-5


def test_lane_gate_two_targets(n=9):
    planes, _ = rand_planes(n, 5)
    targets = (n - 3, n - 1)
    expected = complex_from_planes(apply_gate(planes, CX, targets, n))
    u = expand_for_view(CX, n, targets)
    got = complex_from_planes(K.lane_gate(planes, u, n))
    assert np.linalg.norm(got - expected) < 1e-5


def test_compiled_circuit_pallas_backend_matches():
    """Full fused executor with the Pallas backend (interpret mode) vs the
    XLA backend on a QFT."""
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 10
    a = CompiledCircuit(n, qft_prims(n), use_pallas=False)
    b = CompiledCircuit(n, qft_prims(n), use_pallas=True)
    ra = complex_from_planes(a(zero_state(n)))
    rb = complex_from_planes(b(zero_state(n)))
    assert np.linalg.norm(ra - rb) < 1e-5


def test_diag_layer_chunked_many_straddles():
    """More straddling factors than _MAX_STRADDLE: multi-pass chunking."""
    n = 16
    planes, _ = rand_planes(n, 11)
    cu1 = lambda l: np.array([1, 1, 1, np.exp(1j * l)], dtype=complex)  # noqa: E731
    factors = [(cu1(0.1 * j), (2, j)) for j in range(6, n)]  # 10 straddles at C=2048
    expected = planes
    from qubism_tpu.ops.apply import apply_diag

    for d, t in factors:
        expected = apply_diag(expected, d, t, n)
    expected = complex_from_planes(expected)
    got = complex_from_planes(K.diag_layer(planes, factors, n))
    assert np.linalg.norm(got - expected) < 1e-5


def test_diag_layer_wide_incompressible_factor_splits():
    """A single incompressible 5q diagonal with 4 row bits would emit 16
    straddle terms — past the compile cap. _diag_groups must split it into
    controlled-phase factors and still apply it exactly."""
    n = 16
    rng = np.random.default_rng(3)
    planes, _ = rand_planes(n, 13)
    d = np.exp(1j * rng.uniform(-np.pi, np.pi, size=32))
    targets = (0, 1, 2, 3, n - 2)  # 4 row bits + 1 lane bit at C=2048
    from qubism_tpu.ops.kernels import _MAX_STRADDLE_TERMS, _straddle_weight

    assert _straddle_weight((d, targets), 5) > _MAX_STRADDLE_TERMS
    groups = K._diag_groups([(d, targets)], n)
    for g in groups:
        assert sum(_straddle_weight(f, 5) for f in g) <= _MAX_STRADDLE_TERMS
    expected = complex_from_planes(apply_diag(planes, d, targets, n))
    got = complex_from_planes(K.diag_layer(planes, [(d, targets)], n))
    assert np.linalg.norm(got - expected) < 1e-5


def test_virtual_sharded_executor_matches():
    """virtual_shards=1/2 must reproduce the unsharded result exactly
    (random circuit incl. gates and diagonals on the virtual qubits)."""
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from tests.test_fusion import random_prims

    n = 8
    for prims in (qft_prims(n), random_prims(n, 30, 3)):
        ref = CompiledCircuit(n, prims, use_pallas=False, virtual_shards=0)
        expected = ref.state_to_complex(ref(ref.init_state()))
        for v in (1, 2):
            circ = CompiledCircuit(n, prims, use_pallas=False, virtual_shards=v)
            got = circ.state_to_complex(circ(circ.init_state()))
            assert np.linalg.norm(got - expected) < 1e-5, (v,)


def test_virtual_sharded_pallas_interpret():
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 9
    ref = CompiledCircuit(n, qft_prims(n), use_pallas=False, virtual_shards=0)
    expected = ref.state_to_complex(ref(ref.init_state()))
    circ = CompiledCircuit(n, qft_prims(n), use_pallas=True, virtual_shards=1)
    got = circ.state_to_complex(circ(circ.init_state()))
    assert np.linalg.norm(got - expected) < 1e-5


def test_stage_kernel_matches_reference():
    """Fused stage (H + controlled-phase ladder) vs the op-by-op engine."""
    import qubism_tpu.ops.kernels as KK
    from qubism_tpu.ops.apply import apply_diag, apply_gate

    for n, q in ((10, 1), (12, 3), (11, 2)):
        planes, _ = rand_planes(n, n + q)
        cu1 = lambda l: np.array([1, 1, 1, np.exp(1j * l)], dtype=complex)  # noqa: E731
        factors = [(cu1(0.3 / (j - q)), (q, j)) for j in range(q + 1, n)]
        expected = apply_gate(planes, H, (q,), n)
        for d, t in factors:
            expected = apply_diag(expected, d, t, n)
        from qubism_tpu.ops.apply import complex_from_planes

        expected = complex_from_planes(expected)
        fn, coef, bt, ct = KK.stage_prepare(H, q, factors, n)
        got = complex_from_planes(fn(planes, coef, bt, ct))
        assert np.linalg.norm(got - expected) < 1e-5, (n, q)


def test_qft_uses_stage_fusion():
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 16
    circ = CompiledCircuit(n, qft_prims(n), use_pallas=True)
    stats = circ.stats()
    # most stages fuse (into multi-stage blocks)
    assert stats["fused_stages"] >= n - 10
    assert stats["max_stage_group"] >= 2
    # correctness vs XLA backend
    ref = CompiledCircuit(n, qft_prims(n), use_pallas=False)
    a = complex_from_planes(circ(zero_state(n)))
    b = complex_from_planes(ref(zero_state(n)))
    assert np.linalg.norm(a - b) < 1e-5


@pytest.mark.parametrize("n,targets", [
    (18, (0,)),    # tail 2^17: classic interleaved view
    (18, (1,)),    # tail 2^16: classic boundary
    (18, (2,)),    # tail 2^15 = _FLAT_TAIL_MAX: flat 1q
    (18, (9,)),    # flat 1q mid
    (18, (2, 8)),  # gap B=32 >= 8: flat 2q blocked
    (18, (8, 9)),  # adjacent: flat 2q in-row (B=1)
    (18, (6, 9)),  # B=4: flat 2q in-row multi-chunk loop
    (18, (0, 9)),  # B=256: flat 2q blocked, big A-gap
])
def test_row_gate_flat_vs_classic_paths(n, targets):
    """The narrow-tail flat kernels and the classic view must agree with the
    XLA reference on either side of _FLAT_TAIL_MAX."""
    planes, _ = rand_planes(n, 7)
    rng = np.random.default_rng(3)
    if len(targets) == 1:
        u = u3_matrix(*rng.uniform(0, 2 * math.pi, 3), reference_bug=False)
    else:
        u = CX
    expected = complex_from_planes(apply_gate(planes, u, targets, n))
    got = complex_from_planes(K.row_gate(planes, u, targets, n))
    assert np.linalg.norm(got - expected) < 1e-5


@pytest.mark.parametrize("n,q", [(18, 1), (18, 2), (18, 4), (18, 10)])
def test_stage_kernel_flat_and_classic(n, q):
    import qubism_tpu.ops.kernels as KK
    from qubism_tpu.ops.apply import apply_diag, apply_gate, complex_from_planes

    planes, _ = rand_planes(n, n * 31 + q)
    cu1 = lambda l: np.array([1, 1, 1, np.exp(1j * l)], dtype=complex)  # noqa: E731
    factors = [(cu1(0.3 / (j - q)), (q, j)) for j in range(q + 1, n)]
    expected = apply_gate(planes, H, (q,), n)
    for d, t in factors:
        expected = apply_diag(expected, d, t, n)
    expected = complex_from_planes(expected)
    fn, coef, bt, ct = KK.stage_prepare(H, q, factors, n)
    got = complex_from_planes(fn(planes, coef, bt, ct))
    assert np.linalg.norm(got - expected) < 1e-5, (n, q)


def test_stage_pair_kernel_matches_reference():
    """A fused pair of stages (H+ladder on q, q+1) vs the op-by-op engine."""
    import qubism_tpu.ops.kernels as KK
    from qubism_tpu.ops.apply import apply_diag, apply_gate, complex_from_planes

    cu1 = lambda l: np.array([1, 1, 1, np.exp(1j * l)], dtype=complex)  # noqa: E731
    for n, q in ((12, 2), (18, 4), (18, 9), (14, 0)):
        planes, _ = rand_planes(n, 5 * n + q)
        f1 = [(cu1(0.4 / (j - q)), (q, j)) for j in range(q + 1, n)]
        f2 = [(cu1(0.7 / (j - q)), (q + 1, j)) for j in range(q + 2, n)]
        expected = apply_gate(planes, H, (q,), n)
        for d, t in f1:
            expected = apply_diag(expected, d, t, n)
        expected = apply_gate(expected, H, (q + 1,), n)
        for d, t in f2:
            expected = apply_diag(expected, d, t, n)
        expected = complex_from_planes(expected)
        fn, coef, bt1, ct1, bt2, ct2 = KK.stage2_prepare(
            H, q, tuple(f1), H, q + 1, tuple(f2), n)
        got = complex_from_planes(fn(planes, coef, bt1, ct1, bt2, ct2))
        assert np.linalg.norm(got - expected) < 1e-5, (n, q)


def test_qft_uses_stage_block_fusion():
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import STAGE_GROUP, CompiledCircuit

    n = 16
    circ = CompiledCircuit(n, qft_prims(n), use_pallas=True)
    stats = circ.stats()
    assert stats["max_stage_group"] >= min(2, STAGE_GROUP)
    # pass count drops ~k-fold vs unfused stages
    assert stats["fused_ops"] <= n // STAGE_GROUP + 4
    ref = CompiledCircuit(n, qft_prims(n), use_pallas=False)
    a = circ.state_to_complex(circ(circ.init_state()))
    b = ref.state_to_complex(ref(ref.init_state()))
    assert np.linalg.norm(a - b) < 1e-5


@pytest.mark.parametrize("n,q0,k", [
    (12, 2, 3), (14, 0, 3), (18, 4, 3), (18, 8, 3),
    (12, 1, 4), (18, 3, 4), (18, 7, 4), (16, 0, 4),
])
def test_stage_block_kernel_matches_reference(n, q0, k):
    """A fused block of k stages (H+ladder on q0..q0+k-1) vs op-by-op."""
    import qubism_tpu.ops.kernels as KK
    from qubism_tpu.ops.apply import apply_diag, apply_gate, complex_from_planes

    cu1 = lambda l: np.array([1, 1, 1, np.exp(1j * l)], dtype=complex)  # noqa: E731
    planes, _ = rand_planes(n, 17 * n + q0 + k)
    stages = []
    expected = planes
    for q in range(q0, q0 + k):
        factors = tuple((cu1(0.9 / (j - q)), (q, j)) for j in range(q + 1, n))
        stages.append((H, q, factors))
        expected = apply_gate(expected, H, (q,), n)
        for d, t in factors:
            expected = apply_diag(expected, d, t, n)
    expected = complex_from_planes(expected)
    fn, coef, *tabs = KK.stage_block_prepare(tuple(stages), n)
    got = complex_from_planes(fn(planes, coef, *tabs))
    assert np.linalg.norm(got - expected) < 1e-5, (n, q0, k)


@pytest.mark.parametrize("n,targets", [
    (18, (0, 5, 9)),     # axis + gap + narrow mix, k=3
    (18, (2, 3, 8, 9)),  # k=4, mixed mechanics
    (14, (0, 1, 2)),     # small n, k=3
])
def test_row_gate_wide_blocks(n, targets):
    """k=3/4 dense blocks (fused brickwork pairs / CX chains) vs XLA."""
    rng = np.random.default_rng(n + len(targets))
    k = len(targets)
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(size=(1 << k, 1 << k))
    u, _ = np.linalg.qr(m)
    planes, _ = rand_planes(n, 77 + n)
    expected = complex_from_planes(apply_gate(planes, u, targets, n))
    got = complex_from_planes(K.row_gate(planes, u, targets, n))
    assert np.linalg.norm(got - expected) < 1e-5


@pytest.mark.parametrize("n,qubits", [
    (18, (0, 1, 2, 5, 9, 10)),   # 3 axis slots + rolls
    (14, (0, 2, 3, 4, 6)),       # small n mix
    (18, (4, 6, 8, 9, 10)),      # boundary mechanics
])
def test_layer1q_kernel_matches_reference(n, qubits):
    """A sequential disjoint-1q layer pass vs op-by-op application."""
    import qubism_tpu.ops.kernels as KK
    from qubism_tpu.ops.apply import apply_gate, complex_from_planes

    rng = np.random.default_rng(n + len(qubits))
    planes, _ = rand_planes(n, 23 * n + len(qubits))
    gates = []
    expected = planes
    for q in qubits:
        u = u3_matrix(*rng.uniform(0, 2 * math.pi, 3), reference_bug=False)
        gates.append((u, q))
        expected = apply_gate(expected, u, (q,), n)
    expected = complex_from_planes(expected)
    fn, coefs = KK.layer1q_prepare(tuple(gates), n)
    got = complex_from_planes(fn(planes, coefs))
    assert np.linalg.norm(got - expected) < 1e-5, (n, qubits)


def test_brickwork_uses_layer1q_fusion():
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 16
    circ = CompiledCircuit(n, brickwork_prims(n, depth=3, seed=2),
                           use_pallas=True)
    stats = circ.stats()
    assert stats["layer1q_passes"] >= 3  # one+ per u3 layer
    ref = CompiledCircuit(n, brickwork_prims(n, depth=3, seed=2),
                          use_pallas=False)
    a = circ.state_to_complex(circ(circ.init_state()))
    b = ref.state_to_complex(ref(ref.init_state()))
    assert np.linalg.norm(a - b) < 1e-5
