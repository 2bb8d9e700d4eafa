"""Sharded-engine tests on a virtual 8-device CPU mesh: every sharded path
(local gates, zero-comm global diagonals, ICI qubit-relabeling swaps, global
measurement, sampling) must agree with the single-device engine."""

import math

import jax
import numpy as np
import pytest

from qubism_tpu.core.gates import Prim
from qubism_tpu.models.circuits import brickwork_prims, ghz_prims, qft_prims
from qubism_tpu.ops.apply import complex_from_planar, zero_state
from qubism_tpu.ops.fusion import CompiledCircuit
from qubism_tpu.parallel.mesh import make_mesh
from qubism_tpu.parallel.sharded import ShardedSim

H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
CNOT = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
CZ = np.array([1, 1, 1, -1], dtype=complex)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def dense_reference(prims, n):
    return complex_from_planar(CompiledCircuit(n, prims, optimize=False)(zero_state(n)))


def test_mesh_is_8_devices(mesh):
    assert mesh.devices.size == 8


def test_local_gate(mesh):
    n = 6
    sim = ShardedSim(n, mesh)
    sim.apply([Prim(H, (4,))])  # physical 4 >= d=3: local
    expected = dense_reference([Prim(H, (4,))], n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-6


def test_global_dense_gate_forces_swap(mesh):
    n = 6
    sim = ShardedSim(n, mesh)
    sim.apply([Prim(H, (0,))])  # physical 0 < d: needs relabel swap
    assert sim.perm[0] >= 3  # qubit 0 got swapped into the local range
    expected = dense_reference([Prim(H, (0,))], n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-6


def test_global_diag_no_swap(mesh):
    n = 6
    prims = [Prim(H, (4,)), Prim(CZ, (0, 4), diag=True)]
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    assert sim.perm == list(range(n))  # diagonal on global qubit: no relabeling
    expected = dense_reference(prims, n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-6


def test_all_global_diag(mesh):
    n = 5
    prims = [Prim(H, (3,)), Prim(H, (4,)),
             Prim(np.array([1, 1j], dtype=complex), (0,), diag=True),
             Prim(CZ, (0, 1), diag=True),
             Prim(CZ, (1, 2), diag=True)]
    # make amplitudes nonzero everywhere first
    pre = [Prim(H, (q,)) for q in range(n)]
    sim = ShardedSim(n, mesh)
    sim.apply(pre + prims)
    expected = dense_reference(pre + prims, n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-6


@pytest.mark.parametrize("seed", range(3))
def test_random_circuit_matches(mesh, seed):
    from tests.test_fusion import random_prims

    n = 7
    prims = random_prims(n, 30, seed)
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    expected = dense_reference(prims, n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 2e-5


def test_qft_sharded(mesh):
    n = 8
    sim = ShardedSim(n, mesh)
    sim.apply(qft_prims(n))
    expected = complex_from_planar(CompiledCircuit(n, qft_prims(n))(zero_state(n)))
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-5


def test_ghz_sharded_and_measure(mesh):
    n = 8
    sim = ShardedSim(n, mesh)
    sim.apply(ghz_prims(n))
    p = sim.prob_one(0)
    assert abs(p - 0.5) < 1e-5
    key = jax.random.PRNGKey(0)
    outcome, key = sim.measure_qubit(0, key)
    # after measuring qubit 0, all qubits must agree (GHZ correlations)
    for q in range(1, n):
        assert abs(sim.prob_one(q) - outcome) < 1e-5


def test_global_qubit_measurement(mesh):
    n = 6
    sim = ShardedSim(n, mesh)
    sim.apply([Prim(X, (1,))])  # qubit 1 (physical 1 after localize-swap...)
    # X is dense -> qubit 1 was relabeled; prob must still follow logical id
    assert abs(sim.prob_one(1) - 1.0) < 1e-6
    assert abs(sim.prob_one(0) - 0.0) < 1e-6


def test_collapse_global(mesh):
    n = 6
    sim = ShardedSim(n, mesh)
    sim.apply(ghz_prims(n))
    sim.collapse(0, 1)  # project MSB qubit (physical local after cnot chain? logical api)
    amps = sim.amplitudes()
    expected = np.zeros(1 << n, dtype=complex)
    expected[-1] = 1
    assert np.linalg.norm(amps - expected) < 1e-5


def test_sharded_sampling_ghz(mesh):
    n = 10
    sim = ShardedSim(n, mesh)
    sim.apply(ghz_prims(n))
    idx = sim.sample(512, jax.random.PRNGKey(7))
    assert set(np.unique(idx)) <= {0, (1 << n) - 1}
    frac = float(np.mean(idx == 0))
    assert 0.3 < frac < 0.7


def test_sharded_sampling_brickwork_matches_distribution(mesh):
    n = 8
    prims = brickwork_prims(n, 3, seed=5)
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    probs = np.abs(sim.amplitudes()) ** 2
    idx = sim.sample(4096, jax.random.PRNGKey(3))
    hist = np.bincount(idx, minlength=1 << n) / 4096
    # total-variation distance should be small-ish for 4096 shots
    tv = 0.5 * np.abs(hist - probs).sum()
    assert tv < 0.15


def test_swap_roundtrip_identity(mesh):
    n = 6
    prims = [Prim(H, (q,)) for q in range(n)]
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    before = sim.amplitudes()
    sim.swap_global_local(0, 5)
    sim.swap_global_local(0, 5)
    # two swaps restore the physical layout; amplitudes() is permutation-aware
    assert np.linalg.norm(sim.amplitudes() - before) < 1e-6


def test_fused_apply_dispatch_count(mesh):
    """VERDICT item 4 bar: a fused sharded QFT issues at most ~2x the
    single-chip fused pass count (was ~n^2/2 one-prim dispatches)."""
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.parallel.sharded import ShardedSim

    n = 16
    single = CompiledCircuit(n, qft_prims(n), use_pallas=False)
    sim = ShardedSim(n, mesh)
    sim.apply(qft_prims(n))
    assert sim.dispatch_count <= 2 * len(single.ops), (
        sim.dispatch_count, len(single.ops))
    # and it computes the right state
    expected = single.state_to_complex(single(single.init_state()))
    got = sim.amplitudes()
    assert np.linalg.norm(got - expected) < 1e-5


def test_fused_vs_unfused_equivalence(mesh):
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.parallel.sharded import ShardedSim

    n = 10
    prims = brickwork_prims(n, depth=3, seed=5)
    a = ShardedSim(n, mesh).apply(prims, fused=True).amplitudes()
    b = ShardedSim(n, mesh).apply(prims, fused=False).amplitudes()
    assert np.linalg.norm(a - b) < 1e-5


@pytest.mark.parametrize("pauli", ["ZIIIII", "XIIIII", "IYIIII", "XYZIII",
                                   "ZZIIII", "XXXXXX", "IIIIXZ", "YXIIIZ"])
def test_sharded_expectation_vs_dense(mesh, pauli):
    """Pauli expectation over the mesh (incl. global X/Y -> ppermute
    pairing) vs the dense oracle."""
    from tests.test_models import dense_pauli

    n = 6
    prims = brickwork_prims(n, depth=2, seed=5)
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    v = sim.amplitudes()
    expected = float(np.real(v.conj() @ dense_pauli(pauli) @ v))
    got = sim.expectation(pauli)
    assert abs(got - expected) < 1e-5, pauli


def test_sharded_expectation_after_relabel_swap(mesh):
    """The logical->physical permutation from a relabel swap must be folded
    into the Pauli string."""
    from tests.test_models import dense_pauli

    n = 6
    sim = ShardedSim(n, mesh)
    sim.apply([Prim(H, (q,)) for q in range(n)])
    sim.apply([Prim(CNOT, (0, 3))])  # global target: forces a relabel swap
    assert sim.perm != list(range(n))
    v = sim.amplitudes()
    for pauli in ("ZIIIII", "XZIIII", "IIYIIX"):
        expected = float(np.real(v.conj() @ dense_pauli(pauli) @ v))
        assert abs(sim.expectation(pauli) - expected) < 1e-5, pauli


def test_sharded_expectation_wide_local_block(mesh):
    """m > 7 local qubits (C = 2048 canonical layout): the expectation
    body must use the PHYSICAL lane width — the pre-fix code built 128-wide
    sign tables against (Rm, 2048) blocks and crashed on every realistic
    size. Covers diag, row-flip, group-flip and lane-flip local targets
    plus device/bank-bit paths."""
    from qubism_tpu.ops.measure import expectation_pauli

    n = 15  # d=3 on the 8-device mesh -> m=12, C=2048, Rm=2
    prims = brickwork_prims(n, depth=2, seed=9)
    sim = ShardedSim(n, mesh)
    sim.apply(prims)
    ref_planes = CompiledCircuit(n, prims, use_pallas=False)(zero_state(n))
    for pauli in ("Z" + "I" * (n - 1),          # device-bit Z
                  "X" + "I" * (n - 1),          # device-bit X -> ppermute
                  "I" * 3 + "Z" + "I" * (n - 4),  # local row bit
                  "I" * 3 + "X" + "I" * (n - 4),  # local row flip
                  "I" * (n - 1) + "X",          # lane lo flip
                  "I" * (n - 4) + "Y" + "I" * 3,  # lane group flip
                  "Z" * n,                      # all-Z diag
                  "XY" + "I" * (n - 4) + "ZX"):  # mixed everything
        expected = expectation_pauli(ref_planes, n, pauli)
        assert abs(sim.expectation(pauli) - expected) < 1e-4, pauli
    # the grouped sum path at m > 7
    terms = [(0.7, "Z" * n), (-0.3, "X" + "I" * (n - 1)),
             (1.1, "I" * (n - 1) + "Z"), (0.25, "I" * (n - 2) + "XY")]
    ref = sum(c * expectation_pauli(ref_planes, n, p) for c, p in terms)
    assert abs(sim.expectation_sum(terms) - ref) < 1e-4


# -- per-device sub-shard banks (the 33-34q representation) --------------------


@pytest.mark.parametrize("banks", [1, 2])
@pytest.mark.parametrize("seed", range(2))
def test_banked_random_circuit_matches(mesh, banks, seed):
    """With w bank bits per device, random circuits (dense gates landing on
    bank bits -> cross-bank butterflies / block decompositions) must match
    the dense reference."""
    from tests.test_fusion import random_prims

    n = 8
    prims = random_prims(n, 30, seed)
    sim = ShardedSim(n, mesh, banks=banks)
    assert sim.m == n - 3 - banks
    sim.apply(prims)
    expected = dense_reference(prims, n)
    assert np.linalg.norm(sim.amplitudes() - expected) < 2e-5


def test_banked_qft_and_ghz(mesh):
    n = 9
    sim = ShardedSim(n, mesh, banks=2)
    sim.apply(qft_prims(n))
    expected = complex_from_planar(CompiledCircuit(n, qft_prims(n))(zero_state(n)))
    assert np.linalg.norm(sim.amplitudes() - expected) < 1e-5

    sim = ShardedSim(n, mesh, banks=2)
    sim.apply(ghz_prims(n))
    assert abs(sim.prob_one(0) - 0.5) < 1e-5
    outcome, _ = sim.measure_qubit(0, jax.random.PRNGKey(0))
    for q in range(1, n):
        assert abs(sim.prob_one(q) - outcome) < 1e-5


def test_banked_bank_bit_measurement_and_collapse(mesh):
    """Measure/collapse a qubit whose physical position is a BANK bit."""
    n = 7
    sim = ShardedSim(n, mesh, banks=2)
    # qubit at physical position 3 (first bank bit): put it in superposition
    # via a relabel-free path: H on logical 3 (physically local? no: 3 is a
    # bank bit -> crossmix/bfly path), then check Born stats
    sim.apply([Prim(H, (3,))])
    assert abs(sim.prob_one(3) - 0.5) < 1e-5
    sim.collapse(3, 1)
    amps = sim.amplitudes()
    expected = np.zeros(1 << n, dtype=complex)
    expected[1 << (n - 1 - 3)] = 1
    assert np.linalg.norm(amps - expected) < 1e-5


def test_banked_sampling(mesh):
    n = 9
    prims = brickwork_prims(n, 3, seed=2)
    sim = ShardedSim(n, mesh, banks=2)
    sim.apply(prims)
    probs = np.abs(sim.amplitudes()) ** 2
    idx = sim.sample(4096, jax.random.PRNGKey(3))
    hist = np.bincount(idx, minlength=1 << n) / 4096
    tv = 0.5 * np.abs(hist - probs).sum()
    assert tv < 0.2


@pytest.mark.parametrize("pauli", ["ZIIIIIII", "XIIZIIII", "IIIYXIII",
                                   "ZXYIIIIZ"])
def test_banked_expectation(mesh, pauli):
    """Pauli strings crossing device/bank/local bit regions."""
    from tests.test_models import dense_pauli

    n = 8
    prims = brickwork_prims(n, depth=2, seed=7)
    sim = ShardedSim(n, mesh, banks=2)
    sim.apply(prims)
    v = sim.amplitudes()
    expected = float(np.real(v.conj() @ dense_pauli(pauli) @ v))
    assert abs(sim.expectation(pauli) - expected) < 1e-5, pauli


def test_banked_fused_vs_unfused(mesh):
    n = 9
    prims = brickwork_prims(n, depth=2, seed=11)
    a = ShardedSim(n, mesh, banks=2).apply(prims, fused=True).amplitudes()
    b = ShardedSim(n, mesh, banks=2).apply(prims, fused=False).amplitudes()
    assert np.linalg.norm(a - b) < 1e-5


def test_default_banks_keep_per_device_buffers_compilable():
    """BASELINE configs[4]: 33-34 qubits over 8 devices must be
    REPRESENTABLE — per-device plane buffers stay <= 2^29 elements."""
    from qubism_tpu.parallel.sharded import LOCAL_MAX, default_banks

    for n in (30, 33, 34):
        w = default_banks(n, 3)
        m = n - 3 - w
        assert m <= LOCAL_MAX
        assert (1 << m) <= (1 << 29)
    assert default_banks(34, 3) == 2
    assert default_banks(29, 3) == 0


def test_n34_shape_feasibility_dryrun(mesh):
    """Abstractly lower a 34-qubit sharded segment (GHZ head + brickwork
    layer) over the 8-device mesh WITHOUT allocating the 128 GiB state:
    jax.eval_shape through the full shard_map + Pallas plan stream, per-
    device buffers <= 2^29 elements (VERDICT r2 item 1's bar)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qubism_tpu.models.circuits import ghz_prims
    from qubism_tpu.parallel import sharded as S

    n = 34
    sim = ShardedSim(n, mesh, allocate=False)  # plan-only: no 128 GiB state
    assert sim.w == S.default_banks(n, 3) == 2
    assert sim.Rm * sim.C <= 1 << 29

    # a communication-free segment: local H cascade + CX chain on local
    # qubits + a diagonal touching a device bit (gdiag)
    CZd = np.array([1, 1, 1, -1], dtype=complex)
    prims = [Prim(H, (q,)) for q in range(sim.d + sim.w, n)]
    prims += [Prim(CNOT, (q, q + 1)) for q in range(sim.d + sim.w, n - 1)]
    prims += [Prim(CZd, (0, n - 1), diag=True)]
    chunks = sim._lower_segment(prims)
    assert len(chunks) >= 2  # chunked for compile-time sanity at this size

    sh = NamedSharding(mesh, P("amp"))
    plane = jax.ShapeDtypeStruct((sim.D * sim.Rm, sim.C), jnp.float32,
                                 sharding=sh)
    banks = tuple((plane, plane) for _ in range(1 << sim.w))
    for sig, steps, operands in chunks:
        fn = sim._segment_fn(sig, steps)
        out = jax.eval_shape(fn, banks, tuple(operands))
        assert len(out) == 1 << sim.w
        for re, im in out:
            assert re.shape == (sim.D * sim.Rm, sim.C)
            assert re.dtype == jnp.float32


def test_mesh_hierarchical_sampler_matches(mesh, monkeypatch):
    """The large-m 3-level sampler path (leaf-chunk search per bank) must
    produce the same distribution as the small-m cumsum path."""
    from qubism_tpu.ops import sample as S_mod

    n = 9  # m = 9 - 3 - 0 = 6... use banks=0 and force the big path
    prims = brickwork_prims(n, 3, seed=4)
    sim_a = ShardedSim(n, mesh)
    sim_a.apply(prims)
    probs = np.abs(sim_a.amplitudes()) ** 2
    idx_small = sim_a.sample(2048, jax.random.PRNGKey(5))

    monkeypatch.setattr(S_mod, "_BIG_SAMPLE_BITS", 6)
    monkeypatch.setattr(S_mod, "_LEAF_BITS", 2)
    sim_b = ShardedSim(n, mesh)
    sim_b.apply(prims)
    idx_big = sim_b.sample(2048, jax.random.PRNGKey(5))

    for idx in (idx_small, idx_big):
        hist = np.bincount(idx, minlength=1 << n) / 2048
        tv = 0.5 * np.abs(hist - probs).sum()
        assert tv < 0.25, tv
    # identical seeds + thresholds within machine accuracy: the two
    # algorithms may differ only at CDF ulp boundaries
    assert float(np.mean(idx_small == idx_big)) > 0.99


def test_qaoa_energy_on_mesh(mesh):
    """qaoa_maxcut_energy accepts a ShardedSim and matches the plane-pair
    expectation path."""
    from qubism_tpu.models.circuits import (qaoa_maxcut_energy, qaoa_prims,
                                            ring_edges)

    n = 8
    edges = ring_edges(n)
    prims = qaoa_prims(n, edges, gammas=[0.4], betas=[1.1])
    sim = ShardedSim(n, mesh, banks=1)
    sim.apply(prims)
    circ = CompiledCircuit(n, prims)
    state = circ(circ.init_state())
    ref = qaoa_maxcut_energy(state, n, edges)
    got = qaoa_maxcut_energy(sim, n, edges)
    assert abs(got - ref) < 1e-4


@pytest.mark.parametrize("banks", [0, 2])
@pytest.mark.slow
def test_mesh_batched_measurement_matches_per_qubit(mesh, banks):
    """measure_qubits (one dispatch: psum'd marginal table + ancestral
    draws + joint projection) must produce the same outcomes and collapsed
    state as the per-qubit prob/collapse stream for the same key — across
    device/bank/local measured positions and a relabeling perm."""
    import jax.numpy as jnp

    n = 8
    prims = brickwork_prims(n, depth=2, seed=9)
    for qubits in [(0, 4, 7), (1, 3, 5, 6), (2,), tuple(range(n))]:
        key = jax.random.PRNGKey(13)
        a = ShardedSim(n, mesh, banks=banks)
        a.apply(prims)
        outs_a, _ = a.measure_qubits(qubits, key)
        b = ShardedSim(n, mesh, banks=banks)
        b.apply(prims)
        outs_b = []
        kk = key
        for q in qubits:
            o, kk = b.measure_qubit(q, kk)
            outs_b.append(o)
        assert outs_a == outs_b, (qubits, banks)
        assert np.linalg.norm(a.amplitudes() - b.amplitudes()) < 1e-5


def test_mesh_batched_measurement_ghz_correlations(mesh):
    n = 9
    sim = ShardedSim(n, mesh, banks=1)
    sim.apply(ghz_prims(n))
    outs, _ = sim.measure_qubits(tuple(range(n)), jax.random.PRNGKey(2))
    assert len(set(outs)) == 1  # GHZ: all bits agree
    amps = sim.amplitudes()
    want = np.zeros(1 << n, dtype=complex)
    want[0 if outs[0] == 0 else (1 << n) - 1] = 1
    assert np.linalg.norm(amps - want) < 1e-5


def test_mesh_expectation_sum(mesh):
    """Pauli-sum energies over the mesh: one dispatch, matches per-string."""
    n = 8
    prims = brickwork_prims(n, depth=2, seed=6)
    sim = ShardedSim(n, mesh, banks=1)
    sim.apply(prims)
    terms = [(0.5, "ZZIIIIII"), (-1.25, "IXYIIIII"), (2.0, "IIIIXZII"),
             (0.75, "YIIIIIIY")]
    ref = sum(c * sim.expectation(p) for c, p in terms)
    d0 = sim.dispatch_count
    got = sim.expectation_sum(terms)
    assert abs(got - ref) < 1e-5
