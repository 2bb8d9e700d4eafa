"""Compiled-kernel equivalence and distribution checks on the live TPU.

Every mechanic of the canonical-layout kernels (ops/kernels.py) is compared
against the XLA traced reference COMPILED on device at n = 14-16: axis,
rowroll and laneroll targets, mixed-mechanism multi-target gates, stage
blocks, 1q layers, diagonal layers, lane matmuls and the cross-shard
butterfly. Plus Born statistics of on-device sampling, the mesh=1 path,
and an n=30 end-to-end run whose fit in HBM PROVES buffer donation (an
undonated pipeline would hold 2x the 8 GiB state and OOM the 16 GiB chip).
"""

import numpy as np
import pytest

RNG = np.random.default_rng(42)


def rand_u(k: int) -> np.ndarray:
    m = RNG.normal(size=(1 << k, 1 << k)) + 1j * RNG.normal(size=(1 << k, 1 << k))
    q, _ = np.linalg.qr(m)
    return q


def rand_state(n: int):
    import jax.numpy as jnp

    v = RNG.normal(size=1 << n) + 1j * RNG.normal(size=1 << n)
    v /= np.linalg.norm(v)
    return (jnp.asarray(v.real.astype(np.float32)),
            jnp.asarray(v.imag.astype(np.float32)))


def xla_reference(planes, u, targets, n):
    import jax

    from qubism_tpu.ops import apply as A

    fn = jax.jit(lambda p: A.apply_gate_traced(p, u, targets, n))
    out = fn(planes)
    return np.asarray(out[0]) + 1j * np.asarray(out[1])


def kernel_result(pair, n):
    z = np.asarray(pair[0]).reshape(-1) + 1j * np.asarray(pair[1]).reshape(-1)
    return z


# n=16: axis targets are q <= 2 (stride >= 128*2048 impossible at n=16 with
# C=2048 -> row bits = 5, so _mech: axis needs s >= 128*C -> none; rowroll
# q in 0..4, laneroll 5..8, lane block 9..15). n=16 exercises rolls+lane;
# a larger-n case (n=20) gets true axis targets.
@pytest.mark.parametrize("n,targets", [
    (16, (0,)),            # rowroll
    (16, (4,)),            # rowroll, amount 1
    (16, (6,)),            # laneroll
    (16, (0, 6)),          # rowroll + laneroll
    (16, (1, 3)),          # two rowrolls
    (16, (0, 2, 5)),       # three mixed rolls
    (20, (0,)),            # axis
    (20, (0, 1)),          # two axis
    (20, (0, 5, 8)),       # axis + rowroll + laneroll
    (20, (2, 3, 6, 8)),    # four targets, mixed
])
def test_row_gate_mechanics_compiled(n, targets):
    from qubism_tpu.ops import kernels

    u = rand_u(len(targets))
    planes = rand_state(n)
    ref = xla_reference(planes, u, targets, n)
    got = kernel_result(kernels.row_gate(
        kernels.to_canon(planes, n), u, targets, n), n)
    assert np.linalg.norm(got - ref) < 1e-5, (n, targets)


def test_lane_gate_compiled():
    from qubism_tpu.ops import apply as A
    from qubism_tpu.ops import kernels

    n = 16
    targets = (11, 14)
    u = rand_u(2)
    planes = rand_state(n)
    ref = xla_reference(planes, u, targets, n)
    expanded = A.expand_for_view(u, n, targets)
    got = kernel_result(kernels.lane_gate(
        kernels.to_canon(planes, n), expanded, n), n)
    assert np.linalg.norm(got - ref) < 1e-5


def test_diag_layer_compiled():
    import jax

    from qubism_tpu.ops import apply as A
    from qubism_tpu.ops import kernels

    n = 16
    factors = []
    for targets in [(0, 3), (2, 12), (14,), (5, 9, 15)]:
        d = np.exp(1j * RNG.uniform(0, 2 * np.pi, size=1 << len(targets)))
        factors.append((d, targets))
    planes = rand_state(n)

    def ref_fn(p):
        from qubism_tpu.ops.fusion import DiagLayer, _apply_diag_layer_traced

        return _apply_diag_layer_traced(p, DiagLayer(tuple(factors)), n)

    ref = kernel_result(jax.jit(ref_fn)(planes), n)
    got = kernel_result(kernels.diag_layer(
        kernels.to_canon(planes, n), tuple(factors), n), n)
    assert np.linalg.norm(got - ref) < 1e-5


def test_diag_wide_incompressible_split_compiled():
    """A single incompressible 5q diagonal straddling the row/col boundary:
    _diag_groups must controlled-phase-split it (16 raw terms exceed the
    n>=27 compile cap) and the split passes must agree compiled."""
    import jax

    from qubism_tpu.ops import kernels

    n = 16
    d = np.exp(1j * RNG.uniform(0, 2 * np.pi, size=32))
    targets = (0, 1, 2, 3, 14)  # 4 row bits + 1 lane bit at C=2048
    planes = rand_state(n)

    def ref_fn(p):
        from qubism_tpu.ops.fusion import DiagLayer, _apply_diag_layer_traced

        return _apply_diag_layer_traced(p, DiagLayer(((d, targets),)), n)

    ref = kernel_result(jax.jit(ref_fn)(planes), n)
    got = kernel_result(kernels.diag_layer(
        kernels.to_canon(planes, n), ((d, targets),), n), n)
    assert np.linalg.norm(got - ref) < 1e-5


@pytest.mark.slow
def test_diag_wide_incompressible_compiles_at_n28():
    """The actual compile-cap regression: pre-split, one 16-straddle-term
    diag pass is REJECTED by the TPU compiler at n >= 27. The split passes
    must compile and preserve the norm at n=28."""
    import jax.numpy as jnp

    from qubism_tpu.ops import apply as A
    from qubism_tpu.ops import kernels

    n = 28
    d = np.exp(1j * RNG.uniform(0, 2 * np.pi, size=32))
    targets = (0, 1, 2, 3, n - 2)
    from qubism_tpu.ops.kernels import _MAX_STRADDLE_TERMS, _straddle_weight

    assert _straddle_weight((d, targets), n - 11) > _MAX_STRADDLE_TERMS
    planes = kernels.to_canon(A.zero_state(n), n)
    planes = kernels.row_gate(planes, np.array([[1, 1], [1, -1]]) / np.sqrt(2),
                              (0,), n)
    out = kernels.diag_layer(planes, ((d, targets),), n)
    norm = float(jnp.sum(out[0] * out[0]) + jnp.sum(out[1] * out[1]))
    assert abs(norm - 1.0) < 1e-4
    # the two nonzero amps pick up exact d entries: |0...0> -> d[0],
    # |10...0> (qubit 0 = MSB of the d index) -> d[16]
    flat = (np.asarray(out[0]).reshape(-1), np.asarray(out[1]).reshape(-1))
    s = 1 / np.sqrt(2)
    for idx, dv in ((0, d[0]), (1 << (n - 1), d[16])):
        got = complex(flat[0][idx], flat[1][idx])
        assert abs(got - s * dv) < 1e-5, (idx, got, s * dv)


def test_stage_block_compiled():
    """The fused QFT stage pair vs per-op application."""
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 16
    prims = qft_prims(n)
    pall = CompiledCircuit(n, prims, use_pallas=True)
    ref = CompiledCircuit(n, prims, use_pallas=False)
    a = pall.state_to_complex(pall(pall.init_state()))
    b = ref.state_to_complex(ref(ref.init_state()))
    assert np.linalg.norm(a - b) < 1e-5


def test_layer1q_compiled():
    from qubism_tpu.ops import kernels

    n = 16
    gates = tuple((rand_u(1), q) for q in (0, 2, 3, 5))
    planes = rand_state(n)
    ref = np.asarray(planes[0]) + 1j * np.asarray(planes[1])
    for u, q in gates:
        ref = apply_dense_host(ref, u, (q,), n)
    fn, coefs = kernels.layer1q_prepare(gates, n)
    got = kernel_result(fn(kernels.to_canon(planes, n), coefs), n)
    assert np.linalg.norm(got - ref) < 1e-5


def apply_dense_host(z, u, targets, n):
    t = z.reshape((2,) * n)
    k = len(targets)
    src = list(targets)
    rest = [q for q in range(n) if q not in src]
    perm = src + rest
    t = t.transpose(perm).reshape(1 << k, -1)
    t = u @ t
    t = t.reshape([2] * n)
    inv = np.argsort(perm)
    return t.transpose(inv).reshape(-1)


def test_shard_butterfly_compiled():
    from qubism_tpu.ops import kernels

    m = 14
    u = rand_u(1)
    a, b = rand_state(m), rand_state(m)
    pa = kernels.to_canon(a, m)
    pb = kernels.to_canon(b, m)
    fn, coef = kernels.shard_butterfly_prepare(u, m)
    (oa, ob) = fn((pa, pb), coef)
    za = np.asarray(a[0]) + 1j * np.asarray(a[1])
    zb = np.asarray(b[0]) + 1j * np.asarray(b[1])
    ra = u[0, 0] * za + u[0, 1] * zb
    rb = u[1, 0] * za + u[1, 1] * zb
    assert np.linalg.norm(kernel_result(oa, m) - ra) < 1e-5
    assert np.linalg.norm(kernel_result(ob, m) - rb) < 1e-5


def test_ghz_born_chi2_on_device():
    """On-device GHZ sampling: counts must be ~Bin(shots, 1/2) on the two
    legal outcomes (the end-to-end Born check, compiled)."""
    import jax

    from qubism_tpu.models.circuits import ghz_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.ops.sample import sample_indices_np

    n, shots = 16, 4096
    circ = CompiledCircuit(n, ghz_prims(n))
    state = circ(circ.init_state())
    idx = sample_indices_np(state, n, shots, jax.random.PRNGKey(5))
    zeros = int((idx == 0).sum())
    ones = int((idx == (1 << n) - 1).sum())
    assert zeros + ones == shots
    assert abs(zeros - shots / 2) < 4 * (shots ** 0.5)


def test_mesh1_matches_compiled_on_device():
    """mesh=1 runs the same kernel plans inside shard_map (VERDICT item 2)."""
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim

    n = 16
    sim = ShardedSim(n, make_mesh(1))
    sim.apply(qft_prims(n))
    circ = CompiledCircuit(n, qft_prims(n))
    ref = circ.state_to_complex(circ(circ.init_state()))
    assert np.linalg.norm(sim.amplitudes() - ref) < 1e-5


@pytest.mark.slow
def test_n30_fits_in_hbm_proves_donation():
    """GHZ-30 through mesh=1: per-device state is 2 banks x 2 planes x
    2 GiB = 8 GiB of 16 GiB HBM. Without buffer donation the pipeline
    holds ~2x that and OOMs — completing AND matching Born stats proves
    the donation path (VERDICT r2 item 3)."""
    import jax

    from qubism_tpu.models.circuits import ghz_prims
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim

    n = 30
    sim = ShardedSim(n, make_mesh(1))
    assert sim.w == 1  # banks engaged past the 2^29 per-buffer limit
    sim.apply(ghz_prims(n))
    idx = sim.sample(2048, jax.random.PRNGKey(9))
    zeros = int((idx == 0).sum())
    ones = int((idx == (1 << n) - 1).sum())
    assert zeros + ones == 2048
    assert abs(zeros - 1024) < 4 * (2048 ** 0.5)


def test_variational_grad_compiled_on_device():
    """Differentiable-ansatz value+grad COMPILED on the TPU at n=16:
    autodiff and the adjoint sweep agree with each other and with the
    parameter-shift rule (rotation generators) on the live chip."""
    import jax

    from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,
                                               energy_fn, hea_ansatz,
                                               value_and_grad_fn)

    n = 16
    ans = hea_ansatz(n, 1)
    terms = [(0.8, "Z" + "I" * (n - 2) + "Z"), (-0.5, "XX" + "I" * (n - 2)),
             (0.3, "I" * (n - 2) + "YZ")]
    theta = jax.numpy.asarray(
        RNG.uniform(-np.pi, np.pi, size=ans.num_params).astype(np.float32))
    e_ref, g_ref = value_and_grad_fn(ans, terms)(theta)
    e_adj, g_adj = adjoint_value_and_grad_fn(ans, terms)(theta)
    assert abs(float(e_ref) - float(e_adj)) < 1e-4
    assert np.allclose(np.asarray(g_ref), np.asarray(g_adj), atol=1e-3)
    efn = jax.jit(energy_fn(ans, terms))
    th = np.asarray(theta).copy()
    for j in (0, ans.num_params // 2, ans.num_params - 1):
        tp = th.copy(); tp[j] += np.pi / 2
        tm = th.copy(); tm[j] -= np.pi / 2
        shift = (float(efn(jax.numpy.asarray(tp)))
                 - float(efn(jax.numpy.asarray(tm)))) / 2.0
        assert abs(float(g_ref[j]) - shift) < 5e-3, (j, float(g_ref[j]), shift)


def test_density_matrix_on_device():
    """Vectorized rho at n=7 (2n=14: the Pallas-engine threshold) compiled
    on the TPU: GHZ + depolarizing noise matches the dense numpy Kraus
    oracle's diagonal, trace, purity and parity expectations."""
    import math

    from qubism_tpu.core.density import DensityMatrix, depolarizing
    from qubism_tpu.core.gates import Prim

    n = 7
    h = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    prims = [Prim(h, (0,))] + [Prim(cnot, (i, i + 1)) for i in range(n - 1)]
    dm = DensityMatrix(n).apply(prims)
    p = 0.3
    dm.apply_channel(depolarizing(p), 3)

    # dense oracle: GHZ projector, then the 1q Kraus sum on qubit 3
    psi = np.zeros(1 << n, dtype=complex)
    psi[0] = psi[-1] = 1 / math.sqrt(2)
    rho = np.outer(psi, psi.conj())
    ks = depolarizing(p)

    def embed1(k, q):
        m = np.array([[1.0]], dtype=complex)
        for i in range(n):
            m = np.kron(m, k if i == q else np.eye(2))
        return m

    rho = sum(embed1(k, 3) @ rho @ embed1(k, 3).conj().T for k in ks)
    assert abs(dm.trace() - 1.0) < 1e-4
    assert abs(dm.purity() - np.real(np.trace(rho @ rho))) < 1e-4
    assert np.abs(dm.probs() - np.real(np.diag(rho))).max() < 1e-5
    got = dm.expectation("Z" + "I" * (n - 2) + "Z")
    mz = np.array([[1.0]], dtype=complex)
    for q in range(n):
        mz = np.kron(mz, np.diag([1, -1]) if q in (0, n - 1) else np.eye(2))
    want = float(np.real(np.trace(mz @ rho)))
    assert abs(got - want) < 1e-4, (got, want)


def test_mps_engine_on_device():
    """MPS kernels (QR/SVD/scan sampling) compiled on the live TPU:
    random 5q circuit matches the dense oracle; GHZ-30 via MPS stays
    exact and samples correlated bits."""
    from qubism_tpu.core.gates import Prim
    from qubism_tpu.mps import MPSSim

    n = 5
    prims = []
    for _ in range(12):
        if RNG.random() < 0.5:
            a, b = RNG.choice(n, size=2, replace=False)
            prims.append(Prim(rand_u(2), (int(a), int(b))))
        else:
            prims.append(Prim(rand_u(1), (int(RNG.integers(n)),)))
    sim = MPSSim(n, chi=8, seed=0).apply(prims)
    got = sim.to_statevec()

    import qubism_tpu as qt
    sv = qt.mk_state_vec(n)
    for p in prims:
        sv = qt.Gate(n, [p])(sv)
    assert np.linalg.norm(got - sv.amps) < 5e-4

    h = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    cx = np.eye(4, dtype=complex)[[0, 1, 3, 2]]
    g = MPSSim(30, chi=4, seed=1).apply(
        [Prim(h, (0,))] + [Prim(cx, (q, q + 1)) for q in range(29)])
    assert g.trunc_error == 0.0
    bits = g.sample(128)
    assert (bits == bits[:, :1]).all()


def test_noisy_trajectory_engines_on_device():
    """The session-4 noise executors compiled on the live chip: Pauli
    frames (scan + affine matmul), and MPS trajectories (per-trajectory
    tape overwrites) — clean-fraction windows on small noisy GHZ."""
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram
    from qubism_tpu.mps.noise import MPSTrajectoryProgram

    src = ("qreg q[8]; creg c[8];\n"
           "U(1.5707963267948966, 0, 3.141592653589793) q[0];\n"
           + "".join(f"CX q[{q}], q[{q + 1}];\n" for q in range(7))
           + "measure q -> c;\n")
    ast = parse_openqasm("<tpu>", src)
    fr = StabilizerTrajectoryProgram(ast, noise="dep:0.01")
    fbits = fr.run_vals(512, seed=0)["c"]
    assert fr.used_frames
    clean = float((fbits == fbits[:, :1]).all(axis=1).mean())
    assert 0.8 < clean <= 1.0          # 15 sites, (1-2p/3)^15 ~ 0.905
    mp = MPSTrajectoryProgram(ast, noise="dep:0.01", chi=4)
    mbits = mp.run_vals(128, seed=1)["c"]
    mclean = float((mbits == mbits[:, :1]).all(axis=1).mean())
    assert 0.75 < mclean <= 1.0
    # dense engine: the mixed-unitary fast path (dep/dep2 -> one static
    # CDF draw + one small unitary) AND the state-dependent Kraus path
    # (ad) compiled together on the chip
    from qubism_tpu.run.noisy import TrajectoryProgram

    dn = TrajectoryProgram(ast, noise="dep:0.005,dep2:0.01,ad:0.02")
    dbits = dn.run_vals(512, seed=2)["c"]
    dclean = float((dbits == dbits[:, :1]).all(axis=1).mean())
    assert 0.5 < dclean <= 1.0
    # amplitude damping biases survivors toward the all-zeros branch
    ones = float((dbits.sum(axis=1) == 8).mean())
    zeros = float((dbits.sum(axis=1) == 0).mean())
    assert zeros > ones


# -- round-5 device paths -------------------------------------------------------


def test_fused_mcwf_damping_on_device():
    """The in-graph MCWF norm-branch site compiled on the chip: X-all +
    ad circuit has exact independent Bernoulli(1-gamma) outcomes."""
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.noisy import TrajectoryProgram
    from qubism_tpu.utils.stats import chi2_quantile

    n, g, T = 14, 0.2, 512
    lines = [f"qreg q[{n}]; creg c[{n}];"]
    lines += ["U(3.141592653589793, 0, 3.141592653589793) "
              f"q[{q}];" for q in range(n)]
    lines += ["measure q -> c;"]
    tp = TrajectoryProgram(parse_openqasm("<d>", "\n".join(lines)),
                           noise=f"ad:{g}")
    bits = tp.run_vals(T, seed=3, engine="fused")["c"]
    p1 = bits.mean(axis=0)
    want = 1.0 - g
    z2 = ((p1 - want) ** 2 / (want * (1 - want) / T)).sum()
    assert z2 < chi2_quantile(n, 1e-4), (p1, z2)


def test_mesh1_adjoint_matches_single_chip():
    """The mesh adjoint engine's program shapes on the real chip (mesh=1):
    value+grad equal to the single-chip Pallas engine."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from qubism_tpu.models.adjoint_mesh import mesh_adjoint_value_and_grad_fn
    from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,
                                               maxcut_terms,
                                               qaoa_maxcut_ansatz)

    nq = 16
    edges = [(i, (i + 1) % nq) for i in range(nq)]
    ans = qaoa_maxcut_ansatz(nq, edges, 2)
    terms, const = maxcut_terms(nq, edges)
    neg = [(-c, s) for c, s in terms]
    theta = np.asarray([0.3, -0.6, 0.45, 0.8], np.float32)
    m1 = Mesh(np.array(jax.devices()[:1]), ("amp",))
    em, gm = mesh_adjoint_value_and_grad_fn(ans, neg, m1,
                                            constant=-const)(theta)
    e1, g1 = adjoint_value_and_grad_fn(ans, neg, constant=-const)(theta)
    assert abs(float(em) - float(e1)) < 1e-4
    assert np.abs(np.asarray(gm) - np.asarray(g1)).max() < 1e-4
