"""Differentiable variational circuits (models/variational.py).

Oracles: an independent dense numpy simulation of each ansatz (gate
matrices rebuilt from scratch with numpy), the exact parameter-shift rule
for rotation gates, dense diagonalization for ground energies, and the
existing compiled-engine QAOA path.
"""

import math

import jax
import numpy as np
import pytest

from qubism_tpu.models.variational import (Ansatz, PGate, energy_fn,
                                           hea_ansatz, maxcut_terms,
                                           qaoa_maxcut_ansatz, state_fn,
                                           value_and_grad_fn, vqe_minimize)
from qubism_tpu.core.gates import Prim
from qubism_tpu.ops.apply import complex_from_planes

# -- independent dense oracle ---------------------------------------------------

_I2 = np.eye(2, dtype=complex)
_PAULI = {"I": _I2, "X": np.array([[0, 1], [1, 0]], dtype=complex),
          "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
          "Z": np.array([[1, 0], [0, -1]], dtype=complex)}


def _np_gate(name, args):
    t = args[0] if args else None
    if name == "rx":
        c, s = math.cos(t / 2), math.sin(t / 2)
        return np.array([[c, -1j * s], [-1j * s, c]])
    if name == "ry":
        c, s = math.cos(t / 2), math.sin(t / 2)
        return np.array([[c, -s], [s, c]])
    if name == "rz":
        return np.diag([np.exp(-1j * t / 2), np.exp(1j * t / 2)])
    if name == "phase":
        return np.diag([1, np.exp(1j * t)])
    if name == "u3":
        th, ph, lm = args
        ct, st = math.cos(th / 2), math.sin(th / 2)
        return np.array([[ct, -np.exp(1j * lm) * st],
                         [np.exp(1j * ph) * st, np.exp(1j * (ph + lm)) * ct]])
    if name == "cphase":
        return np.diag([1, 1, 1, np.exp(1j * t)])
    if name == "crz":
        return np.diag([1, 1, np.exp(-1j * t / 2), np.exp(1j * t / 2)])
    if name == "crx":
        c, s = math.cos(t / 2), math.sin(t / 2)
        m = np.eye(4, dtype=complex)
        m[2:, 2:] = [[c, -1j * s], [-1j * s, c]]
        return m
    if name == "cry":
        c, s = math.cos(t / 2), math.sin(t / 2)
        m = np.eye(4, dtype=complex)
        m[2:, 2:] = [[c, -s], [s, c]]
        return m
    if name == "rzz":
        e0, e1 = np.exp(-1j * t / 2), np.exp(1j * t / 2)
        return np.diag([e0, e1, e1, e0])
    if name in ("rxx", "ryy"):
        pp = _PAULI["X" if name == "rxx" else "Y"]
        g = np.kron(pp, pp)
        return math.cos(t / 2) * np.eye(4) - 1j * math.sin(t / 2) * g
    raise AssertionError(name)


def _embed(u, targets, n):
    """Dense embedding of a k-qubit gate (targets[0] = MSB) into n qubits."""
    k = len(targets)
    full = np.kron(u, np.eye(1 << (n - k), dtype=complex))
    cur = list(targets) + [q for q in range(n) if q not in targets]
    perm = [cur.index(q) for q in range(n)]
    return (full.reshape((2,) * (2 * n))
            .transpose(perm + [n + p for p in perm])
            .reshape(1 << n, 1 << n))


def dense_state(ansatz, theta):
    psi = np.zeros(1 << ansatz.n, dtype=complex)
    psi[0] = 1.0
    for op in ansatz.ops:
        if isinstance(op, PGate):
            u = _np_gate(op.name, [op.scale * float(theta[j]) for j in op.pidx])
        else:
            u = np.diag(op.u) if op.diag else np.asarray(op.u)
        psi = _embed(u, op.targets, ansatz.n) @ psi
    return psi


def dense_hamiltonian(terms, n):
    h = np.zeros((1 << n, 1 << n), dtype=complex)
    for coef, p in terms:
        m = np.array([[1.0]], dtype=complex)
        for c in p:
            m = np.kron(m, _PAULI[c])
        h += coef * m
    return h


# -- state correctness ----------------------------------------------------------


def test_every_builder_matches_dense():
    """One ansatz touching every parameterized builder (row + lane targets,
    unsorted 2q targets) reproduces the dense oracle state."""
    n = 3
    rng = np.random.default_rng(5)
    ops = [
        PGate("ry", (0,), (0,)),
        PGate("rx", (1,), (1,)),
        PGate("rz", (2,), (2,)),
        PGate("phase", (1,), (3,)),
        PGate("u3", (2,), (4, 5, 6)),
        PGate("cphase", (0, 2), (7,)),
        PGate("crz", (2, 0), (8,)),       # unsorted targets
        PGate("crx", (1, 2), (9,)),
        PGate("cry", (0, 1), (10,)),
        PGate("rzz", (2, 1), (11,), scale=2.0),
    ]
    ans = Ansatz(n, tuple(ops), 12)
    theta = rng.uniform(-math.pi, math.pi, size=12).astype(np.float32)
    got = complex_from_planes(state_fn(ans)(jax.numpy.asarray(theta)))
    want = dense_state(ans, theta)
    assert np.linalg.norm(got - want) < 1e-5


def test_hea_matches_dense_with_fixed_prims():
    n, layers = 4, 2
    ans = hea_ansatz(n, layers)
    rng = np.random.default_rng(11)
    theta = rng.uniform(-1, 1, size=ans.num_params).astype(np.float32)
    got = complex_from_planes(state_fn(ans)(jax.numpy.asarray(theta)))
    want = dense_state(ans, theta)
    assert np.linalg.norm(got - want) < 1e-5


def test_energy_matches_dense():
    n = 3
    ans = hea_ansatz(n, 1)
    rng = np.random.default_rng(2)
    theta = rng.uniform(-2, 2, size=ans.num_params).astype(np.float32)
    terms = [(0.7, "ZZI"), (-0.4, "XIY"), (1.1, "IZI"), (0.25, "YXZ")]
    e = float(energy_fn(ans, terms)(jax.numpy.asarray(theta)))
    psi = dense_state(ans, theta)
    want = float(np.real(psi.conj() @ dense_hamiltonian(terms, n) @ psi))
    assert abs(e - want) < 1e-4


# -- gradients ------------------------------------------------------------------


def test_grad_matches_parameter_shift():
    """For ry/rz (generator eigenvalues +-1/2) the parameter-shift rule
    dE/dt = (E(t + pi/2) - E(t - pi/2)) / 2 is EXACT — the autodiff
    gradient must match it on every parameter."""
    n = 3
    ans = hea_ansatz(n, 1)
    terms = [(0.8, "ZIZ"), (-0.5, "XXI"), (0.3, "IYZ")]
    rng = np.random.default_rng(7)
    theta = rng.uniform(-math.pi, math.pi,
                        size=ans.num_params).astype(np.float32)
    efn = energy_fn(ans, terms)
    e, grad = value_and_grad_fn(ans, terms)(jax.numpy.asarray(theta))
    grad = np.asarray(grad)
    for j in range(ans.num_params):
        tp = theta.copy(); tp[j] += math.pi / 2
        tm = theta.copy(); tm[j] -= math.pi / 2
        shift = (float(efn(jax.numpy.asarray(tp)))
                 - float(efn(jax.numpy.asarray(tm)))) / 2.0
        assert abs(grad[j] - shift) < 5e-3, (j, grad[j], shift)


def test_qaoa_shared_param_grad_matches_finite_diff():
    """Shared parameters (one gamma drives every edge) accumulate gradients;
    check against central finite differences."""
    n, p = 4, 2
    edges = [(i, (i + 1) % n) for i in range(n)]
    ans = qaoa_maxcut_ansatz(n, edges, p)
    terms, const = maxcut_terms(n, edges)
    theta = np.array([0.3, 0.7, 0.9, 0.4], dtype=np.float32)
    _, grad = value_and_grad_fn(ans, terms, constant=const)(
        jax.numpy.asarray(theta))
    efn = energy_fn(ans, terms, constant=const)
    eps = 1e-2
    for j in range(4):
        tp = theta.copy(); tp[j] += eps
        tm = theta.copy(); tm[j] -= eps
        fd = (float(efn(jax.numpy.asarray(tp)))
              - float(efn(jax.numpy.asarray(tm)))) / (2 * eps)
        assert abs(float(grad[j]) - fd) < 5e-2, (j, float(grad[j]), fd)


# -- cross-path consistency -----------------------------------------------------


def test_qaoa_ansatz_matches_compiled_qaoa():
    """qaoa_maxcut_ansatz + maxcut_terms reproduce the compiled-engine
    qaoa_prims + qaoa_maxcut_energy pipeline at the same parameters."""
    from qubism_tpu.models.circuits import qaoa_maxcut_energy, qaoa_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n, p = 5, 2
    edges = [(i, (i + 1) % n) for i in range(n)]
    gammas, betas = [0.37, 0.81], [1.02, 0.44]
    circ = CompiledCircuit(n, qaoa_prims(n, edges, gammas, betas))
    ref = qaoa_maxcut_energy(circ(circ.init_state()), n, edges)

    ans = qaoa_maxcut_ansatz(n, edges, p)
    terms, const = maxcut_terms(n, edges)
    theta = np.array(gammas + betas, dtype=np.float32)
    got = float(energy_fn(ans, terms, constant=const)(
        jax.numpy.asarray(theta)))
    assert abs(got - ref) < 1e-4


# -- end-to-end optimization ----------------------------------------------------


def test_vqe_h2_ground_energy():
    """VQE on the reduced 2-qubit H2 Hamiltonian (O'Malley et al. 2016
    coefficients at the equilibrium bond length) converges to the exact
    ground energy from dense diagonalization."""
    terms = [(0.3435, "ZI"), (-0.4347, "IZ"), (0.5716, "ZZ"),
             (0.0910, "XX"), (0.0910, "YY")]
    const = -0.4804
    exact = float(np.linalg.eigvalsh(
        dense_hamiltonian(terms, 2)).min()) + const

    ans = hea_ansatz(2, 2)
    rng = np.random.default_rng(3)
    theta0 = rng.uniform(-0.3, 0.3, size=ans.num_params).astype(np.float32)
    theta, hist = vqe_minimize(ans, terms, theta0, steps=300, constant=const)
    final = float(energy_fn(ans, terms, constant=const)(theta))
    assert final < float(hist[0])          # it optimized
    assert abs(final - exact) < 2e-3, (final, exact)


def test_qaoa_maxcut_optimization_improves_cut():
    """Gradient ASCENT on the differentiable QAOA (minimize -<C>) beats the
    initial parameters decisively on a 4-ring (max cut = 4)."""
    n, p = 4, 2
    edges = [(i, (i + 1) % n) for i in range(n)]
    ans = qaoa_maxcut_ansatz(n, edges, p)
    terms, const = maxcut_terms(n, edges)
    neg = [(-c, s) for c, s in terms]
    theta0 = np.full(2 * p, 0.2, dtype=np.float32)
    theta, hist = vqe_minimize(ans, neg, theta0, steps=250, constant=-const)
    cut = -float(energy_fn(ans, neg, constant=-const)(theta))
    assert cut > 3.2, cut                  # p=2 on the 4-ring reaches > 3.2
    assert cut > -float(hist[0]) + 0.5     # big improvement over the start


def test_vqe_history_is_monotonic_enough():
    """Adam on a smooth 1-qubit landscape: the energy trace ends far below
    where it starts and near the true minimum -|h|."""
    ans = Ansatz(1, (PGate("ry", (0,), (0,)),), 1)
    terms = [(1.0, "Z")]
    theta, hist = vqe_minimize(ans, terms, np.array([0.4], dtype=np.float32),
                               steps=150)
    assert float(hist[-1]) < -0.999


# -- adjoint-method gradients ---------------------------------------------------


def test_apply_pauli_traced_matches_dense():
    """P|psi> via the traced flip+sign path equals the dense operator."""
    from qubism_tpu.ops.measure import apply_pauli_traced

    n = 4
    ans = hea_ansatz(n, 1)
    rng = np.random.default_rng(9)
    theta = rng.uniform(-2, 2, size=ans.num_params).astype(np.float32)
    planes = state_fn(ans)(jax.numpy.asarray(theta))
    psi = dense_state(ans, theta)
    for pauli in ["XIZY", "YYYY", "IZIX", "ZXII", "IIII", "XYZX"]:
        got = complex_from_planes(
            jax.jit(lambda pl: apply_pauli_traced(pl, pauli, n))(planes))
        m = np.array([[1.0]], dtype=complex)
        for c in pauli:
            m = np.kron(m, _PAULI[c])
        assert np.linalg.norm(got - m @ psi) < 1e-5, pauli


def test_adjoint_grad_matches_autodiff():
    """The constant-memory adjoint sweep reproduces reverse-mode autodiff
    on a mixed ansatz (dense + diag + shared + scaled params, Y terms)."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn

    n = 4
    ops = (
        PGate("ry", (0,), (0,)),
        PGate("rx", (1,), (1,)),
        PGate("u3", (2,), (2, 3, 4)),
        Prim(np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                       [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex), (0, 3)),
        PGate("rzz", (1, 3), (5,), scale=2.0),
        PGate("cphase", (0, 2), (6,)),
        PGate("rz", (3,), (0,)),          # shared with ry's parameter
        Prim(np.array([1, 1, 1, -1], dtype=complex), (2, 3), diag=True),
        PGate("cry", (3, 1), (7,)),       # unsorted targets
    )
    ans = Ansatz(n, ops, 8)
    terms = [(0.9, "ZIZI"), (-0.6, "XXII"), (0.4, "IYIY"), (0.2, "ZYXI")]
    rng = np.random.default_rng(21)
    theta = jax.numpy.asarray(
        rng.uniform(-math.pi, math.pi, size=8).astype(np.float32))
    e_ref, g_ref = value_and_grad_fn(ans, terms, constant=0.3)(theta)
    e_adj, g_adj = adjoint_value_and_grad_fn(ans, terms, constant=0.3)(theta)
    assert abs(float(e_ref) - float(e_adj)) < 1e-4
    assert np.allclose(np.asarray(g_ref), np.asarray(g_adj), atol=5e-4), (
        np.asarray(g_ref), np.asarray(g_adj))


def test_vqe_noscan_matches_scan():
    """The host-loop mode (scan=False, for large n) takes the same
    trajectory as the fused lax.scan mode."""
    terms = [(1.0, "ZZ"), (0.4, "XI")]
    ans = hea_ansatz(2, 1)
    theta0 = np.full(ans.num_params, 0.2, dtype=np.float32)
    t1, h1 = vqe_minimize(ans, terms, theta0, steps=40)
    t2, h2 = vqe_minimize(ans, terms, theta0, steps=40, scan=False)
    assert np.allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    assert np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)


def test_vqe_adjoint_converges():
    terms = [(1.0, "ZZ"), (0.4, "XI"), (0.4, "IX")]
    exact = float(np.linalg.eigvalsh(dense_hamiltonian(terms, 2)).min())
    ans = hea_ansatz(2, 1)
    theta0 = np.full(ans.num_params, 0.15, dtype=np.float32)
    theta, hist = vqe_minimize(ans, terms, theta0, steps=250, grad="adjoint")
    final = float(energy_fn(ans, terms)(theta))
    assert abs(final - exact) < 5e-3, (final, exact)


# -- validation -----------------------------------------------------------------


def test_bad_pgate_name_and_arity():
    with pytest.raises(ValueError):
        PGate("nope", (0,), (0,))
    with pytest.raises(ValueError):
        PGate("u3", (0,), (0,))  # u3 needs 3 params
    with pytest.raises(ValueError):
        Ansatz(2, (PGate("rx", (0,), (5,)),), 2)  # pidx out of range
    with pytest.raises(ValueError):
        Ansatz(1, (PGate("rx", (3,), (0,)),), 1)  # target out of range


# -- Hamiltonian library --------------------------------------------------------


def test_hamiltonian_builders_vs_dense():
    """TFIM/XXZ ground energies from dense diagonalization are reached by
    a deep-enough HEA via vqe_minimize (n=3), and h2_minimal matches the
    hard-coded VQE test's Hamiltonian."""
    from qubism_tpu.models.hamiltonians import h2_minimal, heisenberg_xxz, tfim

    for terms, const in (tfim(3, j=1.0, h=0.7),
                         heisenberg_xxz(3, jxy=1.0, jz=0.5, field=0.2)):
        exact = float(np.linalg.eigvalsh(dense_hamiltonian(terms, 3)).min())
        ans = hea_ansatz(3, 3)
        rng = np.random.default_rng(12)
        theta0 = rng.uniform(-0.4, 0.4,
                             size=ans.num_params).astype(np.float32)
        theta, _ = vqe_minimize(ans, terms, theta0, steps=400,
                                constant=const)
        final = float(energy_fn(ans, terms, constant=const)(theta))
        assert final - exact < 2e-2, (final, exact)

    terms, const = h2_minimal()
    assert const == -0.4804 and ("ZZ" in [p for _, p in terms])


def test_tfim_periodic_and_fields():
    from qubism_tpu.models.hamiltonians import heisenberg_xxz, tfim

    terms, _ = tfim(4, periodic=True)
    assert sum(1 for _, p in terms if p.count("Z") == 2) == 4  # ring bonds
    terms, _ = heisenberg_xxz(4, field=0.3)
    assert sum(1 for _, p in terms if p.count("Z") == 1) == 4  # field terms


# -- transform composition ------------------------------------------------------


def test_vmap_batched_energies_and_grads():
    """state_fn/energy_fn compose with jax.vmap: a whole parameter
    landscape (and its gradients) evaluates as ONE batched program — the
    multi-start/grid-scan workflow."""
    import jax.numpy as jnp

    n, p = 4, 1
    edges = [(i, (i + 1) % n) for i in range(n)]
    ans = qaoa_maxcut_ansatz(n, edges, p)
    terms, const = maxcut_terms(n, edges)
    efn = energy_fn(ans, terms, constant=const)
    thetas = jnp.asarray(
        np.random.default_rng(0).uniform(0, 2, (16, 2)).astype(np.float32))
    vals = jax.jit(jax.vmap(efn))(thetas)
    grads = jax.jit(jax.vmap(jax.grad(efn)))(thetas)
    assert vals.shape == (16,) and grads.shape == (16, 2)
    for i in (0, 7, 15):
        assert abs(float(vals[i]) - float(efn(thetas[i]))) < 1e-5
        gi = np.asarray(jax.grad(efn)(thetas[i]))
        assert np.allclose(np.asarray(grads[i]), gi, atol=1e-5)


@pytest.mark.slow
def test_segmented_adjoint_matches_whole_program():
    """segment_size-chunked adjoint (bounded-HLO jits composed on the
    host) returns the same energy/grad as the single-program version, and
    vqe_minimize drops to its host loop for it."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn

    ans = hea_ansatz(3, 2)
    terms = [(0.7, "ZZI"), (-0.4, "XIY"), (0.3, "IZX")]
    theta = jax.numpy.asarray(np.random.default_rng(6).uniform(
        -math.pi, math.pi, ans.num_params).astype(np.float32))
    e1, g1 = adjoint_value_and_grad_fn(ans, terms, constant=0.1)(theta)
    for seg in (1, 4, 7, 100):
        vg = adjoint_value_and_grad_fn(ans, terms, constant=0.1,
                                       segment_size=seg)
        assert vg._host_composed
        e2, g2 = vg(theta)
        assert abs(float(e1) - float(e2)) < 1e-5
        assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    t1, h1 = vqe_minimize(ans, terms, np.asarray(theta), steps=25,
                          grad="adjoint")
    t2, h2 = vqe_minimize(ans, terms, np.asarray(theta), steps=25,
                          grad="adjoint", segment_size=5)
    assert np.allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)
    assert np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-4)


def test_rxx_ryy_builders_match_dense():
    ops = (PGate("ry", (0,), (0,)), PGate("ry", (1,), (1,)),
           PGate("rxx", (0, 1), (2,)), PGate("ryy", (1, 2), (3,)),
           PGate("rxx", (2, 0), (4,)))  # unsorted targets too
    ans = Ansatz(3, ops, 5)
    rng = np.random.default_rng(31)
    theta = rng.uniform(-math.pi, math.pi, 5).astype(np.float32)
    got = complex_from_planes(state_fn(ans)(jax.numpy.asarray(theta)))
    assert np.linalg.norm(got - dense_state(ans, theta)) < 1e-5


def test_tfim_hva_reaches_ground_state():
    """The TFIM Hamiltonian-variational ansatz at n=4, 3 layers recovers
    the dense ground energy to ~1e-2."""
    from qubism_tpu.models.hamiltonians import tfim
    from qubism_tpu.models.variational import tfim_hva_ansatz

    n = 4
    terms, _ = tfim(n, j=1.0, h=1.0)
    exact = float(np.linalg.eigvalsh(dense_hamiltonian(terms, n)).min())
    ans = tfim_hva_ansatz(n, layers=3)
    theta0 = np.full(ans.num_params, 0.1, dtype=np.float32)
    theta, hist = vqe_minimize(ans, terms, theta0, steps=400)
    final = float(energy_fn(ans, terms)(theta))
    assert final - exact < 1e-2, (final, exact)


# -- mesh-sharded gradients (GSPMD over the amplitude axis) ---------------------


def _mesh8():
    from qubism_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


def test_mesh_energy_and_grad_match_single_device():
    """energy_fn(mesh=...) partitions the whole differentiable pipeline
    over an 8-device mesh (amplitude axis sharded, GSPMD-inserted
    collectives) and reproduces the unsharded value AND gradient."""
    nq, p = 8, 2
    edges = [(i, (i + 1) % nq) for i in range(nq)]
    ans = qaoa_maxcut_ansatz(nq, edges, p)
    terms, const = maxcut_terms(nq, edges)
    neg = [(-c, s) for c, s in terms]
    theta = jax.numpy.asarray(
        np.random.default_rng(3).uniform(-1, 1, 2 * p).astype(np.float32))
    e0, g0 = value_and_grad_fn(ans, neg, constant=-const)(theta)
    e1, g1 = value_and_grad_fn(ans, neg, constant=-const,
                               mesh=_mesh8())(theta)
    assert abs(float(e0) - float(e1)) < 1e-5
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)


def test_mesh_sharding_uses_permutes_not_gathers():
    """The compiled sharded energy program communicates by
    collective-permute (device-bit revs) and all-reduce (the energy psum)
    — never an all-gather, which would mean a replicated 2^n temp.
    Requires the device bits to live in the ROW axis (n >= _COL +
    log2(D)); below that the lane-matmul path contracts the sharded axis
    and GSPMD must gather."""
    import re

    nq = 10  # _COL=7 lane qubits + 3 device bits
    ans = qaoa_maxcut_ansatz(nq, [(i, (i + 1) % nq) for i in range(nq)], 1)
    terms = [(0.5, "Z" + "I" * (nq - 1)), (-0.25, "I" * (nq - 2) + "XZ")]
    theta = jax.numpy.zeros(ans.num_params, jax.numpy.float32)
    fn = jax.jit(energy_fn(ans, terms, mesh=_mesh8()))
    txt = fn.lower(theta).compile().as_text()
    assert "all-gather" not in txt, "sharded energy replicated the state"
    assert re.search(r"collective-permute|all-reduce", txt)


def test_mesh_adjoint_matches_single_device():
    """The constant-memory adjoint sweep runs sharded (phi and lam both
    2^n/D per device) in BOTH compile modes and matches the unsharded
    gradients."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn

    ans = hea_ansatz(5, 2)
    terms = [(0.7, "ZZIII"), (-0.4, "XIYII"), (0.3, "IIZXI"),
             (0.2, "IIIZZ")]
    theta = jax.numpy.asarray(np.random.default_rng(9).uniform(
        -math.pi, math.pi, ans.num_params).astype(np.float32))
    e0, g0 = adjoint_value_and_grad_fn(ans, terms, constant=0.2)(theta)
    for seg in (None, 7):
        vg = adjoint_value_and_grad_fn(ans, terms, constant=0.2,
                                       segment_size=seg, mesh=_mesh8())
        e1, g1 = vg(theta)
        assert abs(float(e0) - float(e1)) < 1e-5, (seg, float(e0), float(e1))
        assert np.allclose(np.asarray(g0), np.asarray(g1), atol=1e-4), seg


def test_mesh_vqe_minimize_matches_single_device():
    """A full sharded VQE optimization (one SPMD scan program) tracks the
    unsharded energy history. (Thetas are NOT compared: float-ulp noise
    between the two compiled programs diverges chaotically over adam
    steps in a landscape with symmetric minima — the energies agree.)"""
    ans = hea_ansatz(4, 1)
    terms = [(0.6, "ZZII"), (0.4, "IZZI"), (-0.3, "XIIX")]
    theta0 = np.full(ans.num_params, 0.15, dtype=np.float32)
    t0, h0 = vqe_minimize(ans, terms, theta0, steps=30)
    t1, h1 = vqe_minimize(ans, terms, theta0, steps=30, mesh=_mesh8())
    assert np.allclose(np.asarray(h0), np.asarray(h1), atol=2e-4)
    e0 = float(energy_fn(ans, terms)(t0))
    e1 = float(energy_fn(ans, terms)(t1))
    assert abs(e0 - e1) < 5e-3


def test_generator_adjoint_step_every_builder():
    """The Pauli-generator gradient shortcut (_GEN: dU/dtheta = -i s G U)
    matches plain autodiff for EVERY one-parameter builder, including the
    controlled gates whose generator expands the P1 projector, plus u3 on
    the dense-JVP fallback."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn

    ops = (PGate("rx", (0,), (0,)), PGate("ry", (1,), (1,)),
           PGate("rz", (2,), (2,)), PGate("phase", (0,), (3,)),
           PGate("rzz", (0, 2), (4,), scale=2.0),
           PGate("rxx", (1, 2), (5,)), PGate("ryy", (0, 1), (6,)),
           PGate("cphase", (0, 1), (7,)), PGate("crz", (1, 2), (8,)),
           PGate("crx", (2, 0), (9,)), PGate("cry", (0, 2), (10,)),
           PGate("u3", (1,), (11, 12, 13)))
    ans = Ansatz(3, ops, 14)
    terms = [(0.8, "ZXI"), (-0.5, "IYZ"), (0.3, "ZZZ")]
    theta = jax.numpy.asarray(np.random.default_rng(17).uniform(
        -math.pi, math.pi, 14).astype(np.float32))
    e0, g0 = jax.jit(jax.value_and_grad(energy_fn(ans, terms)))(theta)
    e1, g1 = adjoint_value_and_grad_fn(ans, terms)(theta)
    assert abs(float(e0) - float(e1)) < 1e-5
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=2e-4), (
        np.asarray(g0), np.asarray(g1))


# -- Pallas adjoint engine (models/adjoint_engine.py) ---------------------------


def test_pallas_adjoint_qaoa_matches_xla():
    """The Pallas-kernel adjoint sweep (runtime-theta operands through
    the canonical-layout kernels) returns the same energy/grad as the
    traced-XLA sweep on a QAOA ansatz: H prims (1q fixed), rzz cost
    layers (traced diag), rx mixers (traced 1q)."""
    from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,
                                               qaoa_maxcut_ansatz)
    from qubism_tpu.models.adjoint_engine import supports

    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)] + [(0, 3), (1, 4)]
    ans = qaoa_maxcut_ansatz(n, edges, p_layers=2)
    assert supports(ans)
    terms = [(1.0, "".join("Z" if q in (i, j) else "I" for q in range(n)))
             for i, j in edges]
    theta = jax.numpy.asarray(np.random.default_rng(5).uniform(
        -math.pi, math.pi, ans.num_params).astype(np.float32))
    e0, g0 = adjoint_value_and_grad_fn(ans, terms, constant=0.25,
                                       engine="xla")(theta)
    vg = adjoint_value_and_grad_fn(ans, terms, constant=0.25,
                                   engine="pallas")
    assert vg._host_composed
    e1, g1 = vg(theta)
    assert abs(float(e0) - float(e1)) < 1e-4, (float(e0), float(e1))
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=5e-4), (
        np.asarray(g0), np.asarray(g1))


def test_pallas_adjoint_hea_and_chunking():
    """HEA (disjoint ry+rz runs + CNOT-ring dense prims) on the Pallas
    engine matches XLA for several units_per_chunk, including chunk
    boundaries inside a layer."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn
    from qubism_tpu.models.adjoint_engine import (
        pallas_adjoint_value_and_grad_fn, supports)

    ans = hea_ansatz(4, 2)
    assert supports(ans)
    terms = [(0.7, "ZZII"), (-0.4, "IXXI"), (0.3, "IIYZ"), (0.2, "XIIX")]
    theta = jax.numpy.asarray(np.random.default_rng(9).uniform(
        -math.pi, math.pi, ans.num_params).astype(np.float32))
    e0, g0 = adjoint_value_and_grad_fn(ans, terms, engine="xla")(theta)
    for upc in (1, 3, 100):
        e1, g1 = pallas_adjoint_value_and_grad_fn(
            ans, terms, units_per_chunk=upc)(theta)
        assert abs(float(e0) - float(e1)) < 1e-4, upc
        assert np.allclose(np.asarray(g0), np.asarray(g1), atol=5e-4), upc


def test_pallas_adjoint_wide_canon_flip_classes():
    """n=12 puts the canonical layout at C=2048 (R=2): X-generator flip
    bits then land in all three flip classes — row (pos >= 11), lane
    group (7..10), in-tile (0..6) — so the batched single-flip scan in
    _pair_pauli_values (row/grp/lo branches) and the diagonal-H head are
    all exercised against the XLA sweep. n=6 tests only see lo flips."""
    from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,
                                               maxcut_terms)
    from qubism_tpu.models.adjoint_engine import supports

    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    ans = qaoa_maxcut_ansatz(n, edges, p_layers=1)
    assert supports(ans)
    terms, const = maxcut_terms(n, edges)
    neg = [(-c, s) for c, s in terms]
    theta = jax.numpy.asarray(np.random.default_rng(11).uniform(
        -math.pi, math.pi, ans.num_params).astype(np.float32))
    e0, g0 = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                       engine="xla")(theta)
    vg = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                   engine="pallas")
    e1, g1 = vg(theta)
    assert abs(float(e0) - float(e1)) < 1e-4, (float(e0), float(e1))
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=5e-4), (
        np.asarray(g0), np.asarray(g1))


def test_pallas_adjoint_unsupported_falls_back():
    """Traced dense 2q gates (cry) have no Pallas lowering: supports()
    is False, engine='pallas' raises, engine='auto' silently uses the
    XLA sweep and still returns correct gradients."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn
    from qubism_tpu.models.adjoint_engine import supports

    ops = (PGate("ry", (0,), (0,)), PGate("cry", (0, 2), (1,)),
           PGate("rzz", (1, 2), (2,)))
    ans = Ansatz(3, ops, 3)
    assert not supports(ans)
    # u3 is 1q but multi-parameter (dense-JVP gradient only): no lowering
    assert not supports(Ansatz(2, (PGate("u3", (0,), (0, 1, 2)),), 3))
    with pytest.raises(ValueError, match="Pallas lowering"):
        adjoint_value_and_grad_fn(ans, [(1.0, "ZZI")], engine="pallas")(
            jax.numpy.zeros(3))
    terms = [(1.0, "ZZI"), (0.4, "XIY")]
    theta = jax.numpy.asarray(np.random.default_rng(3).uniform(
        -math.pi, math.pi, 3).astype(np.float32))
    e0, g0 = jax.jit(jax.value_and_grad(energy_fn(ans, terms)))(theta)
    e1, g1 = adjoint_value_and_grad_fn(ans, terms, engine="auto")(theta)
    assert abs(float(e0) - float(e1)) < 1e-5
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=2e-4)


def test_pallas_adjoint_mesh_unsupported_shapes_raise():
    """engine='pallas' with mesh routes to the mesh adjoint engine
    (models/adjoint_mesh.py); shapes it cannot lower raise with a
    pointer instead of silently running another engine."""
    from qubism_tpu.models.variational import adjoint_value_and_grad_fn

    # too few local qubits for 8 shards
    ans = hea_ansatz(3, 1)
    with pytest.raises(ValueError, match="shards need"):
        adjoint_value_and_grad_fn(ans, [(1.0, "ZZI")], mesh=_mesh8(),
                                  engine="pallas")
    # non-diagonal Hamiltonian head
    ans5 = qaoa_maxcut_ansatz(5, [(i, (i + 1) % 5) for i in range(5)], 1)
    with pytest.raises(ValueError, match="diagonal"):
        adjoint_value_and_grad_fn(ans5, [(1.0, "XIIII")], mesh=_mesh8(),
                                  engine="pallas")
    # dense fixed prim (CNOT ring) on a device-bit qubit
    ans_hea = hea_ansatz(5, 1)
    with pytest.raises(ValueError, match="device-bit"):
        adjoint_value_and_grad_fn(ans_hea, [(1.0, "ZZIII")], mesh=_mesh8(),
                                  engine="pallas")
