"""Circuit-family builders beyond the reference examples: Grover, W state,
and the Pauli-expectation API (engine extensions; no reference analogue)."""

import math

import numpy as np
import pytest

from qubism_tpu.models.circuits import (
    ghz_prims,
    grover_prims,
    grover_qasm,
    w_state_prims,
    w_state_qasm,
)
from qubism_tpu.ops.fusion import CompiledCircuit


def final_amplitudes(prims, n):
    c = CompiledCircuit(n, prims)
    return c.state_to_complex(c(c.init_state()))


@pytest.mark.parametrize("n,marked", [(3, 5), (4, 9), (6, 42)])
def test_grover_prims_amplifies_marked(n, marked):
    amps = final_amplitudes(grover_prims(n, marked), n)
    p = np.abs(amps) ** 2
    assert p[marked] == p.max()
    assert p[marked] > 0.5, (n, marked, p[marked])
    assert abs(p.sum() - 1.0) < 1e-5


@pytest.mark.parametrize("n,marked", [(3, 5), (4, 9)])
def test_grover_qasm_matches_prims(n, marked):
    """The gate-model QASM circuit (ccx-cascade oracle with ancillas) agrees
    with the whole-register-diagonal engine circuit on the q register."""
    import os

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    src = grover_qasm(n, marked, measure=False)
    here = os.path.join(os.path.dirname(__file__), "..", "examples")
    path = os.path.join(here, "_grover_tmp.qasm")
    ast = parse_openqasm(path, src)
    ps = run_program(ast, seed=0)
    view = ps.qregs["q"]
    amps = np.asarray(ps.stvecs[view.target].amps)
    # q occupies the most significant bits of the (possibly fused) statevec;
    # the ancillas are uncomputed back to |0>
    assert view.start == 0
    probs = np.abs(amps.reshape(1 << n, -1)[:, 0]) ** 2
    expected = np.abs(final_amplitudes(grover_prims(n, marked), n)) ** 2
    assert np.linalg.norm(probs - expected) < 1e-5, (n, marked)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_w_state_prims(n):
    amps = final_amplitudes(w_state_prims(n), n)
    expected = np.zeros(1 << n, dtype=complex)
    for q in range(n):
        expected[1 << (n - 1 - q)] = 1 / math.sqrt(n)
    assert np.linalg.norm(amps - expected) < 1e-6, n


def test_w_state_qasm_matches_prims(n=5):
    import os

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    src = w_state_qasm(n, measure=False)
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "_w_tmp.qasm")
    ast = parse_openqasm(path, src)
    ps = run_program(ast, seed=0)
    amps = np.asarray(ps.stvecs[ps.qregs["q"].target].amps)
    expected = final_amplitudes(w_state_prims(n), n)
    assert np.linalg.norm(np.abs(amps) - np.abs(expected)) < 1e-5


# -- Pauli expectation values ---------------------------------------------------


def dense_pauli(pauli: str) -> np.ndarray:
    mats = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
            "Y": np.array([[0, -1j], [1j, 0]]),
            "Z": np.array([[1, 0], [0, -1]])}
    out = np.array([[1.0]], dtype=complex)
    for c in pauli:
        out = np.kron(out, mats[c])
    return out


@pytest.mark.parametrize("pauli", [
    "ZII", "IXI", "IIY", "XYZ", "YYX", "ZZZ", "III", "XXI",
])
def test_expectation_pauli_vs_dense(pauli):
    from qubism_tpu.core.statevec import StateVec
    from qubism_tpu.ops.apply import planes_from_complex

    n = len(pauli)
    rng = np.random.default_rng(hash(pauli) % 2**31)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    sv = StateVec(n, planes_from_complex(v))
    got = sv.expectation(pauli)
    expected = float(np.real(v.conj() @ dense_pauli(pauli) @ v))
    assert abs(got - expected) < 1e-5, pauli


def test_expectation_ghz_correlators(n=10):
    """GHZ: <Z_i Z_j> = 1, <Z_i> = 0, <X...X> = 1."""
    from qubism_tpu.core.statevec import StateVec

    c = CompiledCircuit(n, ghz_prims(n))
    from qubism_tpu.ops.apply import planes_from_complex

    sv = StateVec(n, planes_from_complex(c.state_to_complex(c(c.init_state()))))
    zz = "ZZ" + "I" * (n - 2)
    assert abs(sv.expectation(zz) - 1.0) < 1e-5
    assert abs(sv.expectation("Z" + "I" * (n - 1))) < 1e-5
    assert abs(sv.expectation("X" * n) - 1.0) < 1e-5


def test_session_expectation():
    import qubism_tpu as qt

    s = qt.Session(qt.mk_state_vec(2), seed=0)
    s.gate(qt.on_just(0, qt.hadamard(), 2))
    s.gate(qt.cnot(0, 1, 2))
    assert abs(s.expectation("ZZ") - 1.0) < 1e-5
    assert abs(s.expectation("XX") - 1.0) < 1e-5


def test_example_files_run():
    """The bundled grover/wstate examples evaluate through the CLI path."""
    import os

    from qubism_tpu.cli import eval_file

    ex = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                      "examples"))
    assert eval_file(os.path.join(ex, "grover.qasm"), seed=1) == 0
    assert eval_file(os.path.join(ex, "wstate.qasm"), seed=1) == 0


@pytest.mark.parametrize("pauli", ["ZIIIIII", "XIIIIII", "YXIIIIZ", "XYIIIII",
                                   "IIIXYZI", "ZZIIIII"])
def test_expectation_virtual_shards_vs_dense(pauli):
    """Pauli expectation over the virtual-shard representation (the n>29
    single-chip layout): shard pairing on virtual X/Y bits + scalar signs."""
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops.measure import expectation_pauli_virtual

    n, v = 7, 2
    prims = brickwork_prims(n, depth=2, seed=9)
    circ = CompiledCircuit(n, prims, virtual_shards=v)
    shards = circ(circ.init_state())
    val = expectation_pauli_virtual(shards, n, v, pauli)
    vec = circ.state_to_complex(shards)
    expected = float(np.real(vec.conj() @ dense_pauli(pauli) @ vec))
    assert abs(val - expected) < 1e-5, pauli


# -- QAOA ----------------------------------------------------------------------


def test_qaoa_energy_improves_over_random(n=8):
    """One QAOA layer at textbook ring-MaxCut angles must beat the uniform
    state's expected cut (n/2 edges cut on average for the ring)."""
    from qubism_tpu.models.circuits import (qaoa_maxcut_energy, qaoa_prims,
                                            ring_edges)

    edges = ring_edges(n)
    # p=1 optimum for the ring under the e^{-i gamma ZZ} convention:
    # gamma = pi/8, beta = 3 pi/8 (achieves the known 3/4 cut fraction)
    circ = CompiledCircuit(n, qaoa_prims(n, edges,
                                         [math.pi / 8], [3 * math.pi / 8]))
    state = circ(circ.init_state())
    energy = qaoa_maxcut_energy(state, n, edges)
    uniform = len(edges) / 2.0
    assert energy > uniform + 0.5, (energy, uniform)
    # known closed form: p=1 ring MaxCut achieves 3/4 of the edges
    assert abs(energy - 0.75 * len(edges)) < 1e-3, energy


def test_qaoa_qasm_matches_prims(n=6):
    import os

    from qubism_tpu.models.circuits import qaoa_prims, qaoa_qasm, ring_edges
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    edges = ring_edges(n)
    gammas, betas = [0.7], [0.3]
    src = qaoa_qasm(n, edges, gammas, betas, measure=False)
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "_qaoa_tmp.qasm")
    ast = parse_openqasm(path, src)
    ps = run_program(ast, seed=0)
    amps = np.asarray(ps.stvecs[ps.qregs["q"].target].amps)
    expected = final_amplitudes(qaoa_prims(n, edges, gammas, betas), n)
    # rz-based cost differs from e^{-i g ZZ} by a global phase only
    overlap = abs(np.vdot(amps, expected))
    assert abs(overlap - 1.0) < 1e-5, overlap


def test_qaoa_fuses_well(n=16):
    """Each QAOA layer = 1 diagonal pass + few 1q-layer passes."""
    from qubism_tpu.models.circuits import qaoa_prims, ring_edges

    p = 3
    circ = CompiledCircuit(
        n, qaoa_prims(n, ring_edges(n), [0.1] * p, [0.2] * p),
        use_pallas=True)
    st = circ.stats()
    assert st["diag_layers"] <= p + 1
    assert st["fused_ops"] <= p * 6 + 4, st


def test_qaoa_energy_on_virtual_shards(n=8):
    """qaoa_maxcut_energy must accept the virtual-sharded state tuple the
    n>29 CompiledCircuit returns."""
    from qubism_tpu.models.circuits import (qaoa_maxcut_energy, qaoa_prims,
                                            ring_edges)

    edges = ring_edges(n)
    gb = ([math.pi / 8], [3 * math.pi / 8])
    flat = CompiledCircuit(n, qaoa_prims(n, edges, *gb), virtual_shards=0)
    e_flat = qaoa_maxcut_energy(flat(flat.init_state()), n, edges)
    shard = CompiledCircuit(n, qaoa_prims(n, edges, *gb), virtual_shards=2)
    e_shard = qaoa_maxcut_energy(shard(shard.init_state()), n, edges)
    assert abs(e_flat - e_shard) < 1e-5
    assert abs(e_flat - 0.75 * len(edges)) < 1e-3


# -- quantum phase estimation --------------------------------------------------


@pytest.mark.parametrize("t,phi", [(6, 0.171875), (8, 0.359375), (5, 0.5)])
def test_qpe_recovers_exact_phase(t, phi):
    """phi representable in t bits => the counting register reads
    round(phi * 2^t) with probability ~1."""
    from qubism_tpu.models.circuits import qpe_prims

    n = t + 1
    amps = final_amplitudes(qpe_prims(t, phi), n)
    probs = (np.abs(amps) ** 2).reshape(1 << t, 2)[:, 1]  # eigenqubit = |1>
    k = int(round(phi * (1 << t)))
    assert probs[k] > 0.99, (t, phi, probs[k])


def test_qpe_inexact_phase_concentrates(t=7):
    from qubism_tpu.models.circuits import qpe_prims

    phi = 0.3  # not representable in 7 bits
    amps = final_amplitudes(qpe_prims(t, phi), t + 1)
    probs = (np.abs(amps) ** 2).reshape(1 << t, 2)[:, 1]
    best = int(np.argmax(probs))
    assert abs(best / (1 << t) - phi) < 1 / (1 << t)
    assert probs[best] > 0.4  # 4/pi^2 lower bound


def test_qpe_qasm_matches_prims(t=5):
    import os

    from qubism_tpu.models.circuits import qpe_prims, qpe_qasm
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    phi = 0.40625
    src = qpe_qasm(t, phi, measure=False)
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "_qpe_tmp.qasm")
    ast = parse_openqasm(path, src)
    ps = run_program(ast, seed=0)
    amps = np.asarray(ps.stvecs[ps.qregs["q"].target].amps)
    expected = final_amplitudes(qpe_prims(t, phi), t + 1)
    assert np.linalg.norm(np.abs(amps) - np.abs(expected)) < 1e-5


def test_expectation_pauli_sum_matches_per_string():
    """A Pauli-sum Hamiltonian in one dispatch must equal the per-string
    expectation loop (and the dense oracle)."""
    import numpy as np

    from qubism_tpu.core.statevec import StateVec
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.ops.measure import expectation_pauli, expectation_pauli_sum

    n = 6
    circ = CompiledCircuit(n, brickwork_prims(n, depth=2, seed=3))
    planes = circ(circ.init_state())
    terms = [(0.5, "ZZIIII"), (-1.25, "IXYIII"), (2.0, "IIIIXZ"),
             (0.75, "YIIIIY")]
    ref = sum(c * expectation_pauli(planes, n, p) for c, p in terms)
    got = expectation_pauli_sum(planes, n, terms)
    assert abs(got - ref) < 1e-5
    sv = StateVec(n, planes)
    assert abs(sv.expectation_sum(terms) - ref) < 1e-5


def test_expectation_pauli_sum_virtual_matches():
    """The virtual-sharded Pauli-sum (grouped by partner mask, one jit per
    shard per group) must equal the per-string virtual loop."""
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.ops.measure import (expectation_pauli_sum_virtual,
                                        expectation_pauli_virtual)

    n, v = 7, 2
    circ = CompiledCircuit(n, brickwork_prims(n, depth=2, seed=8),
                           virtual_shards=v)
    shards = circ(circ.init_state())
    terms = [(0.5, "ZZIIIII"), (-1.25, "XIYIIII"), (2.0, "IIIIXZI"),
             (0.75, "YZIIIIY"), (0.3, "IZIIIII")]
    ref = sum(c * expectation_pauli_virtual(shards, n, v, p)
              for c, p in terms)
    got = expectation_pauli_sum_virtual(shards, n, v, terms)
    assert abs(got - ref) < 1e-5


def test_expectation_pauli_sum_random_fuzz():
    """Random Pauli sums on random states vs the dense-matrix oracle:
    exercises every flip-group shape (diag, row/group/lane flips, shared
    and distinct masks, repeated strings) through the blocked reduction."""
    import jax.numpy as jnp

    from qubism_tpu.ops.measure import expectation_pauli_sum

    rng = np.random.default_rng(17)
    n = 9
    for trial in range(6):
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v /= np.linalg.norm(v)
        from qubism_tpu.ops.apply import planes_from_complex

        re, im = planes_from_complex(v)
        planes = (jnp.asarray(re), jnp.asarray(im))
        k = int(rng.integers(1, 24))
        terms = []
        for _ in range(k):
            p = "".join(rng.choice(list("IXYZ"), p=[0.55, 0.15, 0.15, 0.15])
                        for _ in range(n))
            terms.append((float(rng.normal()), p))
        ref = sum(c * float(np.real(v.conj() @ dense_pauli(p) @ v))
                  for c, p in terms)
        got = expectation_pauli_sum(planes, n, terms)
        assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (trial, ref, got)


def test_expectation_pauli_sum_blocked_multistep(monkeypatch):
    """The blocked MXU reduction with steps > 1 (forced via a 1-row block)
    must match the per-string loop — covers the scan carry across row
    blocks for diagonal AND flip groups."""
    from qubism_tpu.models.circuits import brickwork_prims
    from qubism_tpu.ops import measure as M
    from qubism_tpu.ops.fusion import CompiledCircuit

    monkeypatch.setattr(M, "_EXP_BLK_ROWS", 1)
    n = 13  # R = 4 rows at C=2048 -> 4 scan steps
    circ = CompiledCircuit(n, brickwork_prims(n, depth=2, seed=5))
    planes = circ(circ.init_state())
    terms = [(0.5, "Z" * n), (1.5, "ZI" * 6 + "Z"), (-0.25, "X" + "I" * (n - 1)),
             (0.8, "IY" + "I" * (n - 3) + "X"), (0.1, "I" * n)]
    ref = sum(c * M.expectation_pauli(planes, n, p) for c, p in terms)
    got = M.expectation_pauli_sum(planes, n, terms)
    assert abs(got - ref) < 1e-5
