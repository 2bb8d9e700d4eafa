"""prims_qasm exporter + the variational <-> QASM/engine bridges
(bind / ansatz_qasm / sample_fn): every generated circuit is re-run
through the INTERPRETER and compared (up to a global phase) against the
compiled-engine or traced-ansatz state."""

import math
import os

import jax
import numpy as np

from qubism_tpu.core.gates import Prim
from qubism_tpu.models.circuits import (brickwork_prims, ghz_prims,
                                        prims_qasm, qaoa_prims, qft_prims,
                                        qpe_prims, ring_edges)
from qubism_tpu.models.variational import (ansatz_qasm, bind, hea_ansatz,
                                           qaoa_maxcut_ansatz, sample_fn,
                                           state_fn)
from qubism_tpu.ops.apply import complex_from_planes, zero_state
from qubism_tpu.ops.fusion import CompiledCircuit
from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.interpreter import run_program

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def interpret_qasm(src: str) -> np.ndarray:
    src = src.replace('include "qelib1.inc";',
                      f'include "{EXAMPLES}/qelib1.inc";')
    ps = run_program(parse_openqasm("<export-test>", src), seed=0)
    return np.asarray(ps.stvecs["q"].amps)


def engine_state(n, prims) -> np.ndarray:
    return complex_from_planes(CompiledCircuit(n, prims)(zero_state(n)))


def assert_same_up_to_phase(a, b, tol=1e-5):
    assert abs(np.linalg.norm(a) - 1) < tol
    assert abs(np.linalg.norm(b) - 1) < tol
    assert abs(abs(np.vdot(a, b)) - 1.0) < tol, abs(np.vdot(a, b))


def test_export_qft():
    n = 4
    prims = qft_prims(n)
    assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                            engine_state(n, prims))


def test_export_ghz():
    n = 5
    prims = ghz_prims(n)
    assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                            engine_state(n, prims))


def test_export_brickwork_random_u3s():
    n = 4
    prims = brickwork_prims(n, depth=3, seed=17)  # ZYZ on random SU(2)s + CZ
    assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                            engine_state(n, prims))


def test_export_qaoa_and_qpe():
    n = 4
    prims = qaoa_prims(n, ring_edges(n), [0.41, 0.9], [1.2, 0.3])
    assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                            engine_state(n, prims))
    prims = qpe_prims(3, phi=0.375)
    assert_same_up_to_phase(interpret_qasm(prims_qasm(4, prims)),
                            engine_state(4, prims))


def test_export_swap_and_controlled_blocks():
    """SWAP -> 3 cx; controlled-e^{ig}u3 blocks -> cu3 + u1-on-control."""
    n = 3
    swap = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                     [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex)
    c, s = math.cos(0.35), math.sin(0.35)
    cry = np.eye(4, dtype=complex)
    cry[2:, 2:] = [[c, -s], [s, c]]
    cphased = np.eye(4, dtype=complex)
    cphased[2:, 2:] = np.exp(0.3j) * np.array(
        [[math.cos(0.45), -1j * math.sin(0.45)],
         [-1j * math.sin(0.45), math.cos(0.45)]])
    h = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
    prims = [Prim(h, (0,)), Prim(h, (2,)), Prim(swap, (0, 1)),
             Prim(cry, (1, 2)), Prim(cphased, (2, 0))]
    assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                            engine_state(n, prims))


def test_export_rejects_generic_dense():
    from qubism_tpu.models.circuits import w_state_prims
    import pytest

    with pytest.raises(ValueError):
        prims_qasm(3, w_state_prims(3))  # middle-block rotation: no local form
    with pytest.raises(ValueError):
        prims_qasm(3, [Prim(np.ones(8, dtype=complex), (0, 1, 2), diag=True)])


def test_bind_matches_state_fn():
    ans = hea_ansatz(3, 2)
    rng = np.random.default_rng(4)
    theta = rng.uniform(-math.pi, math.pi,
                        size=ans.num_params).astype(np.float32)
    traced = complex_from_planes(state_fn(ans)(jax.numpy.asarray(theta)))
    bound = engine_state(3, bind(ans, theta))
    assert np.linalg.norm(traced - bound) < 1e-5


def test_ansatz_qasm_roundtrip():
    """An optimized variational circuit exported to QASM reproduces the
    traced state on the interpreter (up to global phase), for both ansatz
    families."""
    rng = np.random.default_rng(8)
    for ans in (hea_ansatz(3, 1),
                qaoa_maxcut_ansatz(4, ring_edges(4), 2)):
        theta = rng.uniform(-1.5, 1.5,
                            size=ans.num_params).astype(np.float32)
        traced = complex_from_planes(state_fn(ans)(jax.numpy.asarray(theta)))
        got = interpret_qasm(ansatz_qasm(ans, theta))
        assert_same_up_to_phase(got, traced)


def test_sample_fn_counts():
    from qubism_tpu.models.variational import Ansatz, PGate

    ans = Ansatz(2, (PGate("rx", (0,), (0,)), PGate("rx", (1,), (1,))), 2)
    sample = sample_fn(ans)
    counts = sample(np.array([math.pi, 0.0], dtype=np.float32), shots=256)
    assert counts == {"10": 256}  # rx(pi)|0> = -i|1> on qubit 0 only
    counts = sample(np.array([math.pi / 2, 0.0], dtype=np.float32),
                    shots=4096, key=jax.random.PRNGKey(7))
    assert set(counts) <= {"00", "10"} and sum(counts.values()) == 4096
    assert abs(counts.get("10", 0) / 4096 - 0.5) < 0.05


def test_export_fuzz_roundtrip():
    """Random streams over every exportable prim class round-trip through
    the interpreter (8 seeds x 12 gates)."""
    rng = np.random.default_rng(123)
    h = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    swap = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                     [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex)

    def rand_su2():
        m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        q, _ = np.linalg.qr(m)
        return q

    n = 4
    for seed in range(8):
        prims = []
        for _ in range(12):
            kind = rng.integers(0, 6)
            qs = rng.permutation(n)[:2]
            a, b = int(qs[0]), int(qs[1])
            if kind == 0:
                prims.append(Prim(rand_su2(), (a,)))
            elif kind == 1:
                prims.append(Prim(h, (a,)))
            elif kind == 2:
                prims.append(Prim(cnot, (a, b)))
            elif kind == 3:
                prims.append(Prim(swap, (a, b)))
            elif kind == 4:  # random 2q diagonal
                d = np.exp(1j * rng.uniform(-math.pi, math.pi, 4))
                prims.append(Prim(d, (a, b), diag=True))
            else:            # controlled random-phase su2 block
                m = np.eye(4, dtype=complex)
                m[2:, 2:] = np.exp(1j * rng.uniform(-math.pi, math.pi)) \
                    * rand_su2()
                prims.append(Prim(m, (a, b)))
        assert_same_up_to_phase(interpret_qasm(prims_qasm(n, prims)),
                                engine_state(n, prims))
