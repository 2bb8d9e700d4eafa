"""Fusion correctness: the compiled (fused, single-XLA-program) executor must
agree with the per-gate interpreter engine to 1e-6 on random circuits and on
the benchmark families."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from qubism_tpu.core.gates import Prim, u3_matrix
from qubism_tpu.models.circuits import brickwork_prims, ghz_prims, qft_prims, qft_qasm
from qubism_tpu.ops.apply import (
    apply_diag,
    apply_gate,
    complex_from_planar,
    zero_state,
)
from qubism_tpu.ops.fusion import CompiledCircuit, DenseOp, DiagLayer, fuse


def reference_apply(prims, n):
    """Per-gate engine path (the semantics reference)."""
    st = zero_state(n)
    for p in prims:
        if p.diag:
            st = apply_diag(st, p.u, p.targets, n)
        else:
            st = apply_gate(st, p.u, p.targets, n)
    return complex_from_planar(st)


def random_prims(n, count, seed):
    rng = np.random.default_rng(seed)
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    prims = []
    for _ in range(count):
        kind = rng.integers(0, 3)
        if kind == 0:
            th, ph, lm = rng.uniform(0, 2 * math.pi, 3)
            prims.append(Prim(u3_matrix(th, ph, lm, reference_bug=False),
                              (int(rng.integers(0, n)),)))
        elif kind == 1:
            q = rng.permutation(n)[:2]
            prims.append(Prim(cnot, (int(q[0]), int(q[1]))))
        else:
            q = rng.permutation(n)[:2]
            lam = rng.uniform(0, 2 * math.pi)
            d = np.array([1, 1, 1, np.exp(1j * lam)], dtype=complex)
            prims.append(Prim(d, (int(q[0]), int(q[1])), diag=True))
    return prims


@pytest.mark.parametrize("seed", range(5))
def test_compiled_matches_reference_random(seed):
    n = 6
    prims = random_prims(n, 40, seed)
    expected = reference_apply(prims, n)
    got = complex_from_planar(CompiledCircuit(n, prims)(zero_state(n)))
    assert np.linalg.norm(got - expected) < 1e-5


def test_compiled_matches_unoptimized():
    n = 5
    prims = random_prims(n, 30, 99)
    a = complex_from_planar(CompiledCircuit(n, prims, optimize=True)(zero_state(n)))
    b = complex_from_planar(CompiledCircuit(n, prims, optimize=False)(zero_state(n)))
    assert np.linalg.norm(a - b) < 1e-5


def test_qft_amplitudes_analytic():
    """QFT|0> = uniform superposition; QFT|x> amplitudes are the DFT phases
    with output bit order reversed (standard circuit convention)."""
    n = 5
    circ = CompiledCircuit(n, qft_prims(n))
    got = complex_from_planar(circ(zero_state(n)))
    assert np.allclose(got, np.full(1 << n, 1 / math.sqrt(1 << n)), atol=1e-6)


def test_qft_nonzero_input_vs_dft():
    n = 4
    x = 0b1010
    st = np.zeros(1 << n, dtype=complex)
    st[x] = 1
    from qubism_tpu.ops.apply import planar_from_complex

    got = complex_from_planar(CompiledCircuit(n, qft_prims(n))(jnp.asarray(planar_from_complex(st))))
    # circuit QFT leaves the result bit-reversed: amp[k] = w^{x * rev(k)} / sqrt(N)
    N = 1 << n
    rev = lambda k: int(format(k, f"0{n}b")[::-1], 2)  # noqa: E731
    expected = np.array([np.exp(2j * math.pi * x * rev(k) / N) for k in range(N)]) / math.sqrt(N)
    assert np.linalg.norm(got - expected) < 1e-5


def test_ghz_state():
    n = 8
    got = complex_from_planar(CompiledCircuit(n, ghz_prims(n))(zero_state(n)))
    expected = np.zeros(1 << n, dtype=complex)
    expected[0] = expected[-1] = 1 / math.sqrt(2)
    assert np.linalg.norm(got - expected) < 1e-6


def test_brickwork_matches_reference():
    n = 6
    prims = brickwork_prims(n, depth=4, seed=3)
    expected = reference_apply(prims, n)
    got = complex_from_planar(CompiledCircuit(n, prims)(zero_state(n)))
    assert np.linalg.norm(got - expected) < 1e-5


def test_fusion_reduces_passes():
    from qubism_tpu.ops.fusion import StageBlockOp

    n = 12
    prims = qft_prims(n)  # n H's + n(n-1)/2 cu1's = 78 prims
    ops = fuse(prims, n)
    # row stages fuse into multi-stage blocks; lane tail becomes blocks/layers
    assert len(ops) <= 2 * n
    assert any(isinstance(o, (DiagLayer, StageBlockOp)) for o in ops)
    # brickwork: all CZs of a layer collapse into diagonal layers
    bops = fuse(brickwork_prims(10, 4, 0), 10)
    assert len(bops) < len(brickwork_prims(10, 4, 0)) / 2


def test_fusion_dense_block_content():
    """Two overlapping cnots fuse into one 3-qubit block equal to the
    matrix product."""
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
    prims = [Prim(cnot, (0, 1)), Prim(cnot, (1, 2))]
    ops = fuse(prims, 3)
    assert len(ops) == 1 and isinstance(ops[0], DenseOp)
    assert ops[0].targets == (0, 1, 2)
    # verify against dense embedding
    from tests.test_interpreter import embed

    expected = embed(cnot, (1, 2), 3) @ embed(cnot, (0, 1), 3)
    assert np.allclose(ops[0].u, expected, atol=1e-12)


def test_qft_qasm_matches_prims():
    """The QASM emission and the prim builder must describe the same circuit."""
    import os

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    n = 4
    here = os.path.dirname(__file__)
    text = qft_qasm(n, measure=False)
    # rewrite the include to an absolute path for the test cwd
    text = text.replace('include "qelib1.inc";',
                        f'include "{os.path.join(here, "..", "examples", "qelib1.inc")}";')
    ps = run_program(parse_openqasm("<qft>", text), seed=0)
    got = ps.stvecs["q"].amps
    expected = complex_from_planar(CompiledCircuit(n, qft_prims(n))(zero_state(n)))
    assert np.linalg.norm(got - expected) < 1e-5
