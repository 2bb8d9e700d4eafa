"""Native C++ tokenizer: must agree token-for-token with the Python lexer
(which is the semantics reference) and actually be fast."""

import os
import time

import pytest

from qubism_tpu.native import ensure_built, native_tokenize
from qubism_tpu.qasm.lexer import _tokenize_py

EXAMPLES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "examples"))

needs_native = pytest.mark.skipif(ensure_built() is None,
                                  reason="no C++ toolchain available")


def assert_same(text, file="<t>"):
    py = _tokenize_py(text, file)
    nat = native_tokenize(text, file)
    assert nat is not None
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.kind == b.kind, (a, b)
        if a.kind == "real":
            assert abs(a.value - b.value) < 1e-12
        else:
            assert a.value == b.value, (a, b)
        assert (a.pos.line, a.pos.col) == (b.pos.line, b.pos.col), (a, b)


@needs_native
@pytest.mark.parametrize("name", [
    "qelib1.inc", "teleportation.qasm", "fourier.qasm", "inverseQFT.qasm",
    "errorCorrection.qasm", "rippleCarryAdder.qasm", "grover.qasm",
    "wstate.qasm",
])
def test_native_matches_python_on_examples(name):
    with open(os.path.join(EXAMPLES, name)) as f:
        assert_same(f.read(), name)


@needs_native
def test_native_matches_on_generated_circuit():
    from qubism_tpu.models.circuits import brickwork_qasm

    text = brickwork_qasm(20, depth=50, seed=1)
    assert_same(text)


@needs_native
def test_native_edge_cases():
    assert_same('OPENQASM 2.0; // c\n/* block\n*/ qreg q[2]; U(1.5e-3,-0.25,pi) q[0]; '
                'measure q -> c; :dump; include "x/y.inc";')


@needs_native
def test_native_rejects_garbage_falls_back():
    # native returns None on bad chars; the public tokenize falls back to
    # Python which raises the proper diagnostic
    assert native_tokenize("qreg q[1]; !!!") is None


@needs_native
def test_native_is_fast():
    from qubism_tpu.models.circuits import brickwork_qasm

    # comment-heavy input isolates SCANNING speed (Python-side Tok
    # materialization costs the same for both paths and would otherwise
    # leave a margin thin enough for host-load noise to flip)
    text = (brickwork_qasm(24, depth=12, seed=0)
            + ("// " + "x" * 117 + "\n") * 20000)  # ~2.4 MB, few tokens

    def best_of(f, k=3):
        out, best = None, float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            out = f()
            best = min(best, time.perf_counter() - t0)
        return out, best

    native_tokenize(text)  # warm-up: may build the .so / fault in pages
    _tokenize_py(text)
    nat, t_native = best_of(lambda: native_tokenize(text))
    py, t_py = best_of(lambda: _tokenize_py(text))
    assert len(nat) == len(py)
    # scanning is ~40x faster natively; end-to-end includes Python Tok
    # materialization, so just require a real win even on a loaded host
    assert t_native < t_py


def test_native_big_integer_literals_exact():
    """Integer literals above 2^53 must not round-trip through a C double
    (and the source-span decode must work at any digit count)."""
    big = (1 << 60) + 1
    text = f"// pad\nqreg q[{big}];\n"
    nat = native_tokenize(text)
    assert nat is not None
    vals = [t.value for t in nat if t.kind == "nat"]
    assert vals == [big]
    py = _tokenize_py(text)
    assert [t.value for t in py if t.kind == "nat"] == [big]
