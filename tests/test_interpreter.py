"""End-to-end interpreter tests: the bundled examples as golden tests
(SURVEY.md §4 — the reference ran these by hand; here they are CI).

An independent O(4^n) dense numpy oracle (deliberately built like the
*reference's* engine — kron-embedded matrices and GEMV) cross-checks
amplitudes for measurement-free circuits."""

import math
import os

import numpy as np
import pytest

from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.interpreter import Interpreter, run_program, run_program_incremental
from qubism_tpu.run.progstate import QasmRuntimeError, blank_state

EXAMPLES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "examples"))


def run_file(name, seed=0):
    path = os.path.join(EXAMPLES, name)
    with open(path) as f:
        ast = parse_openqasm(path, f.read())
    return run_program(ast, seed=seed)


def run_src(src, seed=0, with_qelib=False):
    if with_qelib:
        src = f'include "{EXAMPLES}/qelib1.inc";\n' + src
    ast = parse_openqasm("<test>", src)
    return run_program(ast, seed=seed)


# -- independent dense oracle ---------------------------------------------------

def embed(u, targets, n):
    """Dense 2^n x 2^n embedding of a gate on given (big-endian) targets."""
    k = len(targets)
    full = np.zeros((1 << n, 1 << n), dtype=complex)
    for col in range(1 << n):
        bits = [(col >> (n - 1 - q)) & 1 for q in range(n)]
        gin = 0
        for t in targets:
            gin = (gin << 1) | bits[t]
        for gout in range(1 << k):
            amp = u[gout, gin]
            if amp == 0:
                continue
            nb = list(bits)
            for j, t in enumerate(targets):
                nb[t] = (gout >> (k - 1 - j)) & 1
            row = 0
            for b in nb:
                row = (row << 1) | b
            full[row, col] += amp
    return full


H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
CNOT = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)


def cu1(lam):
    return np.diag([1, 1, 1, np.exp(1j * lam)]).astype(complex)


# -- deterministic examples ------------------------------------------------------

def test_error_correction_deterministic():
    """Bit-flip on q[0] must be detected (syn=1) and corrected (c=000)."""
    for seed in range(4):
        ps = run_file("errorCorrection.qasm", seed=seed)
        assert str(ps.cregs["c"]) == "000"
        assert str(ps.cregs["syn"]) == "10"
        assert ps.cregs["syn"].to_natural() == 1


def test_ripple_carry_adder():
    """1 + 15 = 16: b -> 0000, cout -> 1, ans = 00001 (LSB-first value 16)."""
    ps = run_file("rippleCarryAdder.qasm", seed=1)
    assert str(ps.cregs["ans"]) == "00001"
    assert ps.cregs["ans"].to_natural() == 16


def test_ripple_carry_adder_other_operands():
    """Widened operand check: 5 + 6 = 11 on the same Cuccaro circuit."""
    src = """
    gate majority a,b,c { cx c,b; cx c,a; ccx a,b,c; }
    gate unmaj a,b,c { ccx a,b,c; cx c,a; cx a,b; }
    qreg cin[1]; qreg a[4]; qreg b[4]; qreg cout[1]; creg ans[5];
    x a[0]; x a[2];        // a = 5
    x b[1]; x b[2];        // b = 6
    majority cin[0],b[0],a[0];
    majority a[0],b[1],a[1];
    majority a[1],b[2],a[2];
    majority a[2],b[3],a[3];
    cx a[3],cout[0];
    unmaj a[2],b[3],a[3];
    unmaj a[1],b[2],a[2];
    unmaj a[0],b[1],a[1];
    unmaj cin[0],b[0],a[0];
    measure b[0] -> ans[0]; measure b[1] -> ans[1];
    measure b[2] -> ans[2]; measure b[3] -> ans[3];
    measure cout[0] -> ans[4];
    """
    ps = run_src(src, with_qelib=True)
    assert ps.cregs["ans"].to_natural() == 11


def test_teleportation_deterministic_input():
    """Teleporting |1> must always measure c2 = 1."""
    src = """
    qreg q[3]; creg c0[1]; creg c1[1]; creg c2[1];
    x q[0];
    h q[1]; cx q[1],q[2];
    cx q[0],q[1]; h q[0];
    measure q[0] -> c0[0];
    measure q[1] -> c1[0];
    if(c0==1) z q[2];
    if(c1==1) x q[2];
    measure q[2] -> c2[0];
    """
    for seed in range(8):
        ps = run_src(src, seed=seed, with_qelib=True)
        assert str(ps.cregs["c2"]) == "1"


def test_teleportation_file_runs():
    ps = run_file("teleportation.qasm", seed=3)
    assert set(ps.cregs) == {"c0", "c1", "c2"}
    assert all(ps.cregs[c].size == 1 for c in ps.cregs)


def test_teleportation_statistics():
    """c2 must follow the input state's Born distribution:
    p(1) = sin^2(0.15) ≈ 0.0223 for u3(0.3,0.2,0.1)|0>."""
    ones = sum(
        int(str(run_file("teleportation.qasm", seed=s).cregs["c2"]))
        for s in range(300)
    )
    p = ones / 300
    assert abs(p - math.sin(0.15) ** 2) < 0.035


def test_fourier_amplitudes_vs_dense_oracle():
    """QFT circuit amplitudes (before measurement) vs an independent dense
    numpy simulation of the same gate sequence."""
    src = """
    qreg q[4];
    x q[0]; x q[2];
    h q[0];
    cu1(pi/2) q[1],q[0];
    h q[1];
    cu1(pi/4) q[2],q[0];
    cu1(pi/2) q[2],q[1];
    h q[2];
    cu1(pi/8) q[3],q[0];
    cu1(pi/4) q[3],q[1];
    cu1(pi/2) q[3],q[2];
    h q[3];
    """
    ps = run_src(src, with_qelib=True)
    got = np.asarray(ps.stvecs["q"].amps)

    n = 4
    v = np.zeros(16, dtype=complex)
    v[0] = 1
    seq = [
        (X, (0,)), (X, (2,)),
        (H, (0,)), (cu1(math.pi / 2), (1, 0)),
        (H, (1,)), (cu1(math.pi / 4), (2, 0)), (cu1(math.pi / 2), (2, 1)),
        (H, (2,)), (cu1(math.pi / 8), (3, 0)), (cu1(math.pi / 4), (3, 1)),
        (cu1(math.pi / 2), (3, 2)), (H, (3,)),
    ]
    for u, t in seq:
        v = embed(u, t, n) @ v
    assert np.allclose(got, v, atol=1e-6)


def test_inverse_qft_reproducible():
    ps1 = run_file("inverseQFT.qasm", seed=11)
    ps2 = run_file("inverseQFT.qasm", seed=11)
    assert str(ps1.cregs["c"]) == str(ps2.cregs["c"])
    assert ps1.cregs["c"].size == 4


def test_fourier_file_runs():
    ps = run_file("fourier.qasm", seed=5)
    assert ps.cregs["c"].size == 4


# -- register fusion ---------------------------------------------------------------

def test_lazy_register_fusion():
    ps = run_src("qreg a[1]; qreg b[2]; CX a[0],b[1];")
    assert set(ps.stvecs) == {"a(x)b"}
    assert ps.qregs["a"].target == "a(x)b" and ps.qregs["a"].start == 0
    assert ps.qregs["b"].target == "a(x)b" and ps.qregs["b"].start == 1
    assert ps.stvecs["a(x)b"].n == 3


def test_unfused_registers_stay_independent():
    ps = run_src("qreg a[2]; qreg b[2]; U(pi,0,pi) a[0];", with_qelib=False)
    assert set(ps.stvecs) == {"a", "b"}
    assert ps.stvecs["a"].n == 2 and ps.stvecs["b"].n == 2


def test_single_qubit_gate_after_fusion_not_lost():
    """The reference orphans this update (Simulation.hs:100 writes under the
    QReg name); we must apply it to the fused backing state.
    Circuit: fuse a,b via CX; then X on b[0]; measure b[0] must give 1."""
    src = """
    qreg a[1]; qreg b[1]; creg m[1];
    CX a[0],b[0];
    U(pi,0,pi) b[0];
    measure b[0] -> m[0];
    """
    for seed in range(4):
        ps = run_src(src, seed=seed)
        assert str(ps.cregs["m"]) == "1"


def test_fusion_entangles_correctly():
    """Bell pair across two registers: measurements must correlate."""
    src = """
    qreg a[1]; qreg b[1]; creg ca[1]; creg cb[1];
    U(pi/2,0,pi) a[0];
    CX a[0],b[0];
    measure a[0] -> ca[0];
    measure b[0] -> cb[0];
    """
    seen = set()
    for seed in range(16):
        ps = run_src(src, seed=seed)
        pair = (str(ps.cregs["ca"]), str(ps.cregs["cb"]))
        assert pair[0] == pair[1]
        seen.add(pair)
    assert len(seen) == 2  # both 00 and 11 occur


# -- semantics details ----------------------------------------------------------------

def test_reset_projects_to_zero():
    ps = run_src("qreg q[2]; creg c[2]; U(pi,0,pi) q[0]; reset q; measure q -> c;")
    assert str(ps.cregs["c"]) == "00"


def test_reset_fused_register_resets_all_bits():
    """Reference bug: reset of a register whose view is shifted after fusion
    folds over the wrong range (Simulation.hs:152-155). We reset all bits."""
    src = """
    qreg a[1]; qreg b[2]; creg c[2];
    CX a[0],b[0];
    U(pi,0,pi) b[0]; U(pi,0,pi) b[1];
    reset b;
    measure b -> c;
    """
    ps = run_src(src)
    assert str(ps.cregs["c"]) == "00"


def test_cx_broadcasting():
    # reg-reg of equal size
    ps = run_src("qreg a[2]; qreg b[2]; creg c[2]; U(pi,0,pi) a[0]; U(pi,0,pi) a[1];"
                 "CX a,b; measure b -> c;")
    assert str(ps.cregs["c"]) == "11"
    # bit-reg
    ps = run_src("qreg a[1]; qreg b[2]; creg c[2]; U(pi,0,pi) a[0];"
                 "CX a[0],b; measure b -> c;")
    assert str(ps.cregs["c"]) == "11"
    # reg-bit
    ps = run_src("qreg a[2]; qreg b[1]; creg c[1]; U(pi,0,pi) a[0];"
                 "CX a,b[0]; measure b -> c;")
    assert str(ps.cregs["c"]) == "1"  # flipped once by a[0], not by a[1]


def test_cx_size_mismatch_is_runtime_error():
    with pytest.raises(QasmRuntimeError, match="different sizes"):
        run_src("qreg a[2]; qreg b[3]; CX a,b;")


def test_cond_lsb_first():
    """if(c==2) means bit pattern 01 (LSB-first): c[1]=1."""
    src = """
    qreg q[2]; creg c[2]; creg out[1];
    U(pi,0,pi) q[1];
    measure q -> c;          // c = 01 -> value 2
    if(c==2) U(pi,0,pi) q[0];
    measure q[0] -> out[0];
    """
    ps = run_src(src)
    assert ps.cregs["c"].to_natural() == 2
    assert str(ps.cregs["out"]) == "1"


def test_measure_whole_register_into_mismatched_creg_errors():
    with pytest.raises(QasmRuntimeError, match="Mismatched size"):
        run_src("qreg q[2]; creg c[3]; measure q -> c;")


def test_measure_bit_out_of_bounds():
    with pytest.raises(QasmRuntimeError, match="out of bounds"):
        run_src("qreg q[2]; creg c[2]; measure q[0] -> c[5];")


def test_user_gate_param_binding():
    ps = run_src("gate flip(t) a { U(t,0,pi) a; } qreg q[1]; creg c[1];"
                 "flip(pi) q[0]; measure q[0] -> c[0];")
    assert str(ps.cregs["c"]) == "1"


def test_user_gate_cannot_reference_globals():
    """A gate body referencing a global register parses (the name is known)
    but fails to bind at call time (Simulation.hs:203-207)."""
    with pytest.raises(QasmRuntimeError, match="Could not bind r"):
        run_src("qreg q[1]; qreg r[1]; gate g a { CX a,r; } g q;")


def test_nested_user_gates():
    """ccx is defined via h/t/cx — deep nesting through qelib1."""
    src = """
    qreg q[3]; creg c[1];
    x q[0]; x q[1];
    ccx q[0],q[1],q[2];
    measure q[2] -> c[0];
    """
    ps = run_src(src, with_qelib=True)
    assert str(ps.cregs["c"]) == "1"


def test_runtime_error_carries_line_info():
    try:
        run_src("qreg a[2];\nqreg b[3];\nCX a,b;")
    except QasmRuntimeError as e:
        assert "ERROR on line 3" in str(e)
    else:
        raise AssertionError("expected runtime error")


def test_incremental_run_atomic():
    ps = run_src("qreg q[1]; creg c[1];")
    ast = parse_openqasm("<t>", "qreg q2[2]; creg c2[3]; measure q2 -> c2;")
    before_sv = dict(ps.stvecs)
    with pytest.raises(QasmRuntimeError):
        run_program_incremental(ast, ps)
    assert dict(ps.stvecs) == before_sv  # failed line left state untouched
    assert "q2" not in ps.qregs


def test_dump_output():
    out = []
    ast = parse_openqasm("<t>", "qreg q[1]; creg c[1]; :dump;")
    interp = Interpreter(blank_state(0), dump_writer=out.append)
    for s in ast:
        interp.run_stmt(s)
    dump = "".join(out)
    assert "Dump of the internal state" in dump
    assert "State Vector q:" in dump
    assert 'QReg q[1] -- targets state vector "q" starting at qubit 0' in dump
    assert "CReg c[1] = 0" in dump


def test_barrier_noop():
    ps = run_src("qreg q[2]; barrier q; barrier q[0],q[1];")
    assert ps.stvecs["q"].n == 2


def test_reference_compat_mode_u1_global_phase():
    """With the compat quirks on, u1(pi) is identity-up-to-global-phase, so a
    fourier-style cu1 ladder does nothing (SURVEY.md §2.4.1)."""
    from qubism_tpu.config import config

    config.reference_u3_bug = True
    try:
        ps = run_src("qreg q[1]; creg c[1]; U(pi,0,pi) q[0];"  # x still works
                     "U(0,0,pi) q[0]; measure q[0] -> c[0];")
        # buggy u1(pi) = global phase; X flipped the qubit; measurement gives 1
        assert str(ps.cregs["c"]) == "1"
    finally:
        config.reference_u3_bug = False


def test_gate_operands_device_cached():
    """Repeated applications of the same gate shape reuse the SAME device
    operands (no per-op host->device upload — ADVICE/VERDICT item 8)."""
    import numpy as np

    from qubism_tpu.ops import apply as A

    u = np.array([[0, 1], [1, 0]], dtype=np.complex128)
    A._operand_cache.clear()
    planes = A.zero_state(6)
    A.apply_gate(planes, u, (2,), 6)
    assert len(A._operand_cache) == 1
    first = next(iter(A._operand_cache.values()))
    A.apply_gate(planes, u, (2,), 6)
    assert len(A._operand_cache) == 1
    assert next(iter(A._operand_cache.values()))[0] is first[0]
    # diagonals too
    d = np.array([1, 1, 1, -1], dtype=np.complex128)
    A.apply_diag(planes, d, (1, 3), 6)
    A.apply_diag(planes, d, (1, 3), 6)
    assert len(A._operand_cache) == 2


def test_interpreter_pallas_fast_path_matches_xla(monkeypatch):
    """VERDICT r2 item 7: with the Pallas engine forced on (as on TPU at
    n >= 14), the interpreter's per-statement path routes through the
    fused kernels (non-donating, canonical layout) and must produce the
    same state as the XLA path — including mid-circuit measurement and
    feed-forward afterwards."""
    import numpy as np

    from qubism_tpu.ops import apply as A
    from qubism_tpu.ops import fusion as F
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    src = """
    qreg q[14]; creg c[2];
    U(1.1, 0.3, 0.2) q[0];
    U(0.5, 0.0, 0.9) q[13];
    CX q[0], q[7];
    CX q[7], q[13];
    U(0, 0, 0.7) q[3];
    measure q[0] -> c[0];
    if (c == 1) U(3.141592653589793, 0, 3.141592653589793) q[1];
    """
    ast = parse_openqasm("<t>", src)
    ps_ref = run_program(ast, seed=5)
    monkeypatch.setattr(F, "engine_uses_pallas", lambda n: n >= 14)
    ps_fast = run_program(ast, seed=5)
    ref = np.asarray(ps_ref.stvecs["q"].amps)
    got = np.asarray(ps_fast.stvecs["q"].amps)
    assert str(ps_ref.cregs["c"]) == str(ps_fast.cregs["c"])
    assert np.linalg.norm(got - ref) < 1e-5
    # the fast path leaves the state in the canonical 2-D device layout
    assert ps_fast.stvecs["q"].planes[0].ndim == 2


def test_pallas_fast_path_does_not_donate_shared_buffers(monkeypatch):
    """The REPL's atomic-line contract: ProgState.copy() shares device
    buffers, so the interpreter's kernel path must NOT donate them — the
    old state's amplitudes stay readable after a gate is applied."""
    import numpy as np

    from qubism_tpu.core.statevec import StateVec
    from qubism_tpu.ops import apply as A
    from qubism_tpu.ops import fusion as F

    monkeypatch.setattr(F, "engine_uses_pallas", lambda n: n >= 14)
    sv = StateVec.zero(14)
    H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    out = A.apply_gate(sv.planes, H, (0,), 14)
    out2 = A.apply_diag(out, np.array([1, 1j]), (2,), 14)
    # the ORIGINAL planes must still be valid (no donation)
    assert abs(float(np.asarray(sv.amps)[0]) - 1.0) < 1e-6
    z = StateVec(14, out2).amps
    assert abs(abs(z[0]) - 1 / np.sqrt(2)) < 1e-6


def test_fuse_qregs_flip_layout_is_invisible(monkeypatch):
    """Tensoring big ⊗ tiny puts the tiny factor's qubits at the TOP of the
    backing vector (TPU padding safety) — invisible through the QReg
    views: amplitudes read out in register order must match the unflipped
    path exactly."""
    import numpy as np

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run import progstate as P
    from qubism_tpu.run.interpreter import run_program
    from tests.test_compiler import _interp_state_in_layout

    src = """
    qreg a[4]; qreg b[1]; creg c[5];
    h a[0]; cx a[0], a[1]; t a[2]; x b[0];
    cx a[3], b[0];
    h b[0]; cx b[0], a[2];
    measure a[0] -> c[0];
    """
    qelib = "examples/qelib1.inc"
    full = f'include "{qelib}";\n' + src
    ast = parse_openqasm("<t>", full)
    ps_plain = run_program(ast, seed=3)
    ref = _interp_state_in_layout(ps_plain, ["a", "b"])
    assert ps_plain.qregs["a"].start == 0  # unflipped at this size

    monkeypatch.setattr(P, "_TENSOR_FLIP_MIN_BIG", 2)
    ps_flip = run_program(ast, seed=3)
    assert ps_flip.qregs["b"].start == 0  # b's qubit now leads the backing vec
    got = _interp_state_in_layout(ps_flip, ["a", "b"])
    assert str(ps_plain.cregs["c"]) == str(ps_flip.cregs["c"])
    assert np.linalg.norm(got - ref) < 1e-6


def test_opaque_gate_apply_is_runtime_error():
    """Declaring an opaque gate is legal; applying it raises with the
    call site's line (a simulator has no unitary for it). Both the
    interpreter and the compiled elaborator reject it."""
    from qubism_tpu.run.compiler import CompiledProgram
    from qubism_tpu.run.progstate import QasmRuntimeError

    src = """qreg q[1];
opaque blackbox x;
blackbox q[0];"""
    ast = parse_openqasm("<t>", src)
    with pytest.raises(QasmRuntimeError, match="opaque gate blackbox"):
        run_program(ast, seed=0)
    try:
        run_program(ast, seed=0)
    except QasmRuntimeError as e:
        assert e.pos.line == 3
    with pytest.raises(QasmRuntimeError, match="opaque gate blackbox"):
        CompiledProgram(ast)
