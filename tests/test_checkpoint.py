"""Checkpoint/resume: full interpreter state (state vectors, cregs, user
gates, PRNG key, parser table) must round-trip through disk, and a resumed
REPL must continue exactly where it left off."""

import io
import os

import numpy as np

from qubism_tpu.cli import Repl
from qubism_tpu.qasm.parser import initial_state, parse_openqasm_incremental
from qubism_tpu.run.interpreter import run_program_incremental
from qubism_tpu.utils.checkpoint import load_progstate, save_progstate


def test_progstate_roundtrip(tmp_path):
    qelib = os.path.join(os.path.dirname(__file__), "..", "examples", "qelib1.inc")
    src = """
    include "QELIB";
    qreg a[2]; qreg b[1]; creg c[2];
    gate mygate(t) x { U(t,0,0) x; }
    h a[0]; cx a[0],b[0];
    mygate(0.5) a[1];
    measure a[0] -> c[0];
    """.replace("QELIB", qelib)
    st = initial_state()
    ast, st = parse_openqasm_incremental(st, src)
    from qubism_tpu.run.progstate import blank_state

    ps = run_program_incremental(ast, blank_state(5))

    path = str(tmp_path / "ckpt.npz")
    save_progstate(ps, path, st)
    ps2, st2 = load_progstate(path)

    assert set(ps2.stvecs) == set(ps.stvecs)
    for name in ps.stvecs:
        assert np.allclose(np.asarray(ps2.stvecs[name].planar),
                           np.asarray(ps.stvecs[name].planar), atol=0)
    assert ps2.qregs == ps.qregs
    assert ps2.cregs == ps.cregs
    assert set(ps2.funcs) == set(ps.funcs)
    assert ps2.funcs["mygate"].body == ps.funcs["mygate"].body
    assert st2.id_table.keys() == st.id_table.keys()
    # PRNG key continues the same stream
    import jax

    assert np.array_equal(np.asarray(jax.random.key_data(ps2.key)),
                          np.asarray(jax.random.key_data(ps.key)))


def test_repl_save_load_resume(tmp_path):
    path = str(tmp_path / "session.npz")
    out1 = io.StringIO()
    r1 = Repl(seed=3, out=out1)
    r1.line("qreg q[2]; creg c[2];")
    r1.line("U(pi/2,0,pi) q[0]; CX q[0],q[1];")
    r1.line(f":save {path}")
    assert "Saved session" in out1.getvalue()

    out2 = io.StringIO()
    r2 = Repl(seed=999, out=out2)
    r2.line(f":load {path}")
    assert "Loaded session" in out2.getvalue()
    # declarations are remembered (no 'Undeclared identifier')
    r2.line("measure q -> c;")
    assert "Undeclared" not in out2.getvalue()
    bits = str(r2.prog.cregs["c"])
    assert bits in ("00", "11")  # Bell state correlations survive the resume

    # the same seed stream in the original session yields the same outcome
    r1.line("measure q -> c;")
    assert str(r1.prog.cregs["c"]) == bits


def test_load_missing_file_is_graceful(tmp_path):
    out = io.StringIO()
    r = Repl(out=out)
    assert r.line(f":load {tmp_path}/nope.npz") is True
    assert "qubism:" in out.getvalue()
