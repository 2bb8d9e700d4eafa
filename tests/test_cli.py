"""CLI + REPL tests (the reference had none): file mode, REPL persistence,
atomic failed lines, :q, :dump, flags."""

import io
import os

from qubism_tpu.cli import Repl, eval_file, main

EXAMPLES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_eval_file_prints_done(capsys):
    code = eval_file(os.path.join(EXAMPLES, "errorCorrection.qasm"), seed=0)
    out = capsys.readouterr().out
    assert code == 0
    assert out.strip().endswith("Done.")


def test_eval_file_parse_error(tmp_path, capsys):
    f = tmp_path / "bad.qasm"
    f.write_text("qreg q[2]; bogus !;")
    code = eval_file(str(f))
    out = capsys.readouterr().out
    assert code == 1
    assert "Undeclared identifier: bogus" in out or "unexpected" in out


def test_eval_file_runtime_error(tmp_path, capsys):
    f = tmp_path / "bad.qasm"
    f.write_text("qreg a[2]; qreg b[3]; CX a,b;")
    code = eval_file(str(f))
    out = capsys.readouterr().out
    assert code == 1
    assert "ERROR on line" in out


def test_eval_missing_file(capsys):
    assert eval_file("/nonexistent/foo.qasm") == 2


def test_main_with_file():
    assert main([os.path.join(EXAMPLES, "rippleCarryAdder.qasm"), "--seed", "0"]) == 0


def test_repl_state_persists():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    assert r.line("qreg q[1]; creg c[1];")
    assert r.line("U(pi,0,pi) q[0];")
    assert r.line("measure q[0] -> c[0];")
    assert str(r.prog.cregs["c"]) == "1"


def test_repl_failed_line_atomic():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    r.line("qreg q[2]; creg c[2];")
    svs = dict(r.prog.stvecs)
    idt = dict(r.pstate.id_table)
    # runtime failure mid-line: the whole line must roll back
    r.line("qreg extra[1]; creg c2[3]; measure q -> c2;")
    assert "ERROR on line" in out.getvalue()
    assert dict(r.prog.stvecs) == svs
    assert "extra" not in r.prog.qregs
    assert dict(r.pstate.id_table) == idt  # parser table also rolled back


def test_repl_parse_error_keeps_state():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    r.line("qreg q[1];")
    r.line("qreg q[1];")  # redeclaration: parse error
    assert "Redeclaration of q" in out.getvalue()
    assert "q" in r.prog.qregs


def test_repl_quit():
    r = Repl(seed=0, out=io.StringIO())
    assert r.line(":q") is False


def test_repl_dump():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    r.line("qreg q[1];")
    r.line(":dump;")
    assert "Dump of the internal state" in out.getvalue()


def test_repl_include():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    assert r.line(f'include "{EXAMPLES}/qelib1.inc";')
    assert r.line("qreg q[1]; creg c[1]; x q[0]; measure q[0] -> c[0];")
    assert str(r.prog.cregs["c"]) == "1"


def test_repl_include_base_and_cd():
    # --include-base makes bare REPL 'include' names resolve against the
    # given dir (instead of only the cwd); :cd rebases mid-session
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    assert r.line(f":cd {EXAMPLES}")
    assert "include base" in out.getvalue()
    assert r.line('include "qelib1.inc";')
    assert r.line("qreg q[1]; creg c[1]; x q[0]; measure q[0] -> c[0];")
    assert str(r.prog.cregs["c"]) == "1"

    out2 = io.StringIO()
    r2 = Repl(seed=0, out=out2, include_base=EXAMPLES)
    assert r2.line('include "qelib1.inc";')
    assert r2.line("qreg q[1]; creg c[1]; x q[0]; measure q[0] -> c[0];")
    assert str(r2.prog.cregs["c"]) == "1"

    out3 = io.StringIO()
    r3 = Repl(seed=0, out=out3)
    assert r3.line(":cd /definitely/not/a/dir")
    assert "no such directory" in out3.getvalue()


def test_repl_run_loop_with_stdin():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    r.run(infile=io.StringIO("qreg q[1];\n:q\n"))
    assert out.getvalue().count("QASM> ") == 2


def test_shots_flag(tmp_path, capsys):
    f = tmp_path / "bell.qasm"
    f.write_text(
        "qreg q[2]; U(pi/2,0,pi) q[0]; CX q[0],q[1];"
    )
    code = main([str(f), "--seed", "1", "--shots", "64"])
    out = capsys.readouterr().out
    assert code == 0
    assert "Counts for state vector q" in out
    # only |00> and |11> may appear for a Bell state
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("|"):
            assert line.startswith("|00>") or line.startswith("|11>")


def test_dump_state_flag(tmp_path, capsys):
    f = tmp_path / "t.qasm"
    f.write_text("qreg q[1];")
    assert main([str(f), "--dump-state"]) == 0
    assert "Dump of the internal state" in capsys.readouterr().out


def test_mesh_flag(capsys):
    """--mesh runs the program over a virtual device mesh."""
    assert main([os.path.join(EXAMPLES, "errorCorrection.qasm"),
                 "--mesh", "8", "--seed", "0"]) == 0
    assert capsys.readouterr().out.strip().endswith("Done.")


def test_mesh_flag_with_shots(tmp_path, capsys):
    f = tmp_path / "ghz.qasm"
    f.write_text("qreg q[3]; U(pi/2,0,pi) q[0]; CX q[0],q[1]; CX q[1],q[2];")
    assert main([str(f), "--mesh", "4", "--shots", "32", "--seed", "1"]) == 0
    out = capsys.readouterr().out
    for line in out.splitlines():
        if line.strip().startswith("|"):
            assert line.strip().startswith(("|000>", "|111>"))


def test_verbose_flag_emits_timings(tmp_path, capsys):
    from qubism_tpu.cli import main
    from qubism_tpu.utils import profiling

    f = tmp_path / "v.qasm"
    f.write_text("qreg q[2]; creg c[2]; U(pi/2,0,pi) q[0]; CX q[0],q[1];"
                 " measure q -> c;")
    try:
        assert main([str(f), "--seed", "0", "--verbose", "--compile"]) == 0
    finally:
        profiling.VERBOSE = False
    err = capsys.readouterr().err
    assert "EvGates" in err and "EvMeasure" in err and "segment:" in err


def test_include_search_path_flag(tmp_path):
    """-I DIR: includes resolve includer-relative FIRST (the reference's
    rule), then through each -I directory."""
    import subprocess
    import sys

    lib = tmp_path / "libs"
    lib.mkdir()
    (lib / "mylib.inc").write_text("gate myh a { U(pi/2, 0, pi) a; }\n")
    prog = tmp_path / "prog.qasm"
    prog.write_text('include "mylib.inc";\nqreg q[1];\nmyh q[0];\n')
    # without -I: include fails (not next to the program)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from qubism_tpu.cli import main;"
         f"sys.exit(main(['{prog}']))"],
        capture_output=True, text=True, timeout=300)
    assert "Cannot include" in r.stdout + r.stderr
    # with -I: resolves through the search dir
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from qubism_tpu.cli import main;"
         f"sys.exit(main(['{prog}', '-I', '{lib}']))"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Done." in r.stdout


def test_stabilizer_backend_flag(tmp_path, capsys):
    f = tmp_path / "bell.qasm"
    f.write_text("qreg q[2]; creg c[2];\n"
                 "U(pi/2,0,pi) q[0]; CX q[0],q[1];\n"
                 "measure q -> c;\n")
    code = eval_file(str(f), seed=0, backend="stabilizer", shots=64,
                     dump_state=True)
    out = capsys.readouterr().out
    assert code == 0
    assert "Done." in out
    assert "stabilizer backend" in out          # the dump header
    # post-measurement: counts concentrate on one of |00>, |11>
    assert ("|00>: 64" in out) or ("|11>: 64" in out)


def test_stabilizer_backend_rejects_non_clifford(tmp_path, capsys):
    f = tmp_path / "t.qasm"
    f.write_text("qreg q[1]; U(pi/4,0,0) q[0];\n")
    code = eval_file(str(f), backend="stabilizer")
    out = capsys.readouterr().out
    assert code == 1
    assert "stabilizer backend" in out and "Clifford" in out


def test_mps_backend_flag(tmp_path, capsys):
    f = tmp_path / "bell.qasm"
    f.write_text("qreg q[2]; creg c[2];\n"
                 "U(pi/2,0,pi) q[0]; CX q[0],q[1];\n"
                 "measure q -> c;\n")
    code = eval_file(str(f), seed=0, backend="mps", shots=64,
                     dump_state=True, chi=4)
    out = capsys.readouterr().out
    assert code == 0
    assert "Done." in out
    assert "mps backend" in out and "chi=4" in out
    # post-measurement: counts concentrate on one of |00>, |11>
    assert ("|00>: 64" in out) or ("|11>: 64" in out)


def test_mps_backend_nonclifford_ok(tmp_path, capsys):
    # T gates are fine on the MPS backend (unlike --backend stabilizer)
    f = tmp_path / "t.qasm"
    f.write_text("qreg q[1];\n"
                 "U(pi/2,0,pi) q[0]; U(0,0,pi/4) q[0]; U(pi/2,0,pi) q[0];\n")
    code = eval_file(str(f), seed=0, backend="mps", shots=200, chi=2)
    out = capsys.readouterr().out
    assert code == 0 and "Done." in out
    # |<0|HTH|0>|^2 = cos^2(pi/8) ~ 0.854
    import re
    m = dict(re.findall(r"\|(\d)>: (\d+)", out))
    assert int(m.get("0", 0)) > 130


def test_large_n_programs_skip_dense_allocation(tmp_path, capsys):
    """qreg declarations must not allocate 2^n during elaboration: a
    64-qubit GHZ runs on the stabilizer and mps backends."""
    f = tmp_path / "ghz64.qasm"
    lines = ["qreg q[64];", "U(pi/2,0,pi) q[0];"]
    lines += [f"CX q[{i}],q[{i + 1}];" for i in range(63)]
    f.write_text("\n".join(lines) + "\n")
    for backend, kw in (("stabilizer", {}), ("mps", {"chi": 4})):
        code = eval_file(str(f), seed=0, backend=backend, shots=32, **kw)
        out = capsys.readouterr().out
        assert code == 0 and "Done." in out, (backend, out)
        assert ("|" + "0" * 64 + ">") in out or ("|" + "1" * 64 + ">") in out


def test_noise_trajectories_flag(tmp_path, capsys):
    f = tmp_path / "noisy.qasm"
    f.write_text("""
        qreg q[1]; creg c[1];
        U(3.141592653589793, 0, 3.141592653589793) q[0];
        measure q -> c;
    """)
    code = eval_file(str(f), seed=0, noise="bitflip:0.25", trajectories=400)
    out = capsys.readouterr().out
    assert code == 0
    assert "Counts over classical registers (400 trajectories):" in out
    assert "c=0:" in out and "c=1:" in out      # noise flips some shots
    assert "Done." in out


def test_trajectories_without_noise(tmp_path, capsys):
    """Noiseless trajectories: per-shot mid-circuit re-runs."""
    f = tmp_path / "mid.qasm"
    f.write_text("""
        qreg q[1]; creg c[1];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        measure q -> c;
    """)
    code = eval_file(str(f), seed=1, trajectories=256)
    out = capsys.readouterr().out
    assert code == 0
    assert "c=0:" in out and "c=1:" in out


def test_noise_flag_errors(tmp_path, capsys):
    f = tmp_path / "p.qasm"
    f.write_text("qreg q[1]; creg c[1]; measure q -> c;")
    assert eval_file(str(f), noise="nope:0.1") == 2
    assert "unknown noise channel" in capsys.readouterr().out
    # --mesh now composes with trajectory mode (batch sharding); only
    # --compile stays incompatible
    assert eval_file(str(f), noise="bitflip:0.1", compile_mode=True) == 2
    assert "own execution mode" in capsys.readouterr().out
    g = tmp_path / "nocreg.qasm"
    g.write_text("qreg q[1]; U(0,0,0) q[0];")
    assert eval_file(str(g), trajectories=8) == 2
    assert "declares none" in capsys.readouterr().out


def test_density_backend_flag(tmp_path, capsys):
    f = tmp_path / "open.qasm"
    f.write_text("""
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
    """)
    code = eval_file(str(f), seed=0, backend="density",
                     noise="depolarizing:0.05", shots=512, dump_state=True)
    out = capsys.readouterr().out
    assert code == 0 and "Done." in out
    assert "purity=" in out and "noise=depolarizing:0.05" in out
    assert "|00>:" in out and "|11>:" in out
    # depolarizing leaks weight onto the anti-correlated strings
    assert "|01>:" in out or "|10>:" in out


def test_density_backend_errors(tmp_path, capsys):
    # --mesh on density is SUPPORTED (sharded rho) — but a program too
    # small for the mesh must produce a clean rc-2 diagnostic, not a
    # traceback (the shape check fires before allocation)
    f = tmp_path / "p.qasm"
    f.write_text("qreg q[1]; creg c[1]; measure q -> c;")
    assert eval_file(str(f), backend="density", mesh=2) == 2
    assert "shards" in capsys.readouterr().out
    g = tmp_path / "big.qasm"
    g.write_text("qreg q[20]; creg c[1];")
    assert eval_file(str(g), backend="density") == 2
    assert "4^n" in capsys.readouterr().out
    # oversized per-device block with a mesh: clean rc 2 as well
    assert eval_file(str(g), backend="density", mesh=2) == 2
    assert "single-buffer" in capsys.readouterr().out


def test_stabilizer_noise_flag(tmp_path, capsys):
    f = tmp_path / "sn.qasm"
    f.write_text("""
        qreg q[3]; creg c[3];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        CX q[1], q[2];
        measure q -> c;
    """)
    code = eval_file(str(f), seed=0, backend="stabilizer",
                     noise="depolarizing:0.02", trajectories=512)
    out = capsys.readouterr().out
    assert code == 0 and "512 trajectories" in out
    assert "c=000:" in out and "c=111:" in out
    # non-Pauli channel on the tableau is rejected with a pointer
    assert eval_file(str(f), backend="stabilizer", noise="ad:0.1") == 2
    assert "not a Pauli channel" in capsys.readouterr().out


def test_mps_noise_flag(tmp_path, capsys):
    f = tmp_path / "mn.qasm"
    f.write_text("""
        qreg q[3]; creg c[3];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        CX q[1], q[2];
        measure q -> c;
    """)
    code = eval_file(str(f), seed=0, backend="mps", chi=4,
                     noise="bitflip:0.05", trajectories=256)
    out = capsys.readouterr().out
    assert code == 0 and "256 trajectories" in out
    assert "c=000:" in out and "c=111:" in out
    # amplitude/phase damping ride the in-scan Kraus path now
    assert eval_file(str(f), seed=0, backend="mps", chi=4,
                     noise="pd:0.1", trajectories=64) == 0
    assert "64 trajectories" in capsys.readouterr().out
    # unknown channel names get the parser's clearer error (rc 2)
    assert eval_file(str(f), backend="mps", noise="nope:0.1") == 2
    assert "unknown noise channel" in capsys.readouterr().out


def test_stabilizer_noise_non_clifford(tmp_path, capsys):
    f = tmp_path / "nc.qasm"
    f.write_text("""
        qreg q[1]; creg c[1];
        U(0.3, 0.1, 0.2) q[0];
        measure q -> c;
    """)
    code = eval_file(str(f), backend="stabilizer", noise="bitflip:0.1",
                     trajectories=8)
    assert code == 1
    assert "stabilizer trajectories:" in capsys.readouterr().out


def test_observable_flag_all_backends(tmp_path, capsys):
    """--observable prints <P> on every backend; Bell <ZZ> = <XX> = 1."""
    f = tmp_path / "bell.qasm"
    f.write_text("qreg q[2];\n"
                 "U(1.5707963267948966, 0, 3.141592653589793) q[0];\n"
                 "CX q[0], q[1];\n")
    import re

    for kw in ({}, {"compile_mode": True}, {"mesh": 2},
               {"backend": "stabilizer"}, {"backend": "mps", "chi": 4}):
        assert eval_file(str(f), seed=0,
                         observables=["ZZ", "XX", "ZI"], **kw) == 0
        out = capsys.readouterr().out
        vals = dict(re.findall(r"<(\w+)> = (-?\d+\.\d+)", out))
        assert abs(float(vals["ZZ"]) - 1.0) < 1e-5, (kw, out)
        assert abs(float(vals["XX"]) - 1.0) < 1e-5, (kw, out)
        assert abs(float(vals["ZI"])) < 1e-5, (kw, out)


def test_observable_flag_trajectories_and_density(tmp_path, capsys):
    f = tmp_path / "bell.qasm"
    f.write_text("qreg q[2];\n"
                 "U(1.5707963267948966, 0, 3.141592653589793) q[0];\n"
                 "CX q[0], q[1];\n")
    import re

    assert eval_file(str(f), seed=0, backend="density", noise="dep:0.1",
                     observables=["ZZ"]) == 0
    exact = float(re.search(r"<ZZ> = (-?\d+\.\d+)",
                            capsys.readouterr().out).group(1))
    # trajectory estimator (no cregs: observables only) within 5 sigma
    assert eval_file(str(f), seed=0, noise="dep:0.1", trajectories=2048,
                     observables=["ZZ"]) == 0
    m = re.search(r"<ZZ> = (-?\d+\.\d+) \+- (\d+\.\d+)",
                  capsys.readouterr().out)
    mean, se = float(m.group(1)), float(m.group(2))
    assert abs(mean - exact) < 5 * se + 1e-3
    # bad string: clear error, rc 2
    assert eval_file(str(f), observables=["ZZZ"]) == 2
    assert "I/X/Y/Z" in capsys.readouterr().out


def test_observable_flag_unfused_registers(tmp_path, capsys):
    """Interpreter path: <P> factorizes over lazily-fused clusters —
    two never-entangled registers each contribute their own factor."""
    f = tmp_path / "two.qasm"
    f.write_text("qreg a[1]; qreg b[1];\n"
                 "U(3.141592653589793, 0, 3.141592653589793) a[0];\n")
    import re

    assert eval_file(str(f), seed=0, observables=["ZZ", "ZI", "IZ"]) == 0
    out = capsys.readouterr().out
    vals = dict(re.findall(r"<(\w+)> = (-?\d+\.\d+)", out))
    assert abs(float(vals["ZZ"]) - (-1.0)) < 1e-5   # (-1) * (+1)
    assert abs(float(vals["ZI"]) - (-1.0)) < 1e-5
    assert abs(float(vals["IZ"]) - 1.0) < 1e-5


def test_repl_observable_command():
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    r.line("qreg q[2];")
    r.line("U(pi/2,0,pi) q[0]; CX q[0],q[1];")
    r.line(":obs ZZ;")
    r.line(":observable XX")
    r.line(":obs WAT;")
    text = out.getvalue()
    assert "<ZZ> = 1.000000" in text
    assert "<XX> = 1.000000" in text
    assert "qubism: :observable:" in text


def test_observable_engine_errors_keep_engine_rc(tmp_path, capsys):
    """A creg-less non-Clifford circuit reaching the stabilizer engine
    through --observable must report the ENGINE error with rc 1 (same
    as the counts path), not a misleading --observable rc 2."""
    f = tmp_path / "nc.qasm"
    f.write_text("qreg q[1];\nU(0.3, 0.1, 0.2) q[0];\n")
    code = eval_file(str(f), backend="stabilizer", noise="bitflip:0.1",
                     trajectories=8, observables=["Z"])
    out = capsys.readouterr().out
    assert code == 1
    assert "stabilizer trajectories:" in out


def test_trajectory_mesh_flag(tmp_path, capsys):
    """--mesh in trajectory mode shards the batch over devices (no
    amplitude sharding); same seed => same counts as the unsharded run."""
    f = tmp_path / "tm.qasm"
    f.write_text("""
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """)
    assert eval_file(str(f), seed=0, noise="dep:0.02",
                     trajectories=64) == 0
    plain = capsys.readouterr().out
    assert eval_file(str(f), seed=0, noise="dep:0.02", trajectories=64,
                     mesh=8) == 0
    assert capsys.readouterr().out == plain
    # too many devices: clear error, rc 2
    assert eval_file(str(f), noise="dep:0.02", trajectories=8,
                     mesh=4096) == 2
    assert "device" in capsys.readouterr().out


def test_traj_engine_fused_errors_on_ineligible_configs(tmp_path, capsys):
    # an EXPLICIT --traj-engine fused must error (rc 2) where the fused
    # engine cannot run — --mesh and non-dense backends — instead of
    # silently using another engine (regression)
    f = tmp_path / "tf.qasm"
    f.write_text("""
        qreg q[2]; creg c[2];
        U(1.5707963267948966, 0, 3.141592653589793) q[0];
        CX q[0], q[1];
        measure q -> c;
    """)
    code = eval_file(str(f), seed=0, noise="depolarizing:0.01",
                     trajectories=16, traj_engine="fused", mesh=1)
    assert code == 2
    assert "incompatible" in capsys.readouterr().out
    code = eval_file(str(f), seed=0, backend="stabilizer",
                     noise="depolarizing:0.01", trajectories=16,
                     traj_engine="fused")
    assert code == 2
    assert "incompatible" in capsys.readouterr().out
    # eligible config still runs
    code = eval_file(str(f), seed=0, noise="depolarizing:0.01",
                     trajectories=16, traj_engine="fused")
    assert code == 0


def test_repl_cd_prefix_does_not_swallow_other_commands():
    # ":cdX" is NOT :cd — it must fall through to the QASM parser (and
    # fail there), leaving the include base untouched
    out = io.StringIO()
    r = Repl(seed=0, out=out)
    assert r.line(":cdump")  # unknown -> parse error, REPL continues
    assert "include base" not in out.getvalue()
    assert r.line(":cd") or True  # bare :cd rebases to the cwd


def test_mps_trunc_budget_flags(tmp_path, capsys):
    """--trunc-budget grows chi adaptively; an impossible budget at a
    tiny --max-chi errors cleanly (rc 1), never returns wrong spectra."""
    import shutil

    from qubism_tpu.models.circuits import brickwork_qasm

    shutil.copy("examples/qelib1.inc", tmp_path / "qelib1.inc")
    f = tmp_path / "bw.qasm"
    src = brickwork_qasm(10, 8, seed=11)
    f.write_text(src + "\n")
    code = eval_file(str(f), seed=0, backend="mps", chi=4,
                     trunc_budget=1e-6, max_chi=64, dump_state=True)
    out = capsys.readouterr().out
    assert code == 0 and "Done." in out
    assert "trunc_error=0.000e+00" in out          # budget held
    code = eval_file(str(f), seed=0, backend="mps", chi=4,
                     trunc_budget=1e-9, max_chi=4)
    out = capsys.readouterr().out
    assert code == 1 and "trunc_budget" in out
