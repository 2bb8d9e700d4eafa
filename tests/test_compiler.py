"""Compiled-mode (whole-program fusion) vs interpreted-mode equivalence:
the fast path must reproduce the semantics reference on all example programs
and on targeted mid-circuit-measurement/conditional cases."""

import math
import os

import numpy as np
import pytest

from qubism_tpu.ops.apply import complex_from_planar
from qubism_tpu.qasm.parser import parse_openqasm
from qubism_tpu.run.compiler import CompiledProgram, EvCond, EvGates, EvMeasure
from qubism_tpu.run.interpreter import run_program
from qubism_tpu.run.progstate import QasmRuntimeError

EXAMPLES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "examples"))


def parse_file(name):
    path = os.path.join(EXAMPLES, name)
    with open(path) as f:
        return parse_openqasm(path, f.read())


def parse_src(src, with_qelib=True):
    if with_qelib:
        src = f'include "{EXAMPLES}/qelib1.inc";\n' + src
    return parse_openqasm("<test>", src)


def test_error_correction_compiled():
    ast = parse_file("errorCorrection.qasm")
    prog = CompiledProgram(ast)
    for seed in range(4):
        _, cregs, _ = prog.run(seed=seed)
        assert str(cregs["c"]) == "000"
        assert str(cregs["syn"]) == "10"


def test_adder_compiled():
    ast = parse_file("rippleCarryAdder.qasm")
    _, cregs, _ = CompiledProgram(ast).run(seed=0)
    assert cregs["ans"].to_natural() == 16


def test_teleportation_compiled_deterministic():
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
    prog = CompiledProgram(parse_src(src))
    for seed in range(6):
        _, cregs, _ = prog.run(seed=seed)
        assert str(cregs["c2"]) == "1"


def test_compiled_matches_interpreter_amplitudes():
    """Measurement-free program: amplitudes must agree with the interpreter
    across multiple registers (compiled mode pre-fuses the layout)."""
    src = """
    qreg a[2]; qreg b[2];
    h a[0];
    cx a[0],b[1];
    cu1(pi/4) a[1],b[0];
    x b[0];
    """
    ast = parse_src(src)
    ps = run_program(ast, seed=0)
    # interpreter: a and b fused into one statevec "a(x)b" by the cross CX
    ref = ps.stvecs["a(x)b"].amps
    prog = CompiledProgram(ast)
    state, _, _ = prog.run(seed=0)
    got = complex_from_planar(state)
    assert np.linalg.norm(got - ref) < 1e-5


def test_compiled_same_outcomes_as_interpreter():
    """Same seed => identical measurement outcomes (same key-split order)."""
    ast = parse_file("inverseQFT.qasm")
    prog = CompiledProgram(ast)
    for seed in (0, 1, 7, 42):
        ps = run_program(ast, seed=seed)
        _, cregs, _ = prog.run(seed=seed)
        assert str(cregs["c"]) == str(ps.cregs["c"])


def test_conditional_measure_in_compiled_mode():
    src = """
    qreg q[2]; creg c[1]; creg out[1];
    x q[0];
    measure q[0] -> c[0];
    if(c==1) measure q[1] -> out[0];
    """
    prog = CompiledProgram(parse_src(src))
    _, cregs, _ = prog.run(seed=0)
    assert str(cregs["c"]) == "1"
    assert str(cregs["out"]) == "0"


def test_reset_in_compiled_mode():
    src = "qreg q[2]; creg c[2]; x q[0]; x q[1]; reset q[0]; measure q -> c;"
    _, cregs, _ = CompiledProgram(parse_src(src)).run(seed=0)
    assert str(cregs["c"]) == "01"


def test_event_stream_structure():
    src = """
    qreg q[2]; creg c[2];
    h q[0]; cx q[0],q[1];
    measure q[0] -> c[0];
    if(c==1) x q[1];
    h q[1];
    """
    prog = CompiledProgram(parse_src(src))
    kinds = [type(e).__name__ for e in prog.events]
    assert kinds == ["EvGates", "EvMeasure", "EvCond", "EvGates"]
    cond = prog.events[2]
    assert isinstance(cond, EvCond) and len(cond.body) == 1
    assert isinstance(cond.body[0], EvGates)


def test_compiled_runtime_errors_surface():
    with pytest.raises(QasmRuntimeError, match="different sizes"):
        CompiledProgram(parse_src("qreg a[2]; qreg b[3]; CX a,b;", with_qelib=False))


def test_compiled_dump():
    src = "qreg a[1]; qreg b[1]; creg c[1]; h a[0]; :dump;"
    out = []
    CompiledProgram(parse_src(src)).run(seed=0, dump_writer=out.append)
    dump = "".join(out)
    assert "Dump of the internal state" in dump
    assert "a(x)b" in dump


def test_cli_compile_flag(tmp_path, capsys):
    from qubism_tpu.cli import main

    assert main([os.path.join(EXAMPLES, "rippleCarryAdder.qasm"),
                 "--seed", "0", "--compile"]) == 0
    assert capsys.readouterr().out.strip().endswith("Done.")


def test_cli_compile_with_shots(tmp_path, capsys):
    from qubism_tpu.cli import main

    f = tmp_path / "ghz.qasm"
    f.write_text("qreg q[3]; U(pi/2,0,pi) q[0]; CX q[0],q[1]; CX q[1],q[2];")
    assert main([str(f), "--compile", "--shots", "32", "--seed", "1"]) == 0
    out = capsys.readouterr().out
    assert "Counts" in out
    for line in out.splitlines():
        if line.strip().startswith("|"):
            assert line.strip().startswith(("|000>", "|111>"))


def test_run_sharded_matches_single_device():
    """--mesh path: the same program over an 8-device mesh must reproduce
    the single-device compiled result (deterministic example)."""
    ast = parse_file("errorCorrection.qasm")
    prog = CompiledProgram(ast)
    for seed in (0, 3):
        sim, cregs, _ = prog.run_sharded(mesh=8, seed=seed)
        assert str(cregs["c"]) == "000"
        assert str(cregs["syn"]) == "10"


def test_run_sharded_amplitudes():
    src = "qreg q[4]; h q[0]; cx q[0],q[1]; cu1(pi/2) q[2],q[1];"
    ast = parse_src(src)
    prog = CompiledProgram(ast)
    state, _, _ = prog.run(seed=0)
    expected = complex_from_planar(state)
    sim, _, _ = prog.run_sharded(mesh=4, seed=0)
    got = sim.amplitudes()
    assert np.linalg.norm(got - expected) < 1e-5


# -- virtual-shard compiled mode (the n>29 TPU representation, forced small) ----


def test_compiled_virtual_shards_amplitudes():
    from qubism_tpu.ops.fusion import state_to_complex_virtual

    src = "qreg q[4]; h q[0]; cx q[0],q[1]; cu1(pi/2) q[2],q[1]; h q[3];"
    ast = parse_src(src)
    flat, _, _ = CompiledProgram(ast, virtual_shards=0).run(seed=0)
    expected = complex_from_planar(flat)
    for v in (1, 2):
        prog = CompiledProgram(ast, virtual_shards=v)
        assert prog.v == v
        state, _, _ = prog.run(seed=0)
        got = state_to_complex_virtual(state, v)
        assert np.linalg.norm(got - expected) < 1e-5


def test_compiled_virtual_shards_measurement_and_feedforward():
    """Measurement, conditional correction and a virtual-bit measure (qubits
    0,1 are shard-index bits at v=2) must work in the sharded representation."""
    ast = parse_file("errorCorrection.qasm")
    for v in (1, 2):
        prog = CompiledProgram(ast, virtual_shards=v)
        for seed in range(3):
            _, cregs, _ = prog.run(seed=seed)
            assert str(cregs["c"]) == "000"
            assert str(cregs["syn"]) == "10"


def test_compiled_virtual_shards_reset():
    src = "qreg q[3]; creg c[3]; x q[0]; x q[2]; reset q[0]; measure q -> c;"
    _, cregs, _ = CompiledProgram(parse_src(src), virtual_shards=1).run(seed=0)
    assert str(cregs["c"]) == "001"


def test_compiled_virtual_shards_dump():
    src = "qreg q[3]; x q[0]; :dump;"
    out = []
    CompiledProgram(parse_src(src), virtual_shards=1).run(seed=0,
                                                          dump_writer=out.append)
    dump = "".join(out)
    assert "Dump of the internal state" in dump
    assert "|100>" in dump


def test_compiled_virtual_shards_shots(tmp_path, capsys):
    """GHZ counts through the CLI-style sampling path on a sharded state."""
    from qubism_tpu.ops.sample import sample_counts

    src = "qreg q[4]; h q[0]; cx q[0],q[1]; cx q[1],q[2]; cx q[2],q[3];"
    prog = CompiledProgram(parse_src(src), virtual_shards=2)
    state, _, key = prog.run(seed=1)
    counts = sample_counts(state, prog.n, 256, key, v=2)
    assert set(counts) <= {"0000", "1111"}
    assert sum(counts.values()) == 256
    assert 60 < counts.get("0000", 0) < 196  # ~Bin(256, 1/2)


def test_virtual_shard_measurement_distribution():
    """Born statistics of a virtual-bit measurement (q < v)."""
    import jax
    from jax.numpy import array as jnp_copy

    from qubism_tpu.ops.measure import measure_qubit_sharded, prob_one_sharded

    src = "qreg q[3]; ry(2*0.6435011087932844) q[0];"  # p1 = sin^2(0.6435) ~ 0.36
    prog = CompiledProgram(parse_src(src), virtual_shards=1)
    state, _, _ = prog.run(seed=0)
    p1 = prob_one_sharded(state, 0, 3, 1)
    assert abs(p1 - 0.36) < 1e-5
    ones = 0
    for seed in range(200):
        # collapse donates the shard buffers (in-place at scale): copy first
        snapshot = tuple((jnp_copy(sh[0]), jnp_copy(sh[1])) for sh in state)
        outcome, collapsed, _ = measure_qubit_sharded(
            snapshot, jax.random.PRNGKey(seed), 0, 3, 1)
        ones += outcome
    assert 40 < ones < 105  # ~Bin(200, 0.36)


def test_adjacent_measures_coalesce_into_one_event():
    """Per-bit readout statements (the adder pattern) become ONE measurement
    event — one device dispatch instead of two per bit."""
    src = """
    qreg q[3]; creg c[3]; creg d[1];
    x q[0]; x q[2];
    measure q[0] -> c[0];
    measure q[1] -> c[1];
    measure q[2] -> d[0];
    """
    prog = CompiledProgram(parse_src(src))
    measures = [e for e in prog.events if isinstance(e, EvMeasure)]
    assert len(measures) == 1
    assert measures[0].qubits == (0, 1, 2)
    assert [w[0] for w in measures[0].writes] == ["c", "c", "d"]
    _, cregs, _ = prog.run(seed=0)
    assert cregs["c"][0] == 1 and cregs["c"][1] == 0
    assert cregs["d"][0] == 1


def _interp_state_in_layout(ps, reg_order):
    """Assemble the interpreter's (possibly still-factored) state vectors
    into one complex vector whose qubit order is ``reg_order`` (the compiled
    path's declaration-order layout)."""
    import numpy as np

    # backing vecs, ordered by the first declared register viewing them
    vec_order: list[str] = []
    for reg in reg_order:
        t = ps.qregs[reg].target
        if t not in vec_order:
            vec_order.append(t)
    full = np.asarray(ps.stvecs[vec_order[0]].amps)
    for t in vec_order[1:]:
        full = np.kron(full, np.asarray(ps.stvecs[t].amps))
    # current qubit labels in concatenated order -> desired declaration order
    cur: list[tuple[str, int]] = []
    for t in vec_order:
        labels: list[tuple[str, int] | None] = [None] * ps.stvecs[t].n
        for reg, view in ps.qregs.items():
            if view.target == t:
                for k in range(view.size):
                    labels[view.start + k] = (reg, k)
        cur.extend(labels)  # every qubit belongs to exactly one register
    want = [(reg, k) for reg in reg_order for k in range(ps.qregs[reg].size)]
    if cur != want:
        perm = [cur.index(x) for x in want]
        full = full.reshape((2,) * len(cur)).transpose(perm).reshape(-1)
    return full


def _assert_same_up_to_global_phase(got, ref, ctx, tol=2e-5):
    """Amplitude-exact compare modulo ONE global phase (a per-amplitude
    phase divergence fails; |amps| comparison would hide it)."""
    import numpy as np

    if np.linalg.norm(ref) < 1e-6:
        # reset-as-projection can annihilate the state (reference quirk,
        # Simulation.hs:146-156): both paths must agree it is zero
        assert np.linalg.norm(got) < tol, ctx
        return
    i = int(np.argmax(np.abs(ref)))
    phase = got[i] / ref[i]
    mag = abs(phase)
    assert abs(mag - 1.0) < tol, (ctx, mag)
    assert np.linalg.norm(got - (phase / mag) * ref) < tol, ctx


def _fuzz_program(rng, qelib):
    """One random multi-register qelib1 program exercising gates, user-gate
    declarations/calls, reset, measurement and conditionals."""
    nq = int(rng.integers(2, 5))
    nr = int(rng.integers(1, 3))
    n = nq + nr
    lines = [f'include "{qelib}";', f"qreg q[{nq}];", f"qreg r[{nr}];",
             f"creg c[{n}];",
             "gate fz(a) x, y { h x; cx x, y; rz(a) y; h y; }"]

    def rand_bit():
        reg, sz = ("q", nq) if rng.random() < 0.7 else ("r", nr)
        return f"{reg}[{int(rng.integers(sz))}]"

    def two_bits():
        # two DISTINCT qubits, possibly across registers (fusion paths)
        while True:
            a, b = rand_bit(), rand_bit()
            if a != b:
                return a, b

    for _ in range(int(rng.integers(10, 28))):
        r = rng.random()
        if r < 0.35:
            g = rng.choice(["h", "x", "z", "s", "t", "sdg"])
            lines.append(f"{g} {rand_bit()};")
        elif r < 0.55:
            a, b = two_bits()
            g = rng.choice(["cx", "cz"])
            lines.append(f"{g} {a},{b};")
        elif r < 0.63:
            th, ph, lm = rng.uniform(0, 6.28, 3)
            lines.append(f"u3({th:.6f},{ph:.6f},{lm:.6f}) {rand_bit()};")
        elif r < 0.71:
            a, b = two_bits()
            lines.append(f"fz({rng.uniform(0, 6.28):.6f}) {a},{b};")
        elif r < 0.78:
            lines.append(f"reset {rand_bit()};")
        elif r < 0.88:
            q = int(rng.integers(n))
            reg = f"q[{q}]" if q < nq else f"r[{q - nq}]"
            lines.append(f"measure {reg} -> c[{q}];")
        else:
            v = int(rng.integers(1 << min(n, 4)))
            lines.append(f"if (c == {v}) x {rand_bit()};")
    lines.append("measure q -> c;")  # partial overwrite is a size error; use bits
    lines[-1] = "".join(f"measure q[{k}] -> c[{k}];" for k in range(nq))
    return "\n".join(lines) + "\n", n


@pytest.mark.slow
def test_fuzz_all_paths_match_interpreter():
    """Randomized differential test across ALL execution paths: random
    multi-register qelib1 programs (user gates, reset, mid-circuit
    measurement, feed-forward) must give identical creg outcomes and
    amplitudes equal up to one global phase under the interpreter, the
    compiled path, the compiled path with virtual shards, and the mesh
    path (same seed => same key stream)."""
    import numpy as np

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.compiler import CompiledProgram
    from qubism_tpu.run.interpreter import run_program

    rng = np.random.default_rng(1234)
    qelib = os.path.join(EXAMPLES, "qelib1.inc")
    for trial in range(6):
        src, n = _fuzz_program(rng, qelib)
        path = os.path.join(EXAMPLES, "_fuzz_tmp.qasm")
        ast = parse_openqasm(path, src)
        for seed in (0, 7):
            ctx = (trial, seed, src)
            ps = run_program(ast, seed=seed)
            ref = _interp_state_in_layout(ps, ["q", "r"])
            creg_ref = str(ps.cregs["c"])

            prog = CompiledProgram(ast)
            state, cregs, _ = prog.run(seed=seed)
            assert str(cregs["c"]) == creg_ref, ctx
            _assert_same_up_to_global_phase(complex_from_planar(state), ref, ctx)

            from qubism_tpu.ops.fusion import state_to_complex_virtual

            vprog = CompiledProgram(ast, virtual_shards=1)
            vstate, vcregs, _ = vprog.run(seed=seed)
            assert str(vcregs["c"]) == creg_ref, ctx
            _assert_same_up_to_global_phase(
                state_to_complex_virtual(vstate, vprog.v), ref, ctx)

    # the mesh path re-runs a couple of trials (slower: per-segment dispatch)
    rng = np.random.default_rng(1234)
    for trial in range(2):
        src, n = _fuzz_program(rng, qelib)
        ast = parse_openqasm(os.path.join(EXAMPLES, "_fuzz_tmp.qasm"), src)
        ps = run_program(ast, seed=3)
        ref = _interp_state_in_layout(ps, ["q", "r"])
        sim, mcregs, _ = CompiledProgram(ast).run_sharded(mesh=2, seed=3)
        assert str(mcregs["c"]) == str(ps.cregs["c"]), (trial, src)
        _assert_same_up_to_global_phase(sim.amplitudes(), ref, (trial, src))
