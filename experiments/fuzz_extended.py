"""Extended differential fuzz: many more random programs than CI runs.

Reuses tests/test_compiler.py's generator + oracles to hammer the
interpreter / compiled / virtual-shard / mesh paths with hundreds of
random multi-register programs (user gates, reset, mid-circuit
measurement, feed-forward). Run on CPU:

    python experiments/fuzz_extended.py [trials] [base_seed]

Prints one line per 10 trials; exits nonzero on the first divergence
with the offending program source.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "test_compiler", os.path.join(REPO, "tests", "test_compiler.py"))
tc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tc)


def main(trials: int, base_seed: int) -> int:
    import numpy as np

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.compiler import CompiledProgram
    from qubism_tpu.run.interpreter import run_program
    from qubism_tpu.ops.fusion import state_to_complex_virtual

    rng = np.random.default_rng(base_seed)
    qelib = os.path.join(REPO, "examples", "qelib1.inc")
    for trial in range(trials):
        src, n = tc._fuzz_program(rng, qelib)
        ast = parse_openqasm("<fuzz>", src)
        for seed in (0, 7):
            ctx = (trial, seed, src)
            ps = run_program(ast, seed=seed)
            ref = tc._interp_state_in_layout(ps, ["q", "r"])
            creg_ref = str(ps.cregs["c"])

            prog = CompiledProgram(ast)
            state, cregs, _ = prog.run(seed=seed)
            assert str(cregs["c"]) == creg_ref, ctx
            tc._assert_same_up_to_global_phase(
                tc.complex_from_planar(state), ref, ctx)

            vprog = CompiledProgram(ast, virtual_shards=1)
            vstate, vcregs, _ = vprog.run(seed=seed)
            assert str(vcregs["c"]) == creg_ref, ctx
            tc._assert_same_up_to_global_phase(
                state_to_complex_virtual(vstate, vprog.v), ref, ctx)
        if trial % 4 == 0:  # mesh path every few trials (slow)
            ps = run_program(ast, seed=3)
            ref = tc._interp_state_in_layout(ps, ["q", "r"])
            sim, mcregs, _ = CompiledProgram(ast).run_sharded(mesh=2, seed=3)
            assert str(mcregs["c"]) == str(ps.cregs["c"]), (trial, src)
            tc._assert_same_up_to_global_phase(
                sim.amplitudes(), ref, (trial, src))
        if trial % 10 == 9:
            print(f"{trial + 1}/{trials} ok", flush=True)
    print(f"PASS: {trials} trials, no divergence", flush=True)
    return 0


if __name__ == "__main__":
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 20260818
    sys.exit(main(t, s))
