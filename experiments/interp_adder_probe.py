"""Interpreter-mode 28q adder wall-clock (VERDICT r2 item 7: must land
within ~2x of --compile, which runs 0.30 s steady state)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def enable_cache():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    enable_cache()
    from qubism_tpu.models.circuits import adder_qasm
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.interpreter import run_program

    width = 13  # 28 qubits total
    a_val, b_val = (1 << width) - 3, 5
    src = adder_qasm(width, a_val, b_val)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "_interp_adder.qasm")
    with open(path, "w") as f:
        f.write(src)
    try:
        ast = parse_openqasm(path, src)
        t0 = time.perf_counter()
        ps = run_program(ast, seed=0)
        t1 = time.perf_counter()
        print(f"first (compiles): {t1 - t0:.2f}s")
        ok = ps.cregs["ans"].to_natural() == a_val + b_val
        print("sum_ok:", ok)
        times = []
        for rep in range(2):
            t0 = time.perf_counter()
            ps = run_program(ast, seed=rep + 1)
            times.append(time.perf_counter() - t0)
            print(f"  steady rep{rep}: {times[-1]:.2f}s")
        print(f"interp_adder28_s: {min(times):.2f}")
        assert ps.cregs["ans"].to_natural() == a_val + b_val
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
