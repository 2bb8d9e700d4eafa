"""Compare n=30 workloads: virtual-shard single-chip path vs mesh=1 with
banks. Whichever wins becomes bench.py's n=30 engine."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def enable_cache():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    enable_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "mesh"
    n = 30
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim

    prims = qft_prims(n)
    if which == "mesh":
        sim = ShardedSim(n, make_mesh(1))
        print("w =", sim.w, "m =", sim.m)
        t0 = time.perf_counter()
        sim.apply(prims)
        float(sim.banks[0][0][0, 0])
        print(f"first: {time.perf_counter()-t0:.3f}s dispatches={sim.dispatch_count}")
        times = []
        for rep in range(3):
            sim.reset_state()
            float(sim.banks[0][0][0, 0])
            t0 = time.perf_counter()
            sim.apply(prims)
            float(sim.banks[0][0][0, 0])
            times.append(time.perf_counter() - t0)
            print(f"  rep{rep}: {times[-1]:.3f}s")
        print(f"qft30_mesh1_s: {min(times):.3f}")
    else:
        from qubism_tpu.ops.fusion import CompiledCircuit

        t0 = time.perf_counter()
        circ = CompiledCircuit(n, prims)
        state = circ(circ.init_state())
        x = state[0] if circ.v == 0 else state[0][0]
        float(x[0, 0])
        print(f"first: {time.perf_counter()-t0:.3f}s v={circ.v}")
        times = []
        for rep in range(3):
            del state
            import gc; gc.collect()
            state = circ.init_state()
            t0 = time.perf_counter()
            state = circ(state)
            x = state[0] if circ.v == 0 else state[0][0]
            float(x[0, 0])
            times.append(time.perf_counter() - t0)
            print(f"  rep{rep}: {times[-1]:.3f}s")
        print(f"qft30_virtual_s: {min(times):.3f}")


if __name__ == "__main__":
    main()
