"""Real-chip validation of the mesh path (VERDICT r2 item 2): a --mesh 1
run must execute the SAME Pallas kernel plans as the single-chip engine
and match its throughput. Run on the axon TPU:

    python experiments/mesh_tpu_check.py [n]

Prints correctness vs the compiled path at n=16 and wall-clock for a
QFT-n steady-state run through ShardedSim(mesh=1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def enable_cache():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    enable_cache()
    n_perf = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    mesh = make_mesh(1)

    # correctness: mesh=1 vs compiled at n=16
    n = 16
    sim = ShardedSim(n, mesh)
    sim.apply(qft_prims(n))
    float(sim.banks[0][0][0, 0])
    circ = CompiledCircuit(n, qft_prims(n))
    ref = circ.state_to_complex(circ(circ.init_state()))
    got = sim.amplitudes()
    err = float(np.linalg.norm(got - ref))
    print(f"qft16 mesh-vs-compiled err: {err:.2e}")
    assert err < 1e-4, err

    # throughput: QFT-n steady state (3 reps)
    times = []
    for rep in range(3):
        sim = ShardedSim(n_perf, mesh)
        float(sim.banks[0][0][0, 0])
        t0 = time.perf_counter()
        sim.apply(qft_prims(n_perf))
        float(sim.banks[0][0][0, 0])
        times.append(time.perf_counter() - t0)
        print(f"  qft{n_perf} rep{rep}: {times[-1]:.3f}s  dispatches={sim.dispatch_count}")
    print(f"qft{n_perf}_mesh1_s: {min(times):.3f}")


if __name__ == "__main__":
    main()
