"""Breakdown of the mesh-path QFT-28 gap: host lowering vs operand upload
vs device execution."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np

def enable_cache():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

enable_cache()
n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
from qubism_tpu.models.circuits import qft_prims
from qubism_tpu.parallel.mesh import make_mesh
from qubism_tpu.parallel.sharded import ShardedSim

mesh = make_mesh(1)
sim = ShardedSim(n, mesh)
prims = qft_prims(n)

t0 = time.perf_counter()
chunks = sim._lower_segment(prims)
t1 = time.perf_counter()
print(f"lowering: {t1-t0:.3f}s, {len(chunks)} chunks, "
      f"passes: {[len(s[1]) for s in chunks]}")

fns = [sim._segment_fn(sig, steps) for sig, steps, _ in chunks]
t2 = time.perf_counter()
# first run (compile)
banks = sim.banks
for fn, (_, _, operands) in zip(fns, chunks):
    banks = fn(banks, tuple(operands))
float(banks[0][0][0, 0])
t3 = time.perf_counter()
print(f"compile+first run: {t3-t2:.3f}s")
# steady state: device only
for rep in range(3):
    t4 = time.perf_counter()
    for fn, (_, _, operands) in zip(fns, chunks):
        banks = fn(banks, tuple(operands))
    float(banks[0][0][0, 0])
    print(f"  device-only rep{rep}: {time.perf_counter()-t4:.3f}s")
# re-lowering cost (operand re-upload)
t5 = time.perf_counter()
chunks2 = sim._lower_segment(prims)
t6 = time.perf_counter()
print(f"re-lowering (warm planner): {t6-t5:.3f}s")
