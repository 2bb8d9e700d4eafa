"""Per-pass timing of the fused QFT: which ops are off the bandwidth plateau?

Builds CompiledCircuit(n, qft_prims(n)) with chunk_passes=1 (one jit per
fused op) and times each op separately with scalar readbacks.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import (CompiledCircuit, DiagLayer,
                                       Layer1QOp, StageBlockOp)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    circ = CompiledCircuit(n, qft_prims(n), chunk_passes=1)
    print(f"n={n} ops={len(circ.ops)} v={circ.v}", file=sys.stderr, flush=True)
    state = circ.init_state()

    def sync(st):
        x = st[0] if circ.v == 0 else st[0][0]
        while getattr(x, "ndim", 0) > 0:
            x = x[0]
        return float(x)

    # warm (compile) everything once
    state = circ(state)
    sync(state)

    reps = 3
    for idx, (fn, operands) in enumerate(circ._pallas_chunks):
        op = circ.ops[idx]
        if isinstance(op, StageBlockOp):
            desc = f"stages q={op.targets}"
        elif isinstance(op, Layer1QOp):
            desc = f"layer1q q={op.targets}"
        elif isinstance(op, DiagLayer):
            desc = f"diag factors={len(op.factors)}"
        else:
            desc = f"dense targets={op.targets}"
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            state = fn(state, operands)
            sync(state)
            best = min(best, time.time() - t0)
        gbps = 16.0 * (1 << n) / best / 1e9
        print(json.dumps({"i": idx, "op": desc, "ms": round(best * 1e3, 1),
                          "gbps": round(gbps, 1)}), flush=True)


if __name__ == "__main__":
    main()
