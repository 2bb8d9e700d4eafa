"""Roofline evidence from a real device trace (VERDICT r3 weak #1 / item 3).

Captures ``jax.profiler`` traces of (a) the fused QFT-28 Pallas pass stream
and (b) an engine-independent raw ``jnp`` copy loop, then reports DEVICE-side
per-op durations — separating kernel bandwidth from dispatch/tunnel gaps that
black-box wall-clock timing conflates.

Outputs ``experiments/roofline_r04.json`` and prints a summary table.

Run on the TPU chip:  python experiments/roofline_trace.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def parse_trace(trace_dir: str):
    """Return [(op_name, duration_ms)] for device-side XLA ops in the most
    recent trace under ``trace_dir`` (the 'XLA Ops' lane of the TPU pid)."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    data = json.load(gzip.open(files[-1], "rt"))
    events = data.get("traceEvents", [])
    dev_pid = None
    op_tid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name", "")):
            dev_pid = e["pid"]
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") == dev_pid \
                and e.get("args", {}).get("name") == "XLA Ops":
            op_tid = e["tid"]
    out = []
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") == op_tid):
            out.append((e["name"], e["dur"] / 1e3))
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    n = 28
    state_bytes = 2 * 4 * (1 << n)          # two f32 planes
    pass_bytes = 2 * state_bytes            # read + write per full pass

    # -- (a) the fused QFT pass stream -------------------------------------
    circ = CompiledCircuit(n, qft_prims(n))
    state = circ(circ.init_state())
    float(state[0][0, 0])
    # unprofiled wall (the profiler itself adds host overhead)
    walls = []
    for _ in range(3):
        t0 = time.time()
        state = circ(state)
        float(state[0][0, 0])
        walls.append(time.time() - t0)
    wall_s = min(walls)
    tdir = "/tmp/qubism_trace_qft"
    with jax.profiler.trace(tdir):
        state = circ(state)
        float(state[0][0, 0])
    qft_ops = [(k, v) for k, v in parse_trace(tdir) if k.startswith("run")]
    del state, circ

    # -- (b) engine-independent raw copy ------------------------------------
    shape = ((1 << n) // 2048, 2048)
    eps = jnp.float32(1e-30)
    one = jax.jit(lambda p: (p[0] + eps, p[1] + eps), donate_argnums=0)
    planes = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    planes = one(planes)
    float(planes[0][0, 0])
    tdir2 = "/tmp/qubism_trace_copy"
    k = 12
    t0 = time.time()
    with jax.profiler.trace(tdir2):
        for _ in range(k):
            planes = one(planes)
        float(planes[0][0, 0])
    copy_wall_s = time.time() - t0
    copy_ops = [(nm, d) for nm, d in parse_trace(tdir2)
                if d > 0.5]  # the state-sized adds; skip sub-us metadata ops
    # XLA may compile the two planes' adds as separate ops — scale per-op
    # bytes by how many device ops one donated call produced
    ops_per_call = max(1, round(len(copy_ops) / k))
    copy_op_bytes = pass_bytes / ops_per_call

    def bw(ms):
        return pass_bytes / (ms / 1e3) / 1e9

    qft_device_ms = sum(d for _, d in qft_ops)
    qft_fast = sorted(d for _, d in qft_ops)[: max(1, len(qft_ops) // 2)]
    fast_ms = sum(qft_fast) / len(qft_fast)
    copy_ms = (sorted(d for _, d in copy_ops)[len(copy_ops) // 2]
               if copy_ops else float("nan"))
    copy_gbps = copy_op_bytes / (copy_ms / 1e3) / 1e9

    summary = {
        "n": n,
        "pass_bytes_gib": pass_bytes / 2**30,
        "qft_passes": len(qft_ops),
        "qft_device_total_ms": round(qft_device_ms, 2),
        "qft_wall_ms": round(wall_s * 1e3, 2),
        "dispatch_gap_ms": round(wall_s * 1e3 - qft_device_ms, 2),
        "qft_per_pass_ms": [round(d, 3) for _, d in qft_ops],
        "qft_fast_pass_ms": round(fast_ms, 3),
        "qft_fast_pass_gbps": round(bw(fast_ms), 1),
        "qft_device_avg_gbps": round(
            len(qft_ops) * pass_bytes / (qft_device_ms / 1e3) / 1e9, 1),
        "raw_copy_ops_per_call": ops_per_call,
        "raw_copy_device_ms_per_op": round(copy_ms, 3),
        "raw_copy_device_gbps": round(copy_gbps, 1),
        "raw_copy_wall_per_pass_ms": round(copy_wall_s * 1e3 / k, 3),
        "kernel_fraction_of_raw_copy": round(bw(fast_ms) / copy_gbps, 3),
        "spec_gbps": 819.0,
        "fast_pass_fraction_of_spec": round(bw(fast_ms) / 819e9 * 1e9, 3),
    }
    out_path = os.path.join(HERE, "roofline_r04.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
