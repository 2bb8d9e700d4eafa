"""Benchmark: fused QFT wall-clock + gate-layer throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The headline target (BASELINE.json north star): 30-qubit QFT in < 2 s on a
v5e chip. The reference (qubitrot/qubism) cannot run these sizes at all
(O(4^n) per gate, practical ceiling ~13-14 qubits), so vs_baseline is
measured against the driver-set 2 s bar, scaled traffic-linearly when a
smaller n is the primary measurement.

Primary measurement: the largest n the single-buffer engine handles
reliably (n=28 on a 16 GiB v5e; every fused pass is in-place Pallas).
n=30 (state = half of HBM) runs through the virtual-shard executor; it is
attempted in an isolated subprocess and reported in ``extra`` — the current
TPU runtime intermittently exhausts resources at that occupancy, so it does
not gate the primary metric.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


# approximate HBM peak bandwidth per chip, bytes/s
PEAK_BW = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5": 819e9,
    "TPU v4": 1228e9,
    "cpu": 50e9,
}


def peak_bw(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for k, v in PEAK_BW.items():
        if kind.startswith(k):
            return v
    return 50e9


def enable_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def run_qft(n: int, reps: int) -> dict:
    """Measure a fused QFT-n: returns timing + pass statistics."""
    import gc

    enable_cache()
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    def sync(circ, st):
        x = st[0][0] if circ.v == 0 else st[0][0][0]
        return float(x[0]) if getattr(x, "shape", ()) else float(x)

    t0 = time.time()
    circ = CompiledCircuit(n, qft_prims(n))
    state = circ.init_state()
    state = circ(state)
    _ = sync(circ, state)
    build_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        state = circ(state)
    _ = sync(circ, state)
    dt = (time.time() - t0) / reps
    out = {
        "n": n,
        "seconds": dt,
        "build_first_s": build_s,
        "fused_ops": len(circ.ops),
        "virtual_shards": circ.v,
    }
    # release the state before any follow-on measurement (the n=30
    # subprocess needs most of HBM)
    del state, circ
    gc.collect()
    return out


def try_qft30_subprocess() -> dict | None:
    """Attempt QFT-30 in an isolated process (intermittent RESOURCE_EXHAUSTED
    at 8 GiB state occupancy must not poison the primary measurement)."""
    code = (
        "import json,sys; sys.path.insert(0, %r); import bench;"
        "print('RESULT:' + json.dumps(bench.run_qft(30, 1)))"
    ) % os.path.dirname(os.path.abspath(__file__))
    # the device releases a finished/crashed process's HBM with ~minutes of
    # lag; an 8 GiB run needs a clean slate
    log("cooling down before qft30 attempt...")
    time.sleep(90)
    for attempt in range(2):  # second attempt also hits the warm compile cache
        try:
            out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                                 text=True, timeout=1500)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT:"):
                    return json.loads(line[len("RESULT:"):])
            log(f"qft30 subprocess attempt {attempt} no result (rc={out.returncode}): "
                f"{out.stderr[-400:]}")
        except Exception as e:
            log(f"qft30 subprocess attempt {attempt} failed: {e}")
        time.sleep(150)
    return None


def main():
    import jax

    enable_cache()
    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")
    primary_n = 28 if on_tpu else 20
    log(f"device: {dev} ({getattr(dev, 'device_kind', '?')}), primary n={primary_n}")

    res = None
    n = primary_n
    while n >= 16:
        try:
            res = run_qft(n, reps=3 if n >= 26 else 5)
            break
        except Exception as e:
            log(f"n={n} failed: {type(e).__name__}: {str(e)[:200]}")
            n -= 2
    if res is None:
        print(json.dumps({"metric": "qft_wallclock", "value": -1, "unit": "s",
                          "vs_baseline": 0.0}))
        return

    dt, n = res["seconds"], res["n"]
    passes = res["fused_ops"]
    bytes_per_pass = 2 * (8 * (1 << n))  # read + write both f32 planes (8B/amp)
    achieved_bw = passes * bytes_per_pass / dt
    bw_frac = achieved_bw / peak_bw(dev)
    layers_per_sec = passes / dt
    # vs_baseline: 2 s for QFT-30, scaled traffic-linearly for smaller n
    scaled = dt * (1 << (30 - n)) * (30 / n)
    vs = 2.0 / scaled if scaled > 0 else 0.0

    extra = {
        "n_qubits": n,
        "fused_passes": passes,
        "fused_layers_per_sec": round(layers_per_sec, 2),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "hbm_fraction_of_peak": round(bw_frac, 3),
        "scaled_qft30_s": round(scaled, 4),
        "device": str(getattr(dev, "device_kind", dev.platform)),
    }
    if on_tpu and n == primary_n:
        q30 = try_qft30_subprocess()
        if q30:
            extra["qft30_actual_s"] = round(q30["seconds"], 3)
            extra["qft30_virtual_shards"] = q30["virtual_shards"]
        else:
            extra["qft30_actual_s"] = None

    log(f"qft{n}: {dt * 1e3:.1f} ms/run, {layers_per_sec:.1f} fused layers/s, "
        f"{achieved_bw / 1e9:.0f} GB/s ({bw_frac * 100:.0f}% of peak), "
        f"scaled-to-30q {scaled:.3f}s vs 2s bar; qft30 actual: "
        f"{extra.get('qft30_actual_s')}")

    print(json.dumps({
        "metric": f"qft{n}_wallclock",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
