"""Benchmark: fused QFT wall-clock + gate-layer throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The headline target (BASELINE.json north star): 30-qubit QFT in < 2 s on a
v5e chip, with fused gate layers at >= 90% of HBM speed-of-light. The
reference (qubitrot/qubism) cannot run this size at all (O(4^n) per gate,
practical ceiling ~13-14 qubits), so vs_baseline is measured against the
driver-set 2 s bar, scaled traffic-linearly when a smaller n is used.
"""

from __future__ import annotations

import json
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
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    import jax

    enable_cache()

    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")
    target_n = 30 if on_tpu else 20
    log(f"device: {dev} ({getattr(dev, 'device_kind', '?')}), target n={target_n}")

    def sync(circ, st):
        x = st[0][0] if circ.v == 0 else st[0][0][0]
        return float(x[0]) if getattr(x, "shape", ()) else float(x)

    def attempt(n):
        t0 = time.time()
        circ = CompiledCircuit(n, qft_prims(n))
        state = circ.init_state()
        log(f"n={n}: {len(qft_prims(n))} prims fused into {circ.num_passes} passes "
            f"(v={circ.v} on-chip shards); state alloc ok ({time.time() - t0:.1f}s)")
        t0 = time.time()
        state = circ(state)  # compile + warmup
        _ = sync(circ, state)
        log(f"n={n}: compile+first-run {time.time() - t0:.1f}s")
        return circ, state

    state = circ = None
    n = target_n
    while n >= 16:
        failed = False
        try:
            circ, state = attempt(n)
        except Exception as e:  # OOM or backend limits: shrink
            log(f"n={n} failed: {type(e).__name__}: {str(e)[:200]}")
            failed = True
            state = circ = None
        if not failed:
            break
        # exception context is gone here; drop pinned device buffers
        import gc

        gc.collect()
        time.sleep(2)
        n -= 2
    if state is None:
        print(json.dumps({"metric": "qft_wallclock", "value": -1, "unit": "s",
                          "vs_baseline": 0.0}))
        return

    reps = 3 if n >= 28 else 5
    t0 = time.time()
    for _ in range(reps):
        state = circ(state)
    # forced scalar readback: block_until_ready through remote-execution
    # tunnels has been observed to return before the work is done
    _ = sync(circ, state)
    dt = (time.time() - t0) / reps

    passes = circ.num_passes
    bytes_per_pass = 2 * (8 * (1 << n))  # read + write both f32 planes (8B/amp)
    achieved_bw = passes * bytes_per_pass / dt
    bw_frac = achieved_bw / peak_bw(dev)
    layers_per_sec = passes / dt

    # vs_baseline: 2 s for QFT-30, scaled traffic-linearly for smaller n
    scaled = dt * (1 << (30 - n)) * (30 / n)
    vs = 2.0 / scaled if scaled > 0 else 0.0

    log(f"qft{n}: {dt * 1e3:.1f} ms/run, {layers_per_sec:.1f} fused layers/s, "
        f"{achieved_bw / 1e9:.0f} GB/s ({bw_frac * 100:.0f}% of peak), "
        f"scaled-to-30q {scaled:.3f}s vs 2s bar")

    print(json.dumps({
        "metric": f"qft{n}_wallclock",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "n_qubits": n,
            "fused_passes": passes,
            "fused_layers_per_sec": round(layers_per_sec, 2),
            "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
            "hbm_fraction_of_peak": round(bw_frac, 3),
            "scaled_qft30_s": round(scaled, 4),
            "device": str(getattr(dev, "device_kind", dev.platform)),
        },
    }))


if __name__ == "__main__":
    main()
