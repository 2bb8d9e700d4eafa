"""Benchmark: BASELINE.md's quantitative bars on one v5e chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}

Bars (BASELINE.md):
  * 30-qubit QFT < 2 s                      -> qft30_wallclock (the metric)
  * >= 90% of HBM speed-of-light per layer  -> hbm_fraction_of_peak (extra)
  * 30-34q brickwork/GHZ 8192-shot sampling -> ghz30/brickwork30 (extra)
  * widened Cuccaro adder                   -> adder_28q (extra)

n=31+ needs more than one chip's HBM (dense 2^n amplitudes); the multi-chip
path is exercised by tests/test_sharded.py and the driver's multichip dryrun
on a virtual mesh. The n=30 family runs in ONE subprocess on a cold device
(the state is half of HBM; a previous process's buffers release with lag).
"""

from __future__ import annotations

import gc
import json
import math
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


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

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _sync(state):
    x = state[0] if not isinstance(state[0], (tuple, list)) else state[0][0]
    while getattr(x, "ndim", 0) > 0:
        x = x[0]
    return float(x)


def run_qft(n: int, reps: int) -> dict:
    """Fused QFT-n wall-clock + pass statistics."""
    enable_cache()
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.ops.fusion import CompiledCircuit

    t0 = time.time()
    circ = CompiledCircuit(n, qft_prims(n))
    state = circ.init_state()
    state = circ(state)
    _sync(state)
    build_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        state = circ(state)
    _sync(state)
    dt = (time.time() - t0) / reps
    out = {
        "n": n,
        "seconds": dt,
        "build_first_s": build_s,
        "fused_ops": len(circ.ops),
        "virtual_shards": circ.v,
    }
    del state, circ
    gc.collect()
    return out


def run_sampled(kind: str, n: int, shots: int, depth: int = 4) -> dict:
    """Build + run a circuit family and draw ``shots`` samples.
    GHZ counts double as a Born-rule check at scale."""
    import jax

    enable_cache()
    from qubism_tpu.models.circuits import brickwork_prims, ghz_prims
    from qubism_tpu.ops.fusion import CompiledCircuit
    from qubism_tpu.ops.sample import sample_indices_np, sample_indices_sharded

    prims = ghz_prims(n) if kind == "ghz" else brickwork_prims(n, depth=depth, seed=7)
    t0 = time.time()
    circ = CompiledCircuit(n, prims)
    state = circ.init_state()
    state = circ(state)
    _sync(state)
    build_s = time.time() - t0
    # release the warm-up state BEFORE allocating the timed run's (at n=30
    # each is half of HBM — binding both at once exhausts the chip)
    del state
    gc.collect()
    t0 = time.time()
    state = circ(circ.init_state())
    _sync(state)
    run_s = time.time() - t0
    key = jax.random.PRNGKey(11)

    def draw(k):
        if circ.v:
            return sample_indices_sharded(state, n, circ.v, shots, k)
        return sample_indices_np(state, n, shots, k)

    draw(key)  # warm-up: compiles the sampler
    t0 = time.time()
    idx = draw(key)
    sample_s = time.time() - t0
    out = {
        "kind": kind,
        "n": n,
        "shots": shots,
        "run_s": run_s,
        "sample_s": sample_s,
        "build_first_s": build_s,
        "fused_ops": len(circ.ops),
        "virtual_shards": circ.v,
    }
    if kind == "ghz":
        import numpy as np

        ones = int((idx == (1 << n) - 1).sum())
        zeros = int((idx == 0).sum())
        out["ghz_counts_ok"] = bool(zeros + ones == shots
                                    and abs(zeros - shots / 2) < 4 * (shots ** 0.5))
    else:
        # large-n distribution accuracy (VERDICT r2 weak #5): chi^2 of the
        # sampled coarse 16-bin histogram vs the device-computed bin masses
        # — an end-to-end check on float32 accumulation in |psi|^2 / CDFs
        import jax
        import jax.numpy as jnp
        import numpy as np

        shards = state if circ.v else (state,)
        bins = max(1, 16 >> circ.v)

        # fused square+reduce INSIDE jit: an eager |psi|^2 would materialize
        # state-sized temporaries (at n=30 the state is half of HBM — OOM)
        @jax.jit
        def bin_masses(sh):
            r = sh[0].reshape(bins, -1)
            i = sh[1].reshape(bins, -1)
            return jnp.sum(r * r + i * i, axis=1)

        masses = [np.asarray(bin_masses(sh)) for sh in shards]
        p_bins = np.concatenate(masses).astype(np.float64)
        counts = np.bincount(np.asarray(idx) >> (n - 4), minlength=16)
        from qubism_tpu.utils.stats import chi2_test

        res = chi2_test(counts, p_bins / p_bins.sum(), alpha=1e-4)
        out["chi2_16bin"] = round(res.stat, 1)
        out["chi2_ok"] = bool(res.ok)   # inverse-CDF threshold @ alpha=1e-4
    del state, circ
    gc.collect()
    return out


def measure_plateau(n: int = 28, k: int = 16) -> float:
    """The chip's actual streaming ceiling (GB/s, combined read+write):
    k chained in-place diagonal sweeps — the purest full-state pass the
    engine has. The v5e spec sheet says 819 GB/s; this environment measures
    ~480-530 on EVERY well-formed kernel including raw copies, so per-pass
    efficiency is honest only against this number."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qubism_tpu.ops import fusion, kernels

    d = np.array([1, 1, 1, -1], dtype=np.complex128)
    fn, rt, ct = kernels.diag_layer_prepare([(d, (0, n - 1))], n)[0]
    chain = jax.jit(
        lambda p: functools.reduce(lambda q, _: fn(q, rt, ct), range(k), p),
        donate_argnums=0)
    planes = fusion.zero_state_virtual(n, 0, canonical=True)
    planes = chain(planes)
    float(planes[0][0, 0])
    t0 = time.time()
    planes = chain(planes)
    float(planes[0][0, 0])
    dt = time.time() - t0
    del planes
    gc.collect()
    return 16.0 * (1 << n) * k / dt  # bytes/s


def measure_raw_copy_plateau(n: int = 28, k: int = 16, dtype="float32") -> float:
    """ENGINE-INDEPENDENT streaming ceiling (GB/s, read+write): k chained
    donated elementwise passes over a plane pair using nothing but jnp —
    no Pallas, no engine code. Corroborates measure_plateau (the engine's
    own diag kernel): on this environment both sit at ~510-520 GB/s, far
    below the 819 GB/s v5e spec sheet, so that plateau is a property of
    the chip/runtime, not of the engine (VERDICT r2 weak #1)."""
    import jax
    import jax.numpy as jnp

    dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    shape = ((1 << n) // 2048, 2048)
    eps = jnp.asarray(1e-30 if dtype == "float32" else 1e-3, dt_)

    # ONE elementwise pass per jit CALL: chaining k adds inside one jit
    # would let XLA fuse them into a single sweep (measured: an in-jit
    # chain reported an impossible 2.2 TB/s), so each pass is a separate
    # donated dispatch; dispatch overhead is ~0.1 ms against ~8 ms/pass
    one = jax.jit(lambda p: (p[0] + eps, p[1] + eps), donate_argnums=0)
    planes = (jnp.zeros(shape, dt_), jnp.zeros(shape, dt_))
    planes = one(planes)
    float(planes[0][0, 0])
    t0 = time.time()
    for _ in range(k):
        planes = one(planes)
    float(planes[0][0, 0])
    dt = time.time() - t0
    del planes
    gc.collect()
    bytes_el = 2 if dtype == "bfloat16" else 4
    return 2.0 * 2 * bytes_el * (1 << n) * k / dt  # r+w, both planes


def run_mesh1(n: int = 28) -> dict:
    """The mesh path on ONE real chip (VERDICT r2 item 2's bar): a QFT-n
    through ShardedSim(mesh=1) must match the single-chip plateau, proving
    the per-shard Pallas kernel stream a real slice would run. Steady
    state = warm traced segments via reset_state()."""
    enable_cache()
    from qubism_tpu.models.circuits import qft_prims
    from qubism_tpu.parallel.mesh import make_mesh
    from qubism_tpu.parallel.sharded import ShardedSim

    prims = qft_prims(n)
    sim = ShardedSim(n, make_mesh(1))
    t0 = time.time()
    sim.apply(prims)
    float(sim.banks[0][0][0, 0])
    first_s = time.time() - t0
    dispatches = sim.dispatch_count  # per-run count (accumulates over reps)
    times = []
    for _ in range(3):
        sim.reset_state()
        float(sim.banks[0][0][0, 0])
        t0 = time.time()
        sim.apply(prims)
        float(sim.banks[0][0][0, 0])
        times.append(time.time() - t0)
    out = {"n": n, "seconds": min(times), "first_s": first_s,
           "dispatches": dispatches}
    del sim
    gc.collect()
    return out


def run_adder(width: int) -> dict:
    """Widened Cuccaro adder (BASELINE configs[3]) through the compiled QASM
    path, checking the classical sum."""
    enable_cache()
    from qubism_tpu.models.circuits import adder_qasm
    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.compiler import CompiledProgram

    a_val = (1 << width) - 3
    b_val = 5
    src = adder_qasm(width, a_val, b_val)
    # adder_qasm includes qelib1.inc relative to the examples dir; unique
    # name + finally so a crashed/concurrent run neither leaks nor collides
    path = os.path.join(HERE, "examples", f"adder_bench_{os.getpid()}.qasm")
    try:
        with open(path, "w") as f:
            f.write(src)
        t0 = time.time()
        ast = parse_openqasm(path, src)
        prog = CompiledProgram(ast)
        _, cregs, _ = prog.run(seed=0)
        first_s = time.time() - t0
        t0 = time.time()
        _, cregs, _ = prog.run(seed=1)  # steady state: compiles are cached
        steady_s = time.time() - t0
    finally:
        if os.path.exists(path):
            os.unlink(path)
    ok = cregs["ans"].to_natural() == a_val + b_val
    return {"width": width, "n_qubits": 2 * width + 2, "seconds": steady_s,
            "first_s": first_s, "sum_ok": bool(ok)}


def run_big(name: str) -> dict:
    """One n=30 workload (state = half of HBM), meant for a fresh process."""
    if name == "qft30":
        return run_qft(30, reps=2)
    if name == "ghz30":
        return run_sampled("ghz", 30, 8192)
    return run_sampled("brickwork", 30, 8192, depth=4)


def try_big_subprocess(name: str, retries: int = 1) -> dict:
    """Run one n=30 workload in an isolated fresh process (the device
    releases a finished/crashed process's HBM with minutes of lag, so each
    big workload gets its own cold start)."""
    code = (
        "import json,sys; sys.path.insert(0, %r); import bench;"
        "print('RESULT:' + json.dumps(bench.run_big(%r)))"
    ) % (HERE, name)
    last = ""
    for attempt in range(retries + 1):
        log(f"cooling down before {name}...")
        time.sleep(90)
        try:
            out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                                 text=True, timeout=1800)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT:"):
                    return json.loads(line[len("RESULT:"):])
            last = f"rc={out.returncode}: {out.stderr[-300:]}"
        except Exception as e:
            last = f"{type(e).__name__}: {e}"
        log(f"{name} attempt {attempt} failed: {last}")
    return {"error": last}


def main():
    # the axon relay can wedge such that backend init blocks forever
    # (zero client CPU, uninterruptible inside PJRT); probe device init
    # in a bounded SUBPROCESS first and emit ONE diagnostic JSON line
    # instead of hanging, so the driver always records something
    try:
        subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                       capture_output=True, timeout=600, check=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "qft_wallclock", "value": -1, "unit": "s",
            "vs_baseline": -1,
            "extra": {"error": f"TPU backend init probe failed: "
                               f"{type(e).__name__} (axon relay outage?)"}}))
        return

    import jax

    enable_cache()
    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")
    log(f"device: {dev} ({getattr(dev, 'device_kind', '?')})")

    extra = {"device": str(getattr(dev, "device_kind", dev.platform))}

    big = None
    if on_tpu:
        # the n=30 workloads first, each in its own cold process
        q = try_big_subprocess("qft30", retries=1)
        if "seconds" in q:
            big = q
            extra["qft30_actual_s"] = round(q["seconds"], 3)
            extra["qft30_virtual_shards"] = q["virtual_shards"]
        else:
            extra["qft30_actual_s"] = None
            extra["qft30_error"] = q.get("error")
        g = try_big_subprocess("ghz30")
        if "run_s" in g:
            extra["ghz30_8192shots_s"] = round(g["run_s"] + g["sample_s"], 3)
            extra["ghz30_counts_ok"] = g.get("ghz_counts_ok")
        else:
            extra["ghz30_error"] = g.get("error")
        bw = try_big_subprocess("brickwork30")
        if "run_s" in bw:
            extra["brickwork30_d4_8192shots_s"] = round(
                bw["run_s"] + bw["sample_s"], 3)
            extra["brickwork30_chi2_ok"] = bw.get("chi2_ok")
            extra["brickwork30_chi2_16bin"] = bw.get("chi2_16bin")
        else:
            extra["brickwork30_error"] = bw.get("error")

    # single-buffer QFT: the HBM-fraction measurement
    res = None
    n = 28 if on_tpu else 20
    while n >= 16:
        try:
            res = run_qft(n, reps=3 if n >= 26 else 5)
            break
        except Exception as e:
            log(f"n={n} failed: {type(e).__name__}: {str(e)[:200]}")
            n -= 2
    if res is None and big is None:
        # keep whatever the big-workload subprocesses did collect
        print(json.dumps({"metric": "qft_wallclock", "value": -1, "unit": "s",
                          "vs_baseline": 0.0, "extra": extra}))
        return

    if res is not None:
        dt, n = res["seconds"], res["n"]
        passes = res["fused_ops"]
        bytes_per_pass = 2 * (8 * (1 << n))  # read + write both f32 planes
        achieved_bw = passes * bytes_per_pass / dt
        extra.update({
            "qft28_s": round(dt, 4),
            "fused_passes_28": passes,
            "fused_layers_per_sec": round(passes / dt, 2),
            "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
            "hbm_fraction_of_peak": round(achieved_bw / peak_bw(dev), 3),
        })
        if on_tpu:
            try:
                plateau = measure_plateau(n)
                extra["streaming_plateau_gbps"] = round(plateau / 1e9, 1)
            except Exception as e:
                plateau = None
                log(f"plateau measurement failed: {type(e).__name__}: {str(e)[:150]}")
            try:
                raw = measure_raw_copy_plateau(n)
                extra["raw_copy_plateau_gbps"] = round(raw / 1e9, 1)
                raw16 = measure_raw_copy_plateau(n, dtype="bfloat16")
                extra["raw_copy_bf16_gbps"] = round(raw16 / 1e9, 1)
            except Exception as e:
                raw = None
                log(f"raw-copy plateau failed: {type(e).__name__}: {str(e)[:150]}")
            # honest per-pass efficiency: against the ENGINE-INDEPENDENT
            # raw-copy ceiling when available (VERDICT r2 item 4)
            base = raw or plateau
            if base:
                extra["fraction_of_plateau"] = round(achieved_bw / base, 3)

    # the mesh path on one real chip: same kernels inside shard_map must
    # match the single-chip plateau (VERDICT r2 item 2)
    if on_tpu:
        try:
            m1 = run_mesh1(28)
            extra["mesh1_qft28_s"] = round(m1["seconds"], 4)
            extra["mesh1_dispatches"] = m1["dispatches"]
        except Exception as e:
            log(f"mesh1 failed: {type(e).__name__}: {str(e)[:200]}")
            extra["mesh1_qft28_s"] = None

    # the widened adder (after the big states are gone)
    if on_tpu:
        try:
            ad = run_adder(13)  # 28 qubits total
            extra["adder_28q_s"] = round(ad["seconds"], 3)
            extra["adder_28q_sum_ok"] = ad["sum_ok"]
        except Exception as e:
            log(f"adder failed: {type(e).__name__}: {str(e)[:200]}")
            extra["adder_28q_s"] = None

    # Pauli-sum expectation at scale: a 28-term Ising-ring energy on a 28q
    # brickwork state in ONE dispatch (blocked MXU sign-table reduction —
    # the per-term path OOMs at this size)
    if on_tpu:
        try:
            from qubism_tpu.models.circuits import brickwork_prims
            from qubism_tpu.ops.fusion import CompiledCircuit
            from qubism_tpu.ops.measure import (expectation_pauli,
                                                expectation_pauli_sum)

            ne = 28
            circ = CompiledCircuit(ne, brickwork_prims(ne, depth=2, seed=3))
            state = circ(circ.init_state())
            _sync(state)
            terms = [(1.0, "".join("Z" if q in (i, (i + 1) % ne) else "I"
                                   for q in range(ne))) for i in range(ne)]
            e = expectation_pauli_sum(state, ne, terms)  # warm
            t0 = time.time()
            e = expectation_pauli_sum(state, ne, terms)
            dt = time.time() - t0
            ref2 = sum(c * expectation_pauli(state, ne, p)
                       for c, p in terms[:2])
            got2 = expectation_pauli_sum(state, ne, terms[:2])
            extra["ising28_28term_energy_s"] = round(dt, 4)
            extra["ising28_energy_ok"] = bool(abs(ref2 - got2) < 1e-4
                                              and abs(e) < ne)
            del state, circ
            gc.collect()
        except Exception as e:
            log(f"ising probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["ising28_28term_energy_s"] = None

    # differentiable-simulation throughput: one adjoint value+grad of a
    # QAOA-20 MaxCut ansatz (segmented jits; the reference has no autodiff
    # story at all, so this row has no baseline bar — it documents the
    # feature's measured speed)
    if on_tpu:
        try:
            import numpy as _np

            from qubism_tpu.models.variational import (
                adjoint_value_and_grad_fn, maxcut_terms, qaoa_maxcut_ansatz)

            nq, p = 20, 2
            edges = [(i, (i + 1) % nq) for i in range(nq)]
            ans = qaoa_maxcut_ansatz(nq, edges, p)
            terms, const = maxcut_terms(nq, edges)
            neg = [(-c, s) for c, s in terms]
            vg = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                           segment_size=40)
            theta = _np.full(2 * p, 0.25, dtype=_np.float32)
            e, g = vg(theta)
            _ = float(g[0])  # warm + barrier
            t0 = time.time()
            e, g = vg(theta)
            gs = _np.asarray(g)
            dt = time.time() - t0
            extra["qaoa20_adjoint_vg_s"] = round(dt, 3)
            extra["qaoa20_grad_finite"] = bool(_np.isfinite(gs).all()
                                               and _np.abs(gs).max() > 1e-6)
        except Exception as e:
            log(f"variational probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["qaoa20_adjoint_vg_s"] = None
        try:
            # the adjoint sweep at ENGINE scale (VERDICT r3 item 5): n=28
            # QAOA ring, constant-memory reverse sweep on 2 GiB states,
            # verified against a central finite difference on one coord
            nq, p = 28, 2
            edges = [(i, (i + 1) % nq) for i in range(nq)]
            ans = qaoa_maxcut_ansatz(nq, edges, p)
            terms, const = maxcut_terms(nq, edges)
            neg = [(-c, s) for c, s in terms]
            # auto routes to the Pallas adjoint engine at this size
            # (runtime-theta kernel operands; models/adjoint_engine.py);
            # segment_size=16 is the XLA-path fallback config, where the
            # per-op schedule barriers keep assigned HBM under the chip
            vg = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                           segment_size=16)
            theta = _np.full(2 * p, 0.25, dtype=_np.float32)
            try:
                e, g = vg(theta)
            except Exception as pe:
                log(f"qaoa28 pallas engine failed, XLA fallback: "
                    f"{type(pe).__name__}: {str(pe)[:120]}")
                vg = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                               segment_size=16, engine="xla")
                e, g = vg(theta)
            g = _np.asarray(g)
            t0 = time.time()
            e, g2 = vg(theta)
            g2 = _np.asarray(g2)
            dt = time.time() - t0
            eps = 1e-3
            tp = theta.copy(); tp[0] += eps
            tm = theta.copy(); tm[0] -= eps
            ep, _ = vg(tp)
            em, _ = vg(tm)
            fd = (float(ep) - float(em)) / (2 * eps)
            extra["qaoa28_adjoint_vg_s"] = round(dt, 3)
            extra["qaoa28_engine"] = getattr(vg, "_engine", "xla")
            extra["qaoa28_grad_ok"] = bool(
                _np.isfinite(g2).all() and abs(g2[0] - fd) < 1e-2
                and _np.abs(g2 - g).max() < 1e-5)
            del vg
            gc.collect()
        except Exception as e:
            log(f"qaoa28 probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["qaoa28_adjoint_vg_s"] = None

    # alternative-engine probes (no reference analogue / no baseline bar;
    # documents the measured speed of the Clifford + MPS regimes)
    try:
        import numpy as _np

        from qubism_tpu.core.gates import Prim
        from qubism_tpu.stabilizer import StabilizerSim

        _sh = (_np.array([[1, 1], [1, -1]]) / _np.sqrt(2)).astype(complex)
        _scx = _np.eye(4)[[0, 1, 3, 2]].astype(complex)
        n_st = 1000
        sim = StabilizerSim(n_st, seed=0).apply(
            [Prim(_sh, (0,))] + [Prim(_scx, (q, q + 1))
                                 for q in range(n_st - 1)])
        bits = sim.sample(16)  # warm (elimination + matmul compile)
        t0 = time.time()
        bits = sim.sample(8192)
        dt = time.time() - t0
        # 8192 fair-coin shots: 3 sigma = 0.0166
        ok = bool((bits == bits[:, :1]).all()
                  and abs(bits[:, 0].mean() - 0.5) < 0.0166)
        extra["stab1000q_8192shots_s"] = round(dt, 3)
        extra["stab1000q_ghz_ok"] = ok
    except Exception as e:
        log(f"stabilizer probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["stab1000q_8192shots_s"] = None
    try:
        import numpy as _np

        from qubism_tpu.core.gates import Prim
        from qubism_tpu.mps import MPSSim

        _h = _np.array([[1, 1], [1, -1]]) / _np.sqrt(2)
        _cx = _np.eye(4)[[0, 1, 3, 2]].astype(complex)
        _ghz40 = ([Prim(_h.astype(complex), (0,))]
                  + [Prim(_cx, (q, q + 1)) for q in range(39)])
        # warm: a throwaway run compiles the tape/sample jits (VERDICT r3
        # weak #3 — the old probe timed compilation, not the engine)
        MPSSim(40, chi=4, seed=0).apply(_ghz40).sample(64)
        t0 = time.time()
        msim = MPSSim(40, chi=4, seed=0).apply(_ghz40)
        bits = msim.sample(512)
        dt = time.time() - t0
        # 512 shots at p=0.5: 3 sigma = 0.0663
        ok = bool(msim.trunc_error == 0.0 and (bits == bits[:, :1]).all()
                  and abs(bits[:, 0].mean() - 0.5) < 0.0663)
        extra["mps40q_ghz_sample_s"] = round(dt, 3)
        extra["mps40q_ghz_ok"] = ok
    except Exception as e:
        log(f"mps probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["mps40q_ghz_sample_s"] = None
    try:
        # the README's claimed MPS regime, measured: a 100-qubit depth-4
        # random brickwork (nearest-neighbour CZ bricks + random SU(2)s).
        # chi=16 is EXACT here (any bipartition is crossed by <= 4 brick
        # CZs, so Schmidt rank <= 2^4), pinned by trunc_error == 0 and by
        # <Z_0> against a dense 12-qubit LIGHT-CONE oracle: gates outside
        # qubit 0's backward cone cancel in the partial trace, so the
        # truncated-circuit marginal is exact (depth 4 reaches <= 5 sites).
        import numpy as _np

        from qubism_tpu.models.circuits import brickwork_prims
        from qubism_tpu.mps import MPSSim
        from qubism_tpu.ops.apply import zero_state
        from qubism_tpu.ops.fusion import CompiledCircuit
        from qubism_tpu.ops.measure import expectation_pauli

        n_m, depth_m = 100, 4
        prims_m = brickwork_prims(n_m, depth_m, seed=5)
        K = 12
        cone = [p for p in prims_m if all(t < K for t in p.targets)]
        st = CompiledCircuit(K, cone, optimize=False)(zero_state(K))
        z0_want = expectation_pauli(st, K, "Z" + "I" * (K - 1))
        del st

        msim = MPSSim(n_m, chi=16, seed=0).apply(prims_m)  # warm
        z0 = msim.expectation("Z" + "I" * (n_m - 1))
        msim.sample(64)
        trunc = msim.trunc_error
        t0 = time.time()
        msim2 = MPSSim(n_m, chi=16, seed=0).apply(prims_m)
        bits = msim2.sample(256)
        dt = time.time() - t0
        extra["mps100q_d4_sample_s"] = round(dt, 3)
        extra["mps100q_ok"] = bool(trunc == 0.0
                                   and abs(z0 - z0_want) < 1e-4)
    except Exception as e:
        log(f"mps100 probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["mps100q_d4_sample_s"] = None
    if on_tpu:
        try:
            # 100q NOISY non-Clifford via MPS trajectories (README's
            # "50-100+ qubit noisy" claim, measured): depolarizing 0.001,
            # chi=16, 64 trajectories. Pin: the qubit-0 outcome frequency
            # must sit within 3 sigma + a noise-bias allowance of the
            # noiseless light-cone marginal (only ~17 cone sites carry
            # noise into this marginal, each shifting it O(p))
            from qubism_tpu.models.circuits import brickwork_qasm
            from qubism_tpu.mps.noise import MPSTrajectoryProgram
            from qubism_tpu.qasm.parser import parse_openqasm

            src = brickwork_qasm(n_m, depth_m, seed=5)
            fake = os.path.join(HERE, "examples", "<bench>.qasm")
            mprog = MPSTrajectoryProgram(parse_openqasm(fake, src),
                                         noise="depolarizing:0.001", chi=16)
            mprog.run_vals(64, seed=0)   # warm
            t0 = time.time()
            mbits = mprog.run_vals(64, seed=1)["c"]
            dt = time.time() - t0
            p0 = float(mbits[:, 0].mean())
            p0_want = (1.0 - float(z0_want)) / 2.0
            sigma = (p0_want * (1 - p0_want) / 64) ** 0.5
            extra["mps100q_noisy_64traj_s"] = round(dt, 3)
            extra["mps100q_noisy_p0"] = round(p0, 4)
            extra["mps100q_noisy_ok"] = bool(
                abs(p0 - p0_want) < 3 * sigma + 0.04)
        except Exception as e:
            log(f"mps100 noisy probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["mps100q_noisy_64traj_s"] = None
    try:
        # noisy trajectories: 16q GHZ + depolarizing, 512 per-shot re-runs
        # (gates, channels, measurement) as vmapped device programs
        from qubism_tpu.qasm.parser import parse_openqasm
        from qubism_tpu.run.noisy import TrajectoryProgram

        lines = ["qreg q[16]; creg c[16];",
                 "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
        lines += [f"CX q[{q}], q[{q + 1}];" for q in range(15)]
        lines += ["measure q -> c;"]
        tprog = TrajectoryProgram(parse_openqasm("<bench>", "\n".join(lines)),
                                  noise="depolarizing:0.002")
        tprog.run_vals(512, seed=0)  # warm (same-width vmap compile)
        t0 = time.time()
        bits = tprog.run_vals(512, seed=1)["c"]
        dt = time.time() - t0
        cleanmask = (bits == bits[:, :1]).all(axis=1)
        clean = cleanmask.mean()
        extra["traj16q_512shots_s"] = round(dt, 3)
        # 31 noise sites; Z errors are invisible in the Z basis, so clean
        # GHZ fraction = (1 - 2p/3)^31 = 0.9595; 3-sigma analytic window
        # at 512 shots (+0.002 slack for rare double-flip cancellations)
        p_clean = (1 - 2 * 0.002 / 3) ** 31
        sig = (p_clean * (1 - p_clean) / 512) ** 0.5
        extra["traj16q_clean_frac"] = round(float(clean), 3)
        ok = abs(float(clean) - p_clean) < 3 * sig + 0.002
        # among clean trajectories, all-zeros vs all-ones is a fair coin:
        # chi^2 with 1 dof (< 16 ~ 4-sigma-equivalent tail)
        n0 = int((cleanmask & (bits[:, 0] == 0)).sum())
        n1 = int(cleanmask.sum()) - n0
        chi2 = (n0 - n1) ** 2 / max(n0 + n1, 1)
        extra["traj16q_clean_split_chi2"] = round(chi2, 2)
        extra["traj16q_ok"] = bool(ok and chi2 < 16.0)
    except Exception as e:
        log(f"trajectory probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["traj16q_512shots_s"] = None
    if on_tpu:
        try:
            # dense MCWF at the memory edge (VERDICT r3 item 6): n=26, 256
            # trajectories. One trajectory's planes are 0.5 GiB; the vmapped
            # program's HLO temporaries measure ~4x that per trajectory, so
            # 4/dispatch (max_live_words=2^29) is the documented OOM-free
            # max on a 16 GB v5e — 8/dispatch was measured to need 17.6 GB.
            from qubism_tpu.qasm.parser import parse_openqasm
            from qubism_tpu.run.noisy import TrajectoryProgram

            n_t = 26
            lines = [f"qreg q[{n_t}]; creg c[{n_t}];",
                     "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
            lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n_t - 1)]
            lines += ["measure q -> c;"]
            t26 = TrajectoryProgram(
                parse_openqasm("<bench>", "\n".join(lines)),
                noise="depolarizing:0.002")
            # warm with the SAME batch bucket: the scan length is baked
            # into the compiled program
            t26.run_vals(256, seed=0, engine="fused")  # warm
            t0 = time.time()
            bits = t26.run_vals(256, seed=1, engine="fused")["c"]
            dt = time.time() - t0
            clean = float((bits == bits[:, :1]).all(axis=1).mean())
            # 51 sites: clean = (1 - 2p/3)^51 = 0.9343; 3 sigma at 256
            p_c = (1 - 2 * 0.002 / 3) ** 51
            sig = (p_c * (1 - p_c) / 256) ** 0.5
            extra["traj26q_fused_256shots_s"] = round(dt, 3)
            extra["traj26q_clean_frac"] = round(clean, 3)
            extra["traj26q_ok"] = bool(abs(clean - p_c) < 3 * sig + 0.002)
            # the vmapped engine at the same size, few shots (it measured
            # 4.7 s/trajectory in round 4 — the fused engine's baseline);
            # batch 4/dispatch = the documented OOM-free max on 16 GB
            # (batch 8 needs 17.6 GB of HLO temps)
            t26.run_vals(8, seed=0, max_live_words=1 << 29)  # warm
            t0 = time.time()
            t26.run_vals(8, seed=1, max_live_words=1 << 29)
            extra["traj26q_vmap_ms_per_traj"] = round(
                (time.time() - t0) / 8 * 1e3, 1)
            extra["traj26q_vmap_max_batch"] = 4
        except Exception as e:
            log(f"traj26 probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["traj26q_fused_256shots_s"] = None
        try:
            # state-dependent noise at the memory edge (VERDICT r4 item
            # 2): n=26 amplitude damping rides the fused MCWF norm-branch
            # path — previously a 1.1 s/traj vmap fallback (~5 min for
            # 256). Circuit: X on every qubit, so each qubit's outcome is
            # an EXACT independent Bernoulli(1-gamma) — a closed-form pin
            # at full scale.
            from qubism_tpu.qasm.parser import parse_openqasm
            from qubism_tpu.run.noisy import TrajectoryProgram
            from qubism_tpu.utils.stats import chi2_quantile

            n_t, g_ad, T_ad = 26, 0.05, 256
            lines = [f"qreg q[{n_t}]; creg c[{n_t}];"]
            lines += ["U(3.141592653589793, 0, 3.141592653589793) "
                      f"q[{q}];" for q in range(n_t)]
            lines += ["measure q -> c;"]
            tad = TrajectoryProgram(
                parse_openqasm("<bench>", "\n".join(lines)),
                noise=f"ad:{g_ad}")
            tad.run_vals(T_ad, seed=0, engine="fused")   # warm (same bucket)
            t0 = time.time()
            bits = tad.run_vals(T_ad, seed=1, engine="fused")["c"]
            dt = time.time() - t0
            p1 = bits.mean(axis=0)
            want = 1.0 - g_ad
            # per-qubit z-scores -> chi2 with n dof at alpha=1e-4
            z2 = ((p1 - want) ** 2 / (want * (1 - want) / T_ad)).sum()
            extra["traj26q_ad_256traj_s"] = round(dt, 3)
            extra["traj26q_ad_ok"] = bool(
                z2 < chi2_quantile(n_t, 1e-4))
        except Exception as e:
            log(f"traj26 ad probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["traj26q_ad_256traj_s"] = None
        try:
            # feed-forward + mid-circuit measurement through the FUSED
            # engine (round-5: conditionals select realized operands, a
            # measurement is one marginal sweep + one projection pass):
            # GHZ-26, measure q0 mid-circuit, conditionally flip ALL
            # qubits -> |0..0> deterministically; depolarizing noise on
            # top. Pin: with p=0.002 per gate qubit, most trajectories
            # read all-zeros, and the all-ones word (missed correction)
            # must be rare
            n_t, T_ff = 26, 256
            x_g = "U(3.141592653589793, 0, 3.141592653589793)"
            lines = [f"qreg q[{n_t}]; creg m[1]; creg c[{n_t}];",
                     "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
            lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n_t - 1)]
            lines += ["measure q[0] -> m[0];"]
            lines += [f"if (m == 1) {x_g} q[{q}];" for q in range(n_t)]
            lines += ["measure q -> c;"]
            tff = TrajectoryProgram(
                parse_openqasm("<bench>", "\n".join(lines)),
                noise="dep:0.002")
            tff.run_vals(T_ff, seed=0, engine="fused")   # warm
            t0 = time.time()
            bits = tff.run_vals(T_ff, seed=1, engine="fused")["c"]
            dt = time.time() - t0
            zero_frac = float((bits == 0).all(axis=1).mean())
            ones = float((bits == 1).all(axis=1).mean())
            extra["traj26q_ff_256traj_s"] = round(dt, 3)
            extra["traj26q_ff_zero_frac"] = round(zero_frac, 4)
            extra["traj26q_ff_ok"] = bool(zero_frac > 0.75 and ones < 0.02)
        except Exception as e:
            log(f"traj26 ff probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["traj26q_ff_256traj_s"] = None
        try:
            # mesh=1 Pallas adjoint (VERDICT r4 item 3): the sharded
            # sweep's program shapes on one real chip, pinned against the
            # single-chip engine's value+grad
            import numpy as _np
            from jax.sharding import Mesh as _Mesh

            from qubism_tpu.models.adjoint_mesh import (
                mesh_adjoint_value_and_grad_fn)
            from qubism_tpu.models.variational import (
                adjoint_value_and_grad_fn, maxcut_terms,
                qaoa_maxcut_ansatz)

            nq, p_l = 28, 2
            edges = [(i, (i + 1) % nq) for i in range(nq)]
            ans = qaoa_maxcut_ansatz(nq, edges, p_l)
            terms, const = maxcut_terms(nq, edges)
            neg = [(-c, s) for c, s in terms]
            theta = _np.full(2 * p_l, 0.25, dtype=_np.float32)
            m1 = _Mesh(_np.array(jax.devices()[:1]), ("amp",))
            vgm = mesh_adjoint_value_and_grad_fn(ans, neg, m1,
                                                 constant=-const)
            em, gm = vgm(theta)
            gm = _np.asarray(gm)
            t0 = time.time()
            em, gm2 = vgm(theta)
            gm2 = _np.asarray(gm2)
            dt = time.time() - t0
            vg1 = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                            segment_size=16)
            e1, g1 = vg1(theta)
            extra["qaoa28_mesh1_adjoint_vg_s"] = round(dt, 3)
            extra["qaoa28_mesh1_ok"] = bool(
                abs(float(em) - float(e1)) < 1e-3
                and _np.abs(gm2 - _np.asarray(g1)).max() < 1e-3)
            del vgm, vg1
            gc.collect()
        except Exception as e:
            log(f"mesh1 adjoint probe failed: {type(e).__name__}: "
                f"{str(e)[:200]}")
            extra["qaoa28_mesh1_adjoint_vg_s"] = None
        try:
            # exact Lindblad on the sharded density engine, largest
            # single-chip size (n=14; n=15+ needs a real multi-chip slice
            # — the virtual-mesh tests + dryrun cover that path): pure
            # damping from |1..1> under a diagonal Ising H, so the
            # populations obey the EXACT law <Z_q>(t) = 1 - 2 e^{-rate t}
            import numpy as _np
            from jax.sharding import Mesh as _Mesh

            from qubism_tpu.core.gates import Prim as _Prim
            from qubism_tpu.models.dynamics import lindblad_evolve
            from qubism_tpu.parallel.density import ShardedDensityMatrix

            # damping on 3 of the 14 qubits: each distinct (row, col)
            # position pair mints one shard_map compile through the
            # remote tunnel, and three sites already exercise the whole
            # localize/channel/readout machinery at the 2 GiB rho
            n_l, rate, t_l = 14, 0.8, 0.5
            damped = (0, n_l // 2, n_l - 1)
            m1 = _Mesh(_np.array(jax.devices()[:1]), ("amp",))
            xg = _np.array([[0, 1], [1, 0]], dtype=complex)
            h_terms = [(0.5, "".join("Z" if q in (i, i + 1) else "I"
                                     for q in range(n_l)))
                       for i in range(n_l - 1)]
            sm = _np.array([[0, 1], [0, 0]], dtype=complex)
            collapse = [(rate, sm, q) for q in damped]
            obs = ["".join("Z" if q == j else "I" for q in range(n_l))
                   for j in damped]

            def _lind(steps, rho):
                rho.apply([_Prim(xg, (q,)) for q in range(n_l)])
                return lindblad_evolve(rho, h_terms, collapse,
                                       t=t_l * steps / 8, steps=steps,
                                       observables=obs)

            # warm: ONE step pays every channel/segment/gather compile
            # (the r5 first run measured ~600 s of remote compiles vs
            # ~90 s of integration); the SAME object then reuses its
            # compiled programs for the timed 8-step integration
            rho = ShardedDensityMatrix(n_l, m1)
            _lind(1, rho)
            rho.sim.reset_state()
            t0 = time.time()
            rho, vals = _lind(8, rho)
            dt = time.time() - t0
            want = 1.0 - 2.0 * math.exp(-rate * t_l)
            err = max(abs(float(v) - want) for v in vals[-1])
            extra["lindblad14_mesh1_8steps_s"] = round(dt, 3)
            extra["lindblad14_ok"] = bool(
                err < 1e-3 and abs(rho.trace() - 1.0) < 1e-4)
            del rho
            gc.collect()
        except Exception as e:
            log(f"lindblad probe failed: {type(e).__name__}: {str(e)[:200]}")
            extra["lindblad14_mesh1_8steps_s"] = None
    try:
        # QEC memory on the mid-circuit frame executor (VERDICT r4 item
        # 5): a 1001-qubit distance-501 repetition code, 8 rounds, 4096
        # trajectories — one frame scan; logical rate pinned to the
        # closed-form law and the syndrome-data consistency identity
        from qubism_tpu.models.qec import repetition_memory

        # warm with the IDENTICAL shape (tape length and trajectory count
        # are baked into the compiled scan)
        repetition_memory(501, 8, 0.003, 4096, seed=0)    # warm
        t0 = time.time()
        res = repetition_memory(501, 8, 0.003, 4096, seed=1)
        dt = time.time() - t0
        sig = (res.analytic * (1 - res.analytic) / 4096) ** 0.5
        extra["qec1001q_8r_4096traj_s"] = round(dt, 3)
        extra["qec1001q_logical_rate"] = round(res.logical_rate, 5)
        # d=501 @ p=0.003 has analytic rate ~0 (that IS the point of the
        # code); the law is pinned where it is measurable, at d=5
        law = repetition_memory(5, 8, 0.05, 4096, seed=2)
        sig5 = (law.analytic * (1 - law.analytic) / 4096) ** 0.5
        extra["qec1001q_ok"] = bool(
            res.syndrome_consistent
            and abs(res.logical_rate - res.analytic) < 5 * sig + 0.003
            and law.syndrome_consistent
            and abs(law.logical_rate - law.analytic) < 5 * sig5 + 0.005)
    except Exception as e:
        log(f"qec probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["qec1001q_8r_4096traj_s"] = None
    try:
        # Pauli-frame executor: 300-qubit noisy Clifford GHZ, 8192
        # trajectories as (T, n/32)-bit frames + one affine matmul
        from qubism_tpu.qasm.parser import parse_openqasm
        from qubism_tpu.stabilizer.noise import StabilizerTrajectoryProgram

        n_f = 300
        lines = [f"qreg q[{n_f}]; creg c[{n_f}];",
                 "U(1.5707963267948966, 0, 3.141592653589793) q[0];"]
        lines += [f"CX q[{q}], q[{q + 1}];" for q in range(n_f - 1)]
        lines += ["measure q -> c;"]
        fprog = StabilizerTrajectoryProgram(
            parse_openqasm("<bench>", "\n".join(lines)),
            noise="depolarizing:0.001")
        fprog.run_vals(8192, seed=0)   # warm
        t0 = time.time()
        fbits = fprog.run_vals(8192, seed=1)["c"]
        dt = time.time() - t0
        cleanmask = (fbits == fbits[:, :1]).all(axis=1)
        clean = float(cleanmask.mean())
        extra["frames300q_8192shots_s"] = round(dt, 3)
        # 599 sites; Z errors invisible in Z basis: clean = (1-2p/3)^599
        # = 0.6706; 3-sigma analytic window at 8192 shots (+0.005 slack
        # for double-flip cancellations)
        p_c = (1 - 2 * 0.001 / 3) ** 599
        sig = (p_c * (1 - p_c) / 8192) ** 0.5
        extra["frames300q_clean_frac"] = round(clean, 4)
        ok = abs(clean - p_c) < 3 * sig + 0.005
        # clean all-zeros vs all-ones: fair-coin chi^2 (1 dof)
        n0 = int((cleanmask & (fbits[:, 0] == 0)).sum())
        n1 = int(cleanmask.sum()) - n0
        chi2 = (n0 - n1) ** 2 / max(n0 + n1, 1)
        extra["frames300q_clean_split_chi2"] = round(chi2, 2)
        extra["frames300q_ok"] = bool(fprog.used_frames and ok
                                      and chi2 < 16.0)
    except Exception as e:
        log(f"frame probe failed: {type(e).__name__}: {str(e)[:200]}")
        extra["frames300q_8192shots_s"] = None

    if extra.get("qft30_actual_s"):
        value = extra["qft30_actual_s"]
        metric = "qft30_wallclock"
        vs = 2.0 / value
    else:
        dt, n = res["seconds"], res["n"]
        scaled = dt * (1 << (30 - n)) * (30 / n)
        extra["scaled_qft30_s"] = round(scaled, 4)
        metric, value, vs = f"qft{n}_wallclock", round(dt, 4), 2.0 / scaled

    log(f"{metric}={value}s (vs_baseline {vs:.2f}); extra={extra}")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
