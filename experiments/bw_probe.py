"""HBM bandwidth probe: what does one fused pass over the state actually
sustain, and which block shape / compiler knobs move it?

Measures, at n qubits (default 28, planes = 2 x 1 GiB f32):
  - XLA elementwise phase-multiply (the compiler's own ceiling)
  - Pallas copy kernel (pure DMA ceiling, no compute)
  - Pallas phase-multiply at several (BR, C) block shapes,
    with/without dimension_semantics=("arbitrary",)

Timing: K passes chained inside ONE jit (donated, aliased), scalar readback
to force completion (block_until_ready returns early through the tunnel).

Usage: python experiments/bw_probe.py [n] [variant ...]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def enable_cache():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


N_DEFAULT = 28
K = 16  # passes chained per jit call
C1, C2 = np.float32(0.9238795), np.float32(0.3826834)  # unit phase


def phase_xla(planes):
    r, i = planes
    return (r * C1 - i * C2, r * C2 + i * C1)


def make_pallas_phase(n: int, BR: int, C: int, arbitrary: bool, vmem_mb: int = 100):
    R = (1 << n) // C

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        xr = re_ref[...]
        xi = im_ref[...]
        ro_ref[...] = xr * C1 - xi * C2
        io_ref[...] = xr * C2 + xi * C1

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)
    params = dict(vmem_limit_bytes=vmem_mb * 2**20)
    if arbitrary:
        params["dimension_semantics"] = ("arbitrary",)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(**params),
        )(re.reshape(R, C), im.reshape(R, C))
        return (ro.reshape(-1), io.reshape(-1))

    return run


def make_pallas_copy(n: int, BR: int, C: int, vmem_mb: int = 100):
    R = (1 << n) // C

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        ro_ref[...] = re_ref[...]
        io_ref[...] = im_ref[...]

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20),
        )(re.reshape(R, C), im.reshape(R, C))
        return (ro.reshape(-1), io.reshape(-1))

    return run


def chain(fn, k=K):
    @functools.partial(jax.jit, donate_argnums=0)
    def go(planes):
        for _ in range(k):
            planes = fn(planes)
        return planes

    return go


def measure(name, fn, n, reps=3):
    N = 1 << n
    planes = (jnp.zeros(N, jnp.float32).at[0].set(1.0), jnp.zeros(N, jnp.float32))
    go = chain(fn)
    t0 = time.time()
    planes = go(planes)
    _ = float(planes[0][0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        planes = go(planes)
        _ = float(planes[0][0])
        best = min(best, time.time() - t0)
    per_pass = best / K
    gbps = 16.0 * N / per_pass / 1e9  # rd+wr both planes, 8B/amp per direction
    print(json.dumps({"variant": name, "n": n, "ms_per_pass": round(per_pass * 1e3, 2),
                      "gbps": round(gbps, 1), "frac_819": round(gbps / 819, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    del planes
    import gc
    gc.collect()


VARIANTS = {
    "xla": lambda n: phase_xla,
    "copy_128x2048": lambda n: make_pallas_copy(n, 128, 2048),
    "copy_512x8192": lambda n: make_pallas_copy(n, 512, 8192),
    "phase_128x2048": lambda n: make_pallas_phase(n, 128, 2048, False),
    "phase_128x2048_arb": lambda n: make_pallas_phase(n, 128, 2048, True),
    "phase_512x2048": lambda n: make_pallas_phase(n, 512, 2048, False),
    "phase_128x8192": lambda n: make_pallas_phase(n, 128, 8192, False),
    "phase_512x8192": lambda n: make_pallas_phase(n, 512, 8192, False),
    "phase_1024x8192": lambda n: make_pallas_phase(n, 1024, 8192, False),
    "phase_512x8192_arb": lambda n: make_pallas_phase(n, 512, 8192, True),
    "phase_2048x8192": lambda n: make_pallas_phase(n, 2048, 8192, False),
    "phase_8x131072": lambda n: make_pallas_phase(n, 8, 131072, False),
}


def make_pallas_phase_noalias(n: int, BR: int, C: int):
    R = (1 << n) // C

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        xr = re_ref[...]
        xi = im_ref[...]
        ro_ref[...] = xr * C1 - xi * C2
        io_ref[...] = xr * C2 + xi * C1

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(re.reshape(R, C), im.reshape(R, C))
        return (ro.reshape(-1), io.reshape(-1))

    return run


VARIANTS["phase_128x2048_noalias"] = lambda n: make_pallas_phase_noalias(n, 128, 2048)
VARIANTS["phase_256x4096"] = lambda n: make_pallas_phase(n, 256, 4096, False)
VARIANTS["phase_256x4096_arb"] = lambda n: make_pallas_phase(n, 256, 4096, True)


def make_pallas_read_only(n: int, BR: int, C: int):
    R = (1 << n) // C

    def kernel(re_ref, im_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += re_ref[...] + im_ref[...]

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BR, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((BR, C), jnp.float32)

    def run(planes):
        re, im = planes
        out = pl.pallas_call(
            kernel,
            out_shape=oshape,
            in_specs=[spec, spec],
            out_specs=ospec,
            grid=(R // BR,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
                dimension_semantics=("arbitrary",)),
        )(re.reshape(R, C), im.reshape(R, C))
        return (re + out[0, 0] * 0, im)

    return run


def make_pallas_write_only(n: int, BR: int, C: int):
    R = (1 << n) // C

    def kernel(seed_ref, ro_ref, io_ref):
        v = seed_ref[0, 0]
        ro_ref[...] = jnp.full((BR, C), v, jnp.float32)
        io_ref[...] = jnp.full((BR, C), v * 0.5, jnp.float32)

    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes):
        re, im = planes
        seed = (re.reshape(R, C)[:1, :1]).reshape(1, 1)
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[sspec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(seed)
        return (ro.reshape(-1), io.reshape(-1))

    return run


VARIANTS["read_only_128x2048"] = lambda n: make_pallas_read_only(n, 128, 2048)
VARIANTS["write_only_128x2048"] = lambda n: make_pallas_write_only(n, 128, 2048)


# -- stage-kernel variants ----------------------------------------------------
# the production stage kernel (ops/kernels.py:_stage_fn) views the state as
# (A, 2, B, C), A = 2^q; these prototypes probe block shapes + a flat
# (A, 2*tail) view for narrow tails.


def make_stage(n: int, q: int, BB: int, C: int):
    tail = 1 << (n - q - 1)
    C = min(C, tail)
    B = tail // C
    A = 1 << q
    BB = min(B, BB)

    spec = pl.BlockSpec((1, 2, BB, C), lambda a, j: (a, 0, j, 0),
                        memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        x0r = re_ref[0, 0, :, :]
        x1r = re_ref[0, 1, :, :]
        x0i = im_ref[0, 0, :, :]
        x1i = im_ref[0, 1, :, :]
        h = np.float32(0.70710678)
        ro_ref[0, 0, :, :] = h * (x0r + x1r)
        io_ref[0, 0, :, :] = h * (x0i + x1i)
        y1r = h * (x0r - x1r)
        y1i = h * (x0i - x1i)
        ro_ref[0, 1, :, :] = y1r * C1 - y1i * C2
        io_ref[0, 1, :, :] = y1r * C2 + y1i * C1

    dims = (A, 2, B, C)
    shape = jax.ShapeDtypeStruct(dims, jnp.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(A, B // BB),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(re.reshape(dims), im.reshape(dims), )
        return (ro.reshape(-1), io.reshape(-1))

    return run


def make_stage_flat(n: int, q: int, block_bytes: int = 1 << 21):
    """Narrow-tail stage: view (A, 2*tail); pair halves are lane slices."""
    t = 1 << (n - q - 1)
    A = 1 << q
    W = 2 * t
    BR = max(8, min(A, block_bytes // (W * 4)))
    while A % BR:
        BR //= 2

    spec = pl.BlockSpec((BR, W), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        x0r = re_ref[:, :t]
        x1r = re_ref[:, t:]
        x0i = im_ref[:, :t]
        x1i = im_ref[:, t:]
        h = np.float32(0.70710678)
        ro_ref[:, :t] = h * (x0r + x1r)
        io_ref[:, :t] = h * (x0i + x1i)
        y1r = h * (x0r - x1r)
        y1i = h * (x0i - x1i)
        ro_ref[:, t:] = y1r * C1 - y1i * C2
        io_ref[:, t:] = y1r * C2 + y1i * C1

    shape = jax.ShapeDtypeStruct((A, W), jnp.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(A // BR,),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(re.reshape(A, W), im.reshape(A, W))
        return (ro.reshape(-1), io.reshape(-1))

    return run


VARIANTS["stage_q5_bb128_c2048"] = lambda n: make_stage(n, 5, 128, 2048)
VARIANTS["stage_q5_bb512_c2048"] = lambda n: make_stage(n, 5, 512, 2048)
VARIANTS["stage_q5_bb64_c8192"] = lambda n: make_stage(n, 5, 64, 8192)
VARIANTS["stage_q20_flat"] = lambda n: make_stage_flat(n, 20)
VARIANTS["stage_q17_flat"] = lambda n: make_stage_flat(n, 17)
VARIANTS["stage_q14_flat"] = lambda n: make_stage_flat(n, 14)
VARIANTS["stage_q5_flat"] = lambda n: make_stage_flat(n, 5, 1 << 21)


def make_stage_tables(n: int, q: int, BB: int, C: int, smem_coef: bool,
                      bt_stream: bool, ct_stream: bool):
    """Production-like stage kernel with selectable table streams."""
    tail = 1 << (n - q - 1)
    C = min(C, tail)
    B = tail // C
    A = 1 << q
    BB = min(B, BB)
    Bpad = max(B, 128)

    spec = pl.BlockSpec((1, 2, BB, C), lambda a, j: (a, 0, j, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec, spec]
    if smem_coef:
        in_specs.append(pl.BlockSpec((2, 2, 2), lambda a, j: (0, 0, 0),
                                     memory_space=pltpu.SMEM))
    if bt_stream:
        if B >= 128:
            in_specs.append(pl.BlockSpec((2, 128), lambda a, j: (0, j),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((2, 128), lambda a, j: (0, 0),
                                         memory_space=pltpu.VMEM))
    if ct_stream:
        in_specs.append(pl.BlockSpec((2, C), lambda a, j: (0, 0),
                                     memory_space=pltpu.VMEM))

    def kernel(re_ref, im_ref, *refs):
        it = iter(refs)
        cf_ref = next(it) if smem_coef else None
        bt_ref = next(it) if bt_stream else None
        ct_ref = next(it) if ct_stream else None
        ro_ref, io_ref = it
        x0r = re_ref[0, 0, :, :]
        x1r = re_ref[0, 1, :, :]
        x0i = im_ref[0, 0, :, :]
        x1i = im_ref[0, 1, :, :]
        if smem_coef:
            ar, ai = cf_ref[0, 0, 0], cf_ref[1, 0, 0]
            br, bi = cf_ref[0, 0, 1], cf_ref[1, 0, 1]
            cr, ci = cf_ref[0, 1, 0], cf_ref[1, 1, 0]
            dr, di = cf_ref[0, 1, 1], cf_ref[1, 1, 1]
        else:
            h = np.float32(0.70710678)
            ar, ai, br, bi = h, np.float32(0), h, np.float32(0)
            cr, ci, dr, di = h, np.float32(0), -h, np.float32(0)
        y0r = ar * x0r - ai * x0i + br * x1r - bi * x1i
        y0i = ar * x0i + ai * x0r + br * x1i + bi * x1r
        y1r = cr * x0r - ci * x0i + dr * x1r - di * x1i
        y1i = cr * x0i + ci * x0r + dr * x1i + di * x1r
        if bt_stream:
            brr = bt_ref[0, :BB].reshape(BB, 1)
            bri = bt_ref[1, :BB].reshape(BB, 1)
        else:
            brr, bri = np.float32(1), np.float32(0)
        if ct_stream:
            ccr = ct_ref[0, :].reshape(1, C)
            cci = ct_ref[1, :].reshape(1, C)
        else:
            ccr, cci = C1, C2
        pr = brr * ccr - bri * cci
        pi = brr * cci + bri * ccr
        ro_ref[0, 0, :, :] = y0r
        io_ref[0, 0, :, :] = y0i
        ro_ref[0, 1, :, :] = y1r * pr - y1i * pi
        io_ref[0, 1, :, :] = y1r * pi + y1i * pr

    dims = (A, 2, B, C)
    shape = jax.ShapeDtypeStruct(dims, jnp.float32)
    coef = jnp.asarray(np.random.randn(2, 2, 2).astype(np.float32))
    bt = jnp.asarray(np.random.randn(2, Bpad).astype(np.float32))
    ct = jnp.asarray(np.random.randn(2, C).astype(np.float32))

    def run(planes):
        re, im = planes
        args = [re.reshape(dims), im.reshape(dims)]
        if smem_coef:
            args.append(coef)
        if bt_stream:
            args.append(bt)
        if ct_stream:
            args.append(ct)
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=in_specs,
            out_specs=(spec, spec),
            grid=(A, B // BB),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(*args)
        return (ro.reshape(-1), io.reshape(-1))

    return run


VARIANTS["stage_q5_full_tables"] = lambda n: make_stage_tables(n, 5, 128, 2048, True, True, True)
VARIANTS["stage_q5_smem_only"] = lambda n: make_stage_tables(n, 5, 128, 2048, True, False, False)
VARIANTS["stage_q5_bt_only"] = lambda n: make_stage_tables(n, 5, 128, 2048, False, True, False)
VARIANTS["stage_q5_ct_only"] = lambda n: make_stage_tables(n, 5, 128, 2048, False, False, True)


# -- canonical-layout prototypes: roll-based butterflies, in-kernel reshape ----


def make_roll_butterfly(n: int, q: int, BR: int = 128):
    """H on qubit q over canonical (R, 2048) via roll-based partner fetch.
    Covers strides < 8 rows (lane roll for s < 2048, sublane roll for
    sr in {1,2,4})."""
    C = 2048
    R = (1 << n) // C
    s = 1 << (n - 1 - q)

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, ro_ref, io_ref):
        h = np.float32(0.70710678)
        xr = re_ref[...]
        xi = im_ref[...]
        if s < C:  # lane roll
            lane = jax.lax.broadcasted_iota(jnp.int32, (BR, C), 1)
            m1 = (lane & s) > 0  # this element is the |1> branch
            pr = jnp.where(m1, pltpu.roll(xr, s, 1), pltpu.roll(xr, -s % C, 1))
            pi = jnp.where(m1, pltpu.roll(xi, s, 1), pltpu.roll(xi, -s % C, 1))
        else:  # sublane roll
            sr = s // C
            row = jax.lax.broadcasted_iota(jnp.int32, (BR, C), 0)
            m1 = (row & sr) > 0
            pr = jnp.where(m1, pltpu.roll(xr, sr, 0), pltpu.roll(xr, -sr % BR, 0))
            pi = jnp.where(m1, pltpu.roll(xi, sr, 0), pltpu.roll(xi, -sr % BR, 0))
        # y0 = h*(x0 + x1) on 0-branch; y1 = h*(x0 - x1) on 1-branch
        # x0 = where(m1, partner, x); x1 = where(m1, x, partner)
        yr = jnp.where(m1, h * (pr - xr), h * (xr + pr))
        yi = jnp.where(m1, h * (pi - xi), h * (xi + pi))
        ro_ref[...] = yr
        io_ref[...] = yi

    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(re, im)
        return (ro, io)

    return run, (R, C)


def make_lane_matmul_canonical(n: int, BR: int = 128):
    """128x128 lane matmul on canonical (R, 2048) blocks via in-kernel
    value reshape (BR,2048)->(BR*16,128)->dot->back."""
    C = 2048
    R = (1 << n) // C

    spec = pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, mr_ref, mi_ref, ro_ref, io_ref):
        hi = jax.lax.Precision.HIGHEST
        xr = re_ref[...].reshape(BR * 16, 128)
        xi = im_ref[...].reshape(BR * 16, 128)
        mr = mr_ref[...]
        mi = mi_ref[...]
        rr = jnp.dot(xr, mr, precision=hi, preferred_element_type=jnp.float32)
        ii = jnp.dot(xi, mi, precision=hi, preferred_element_type=jnp.float32)
        ri = jnp.dot(xr, mi, precision=hi, preferred_element_type=jnp.float32)
        ir = jnp.dot(xi, mr, precision=hi, preferred_element_type=jnp.float32)
        ro_ref[...] = (rr - ii).reshape(BR, C)
        io_ref[...] = (ri + ir).reshape(BR, C)

    shape = jax.ShapeDtypeStruct((R, C), jnp.float32)
    M = np.eye(128, dtype=np.float32)

    def run(planes):
        re, im = planes
        ro, io = pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[spec, spec, mspec, mspec],
            out_specs=(spec, spec),
            grid=(R // BR,),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(re, im, jnp.asarray(M), jnp.asarray(M * 0.5))
        return (ro, io)

    return run, (R, C)


def _measure_canon(name, mk, n, reps=3):
    fn, (R, C) = mk
    planes = (jnp.zeros((R, C), jnp.float32).at[0, 0].set(1.0),
              jnp.zeros((R, C), jnp.float32))
    go = chain(fn)
    t0 = time.time()
    planes = go(planes)
    _ = float(planes[0][0, 0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        planes = go(planes)
        _ = float(planes[0][0, 0])
        best = min(best, time.time() - t0)
    per_pass = best / K
    gbps = 16.0 * (1 << n) / per_pass / 1e9
    print(json.dumps({"variant": name, "n": n, "ms_per_pass": round(per_pass * 1e3, 2),
                      "gbps": round(gbps, 1), "compile_s": round(compile_s, 1)}),
          flush=True)


def main_canon():
    enable_cache()
    n = 28
    print(f"device: {jax.devices()[0]}, n={n}", file=sys.stderr, flush=True)
    def phase2d(n):
        C = 2048
        R = (1 << n) // C
        spec = pl.BlockSpec((128, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((R, C), jnp.float32)

        def kernel(re_ref, im_ref, ro_ref, io_ref):
            xr = re_ref[...]
            xi = im_ref[...]
            ro_ref[...] = xr * C1 - xi * C2
            io_ref[...] = xr * C2 + xi * C1

        def run(planes):
            re, im = planes
            return pl.pallas_call(
                kernel, out_shape=(shape, shape), in_specs=[spec, spec],
                out_specs=(spec, spec), grid=(R // 128,),
                input_output_aliases={0: 0, 1: 1},
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            )(re, im)

        return run, (R, C)

    for name, mk in [
        ("canon_phase_2d", phase2d(n)),
        ("roll_lane_s512", make_roll_butterfly(n, n - 1 - 9)),
        ("roll_row_sr2", make_roll_butterfly(n, n - 1 - 12)),
        ("lane_matmul_canon", make_lane_matmul_canonical(n)),
    ]:
        try:
            _measure_canon(name, mk, n)
        except Exception as e:
            print(json.dumps({"variant": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)

if __name__ == "__main__":
    if "canon" in sys.argv:
        main_canon()
    else:
        main()
