"""Timing probe: adjoint-method QAOA value+grad at bench scale on the live
TPU. Run from the repo root AFTER any other TPU process has exited:

    python experiments/variational_scale.py [n] [p_layers]

Reports compile time and steady-state seconds per value_and_grad call.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qubism_tpu.cli import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,  # noqa: E402
                                           maxcut_terms, qaoa_maxcut_ansatz)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else None
    edges = [(i, (i + 1) % n) for i in range(n)]
    ans = qaoa_maxcut_ansatz(n, edges, p)
    terms, const = maxcut_terms(n, edges)
    neg = [(-c, s) for c, s in terms]
    vg = adjoint_value_and_grad_fn(ans, neg, constant=-const,
                                   segment_size=seg)
    theta = jax.numpy.asarray(np.full(2 * p, 0.25, dtype=np.float32))

    t0 = time.time()
    e, g = vg(theta)
    g0 = float(g[0])  # scalar readback: the only valid timing barrier here
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        e, g = vg(theta)
        g0 = float(g[0])
        times.append(time.time() - t0)
    print(f"n={n} p={p} gates={len(ans.ops)} cut={-float(e):.4f} g0={g0:+.4f}")
    print(f"compile+first: {compile_s:.1f}s  steady value_and_grad: "
          f"{min(times):.3f}s")


if __name__ == "__main__":
    main()
