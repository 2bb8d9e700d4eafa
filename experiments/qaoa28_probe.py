import time, os
import numpy as np
import jax
print("devices:", jax.devices())
from qubism_tpu.models.variational import (adjoint_value_and_grad_fn,
                                           qaoa_maxcut_ansatz, maxcut_terms)
nq, p = 28, 2
edges = [(i, (i + 1) % nq) for i in range(nq)]
ans = qaoa_maxcut_ansatz(nq, edges, p)
terms, const = maxcut_terms(nq, edges)
neg = [(-c, s) for c, s in terms]
vg = adjoint_value_and_grad_fn(ans, neg, constant=-const, segment_size=16)
print("engine:", getattr(vg, "_engine", "xla"))
theta = np.full(2 * p, 0.25, dtype=np.float32)
t0 = time.time()
e, g = vg(theta)
g = np.asarray(g)
print(f"cold (compile+run): {time.time()-t0:.1f}s  e={float(e):.6f}")
t0 = time.time()
e, g2 = vg(theta); g2 = np.asarray(g2)
print(f"warm: {time.time()-t0:.3f}s")
eps = 1e-3
tp = theta.copy(); tp[0] += eps
tm = theta.copy(); tm[0] -= eps
ep, _ = vg(tp); em, _ = vg(tm)
fd = (float(ep) - float(em)) / (2 * eps)
print(f"g[0]={g2[0]:.6f} fd={fd:.6f} diff={abs(g2[0]-fd):.2e}")
print("grad_ok:", bool(np.isfinite(g2).all() and abs(g2[0]-fd) < 1e-2 and np.abs(g2-g).max() < 1e-5))
