"""Reduced density matrices and entanglement entropies of pure states.

rho_A = Tr_B |psi><psi| for a qubit subset A, computed TPU-natively:

1. bring A's qubits to the front with a SWAP network (each swap is one
   lane-safe flip-accumulate pass through the standard appliers — a
   rank-n transpose would violate the TPU layout rules, see
   ops/apply.py);
2. view the state as a (2^k, 2^{n-k}) matrix and form
   rho_A = X X^dag with four real MXU matmuls.

The eigen-decomposition for the von Neumann entropy runs host-side on
the (2^k, 2^k) result (k <= 12 enforced). The reference has no reduced
-state machinery at all (pure dense states only, src/Qubism/StateVec.hs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import apply as A

_SWAP = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                  [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.complex128)


def _front_perm_swaps(n: int, subset: tuple[int, ...]):
    """Transpositions bringing ``subset`` (in order) to qubits 0..k-1."""
    pos = list(range(n))          # pos[q] = current position of qubit q
    at = list(range(n))           # at[p]  = qubit currently at position p
    swaps = []
    for i, q in enumerate(subset):
        p = pos[q]
        if p != i:
            swaps.append((i, p))
            other = at[i]
            at[i], at[p] = q, other
            pos[q], pos[other] = i, p
    return swaps


@functools.lru_cache(maxsize=None)
def _rdm_fn(n: int, subset: tuple[int, ...]):
    k = len(subset)
    swaps = _front_perm_swaps(n, subset)

    def fn(planes):
        for a, b in swaps:
            planes = A.apply_gate_traced(planes, _SWAP,
                                         (min(a, b), max(a, b)), n)
        xr = planes[0].reshape(1 << k, -1)
        xi = planes[1].reshape(1 << k, -1)
        hi = jax.lax.Precision.HIGHEST
        re = (jnp.matmul(xr, xr.T, precision=hi)
              + jnp.matmul(xi, xi.T, precision=hi))
        im = (jnp.matmul(xi, xr.T, precision=hi)
              - jnp.matmul(xr, xi.T, precision=hi))
        return re, im

    return jax.jit(fn)


def reduced_density_matrix(planes, n: int, subset) -> np.ndarray:
    """Host-side complex (2^k, 2^k) rho_A for qubit subset A (the given
    order defines the row/column bit order; qubit subset[0] = MSB)."""
    subset = tuple(int(q) for q in subset)
    if len(set(subset)) != len(subset):
        raise ValueError("subset has duplicate qubits")
    if any(q < 0 or q >= n for q in subset):
        raise ValueError(f"subset out of range for n={n}: {subset}")
    if len(subset) > 12:
        raise ValueError("rho_A materializes 4^k entries; k > 12 refused")
    flat = (planes[0].reshape(-1), planes[1].reshape(-1))
    re, im = _rdm_fn(n, subset)(flat)
    return (np.asarray(jax.device_get(re), dtype=np.float64)
            + 1j * np.asarray(jax.device_get(im), dtype=np.float64))


def entanglement_entropy(planes, n: int, subset, base: float | None = None) -> float:
    """Von Neumann entropy S(rho_A) = -Tr(rho_A ln rho_A) in nats
    (``base=2`` for bits)."""
    rho = reduced_density_matrix(planes, n, subset)
    w = np.linalg.eigvalsh(rho)
    w = w[w > 1e-12]
    s = float(-(w * np.log(w)).sum())
    return s / np.log(base) if base else s


def renyi2_entropy(planes, n: int, subset, base: float | None = None) -> float:
    """Renyi-2 entropy -ln Tr(rho_A^2)."""
    rho = reduced_density_matrix(planes, n, subset)
    s = float(-np.log(max(np.real(np.trace(rho @ rho)), 1e-300)))
    return s / np.log(base) if base else s
