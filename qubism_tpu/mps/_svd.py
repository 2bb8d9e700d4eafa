"""Split-real one-sided Jacobi SVD (device-side, no complex dtypes).

The MPS engine needs small complex SVDs (truncation at the orthogonality
center, canonical-form shifts) ON DEVICE — but this TPU runtime implements
no complex ops at all (even ``conj`` of a complex64 array is
UNIMPLEMENTED; the dense engine's split-plane convention exists for the
same reason, see ops/apply.py module docstring), and XLA's qr/svd custom
calls for complex inputs lower through complex primitives. So the engine
carries its own decomposition: a one-sided complex Jacobi SVD expressed
entirely in float32 (re, im) plane arithmetic — elementwise VPU math plus
tiny gathers, nothing the backend can refuse.

One-sided Jacobi (Hestenes) orthogonalizes the columns of ``W = M`` by
right-multiplying complex Givens rotations chosen to zero the Gram entry
``w_i^H w_j`` of one pair at a time; the same rotations accumulate into
``V``, so on convergence ``M = W V^H = U diag(s) V^H`` with ``u_k =
w_k / ||w_k||``. Pairs are swept in the round-robin "circle method"
order: each round rotates d/2 DISJOINT pairs, so a whole round is one
vectorized update of gathered column blocks (no sequential per-pair
loop), and a sweep of d-1 rounds touches every pair once. Convergence is
quadratic; 10 sweeps reach float32 machine precision at d = 128
(validated against LAPACK in tests/test_mps.py).

Jacobi is also the *accurate* choice: one-sided rotations preserve small
singular values to high relative accuracy (Demmel & Veselic, SIMAX 1992),
which is what a truncating MPS wants from its Schmidt spectrum.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["jacobi_svd"]

#: Rotations stop when |c|^2 <= _EPS2 * a * b (float32 convergence).
_EPS2 = 1e-14

_TINY = 1e-30


@functools.lru_cache(maxsize=None)
def _rr_schedule(d: int) -> np.ndarray:
    """Round-robin pairing of ``d`` columns (d even): (d-1, 2, d//2)
    int32 — round r rotates pairs (sch[r,0,k], sch[r,1,k]), all disjoint."""
    arr = list(range(d))
    rounds = []
    for _ in range(d - 1):
        rounds.append(([arr[k] for k in range(d // 2)],
                       [arr[d - 1 - k] for k in range(d // 2)]))
        arr = [arr[0]] + [arr[-1]] + arr[1:-1]
    return np.asarray(rounds, dtype=np.int32)


def _sweeps_for(d: int) -> int:
    return 10 if d <= 128 else 12


def jacobi_svd(mr, mi, sweeps: int | None = None,
               early_exit: bool = True):
    """SVD of the complex matrix ``mr + i mi`` (shape (m, d), m >= 1).

    Returns ``(ur, ui, s, vr, vi)`` with ``M = U diag(s) V^H``, ``s``
    sorted descending, U (m, d), V (d, d). Columns of U whose singular
    value is (numerically) zero come out as zero columns — callers that
    absorb ``diag(s) V^H`` into a neighbor are exact regardless. Traced
    code: call inside jit; all shapes static.
    """
    m, d = mr.shape
    pad = d % 2
    if pad:
        mr = jnp.pad(mr, ((0, 0), (0, 1)))
        mi = jnp.pad(mi, ((0, 0), (0, 1)))
    dp = d + pad
    if sweeps is None:
        sweeps = _sweeps_for(dp)
    sch = jnp.asarray(_rr_schedule(dp))          # (R, 2, p)
    rounds = dp - 1

    wr, wi = mr.astype(jnp.float32), mi.astype(jnp.float32)
    vr = jnp.eye(dp, dtype=jnp.float32)
    vi = jnp.zeros((dp, dp), dtype=jnp.float32)

    def body(carry):
        wr, wi, vr, vi, r, since = carry
        idx = sch[r % rounds]
        ii, jj = idx[0], idx[1]                  # (p,) each, disjoint
        wri, wii = wr[:, ii], wi[:, ii]
        wrj, wij = wr[:, jj], wi[:, jj]
        a = jnp.sum(wri * wri + wii * wii, axis=0)
        b = jnp.sum(wrj * wrj + wij * wij, axis=0)
        cr = jnp.sum(wri * wrj + wii * wij, axis=0)   # c = w_i^H w_j
        ci = jnp.sum(wri * wij - wii * wrj, axis=0)
        ac2 = cr * cr + ci * ci
        rot = ac2 > (_EPS2 * a * b + _TINY)
        ac = jnp.sqrt(jnp.maximum(ac2, _TINY))
        phr = jnp.where(rot, cr / ac, 1.0)            # ph = c / |c|
        phi = jnp.where(rot, ci / ac, 0.0)
        tau = (b - a) / (2.0 * ac)
        t = jnp.where(tau >= 0, 1.0, -1.0) / (
            jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        cs = lax.rsqrt(1.0 + t * t)
        sn = t * cs
        cs = jnp.where(rot, cs, 1.0)
        sn = jnp.where(rot, sn, 0.0)

        def rotate(xr_i, xi_i, xr_j, xi_j):
            # col_i' = cs*col_i - sn*conj(ph)*col_j
            # col_j' = sn*ph*col_i + cs*col_j
            nr_i = cs * xr_i - sn * (phr * xr_j + phi * xi_j)
            ni_i = cs * xi_i - sn * (phr * xi_j - phi * xr_j)
            nr_j = sn * (phr * xr_i - phi * xi_i) + cs * xr_j
            ni_j = sn * (phr * xi_i + phi * xr_i) + cs * xi_j
            return nr_i, ni_i, nr_j, ni_j

        nwri, nwii, nwrj, nwij = rotate(wri, wii, wrj, wij)
        wr = wr.at[:, ii].set(nwri).at[:, jj].set(nwrj)
        wi = wi.at[:, ii].set(nwii).at[:, jj].set(nwij)
        vri_, vii_ = vr[:, ii], vi[:, ii]
        vrj_, vij_ = vr[:, jj], vi[:, jj]
        nvri, nvii, nvrj, nvij = rotate(vri_, vii_, vrj_, vij_)
        vr = vr.at[:, ii].set(nvri).at[:, jj].set(nvrj)
        vi = vi.at[:, ii].set(nvii).at[:, jj].set(nvij)
        # convergence bookkeeping: rounds since a rotation last fired —
        # a full rotation-free cycle of d-1 rounds means every pair's
        # Gram entry is below threshold, so the sweep loop can stop
        since = jnp.where(jnp.any(rot), jnp.int32(0), since + 1)
        return wr, wi, vr, vi, r + 1, since

    def cond(carry):
        _, _, _, _, r, since = carry
        return jnp.logical_and(r < sweeps * rounds, since < rounds)

    # early-exit while_loop instead of a fixed fori: Jacobi converges
    # quadratically, and the engine's typical inputs (low-Schmidt-rank
    # theta blocks, rank-deficient padded shifts) finish in 1-3 sweeps —
    # a fixed 10-sweep schedule made every MPS gate pay ~4x the rotations
    # it needed (measured: the r4 bench's 40q GHZ sample spent most of
    # its 2.4 s here). The fixed bound stays as the safety cap.
    # ``early_exit=False`` keeps the fixed schedule: under vmap (the
    # trajectory programs) a while_loop runs to the SLOWEST lane's trip
    # count and its per-round convergence bookkeeping is pure overhead
    # (measured 2x on the 100q noisy-trajectory bench).
    if early_exit:
        wr, wi, vr, vi, _, _ = lax.while_loop(
            cond, body, (wr, wi, vr, vi, jnp.int32(0), jnp.int32(0)))
    else:
        def fbody(_, carry):
            return body(carry)

        wr, wi, vr, vi, _, _ = lax.fori_loop(
            0, sweeps * rounds, fbody,
            (wr, wi, vr, vi, jnp.int32(0), jnp.int32(0)))

    s = jnp.sqrt(jnp.sum(wr * wr + wi * wi, axis=0))
    order = jnp.argsort(-s)
    s = s[order]
    inv = 1.0 / jnp.maximum(s, _TINY)
    ur = wr[:, order] * inv
    ui = wi[:, order] * inv
    vr, vi = vr[:, order], vi[:, order]
    if pad:
        s = s[:d]
        ur, ui = ur[:, :d], ui[:, :d]
        vr, vi = vr[:d, :d], vi[:d, :d]
    return ur, ui, s, vr, vi
