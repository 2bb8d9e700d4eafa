"""Gate application primitives.

This is the TPU-native replacement for the reference's dense-matrix engine:
the reference materializes a 2^n x 2^n matrix per gate and does a dense GEMV
(``src/Qubism/QGate.hs:79-80,148-154`` — O(4^n) per gate). Here a k-qubit
gate is an einsum contraction touching only the 2^k-dimensional target
subspace — O(2^n * 4^k) FLOPs and one read+write of the amplitude array.
XLA lowers these to fused, bandwidth-bound TPU kernels; the Pallas fast path
in :mod:`qubism_tpu.ops.kernels` goes further for the hot configurations.

Qubit-index convention (matches the reference, src/Qubism/StateVec.hs:65-67):
**big-endian** — qubit 0 is the most significant bit of the amplitude index.
Reshaping the 2^n amplitude vector to shape (2,)*n therefore puts qubit q on
axis q.
"""

from __future__ import annotations

import functools
import string

import jax
import jax.numpy as jnp

# Letters for programmatic einsum construction.
_LETTERS = string.ascii_lowercase + string.ascii_uppercase


def _segment_shape(n: int, targets: tuple[int, ...]) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Reshape dims splitting the 2^n vector around sorted target qubits.

    Returns (dims, target_axis_positions). dims is an interleaving of
    2^gap "spectator" segments with explicit 2-sized target axes, keeping
    the rank at 2k+1 instead of n (TPU dislikes very-high-rank tensors).
    """
    dims: list[int] = []
    tpos: list[int] = []
    prev = 0
    for t in targets:
        dims.append(1 << (t - prev))
        tpos.append(len(dims))
        dims.append(2)
        prev = t + 1
    dims.append(1 << (n - prev))
    return tuple(dims), tuple(tpos)


def _permute_u(u: jnp.ndarray, targets: tuple[int, ...]) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """Reorder a gate matrix from its given target order to sorted order.

    The matrix convention: row/column index bit j (MSB-first) corresponds to
    targets[j]. Sorting targets requires permuting both index groups.
    """
    k = len(targets)
    order = tuple(sorted(range(k), key=lambda j: targets[j]))
    sorted_targets = tuple(targets[j] for j in order)
    if order != tuple(range(k)):
        u = (
            u.reshape((2,) * (2 * k))
            .transpose(tuple(order) + tuple(k + j for j in order))
            .reshape(1 << k, 1 << k)
        )
    return u, sorted_targets


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_gate_impl(state: jnp.ndarray, u: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    k = len(targets)
    dims, tpos = _segment_shape(n, targets)
    st = state.reshape(dims)
    rank = len(dims)
    st_sub = list(_LETTERS[:rank])
    out_letters = _LETTERS[rank : rank + k]
    u_sub = list(out_letters)  # output bits, MSB-first over sorted targets
    out_sub = list(st_sub)
    for j, p in enumerate(tpos):
        u_sub.append(st_sub[p])  # input bit contracts with the state axis
        out_sub[p] = out_letters[j]
    spec = f"{''.join(u_sub)},{''.join(st_sub)}->{''.join(out_sub)}"
    uk = u.reshape((2,) * (2 * k)).astype(state.dtype)
    out = jnp.einsum(spec, uk, st)
    return out.reshape(-1)


def apply_gate(state: jnp.ndarray, u: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    """Apply a k-qubit unitary ``u`` (2^k x 2^k) to ``targets`` of an n-qubit state.

    ``targets`` are distinct qubit indices; targets[0] is the most
    significant bit of the gate's local index (so ``cnot`` with targets
    (c, t) uses the standard |c t> ordered matrix).
    """
    u, sorted_targets = _permute_u(jnp.asarray(u), tuple(int(t) for t in targets))
    return _apply_gate_impl(state, u, sorted_targets, n)


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_diag_impl(state: jnp.ndarray, d: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    k = len(targets)
    dims, tpos = _segment_shape(n, targets)
    bshape = [1] * len(dims)
    for p in tpos:
        bshape[p] = 2
    st = state.reshape(dims)
    out = st * d.reshape((2,) * k).reshape(bshape).astype(state.dtype)
    return out.reshape(-1)


def apply_diag(state: jnp.ndarray, d: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    """Apply a diagonal k-qubit gate given as its 2^k diagonal ``d``."""
    k = len(targets)
    tgts = tuple(int(t) for t in targets)
    order = tuple(sorted(range(k), key=lambda j: tgts[j]))
    d = jnp.asarray(d)
    if order != tuple(range(k)):
        d = d.reshape((2,) * k).transpose(order).reshape(-1)
    return _apply_diag_impl(state, d, tuple(sorted(tgts)), n)


def tensor(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Kronecker/tensor product of two amplitude vectors (a ⊗ b).

    Mirrors reference ``tensor`` (src/Qubism/StateVec.hs:98-100): the first
    operand's qubits become the most significant index bits.
    """
    return jnp.outer(a, b).reshape(-1)


@jax.jit
def normalize(state: jnp.ndarray) -> jnp.ndarray:
    nrm = jnp.linalg.norm(state)
    return state / jnp.where(nrm == 0, 1, nrm).astype(state.dtype)
