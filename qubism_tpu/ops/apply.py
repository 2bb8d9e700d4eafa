"""Gate application primitives.

This is the TPU-native replacement for the reference's dense-matrix engine:
the reference materializes a 2^n x 2^n matrix per gate and does a dense GEMV
(``src/Qubism/QGate.hs:79-80,148-154`` — O(4^n) per gate). Here a k-qubit
gate is an einsum contraction touching only the 2^k-dimensional target
subspace — O(2^n * 4^k) FLOPs and one read+write of the amplitude array.
XLA lowers these to fused, bandwidth-bound TPU kernels; the Pallas fast path
in :mod:`qubism_tpu.ops.kernels` goes further for the hot configurations.

**Planar amplitude layout.** Amplitudes live on device as ``float32`` of
shape ``(2, 2^n)`` — real plane then imaginary plane. Complex dtypes never
cross the host<->device boundary (TPU runtimes may not implement complex
transfers at all, and planar f32 is the layout Pallas kernels want); complex
arithmetic happens *inside* jit via ``lax.complex``, which XLA decomposes
into real math. Host-side helpers convert to/from numpy complex for display
and tests.

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
import numpy as np

# Letters for programmatic einsum construction.
_LETTERS = string.ascii_lowercase + string.ascii_uppercase


# ---------------------------------------------------------------------------
# Planar <-> complex conversion (host boundary)
# ---------------------------------------------------------------------------


def planar_from_complex(a, dtype=np.float32) -> np.ndarray:
    """Host-side: complex array-like -> planar (2, ...) float array."""
    a = np.asarray(a)
    return np.stack([a.real.astype(dtype), a.imag.astype(dtype)])


def complex_from_planar(p) -> np.ndarray:
    """Host-side: planar (2, ...) array -> numpy complex128."""
    p = np.asarray(jax.device_get(p))
    return p[0].astype(np.float64) + 1j * p[1].astype(np.float64)


def as_complex(p: jnp.ndarray) -> jnp.ndarray:
    """Inside-jit: planar (2, ...) -> complex."""
    return jax.lax.complex(p[0], p[1])


def as_planar(c: jnp.ndarray) -> jnp.ndarray:
    """Inside-jit: complex -> planar (2, ...)."""
    return jnp.stack([jnp.real(c), jnp.imag(c)])


# ---------------------------------------------------------------------------
# Gate application
# ---------------------------------------------------------------------------


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


def _sort_targets(u: np.ndarray, targets: tuple[int, ...]) -> tuple[np.ndarray, tuple[int, ...]]:
    """Host-side: reorder a (2^k, 2^k) gate matrix from its given target
    order to sorted order. Row/column index bit j (MSB-first) corresponds to
    targets[j]."""
    k = len(targets)
    order = tuple(sorted(range(k), key=lambda j: targets[j]))
    if order != tuple(range(k)):
        u = (
            u.reshape((2,) * (2 * k))
            .transpose(tuple(order) + tuple(k + j for j in order))
            .reshape(1 << k, 1 << k)
        )
    return u, tuple(sorted(targets))


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_gate_impl(state: jnp.ndarray, u: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    # state: planar (2, 2^n); u: planar (2, 2^k, 2^k)
    k = len(targets)
    dims, tpos = _segment_shape(n, targets)
    st = as_complex(state).reshape(dims)
    uc = as_complex(u).reshape((2,) * (2 * k))
    rank = len(dims)
    st_sub = list(_LETTERS[:rank])
    out_letters = _LETTERS[rank : rank + k]
    u_sub = list(out_letters)  # output bits, MSB-first over sorted targets
    out_sub = list(st_sub)
    for j, p in enumerate(tpos):
        u_sub.append(st_sub[p])  # input bit contracts with the state axis
        out_sub[p] = out_letters[j]
    spec = f"{''.join(u_sub)},{''.join(st_sub)}->{''.join(out_sub)}"
    # Precision.HIGHEST: TPU matmuls otherwise run bf16 on the MXU, which
    # breaks the 1e-6 amplitude-accuracy bar (observed: H|0> = 0.7070).
    out = jnp.einsum(spec, uc, st, precision=jax.lax.Precision.HIGHEST).reshape(-1)
    return as_planar(out)


def apply_gate(state: jnp.ndarray, u, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    """Apply a k-qubit unitary to ``targets`` of an n-qubit planar state.

    ``u`` is a host-side complex (2^k, 2^k) matrix or a planar (2, 2^k, 2^k)
    array. ``targets`` are distinct qubit indices; targets[0] is the most
    significant bit of the gate's local index (so ``cnot`` with targets
    (c, t) uses the standard |c t> ordered matrix).
    """
    tgts = tuple(int(t) for t in targets)
    un = np.asarray(u)
    if un.ndim == 3:  # already planar
        un = un[0] + 1j * un[1]
    un, sorted_targets = _sort_targets(un, tgts)
    return _apply_gate_impl(state, jnp.asarray(planar_from_complex(un)), sorted_targets, n)


@functools.partial(jax.jit, static_argnames=("targets", "n"))
def _apply_diag_impl(state: jnp.ndarray, d: jnp.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    # state: planar (2, 2^n); d: planar (2, 2^k)
    k = len(targets)
    dims, tpos = _segment_shape(n, targets)
    bshape = [1] * len(dims)
    for p in tpos:
        bshape[p] = 2
    st = as_complex(state).reshape(dims)
    dc = as_complex(d).reshape((2,) * k).reshape(bshape)
    return as_planar((st * dc).reshape(-1))


def apply_diag(state: jnp.ndarray, d, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    """Apply a diagonal k-qubit gate given as its 2^k diagonal."""
    k = len(targets)
    tgts = tuple(int(t) for t in targets)
    dn = np.asarray(d)
    if dn.ndim == 2:  # planar
        dn = dn[0] + 1j * dn[1]
    order = tuple(sorted(range(k), key=lambda j: tgts[j]))
    if order != tuple(range(k)):
        dn = dn.reshape((2,) * k).transpose(order).reshape(-1)
    return _apply_diag_impl(state, jnp.asarray(planar_from_complex(dn)), tuple(sorted(tgts)), n)


@jax.jit
def tensor(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Kronecker/tensor product of two planar amplitude vectors (a ⊗ b).

    Mirrors reference ``tensor`` (src/Qubism/StateVec.hs:98-100): the first
    operand's qubits become the most significant index bits.
    """
    ac, bc = as_complex(a), as_complex(b)
    return as_planar(jnp.outer(ac, bc).reshape(-1))


@jax.jit
def normalize(state: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize a planar state (|z|^2 = re^2 + im^2 summed over planes)."""
    nrm = jnp.sqrt(jnp.sum(state * state))
    return state / jnp.where(nrm == 0, 1, nrm)


@jax.jit
def inner_planar(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a|b> of planar states, returned as a planar (2,) [re, im] pair."""
    z = jnp.vdot(as_complex(a), as_complex(b))
    return jnp.stack([jnp.real(z), jnp.imag(z)])


def zero_state(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """|0...0> as a planar (2, 2^n) array."""
    return jnp.zeros((2, 1 << n), dtype=dtype).at[0, 0].set(1)
