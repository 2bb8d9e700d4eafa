"""Measurement, collapse and reset primitives (planar-layout states).

Replaces the reference's measurement path (src/Qubism/StateVec.hs:104-137)
with on-device fused kernels and explicit, splittable JAX PRNG keys (the
reference uses an ambient global StdGen and is irreproducible). States are
planar float32 (2, 2^n) arrays — see :mod:`qubism_tpu.ops.apply`.

Born rule: the reference samples with ``r < sqrt(p)`` (quirk, see
SURVEY.md §2.4.2). We default to the correct ``r < p``; the quirk is
available via ``config.reference_sqrt_born``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import config


def _split4(n: int, q: int) -> tuple[int, int, int, int]:
    """(2, outer, 2, inner) reshape dims isolating qubit q of a planar state."""
    return (2, 1 << q, 2, 1 << (n - q - 1))


@functools.partial(jax.jit, static_argnames=("q", "n"))
def prob_one(state: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    """Born probability that measuring qubit q yields 1."""
    st = state.reshape(_split4(n, q))
    return jnp.sum(st[:, :, 1, :] ** 2)


def _collapse(st: jnp.ndarray, outcome: jnp.ndarray) -> jnp.ndarray:
    """Mask the incompatible half of a (2, A, 2, B)-shaped state and
    renormalize (reference ``collapse``, StateVec.hs:104-114). Zero-norm
    results return the zero vector instead of NaNs."""
    sel = jnp.arange(2).reshape(1, 1, 2, 1) == outcome
    masked = jnp.where(sel, st, 0)
    nrm = jnp.sqrt(jnp.sum(masked * masked))
    return masked / jnp.where(nrm == 0, 1, nrm)


@functools.partial(jax.jit, static_argnames=("q", "n"))
def collapse(state: jnp.ndarray, outcome: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    """Project qubit q onto ``outcome`` (0/1) and renormalize."""
    st = state.reshape(_split4(n, q))
    return _collapse(st, outcome).reshape(2, -1)


@functools.partial(jax.jit, static_argnames=("q", "n", "sqrt_born"))
def _measure_qubit_impl(state, key, q: int, n: int, sqrt_born: bool):
    st = state.reshape(_split4(n, q))
    p1 = jnp.sum(st[:, :, 1, :] ** 2)
    threshold = jnp.sqrt(p1) if sqrt_born else p1
    key, sub = jax.random.split(key)
    r = jax.random.uniform(sub, dtype=threshold.dtype)
    outcome = (r < threshold).astype(jnp.int32)
    new_state = _collapse(st, outcome).reshape(2, -1)
    return outcome, new_state, key


def measure_qubit(state: jnp.ndarray, key: jax.Array, q: int, n: int):
    """Sample qubit q, collapse the state. Returns (outcome, state', key')."""
    return _measure_qubit_impl(state, key, q, n, config.reference_sqrt_born)


@functools.partial(jax.jit, static_argnames=("n",))
def probabilities(state: jnp.ndarray, n: int) -> jnp.ndarray:
    """|psi|^2 over the computational basis, shape (2^n,) float32."""
    return jnp.sum(state * state, axis=0)
