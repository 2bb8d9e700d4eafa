"""Measurement, collapse and reset primitives.

Replaces the reference's measurement path (src/Qubism/StateVec.hs:104-137)
with on-device fused kernels and explicit, splittable JAX PRNG keys (the
reference uses an ambient global StdGen and is irreproducible).

Born rule: the reference samples with ``r < sqrt(p)`` (quirk, see
SURVEY.md §2.4.2). We default to the correct ``r < p``; the quirk is
available via ``config.reference_sqrt_born``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import config


def _split3(n: int, q: int) -> tuple[int, int, int]:
    """(outer, 2, inner) reshape dims isolating qubit q (big-endian)."""
    return (1 << q, 2, 1 << (n - q - 1))


@functools.partial(jax.jit, static_argnames=("q", "n"))
def prob_one(state: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    """Born probability that measuring qubit q yields 1."""
    st = state.reshape(_split3(n, q))
    return jnp.sum(jnp.abs(st[:, 1, :]) ** 2)


@functools.partial(jax.jit, static_argnames=("q", "n"))
def collapse(state: jnp.ndarray, outcome: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    """Project qubit q onto ``outcome`` (0/1) and renormalize.

    Mirrors reference ``collapse`` (src/Qubism/StateVec.hs:104-114): mask the
    incompatible half, then L2-normalize. A zero-norm result (projecting onto
    an impossible outcome) returns the zero vector instead of NaNs.
    """
    st = state.reshape(_split3(n, q))
    sel = jnp.arange(2).reshape(1, 2, 1) == outcome
    masked = jnp.where(sel, st, 0)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(masked) ** 2))
    return (masked / jnp.where(nrm == 0, 1, nrm).astype(state.dtype)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("q", "n", "sqrt_born"))
def _measure_qubit_impl(state, key, q: int, n: int, sqrt_born: bool):
    st = state.reshape(_split3(n, q))
    p1 = jnp.sum(jnp.abs(st[:, 1, :]) ** 2)
    threshold = jnp.sqrt(p1) if sqrt_born else p1
    key, sub = jax.random.split(key)
    r = jax.random.uniform(sub, dtype=threshold.dtype)
    outcome = (r < threshold).astype(jnp.int32)
    sel = jnp.arange(2).reshape(1, 2, 1) == outcome
    masked = jnp.where(sel, st, 0)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(masked) ** 2))
    new_state = (masked / jnp.where(nrm == 0, 1, nrm).astype(state.dtype)).reshape(-1)
    return outcome, new_state, key


def measure_qubit(state: jnp.ndarray, key: jax.Array, q: int, n: int):
    """Sample qubit q, collapse the state. Returns (outcome, state', key')."""
    return _measure_qubit_impl(state, key, q, n, config.reference_sqrt_born)


@functools.partial(jax.jit, static_argnames=("n",))
def probabilities(state: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.abs(state) ** 2
