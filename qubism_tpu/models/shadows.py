"""Classical shadows: randomized single-shot state certification.

The random-Pauli-basis shadow protocol (Huang, Kueng, Preskill, Nat.
Phys. 16, 1050 (2020)): each snapshot measures EVERY qubit in an
independently random X/Y/Z basis and keeps one shot; any k-local Pauli
expectation is then estimated from the snapshot record with variance
~3^k / T, independent of how many observables are read out — the
shot-frugal complement of :mod:`qubism_tpu.models.estimation`'s grouped
per-term sampling.

TPU-native shape: all T snapshots run as ONE jitted, chunk-vmapped
device program. The per-qubit basis rotation is a 2x2 selected from a
(3, 2, 2) split-real table by the snapshot's basis index — a runtime
operand, so one compile serves every random basis — followed by a
categorical draw from the rotated probabilities; nothing but the (T, n)
basis and outcome-bit records ever leaves the device. Estimation is
host-side numpy over those records with median-of-means robustness.

Engine extension: the reference measures only whole registers in the Z
basis (src/Qubism/QASM/ProgState.hs measureQubit) and has no
randomized protocols.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from ..ops.fusion import CompiledCircuit

__all__ = ["shadow_snapshots", "shadow_expectation", "shadow_pauli_sum",
           "ShadowRecord"]

# basis index 0=X, 1=Y, 2=Z; rotation U_b with U_b P_b U_b^dag = Z:
# X -> H, Y -> H S^dag, Z -> I (split re/im, f32)
_ROT_RE = np.zeros((3, 2, 2), np.float32)
_ROT_IM = np.zeros((3, 2, 2), np.float32)
_s = 1.0 / math.sqrt(2.0)
_ROT_RE[0] = [[_s, _s], [_s, -_s]]                  # H
_ROT_RE[1] = [[_s, 0.0], [_s, 0.0]]                 # H S^dag (re)
_ROT_IM[1] = [[0.0, -_s], [0.0, _s]]                # H S^dag (im)
_ROT_RE[2] = np.eye(2)
_BASIS_CODE = {"X": 0, "Y": 1, "Z": 2}


class ShadowRecord:
    """The (T, n) basis-index and outcome-bit records of a shadow run."""

    def __init__(self, bases: np.ndarray, bits: np.ndarray):
        self.bases = np.asarray(bases, np.int8)
        self.bits = np.asarray(bits, np.int8)
        self.T, self.n = self.bases.shape

    def pauli_values(self, pauli: str) -> np.ndarray:
        """The (T,) per-snapshot single-shot estimator of ``<P>``: the
        product over P's support of ``3 * (-1)^bit`` where the snapshot
        basis matches P there, 0 otherwise (identity -> all-ones)."""
        if len(pauli) != self.n:
            raise ValueError(f"pauli length {len(pauli)} != n={self.n}")
        vals = np.ones(self.T, np.float64)
        for q, c in enumerate(pauli):
            if c == "I":
                continue
            if c not in _BASIS_CODE:
                raise ValueError(f"bad pauli letter {c!r}")
            match = self.bases[:, q] == _BASIS_CODE[c]
            vals *= 3.0 * (1.0 - 2.0 * self.bits[:, q]) * match
        return vals


def shadow_snapshots(prims, n: int, snapshots: int, seed: int = 0,
                     chunk: int = 256) -> ShadowRecord:
    """Run the shadow acquisition: prepare the state once, then draw
    ``snapshots`` (random basis, single shot) records as chunked vmapped
    device programs (one compile total)."""
    import jax
    import jax.numpy as jnp

    c = CompiledCircuit(n, list(prims))
    planes = c(c.init_state())
    re = jnp.asarray(planes[0]).reshape(1 << n)
    im = jnp.asarray(planes[1]).reshape(1 << n)
    tre = jnp.asarray(_ROT_RE)
    tim = jnp.asarray(_ROT_IM)

    def snap(basis, key):
        r, i = re, im
        for q in range(n):
            # apply the basis-selected 2x2 to qubit q: (2^q, 2, 2^(n-q-1))
            br, bi = tre[basis[q]], tim[basis[q]]
            shp = (1 << q, 2, 1 << (n - 1 - q))
            r3, i3 = r.reshape(shp), i.reshape(shp)
            nr = (jnp.einsum("ab,xby->xay", br, r3)
                  - jnp.einsum("ab,xby->xay", bi, i3))
            ni = (jnp.einsum("ab,xby->xay", br, i3)
                  + jnp.einsum("ab,xby->xay", bi, r3))
            r, i = nr.reshape(1 << n), ni.reshape(1 << n)
        p = r * r + i * i
        idx = jax.random.categorical(key, jnp.log(jnp.maximum(p, 1e-30)))
        return ((idx >> (n - 1 - jnp.arange(n))) & 1).astype(jnp.int8)

    run = jax.jit(jax.vmap(snap))
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 3, size=(snapshots, n)).astype(np.int32)
    key = jax.random.PRNGKey(seed)
    bits = np.empty((snapshots, n), np.int8)
    for lo in range(0, snapshots, chunk):
        hi = min(lo + chunk, snapshots)
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, hi - lo)
        b = jnp.asarray(bases[lo:hi])
        if hi - lo < chunk and lo > 0:
            # pad the tail chunk to the compiled batch shape
            pad = chunk - (hi - lo)
            b = jnp.concatenate([b, b[:1].repeat(pad, 0)])
            ks = jnp.concatenate([ks, ks[:1].repeat(pad, 0)])
            bits[lo:hi] = np.asarray(run(b, ks))[: hi - lo]
        else:
            bits[lo:hi] = np.asarray(run(b, ks))
    return ShadowRecord(bases, bits)


def _median_of_means(vals: np.ndarray, batches: int) -> float:
    k = max(1, min(batches, len(vals)))
    return float(np.median([b.mean() for b in np.array_split(vals, k)]))


def shadow_expectation(record: ShadowRecord, pauli: str,
                       batches: int = 10) -> float:
    """Median-of-means estimate of ``<P>`` from a shadow record."""
    return _median_of_means(record.pauli_values(pauli), batches)


def shadow_pauli_sum(record: ShadowRecord, terms: Sequence,
                     batches: int = 10, constant: float = 0.0) -> float:
    """``constant + sum_j c_j <P_j>`` from ONE shadow record — the
    many-observables regime the protocol exists for (no new shots per
    added term)."""
    total = constant
    for coef, pauli in terms:
        if set(pauli) == {"I"}:
            total += coef
        else:
            total += coef * shadow_expectation(record, pauli, batches)
    return total
