"""Typed state vectors with measurement.

The TPU-native counterpart of reference src/Qubism/StateVec.hs. The 2^n
complex amplitudes live on device as a JAX array; the qubit count n is a
plain Python int (the reference used type-level naturals — runtime validation
plays that role here). All operations are functional: methods return new
StateVec values, and randomness is an explicit, splittable PRNG key.

Index convention is big-endian (qubit 0 = most significant index bit),
matching the reference's basis labeling (StateVec.hs:65-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TOLERANCE, config
from ..ops import apply as _apply
from ..ops import measure as _measure
from .creg import CReg


class StateVec:
    """An n-qubit pure state: 2^n complex amplitudes on device."""

    __slots__ = ("n", "amps")

    def __init__(self, n: int, amps):
        amps = jnp.asarray(amps)
        if amps.shape != (1 << n,):
            raise ValueError(f"amplitude vector of shape {amps.shape} is not 2^{n}")
        object.__setattr__(self, "n", n)
        object.__setattr__(self, "amps", amps)

    # -- constructors (mirror mkStateVec / mkQubit, StateVec.hs:78-89) ------

    @classmethod
    def zero(cls, n: int, dtype=None) -> "StateVec":
        """|0...0> on n qubits."""
        dtype = dtype or config.dtype
        amps = jnp.zeros(1 << n, dtype=dtype).at[0].set(1)
        return cls(n, amps)

    @classmethod
    def qubit(cls, alpha=1.0, beta=0.0, dtype=None) -> "StateVec":
        """A single qubit alpha|0> + beta|1> (normalized)."""
        dtype = dtype or config.dtype
        v = jnp.array([alpha, beta], dtype=dtype)
        return cls(1, v)._normalized_if_needed()

    @classmethod
    def from_amplitudes(cls, amps, dtype=None) -> "StateVec":
        amps = jnp.asarray(amps, dtype=dtype or config.dtype)
        n = int(amps.shape[0]).bit_length() - 1
        if (1 << n) != amps.shape[0]:
            raise ValueError(f"length {amps.shape[0]} is not a power of two")
        return cls(n, amps)

    def _normalized_if_needed(self) -> "StateVec":
        return StateVec(self.n, _apply.normalize(self.amps))

    # -- basic ops -----------------------------------------------------------

    @property
    def dimension(self) -> int:
        """Number of qubits (reference ``dimension``, StateVec.hs:74-75)."""
        return self.n

    def normalize(self) -> "StateVec":
        return StateVec(self.n, _apply.normalize(self.amps))

    def tensor(self, other: "StateVec") -> "StateVec":
        """self ⊗ other: self's qubits become the most significant bits."""
        return StateVec(self.n + other.n, _apply.tensor(self.amps, other.amps))

    def inner(self, other: "StateVec") -> jnp.ndarray:
        """<self|other> (conjugate-linear in self)."""
        return jnp.vdot(self.amps, other.amps)

    def norm(self) -> float:
        return float(jnp.linalg.norm(self.amps))

    # -- measurement ---------------------------------------------------------

    def prob_one(self, i: int) -> float:
        return float(_measure.prob_one(self.amps, i, self.n))

    def collapse(self, i: int, outcome) -> "StateVec":
        """Project qubit i onto outcome (0/1) and renormalize
        (reference ``collapse``, StateVec.hs:104-114)."""
        out = _measure.collapse(self.amps, jnp.int32(int(outcome)), i, self.n)
        return StateVec(self.n, out)

    def measure_qubit(self, i: int, key: jax.Array):
        """Sample qubit i and collapse. Returns (bit, StateVec, key')."""
        outcome, amps, key = _measure.measure_qubit(self.amps, key, i, self.n)
        return int(outcome), StateVec(self.n, amps), key

    def measure(self, key: jax.Array):
        """Measure all qubits sequentially in index order (reference
        ``measure``, StateVec.hs:133-137). Returns (CReg, StateVec, key')."""
        sv = self
        bits = []
        for i in range(self.n):
            b, sv, key = sv.measure_qubit(i, key)
            bits.append(b)
        return CReg.of(bits), sv, key

    # -- comparison & display --------------------------------------------------

    def __eq__(self, other) -> bool:
        """Approximate equality: L2 distance < 1e-6 (StateVec.hs:47-49)."""
        if not isinstance(other, StateVec) or other.n != self.n:
            return NotImplemented if not isinstance(other, StateVec) else False
        return float(jnp.linalg.norm(self.amps - other.amps)) < TOLERANCE

    def __hash__(self):  # pragma: no cover - states are not hashable
        raise TypeError("StateVec is unhashable (approximate equality)")

    def __repr__(self) -> str:
        return f"StateVec(n={self.n})\n{self}"

    def __str__(self) -> str:
        """Pretty amplitude list with basis kets, matching the reference's
        Show instance (StateVec.hs:60-68): '% 6.4f  + % 6.4fi  |bits>'."""
        import numpy as np

        zs = np.asarray(jax.device_get(self.amps))
        lines = []
        for i, z in enumerate(zs):
            ket = format(i, f"0{self.n}b") if self.n else ""
            lines.append(f"{z.real: 6.4f}  + {z.imag: 6.4f}i  |{ket}>")
        return "\n".join(lines) + ("\n" if len(zs) else "")


def mk_state_vec(n: int, dtype=None) -> StateVec:
    """|0...0> on n qubits (reference ``mkStateVec``)."""
    return StateVec.zero(n, dtype=dtype)


def mk_qubit(dtype=None) -> StateVec:
    """A |0> qubit (reference ``mkQubit``)."""
    return StateVec.zero(1, dtype=dtype)
