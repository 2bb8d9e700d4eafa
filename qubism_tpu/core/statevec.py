"""Typed state vectors with measurement.

The TPU-native counterpart of reference src/Qubism/StateVec.hs. The 2^n
complex amplitudes live on device as a **planar float32 array of shape
(2, 2^n)** — real plane, imaginary plane (complex dtypes never cross the
host<->device boundary; see :mod:`qubism_tpu.ops.apply`). The qubit count n
is a plain Python int (the reference used type-level naturals — runtime
validation plays that role here). All operations are functional: methods
return new StateVec values, and randomness is an explicit, splittable PRNG
key.

Index convention is big-endian (qubit 0 = most significant index bit),
matching the reference's basis labeling (StateVec.hs:65-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TOLERANCE
from ..ops import apply as _apply
from ..ops import measure as _measure
from .creg import CReg


class StateVec:
    """An n-qubit pure state: planar (2, 2^n) float32 amplitudes on device."""

    __slots__ = ("n", "planar")

    def __init__(self, n: int, data):
        """``data`` is either a planar (2, 2^n) real array (device or host)
        or a 1-D complex amplitude vector (host-side; converted)."""
        if isinstance(data, jnp.ndarray) and data.ndim == 2:
            planar = data
        else:
            arr = np.asarray(data)
            if arr.ndim == 1:
                planar = jnp.asarray(_apply.planar_from_complex(arr))
            elif arr.ndim == 2 and arr.shape[0] == 2:
                planar = jnp.asarray(arr, dtype=jnp.float32)
            else:
                raise ValueError(f"bad amplitude data shape {arr.shape}")
        if planar.shape != (2, 1 << n):
            raise ValueError(f"amplitude data of shape {planar.shape} is not (2, 2^{n})")
        object.__setattr__(self, "n", n)
        object.__setattr__(self, "planar", planar)

    # -- constructors (mirror mkStateVec / mkQubit, StateVec.hs:78-89) ------

    @classmethod
    def zero(cls, n: int) -> "StateVec":
        """|0...0> on n qubits."""
        return cls(n, _apply.zero_state(n))

    @classmethod
    def qubit(cls, alpha=1.0, beta=0.0) -> "StateVec":
        """A single qubit alpha|0> + beta|1> (normalized)."""
        v = np.array([alpha, beta], dtype=np.complex128)
        return cls(1, v).normalize()

    @classmethod
    def from_amplitudes(cls, amps) -> "StateVec":
        amps = np.asarray(amps)
        n = int(amps.shape[0]).bit_length() - 1
        if (1 << n) != amps.shape[0]:
            raise ValueError(f"length {amps.shape[0]} is not a power of two")
        return cls(n, amps)

    # -- views ------------------------------------------------------------------

    @property
    def amps(self) -> np.ndarray:
        """Host-side numpy complex128 amplitude vector (device_get)."""
        return _apply.complex_from_planar(self.planar)

    @property
    def dimension(self) -> int:
        """Number of qubits (reference ``dimension``, StateVec.hs:74-75)."""
        return self.n

    # -- basic ops -----------------------------------------------------------

    def normalize(self) -> "StateVec":
        return StateVec(self.n, _apply.normalize(self.planar))

    def tensor(self, other: "StateVec") -> "StateVec":
        """self ⊗ other: self's qubits become the most significant bits."""
        return StateVec(self.n + other.n, _apply.tensor(self.planar, other.planar))

    def inner(self, other: "StateVec") -> complex:
        """<self|other> (conjugate-linear in self); host-side complex."""
        re, im = np.asarray(jax.device_get(_apply.inner_planar(self.planar, other.planar)))
        return complex(re, im)

    def norm(self) -> float:
        return float(jnp.sqrt(jnp.sum(self.planar * self.planar)))

    # -- measurement ---------------------------------------------------------

    def prob_one(self, i: int) -> float:
        return float(_measure.prob_one(self.planar, i, self.n))

    def collapse(self, i: int, outcome) -> "StateVec":
        """Project qubit i onto outcome (0/1) and renormalize
        (reference ``collapse``, StateVec.hs:104-114)."""
        out = _measure.collapse(self.planar, jnp.int32(int(outcome)), i, self.n)
        return StateVec(self.n, out)

    def measure_qubit(self, i: int, key: jax.Array):
        """Sample qubit i and collapse. Returns (bit, StateVec, key')."""
        outcome, planar, key = _measure.measure_qubit(self.planar, key, i, self.n)
        return int(outcome), StateVec(self.n, planar), key

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
        d = self.planar - other.planar
        return float(jnp.sqrt(jnp.sum(d * d))) < TOLERANCE

    def __hash__(self):  # pragma: no cover - states are not hashable
        raise TypeError("StateVec is unhashable (approximate equality)")

    def __repr__(self) -> str:
        return f"StateVec(n={self.n})\n{self}"

    def __str__(self) -> str:
        """Pretty amplitude list with basis kets, matching the reference's
        Show instance (StateVec.hs:60-68): '% 6.4f  + % 6.4fi  |bits>'."""
        zs = self.amps
        lines = []
        for i, z in enumerate(zs):
            ket = format(i, f"0{self.n}b") if self.n else ""
            lines.append(f"{z.real: 6.4f}  + {z.imag: 6.4f}i  |{ket}>")
        return "\n".join(lines) + ("\n" if len(zs) else "")


def mk_state_vec(n: int) -> StateVec:
    """|0...0> on n qubits (reference ``mkStateVec``)."""
    return StateVec.zero(n)


def mk_qubit() -> StateVec:
    """A |0> qubit (reference ``mkQubit``)."""
    return StateVec.zero(1)
