"""Typed state vectors with measurement.

The TPU-native counterpart of reference src/Qubism/StateVec.hs. The 2^n
complex amplitudes live on device as a **pair of float32 plane arrays**
(re, im) — complex dtypes never exist on device, and the planes are separate
buffers so single allocations stay <= 4 GiB (see :mod:`qubism_tpu.ops.apply`
for the full layout rationale). The qubit count n is a plain Python int (the reference used type-level naturals — runtime
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
    """An n-qubit pure state: (re, im) float32 plane pair on device.

    The planes are SEPARATE device buffers (a fused (2, 2^n) buffer would be
    8 GiB at n=30, beyond what TPU compilers accept as one allocation)."""

    __slots__ = ("n", "planes")

    def __init__(self, n: int, data):
        """``data`` is an (re, im) pair of real arrays totalling 2^n
        elements each (flat, or the engine's canonical 2-D device layout —
        preserved as-is: a flattening reshape here would cost a device copy
        per statement on the interpreter's TPU fast path), a stacked
        (2, 2^n) real array, or a 1-D complex amplitude vector (host)."""
        if isinstance(data, (tuple, list)) and len(data) == 2:
            planes = (jnp.asarray(data[0], dtype=jnp.float32),
                      jnp.asarray(data[1], dtype=jnp.float32))
        else:
            arr = np.asarray(data)
            if arr.ndim == 1:
                re, im = _apply.planes_from_complex(arr)
                planes = (jnp.asarray(re), jnp.asarray(im))
            elif arr.ndim == 2 and arr.shape[0] == 2:
                planes = (jnp.asarray(arr[0], dtype=jnp.float32),
                          jnp.asarray(arr[1], dtype=jnp.float32))
            else:
                raise ValueError(f"bad amplitude data shape {arr.shape}")
        if planes[0].size != (1 << n) or planes[0].shape != planes[1].shape:
            raise ValueError(
                f"amplitude data of shape {planes[0].shape} is not (2^{n},)")
        object.__setattr__(self, "n", n)
        object.__setattr__(self, "planes", planes)

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
        return _apply.complex_from_planes(self.planes)

    @property
    def planar(self) -> np.ndarray:
        """Host-side stacked (2, 2^n) float32 view (for tests/checkpointing)."""
        return np.stack([np.asarray(jax.device_get(p)) for p in self.planes])

    @property
    def dimension(self) -> int:
        """Number of qubits (reference ``dimension``, StateVec.hs:74-75)."""
        return self.n

    # -- basic ops -----------------------------------------------------------

    def normalize(self) -> "StateVec":
        return StateVec(self.n, _apply.normalize(self.planes))

    def tensor(self, other: "StateVec") -> "StateVec":
        """self ⊗ other: self's qubits become the most significant bits."""
        return StateVec(self.n + other.n, _apply.tensor(self.planes, other.planes))

    def inner(self, other: "StateVec") -> complex:
        """<self|other> (conjugate-linear in self); host-side complex."""
        re, im = np.asarray(jax.device_get(_apply.inner_planes(self.planes, other.planes)))
        return complex(re, im)

    def norm(self) -> float:
        re, im = self.planes
        return float(jnp.sqrt(jnp.sum(re * re) + jnp.sum(im * im)))

    def adjoint(self) -> "StateVec":
        """Elementwise conjugate (the bra of this ket) — reference
        ``adjoint``, src/Qubism/StateVec.hs:94-95 (unused there too, kept
        for API parity)."""
        re, im = self.planes
        return StateVec(self.n, (re, -im))

    def expectation(self, pauli: str) -> float:
        """<psi|P|psi> for a Pauli string like "XZI..." (one char per
        qubit, I/X/Y/Z; qubit 0 = leftmost). One fused on-device reduction
        (ops/measure.py:expectation_pauli) — an engine extension with no
        reference analogue."""
        return _measure.expectation_pauli(self.planes, self.n, pauli)

    def expectation_sum(self, terms) -> float:
        """<psi| sum_j c_j P_j |psi> for ``terms = [(coef, pauli), ...]``
        — a whole Pauli-sum Hamiltonian in ONE device dispatch."""
        return _measure.expectation_pauli_sum(self.planes, self.n, terms)

    def reduced_density_matrix(self, subset) -> np.ndarray:
        """rho_A = Tr_B |psi><psi| for qubit subset A (host complex)."""
        from ..ops.rdm import reduced_density_matrix

        return reduced_density_matrix(self.planes, self.n, subset)

    def entanglement_entropy(self, subset, base: float | None = None) -> float:
        """Von Neumann entropy of rho_A (nats; ``base=2`` for bits)."""
        from ..ops.rdm import entanglement_entropy

        return entanglement_entropy(self.planes, self.n, subset, base)

    # -- amplitude queries -----------------------------------------------------

    def _basis_index(self, bits) -> int:
        """Basis index from an int, a '0110' string, or a bit sequence
        (qubit 0 first = most significant index bit, matching Show)."""
        if isinstance(bits, str):
            if len(bits) != self.n or set(bits) - {"0", "1"}:
                raise ValueError(f"bitstring {bits!r} is not {self.n} of 0/1")
            idx = int(bits, 2)
        elif isinstance(bits, (int, np.integer)):
            idx = int(bits)
        else:
            seq = list(bits)
            if len(seq) != self.n:
                raise ValueError(f"expected {self.n} bits, got {len(seq)}")
            idx = 0
            for b in seq:
                idx = (idx << 1) | (int(b) & 1)
        if not 0 <= idx < (1 << self.n):
            raise ValueError(f"basis index {idx} out of range for n={self.n}")
        return idx

    def amplitude(self, bits) -> complex:
        """One amplitude <b|psi> — a scalar device read, NOT a full
        2^n transfer (usable at any n the state itself fits)."""
        idx = self._basis_index(bits)
        re, im = self.planes
        if re.ndim == 2:
            r, c = divmod(idx, re.shape[1])
            return complex(float(re[r, c]), float(im[r, c]))
        return complex(float(re[idx]), float(im[idx]))

    def probability(self, bits) -> float:
        """Born probability |<b|psi>|^2 of one basis state."""
        a = self.amplitude(bits)
        return a.real * a.real + a.imag * a.imag

    def probs(self) -> np.ndarray:
        """The full Born distribution as a host (2^n,) float64 array.
        Guarded: past n=26 this is a multi-GiB host transfer — use
        :meth:`sample` / :meth:`probability` instead."""
        if self.n > 26:
            raise ValueError(
                f"probs() materializes 2^{self.n} host floats; sample() or "
                f"probability(bits) scale to large n")
        a = self.amps
        return (a.real * a.real + a.imag * a.imag)

    def sample(self, shots: int, key: jax.Array | None = None,
               seed: int | None = None) -> dict[str, int]:
        """Non-destructive shot sampling: {bitstring: count} via the
        hierarchical device sampler (the state is NOT collapsed)."""
        from ..ops import sample as _sample

        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        return _sample.sample_counts(self.planes, self.n, shots, key)

    # -- measurement ---------------------------------------------------------

    def prob_one(self, i: int) -> float:
        return float(_measure.prob_one(self.planes, i, self.n))

    def collapse(self, i: int, outcome) -> "StateVec":
        """Project qubit i onto outcome (0/1) and renormalize
        (reference ``collapse``, StateVec.hs:104-114)."""
        out = _measure.collapse(self.planes, jnp.int32(int(outcome)), i, self.n)
        return StateVec(self.n, out)

    def measure_qubit(self, i: int, key: jax.Array):
        """Sample qubit i and collapse. Returns (bit, StateVec, key')."""
        outcome, planes, key = _measure.measure_qubit(self.planes, key, i, self.n)
        return int(outcome), StateVec(self.n, planes), key

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
        dr = self.planes[0].reshape(-1) - other.planes[0].reshape(-1)
        di = self.planes[1].reshape(-1) - other.planes[1].reshape(-1)
        return float(jnp.sqrt(jnp.sum(dr * dr) + jnp.sum(di * di))) < TOLERANCE

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
