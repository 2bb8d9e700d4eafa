"""Gate fusion and the compiled circuit executor.

The interpreter applies one primitive per device step; for deep
measurement-free circuit segments that wastes HBM bandwidth (every gate
reads and writes all 2^n amplitudes). This module lowers a primitive stream
into **fused ops** and compiles the whole segment into one XLA program:

* **Dense block fusion** (qsim-style): consecutive primitives whose combined
  target set stays within ``max_block`` qubits are multiplied (host-side,
  tiny matrices) into a single 2^k x 2^k block — one einsum pass applies
  many gates.
* **Diagonal layers**: diagonal primitives (phase/cz/cu1/rz...) commute with
  each other; consecutive diagonal blocks merge into a :class:`DiagLayer`
  whose factors are applied as broadcast multiplies — XLA fuses an entire
  layer of controlled-phase ladders into ONE elementwise pass over the
  state. This is what makes a 30-qubit QFT bandwidth-bound: each stage is
  one small dense block + one fused diagonal pass instead of ~30 passes.

The executor jits the fused stream with buffer donation, so a step is
in-place in HBM (peak memory ~one state vector, not two).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gates import Prim, is_diagonal
from . import apply as _apply

DEFAULT_MAX_BLOCK = 5


@dataclass(frozen=True)
class DenseOp:
    u: np.ndarray  # (2^k, 2^k) complex128, targets sorted ascending
    targets: tuple[int, ...]


@dataclass(frozen=True)
class DiagLayer:
    """A product of commuting diagonal factors, applied in one fused pass."""

    factors: tuple[tuple[np.ndarray, tuple[int, ...]], ...]  # (2^k diag, targets)


def _expand(u: np.ndarray, src: tuple[int, ...], dst: tuple[int, ...]) -> np.ndarray:
    """Expand a gate on qubits ``src`` to the superset ``dst`` (both in the
    matrix's bit order; dst sorted ascending) by tensoring identities."""
    m = len(dst)
    k = len(src)
    extra = [q for q in dst if q not in src]
    # current qubit order after kron: src + extra ; permute to dst order
    cur = list(src) + extra
    perm = [cur.index(q) for q in dst]
    full = np.kron(u, np.eye(1 << (m - k), dtype=np.complex128))
    full = (
        full.reshape((2,) * (2 * m))
        .transpose(perm + [m + p for p in perm])
        .reshape(1 << m, 1 << m)
    )
    return full


def _prim_sorted_dense(p: Prim) -> tuple[np.ndarray, tuple[int, ...]]:
    """Primitive as a dense matrix with sorted targets."""
    u = np.asarray(p.dense(), dtype=np.complex128)
    u, targets = _apply._sort_targets(u, p.targets)
    return u, targets


def fuse(prims, n: int, max_block: int = DEFAULT_MAX_BLOCK) -> list:
    """Greedy fusion: prims -> [DenseOp | DiagLayer]."""
    blocks: list[DenseOp] = []
    cur_u: np.ndarray | None = None
    cur_t: tuple[int, ...] = ()

    def flush():
        nonlocal cur_u, cur_t
        if cur_u is not None:
            blocks.append(DenseOp(cur_u, cur_t))
            cur_u, cur_t = None, ()

    for p in prims:
        u, t = _prim_sorted_dense(p)
        if cur_u is None:
            cur_u, cur_t = u, t
            continue
        union = tuple(sorted(set(cur_t) | set(t)))
        if len(union) <= max_block:
            a = _expand(cur_u, cur_t, union)
            b = _expand(u, t, union)
            cur_u, cur_t = b @ a, union  # p applies after the block
        else:
            flush()
            cur_u, cur_t = u, t
    flush()

    # merge consecutive diagonal blocks into broadcast layers
    out: list = []
    for b in blocks:
        if is_diagonal(b.u):
            d = np.diag(b.u).copy()
            if out and isinstance(out[-1], DiagLayer):
                out[-1] = DiagLayer(out[-1].factors + ((d, b.targets),))
            else:
                out.append(DiagLayer(((d, b.targets),)))
        else:
            out.append(b)
    return out


def _apply_dense_traced(state: jnp.ndarray, u: np.ndarray, targets: tuple[int, ...], n: int) -> jnp.ndarray:
    """Inside-jit dense block application (matrix becomes an XLA constant)."""
    k = len(targets)
    dims, tpos = _apply._segment_shape(n, targets)
    st = _apply.as_complex(state).reshape(dims)
    uc = jax.lax.complex(
        jnp.asarray(u.real, dtype=state.dtype), jnp.asarray(u.imag, dtype=state.dtype)
    ).reshape((2,) * (2 * k))
    rank = len(dims)
    st_sub = list(_apply._LETTERS[:rank])
    out_letters = _apply._LETTERS[rank : rank + k]
    u_sub = list(out_letters)
    out_sub = list(st_sub)
    for j, pth in enumerate(tpos):
        u_sub.append(st_sub[pth])
        out_sub[pth] = out_letters[j]
    spec = f"{''.join(u_sub)},{''.join(st_sub)}->{''.join(out_sub)}"
    out = jnp.einsum(spec, uc, st, precision=jax.lax.Precision.HIGHEST).reshape(-1)
    return _apply.as_planar(out)


def _apply_diag_layer_traced(state: jnp.ndarray, layer: DiagLayer, n: int) -> jnp.ndarray:
    """Inside-jit fused diagonal pass: one elementwise kernel for all factors."""
    st = _apply.as_complex(state)
    full = (1 << n,)
    acc = st
    for d, targets in layer.factors:
        k = len(targets)
        dims, tpos = _apply._segment_shape(n, targets)
        bshape = [1] * len(dims)
        for p in tpos:
            bshape[p] = 2
        dc = jax.lax.complex(
            jnp.asarray(d.real, dtype=state.dtype), jnp.asarray(d.imag, dtype=state.dtype)
        ).reshape(bshape)
        acc = (acc.reshape(dims) * dc).reshape(full)
    return _apply.as_planar(acc)


class CompiledCircuit:
    """A measurement-free circuit segment compiled into XLA programs.

    Applies with buffer donation: ``state = circuit(state)`` reuses the HBM
    buffer, so peak memory stays ~one amplitude vector.

    For large states the fused op stream is split into chunks of
    ``chunk_passes`` ops, each jitted separately: XLA compile time (and the
    compiler's own memory) scales badly with monolithic program size at
    multi-GiB buffer shapes, while per-chunk dispatch overhead is microseconds
    against ~10ms per pass. ``chunk_passes=None`` picks a default by n.
    """

    def __init__(self, n: int, prims, max_block: int = DEFAULT_MAX_BLOCK,
                 optimize: bool = True, chunk_passes: int | None = None):
        self.n = n
        self.prims = tuple(prims)
        self.ops = fuse(self.prims, n, max_block) if optimize else [
            DenseOp(*_prim_sorted_dense(p)) for p in self.prims
        ]
        if chunk_passes is None:
            chunk_passes = len(self.ops) if n <= 22 else 4
        self.chunk_passes = max(1, chunk_passes)
        self._chunks = [
            self.ops[i : i + self.chunk_passes]
            for i in range(0, len(self.ops), self.chunk_passes)
        ]
        self._fns = [
            jax.jit(functools.partial(self._run_ops, tuple(chunk)), donate_argnums=0)
            for chunk in self._chunks
        ]

    @property
    def num_passes(self) -> int:
        return len(self.ops)

    def _run_ops(self, ops, state: jnp.ndarray) -> jnp.ndarray:
        for op in ops:
            if isinstance(op, DiagLayer):
                state = _apply_diag_layer_traced(state, op, self.n)
            else:
                state = _apply_dense_traced(state, op.u, op.targets, self.n)
        return state

    def _run(self, state: jnp.ndarray) -> jnp.ndarray:
        return self._run_ops(tuple(self.ops), state)

    def __call__(self, state: jnp.ndarray) -> jnp.ndarray:
        for fn in self._fns:
            state = fn(state)
        return state

    def lower_text(self) -> str:  # pragma: no cover - debugging aid
        return jax.jit(self._run).lower(
            jax.ShapeDtypeStruct((2, 1 << self.n), jnp.float32)
        ).as_text()
