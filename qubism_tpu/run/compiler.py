"""Whole-program compiler: QASM AST → gate-stream IR → fused XLA segments.

The interpreter (:mod:`qubism_tpu.run.interpreter`) is the semantics
reference: host-driven, one device step per primitive, lazy register fusion.
This module is the performance path (the CLI's ``--compile`` flag and the
benchmark driver): it statically elaborates the program — expanding user
gates, binding parameters, resolving register views to absolute qubits — into
a flat event stream, then compiles every measurement-free run of unitaries
into one fused, buffer-donating XLA program (:class:`CompiledCircuit`).

Trade-off vs the interpreter: all quantum registers are laid out in one
state vector up front (declaration order), giving whole-program gate fusion
at the cost of the reference's lazy-register-fusion memory optimization
(ProgState.hs:137-166). Mid-circuit measurement, reset and creg-conditional
ops remain host-synchronizing boundaries, exactly as in the interpreter.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ..core.creg import CReg
from ..core.gates import Prim, is_diagonal, u3_matrix
from ..ops import measure as _measure
from ..ops.fusion import (CompiledCircuit, default_virtual_shards,
                          state_to_complex_virtual, zero_state_virtual)
from ..qasm import ast as A
from .interpreter import Interpreter
from .progstate import ProgState, blank_state

# -- event IR -----------------------------------------------------------------


@dataclass(frozen=True)
class EvGates:
    prims: tuple[Prim, ...]


@dataclass(frozen=True)
class EvMeasure:
    """One measurement EVENT: possibly several source statements' worth of
    qubits, measured sequentially in one device program (adjacent measure
    statements coalesce — e.g. the Cuccaro adder's per-bit readout becomes
    ONE dispatch instead of two per bit).

    ``writes``: per original statement, (creg, bit_index_or_None, count) —
    count qubits are consumed in order; bit_index None = whole-register
    write."""

    qubits: tuple[int, ...]        # absolute qubit indices, in order
    writes: tuple[tuple[str, int | None, int], ...]


@dataclass(frozen=True)
class EvReset:
    qubits: tuple[int, ...]


@dataclass(frozen=True)
class EvCond:
    creg: str
    value: int
    body: tuple


@dataclass(frozen=True)
class EvDump:
    pass


class _Elaborator(Interpreter):
    """Static elaborator: reuses the interpreter's dispatch/binding logic but
    *records* primitives and events instead of touching device state."""

    def __init__(self, ps: ProgState):
        super().__init__(ps)
        self.layout: dict[str, int] = {}  # qreg name -> first absolute qubit
        self.n = 0
        self.events: list = []
        self._sink: list | None = None  # redirection for Cond bodies

    # -- event plumbing ---------------------------------------------------------

    def _emit(self, ev):
        target = self._sink if self._sink is not None else self.events
        if isinstance(ev, EvGates) and target and isinstance(target[-1], EvGates):
            target[-1] = EvGates(target[-1].prims + ev.prims)
        elif isinstance(ev, EvMeasure) and target and isinstance(target[-1], EvMeasure):
            prev = target[-1]
            target[-1] = EvMeasure(prev.qubits + ev.qubits,
                                   prev.writes + ev.writes)
        else:
            target.append(ev)

    def _abs_qubits(self, arg: A.Arg) -> list[int]:
        ps = self.ps
        view = ps.find(arg.name, ps.qregs)
        base = self.layout[arg.name]
        if isinstance(arg, A.ArgBit):
            self._check_index(arg, view.size)
            return [base + arg.index]
        return [base + k for k in range(view.size)]

    # -- overridden statement handlers ----------------------------------------------

    def run_stmt(self, stmt: A.Stmt):
        if isinstance(stmt, A.PosInfo):
            self.ps.pos = stmt.pos
            self.run_stmt(stmt.stmt)
        elif isinstance(stmt, A.QRegDecl):
            # register bookkeeping WITHOUT the engine's 2^n allocation
            # (elaboration is static; the compiled program owns one flat
            # layout, and the stabilizer/MPS backends run 100+-qubit
            # programs where a dense zero state cannot exist at all)
            from .progstate import QRegView

            ps = self.ps
            ps.check_name_conflict(stmt.name, ps.qregs)
            ps.check_name_conflict(stmt.name, ps.stvecs)
            ps.qregs[stmt.name] = QRegView(stmt.name, 0, stmt.size)
            ps.stvecs[stmt.name] = None
            self.layout[stmt.name] = self.n
            self.n += stmt.size
        elif isinstance(stmt, A.Cond):
            # creg values are runtime data: record a conditional event
            self.ps.find(stmt.creg, self.ps.cregs)  # existence check
            prev, self._sink = self._sink, []
            try:
                self.run_qop(stmt.op)
            finally:
                body, self._sink = self._sink, prev
            self._emit(EvCond(stmt.creg, stmt.value, tuple(body)))
        else:
            super().run_stmt(stmt)

    def run_qop(self, op: A.QuantumOp):
        if isinstance(op, A.Measure):
            src, tgt = op.source, op.target
            qubits = tuple(self._abs_qubits(src))
            ps = self.ps
            cr = ps.find(tgt.name, ps.cregs)
            if isinstance(tgt, A.ArgBit):
                if not tgt.index < cr.size:
                    ps.runtime_error(f"Index out of bounds when writing to {tgt.name}")
                self._emit(EvMeasure(qubits, ((tgt.name, tgt.index, len(qubits)),)))
            else:
                if len(qubits) != cr.size:
                    ps.runtime_error(f"Mismatched size on overwrite of {tgt.name}")
                self._emit(EvMeasure(qubits, ((tgt.name, None, len(qubits)),)))
        elif isinstance(op, A.Reset):
            self._emit(EvReset(tuple(self._abs_qubits(op.arg))))
        else:
            super().run_qop(op)

    def run_uop(self, op: A.UnitaryOp):
        if isinstance(op, A.U):
            u = u3_matrix(self.eval_expr(op.theta), self.eval_expr(op.phi),
                          self.eval_expr(op.lam))
            diag = is_diagonal(u)
            table = np.diag(u).copy() if diag else u
            prims = tuple(Prim(table, (q,), diag) for q in self._abs_qubits(op.arg))
            self._emit(EvGates(prims))
        elif isinstance(op, A.CX):
            self.cx(op.control, op.target)
        elif isinstance(op, A.Dump):
            self._emit(EvDump())
        else:
            super().run_uop(op)  # Func expansion / Barrier

    def _apply_2q(self, u, qr1, i, qr2, j):
        q1 = self.layout[qr1] + i
        q2 = self.layout[qr2] + j
        if q1 == q2:
            self.ps.runtime_error(f"CX with identical control and target qubit: {qr1}[{i}]")
        self._emit(EvGates((Prim(u, (q1, q2)),)))

def elaborate(ast):
    """Statically elaborate a program to its flat event stream. Returns
    (n, events, cregs0, layout, qreg_sizes) — shared by the compiled
    state-vector executor and the stabilizer backend."""
    ps = blank_state(0)
    elab = _Elaborator(ps)
    for stmt in ast:
        elab.run_stmt(stmt)
    qreg_sizes = {name: ps.qregs[name].size for name in ps.qregs}
    return elab.n, list(elab.events), dict(ps.cregs), dict(elab.layout), qreg_sizes


def _ev_desc(ev) -> str:
    if isinstance(ev, EvGates):
        return f"EvGates({len(ev.prims)} prims)"
    if isinstance(ev, EvMeasure):
        return f"EvMeasure({len(ev.qubits)} qubits)"
    return type(ev).__name__


def _force_state(state, v: int):
    """Scalar readback so verbose timings reflect device completion."""
    if state is None:
        return
    x = (state[0] if v else state)[0]
    float(x[(0,) * getattr(x, "ndim", 1)])


class CompiledProgram:
    """A QASM program lowered to fused segments + host-level control flow."""

    def __init__(self, ast, max_block: int = 5, virtual_shards: int | None = None):
        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)
        self.max_block = max_block
        self._v_req = virtual_shards
        self._segments: dict[int, CompiledCircuit] = {}

    @property
    def v(self) -> int:
        """Virtual on-chip shard count (log2). Resolved lazily: the TPU
        backend needs 2^v shards past n=29 and every segment + the
        measure/collapse/sample paths must agree on the representation."""
        if self._v_req is None:
            self._v_req = default_virtual_shards(self.n)
        return self._v_req

    def _segment(self, key: int, prims) -> CompiledCircuit:
        if key not in self._segments:
            from ..utils.profiling import vlog

            circ = CompiledCircuit(self.n, prims, self.max_block,
                                   virtual_shards=self.v)
            vlog(f"segment: {circ.stats()}")
            self._segments[key] = circ
        return self._segments[key]

    def _measure_one(self, state, key, q):
        if self.v:
            return _measure.measure_qubit_sharded(state, key, q, self.n, self.v)
        outcome, state, key = _measure.measure_qubit(state, key, q, self.n)
        return int(outcome), state, key

    def _measure_many(self, state, key, qubits):
        """All of an EvMeasure's qubits in one device program (v=0)."""
        if self.v:
            bits = []
            for q in qubits:
                outcome, state, key = self._measure_one(state, key, q)
                bits.append(outcome)
            return bits, state, key
        outs, state, key = _measure.measure_qubits(state, key, tuple(qubits),
                                                   self.n)
        return [int(o) for o in np.asarray(outs)], state, key

    def _reset_one(self, state, q):
        if self.v:
            return _measure.collapse_sharded(state, 0, q, self.n, self.v)
        return _measure.collapse(state, np.int32(0), q, self.n)

    def run(self, seed: int | None = None, dump_writer=None):
        """Execute. Returns (state, cregs dict, key) — state is a plane pair,
        or a tuple of 2^v shard pairs when virtual sharding is active (n > 29
        on TPU); ``self.v`` tells which."""
        from ..utils.profiling import vtimed

        dump_writer = dump_writer or (lambda s: None)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        state = zero_state_virtual(self.n, self.v) if self.n else None
        cregs = dict(self.cregs0)

        def exec_events(events, state, key, path="r"):
            def sync():
                _force_state(state, self.v)

            for i, ev in enumerate(events):
                with vtimed(f"{path}[{i}] {_ev_desc(ev)}", sync):
                    if isinstance(ev, EvGates):
                        state = self._segment(id(ev), ev.prims)(state)
                    elif isinstance(ev, EvMeasure):
                        bits, state, key = self._measure_many(state, key, ev.qubits)
                        off = 0
                        for creg, bit_index, count in ev.writes:
                            if bit_index is None:
                                cregs[creg] = CReg.of(bits[off:off + count])
                            else:
                                cregs[creg] = cregs[creg].set_bit(bit_index, bits[off])
                            off += count
                    elif isinstance(ev, EvReset):
                        for q in ev.qubits:
                            state = self._reset_one(state, q)
                    elif isinstance(ev, EvCond):
                        if cregs[ev.creg].to_natural() == ev.value:
                            state, key = exec_events(ev.body, state, key,
                                                     path + f".c{i}")
                    elif isinstance(ev, EvDump):
                        dump_writer(self._pretty(state, cregs))
            return state, key

        state, key = exec_events(self.events, state, key)
        return state, cregs, key

    def run_sharded(self, mesh=None, seed: int | None = None, dump_writer=None,
                    banks: int | None = None):
        """Execute over a device mesh: unitary segments stream through
        :class:`qubism_tpu.parallel.ShardedSim` (amplitude sharding, ICI
        qubit-relabeling swaps, per-device sub-shard ``banks``),
        measurement/collapse via psum. Returns (sim, cregs, key).
        Validated on a virtual CPU mesh; identical code drives a real TPU
        slice."""
        import jax

        from ..parallel.mesh import make_mesh
        from ..parallel.sharded import ShardedSim

        if mesh is None or isinstance(mesh, int):
            # a k-qubit dense gate needs k shard-local qubits; keep >= 2
            limit = 1 << max(self.n - 2, 0)
            d = mesh if isinstance(mesh, int) else None
            if d is not None and d > limit:
                d = limit
            mesh = make_mesh(d)
            if mesh.devices.size > limit:
                mesh = make_mesh(max(limit, 1))
        dump_writer = dump_writer or (lambda s: None)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        sim = ShardedSim(self.n, mesh, banks=banks) if self.n else None
        cregs = dict(self.cregs0)

        def exec_events(events, key):
            for ev in events:
                if isinstance(ev, EvGates):
                    sim.apply(ev.prims)
                elif isinstance(ev, EvMeasure):
                    # one dispatch for the whole event (mirrors _measure_many)
                    bits, key = sim.measure_qubits(ev.qubits, key)
                    off = 0
                    for creg, bit_index, count in ev.writes:
                        if bit_index is None:
                            cregs[creg] = CReg.of(bits[off:off + count])
                        else:
                            cregs[creg] = cregs[creg].set_bit(bit_index, bits[off])
                        off += count
                elif isinstance(ev, EvReset):
                    for q in ev.qubits:
                        sim.collapse(q, 0)
                elif isinstance(ev, EvCond):
                    if cregs[ev.creg].to_natural() == ev.value:
                        key = exec_events(ev.body, key)
                elif isinstance(ev, EvDump):
                    from ..core.statevec import StateVec

                    amps = sim.amplitudes()
                    sv = StateVec(self.n, np.asarray(
                        [amps.real, amps.imag], dtype=np.float32))
                    dump_writer(self._pretty_for(sv, cregs))
            return key

        key = exec_events(self.events, key)
        return sim, cregs, key

    def _pretty_for(self, sv, cregs) -> str:
        name = "(x)".join(self.layout) if self.layout else ""
        out = ["Dump of the internal state: \n\n"]
        if sv is not None:
            out.append(f"State Vector {name}:\n{sv}")
        out.append("\n")
        for reg, base in sorted(self.layout.items()):
            out.append(
                f"QReg {reg}[{self.qreg_sizes[reg]}] -- targets state vector "
                f'"{name}" starting at qubit {base}\n'
            )
        out.append("\n")
        for cname in sorted(cregs):
            out.append(f"CReg {cname}[{cregs[cname].size}] = {cregs[cname]}\n")
        return "".join(out)

    def _pretty(self, state, cregs) -> str:
        from ..core.statevec import StateVec

        sv = None
        if state is not None:
            # state may be flat, canonical 2-D, or a shard tuple
            amps = state_to_complex_virtual(state, self.v)
            sv = StateVec(self.n, np.asarray([amps.real, amps.imag],
                                             dtype=np.float32))
        return self._pretty_for(sv, cregs)
