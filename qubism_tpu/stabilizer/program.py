"""Run whole OpenQASM programs on the stabilizer backend.

Reuses the compiler's static elaborator (AST -> flat event stream with
user gates expanded and registers laid out absolutely,
run/compiler.py:elaborate) and executes the events on a
:class:`~qubism_tpu.stabilizer.tableau.StabilizerSim`: gate runs become
one jit-fused tableau chain each, measurement/reset/feed-forward follow
the same host-control-flow contract as the state-vector executors
(reference Simulation.hs:55-76 semantics). Any non-Clifford gate raises
:class:`~qubism_tpu.stabilizer.tableau.NotCliffordError` at elaboration
of its first EvGates event.
"""

from __future__ import annotations

import jax

from ..core.creg import CReg
from .tableau import StabilizerSim, stabilizer_strings


class StabilizerProgram:
    """A QASM program executed on the tableau engine."""

    def __init__(self, ast):
        from ..run.compiler import elaborate

        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)

    def run(self, seed: int | None = None, dump_writer=None):
        """Execute; returns (sim, cregs). ``sim`` is the StabilizerSim
        (None for a program with no qregs)."""
        from ..run.compiler import EvCond, EvDump, EvGates, EvMeasure, EvReset

        dump_writer = dump_writer or (lambda s: None)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        sim = StabilizerSim(self.n, key=key) if self.n else None
        cregs = dict(self.cregs0)

        def exec_events(events):
            for ev in events:
                if isinstance(ev, EvGates):
                    sim.apply(ev.prims)
                elif isinstance(ev, EvMeasure):
                    bits = sim.measure_qubits(ev.qubits)
                    off = 0
                    for creg, bit_index, count in ev.writes:
                        if bit_index is None:
                            cregs[creg] = CReg.of(bits[off:off + count])
                        else:
                            cregs[creg] = cregs[creg].set_bit(bit_index, bits[off])
                        off += count
                elif isinstance(ev, EvReset):
                    for q in ev.qubits:
                        sim.reset(q)
                elif isinstance(ev, EvCond):
                    if cregs[ev.creg].to_natural() == ev.value:
                        exec_events(ev.body)
                elif isinstance(ev, EvDump):
                    dump_writer(self._pretty(sim, cregs))

        exec_events(self.events)
        return sim, cregs

    def _pretty(self, sim, cregs) -> str:
        out = ["Dump of the internal state (stabilizer backend): \n\n"]
        if sim is not None:
            name = "(x)".join(self.layout) if self.layout else ""
            out.append(f"Stabilizers of {name}:\n")
            for row in stabilizer_strings(sim.tab, sim.n):
                out.append(f"  {row}\n")
            for reg, base in sorted(self.layout.items()):
                out.append(
                    f"QReg {reg}[{self.qreg_sizes[reg]}] -- qubits "
                    f"{base}..{base + self.qreg_sizes[reg] - 1}\n")
        out.append("\n")
        for cname in sorted(cregs):
            out.append(f"CReg {cname}[{cregs[cname].size}] = {cregs[cname]}\n")
        return "".join(out)
