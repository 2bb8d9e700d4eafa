"""Command-line interface: file evaluation and the QASM REPL.

Counterpart of reference app/Main.hs: ``qubism file.qasm`` evaluates a file
and prints "Done."; ``qubism`` with no file starts a ``QASM> `` REPL where
parser symbol table and simulator state persist across lines and a failing
line leaves both untouched (atomic lines, Main.hs:39-57). ``:q`` quits.

Beyond the reference (which had no flags at all): ``--seed`` for reproducible
measurement, ``--shots`` to sample a measurement-free circuit's final state
many times, ``--dtype``, ``--dump-state``, and the reference-compat quirk
flags.
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp

from .config import config
from .qasm.parser import (
    QasmParseError,
    ParserState,
    initial_state,
    parse_openqasm,
    parse_openqasm_incremental,
)
from .run.interpreter import Interpreter, run_program
from .run.progstate import ProgState, QasmRuntimeError, blank_state


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="qubism",
        description="TPU-native OpenQASM 2.0 simulator (file mode or REPL)",
    )
    p.add_argument("file", nargs="?", help="QASM file to evaluate; omit for a REPL")
    p.add_argument("--seed", type=int, default=None, help="PRNG seed for measurements")
    p.add_argument("--shots", type=int, default=None,
                   help="sample the final state this many times and print counts")
    p.add_argument("--dump-state", action="store_true",
                   help="print the final internal state (like a trailing :dump)")
    p.add_argument("--dtype", choices=["complex64", "complex128"], default=None,
                   help="amplitude dtype (default complex64)")
    p.add_argument("--reference-compat", action="store_true",
                   help="replicate the reference's numerical quirks "
                        "(buggy u3, sqrt-Born sampling, truncated pi)")
    return p


def _apply_flags(args):
    if args.dtype:
        config.dtype = jnp.complex128 if args.dtype == "complex128" else jnp.complex64
    if args.reference_compat:
        config.reference_u3_bug = True
        config.reference_sqrt_born = True
        config.reference_truncated_pi = True


def eval_file(path: str, seed: int | None = None, dump_state: bool = False,
              shots: int | None = None, out=None) -> int:
    """Evaluate a file (reference ``evalFile``, Main.hs:23-32). Returns exit code."""
    out = out or sys.stdout
    try:
        with open(path) as f:
            source = f.read()
    except OSError as e:
        print(f"qubism: {e}", file=out)
        return 2
    try:
        ast = parse_openqasm(path, source)
    except QasmParseError as e:
        out.write(e.pretty())
        return 1
    try:
        ps = run_program(ast, seed=seed)
    except QasmRuntimeError as e:
        print(e, file=out)
        return 1
    if dump_state:
        out.write(ps.pretty())
    if shots:
        _print_shot_counts(ps, shots, out)
    print("Done.", file=out)
    return 0


def _print_shot_counts(ps: ProgState, shots: int, out):
    from .ops.sample import sample_counts

    for name in sorted(ps.stvecs):
        sv = ps.stvecs[name]
        counts = sample_counts(sv.planar, sv.n, shots, ps.key)
        print(f"Counts for state vector {name} ({shots} shots):", file=out)
        for basis, c in sorted(counts.items()):
            print(f"  |{basis}>: {c}", file=out)


class Repl:
    """The QASM REPL: incremental parse + incremental run, atomic lines."""

    PROMPT = "QASM> "

    def __init__(self, seed: int | None = None, out=None):
        self.pstate: ParserState = initial_state(None)
        self.prog: ProgState = blank_state(seed)
        self.out = out or sys.stdout

    def line(self, text: str) -> bool:
        """Process one input line. Returns False when the REPL should exit."""
        if text.strip() == ":q":
            return False
        try:
            ast, pstate2 = parse_openqasm_incremental(self.pstate, text)
        except QasmParseError as e:
            self.out.write(e.pretty())
            return True
        new = self.prog.copy()
        interp = Interpreter(new, dump_writer=lambda s: self.out.write(s))
        try:
            for stmt in ast:
                interp.run_stmt(stmt)
        except QasmRuntimeError as e:
            print(e, file=self.out)
            return True  # discard: both parser and program state stay put
        self.pstate = pstate2
        self.prog = new
        return True

    def run(self, infile=sys.stdin):
        while True:
            self.out.write(self.PROMPT)
            self.out.flush()
            raw = infile.readline()
            if raw == "":  # EOF
                self.out.write("\n")
                return
            if not self.line(raw.rstrip("\n")):
                return


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    _apply_flags(args)
    if args.file:
        return eval_file(args.file, seed=args.seed, dump_state=args.dump_state,
                         shots=args.shots)
    Repl(seed=args.seed).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
