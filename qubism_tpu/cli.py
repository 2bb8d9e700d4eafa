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
import os
import sys

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
                   help="requested amplitude precision. The engine stores "
                        "amplitudes as float32 (re, im) planes (= complex64 "
                        "precision); complex128 is not available on TPU "
                        "backends and is rejected")
    p.add_argument("--backend",
                   choices=["statevector", "stabilizer", "mps", "density"],
                   default="statevector",
                   help="simulation engine: the dense state-vector engine "
                        "(default), the Clifford stabilizer-tableau engine "
                        "(O(n^2) bits — thousands of qubits — but Clifford "
                        "gates only), the matrix-product-state engine "
                        "(bounded-entanglement circuits at 100+ qubits, "
                        "see --chi), or the exact density-matrix engine "
                        "(open-system: combine with --noise; 4^n amplitudes, "
                        "n <= 14 on one device — shard past that with "
                        "--mesh)")
    p.add_argument("--chi", type=int, default=32, metavar="X",
                   help="MPS bond dimension cap (--backend mps): simulation "
                        "is exact while the circuit's entanglement fits "
                        "(default 32)")
    p.add_argument("--trunc-budget", type=float, default=None, metavar="W",
                   help="adaptive MPS bond dimension (--backend mps, "
                        "non-trajectory runs): start at --chi and DOUBLE it "
                        "whenever an apply would push the accumulated "
                        "truncation weight past W (roll back + retry), up "
                        "to --max-chi; exceeding the budget at --max-chi "
                        "errors instead of returning a wrong spectrum")
    p.add_argument("--max-chi", type=int, default=256, metavar="X",
                   help="adaptive-chi growth ceiling for --trunc-budget "
                        "(default 256)")
    p.add_argument("--noise", metavar="SPEC", default=None,
                   help="circuit-level noise model, e.g. 'depolarizing:0.01' "
                        "or 'ad:0.05,pd:0.02' (channels: depolarizing, "
                        "amplitude-damping/ad, phase-damping/pd, bitflip/bf, "
                        "phaseflip/pf, dep2 — 2q depolarizing after every "
                        "2-qubit gate, readout/ro — a reporting flip at "
                        "measurement) — gate channels apply to every qubit a gate "
                        "touches; runs the program as vmapped quantum "
                        "trajectories (one device program for ALL shots)")
    p.add_argument("--trajectories", type=int, default=None, metavar="T",
                   help="run the program as T independent trajectories in one "
                        "vmapped device program (defaults to --shots; implies "
                        "per-shot mid-circuit measurement re-runs, which "
                        "plain --shots final-state sampling cannot give)")
    p.add_argument("--compile", action="store_true", dest="compile_mode",
                   help="lower the program to fused XLA segments (fast path; "
                        "registers are laid out in one state vector up front)")
    p.add_argument("--mesh", type=int, default=None, metavar="D",
                   help="run over a D-device mesh (amplitude sharding with "
                        "ICI qubit-relabeling swaps); implies --compile")
    p.add_argument("--fuse-width", type=int, default=5, metavar="K",
                   help="max qubits per fused dense block in --compile mode "
                        "(default 5; the TPU backend may cap lower)")
    p.add_argument("--observable", action="append", default=[],
                   metavar="PAULI",
                   help="print <P> for a Pauli string over the declared "
                        "qubits (e.g. ZZI; repeatable). Works on every "
                        "backend; in trajectory mode reports the "
                        "Monte-Carlo mean +- stderr")
    p.add_argument("--reference-compat", action="store_true",
                   help="replicate the reference's numerical quirks "
                        "(buggy u3, sqrt-Born sampling, truncated pi)")
    p.add_argument("-I", "--include-path", action="append", default=[],
                   metavar="DIR",
                   help="extra directory to search for include files "
                        "(after the includer-relative path; repeatable)")
    p.add_argument("--include-base", metavar="DIR", default=None,
                   help="directory REPL 'include' statements resolve "
                        "against (default: the current directory; file "
                        "mode always resolves relative to the includer, "
                        "matching the reference Parser.hs:244-247). "
                        "Changeable mid-session with ':cd DIR'")
    p.add_argument("--traj-engine", choices=["vmap", "fused", "auto"],
                   default="vmap",
                   help="trajectory executor for --noise on the statevector "
                        "backend: 'vmap' (default; bit-identical with "
                        "--mesh at a seed), 'fused' (batched-scan Pallas "
                        "path: realized mixture noise, in-graph MCWF "
                        "damping, mid-circuit measurement and feed-forward "
                        "— ~50x fewer state sweeps at large n; errors on "
                        "ineligible programs), 'auto' (fused when eligible)")
    p.add_argument("--verbose", action="store_true",
                   help="per-event timing + fusion statistics to stderr")
    return p


def _enable_compile_cache():
    """Persistent XLA compile cache: on remote-compile backends (axon
    tunnel) a cold jit shape costs 30-90 s — cached reruns make the
    interpreter/REPL usable there."""
    import os

    import jax

    try:
        d = os.environ.get("QUBISM_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "qubism_tpu", "jax_cache")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail the CLI on it
        pass


def _apply_flags(args):
    _enable_compile_cache()
    if getattr(args, "include_path", None):
        from .qasm import parser as _parser

        _parser.INCLUDE_PATH.extend(args.include_path)
    if getattr(args, "verbose", False):
        from .utils import profiling

        profiling.VERBOSE = True
    if args.dtype == "complex128":
        raise SystemExit(
            "qubism: complex128 amplitudes are not supported: the engine "
            "stores float32 (re, im) planes (complex64 precision), which is "
            "what TPU hardware provides")
    if args.reference_compat:
        config.reference_u3_bug = True
        config.reference_sqrt_born = True
        config.reference_truncated_pi = True


def eval_file(path: str, seed: int | None = None, dump_state: bool = False,
              shots: int | None = None, out=None, compile_mode: bool = False,
              fuse_width: int = 5, mesh: int | None = None,
              backend: str = "statevector", chi: int = 32,
              noise: str | None = None,
              trajectories: int | None = None,
              observables=(), traj_engine: str = "vmap",
              trunc_budget: float | None = None,
              max_chi: int = 256) -> int:
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
        if backend == "density":
            from .run.noisy import DensityProgram

            if compile_mode or trajectories:
                print("qubism: --backend density is exact (no compile/"
                      "trajectories)", file=out)
                return 2
            try:
                # --mesh shards the vectorized rho over the device mesh
                # (parallel/density.py): exact open-system runs past the
                # single-buffer n=14 cap
                prog = DensityProgram(ast, noise=noise, mesh=mesh)
            except ValueError as e:
                print(f"qubism: {e}", file=out)
                return 2
            try:
                rho, cregs = prog.run(seed=seed, dump_writer=out.write)
            except ValueError as e:
                # mesh-shape validation happens at allocation time (the
                # sharded rho needs enough local qubits per device)
                print(f"qubism: {e}", file=out)
                return 2
            if dump_state:
                out.write(prog._pretty(rho, cregs))
            if shots and prog.n:
                import jax as _jax

                counts = rho.sample(
                    shots, _jax.random.PRNGKey(0 if seed is None else seed))
                _print_basis_counts(counts, "(x)".join(prog.layout),
                                    shots, out)
            if observables and prog.n:
                rc_obs = _print_observables(observables, rho.expectation, out)
                if rc_obs:
                    return rc_obs
        elif noise is not None or trajectories is not None:
            from .run.noisy import TrajectoryProgram

            if compile_mode:
                print("qubism: --noise/--trajectories is its own execution "
                      "mode; drop --compile", file=out)
                return 2
            # --mesh in trajectory mode shards the BATCH over devices
            # (trajectories are embarrassingly parallel; no amplitude
            # sharding needed) — run/noisy.py:resolve_traj_mesh
            try:
                from .run.noisy import resolve_traj_mesh

                resolve_traj_mesh(mesh)
            except ValueError as e:
                print(f"qubism: {e}", file=out)
                return 2
            try:
                if backend == "stabilizer":
                    from .stabilizer.noise import StabilizerTrajectoryProgram

                    prog = StabilizerTrajectoryProgram(ast, noise=noise)
                elif backend == "mps":
                    from .mps.noise import MPSTrajectoryProgram

                    prog = MPSTrajectoryProgram(ast, noise=noise, chi=chi)
                else:
                    prog = TrajectoryProgram(ast, noise=noise)
            except ValueError as e:
                print(f"qubism: {e}", file=out)
                return 2
            ntraj = trajectories or shots or 512
            if not prog.n or (not prog.creg_names and not observables):
                print("qubism: trajectory mode reports classical-register "
                      "counts; the program declares none (add a creg or "
                      "--observable)", file=out)
                return 2
            try:
                # --traj-engine fused/auto routes eligible mixture-noise
                # sampling programs through the fused-Pallas trajectory
                # engine (run/traj_fused.py) — ~50x fewer state sweeps at
                # large n. Default stays "vmap": its stream is what the
                # mesh path reproduces bit-identically at a given seed.
                if type(prog) is TrajectoryProgram and mesh is None:
                    counts = (prog.counts(ntraj, seed=seed,
                                          engine=traj_engine)
                              if prog.creg_names else {})
                else:
                    # the fused engine has no mesh path and no MPS/
                    # stabilizer form: an EXPLICIT request must error
                    # (the flag documents "errors on ineligible
                    # programs"), not silently run another engine
                    if traj_engine == "fused":
                        why = ("--mesh" if mesh is not None
                               else type(prog).__name__)
                        print(f"qubism: --traj-engine fused is "
                              f"incompatible with {why}", file=out)
                        return 2
                    counts = (prog.counts(ntraj, seed=seed, mesh=mesh)
                              if prog.creg_names else {})
            except Exception:
                from .mps import NotAdjacentError
                from .run.traj_fused import FusedUnsupported
                from .stabilizer import NotCliffordError

                e = sys.exc_info()[1]
                if isinstance(e, NotCliffordError):
                    print(f"qubism: stabilizer trajectories: {e}", file=out)
                    return 1
                if isinstance(e, NotAdjacentError):
                    print(f"qubism: mps trajectories: {e}", file=out)
                    return 1
                if isinstance(e, FusedUnsupported):
                    # an explicit --traj-engine fused on an ineligible
                    # program: clean diagnostic, not a traceback
                    print(f"qubism: --traj-engine fused: {e} "
                          f"(drop the flag or use --traj-engine auto)",
                          file=out)
                    return 2
                raise
            if prog.creg_names:
                print(f"Counts over classical registers "
                      f"({ntraj} trajectories):", file=out)
                for row in sorted(counts):
                    print(f"  {row}: {counts[row]}", file=out)
            if observables:
                # ALL observables reduce on one trajectory run (the
                # per-pauli estimator would re-simulate k times)
                memo = {}

                def _compute(p_, _m=memo):
                    if not _m:
                        ups = [o.upper() for o in observables]
                        _m.update(zip(ups, prog.expectations(
                            ups, ntraj, seed=seed, mesh=mesh)))
                    return _m[p_]

                rc_obs = _print_observables(observables, _compute, out)
                if rc_obs:
                    return rc_obs
        elif backend == "stabilizer":
            from .stabilizer import NotCliffordError, StabilizerProgram

            if mesh:
                print("qubism: --mesh applies to the state-vector and density backends",
                      file=out)
                return 2
            prog = StabilizerProgram(ast)
            try:
                sim, cregs = prog.run(seed=seed, dump_writer=out.write)
            except NotCliffordError as e:
                print(f"qubism: stabilizer backend: {e}", file=out)
                return 1
            if dump_state:
                out.write(prog._pretty(sim, cregs))
            if shots and prog.n:
                _print_basis_counts(_sampled_bit_counts(sim.sample(shots)),
                                    "(x)".join(prog.layout), shots, out)
            if observables and prog.n:
                rc_obs = _print_observables(observables, sim.expectation, out)
                if rc_obs:
                    return rc_obs
        elif backend == "mps":
            from .mps import MPSProgram, NotAdjacentError

            if mesh:
                print("qubism: --mesh applies to the state-vector and density backends",
                      file=out)
                return 2
            prog = MPSProgram(ast, chi=chi, trunc_budget=trunc_budget,
                              max_chi=max_chi)
            try:
                sim, cregs = prog.run(seed=seed, dump_writer=out.write)
            except NotAdjacentError as e:
                print(f"qubism: mps backend: {e}", file=out)
                return 1
            except FloatingPointError as e:
                print(f"qubism: mps backend: {e}", file=out)
                return 1
            if dump_state:
                out.write(prog._pretty(sim, cregs))
            if shots and prog.n:
                _print_basis_counts(_sampled_bit_counts(sim.sample(shots)),
                                    "(x)".join(prog.layout), shots, out)
            if observables and prog.n:
                rc_obs = _print_observables(observables, sim.expectation, out)
                if rc_obs:
                    return rc_obs
        elif compile_mode or mesh:
            from .run.compiler import CompiledProgram

            prog = CompiledProgram(ast, max_block=fuse_width)
            if mesh:
                sim, cregs, key = prog.run_sharded(mesh=mesh, seed=seed,
                                                   dump_writer=out.write)
                from .utils.profiling import vlog

                vlog(f"mesh run: {sim.D} device(s) x 2^{sim.w} bank(s), "
                     f"{sim.m} local qubits/bank, "
                     f"{sim.dispatch_count} jitted dispatches")
                if dump_state and prog.n:
                    from .core.statevec import StateVec

                    amps = sim.amplitudes()
                    sv = StateVec(prog.n, amps)
                    out.write(prog._pretty_for(sv, cregs))
                if shots and prog.n:
                    import numpy as _np

                    idx = sim.sample(shots, key)
                    vals, counts = _np.unique(idx, return_counts=True)
                    name = "(x)".join(prog.layout)
                    print(f"Counts for state vector {name} ({shots} shots):", file=out)
                    for v_, c_ in zip(vals, counts):
                        print(f"  |{format(int(v_), f'0{prog.n}b')}>: {int(c_)}", file=out)
                if observables and prog.n:
                    rc_obs = _print_observables(observables, sim.expectation,
                                                out)
                    if rc_obs:
                        return rc_obs
            else:
                state, cregs, key = prog.run(seed=seed, dump_writer=out.write)
                if dump_state:
                    out.write(prog._pretty(state, cregs))
                if shots and prog.n:
                    _print_counts_for(state, prog.n, "(x)".join(prog.layout),
                                      shots, key, out, v=prog.v)
                if observables and prog.n:
                    from .ops.measure import (expectation_pauli,
                                              expectation_pauli_virtual)

                    def _exp(p_, _s=state):
                        if prog.v:
                            return expectation_pauli_virtual(
                                _s, prog.n, prog.v, p_)
                        return expectation_pauli(_s, prog.n, p_)

                    rc_obs = _print_observables(observables, _exp, out)
                    if rc_obs:
                        return rc_obs
        else:
            ps = run_program(ast, seed=seed)
            if dump_state:
                out.write(ps.pretty())
            if shots:
                _print_shot_counts(ps, shots, out)
            if observables and ps.qregs:
                rc_obs = _print_observables(
                    observables, lambda p_: _interp_expectation(ps, p_), out)
                if rc_obs:
                    return rc_obs
    except QasmRuntimeError as e:
        print(e, file=out)
        return 1
    print("Done.", file=out)
    return 0


def _print_shot_counts(ps: ProgState, shots: int, out):
    for name in sorted(ps.stvecs):
        sv = ps.stvecs[name]
        _print_counts_for(sv.planes, sv.n, name, shots, ps.key, out)


def _print_counts_for(planes, n, name, shots, key, out, v: int = 0):
    from .ops.sample import sample_counts

    _print_basis_counts(sample_counts(planes, n, shots, key, v=v),
                        name, shots, out)


def _print_basis_counts(counts, name, shots, out):
    """The `Counts for state vector ...` block shared by every shots
    path; ``counts`` maps basis bitstring -> count."""
    print(f"Counts for state vector {name} ({shots} shots):", file=out)
    for basis in sorted(counts):
        print(f"  |{basis}>: {counts[basis]}", file=out)


def _sampled_bit_counts(bits):
    """(shots, n) 0/1 sample rows -> Counter of basis bitstrings."""
    import collections

    return collections.Counter("".join("01"[b] for b in row)
                               for row in bits)


def _print_observables(observables, compute, out) -> int:
    """Print one ``<P> = value`` line per --observable; ``compute(pauli)``
    returns a float or a (mean, stderr) pair. Returns 0 on success, 2 on
    a rejected Pauli string, 1 on an engine-capability error (matching
    the rc the counts path gives for the same circuit)."""
    for pauli in observables:
        try:
            val = compute(pauli.upper())
        except ValueError as e:
            from .mps import NotAdjacentError
            from .stabilizer import NotCliffordError

            if isinstance(e, NotCliffordError):
                print(f"qubism: stabilizer trajectories: {e}", file=out)
                return 1
            if isinstance(e, NotAdjacentError):
                print(f"qubism: mps trajectories: {e}", file=out)
                return 1
            print(f"qubism: --observable: {e}", file=out)
            return 2
        if isinstance(val, tuple):
            print(f"<{pauli.upper()}> = {val[0]:.6f} +- {val[1]:.6f}",
                  file=out)
        else:
            print(f"<{pauli.upper()}> = {float(val):.6f}", file=out)
    return 0


def _interp_expectation(ps: ProgState, pauli: str) -> float:
    """<P> on the interpreter's lazily-fused state: the global state is a
    tensor product of clusters (ProgState.stvecs), so <P> factorizes into
    the product of per-cluster expectations. Qubit order = qreg
    declaration order, matching the compiled layout."""
    from .ops.measure import _check_pauli

    slots = [(qr.target, qr.start + k)
             for qr in ps.qregs.values() for k in range(qr.size)]
    pauli = _check_pauli(pauli, len(slots))
    per: dict = {}
    for (tgt, local), c in zip(slots, pauli):
        per.setdefault(tgt, {})[local] = c
    val = 1.0
    for tgt, assign in per.items():
        sv = ps.stvecs[tgt]
        s = "".join(assign.get(i, "I") for i in range(sv.n))
        if set(s) != {"I"}:
            val *= sv.expectation(s)
    return val


class Repl:
    """The QASM REPL: incremental parse + incremental run, atomic lines."""

    PROMPT = "QASM> "

    def __init__(self, seed: int | None = None, out=None,
                 include_base: str | None = None):
        # REPL lines have no source file, so 'include' resolves relative to
        # ``include_base`` (default: the current directory — matching the
        # reference only when launched from the project dir, Parser.hs:244).
        # A pseudo file path inside that dir makes the includer-relative
        # rule do the work; ':cd DIR' rebases it mid-session.
        base = os.path.abspath(include_base or os.getcwd())
        self.pstate: ParserState = initial_state(os.path.join(base, "<repl>"))
        self.prog: ProgState = blank_state(seed)
        self.out = out or sys.stdout

    def line(self, text: str) -> bool:
        """Process one input line. Returns False when the REPL should exit."""
        stripped = text.strip()
        if stripped == ":q":
            return False
        if stripped == ":cd" or stripped.startswith(":cd "):
            arg = stripped[3:].strip()
            base = os.path.abspath(arg or os.getcwd())
            if not os.path.isdir(base):
                print(f"qubism: :cd: no such directory: {base}",
                      file=self.out)
                return True
            self.pstate = ParserState(dict(self.pstate.id_table),
                                      os.path.join(base, "<repl>"))
            print(f"include base: {base}", file=self.out)
            return True
        if stripped.startswith(":save ") or stripped.startswith(":load "):
            return self._checkpoint_cmd(stripped)
        if stripped.startswith(":observable ") or stripped.startswith(":obs "):
            pauli = stripped.split(None, 1)[1].rstrip(";").strip()
            try:
                val = _interp_expectation(self.prog, pauli.upper())
            except ValueError as e:
                print(f"qubism: :observable: {e}", file=self.out)
                return True
            print(f"<{pauli.upper()}> = {val:.6f}", file=self.out)
            return True
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
            interp.flush()  # materialize the line's trailing unitary run
        except QasmRuntimeError as e:
            print(e, file=self.out)
            return True  # discard: both parser and program state stay put
        self.pstate = pstate2
        self.prog = new
        return True

    def _checkpoint_cmd(self, stripped: str) -> bool:
        """``:save <path>`` / ``:load <path>``: checkpoint/resume the full
        session (simulator state + parser symbol table). Extension over the
        reference, which only checkpoints in memory."""
        from .utils.checkpoint import load_progstate, save_progstate

        cmd, _, path = stripped.partition(" ")
        path = path.strip()
        try:
            if cmd == ":save":
                save_progstate(self.prog, path, self.pstate)
                print(f"Saved session to {path}", file=self.out)
            else:
                ps, pstate = load_progstate(path)
                if ps.key is None:
                    ps.key = self.prog.key
                self.prog = ps
                if pstate is not None:
                    self.pstate = pstate
                print(f"Loaded session from {path}", file=self.out)
        except OSError as e:
            print(f"qubism: {e}", file=self.out)
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
                         shots=args.shots, compile_mode=args.compile_mode,
                         fuse_width=args.fuse_width, mesh=args.mesh,
                         backend=args.backend, chi=args.chi,
                         noise=args.noise, trajectories=args.trajectories,
                         observables=args.observable,
                         traj_engine=args.traj_engine,
                         trunc_budget=args.trunc_budget,
                         max_chi=args.max_chi)
    Repl(seed=args.seed,
         include_base=getattr(args, "include_base", None)).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
