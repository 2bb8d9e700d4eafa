"""Checkpoint / resume of interpreter state.

The reference's only "checkpointing" is the in-memory incremental REPL state
(SURVEY.md §5). Here the full :class:`ProgState` — every (possibly large)
state vector, register views, classical registers, user gate table, PRNG
key — serializes to a single ``.npz`` file, so long runs can stop and resume
(REPL ``:save``/``:load`` or the library API). The parser symbol table can
ride along so a resumed REPL also remembers declarations.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ..core.creg import CReg
from ..core.statevec import StateVec
from ..qasm.ast import SourcePos
from ..qasm.parser import ParserState
from ..qasm.serialize import from_jsonable, to_jsonable
from ..run.progstate import CustomGate, ProgState, QRegView


def save_progstate(ps: ProgState, path: str, parser_state: ParserState | None = None):
    """Serialize ``ps`` (and optionally the parser symbol table) to ``path``."""
    arrays: dict[str, np.ndarray] = {}
    svmeta = {}
    for name, sv in ps.stvecs.items():
        arrays[f"sv_{name}"] = np.asarray(jax.device_get(sv.planar))
        svmeta[name] = sv.n
    if ps.key is not None:
        arrays["prng_key"] = np.asarray(jax.device_get(jax.random.key_data(ps.key)))
    meta = {
        "svs": svmeta,
        "qregs": {k: [v.target, v.start, v.size] for k, v in ps.qregs.items()},
        "cregs": {k: list(v.bits) for k, v in ps.cregs.items()},
        "funcs": {
            k: {"params": list(f.params), "args": list(f.args),
                "body": to_jsonable(f.body)}
            for k, f in ps.funcs.items()
        },
        "pos": [ps.pos.file, ps.pos.line, ps.pos.col],
        "id_table": (
            {k: [p.file, p.line, p.col] for k, p in parser_state.id_table.items()}
            if parser_state is not None else None
        ),
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_progstate(path: str) -> tuple[ProgState, ParserState | None]:
    """Load a checkpoint. Returns (ProgState, ParserState-or-None)."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    ps = ProgState()
    for name, n in meta["svs"].items():
        ps.stvecs[name] = StateVec(n, np.asarray(data[f"sv_{name}"]))
    ps.qregs = {k: QRegView(t, s, z) for k, (t, s, z) in meta["qregs"].items()}
    ps.cregs = {k: CReg(tuple(bits)) for k, bits in meta["cregs"].items()}
    ps.funcs = {
        k: CustomGate(tuple(f["params"]), tuple(f["args"]), from_jsonable(f["body"]))
        for k, f in meta["funcs"].items()
    }
    ps.pos = SourcePos(*meta["pos"])
    if "prng_key" in data:
        ps.key = jax.random.wrap_key_data(np.asarray(data["prng_key"]))
    pstate = None
    if meta["id_table"] is not None:
        pstate = ParserState(
            {k: SourcePos(*v) for k, v in meta["id_table"].items()}, None
        )
    return ps, pstate
