"""Native (C++) components, loaded via ctypes with graceful fallback.

The reference is pure Haskell with no in-repo native code; here the runtime
keeps a small native core for host-side hot paths: the OpenQASM tokenizer
(machine-generated benchmark circuits reach megabytes, where Python
tokenization dominates parse time — the native core is ~40x faster).

The shared library is built on demand with g++ (`ensure_built()`); if no
compiler is available the pure-Python implementations are used silently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "qasm_lexer.cpp")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _so_path() -> str:
    """Shared-library path keyed by the SOURCE CONTENT hash: a fresh checkout
    gives every file the same mtime, so an mtime comparison can load a stale
    binary after qasm_lexer.cpp changes; a content-hashed name cannot."""
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_qasm_lexer-{h}.so")


def ensure_built():
    """Build (if needed) and load the native lexer. Returns the ctypes lib
    or None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            so = _so_path()
            built = False
            if not os.path.exists(so):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                built = True
            lib = ctypes.CDLL(so)
            if built:
                # drop binaries for superseded source hashes — only AFTER a
                # successful dlopen of the new one, so a concurrent process
                # between its exists-check and CDLL never has its (older)
                # .so unlinked before it could load it and fall back
                import glob

                for old in glob.glob(os.path.join(_DIR, "_qasm_lexer-*.so")):
                    if old != so:
                        try:
                            os.unlink(old)
                        except OSError:
                            pass
            lib.qasm_lex.restype = ctypes.c_long
            lib.qasm_lex.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long, ctypes.POINTER(ctypes.c_long),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_tokenize(text: str, file: str = ""):
    """Tokenize with the native core. Returns a list of Tok (same contract
    as qubism_tpu.qasm.lexer.tokenize) or None if unavailable / on any
    error (callers fall back to the Python lexer, which produces the
    proper diagnostics)."""
    lib = ensure_built()
    if lib is None:
        return None
    from ..qasm.lexer import RESERVED, Tok
    from ..qasm.ast import SourcePos

    data = text.encode("utf-8")
    # token count is bounded by byte length
    cap = max(16, len(data))
    kinds = (ctypes.c_uint8 * cap)()
    starts = (ctypes.c_long * cap)()
    lengths = (ctypes.c_long * cap)()
    values = (ctypes.c_double * cap)()
    lines = (ctypes.c_long * cap)()
    cols = (ctypes.c_long * cap)()
    err_pos = ctypes.c_long(0)
    count = lib.qasm_lex(data, len(data), kinds, starts, lengths, values,
                         lines, cols, cap, ctypes.byref(err_pos))
    if count < 0:
        return None

    toks = []
    append = toks.append
    for t in range(count):
        k = kinds[t]
        pos = SourcePos(file, lines[t], cols[t])
        s = starts[t]
        ln = lengths[t]
        if k == 0:
            word = data[s : s + ln].decode()
            append(Tok("kw" if word in RESERVED else "ident", word, pos))
        elif k == 1:
            # decode from the source span: round-tripping through the C
            # double loses precision for integer literals above 2^53
            append(Tok("nat", int(data[s : s + ln]), pos))
        elif k == 2:
            append(Tok("real", values[t], pos))
        elif k == 3:
            append(Tok("sym", data[s : s + ln].decode(), pos))
        elif k == 4:
            append(Tok("str", data[s : s + ln].decode(), pos))
        else:
            append(Tok("dump", ":dump", pos))
    # true end-of-input position (the Python lexer reports it after any
    # trailing whitespace/newlines)
    end_line = data.count(b"\n") + 1
    last_nl = data.rfind(b"\n")
    end_col = (len(data) - last_nl) if last_nl >= 0 else len(data) + 1
    append(Tok("eof", None, SourcePos(file, end_line, end_col)))
    return toks
