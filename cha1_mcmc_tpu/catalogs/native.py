"""ctypes bindings for the native SPCAT tokenizer (native/spcat_parser.cpp).

The shared library is built on demand with the repo Makefile; if the
toolchain or library is unavailable, callers fall back to the pure-Python
tokenizer in spcat.py (identical semantics — tested equal). Disable with
CHA1_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "tokenize_native"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspcat.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CHA1_NATIVE", "1") == "0":
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.spcat_parse.restype = ctypes.c_long
        lib.spcat_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def tokenize_native(text: bytes):
    """Tokenize raw catalog bytes. Returns the same field dict as the
    pure-Python tokenizer, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    max_lines = text.count(b"\n") + 1
    frequency = np.empty(max_lines, dtype=np.float64)
    error = np.empty(max_lines, dtype=np.float64)
    logint = np.empty(max_lines, dtype=np.float64)
    dof = np.empty(max_lines, dtype=np.int64)
    elower = np.empty(max_lines, dtype=np.float64)
    gup = np.empty(max_lines, dtype=np.int64)
    tag = np.empty(max_lines, dtype=np.int64)
    qnformat = np.empty(max_lines, dtype=np.int64)
    qn = np.empty(max_lines * 12, dtype=np.int64)
    n = lib.spcat_parse(text, len(text), max_lines, frequency, error, logint,
                        dof, elower, gup, tag, qnformat, qn)
    if n < 0:
        return None
    return dict(
        frequency=frequency[:n], error=error[:n], logint=logint[:n],
        dof=dof[:n], elower=elower[:n], gup=gup[:n], tag=tag[:n],
        qnformat=qnformat[:n], qn=qn[: n * 12].reshape(n, 12),
    )
