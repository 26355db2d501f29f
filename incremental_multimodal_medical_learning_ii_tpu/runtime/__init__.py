"""Native (C++) runtime: mmap embedding store + prefetching batcher.

Build is lazy and cached: the shared library compiles on first use with the
system g++ (no pip-installable build deps in this image).  Everything has a
pure-numpy fallback — see data/native.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "embstore.cpp"
_LIB = Path(__file__).parent / "libembstore.so"

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def build_library(force: bool = False) -> Path:
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    # compile to a per-pid temp path and rename atomically: two concurrent
    # processes (multi-host extraction on one machine) racing the build must
    # never dlopen a half-written .so
    import os

    tmp = _LIB.with_suffix(f".so.tmp{os.getpid()}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
    finally:
        tmp.unlink(missing_ok=True)
    return _LIB


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load; returns None when no toolchain exists."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        path = build_library()
        lib = ctypes.CDLL(str(path))
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        # OSError covers a present-but-unloadable .so (foreign arch/ABI from
        # a checkout); the numpy fallback must win, not a crash
        _build_error = str(e)
        return None
    u64, i64 = ctypes.c_uint64, ctypes.c_int64
    p = ctypes.c_void_p
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint64)

    lib.embstore_write.argtypes = [ctypes.c_char_p, fp, fp, u64, u64, u64]
    lib.embstore_write.restype = ctypes.c_int
    lib.embstore_open.argtypes = [ctypes.c_char_p]
    lib.embstore_open.restype = p
    for fn in ("embstore_n", "embstore_emb_dim", "embstore_n_labels"):
        getattr(lib, fn).argtypes = [p]
        getattr(lib, fn).restype = u64
    lib.embstore_gather.argtypes = [p, up, u64, fp, fp]
    lib.embstore_gather.restype = None
    lib.embstore_close.argtypes = [p]
    lib.embstore_close.restype = None
    lib.batcher_create.argtypes = [p, i64, i64, ctypes.c_int, u64]
    lib.batcher_create.restype = p
    lib.batcher_start_epoch.argtypes = [p]
    lib.batcher_start_epoch.restype = None
    lib.batcher_next.argtypes = [p, fp, fp, fp]
    lib.batcher_next.restype = i64
    lib.batcher_destroy.argtypes = [p]
    lib.batcher_destroy.restype = None
    _lib = lib
    return lib
