"""Build + ctypes bindings for the native fastio library."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "fastio.cpp")


def _try_load(path: str):
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def _build_lib():
    """Compile fastio.cpp into a cached .so and LOAD it; returns the loaded
    CDLL or None.  Loading is part of the build contract: a .so that
    compiles but cannot be dlopen'ed (e.g. -fopenmp links but libgomp is
    missing from the loader path) must not be cached, or every future
    process would silently lose the native path."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("IS3D_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(), "is3d_native"))
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"fastio_{tag}.so")
    if os.path.exists(so_path):
        lib = _try_load(so_path)
        if lib is not None:
            return lib
        try:                       # stale unloadable artifact: rebuild
            os.remove(so_path)
        except OSError:
            pass
    tmp = so_path + f".tmp{os.getpid()}"
    # -fopenmp parallelizes the OSCAR formatter; on toolchains without
    # OpenMP support (e.g. clang masquerading as g++) retry without it --
    # the pragmas are documented no-ops single-threaded
    for extra in (["-fopenmp"], []):
        cmd = ["g++", "-O3", *extra, "-shared", "-fPIC", "-o", tmp, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            continue
        lib = _try_load(tmp)       # verify BEFORE caching
        if lib is None:
            try:
                os.remove(tmp)
            except OSError:
                pass
            continue
        try:                       # dlopen holds the inode; rename is safe
            os.replace(tmp, so_path)
        except OSError:
            pass
        return lib
    return None


def get_fastio():
    """The loaded ctypes library, or None if unavailable.  Thread-safe:
    concurrent first callers block on the build lock instead of racing to
    a premature None (the lock-free fast path tests only _lib)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            lib = _build_lib()
            if lib is not None:
                lib.parse_doubles.restype = ctypes.c_longlong
                lib.parse_doubles.argtypes = [
                    ctypes.c_char_p, ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_double), ctypes.c_longlong]
                lib.count_doubles.restype = ctypes.c_longlong
                lib.count_doubles.argtypes = [ctypes.c_char_p,
                                              ctypes.c_longlong]
                dp = ctypes.POINTER(ctypes.c_double)
                lib.write_oscar_event.restype = ctypes.c_longlong
                lib.write_oscar_event.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_longlong)] + [dp] * 8
                lib.write_sci_table.restype = ctypes.c_longlong
                lib.write_sci_table.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, dp,
                    ctypes.c_longlong, ctypes.c_int, ctypes.c_longlong]
                _lib = lib
    return _lib


def fast_parse_doubles(data: bytes) -> np.ndarray | None:
    """Parse all numeric tokens in ``data``; None if native lib unavailable
    or a token is not numeric (caller falls back).  ``data`` must be a
    bytes object (CPython NUL-terminates it, which the C side requires)."""
    lib = get_fastio()
    if lib is None:
        return None
    n = lib.count_doubles(data, len(data))
    if n < 0:
        return None
    out = np.empty(int(n), dtype=np.float64)
    got = lib.parse_doubles(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n)
    if got != n:
        return None
    return out


def fast_write_sci_table(path: str, append: bool, header: str | None,
                         rows: np.ndarray, blank_every: int) -> bool:
    """Append ``rows`` (2-D float64, C-contiguous) as tab-separated %.8e
    lines with a blank line after every ``blank_every`` rows; False if the
    native lib is unavailable or the write failed (caller falls back to
    the byte-identical Python loop)."""
    lib = get_fastio()
    if lib is None:
        return False
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    if rows.ndim != 2:
        return False
    got = lib.write_sci_table(
        path.encode(), 1 if append else 0,
        header.encode() if header else None,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.shape[0], rows.shape[1], int(blank_every))
    return got == rows.shape[0]


def fast_write_oscar_event(path: str, append: bool, ev: dict) -> bool:
    """Append one event's OSCAR block natively; False if the native lib is
    unavailable or the write failed (caller falls back to the Python
    loop)."""
    lib = get_fastio()
    if lib is None:
        return False
    mcid = np.ascontiguousarray(ev["mcid"], dtype=np.int64)
    n = len(mcid)
    cols = [np.ascontiguousarray(ev[k], dtype=np.float64)
            for k in ("t", "x", "y", "z", "E", "px", "py", "pz")]
    if any(len(c) != n for c in cols):
        # a ragged event would make the C side read out of bounds; let the
        # Python fallback raise the clean IndexError instead
        return False
    dp = ctypes.POINTER(ctypes.c_double)
    got = lib.write_oscar_event(
        path.encode(), 1 if append else 0, n,
        mcid.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        *[c.ctypes.data_as(dp) for c in cols])
    return got == n
