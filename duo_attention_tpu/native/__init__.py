"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its perf-critical host-side work in native code (CUDA
quantizer compiled as a torch extension, demo/int4_kv.py:49-56; torch's C++
checkpoint IO). Here the host-side hot path is checkpoint layout conversion
(models/convert.py): a blocked multithreaded transpose with the
DuoAttention head permutation fused in, compiled on first use with g++ and
cached next to the source. Falls back to numpy transparently when no
compiler is available (see models/convert.py call sites).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "checkpoint_ops.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_checkpoint_ops.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", _SRC, "-o", _LIB_PATH,
        ],
        check=True,
        capture_output=True,
    )


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            # The .so is never committed (gitignored): it is built locally
            # with -march=native on first use, so a binary compiled on a
            # different microarchitecture can never be loaded here.
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ct_transpose_gather.restype = ctypes.c_int
            lib.ct_transpose_gather.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ]
            lib.ct_memcpy_mt.restype = ctypes.c_int
            lib.ct_memcpy_mt.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ]
            _selftest(lib)
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def _selftest(lib) -> None:
    """Tiny numeric check before trusting the loaded binary."""
    src = np.arange(12, dtype=np.float32).reshape(3, 4)
    perm = np.asarray([2, 0, 1], dtype=np.int64)
    cperm = np.asarray([1, 0, 3, 2], dtype=np.int64)
    dst = np.empty((4, 3), dtype=np.float32)
    rc = lib.ct_transpose_gather(
        src.ctypes.data, dst.ctypes.data, 3, 4, 4,
        perm.ctypes.data, 3, cperm.ctypes.data, 4, 1,
    )
    if rc != 0 or not np.array_equal(dst, src[perm][:, cperm].T):
        raise RuntimeError("checkpoint_ops self-test failed")


def _nthreads() -> int:
    return min(os.cpu_count() or 1, 16)


def transpose_gather(src: np.ndarray, perm=None, col_perm=None) -> np.ndarray:
    """dst[c, r] = src[perm[r], col_perm[c]] — transpose with fused gathers.

    src: [rows, cols] C-contiguous, itemsize 2/4/8. Returns [cols, rows].
    ``perm`` permutes src rows (q/k/v out-channels), ``col_perm`` src cols
    (the o projection's in-channels). Falls back to numpy when the native
    library is unavailable.
    """
    assert src.ndim == 2
    lib = load_library()
    if lib is None or src.itemsize not in (2, 4, 8) or not src.flags.c_contiguous:
        out = src if perm is None else src[np.asarray(perm)]
        out = out if col_perm is None else out[:, np.asarray(col_perm)]
        return np.ascontiguousarray(out.T)
    rows, cols = src.shape
    dst = np.empty((cols, rows), dtype=src.dtype)
    if perm is not None:
        perm = np.ascontiguousarray(np.asarray(perm, dtype=np.int64))
        assert perm.shape == (rows,)
        perm_ptr, perm_len = perm.ctypes.data, rows
    else:
        perm_ptr, perm_len = None, 0
    if col_perm is not None:
        col_perm = np.ascontiguousarray(np.asarray(col_perm, dtype=np.int64))
        assert col_perm.shape == (cols,)
        cperm_ptr, cperm_len = col_perm.ctypes.data, cols
    else:
        cperm_ptr, cperm_len = None, 0
    rc = lib.ct_transpose_gather(
        src.ctypes.data, dst.ctypes.data, rows, cols, src.itemsize,
        perm_ptr, perm_len, cperm_ptr, cperm_len, _nthreads(),
    )
    if rc != 0:
        raise RuntimeError(f"ct_transpose_gather failed: {rc}")
    return dst


def copy_mt(src: np.ndarray) -> np.ndarray:
    """Parallel materialization of a (possibly mmap-backed) array."""
    lib = load_library()
    src = np.ascontiguousarray(src)
    if lib is None:
        return src.copy()
    dst = np.empty_like(src)
    lib.ct_memcpy_mt(src.ctypes.data, dst.ctypes.data, src.nbytes, _nthreads())
    return dst
