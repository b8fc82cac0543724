"""ctypes bindings for the native NPZ pair loader (native/npz_loader.cpp).

The C++ library parses the zip/npy containers and inflates payloads on a
thread pool — the TPU-native replacement for the reference's worker-process
DataLoader (``3d_ldm/utils.py:195-230``): one host process, no fork, no GIL
in the decompression path. Auto-builds with g++ on first use; all callers
fall back to the numpy path when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger("native_loader")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "libnpz_loader.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "npz_loader.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    # compile to a per-pid temp name and atomically rename: writing the .so
    # at its final path let a concurrent process CDLL a half-written file,
    # and a g++ killed by the timeout left a truncated library that passed
    # the exists() check forever after (found in review)
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
           "-o", tmp, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception as e:
        log.info("native loader build failed (%s); using numpy path", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
            if not _build():
                _build_failed = True
                return None
        if not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            # corrupt/foreign-arch library: honor the documented contract
            # (every caller falls back to the numpy path) instead of letting
            # the OSError kill data loading (found in review)
            log.warning("native loader failed to load (%s); using numpy path", e)
            _build_failed = True
            return None
        lib.npz_pair_dims.restype = ctypes.c_int
        lib.npz_pair_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
        lib.npz_load_pair.restype = ctypes.c_int
        lib.npz_load_pair.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.npz_load_batch.restype = ctypes.c_int
        lib.npz_load_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# (path -> ((mtime_ns, size), dims)) — the dims probe parses the whole
# archive, and load_pair needs it every sample of every epoch; caching by
# stat signature halves the native path's IO (found in review) while a
# swapped file still re-probes (and npz_load_pair independently validates
# the expected shape before writing — the TOCTOU guard)
_dims_cache: dict = {}


def pair_dims(path: str) -> Optional[tuple[int, int, int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    try:
        st = os.stat(path)
        sig = (st.st_mtime_ns, st.st_size)
    except OSError:
        return None
    hit = _dims_cache.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    dims = (ctypes.c_int64 * 4)()
    rc = lib.npz_pair_dims(path.encode(), dims)
    if rc != 0:
        return None
    out = tuple(int(d) for d in dims)
    _dims_cache[path] = (sig, out)
    return out


def load_pair(path: str) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Load (low, high) float32 volumes via the native path; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    d = pair_dims(path)
    if d is None:
        return None
    out = np.empty(d, dtype=np.float32)
    dims = (ctypes.c_int64 * 4)(*d)
    rc = lib.npz_load_pair(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dims)
    if rc != 0:
        return None
    return out[0], out[1]


def load_batch(paths: Sequence[str], shape_dhw: Sequence[int],
               num_threads: int = 0) -> Optional[np.ndarray]:
    """Parallel-load same-shaped pairs -> (N, 2, D, H, W) float32; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    dims = (ctypes.c_int64 * 4)(2, *shape_dhw)
    out = np.empty((n, 2, *shape_dhw), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.npz_load_batch(arr, n, dims,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if rc != 0:
        log.warning("native batch load failed rc=%d", rc)
        return None
    return out
