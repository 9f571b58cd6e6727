"""Native (C++) host runtime kernels, loaded via ctypes.

Builds `librvc_native.so` from `rvc_native.cpp` on first use (g++ -O3)
and exposes: the mmap FAISS IVFFlat parser, SOLA alignment, PCM
conversions, and circular writes. Every entry point has a pure-Python
fallback — `available()` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librvc_native.so")
_SRC = os.path.join(_DIR, "rvc_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _FaissInfo(ctypes.Structure):
    _fields_ = [("d", ctypes.c_int32), ("ntotal", ctypes.c_int64),
                ("nlist", ctypes.c_int64), ("nprobe", ctypes.c_int64),
                ("metric", ctypes.c_int32)]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.faiss_ivf_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_FaissInfo)]
    lib.faiss_ivf_info.restype = ctypes.c_int
    lib.faiss_ivf_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.faiss_ivf_read.restype = ctypes.c_int
    lib.sola_align.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.sola_align.restype = ctypes.c_int
    lib.f32_to_i16.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"), ctypes.c_int64]
    lib.i16_to_f32.argtypes = [
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int64]
    lib.circular_write_f32.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def faiss_ivf_read(path: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int, str]]:
    """Parse a FAISS IVFFlat file natively.

    Returns (centroids, vectors, list_ids, nprobe, metric) or None if the
    native library is unavailable / parsing failed (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    info = _FaissInfo()
    if lib.faiss_ivf_info(path.encode(), ctypes.byref(info)) != 0:
        return None
    centroids = np.empty((info.nlist, info.d), dtype=np.float32)
    vectors = np.empty((info.ntotal, info.d), dtype=np.float32)
    list_ids = np.empty(info.ntotal, dtype=np.int32)
    rc = lib.faiss_ivf_read(path.encode(), centroids, vectors, list_ids)
    if rc != 0:
        return None
    return centroids, vectors, list_ids, max(1, int(info.nprobe)), (
        "l2" if info.metric == 1 else "ip")


def sola_align(x: np.ndarray, ref: np.ndarray, search: int) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    ref = np.ascontiguousarray(ref, dtype=np.float32)
    return int(lib.sola_align(x, len(x), ref, len(ref), search))


def f32_to_i16(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(len(x), dtype=np.int16)
    if lib is None:
        return (np.clip(x, -1, 1) * 32767).round().astype(np.int16)
    lib.f32_to_i16(x, out, len(x))
    return out


def i16_to_f32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.int16)
    out = np.empty(len(x), dtype=np.float32)
    if lib is None:
        return x.astype(np.float32) / 32768.0
    lib.i16_to_f32(x, out, len(x))
    return out
