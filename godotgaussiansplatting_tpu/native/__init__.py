"""ctypes bindings for the native (C++) splat preprocessor.

Loads ``libplyio.so`` (built by the Makefile here; `ensure_built()` compiles
it on first use when a toolchain is available) and exposes:

  swizzle(verts, nprops, big_endian, prop_index) -> (means, cov6, opacity, sh)
  morton3(means) -> (N,) uint64 codes

NumPy fallbacks (models/ply.py, ops/blocks.py) are used automatically when
the library is unavailable, so the native layer is an accelerator, not a
dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libplyio.so")
_lib: Optional[ctypes.CDLL] = None


class _PropIdx(ctypes.Structure):
    _fields_ = [
        ("xyz", ctypes.c_int32 * 3),
        ("f_dc", ctypes.c_int32 * 3),
        ("f_rest0", ctypes.c_int32),
        ("opacity", ctypes.c_int32),
        ("scale", ctypes.c_int32 * 3),
        ("rot", ctypes.c_int32 * 4),
    ]


def ensure_built(quiet: bool = True) -> bool:
    """Build libplyio.so if missing; returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _DIR],
                       capture_output=quiet, check=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.plyio_swizzle.restype = ctypes.c_int32
    lib.plyio_swizzle.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(_PropIdx),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.plyio_morton3.restype = None
    lib.plyio_morton3.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def swizzle(verts: np.ndarray, prop_names, big_endian: bool,
            nthreads: Optional[int] = None):
    """Native swizzle of a raw (N, nprops) float table (host byte order in
    memory; big_endian says the *values* still need byteswap)."""
    lib = load()
    assert lib is not None, "native plyio unavailable"
    n, nprops = verts.shape
    idx = {p: i for i, p in enumerate(prop_names)}
    pi = _PropIdx()
    for k in range(3):
        pi.xyz[k] = idx[("x", "y", "z")[k]]
        pi.f_dc[k] = idx[f"f_dc_{k}"]
        pi.scale[k] = idx[f"scale_{k}"]
    rest = [idx.get(f"f_rest_{i}", -1) for i in range(45)]
    contiguous = all(r == rest[0] + i for i, r in enumerate(rest)) and rest[0] >= 0
    pi.f_rest0 = rest[0] if contiguous else -1
    if not contiguous and rest[0] >= 0:
        raise ValueError("non-contiguous f_rest properties: use NumPy path")
    pi.opacity = idx["opacity"]
    for k in range(4):
        pi.rot[k] = idx[f"rot_{k}"]

    verts = np.ascontiguousarray(verts, np.float32)
    means = np.empty((n, 3), np.float32)
    cov6 = np.empty((n, 6), np.float32)
    opac = np.empty((n,), np.float32)
    sh = np.empty((n, 16, 3), np.float32)
    nt = nthreads or min(32, os.cpu_count() or 1)
    rc = lib.plyio_swizzle(_fp(verts), n, nprops, int(big_endian),
                           ctypes.byref(pi), _fp(means), _fp(cov6),
                           _fp(opac), _fp(sh), nt)
    assert rc == 0
    return means, cov6, opac, sh


def morton3(means: np.ndarray, nthreads: Optional[int] = None) -> np.ndarray:
    lib = load()
    assert lib is not None, "native plyio unavailable"
    means = np.ascontiguousarray(means, np.float32)
    n = means.shape[0]
    codes = np.empty((n,), np.uint64)
    nt = nthreads or min(32, os.cpu_count() or 1)
    lib.plyio_morton3(_fp(means), n,
                      codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), nt)
    return codes
