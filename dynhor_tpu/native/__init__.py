"""Native (C++) host-runtime components, built on demand with g++ and
loaded via ctypes (no pybind11 dependency — CPython-agnostic C ABI).

Components:
  * marching.cpp — marching-tetrahedra mesh extraction (the unique-edge
    dedup dominates the numpy path on large SDF grids).

``load_marching()`` returns None when no toolchain is available; callers
fall back to the numpy implementation (dynhor_tpu/neus/extract.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "marching.cpp")
_LIB = os.path.join(_DIR, "libmarching.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_marching():
    """ctypes handle to the marching library, building it if needed.
    Returns None if unavailable (no g++)."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)
        ]
        _lib = lib
        return _lib


def marching_tetrahedra_native(
    sdf_grid: np.ndarray, origin, spacing
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native marching tetrahedra; None if the library is unavailable.

    Same semantics as neus.extract.marching_tetrahedra (vertex order may
    differ; geometry is identical).
    """
    lib = load_marching()
    if lib is None:
        return None
    sdf = np.ascontiguousarray(sdf_grid, np.float32)
    nx, ny, nz = sdf.shape
    origin = np.ascontiguousarray(np.broadcast_to(np.asarray(origin, np.float32), (3,)))
    spacing = np.ascontiguousarray(np.broadcast_to(np.asarray(spacing, np.float32), (3,)))
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.mt_extract(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(fp), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy()
    finally:
        lib.mt_free(vp, fp)
    return verts, faces
