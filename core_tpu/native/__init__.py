"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA/Pallas; host-side scene compilation uses native
code where the reference does (its kd-tree builder is C++,
src/yafraycore/kdtree.cc).  The shared library is compiled from
native/*.cpp on first use and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "bvh_builder.cpp")
_LIB = os.path.join(_REPO, "native", "libcore_tpu_native.so")
_lock = threading.Lock()
_lib = None


def _ensure_built():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.core_tpu_build_bvh.restype = ctypes.c_int32
        lib.core_tpu_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _ensure_built()
        return True
    except Exception:
        return False


def build_bvh_native(verts: np.ndarray, tri_vidx: np.ndarray,
                     max_leaf: int = 4, n_bins: int = 16):
    """Binned-SAH build in C++; returns (node_min, node_max, left, count,
    tri_order) numpy arrays in the bvh.BVHData layout."""
    lib = _ensure_built()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tri_vidx, np.int32)
    n_tris = tris.shape[0]
    max_nodes = max(2 * n_tris, 16)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    left = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    order = np.empty(n_tris, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n = lib.core_tpu_build_bvh(
        verts.ctypes.data_as(fp), verts.shape[0],
        tris.ctypes.data_as(ip), n_tris,
        max_leaf, n_bins,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        left.ctypes.data_as(ip), count.ctypes.data_as(ip),
        order.ctypes.data_as(ip), max_nodes)
    if n < 0:
        raise RuntimeError("native BVH build failed")
    return (node_min[:n], node_max[:n], left[:n], count[:n], order)
