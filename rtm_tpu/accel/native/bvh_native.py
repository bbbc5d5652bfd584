"""ctypes binding for the native C++ BVH builder (bvh.cpp).

The shared library is compiled on first use with the system g++ (no
pybind11 in this build — plain C ABI + ctypes) and cached next to the
source.  `build()` returns None when no native toolchain is available, and
accel.bvh falls back to the NumPy builder; both produce bit-identical
arrays (tests/test_native_bvh.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bvh.cpp")
_LIB = os.path.join(_HERE, "librtm_bvh.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.rtm_bvh_build.restype = ctypes.c_int
            lib.rtm_bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build(mesh):
    """Build the BVH natively; returns accel.bvh.BVH or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..bvh import BVH, BvhStats

    verts = np.ascontiguousarray(mesh.verts, np.float32)
    t = len(verts)
    vol = np.ascontiguousarray(
        np.concatenate([np.asarray(mesh.volume_min, np.float32),
                        np.asarray(mesh.volume_max, np.float32)]), np.float32)
    cap = max(1, 2 * t)
    box_min = np.empty((cap, 3), np.float32)
    box_max = np.empty((cap, 3), np.float32)
    region = np.empty((cap, 2), np.uint32)
    order = np.empty((max(t, 1),), np.uint32)
    stats10 = np.zeros((10,), np.float64)

    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint32)
    dp = ctypes.POINTER(ctypes.c_double)
    n = lib.rtm_bvh_build(
        verts.ctypes.data_as(fp), t, vol.ctypes.data_as(fp),
        box_min.ctypes.data_as(fp), box_max.ctypes.data_as(fp),
        region.ctypes.data_as(up), order.ctypes.data_as(up),
        cap, stats10.ctypes.data_as(dp))
    if n < 0:
        return None

    stats = BvhStats(
        tri_cnt=int(stats10[0]), node_cnt=int(stats10[1]),
        leaf_cnt=int(stats10[2]),
        leaf_depth_min=int(stats10[3]), leaf_depth_max=int(stats10[4]),
        leaf_depth_sum=float(stats10[5]),
        leaf_tris_min=int(stats10[6]), leaf_tris_max=int(stats10[7]),
        leaf_tris_sum=float(stats10[8]), sah=float(stats10[9]))
    return BVH(box_min=box_min[:n].copy(), box_max=box_max[:n].copy(),
               buffer_region=region[:n].copy(), order=order[:t],
               stats=stats)
