"""ctypes bridge to the C++ binned-SAH builder (accel/cpp/bvh_builder.cpp).

Compiles the shared library on first use with g++ (cached next to the
source); falls back to the pure-numpy builder when a toolchain isn't
available. Mirrors the reference's build split: CPU-side acceleration
construction in native code (tinybvh C++ via cxx, Cargo.lock:3391-3399),
flat arrays consumed by the device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "bvh_builder.cpp")
_LIB = os.path.join(_HERE, "cpp", "libbvh.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.bvh_build.restype = ctypes.c_void_p
            lib.bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.c_int32] * 2
            lib.bvh_num_nodes.restype = ctypes.c_int32
            lib.bvh_num_nodes.argtypes = [ctypes.c_void_p]
            lib.bvh_export.restype = None
            lib.bvh_export.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.bvh_free.restype = None
            lib.bvh_free.argtypes = [ctypes.c_void_p]
            lib.bvh_build_opt.restype = ctypes.c_void_p
            lib.bvh_build_opt.argtypes = (
                [ctypes.POINTER(ctypes.c_float)] * 3
                + [ctypes.c_int32] * 3 + [ctypes.c_float])
            lib.bvh_sah_cost.restype = ctypes.c_float
            lib.bvh_sah_cost.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _opt_rounds() -> int:
    """Insertion-based optimizer rounds (accel/cpp/bvh_builder.cpp): each
    round removes the top ~1% highest-inefficiency internal nodes and
    re-inserts their child subtrees at branch-and-bound SAH optima
    (Bittner et al. 2013). A pure tree-quality lever — kernels unchanged,
    fewer union steps. LOUPIOTE_BVH_OPT=<rounds> overrides; 0 disables."""
    return int(os.environ.get("LOUPIOTE_BVH_OPT", "50"))


def build_bvh_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     leaf_max: int = 4):
    """Native binned-SAH build (+ insertion-based optimization) -> FlatBVH,
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from .bvh import FlatBVH

    t = v0.shape[0]
    a = np.ascontiguousarray(v0, np.float32)
    b = np.ascontiguousarray(v1, np.float32)
    c = np.ascontiguousarray(v2, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rounds = _opt_rounds()
    if rounds > 0:
        handle = lib.bvh_build_opt(a.ctypes.data_as(fp),
                                   b.ctypes.data_as(fp),
                                   c.ctypes.data_as(fp), t, leaf_max,
                                   rounds, 1.0)
    else:
        handle = lib.bvh_build(a.ctypes.data_as(fp), b.ctypes.data_as(fp),
                               c.ctypes.data_as(fp), t, leaf_max)
    try:
        n = lib.bvh_num_nodes(handle)
        node_min = np.empty((n, 3), np.float32)
        node_max = np.empty((n, 3), np.float32)
        first = np.empty(n, np.int32)
        count = np.empty(n, np.int32)
        miss = np.empty(n, np.int32)
        right = np.empty(n, np.int32)
        axis = np.empty(n, np.int32)
        order = np.empty(t, np.int32)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.bvh_export(handle,
                       node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
                       first.ctypes.data_as(ip), count.ctypes.data_as(ip),
                       miss.ctypes.data_as(ip), right.ctypes.data_as(ip),
                       axis.ctypes.data_as(ip), order.ctypes.data_as(ip))
    finally:
        lib.bvh_free(handle)
    return FlatBVH(node_min=node_min, node_max=node_max, first=first,
                   count=count, miss=miss, right=right, axis=axis,
                   tri_order=order)
