"""ctypes bridge to the native host-geometry runtime (native/geometry.cpp).

Compiles the shared library on first use (g++, cached next to the source)
and exposes Morton coding / sorting / LBVH build. Falls back silently to the
NumPy implementations when no compiler is available or RTE_NATIVE=0; results
are bit-identical to the NumPy reference (asserted in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "native"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RTE_NATIVE", "1") == "0":
        return None
    src = _native_dir() / "geometry.cpp"
    lib_path = _native_dir() / "librtx_geom.so"
    try:
        if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(lib_path)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(lib_path))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.rtx_morton3.argtypes = [f32p, ctypes.c_int, f32p, f32p, u64p]
    lib.rtx_argsort_u64.argtypes = [u64p, ctypes.c_int, i32p]
    lib.rtx_lbvh_build.restype = ctypes.c_int
    lib.rtx_lbvh_build.argtypes = [
        f32p, f32p, ctypes.c_int, i32p, u64p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p,
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def morton_codes(centroids: np.ndarray) -> np.ndarray | None:
    """30-bit Morton codes of quantized centroids, or None w/o native lib."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, np.float32)
    lo = c.min(axis=0)
    hi = c.max(axis=0)
    ext = hi - lo
    inv = np.where(ext > 0, 1023.0 / np.where(ext > 0, ext, 1.0), 0.0).astype(
        np.float32
    )
    codes = np.empty(len(c), np.uint64)
    lib.rtx_morton3(c, len(c), np.ascontiguousarray(lo), np.ascontiguousarray(inv), codes)
    return codes


def argsort_u64(codes: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint64)
    order = np.empty(len(codes), np.int32)
    lib.rtx_argsort_u64(codes, len(codes), order)
    return order


def lbvh_build(prim_bmin, prim_bmax, order, sorted_codes, leaf_width,
               sentinel):
    """-> (node_bmin, node_bmax, left, right, leaf_row, leaf_prims) numpy
    arrays trimmed to the built node/leaf counts, or None w/o native lib."""
    lib = _load()
    if lib is None:
        return None
    bmin = np.ascontiguousarray(prim_bmin, np.float32)
    bmax = np.ascontiguousarray(prim_bmax, np.float32)
    order = np.ascontiguousarray(order, np.int32)
    codes = np.ascontiguousarray(sorted_codes, np.uint64)
    n = len(order)
    cap = 2 * n
    node_bmin = np.empty((cap, 3), np.float32)
    node_bmax = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    leaf_row = np.empty(cap, np.int32)
    leaf_prims = np.empty((n, leaf_width), np.int32)
    n_leaves = ctypes.c_int(0)
    n_nodes = lib.rtx_lbvh_build(
        bmin, bmax, n, order, codes, leaf_width, sentinel,
        node_bmin, node_bmax, left, right, leaf_row, leaf_prims,
        ctypes.byref(n_leaves),
    )
    nl = n_leaves.value
    return (
        node_bmin[:n_nodes].copy(),
        node_bmax[:n_nodes].copy(),
        left[:n_nodes].copy(),
        right[:n_nodes].copy(),
        leaf_row[:n_nodes].copy(),
        leaf_prims[:nl].copy(),
    )
