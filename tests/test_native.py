"""Native (C++) geometry runtime vs the NumPy reference implementation."""

import os
import time

import numpy as np
import pytest

from ray_tracing_extended_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


def test_morton_and_sort_match_numpy(lib_available):
    from ray_tracing_extended_tpu.accel.bvh import _morton3

    rs = np.random.RandomState(0)
    c = rs.uniform(-5, 5, (5000, 3)).astype(np.float32)
    codes = native.morton_codes(c)
    lo, hi = c.min(0), c.max(0)
    denom = np.where(hi > lo, hi - lo, 1.0)
    q = np.clip((c - lo) * np.where(hi > lo, 1023.0 / denom, 0.0), 0, 1023
                ).astype(np.uint32)
    ref = _morton3(q)
    assert np.array_equal(codes, ref)
    order = native.argsort_u64(codes)
    ref_order = np.argsort(codes, kind="stable")
    assert np.array_equal(order, ref_order)


def test_lbvh_native_matches_numpy_bitwise(lib_available):
    from ray_tracing_extended_tpu.accel.bvh import build_lbvh

    rs = np.random.RandomState(1)
    n = 3000
    bmin = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    bmax = bmin + rs.uniform(0.01, 1, (n, 3)).astype(np.float32)

    native_bvh = build_lbvh(bmin, bmax, sentinel=n)
    os.environ["RTE_NATIVE"] = "0"
    native._TRIED, native._LIB = True, None  # force fallback
    try:
        numpy_bvh = build_lbvh(bmin, bmax, sentinel=n)
    finally:
        os.environ.pop("RTE_NATIVE")
        native._TRIED = False

    for field in ("bounds_min", "bounds_max", "left", "right", "leaf_row",
                  "leaf_prims"):
        a = np.asarray(getattr(native_bvh, field))
        b = np.asarray(getattr(numpy_bvh, field))
        assert a.shape == b.shape, field
        assert np.array_equal(a, b), field


def test_native_build_speed(lib_available):
    """The native build must handle production-scale meshes quickly
    (~70k prims well under a second)."""
    from ray_tracing_extended_tpu.accel.bvh import build_lbvh

    rs = np.random.RandomState(2)
    n = 70000
    bmin = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    bmax = bmin + 0.05
    t0 = time.perf_counter()
    bvh = build_lbvh(bmin, bmax, sentinel=n)
    dt = time.perf_counter() - t0
    assert bvh.left.shape[0] > n / 4
    assert dt < 2.0, f"native LBVH build too slow: {dt:.2f}s"
