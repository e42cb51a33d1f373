"""Decompose megakernel frame time with the kernel's stub knobs.

Runs the headline bench config (RTIOW 1080p spp16 bounce4) in four
variants and prints per-component cost:
  full                : everything on
  stub_fetch          : fetch returns constants (isolates fetch cost)
  stub_intersect      : intersect returns constant t (isolates intersect)
  both stubs          : scheduler + shading + RNG only

Stubbed variants change ray paths (so slot counts differ) - this is a
rough decomposition for direction-finding, not an exact attribution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from ray_tracing_extended_tpu.models.presets import rtiow_final_scene
from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega


def timeit(label, **kw):
    scene, camera, cfg = rtiow_final_scene(width=1920, height=1080,
                                           max_bounce=4, spp=16)
    img, segs = render_frame_mega(scene, camera, cfg, jnp.uint32(0), **kw)
    int(segs)  # blocking scalar pull = the one reliable sync through the
    # tunnel (block_until_ready can return before server-side compute)
    n = 4
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        total = jnp.uint32(0)
        for f in range(1, n + 1):
            img, segs = render_frame_mega(scene, camera, cfg,
                                          jnp.uint32(f), **kw)
            total = total + segs
        int(total)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:28s} {best*1e3:8.1f} ms  segs={int(segs)}")
    return best


if __name__ == "__main__":
    full = timeit("full")
    di = timeit("dup_intersect", dup_intersect=True)
    df = timeit("dup_fetch", dup_fetch=True)
    print(f"intersect ~ {1e3*(di-full):.1f} ms ({(di-full)/full*100:.0f}%), "
          f"fetch ~ {1e3*(df-full):.1f} ms ({(df-full)/full*100:.0f}%), "
          f"other ~ {1e3*(3*full-di-df):.1f} ms")
