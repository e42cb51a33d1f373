"""Cull-effectiveness report for the megakernel (direction-finding).

Renders one frame with collect_stats and reads the diagnostic hist rows
(kernels/megakernel.py count_visits): average sub-cluster visits per slot
iteration per tile vs the total sub count. High visit ratios mean the
tile-level AABB/t-bound culls are not firing and per-row work dominates.

Under RTX_MEGA_PERLANE >= 1 the same rows count per-lane-cull DRAIN
ITERATIONS per slot instead (each iteration = one per-row cluster pop
across all rows) - directly comparable to union visits as the per-slot
pair-test multiplier.

Usage: python tools/cull_stats.py [preset]   (default rtiow)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.kernels.megakernel import (
    render_frame_mega,
    tile_size,
)
from ray_tracing_extended_tpu.models import presets


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "rtiow"
    if name == "rtiow":
        scene, cam, cfg = presets.rtiow_final_scene(
            width=1920, height=1080, max_bounce=4, spp=16
        )
    elif name == "mesh":
        scene, cam, cfg = presets.mesh_scene()
    elif name == "cornell":
        scene, cam, cfg = presets.cornell_box_scene(
            width=512, height=512, max_bounce=8, spp=16
        )
    else:
        raise SystemExit(
            f"unknown preset {name!r}; use rtiow, mesh or cornell"
        )

    p = scene.packed
    ts = tile_size(p, cfg.adaptive_spp)
    n_tiles = -(-cfg.width // ts) * -(-cfg.height // ts)
    img, segs, hist = render_frame_mega(
        scene, cam, cfg, jnp.uint32(1), collect_stats=True
    )
    img.block_until_ready()
    hist = np.asarray(hist).astype(np.float64)
    hr = len(hist)
    norm = 128.0 * n_tiles
    slots = hist[hr - 3] / norm
    sph_v = hist[hr - 1] / norm
    tri_v = hist[hr - 2] / norm
    print(f"preset={name} ts={ts} tiles={n_tiles} "
          f"spp={cfg.spp} mb={cfg.max_bounce}")
    print(f"slot iterations/tile: {slots:.1f} "
          f"(static bound {cfg.spp * (cfg.max_bounce + 1)})")
    if slots > 0:
        print(f"sphere sub visits/slot: {sph_v / slots:.2f} of "
              f"{p.n_sphere_subs} subs")
        print(f"tri    sub visits/slot: {tri_v / slots:.2f} of "
              f"{p.n_tri_subs} subs")
    live = hist[: cfg.max_bounce + 1]
    print("alive fraction by bounce:",
          np.round(live / max(live[0], 1), 3))
    print(f"segs={int(segs)}")


if __name__ == "__main__":
    main()
