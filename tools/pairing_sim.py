"""Simulate lane-pairing schedulers on REAL per-pixel cost data.

Parity-mode occupancy (the 230-Mrays/s bottleneck, ROADMAP round 3) is
bounded by within-tile lane imbalance: a tile drains when its SLOWEST lane
finishes its quota, so tile slots = max over lanes of total segments. With
multi-pixel lanes (ppl > 1) we choose WHICH pixels share a lane; the
shipped pairing is blind (vertical tile halves). This tool measures, from
an actual on-hardware K=16 batched render's per-pixel segment counts, the
occupancy of candidate pairings WITHOUT building them:

  * vhalf:   shipped vertical-half pairing (ppl=2 baseline)
  * sorted2: within-tile cost-sorted pairing, heavy+light (ppl=2)
  * sorted4: within-tile 4-way reversed-quartile assignment (ppl=4)
  * quad2:   cost-sorted pairing across 2x2 tile quads (ppl=2; would cost
             some primary-ray cull locality - upper bound only)
  * global2: cost-sorted pairing across the whole image (cull-free upper
             bound, not buildable)

Occupancy = sum(costs) / sum_tiles(max_lane_cost * n_lanes). Because every
slot advances every unfinished lane by exactly one segment, tile slot count
== max lane cost, and throughput is ~proportional to occupancy.

Run on the TPU: python tools/pairing_sim.py [--width 1920 --height 1080]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

os.environ.setdefault("RTX_MEGA_PPL", "1")  # one pixel per lane: the cost map
os.environ.setdefault("RTX_MEGA_TS", "128")

TS = 128
LANES = 128


def tile_costs(c, ty, tx, H, W):
    """(TS, TS) cost block of tile (ty, tx) with edge clamping (the
    kernel's exact pixel mapping, megakernel.py)."""
    ys = np.minimum(ty * TS + np.arange(TS), H - 1)
    xs = np.minimum(tx * TS + np.arange(TS), W - 1)
    return c[np.ix_(ys, xs)]


def occ_from_lanes(lane_costs_per_tile):
    """lane_costs_per_tile: list of 1-D arrays (one per tile)."""
    useful = sum(float(lc.sum()) for lc in lane_costs_per_tile)
    issued = sum(
        float(lc.max()) * lc.size for lc in lane_costs_per_tile
    )
    return useful / issued


def pair_sorted(costs, ppl):
    """Cost-sorted ppl-way lane assignment over a flat cost vector: sort
    descending, lane i gets ranks i, 2N-1-i, 2N+i, 4N-1-i ... (reversed
    alternating blocks - heavy pixels pair with light ones)."""
    s = np.sort(costs.ravel())[::-1]
    n = s.size // ppl
    lanes = np.zeros(n, s.dtype)
    for p in range(ppl):
        blk = s[p * n : (p + 1) * n]
        lanes += blk if p % 2 == 0 else blk[::-1]
    return lanes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--save", default="/tmp/segs_map.npy")
    args = ap.parse_args()

    import jax.numpy as jnp

    from ray_tracing_extended_tpu.models.presets import rtiow_final_scene
    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )

    scene, camera, cfg = rtiow_final_scene(
        width=args.width, height=args.height, max_bounce=4, spp=16
    )
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    _, total, smap = render_frames_mega(
        scene, camera, cfg, jnp.uint32(1), acc, args.frames, segs_map=True
    )
    c = np.asarray(smap).astype(np.float64)
    np.save(args.save, c)
    H, W = args.height, args.width
    print(f"total segs {int(total)}  map sum {c.sum():.0f} "
          f"(map misses edge-clamp duplicates)  mean/px {c.mean():.1f} "
          f"max/px {c.max():.0f}")

    n_ty, n_tx = -(-H // TS), -(-W // TS)
    tiles = [
        tile_costs(c, ty, tx, H, W)
        for ty in range(n_ty)
        for tx in range(n_tx)
    ]

    # shipped vertical-half pairing: lane (g, l) of the (ROWS, LANES)
    # view pairs local rows g and g + ROWS//2, i.e. tile pixel rows
    # interleave ROWS*LANES raster order. local = (g + p*RS)*LANES + lane
    # -> phase-p pixel row = local // TS. With TS=LANES=128: row g pairs
    # row g + 64.
    def vhalf_lanes(t):
        f = t.reshape(-1)  # raster == lane order when TS == LANES
        half = f.size // 2
        return f[:half] + f[half:]

    def ident_lanes(t, ppl):
        f = t.reshape(-1)
        n = f.size // ppl
        lanes = np.zeros(n, f.dtype)
        for p in range(ppl):
            lanes += f[p * n : (p + 1) * n]
        return lanes

    results = {
        "ppl=1 (no pairing)": occ_from_lanes([t.ravel() for t in tiles]),
        "vhalf ppl=2 (shipped)": occ_from_lanes(
            [vhalf_lanes(t) for t in tiles]
        ),
        "sorted ppl=2 (within tile)": occ_from_lanes(
            [pair_sorted(t, 2) for t in tiles]
        ),
        "sorted ppl=4 (within tile)": occ_from_lanes(
            [pair_sorted(t, 4) for t in tiles]
        ),
    }
    # 2x2 tile quads
    quads = {}
    for i, t in enumerate(tiles):
        ty, tx = divmod(i, n_tx)
        quads.setdefault((ty // 2, tx // 2), []).append(t.ravel())
    results["sorted ppl=2 (2x2 tile quad)"] = occ_from_lanes(
        [pair_sorted(np.concatenate(q), 2) for q in quads.values()]
    )
    results["sorted ppl=2 (global, unbuildable)"] = occ_from_lanes(
        [pair_sorted(c, 2)]
    )
    results["sorted ppl=4 (global, unbuildable)"] = occ_from_lanes(
        [pair_sorted(c, 4)]
    )
    for k, v in results.items():
        print(f"  occ {v * 100:6.2f}%  {k}")


if __name__ == "__main__":
    main()
