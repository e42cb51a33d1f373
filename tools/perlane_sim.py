"""Per-lane vs per-tile cull ceiling simulation (direction-finding).

The megakernel gates sub-cluster visits per TILE: a cluster is visited
when ANY lane in the tile passes the t-bounded slab test
(kernels/megakernel.py tile_hits / sphere_cluster), so every lane pays
the UNION of the tile's needs - measured 7.5 of 16 sphere subs per slot
on RTIOW adaptive (tools/cull_stats.py). A per-lane traversal (each
lane walking only its own needed clusters, fetching per-lane cluster
data with the one-hot MXU machinery) would pay each lane's own need
set instead. Whether that is worth building hinges on the gap between
the union and the per-lane statistics, measured on REAL path segments.

This tool renders real segments (same camera/RNG/scatter semantics as
ops/trace.py), then replays the kernel's exact cull semantics per
segment - hoisted spheres first, then front-to-back sub-cluster order
with the t-bounded slab test, per-lane best_t tightened by each
visited cluster's true closest hit - and reports:

  mean need/seg       asymptote of a work-redistributing per-lane design
  E[max over row]     iterations a lockstep 128-lane per-lane row pays
  E[|union| row/slot] what per-row / per-tile(slot) gating pays
                      (slot-union should land near the measured
                      visits/slot, validating the sim)

Slab-fail clusters cannot contain a closer hit (the ray does not enter
the box within [0, best_t]), so per-lane best_t evolution is identical
whether the lane rides tile-union visits or only its own need set -
the need sets computed here are exact for both designs.

Usage: python tools/perlane_sim.py [W H spp]   (default 960 540 1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_extended_tpu.models import presets
from ray_tracing_extended_tpu.ops import rng as rng_ops
from ray_tracing_extended_tpu.ops import vecmath as vm
from ray_tracing_extended_tpu.ops.camera import focus_points, generate_rays
from ray_tracing_extended_tpu.ops.intersect import closest_hit_bruteforce
from ray_tracing_extended_tpu.ops.materials import (
    checker_colour,
    passthrough_mask,
    scatter,
)
from ray_tracing_extended_tpu.ops.trace import PASSTHROUGH_EPS


def collect_segments(scene, camera, cfg, frame=1, blk=1 << 18):
    """Render every pixel (spp samples each) recording each live bounce
    segment: (origin, direction, closest-hit t incl. misses as +inf).
    Mirrors ops/trace.py's masked loop; statistics-faithful (same seeds,
    same scatter/RR draws). One SMALL jitted step per bounce, driven
    from a host loop - a fully unrolled program compiles for minutes.
    ``blk`` bounds the (B, prims) brute-force intermediate - pass a few
    thousand for 70k-triangle scenes (the default is sized for RTIOW's
    ~500 spheres)."""
    n = cfg.num_pixels

    @jax.jit
    def primary(pix_idx, state):
        x = pix_idx % cfg.width
        y = pix_idx // cfg.width
        fp = focus_points(camera, x, y, cfg.width, cfg.height)
        return generate_rays(state, camera, fp, cfg.width)

    @jax.jit
    def bounce_step(bounce_idx, state, o, d, colour, alive):
        hit = closest_hit_bruteforce(o, d, scene)
        did_hit = hit.hit & alive
        mat = scene.materials.take(hit.mat_idx)
        base_colour = checker_colour(mat, hit.point)
        passthru = passthrough_mask(mat, bounce_idx, did_hit)
        scattering = did_hit & ~passthru
        state2, new_o, new_d, is_spec = scatter(
            state, d, hit.point, hit.normal, mat
        )
        col_hit = colour * vm.lerp(
            base_colour, mat.specular_colour, is_spec[..., None]
        )
        p = jnp.max(col_hit, axis=-1)
        state2, u_rr = rng_ops.random_value(state2)
        survive = u_rr < p
        col_boosted = col_hit * (
            1.0 / jnp.maximum(p, jnp.float32(1e-30))
        )[..., None]
        sc3 = scattering[..., None]
        o_n = jnp.where(
            passthru[..., None],
            hit.point + d * PASSTHROUGH_EPS,
            jnp.where(sc3, new_o, o),
        )
        d_n = jnp.where(sc3, new_d, d)
        colour_n = jnp.where(sc3 & survive[..., None], col_boosted, colour)
        state_n = jnp.where(scattering, state2, state)
        alive_n = passthru | (scattering & survive)
        return hit.t, state_n, o_n, d_n, colour_n, alive_n

    os_, ds_, ts_, keeps, pixs = [], [], [], [], []
    for b0 in range(0, n, blk):
        pix = jnp.arange(b0, min(b0 + blk, n), dtype=jnp.int32)
        state = rng_ops.seed(pix, jnp.uint32(frame))
        for _ in range(cfg.spp):
            state, o, d = primary(pix, state)
            alive = jnp.ones((len(pix),), bool)
            colour = jnp.ones((len(pix), 3), jnp.float32)
            for bounce_idx in range(cfg.max_bounce + 1):
                t, state, o2, d2, colour, alive2 = bounce_step(
                    jnp.int32(bounce_idx), state, o, d, colour, alive
                )
                keep = np.asarray(alive)
                os_.append(np.asarray(o, np.float32)[keep])
                ds_.append(np.asarray(d, np.float32)[keep])
                ts_.append(np.asarray(t, np.float32)[keep])
                pixs.append(np.asarray(pix, np.int32)[keep])
                o, d, alive = o2, d2, alive2
    del keeps
    return (
        np.concatenate(os_),
        np.concatenate(ds_),
        np.concatenate(ts_),
        np.concatenate(pixs),
    )


def cluster_min_t(o, d, cols):
    """Exact closest sphere t within one sub-cluster for every segment
    (+inf when none): same math as the kernel's sphere_cluster."""
    c = cols[:, :3]  # (SUB, 3)
    r2 = cols[:, 4]  # (SUB,) ; dead slots are -1e30 -> disc < 0
    with np.errstate(invalid="ignore"):
        oc = o[:, None, :] - c[None, :, :]
        b = np.sum(oc * d[:, None, :], axis=2, dtype=np.float32)
        cc = np.sum(oc * oc, axis=2, dtype=np.float32) - r2[None, :]
        tq = -b - np.sqrt(b * b - cc)
    tq = np.where(np.isnan(tq) | (tq < 0.0), np.float32(np.inf), tq)
    return tq.min(axis=1)


def slab_pass(o, d, lo, hi, best_t):
    """tile_hits semantics: (tf >= 0) & (tn <= min(tf, best_t))."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.float32(1.0) / d
        t0 = (lo[None, :] - o) * inv
        t1 = (hi[None, :] - o) * inv
    tn = np.minimum(t0, t1).max(axis=1)
    tf = np.maximum(t0, t1).min(axis=1)
    return (tf >= 0.0) & (tn <= np.minimum(tf, best_t))


def grouped_stats(need_mask, need_cnt, tiles, group, rng):
    """Shuffle each tile's segments, chunk into groups; return
    (E[max need], E[|union|]) over full chunks."""
    maxes, unions = [], []
    for tid in np.unique(tiles):
        idx = np.where(tiles == tid)[0]
        rng.shuffle(idx)
        nfull = len(idx) // group
        if nfull == 0:
            continue
        sel = idx[: nfull * group].reshape(nfull, group)
        cnt = need_cnt[sel]  # (nfull, group)
        maxes.append(cnt.max(axis=1))
        unions.append(need_mask[sel].any(axis=1).sum(axis=1))
    return (
        float(np.concatenate(maxes).mean()),
        float(np.concatenate(unions).mean()),
    )


def slot_row_stats(need_mask, need_cnt, tiles, rows, rng):
    """Model one slot = ``rows`` lockstep rows of 128 lanes from the same
    tile. Returns per-slot expectations for the three candidate kernel
    designs (all rows execute every drain iteration):

      tile_union      current per-tile gating: every row pays |union(slot)|
      max_lane        per-lane pop w/ MXU one-hot fetch: iterations =
                      max over the slot's rows*128 lanes of per-lane need
      max_row_union   per-row-uniform pop (row's lanes share a cluster):
                      iterations = max over rows of |union(row)|
    """
    group = rows * 128
    t_union, m_lane, m_row = [], [], []
    for tid in np.unique(tiles):
        idx = np.where(tiles == tid)[0]
        rng.shuffle(idx)
        nfull = len(idx) // group
        if nfull == 0:
            continue
        sel = idx[: nfull * group].reshape(nfull, rows, 128)
        t_union.append(
            need_mask[sel.reshape(nfull, -1)].any(axis=1).sum(axis=1)
        )
        m_lane.append(need_cnt[sel].reshape(nfull, -1).max(axis=1))
        row_u = need_mask[sel].any(axis=2).sum(axis=2)  # (nfull, rows)
        m_row.append(row_u.max(axis=1))
    return (
        float(np.concatenate(t_union).mean()),
        float(np.concatenate(m_lane).mean()),
        float(np.concatenate(m_row).mean()),
    )


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 540
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    scene, cam, cfg = presets.rtiow_final_scene(
        width=w, height=h, max_bounce=4, spp=spp
    )
    p = scene.packed
    k = p.n_sphere_subs_visit
    bounds = np.asarray(p.sph_sub_bounds)[:k]
    cols = np.asarray(p.sph_sub_cols)[:k]
    hp = np.asarray(p.hoist_params)
    campos = np.asarray(cam.position, np.float32)

    o, d, t, pix = collect_segments(scene, cam, cfg)
    n = len(t)
    print(f"segments={n} ({w}x{h} spp={spp} mb={cfg.max_bounce}), "
          f"subs={k} hoisted={p.n_hoist}")

    # hoisted spheres tighten best_t before any slab test (kernel order)
    best_t = np.full((n,), np.inf, np.float32)
    for j in range(p.n_hoist):
        hx, hy, hz, hr2 = hp[j * 8 : j * 8 + 4]
        ocx = o - np.array([hx, hy, hz], np.float32)
        b = np.sum(ocx * d, axis=1, dtype=np.float32)
        cc = np.sum(ocx * ocx, axis=1, dtype=np.float32) - hr2
        with np.errstate(invalid="ignore"):
            tq = -b - np.sqrt(b * b - cc)
        tq = np.where(np.isnan(tq) | (tq < 0.0), np.float32(np.inf), tq)
        best_t = np.minimum(best_t, tq)

    # front-to-back order: argsort of point-to-box distance (launcher _f2b)
    q = np.clip(campos[None, :], bounds[:, 0:3], bounds[:, 3:6])
    order = np.argsort(np.sum((q - campos) ** 2, axis=1))

    # variant A (tightened): slab re-evaluated with the lane's running
    # best_t at each pop - what a per-lane walk with per-pop re-slab
    # skips down to. variant B (hoist-only): the need set frozen from
    # the post-hoist best_t - the ITERATION count a simple per-lane
    # design pays when the mask is computed once up front.
    need_mask = np.zeros((n, k), bool)
    need_mask_b = np.zeros((n, k), bool)
    best_t0 = best_t.copy()
    for c in order:
        m = slab_pass(o, d, bounds[c, 0:3], bounds[c, 3:6], best_t)
        need_mask[:, c] = m
        need_mask_b[:, c] = slab_pass(
            o, d, bounds[c, 0:3], bounds[c, 3:6], best_t0
        )
        tq = cluster_min_t(o[m], d[m], cols[c])
        best_t[m] = np.minimum(best_t[m], tq)

    need_cnt = need_mask.sum(axis=1).astype(np.int32)
    # sanity: per-lane best_t after the walk == the full-scene closest
    # hit, modulo knife-edge grazes where the XLA expansion-form
    # quadratic (ops/intersect.py ray_spheres_t) and this direct
    # oc-form (the kernel's) disagree on disc >= 0 - the same
    # documented ulp-decorrelation bench.py's gates calibrate around.
    fin = np.isfinite(best_t) & np.isfinite(t)
    with np.errstate(invalid="ignore"):
        dr = np.abs(np.where(fin, best_t - t, 0.0))
    frac = float((dr > 1e-3).mean())
    print(f"best_t vs closest-hit: {frac:.2e} of segments differ >1e-3 "
          f"(knife-edge form decorrelation; ~0 validates the replay)")

    ts = 128
    n_tx = -(-w // ts)
    tiles = (pix % w) // ts + ((pix // w) // ts) * n_tx
    rng = np.random.default_rng(0)
    row_max, row_union = grouped_stats(need_mask, need_cnt, tiles, 128, rng)
    slot_g = min(ts * ts, (n // max(1, len(np.unique(tiles)))))
    slot_max, slot_union = grouped_stats(
        need_mask, need_cnt, tiles, slot_g, rng
    )
    need_cnt_b = need_mask_b.sum(axis=1).astype(np.int32)
    row_max_b, _ = grouped_stats(need_mask_b, need_cnt_b, tiles, 128, rng)
    print(f"per-segment need (tightened): mean {need_cnt.mean():.2f}  "
          f"p50 {np.percentile(need_cnt, 50):.0f}  "
          f"p90 {np.percentile(need_cnt, 90):.0f}  "
          f"p99 {np.percentile(need_cnt, 99):.0f}  max {need_cnt.max()}")
    print(f"per-segment need (hoist-only): mean {need_cnt_b.mean():.2f}  "
          f"p90 {np.percentile(need_cnt_b, 90):.0f}")
    print(f"row of 128 : E[max] {row_max:.2f} tightened / "
          f"{row_max_b:.2f} hoist-only;  E[|union|] {row_union:.2f}")
    print(f"slot of {slot_g}: E[max] {slot_max:.2f}  "
          f"E[|union|] {slot_union:.2f}  <- compare measured visits/slot")
    # slot models at the shipped geometries: adaptive TS=128/ppl=1
    # (128 rows) and batched-parity TS=192/ppl=4 (72 rows)
    for label, rows, msk, cnt in (
        ("TS128 tight", 128, need_mask, need_cnt),
        ("TS128 hoist", 128, need_mask_b, need_cnt_b),
        ("TS192 tight", 72, need_mask, need_cnt),
        ("TS192 hoist", 72, need_mask_b, need_cnt_b),
    ):
        tu, ml, mr = slot_row_stats(msk, cnt, tiles, rows, rng)
        print(f"slot[{label}] rows={rows}: tile_union {tu:.2f}  "
              f"max_lane {ml:.2f} ({tu / max(ml, 1e-9):.2f}x)  "
              f"max_row_union {mr:.2f} ({tu / max(mr, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
