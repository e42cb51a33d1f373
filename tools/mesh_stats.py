"""Per-row vs per-tile cull unions on the 70k-tri mesh (direction-finding).

The mesh scene runs at ~1.4 Mrays/s because every lane pays the per-TILE
visit union: 475 of 2188 tri subs per slot at TS=64 (round 2), i.e.
475 x 32 state rows = 15,200 (row x 32-pair-block) tests per slot while
the true per-segment need is a handful of clusters. tools/mesh_ab.py
measured every within-model knob negative (tile size, phase split, SUB
size), so the next candidate is a PER-ROW two-level drain: each 128-lane
row walks only the SUPER-clusters its own lanes need (SMEM bitmask pops,
the round-3 drain machinery), slab-tests the popped super's 32 subs for
that row ((32, 128) vreg blocks), and pair-tests only the row-passing
subs. Whether that wins hinges on the gap between per-row and per-tile
unions on real bunny segments - what this tool measures.

Two t-bound models bracket the kernel's front-to-back evolution:
  final  each segment's slab tests use its TRUE closest-hit t
         (perfect-ordering traversal; optimistic)
  inf    no t-bound (pessimistic)
Slot composition models: 'coh' groups segments by kernel lane layout
(pixel-coherent rows - optimistic vs the re-seeded real scheduler),
'mix' shuffles segments within each tile (pessimistic; RTIOW measured
real unions ~40% below 'mix').

Usage: python tools/mesh_stats.py [W H] (default 320 192; runs the
segment collection on the default JAX backend - use the TPU, the 70k-tri
brute force is hopeless on CPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ray_tracing_extended_tpu.models import presets


def slab(o, d, t_bound, lo, hi):
    """(N, C) slab-pass mask: segments (N, 3) vs boxes (C, 3)/(C, 3) with
    per-segment t bound - the kernel's tile_hits semantics
    (tf >= 0 and tn <= min(tf, best_t))."""
    inv = 1.0 / d  # (N, 3); inf on zero components matches the kernel
    t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    return (tf >= 0.0) & (tn <= np.minimum(tf, t_bound[:, None]))


def union_stats(mask, pix, W, ts, rng, sup_of=None):
    """Per-row / per-tile union sizes for both slot-composition models.

    mask: (N, C) need mask; pix: (N,) pixel ids. Lane layout: tile
    (ty, tx), row = local_pixel_index // 128 within the tile.

    Also returns the DRAIN-semantic block counts: a per-row-uniform pop
    loop runs max-over-rows iterations with idempotent re-tests on
    drained rows, so its pair-block cost per tile is
    rows * max_g |row union| (single-level drain over all C ranks) and,
    when ``sup_of`` maps each column to a super-cluster,
    sum_over_supers rows * max_g |row union within super| (two-level:
    outer loop over tile-visited supers, inner per-row sub drain)."""
    x = pix % W
    y = pix // W
    tile = (y // ts) * ((W + ts - 1) // ts) + (x // ts)
    local = (y % ts) * ts + (x % ts)
    row = local // 128
    # 'morton' layout: local index = Morton code of (lx, ly) within the
    # tile, so each 128-lane row is a compact 2^a x 2^b pixel PATCH
    # (16x8 at ts=64) instead of a 2-row raster strip. Implementable as
    # a pure within-tile pixel permutation (the cost-pairing machinery
    # already routes one through the kernel) - zero kernel changes.
    lx, ly = x % ts, y % ts
    mcode = np.zeros_like(lx)
    for b in range(int(np.log2(ts))):
        mcode |= ((lx >> b) & 1) << (2 * b) | ((ly >> b) & 1) << (
            2 * b + 1
        )
    row_m = mcode // 128
    rows_per_tile = (ts * ts) // 128
    out = {}
    for model in ("coh", "morton", "mix", "regroup"):
        row_sizes, tile_sizes = [], []
        drain1, drain2 = [], []
        for t in np.unique(tile):
            sel = np.where(tile == t)[0]
            if model == "mix":
                # shuffle segments into the same number of lane rows the
                # kernel has (segments outnumber pixels - every pixel
                # contributes several bounce segments to this lumped
                # whole-frame "slot")
                r = rng.permutation(len(sel)) * rows_per_tile // len(sel)
            elif model == "morton":
                r = row_m[sel]
            elif model == "regroup":
                # DYNAMIC ray->lane regrouping (round-5 VERDICT item 1a):
                # within the tile, sort segments by their nearest needed
                # sub (first set bit in storage order - Morton storage
                # makes nearby indices spatially nearby) so rays needing
                # the same clusters share rows, then chunk the sorted
                # order into the kernel's rows. Upper-bounds what an
                # on-device per-slot permutation could achieve; the real
                # mechanism would pay a per-bounce sort + state gather.
                m0 = mask[sel]
                key = np.where(
                    m0.any(axis=1), m0.argmax(axis=1), m0.shape[1]
                )
                order = np.argsort(key, kind="stable")
                r = np.empty(len(sel), np.int64)
                r[order] = np.arange(len(sel)) * rows_per_tile // len(sel)
            else:
                r = row[sel]
            m = mask[sel]
            tile_sizes.append(m.any(axis=0).sum())
            row_unions = np.zeros((rows_per_tile, m.shape[1]), bool)
            for g in np.unique(r):
                ru = m[r == g].any(axis=0)
                row_unions[g] = ru
                row_sizes.append(ru.sum())
            counts = row_unions.sum(axis=1)  # per-row union size
            drain1.append(rows_per_tile * counts.max())
            if sup_of is not None:
                per_sup = np.zeros(
                    (rows_per_tile, sup_of.max() + 1), np.int64
                )
                np.add.at(
                    per_sup.T, sup_of,
                    row_unions.T.astype(np.int64),
                )
                drain2.append(rows_per_tile * per_sup.max(axis=0).sum())
        out[model] = (
            float(np.mean(row_sizes)),
            float(np.mean(tile_sizes)),
            rows_per_tile,
            float(np.mean(drain1)),
            float(np.mean(drain2)) if sup_of is not None else None,
        )
    return out


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    scene, cam, cfg = presets.mesh_scene(width=W, height=H, spp=1)
    p = scene.packed
    print(f"mesh {W}x{H} spp{cfg.spp} mb{cfg.max_bounce}: "
          f"{p.n_tri_subs} tri subs, {p.n_tri_supers} supers", flush=True)

    from tools.perlane_sim import collect_segments

    t0 = time.time()
    o, d, t, pix = collect_segments(scene, cam, cfg, blk=4096)
    print(f"{len(o)} segments collected in {time.time() - t0:.0f}s",
          flush=True)

    sup_b = np.asarray(p.tri_super_bounds, np.float32)
    sub_b = np.asarray(p.tri_sub_bounds, np.float32)
    n_sup, n_sub = len(sup_b), p.n_tri_subs
    sub_b = sub_b[:n_sub]
    rng = np.random.default_rng(0)

    for bound_name in ("final", "inf"):
        tb = t if bound_name == "final" else np.full_like(t, np.inf)
        # chunk the (N, C) masks
        sup_m = np.zeros((len(o), n_sup), bool)
        sub_m = np.zeros((len(o), n_sub), bool)
        for i0 in range(0, len(o), 4096):
            s = slice(i0, i0 + 4096)
            sup_m[s] = slab(o[s], d[s], tb[s],
                            sup_b[:, 0:3], sup_b[:, 3:6])
            sub_m[s] = slab(o[s], d[s], tb[s],
                            sub_b[:, 0:3], sub_b[:, 3:6])
        need_sup = sup_m.sum(axis=1)
        need_sub = sub_m.sum(axis=1)
        print(f"\n== t-bound: {bound_name} ==")
        print(f"per-seg need: supers mean {need_sup.mean():.2f} "
              f"p95 {np.percentile(need_sup, 95):.0f} of {n_sup}; "
              f"subs mean {need_sub.mean():.2f} "
              f"p95 {np.percentile(need_sub, 95):.0f} of {n_sub}")
        # ---- round-5 unbuilt-mechanism models (VERDICT item 1) ----
        # (b) cluster-major + ray compaction (global wavefront): per
        # front-to-back sub, COMPACT the segments that need it into
        # dense 128-lane rows and pair-test only those. Block count =
        # sum_c ceil(needing_c / 128); the realizable mechanism adds a
        # per-bounce XLA sort + ray-state gather/scatter (~16 f32 per
        # segment at HBM bandwidth) and the per-sub slab tests.
        n_c = sub_m.sum(axis=0)
        blocks_compact = int(np.ceil(n_c / 128.0).sum())
        # (c) per-lane short-stack over supers: each lane visits only
        # its OWN needed subs; a 128-lane row advances in lockstep, so
        # the row pays max-over-lanes visits, and EVERY visit needs a
        # per-lane one-hot gather of that lane's cluster columns (the
        # winner-fetch machinery run per visit, not per hit).
        ts0 = 64
        rows_per_tile = (ts0 * ts0) // 128
        x = pix % W
        y = pix // W
        tile_id = (y // ts0) * ((W + ts0 - 1) // ts0) + (x // ts0)
        local = (y % ts0) * ts0 + (x % ts0)
        row_id = tile_id * rows_per_tile + local // 128
        need_per_seg = sub_m.sum(axis=1)
        blocks_stack = 0
        order = np.argsort(row_id, kind="stable")
        rid_s = row_id[order]
        npz = need_per_seg[order]
        cuts = np.flatnonzero(np.diff(rid_s)) + 1
        for grp in np.split(npz, cuts):
            blocks_stack += int(grp.max())
        tg_total = 0
        for tt in np.unique(tile_id):
            mm = sub_m[tile_id == tt]
            tg_total += rows_per_tile * int(mm.any(axis=0).sum())
        print(f"WHOLE-FRAME pair blocks: tile-gated {tg_total} | "
              f"cluster-major compaction {blocks_compact} "
              f"({tg_total / max(blocks_compact, 1):.1f}x) | "
              f"per-lane short-stack row-max {blocks_stack} "
              f"({tg_total / max(blocks_stack, 1):.1f}x, + one-hot "
              f"gather per block)")
        sup_of = np.arange(n_sub) // 32
        for ts in (64,):
            su = union_stats(sup_m, pix, W, ts, rng)
            sb = union_stats(sub_m, pix, W, ts, rng, sup_of=sup_of)
            for model in ("coh", "morton", "mix", "regroup"):
                r_s, t_s, rpt, _, _ = su[model]
                r_b, t_b2, _, d1, d2 = sb[model]
                # pair blocks per tile: tile-gated = rows * tile union;
                # ideal row drain = sum_g row-union (no max coupling);
                # d1/d2 = realizable drain costs (max-over-rows semantic)
                cur = rpt * t_b2
                ideal = rpt * r_b
                print(f"TS={ts} {model}: supers row {r_s:.1f} / tile "
                      f"{t_s:.1f}; subs row {r_b:.1f} / tile {t_b2:.1f}\n"
                      f"  pair-blocks: tile-gated {cur:.0f} | ideal "
                      f"{ideal:.0f} ({cur / ideal:.2f}x) | 1-level drain "
                      f"{d1:.0f} ({cur / d1:.2f}x) | 2-level drain "
                      f"{d2:.0f} ({cur / d2:.2f}x)")


if __name__ == "__main__":
    main()
