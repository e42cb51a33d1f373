"""Megakernel (interpret mode) vs the XLA reference path.

The megakernel shares the XLA path's RNG layout; outputs differ only by the
documented <=1-ulp RandomValue rounding (kernels/megakernel.py docstring), so
whole-frame comparisons are tight except for rare knife-edge path divergence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega
from ray_tracing_extended_tpu.models.presets import (
    cornell_box_scene,
    three_sphere_scene,
)
from ray_tracing_extended_tpu.render import render_frame


def _compare(scene, cam, cfg, frame=3, tight=1e-3):
    a = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(frame)))
    b, segs = render_frame_mega(
        scene, cam, cfg, jnp.uint32(frame), interpret=True
    )
    b = np.asarray(b)
    assert not np.isnan(b).any()
    d = np.abs(a - b).max(axis=-1)
    assert (d < tight).mean() > 0.995, f"frac tight {(d < tight).mean()}"
    assert np.abs(a - b).mean() < 1e-3
    assert int(segs) > 0
    return a, b


def test_mega_three_sphere_matches_xla():
    scene, cam, cfg = three_sphere_scene(width=128, height=48, spp=2)
    _compare(scene, cam, cfg)


def test_mega_cornell_matches_xla():
    # triangles + dielectric + metal + emissive, env off
    scene, cam, cfg = cornell_box_scene(width=96, height=96, max_bounce=4, spp=1)
    _compare(scene, cam, cfg)


def test_mega_odd_image_size():
    scene, cam, cfg = three_sphere_scene(width=100, height=45, spp=1)
    _compare(scene, cam, cfg, frame=0)


def test_mega_high_bounce():
    """High bounce depths must not unroll (Balls Outdoors ships
    maxBounce=30, Balls Outdoors.unity:488): the persistent-lane scheduler
    runs a flat slot loop whose static bound scales with spp*(bounce+1) but
    whose compile size does not. Verified on hardware at the shipped
    30/30 settings (79.8 ms @ 720p, 602 Mrays/s - the ground-sphere
    hoist un-poisons the scene's single sub-cluster, round 2); this test
    keeps the scheduling path honest at depth 12 vs the XLA reference."""
    import dataclasses

    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    cfg = dataclasses.replace(cfg, max_bounce=12)
    _compare(scene, cam, cfg, frame=1)


def test_mega_bounce_stats():
    """collect_stats returns per-bounce live counts consistent with the
    segment counter (alive-fraction observability, SURVEY section 5)."""
    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    img, segs, counts = render_frame_mega(
        scene, cam, cfg, jnp.uint32(0), interpret=True, collect_stats=True
    )
    # the launcher returns the FULL hist block (top rows carry cull
    # diagnostics); rows [0, max_bounce] are the public bounce histogram
    # (render_frame_with_stats slices them)
    counts = np.asarray(counts)[: cfg.max_bounce + 1]
    assert counts.shape == (cfg.max_bounce + 1,)
    assert counts[0] >= 64 * 32 * 2  # every path alive at bounce 0
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))
    # the histogram and the segment counter count the same events (modulo
    # edge-tile border duplicates, absent at this 64x32 = exact tiling...
    # 64x32 is one partial tile; allow the duplicate slack)
    assert counts.sum() >= int(segs)


def test_mega_segment_count_sane():
    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    _, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    n_paths = 64 * 32 * 2
    # every path traces at least 1 and at most max_bounce+1 segments
    assert n_paths <= int(segs) <= n_paths * (cfg.max_bounce + 1)


def test_mega_adaptive_spp_refill():
    """cfg.adaptive_spp: lanes past their quota trace extra samples while
    tile-mates are below it; output is the per-pixel mean over >= spp
    completed samples. Consistent (MC-level agreement; a small
    stopping-time length-bias bounded by ~one partial sample per pixel,
    see utils/config.py adaptive_spp) - the refilled render must agree
    with the fixed-spp one within MC noise, with strictly more segments
    traced."""
    import dataclasses

    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=4)
    a, segs_a = render_frame_mega(scene, cam, cfg, jnp.uint32(0),
                                  interpret=True)
    cfg_ad = dataclasses.replace(cfg, adaptive_spp=True)
    b, segs_b = render_frame_mega(scene, cam, cfg_ad, jnp.uint32(0),
                                  interpret=True)
    a, b = np.asarray(a), np.asarray(b)
    assert not np.isnan(b).any()
    assert int(segs_b) > int(segs_a)  # refill traced extra real work
    # same estimator mean: refilled pixels average more samples of the
    # same per-pixel RNG stream; agreement is MC-level, not bit-level
    assert np.abs(a - b).mean() < 0.05
    assert np.abs(a.mean() - b.mean()) < 0.01


def test_xla_block_size_invariant():
    """XLA-path renders are bit-identical across block_size: per-pixel
    seeds are global, so re-batching the pixel axis only re-orders work
    (the fragment-shader independence property, SURVEY section 4)."""
    import dataclasses

    from ray_tracing_extended_tpu.render import render_frame

    scene, cam, cfg = three_sphere_scene(width=64, height=36, spp=1)
    a = render_frame(
        scene, cam, dataclasses.replace(cfg, block_size=256), jnp.uint32(2)
    )
    b = render_frame(
        scene, cam, dataclasses.replace(cfg, block_size=1024),
        jnp.uint32(2),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mega_phase_split_bit_identical(monkeypatch):
    """RTX_MEGA_PHASES=2 (coherence-split slots: fresh camera rays and
    scattered survivors trace in alternating slots) only re-orders WHEN
    lanes trace - per-lane draw sequences and banking are untouched, so
    parity-mode output must be bit-identical to the mixed scheduler."""
    import os

    scene, cam, cfg = three_sphere_scene(width=48, height=32, spp=2)
    monkeypatch.setitem(os.environ, "RTX_MEGA_PHASES", "1")
    a, sa = render_frame_mega(scene, cam, cfg, jnp.uint32(3),
                              interpret=True)
    monkeypatch.setitem(os.environ, "RTX_MEGA_PHASES", "2")
    b, sb = render_frame_mega(scene, cam, cfg, jnp.uint32(3),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sa) == int(sb)


def test_mega_fast_scatter_distribution():
    """cfg.fast_scatter swaps the unit-vector sampler for a 2-draw
    area-preserving one; the scatter DISTRIBUTION is identical, so renders
    must agree within MC noise (individual samples legitimately differ)."""
    import dataclasses

    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=8)
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    cfg_f = dataclasses.replace(cfg, fast_scatter=True)
    b, _ = render_frame_mega(scene, cam, cfg_f, jnp.uint32(0),
                             interpret=True)
    a, b = np.asarray(a), np.asarray(b)
    assert not np.isnan(b).any()
    assert not np.array_equal(a, b)  # different draws...
    assert np.abs(a - b).mean() < 0.05  # ...same estimator
    assert np.abs(a.mean() - b.mean()) < 0.01


def test_mega_tile_size_invariant(monkeypatch):
    """Per-pixel output is independent of the screen tiling: seeds are
    global pixel indices and each lane runs its own sample state machine,
    so re-tiling only re-orders lanes. conftest pins RTX_MEGA_TS=32 for
    interpret-mode speed; this guards that the knob cannot change images."""
    import os

    scene, cam, cfg = three_sphere_scene(width=48, height=32, spp=1)
    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "32")
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(1), interpret=True)
    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "16")
    b, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(1), interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mega_frame_batch_matches_sequential():
    """K-frame batched launch (render_frames_mega): lanes advance through
    independently-seeded frames instead of idling after their spp quota -
    the output accumulator must match the sequential render +
    ops/accumulate fold to within 1 ulp per fold step (the fold is the
    same f32 expression, but mul+add contraction differs between the
    in-kernel and XLA compilation contexts), with the same total segment
    count (it is the same work, rescheduled)."""
    import dataclasses

    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )
    from ray_tracing_extended_tpu.ops.accumulate import accumulate

    scene, cam, cfg = three_sphere_scene(width=32, height=16, spp=2)
    for clamp in (True, False):
        c = dataclasses.replace(cfg, clamp_accumulate=clamp)
        acc = jnp.zeros((16, 32, 3), jnp.float32)
        segs_seq = 0
        for f in range(3):
            img, segs = render_frame_mega(
                scene, cam, c, jnp.uint32(f), interpret=True
            )
            acc = accumulate(acc, img, jnp.uint32(f), clamp=clamp)
            segs_seq += int(segs)
        acc_b, segs_b = render_frames_mega(
            scene, cam, c, jnp.uint32(0),
            jnp.zeros((16, 32, 3), jnp.float32), 3, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(acc_b), rtol=0, atol=5e-7
        )
        assert segs_seq == int(segs_b)


def test_render_frames_and_accumulate_xla_path():
    """The public fused progressive step falls back to a sequential XLA
    fold off-TPU and matches render_and_accumulate exactly."""
    from ray_tracing_extended_tpu.render import (
        render_and_accumulate,
        render_frames_and_accumulate,
    )

    scene, cam, cfg = three_sphere_scene(width=32, height=16, spp=2)
    acc = jnp.zeros((16, 32, 3), jnp.float32)
    for f in range(2):
        acc = render_and_accumulate(scene, cam, cfg, acc, jnp.uint32(f))
    acc_b, segs = render_frames_and_accumulate(
        scene, cam, cfg, jnp.zeros((16, 32, 3), jnp.float32),
        jnp.uint32(0), 2,
    )
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(acc_b))
    assert int(segs) > 0


def test_mega_ts_knob_validated(monkeypatch):
    """RTX_MEGA_TS values whose TS*TS is not a multiple of 128 would
    floor-truncate ROWS and silently drop pixels; the knob must reject
    them (ADVICE round 2). A VMEM estimate exists for any packed scene
    and accounts for the lane-state buffers."""
    import os

    from ray_tracing_extended_tpu.kernels.megakernel import (
        _N_LANE_STATE,
        mega_vmem_estimate,
        tile_size,
    )

    scene, cam, cfg = three_sphere_scene(width=48, height=32, spp=1)
    for bad in ("40", "0", "-64"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_TS", bad)
        with pytest.raises(ValueError, match="RTX_MEGA_TS"):
            tile_size(scene.packed)
    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "64")
    assert tile_size(scene.packed) == 64
    monkeypatch.delitem(os.environ, "RTX_MEGA_TS")
    est = mega_vmem_estimate(scene, cfg)
    assert est["lane_state"] == (
        _N_LANE_STATE * tile_size(scene.packed) ** 2 * 4
    )
    assert est["total"] == sum(
        est[k] for k in ("tables", "lane_state", "fetch_scratch", "outputs")
    )


def test_mega_winner_fetch_matches_onehot(monkeypatch):
    """The winner post-pass fetch (big scenes: attr tables contracted
    against the winning-lane one-hot AFTER the closest-hit fold) must be
    bit-compatible with the one-hot fetch - same fields, same winners.
    Forced on a tiny mixed sphere+triangle scene by patching the slot
    threshold; the real trigger is n_slots > ONEHOT_MAX_SLOTS (pack.py)."""
    from ray_tracing_extended_tpu.kernels import pack as pack_mod

    scene, cam, cfg = cornell_box_scene(width=64, height=64, max_bounce=3,
                                        spp=1)
    assert scene.packed.fetch_mode == "onehot"
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(2), interpret=True)

    monkeypatch.setattr(pack_mod, "ONEHOT_MAX_SLOTS", 0)
    scene_w, cam, cfg = cornell_box_scene(width=64, height=64, max_bounce=3,
                                          spp=1)
    assert scene_w.packed.fetch_mode == "winner"
    b, _ = render_frame_mega(scene_w, cam, cfg, jnp.uint32(2),
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mega_winner_fetch_spheres_only(monkeypatch):
    from ray_tracing_extended_tpu.kernels import pack as pack_mod

    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    monkeypatch.setattr(pack_mod, "ONEHOT_MAX_SLOTS", 0)
    scene_w, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    assert scene_w.packed.fetch_mode == "winner"
    b, _ = render_frame_mega(scene_w, cam, cfg, jnp.uint32(0),
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mega_cost_paired_bit_identical(monkeypatch):
    """Cost-guided lane pairing (pair_costs): the permutation changes WHICH
    lane traces which pixel, but every pixel's RNG stream depends only on
    its own global index, so the accumulator AND the per-pixel segment map
    must be BIT-identical for any cost map - an adversarial random one and
    a real segs_map from a prior launch alike. 48x24 with TS=32 also
    exercises the edge-clamped tile path under permutation."""
    import os

    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )

    scene, cam, cfg = three_sphere_scene(width=48, height=24, spp=2)
    rng = np.random.default_rng(7)
    costs = jnp.asarray(
        rng.integers(0, 100, size=(24, 48)).astype(np.int32)
    )
    for ppl in ("2", "4"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PPL", ppl)
        acc = jnp.zeros((24, 48, 3), jnp.float32)
        img0, s0, m0 = render_frames_mega(
            scene, cam, cfg, jnp.uint32(1), acc, 2, interpret=True,
            segs_map=True,
        )
        img1, s1, m1 = render_frames_mega(
            scene, cam, cfg, jnp.uint32(1), acc, 2, interpret=True,
            segs_map=True, pair_costs=costs,
        )
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        assert int(s0) == int(s1)
        # chain a REAL cost map (the production pairing signal)
        img2, s2 = render_frames_mega(
            scene, cam, cfg, jnp.uint32(1), acc, 2, interpret=True,
            pair_costs=m0,
        )
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img2))
        assert int(s0) == int(s2)


def test_mega_cost_paired_winner_mode(monkeypatch):
    """Cost-guided pairing composes with the winner post-pass fetch (big
    scenes): batched paired render must be bit-identical to unpaired."""
    import os

    from ray_tracing_extended_tpu.kernels import pack as pack_mod
    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )

    monkeypatch.setattr(pack_mod, "ONEHOT_MAX_SLOTS", 0)
    monkeypatch.setitem(os.environ, "RTX_MEGA_PPL", "2")
    scene, cam, cfg = three_sphere_scene(width=48, height=24, spp=2)
    assert scene.packed.fetch_mode == "winner"
    acc = jnp.zeros((24, 48, 3), jnp.float32)
    img0, s0, m0 = render_frames_mega(
        scene, cam, cfg, jnp.uint32(1), acc, 2, interpret=True,
        segs_map=True,
    )
    img1, s1 = render_frames_mega(
        scene, cam, cfg, jnp.uint32(1), acc, 2, interpret=True,
        pair_costs=m0,
    )
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    assert int(s0) == int(s1)


def test_cluster_slots_invariants():
    """pack._cluster_slots layout contract: every primitive appears in
    exactly one slot, clusters are SUB-aligned blocks whose dead pad
    slots repeat a live member of the SAME cluster (keeps pad centers
    inside the cluster box), the k-means partition never has MORE
    summed cluster-AABB surface area than the Morton runs it starts
    from (best-SA iterate selection), and the layout is deterministic
    call-to-call (it feeds checkpoint fingerprints)."""
    from ray_tracing_extended_tpu.kernels import pack

    rng = np.random.default_rng(7)
    for n in (5, 32, 33, 100, 481):
        pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        r = rng.uniform(0.1, 0.5, (n, 1)).astype(np.float32)
        lo, hi = pts - r, pts + r
        slots, live = pack._cluster_slots(lo, hi)
        k = -(-n // pack.SUB)
        assert len(slots) == k * pack.SUB == len(live)
        assert live.sum() == n
        assert sorted(slots[live].tolist()) == list(range(n))
        for i in range(0, len(slots), pack.SUB):
            blk, lv = slots[i : i + pack.SUB], live[i : i + pack.SUB]
            assert set(blk[~lv].tolist()) <= set(blk[lv].tolist())
        slots2, live2 = pack._cluster_slots(lo, hi)
        np.testing.assert_array_equal(slots, slots2)
        np.testing.assert_array_equal(live, live2)
        morder = pack._morton_order(((lo + hi) * 0.5).astype(np.float32))
        minit = np.empty(n, np.int32)
        minit[morder] = (np.arange(n) // pack.SUB).astype(np.int32)
        fin = np.empty(n, np.int32)
        for i in range(0, len(slots), pack.SUB):
            fin[slots[i : i + pack.SUB][live[i : i + pack.SUB]]] = (
                i // pack.SUB
            )
        assert (
            pack._cluster_sa(fin, lo, hi, k)
            <= pack._cluster_sa(minit, lo, hi, k) + 1e-3
        )


def test_mega_perlane_cull_matches_default(monkeypatch):
    """RTX_MEGA_PERLANE=1 (per-row-uniform sub-cluster pops): each
    128-lane row drains only its own needed clusters via scalar-core
    bit pops instead of riding the whole tile's visit union. The
    frozen-at-slot-start need masks make its visit set a SUPERSET of the
    default path's, and a min-fold over a superset can only differ
    within the encode's documented ulp-scale slack - in practice the
    frames agree bit-for-bit at this size (measured; assert near-equal
    to stay robust to knife-edge winner flips)."""
    import os

    from ray_tracing_extended_tpu.models.presets import rtiow_final_scene

    scene, cam, cfg = rtiow_final_scene(
        width=96, height=48, max_bounce=2, spp=1
    )
    p = scene.packed
    assert p.n_sphere_supers <= 1 and p.n_sphere_subs_visit >= 2, (
        "preset no longer exercises the per-lane cull eligibility"
    )
    monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", "0")
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(2), interpret=True)
    a = np.asarray(a)
    for mode in ("1", "2"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", mode)
        b, segs = render_frame_mega(
            scene, cam, cfg, jnp.uint32(2), interpret=True
        )
        b = np.asarray(b)
        assert int(segs) > 0
        d = np.abs(a - b).max(axis=-1)
        assert (d == 0).mean() > 0.999, (
            f"mode {mode}: pixels differing {(d > 0).mean()}"
        )
        assert np.abs(a - b).mean() < 1e-4


def test_mega_perlane_cull_tri_matches_default(monkeypatch):
    """Triangle flavour of the per-lane cull drain (Cornell: 4 tri subs
    + 4 sphere subs, both branches eligible, wide encode)."""
    import os

    from ray_tracing_extended_tpu.models.presets import cornell_box_scene

    scene, cam, cfg = cornell_box_scene(
        width=64, height=64, max_bounce=3, spp=1
    )
    p = scene.packed
    assert p.n_tri_supers <= 1 and 2 <= p.n_tri_subs <= 24
    monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", "0")
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(1), interpret=True)
    a = np.asarray(a)
    for mode in ("1", "2"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", mode)
        b, segs = render_frame_mega(
            scene, cam, cfg, jnp.uint32(1), interpret=True
        )
        b = np.asarray(b)
        assert int(segs) > 0
        d = np.abs(a - b).max(axis=-1)
        assert (d == 0).mean() > 0.999, (
            f"mode {mode}: pixels differing {(d > 0).mean()}"
        )
        assert np.abs(a - b).mean() < 1e-4


def test_mega_perlane_cull_batched_paired(monkeypatch):
    """Per-lane cull under the parity production path: K-frame batched
    launch with multi-pixel lanes and cost-guided pairing. The drain
    scheme is agnostic to the lane->pixel mapping, so the accumulator
    must match the default path's exactly as in the single-frame case."""
    import os

    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )
    from ray_tracing_extended_tpu.models.presets import rtiow_final_scene

    scene, cam, cfg = rtiow_final_scene(
        width=64, height=32, max_bounce=2, spp=1
    )
    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "32")
    monkeypatch.setitem(os.environ, "RTX_MEGA_PPL", "2")
    rng = np.random.default_rng(3)
    costs = jnp.asarray(
        rng.integers(0, 50, size=(32, 64)).astype(np.int32)
    )
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", knob)
        acc = jnp.zeros((32, 64, 3), jnp.float32)
        acc, segs, m = render_frames_mega(
            scene, cam, cfg, jnp.uint32(1), acc, 2,
            interpret=True, segs_map=True, pair_costs=costs,
        )
        outs[knob] = (np.asarray(acc), int(segs), np.asarray(m))
    d = np.abs(outs["0"][0] - outs["1"][0]).max(axis=-1)
    assert (d == 0).mean() > 0.999, f"pixels differing: {(d > 0).mean()}"
    np.testing.assert_array_equal(outs["0"][2], outs["1"][2])


def test_mega_perlane_knob_validated(monkeypatch):
    import os

    from ray_tracing_extended_tpu.kernels.megakernel import perlane_cull

    monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", "3")
    with pytest.raises(ValueError, match="RTX_MEGA_PERLANE"):
        perlane_cull()
    for v in ("0", "1", "2"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", v)
        assert perlane_cull() == int(v)
    monkeypatch.delitem(os.environ, "RTX_MEGA_PERLANE")
    assert perlane_cull() == 0


def test_mega_config_tuning_fields(monkeypatch):
    """cfg.mega_tile_size / mega_phases / mega_pixels_per_lane are the
    production surface for the RTX_MEGA_* env knobs (VERDICT round 3
    weak item 7): they must route to the kernel (through the config jit
    cache key, so no stale-cache misfires), leave the image bit-identical
    (tiling/scheduling are estimator-invariant), and validate() must
    reject bad values. Env vars keep dev-override precedence."""
    import dataclasses
    import os

    scene, cam, cfg = three_sphere_scene(width=48, height=32, spp=1)
    # conftest pins RTX_MEGA_TS for interpret speed; drop it so the cfg
    # field (not the env override) picks the tile size
    monkeypatch.delitem(os.environ, "RTX_MEGA_TS", raising=False)
    base = dataclasses.replace(cfg, mega_tile_size=16)
    a, _ = render_frame_mega(scene, cam, base, jnp.uint32(1), interpret=True)
    tuned = dataclasses.replace(
        cfg, mega_tile_size=32, mega_phases=2, mega_pixels_per_lane=2
    )
    b, _ = render_frame_mega(scene, cam, tuned, jnp.uint32(1), interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from ray_tracing_extended_tpu.kernels.megakernel import (
        n_phases,
        pixels_per_lane,
        tile_size,
    )

    assert tile_size(scene.packed, False, override=32) == 32
    # env var wins over the config field (dev override for A/B tools)
    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "16")
    assert tile_size(scene.packed, False, override=32) == 16
    monkeypatch.delitem(os.environ, "RTX_MEGA_TS")
    assert n_phases(2) == 2 and pixels_per_lane(False, override=4) == 4
    with pytest.raises(ValueError, match="mega_tile_size"):
        dataclasses.replace(cfg, mega_tile_size=17).validate()
    with pytest.raises(ValueError, match="mega_pixels_per_lane"):
        dataclasses.replace(cfg, mega_pixels_per_lane=3).validate()
    with pytest.raises(ValueError, match="mega_phases"):
        dataclasses.replace(cfg, mega_phases=0).validate()
    with pytest.raises(ValueError, match="mega_tile_size"):
        tile_size(scene.packed, False, override=17)

    from ray_tracing_extended_tpu.kernels.megakernel import rowdrain_cull

    # cfg.mega_rowdrain routes to the knob; env keeps dev precedence
    monkeypatch.delitem(os.environ, "RTX_MEGA_ROWDRAIN", raising=False)
    assert rowdrain_cull(None) is None  # auto: size rule in the launcher
    assert rowdrain_cull(False) == 0 and rowdrain_cull(True) == 1
    monkeypatch.setitem(os.environ, "RTX_MEGA_ROWDRAIN", "0")
    assert rowdrain_cull(True) == 0
    monkeypatch.delitem(os.environ, "RTX_MEGA_ROWDRAIN")
    with pytest.raises(ValueError, match="mega_rowdrain"):
        dataclasses.replace(cfg, mega_rowdrain=3).validate()


def test_mega_rowdrain_matches_default(monkeypatch):
    """Per-row 1-level sub drain (RTX_MEGA_ROWDRAIN, large tri scenes
    with >1 super-cluster): bit-identical to the tile-gated two-level
    loops in both fetch modes. The 2-super knot exercises a full 32-rank
    word (incl. the i32 sign-bit rank 31) plus a partial second word and
    the idempotent empty-row pop path."""
    import os

    import ray_tracing_extended_tpu.kernels.pack as pack
    from ray_tracing_extended_tpu.models.presets import mesh_scene

    monkeypatch.setitem(os.environ, "RTX_MEGA_TS", "16")
    for winner in (False, True):
        if winner:
            monkeypatch.setattr(pack, "ONEHOT_MAX_SLOTS", 64)
        scene, cam, cfg = mesh_scene(
            width=32, height=16, spp=1, target_tris=1200
        )
        p = scene.packed
        assert p.n_tri_supers > 1
        assert (p.fetch_mode == "winner") == winner
        monkeypatch.setitem(os.environ, "RTX_MEGA_ROWDRAIN", "0")
        a, sa = render_frame_mega(
            scene, cam, cfg, jnp.uint32(1), interpret=True
        )
        monkeypatch.setitem(os.environ, "RTX_MEGA_ROWDRAIN", "1")
        b, sb = render_frame_mega(
            scene, cam, cfg, jnp.uint32(1), interpret=True
        )
        a, b = np.asarray(a), np.asarray(b)
        assert int(sa) == int(sb) and int(sa) > 0
        np.testing.assert_array_equal(a, b)
