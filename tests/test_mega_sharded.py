"""Multi-chip megakernel: band-split + spp-pmean on the virtual mesh."""

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega
from ray_tracing_extended_tpu.models.presets import three_sphere_scene
from ray_tracing_extended_tpu.parallel.sharding import (
    make_mesh,
    render_frame_mega_sharded,
)


def test_mega_sharded_bitexact_and_counts():
    scene, cam, cfg = three_sphere_scene(width=128, height=128, spp=1)
    mesh = make_mesh(spp_parallel=2)  # 2 spp rows x 4 bands
    img, segs = render_frame_mega_sharded(scene, cam, cfg, jnp.uint32(0), mesh)
    a0, s0 = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    a1, s1 = render_frame_mega(scene, cam, cfg, jnp.uint32(1), interpret=True)
    ref = (np.asarray(a0) + np.asarray(a1)) / 2
    assert np.array_equal(np.asarray(img), ref)
    assert int(segs) == int(s0) + int(s1)


def test_mega_sharded_adaptive_refill():
    """Sharded + adaptive refill: refill counts depend on each band's
    tile companions, so the image is NOT bit-equal to single-chip - but
    it must stay a valid estimate of the same radiance (MC agreement)
    with at least as many segments as fixed-spp."""
    import dataclasses

    scene, cam, cfg = three_sphere_scene(width=128, height=128, spp=2)
    cfg_ad = dataclasses.replace(cfg, adaptive_spp=True)
    mesh = make_mesh(spp_parallel=1)
    img, segs = render_frame_mega_sharded(
        scene, cam, cfg_ad, jnp.uint32(0), mesh
    )
    ref, s0 = render_frame_mega(scene, cam, cfg, jnp.uint32(0),
                                interpret=True)
    img, ref = np.asarray(img), np.asarray(ref)
    assert not np.isnan(img).any()
    assert int(segs) > int(s0)
    # MC-level agreement at spp=2 (measured mean |d| ~ 0.050)
    assert np.abs(img - ref).mean() < 0.08
    assert np.abs(img.mean() - ref.mean()) < 0.01


def test_mega_sharded_tiles_only_odd_height():
    # height not divisible by bands * tile size: clamped rows masked out
    scene, cam, cfg = three_sphere_scene(width=128, height=100, spp=1)
    mesh = make_mesh(spp_parallel=1)  # 8 bands of 64 rows (6 past the image)
    img, segs = render_frame_mega_sharded(scene, cam, cfg, jnp.uint32(0), mesh)
    a, s = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    assert np.array_equal(np.asarray(img), np.asarray(a))
    assert int(segs) == int(s)


def test_flythrough_progressive_sharded_matches_manual():
    """BASELINE config 5 composition (downscaled): a camera fly-through
    accumulated over a ('spp'=1, 'tiles'=2) mesh must be bit-identical to
    the manual single-chip loop of render_frame_mega + accumulate over
    the same frame indices (band split preserves per-pixel seeds)."""
    import jax

    from ray_tracing_extended_tpu.models.presets import flythrough_cameras
    from ray_tracing_extended_tpu.ops.accumulate import accumulate
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cams, cfg = flythrough_cameras(3, width=64, height=64)
    mesh = make_mesh(jax.devices()[:2], spp_parallel=1)
    img_sh = render_progressive(
        scene, None, cfg, frames=3, cameras=cams, mesh=mesh
    )
    acc = jnp.zeros((64, 64, 3), jnp.float32)
    for f in range(3):
        cur, _ = render_frame_mega(
            scene, cams[f], cfg, jnp.uint32(f), interpret=True
        )
        acc = accumulate(acc, cur, f, clamp=cfg.clamp_accumulate)
    np.testing.assert_array_equal(np.asarray(img_sh), np.asarray(acc))


def test_flythrough_progressive_spp_sharded():
    """spp_parallel=2: each step renders 2 frame seeds merged by the one
    pmean; folding their mean with weight 1/(s+1) equals the flat average
    over all 2*steps frames (HDR mode - the clamp path raises)."""
    import dataclasses

    import jax
    import pytest

    from ray_tracing_extended_tpu.models.presets import flythrough_cameras
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cams, cfg = flythrough_cameras(2, width=64, height=64)
    mesh = make_mesh(jax.devices()[:4], spp_parallel=2)
    img = render_progressive(
        scene, None, cfg, frames=2, cameras=cams, mesh=mesh
    )
    # manual: step s folds mean(frames 2s, 2s+1) with weight 1/(s+1)
    acc = np.zeros((64, 64, 3), np.float32)
    for s in range(2):
        frames = [
            np.asarray(
                render_frame_mega(
                    scene, cams[s], cfg, jnp.uint32(2 * s + r),
                    interpret=True,
                )[0]
            )
            for r in range(2)
        ]
        w = np.float32(1.0 / (s + 1))
        acc = acc * (1 - w) + (frames[0] + frames[1]) / 2 * w
    assert np.abs(np.asarray(img) - acc).max() < 1e-6
    cfg_clamp = dataclasses.replace(cfg, clamp_accumulate=True)
    with pytest.raises(ValueError, match="spp-sharded"):
        render_progressive(
            scene, None, cfg_clamp, frames=2, cameras=cams, mesh=mesh
        )


def test_progressive_cameras_unsharded():
    """render_progressive(cameras=...) on the single-chip path: per-frame
    cameras accumulate with the reference weighting (previously untested -
    VERDICT round-2 weak item 3), and the camera-count validation fires."""
    import pytest

    from ray_tracing_extended_tpu.models.presets import flythrough_cameras
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cams, cfg = flythrough_cameras(2, width=48, height=32)
    img = render_progressive(scene, None, cfg, frames=2, cameras=cams)
    assert img.shape == (32, 48, 3)
    assert not np.isnan(img).any()
    with pytest.raises(ValueError, match="cameras covers"):
        render_progressive(scene, None, cfg, frames=3, cameras=cams)


def test_mega_sharded_batched_paired_triangles_bitexact(monkeypatch):
    """Round-5 multi-chip productionization: the parity-headline scheduler
    (K-frame batched launches + cost-guided lane pairing, segment map
    chained across chunks) composed with the 'tiles' band split must be
    bit-identical to the single-chip batched+paired chain over the same
    frame indices - on a TRIANGLE scene, in BOTH fetch modes (the round-4
    sharded tests were sphere-only). TS/ppl pinned via cfg so paired and
    unpaired launches share one band layout."""
    import dataclasses

    import jax

    from ray_tracing_extended_tpu.kernels import pack as pack_mod
    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )
    from ray_tracing_extended_tpu.models.presets import cornell_box_scene
    from ray_tracing_extended_tpu.progressive import render_progressive

    for winner in (False, True):
        if winner:
            monkeypatch.setattr(pack_mod, "ONEHOT_MAX_SLOTS", 0)
        scene, cam, cfg = cornell_box_scene(
            width=64, height=64, max_bounce=3, spp=1
        )
        assert (scene.packed.fetch_mode == "winner") == winner
        cfg = dataclasses.replace(
            cfg, mega_tile_size=32, mega_pixels_per_lane=2
        )
        mesh = make_mesh(jax.devices()[:2], spp_parallel=1)
        img_sh = render_progressive(
            scene, cam, cfg, frames=4, mesh=mesh, batch=2
        )
        # single-chip chain, seeded with the same zeros cost map the
        # sharded path uses (identity pairing; estimator-invariant)
        acc = jnp.zeros((64, 64, 3), jnp.float32)
        cmap = jnp.zeros((64, 64), jnp.int32)
        for chunk in range(2):
            acc, _, cmap = render_frames_mega(
                scene, cam, cfg, jnp.uint32(2 * chunk), acc, 2,
                interpret=True, segs_map=True, pair_costs=cmap,
            )
        np.testing.assert_array_equal(np.asarray(img_sh), np.asarray(acc))


def test_mega_sharded_rowdrain_mesh_bitexact():
    """Band-split render of a multi-super triangle mesh with the per-row
    drain forced ON: bit-identical to single-chip (the drain is tile-local,
    so the band split cannot perturb it). Covers the rowdrain + winner-mode
    path under a mesh, previously sphere-only."""
    import dataclasses

    import jax

    from ray_tracing_extended_tpu.models.presets import mesh_scene

    scene, cam, cfg = mesh_scene(
        width=32, height=32, spp=1, target_tris=1200
    )
    assert scene.packed.n_tri_supers > 1
    cfg = dataclasses.replace(cfg, mega_tile_size=16, mega_rowdrain=True)
    mesh = make_mesh(jax.devices()[:2], spp_parallel=1)
    img, segs = render_frame_mega_sharded(scene, cam, cfg, jnp.uint32(1),
                                          mesh)
    ref, s0 = render_frame_mega(scene, cam, cfg, jnp.uint32(1),
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
    assert int(segs) == int(s0)


def test_progressive_sharded_reset_on_move():
    """reset_on_move over a mesh (step granularity): after the camera
    moves, the result is the fresh average of the trailing run - here a
    single frame, so exactly the single-chip render of that frame."""
    import jax

    from ray_tracing_extended_tpu.models.presets import flythrough_cameras
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cams, cfg = flythrough_cameras(2, width=64, height=64)
    cameras = [cams[0], cams[0], cams[1]]
    mesh = make_mesh(jax.devices()[:2], spp_parallel=1)
    img = render_progressive(
        scene, None, cfg, frames=3, cameras=cameras, mesh=mesh,
        reset_on_move=True,
    )
    ref, _ = render_frame_mega(
        scene, cams[1], cfg, jnp.uint32(2), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))


def test_progressive_sharded_batch_spp_mesh_rejected():
    import jax
    import pytest

    from ray_tracing_extended_tpu.models.presets import three_sphere_scene
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cam, cfg = three_sphere_scene(width=64, height=64, spp=1)
    mesh = make_mesh(jax.devices()[:4], spp_parallel=2)
    with pytest.raises(ValueError, match="spp_parallel=1"):
        render_progressive(scene, cam, cfg, frames=2, mesh=mesh, batch=2)
