"""Progressive driver: checkpoint/resume semantics and metrics output."""

import json

import numpy as np
import pytest

from ray_tracing_extended_tpu.models.presets import three_sphere_scene
from ray_tracing_extended_tpu.progressive import render_progressive
from ray_tracing_extended_tpu.utils import checkpoint as ckpt
from ray_tracing_extended_tpu.utils.metrics import MetricsLogger


def _setup():
    return three_sphere_scene(width=64, height=32, spp=1)


def test_resume_equals_straight_run(tmp_path):
    scene, cam, cfg = _setup()
    straight = render_progressive(scene, cam, cfg, frames=4)

    ck = tmp_path / "ck.npz"
    render_progressive(scene, cam, cfg, frames=2, checkpoint_path=str(ck))
    resumed = render_progressive(
        scene, cam, cfg, frames=2, checkpoint_path=str(ck), resume=True
    )
    assert np.allclose(resumed, straight, atol=1e-6)


def test_resume_rejects_mismatched_config(tmp_path):
    scene, cam, cfg = _setup()
    ck = tmp_path / "ck.npz"
    render_progressive(scene, cam, cfg, frames=1, checkpoint_path=str(ck))
    import dataclasses

    cfg2 = dataclasses.replace(cfg, max_bounce=cfg.max_bounce + 1)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        render_progressive(
            scene, cam, cfg2, frames=1, checkpoint_path=str(ck), resume=True
        )


def test_metrics_jsonl(tmp_path):
    scene, cam, cfg = _setup()
    mpath = tmp_path / "m.jsonl"
    logger = MetricsLogger(str(mpath))
    render_progressive(scene, cam, cfg, frames=3, metrics=logger)
    logger.close()
    lines = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert len(lines) == 3
    assert lines[0]["frame"] == 0
    for l in lines:
        assert l["mrays_per_s"] > 0
        assert 1.0 <= l["rays_per_path"] <= cfg.max_bounce + 1
        # SURVEY section 5 observability: per-bounce alive fraction +
        # accumulated-image variance estimate
        af = l["alive_frac"]
        assert len(af) == cfg.max_bounce + 1
        assert af[0] == 1.0  # every path is alive at bounce 0
        assert all(af[i] >= af[i + 1] for i in range(len(af) - 1))
        # alive_frac must integrate to rays/path (same honest counters)
        assert abs(sum(af) - l["rays_per_path"]) < 1e-2
    assert "accum_var" not in lines[0]
    assert lines[1]["accum_var"] > 0
    # variance of the running mean shrinks as frames accumulate
    assert lines[2]["accum_var"] < lines[1]["accum_var"]


def test_checkpoint_atomic_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    p = tmp_path / "c.npz"
    ckpt.save(p, img, 7, "abc")
    out, frame = ckpt.load(p, "abc")
    assert frame == 7 and np.array_equal(out, img)
    with pytest.raises(ValueError):
        ckpt.load(p, "different")


def test_render_progressive_batched_matches_per_frame(tmp_path):
    """batch>1 fuses frames per launch with cost-map chaining; the result
    must match the per-frame loop within fold contraction noise (1 ulp
    per accumulate step), including a non-multiple tail chunk."""
    import numpy as np

    from ray_tracing_extended_tpu.models.presets import three_sphere_scene
    from ray_tracing_extended_tpu.progressive import render_progressive

    scene, cam, cfg = three_sphere_scene(width=32, height=16, spp=2)
    a = render_progressive(scene, cam, cfg, frames=5)
    b = render_progressive(scene, cam, cfg, frames=5, batch=2)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_reset_on_move_restarts_accumulation():
    """reset_on_move (ghosting opt-out extension): when the camera
    changes, the running average restarts, so the result equals a fresh
    progressive render of the trailing same-camera run - bit-identical,
    including the per-frame clamp weights. The default path keeps the
    reference's ghosting-by-design global weights (SURVEY section 3.4)."""
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.models.presets import flythrough_cameras
    from ray_tracing_extended_tpu.ops.accumulate import accumulate
    from ray_tracing_extended_tpu.render import render_frame_with_stats

    scene, cams, cfg = flythrough_cameras(2, width=48, height=32)
    cfg = type(cfg)(**{**cfg.__dict__, "spp": 1, "max_bounce": 2})
    path = [cams[0], cams[0], cams[1], cams[1]]

    got = render_progressive(
        scene, None, cfg, frames=4, cameras=path, reset_on_move=True
    )
    # manual: the trailing run (frames 2, 3 under cams[1]) folded with
    # run-relative weights 1/1, 1/2
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for k, f in enumerate((2, 3)):
        cur, _ = render_frame_with_stats(
            scene, cams[1], cfg, jnp.uint32(f)
        )
        acc = accumulate(acc, cur, k, clamp=cfg.clamp_accumulate)
    np.testing.assert_array_equal(got, np.asarray(acc))

    with pytest.raises(ValueError, match="reset_on_move requires"):
        render_progressive(scene, cams[0], cfg, frames=1,
                           reset_on_move=True)
