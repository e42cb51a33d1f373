"""Golden-image regression tests (SURVEY.md section 4): small deterministic
renders compared against stored goldens. Catches any semantic drift in the
full pipeline (RNG, camera, intersection, shading, accumulation).

Regenerate (only after an INTENDED behavior change) with:
    RTE_REGEN_GOLDENS=1 python -m pytest tests/test_golden.py
"""

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.models.presets import (
    cornell_box_scene,
    three_sphere_scene,
)
from ray_tracing_extended_tpu.render import render_frame

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _check(name, scene, cam, cfg, frame=0, atol=2e-3):
    img = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(frame)))
    path = GOLDEN_DIR / f"{name}.npz"
    if os.environ.get("RTE_REGEN_GOLDENS"):
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        return
    golden = np.load(path)["img"].astype(np.float32)
    # f16 storage quantization + CPU/TPU transcendental ulps
    d = np.abs(img - golden)
    assert d.mean() < atol, f"{name}: mean drift {d.mean():.2e}"
    assert (d.max(axis=-1) < 0.05).mean() > 0.995, (
        f"{name}: {100 * (d.max(-1) >= 0.05).mean():.2f}% pixels drifted"
    )


def test_golden_three_sphere():
    scene, cam, cfg = three_sphere_scene(width=96, height=54, spp=4)
    _check("three_sphere_96x54_s4_f0", scene, cam, cfg)


def test_golden_cornell():
    scene, cam, cfg = cornell_box_scene(width=64, height=64, max_bounce=6, spp=2)
    _check("cornell_64x64_s2_f1", scene, cam, cfg, frame=1)


def test_golden_megakernel_interpret():
    """Pin the MEGAKERNEL's semantics with a golden (VERDICT round 3 weak
    item 5): render_frame on CPU never selects the megakernel, so the
    other goldens pin only the XLA path; the megakernel was pinned only
    by MC-statistical gates, which a small intentional-looking drift
    (e.g. a changed fold encode) could slip past. Interpret mode is
    bit-deterministic and tile-size invariant, so an exact-pipeline
    golden holds."""
    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = three_sphere_scene(width=64, height=32, spp=2)
    img = np.asarray(
        render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)[0]
    )
    path = GOLDEN_DIR / "mega_three_sphere_64x32_s2_f0.npz"
    if os.environ.get("RTE_REGEN_GOLDENS"):
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        return
    golden = np.load(path)["img"].astype(np.float32)
    d = np.abs(img - golden)
    # f16 storage quantization only - the pipeline itself is exact
    assert d.max() <= 2e-3, f"megakernel drift: max {d.max():.2e}"
