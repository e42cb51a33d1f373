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


def test_mega_sharded_tiles_only_odd_height():
    # height not divisible by bands * tile size: clamped rows masked out
    scene, cam, cfg = three_sphere_scene(width=128, height=100, spp=1)
    mesh = make_mesh(spp_parallel=1)  # 8 bands of 64 rows (6 past the image)
    img, segs = render_frame_mega_sharded(scene, cam, cfg, jnp.uint32(0), mesh)
    a, s = render_frame_mega(scene, cam, cfg, jnp.uint32(0), interpret=True)
    assert np.array_equal(np.asarray(img), np.asarray(a))
    assert int(segs) == int(s)
