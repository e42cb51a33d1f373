"""Pallas closest-hit kernel vs brute force (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.kernels.wavefront import closest_hit_pallas
from ray_tracing_extended_tpu.models.presets import (
    cornell_box_scene,
    three_sphere_scene,
)
from ray_tracing_extended_tpu.ops.intersect import closest_hit_bruteforce


def _rays(seed, n=2048, lo=-2, hi=2):
    rs = np.random.RandomState(seed)
    o = rs.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(scene, o, d):
    hb = closest_hit_bruteforce(o, d, scene)
    hp = closest_hit_pallas(o, d, scene, interpret=True)
    m = np.asarray(hb.hit)
    assert np.array_equal(m, np.asarray(hp.hit))
    assert np.allclose(
        np.asarray(hb.t)[m], np.asarray(hp.t)[m], rtol=1e-4, atol=1e-4
    )
    # knife-edge t ties may pick a different equally-close primitive
    assert (np.asarray(hb.mat_idx) == np.asarray(hp.mat_idx)).mean() > 0.999
    assert np.allclose(
        np.asarray(hb.normal)[m], np.asarray(hp.normal)[m], atol=1e-3
    )


def test_pallas_matches_bruteforce_spheres_and_tris():
    scene, _, _ = three_sphere_scene()
    _check(scene, *_rays(0))


def test_pallas_matches_bruteforce_cornell():
    scene, _, _ = cornell_box_scene()
    _check(scene, *_rays(1, lo=-0.9, hi=1.9))


def test_pallas_parked_rays_miss():
    scene, _, _ = three_sphere_scene()
    o = jnp.full((256, 3), 1.0e9, jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (256, 1))
    hp = closest_hit_pallas(o, d, scene, interpret=True)
    assert not np.asarray(hp.hit).any()
