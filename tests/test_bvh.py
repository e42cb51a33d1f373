"""LBVH: build invariants + traversal equivalence with brute force."""

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.accel.bvh import build_lbvh, closest_hit_bvh
from ray_tracing_extended_tpu.models.scene import Material, SceneBuilder
from ray_tracing_extended_tpu.ops.intersect import closest_hit_bruteforce
from ray_tracing_extended_tpu.scene.procedural import uv_sphere_mesh


def _random_scene(seed=0, n_spheres=60, with_mesh=True, bvh="both"):
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    for _ in range(n_spheres):
        b.add_sphere(
            rs.uniform(-4, 4, 3),
            rs.uniform(0.1, 0.7),
            Material.lambertian(rs.uniform(0.2, 0.9, 3)),
        )
    if with_mesh:
        v, f = uv_sphere_mesh(12, 24, 1.2)
        b.add_mesh(
            v, f, Material.lambertian((0.5, 0.5, 0.8)),
            transform=np.array(
                [[1, 0, 0, 0.5], [0, 1, 0, -0.3], [0, 0, 1, 0.2], [0, 0, 0, 1]],
                np.float32,
            ),
        )
    return b.build(build_bvh=bvh)


def _random_rays(seed=1, n=256):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_invariants():
    rs = np.random.RandomState(3)
    n = 333
    bmin = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    bmax = bmin + rs.uniform(0.01, 1.0, (n, 3)).astype(np.float32)
    bvh = build_lbvh(bmin, bmax, sentinel=n)
    left = np.asarray(bvh.left)
    leaf_row = np.asarray(bvh.leaf_row)
    prims = np.asarray(bvh.leaf_prims)
    # every real primitive appears exactly once across leaves
    real = prims[prims < n]
    assert sorted(real.tolist()) == list(range(n))
    # node bounds contain their primitives' bounds
    nb_min = np.asarray(bvh.bounds_min)
    nb_max = np.asarray(bvh.bounds_max)
    for node in range(len(left)):
        row = leaf_row[node]
        if row >= 0:
            for pidx in prims[row]:
                if pidx < n:
                    assert (nb_min[node] <= bmin[pidx] + 1e-6).all()
                    assert (nb_max[node] >= bmax[pidx] - 1e-6).all()
    # child bounds nested in parents
    right = np.asarray(bvh.right)
    for node in range(len(left)):
        if leaf_row[node] < 0:
            for ch in (left[node], right[node]):
                assert (nb_min[node] <= nb_min[ch] + 1e-6).all()
                assert (nb_max[node] >= nb_max[ch] - 1e-6).all()


def test_bvh_matches_bruteforce():
    scene = _random_scene()
    o, d = _random_rays()
    hb = closest_hit_bruteforce(o, d, scene)
    hv = closest_hit_bvh(o, d, scene)
    assert np.array_equal(np.asarray(hb.hit), np.asarray(hv.hit))
    t_b, t_v = np.asarray(hb.t), np.asarray(hv.t)
    m = np.asarray(hb.hit)
    assert np.allclose(t_b[m], t_v[m], rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.asarray(hb.mat_idx), np.asarray(hv.mat_idx))
    assert np.allclose(
        np.asarray(hb.normal)[m], np.asarray(hv.normal)[m], atol=1e-4
    )


def test_bvh_tri_only_and_sphere_only():
    for mode in ("tri", "sphere"):
        scene = _random_scene(seed=7, bvh=mode)
        o, d = _random_rays(seed=9)
        hb = closest_hit_bruteforce(o, d, scene)
        hv = closest_hit_bvh(o, d, scene)
        assert np.array_equal(np.asarray(hb.hit), np.asarray(hv.hit))
        m = np.asarray(hb.hit)
        assert np.allclose(
            np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4, atol=1e-5
        )


def test_bvh_rays_from_inside_scene():
    scene = _random_scene(seed=11)
    rs = np.random.RandomState(13)
    o = rs.uniform(-1, 1, (128, 3)).astype(np.float32)
    d = rs.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hb = closest_hit_bruteforce(jnp.asarray(o), jnp.asarray(d), scene)
    hv = closest_hit_bvh(jnp.asarray(o), jnp.asarray(d), scene)
    assert np.array_equal(np.asarray(hb.hit), np.asarray(hv.hit))
    m = np.asarray(hb.hit)
    assert np.allclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4, atol=1e-5
    )
