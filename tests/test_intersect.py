"""Intersector unit tests vs closed-form oracles and the scalar reference."""

import numpy as np
import jax.numpy as jnp

import reference_tracer as ref
from ray_tracing_extended_tpu.models.scene import Material, SceneBuilder
from ray_tracing_extended_tpu.models.scene import _triangles_soa
from ray_tracing_extended_tpu.models.geometry import Spheres
from ray_tracing_extended_tpu.ops import intersect


def _spheres(centers, radii):
    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    return Spheres(
        center=jnp.asarray(centers),
        radius=jnp.asarray(radii),
        mat_idx=jnp.zeros(len(radii), jnp.int32),
    )


def test_sphere_head_on():
    sph = _spheres([[0.0, 0.0, 3.0]], [1.0])
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = np.asarray(intersect.ray_spheres_t(o, d, sph))
    assert np.isclose(t[0, 0], 2.0, atol=1e-5)


def test_sphere_behind_and_inside_semantics():
    sph = _spheres([[0.0, 0.0, -3.0], [0.0, 0.0, 0.0]], [1.0, 2.0])
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = np.asarray(intersect.ray_spheres_t(o, d, sph))
    # Sphere fully behind: miss (dst < 0 rejected, RayTracing.shader:138).
    assert np.isinf(t[0, 0])
    # Origin inside the sphere: nearest root is negative => miss, matching
    # the reference's no-second-root rule (SURVEY.md section 2.3 RaySphere).
    assert np.isinf(t[0, 1])


def test_sphere_padding_rejected():
    sph = _spheres([[0.0, 0.0, 0.0]], [-1.0])
    o = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = np.asarray(intersect.ray_spheres_t(o, d, sph))
    assert np.isinf(t).all()


def test_sphere_grazing_tangent_vs_scalar():
    rs = np.random.RandomState(0)
    centers = rs.uniform(-3, 3, (64, 3)).astype(np.float32)
    radii = rs.uniform(0.1, 1.5, (64,)).astype(np.float32)
    o = rs.uniform(-5, 5, (32, 3)).astype(np.float32)
    d = rs.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = np.asarray(
        intersect.ray_spheres_t(
            jnp.asarray(o), jnp.asarray(d), _spheres(centers, radii)
        )
    )
    for i in range(32):
        for j in range(64):
            hit, dst, _, _ = ref.ray_sphere(o[i], d[i], centers[j], radii[j])
            if hit and np.isfinite(t[i, j]):
                assert abs(t[i, j] - dst) < 1e-3 * max(1.0, dst)
            # knife-edge disagreements allowed only near tangency
            elif hit != np.isfinite(t[i, j]):
                oc = o[i] - centers[j]
                b = oc @ d[i]
                disc = b * b - (oc @ oc - radii[j] ** 2)
                assert abs(disc) < 1e-3


def _tri_soa(a, b, c, na=None, nb=None, nc=None):
    pos = np.array([[a, b, c]], np.float32)
    n = np.cross(np.subtract(b, a), np.subtract(c, a))
    n = n / np.linalg.norm(n)
    nrm = np.array(
        [[na if na is not None else n, nb if nb is not None else n,
          nc if nc is not None else n]], np.float32
    )
    return _triangles_soa(pos, nrm, np.zeros(1, np.int32))


def test_triangle_hit_and_backface_cull():
    # CCW when viewed against +z ray: normal = cross(ab, ac) must face -z
    # for det = -dot(d, n) >= 1e-6 with d = +z.
    a, b, c = [-1, -1, 2], [0, 1, 2], [1, -1, 2]
    tri = _tri_soa(a, b, c)
    o = jnp.asarray([[0.0, -0.2, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = np.asarray(intersect.ray_triangles_t(o, d, tri))
    hit_ref, dst_ref, _, _ = ref.ray_triangle(
        np.array([0, -0.2, 0], np.float32),
        np.array([0, 0, 1], np.float32),
        ref.Tri(*(np.asarray(v, np.float32) for v in (a, b, c)),
                *(np.zeros(3, np.float32),) * 3, None),
    )
    if hit_ref:
        assert np.isclose(t[0, 0], dst_ref, atol=1e-5)
    else:
        # winding gave a backface: flipping b/c must hit
        tri2 = _tri_soa(a, c, b)
        t2 = np.asarray(intersect.ray_triangles_t(o, d, tri2))
        assert np.isfinite(t2[0, 0])


def test_triangle_vs_scalar_random():
    rs = np.random.RandomState(1)
    pos = rs.uniform(-2, 2, (128, 3, 3)).astype(np.float32)
    pos[:, :, 2] += 4.0
    nrm = np.tile(np.array([0, 0, -1], np.float32), (128, 3, 1))
    tris = _triangles_soa(pos, nrm, np.zeros(128, np.int32))
    o = rs.uniform(-1, 1, (16, 3)).astype(np.float32)
    d = rs.normal(size=(16, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = np.asarray(
        intersect.ray_triangles_t(jnp.asarray(o), jnp.asarray(d), tris)
    )
    mismatches = 0
    for i in range(16):
        for j in range(128):
            tri = ref.Tri(
                pos[j, 0], pos[j, 1], pos[j, 2],
                nrm[j, 0], nrm[j, 1], nrm[j, 2], None,
            )
            hit, dst, _, _ = ref.ray_triangle(o[i], d[i], tri)
            if hit and np.isfinite(t[i, j]):
                assert abs(t[i, j] - dst) < 1e-3 * max(1.0, dst)
            elif hit != np.isfinite(t[i, j]):
                mismatches += 1  # knife-edge barycentric boundaries
    assert mismatches <= 2


def test_degenerate_padding_triangle_never_hits():
    pos = np.zeros((1, 3, 3), np.float32)
    nrm = np.zeros((1, 3, 3), np.float32)
    tris = _triangles_soa(pos, nrm, np.zeros(1, np.int32))
    o = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = np.asarray(intersect.ray_triangles_t(o, d, tris))
    assert np.isinf(t).all()


def test_aabb_parity_including_behind_ray():
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    bmin = jnp.asarray([[-1, -1, 2], [-1, -1, -4]], jnp.float32)
    bmax = jnp.asarray([[1, 1, 3], [1, 1, -2]], jnp.float32)
    hit = np.asarray(intersect.ray_aabb(o, d, bmin, bmax))
    assert hit[0, 0]
    # Box fully behind the ray STILL passes (RayTracing.shader:186 has no
    # tFar >= 0 test) - reproduced for parity.
    assert hit[0, 1]
    assert ref.ray_aabb(
        np.zeros(3, np.float32), np.array([0, 0, 1], np.float32),
        np.array([-1, -1, -4], np.float32), np.array([1, 1, -2], np.float32),
    )


def test_closest_hit_prefers_nearest_and_reports_material():
    b = SceneBuilder()
    b.add_sphere((0, 0, 5), 1.0, Material.lambertian((1, 0, 0)))
    b.add_sphere((0, 0, 3), 0.5, Material.lambertian((0, 1, 0)))
    scene = b.build()
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit = intersect.closest_hit_bruteforce(o, d, scene)
    assert bool(hit.hit[0])
    assert np.isclose(float(hit.t[0]), 2.5, atol=1e-5)
    assert int(hit.mat_idx[0]) == 1
    n = np.asarray(hit.normal[0])
    assert np.allclose(n, [0, 0, -1], atol=1e-5)
