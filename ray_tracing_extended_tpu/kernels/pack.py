"""Scene packing for the Pallas closest-hit kernel.

Layout is driven by the kernel's compute shape (see kernels/wavefront.py):
rays live one-per-VPU-lane as (rows, 1) columns and primitives are tested
128 at a time as (1, 128) lane rows, so every (ray x primitive) quantity is a
dense lane-aligned (rows, 128) VPU tile and primitive parameters are loaded
as whole 128-wide vector rows - zero scalar loads in the hot loop.

  * primitives are Morton-sorted by centroid and grouped into clusters of
    128 (spatially tight thanks to the Morton order);
  * per cluster: one AABB for the tile-level cull (the per-tile lift of the
    reference's per-chunk AABB gate, RayTracing.shader:279-281) + transposed
    parameter rows;
  * spheres store |c|^2 - r^2 per lane so the kernel's quadratic needs only
    the two MXU dot products (d.c and o.c) plus a short elementwise tail;
  * triangles store the Moller-Trumbore constant vectors (n, cross(eAC, A),
    cross(eAB, A), edges, dot(n, A)) so every per-pair quantity is linear in
    the per-ray features [o, d, cross(o, d)] - 6 skinny MXU matmuls per
    cluster;
  * permutation arrays map sorted slot -> original primitive index for the
    XLA epilogue (normals/materials reuse the scene arrays).

Padding slots: spheres get radius -1 (rejected by the r > 0 test) at the
last real center; triangles get all-zero rows (det = 0 < 1e-6 never hits).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.geometry import Scene
from ..utils.pytree import pytree_dataclass

CLUSTER = 128


@pytree_dataclass(meta_fields=("n_sphere_clusters", "n_tri_clusters"))
class PackedScene:
    """Device tables for the Pallas intersector (all f32 unless noted)."""

    # spheres
    sph_bounds: jnp.ndarray  # (NCs, 8): cluster bmin3, bmax3, pad2
    sph_c: jnp.ndarray  # (NCs, 3, 128): centers, transposed per cluster
    sph_ccr: jnp.ndarray  # (NCs, 128): |c|^2 - r^2
    sph_r: jnp.ndarray  # (NCs, 128): radius (<=0 for padding)
    sphere_perm: jnp.ndarray  # (NCs * 128,) int32 slot -> original index
    # triangles
    tri_bounds: jnp.ndarray  # (NCt, 8)
    tri_n: jnp.ndarray  # (NCt, 3, 128): geometric normal n
    tri_ndota: jnp.ndarray  # (NCt, 128): dot(n, A)
    tri_eab: jnp.ndarray  # (NCt, 3, 128)
    tri_eac: jnp.ndarray  # (NCt, 3, 128)
    tri_ceaca: jnp.ndarray  # (NCt, 3, 128): cross(eAC, A)
    tri_ceaba: jnp.ndarray  # (NCt, 3, 128): cross(eAB, A)
    tri_perm: jnp.ndarray  # (NCt * 128,) int32
    n_sphere_clusters: int
    n_tri_clusters: int


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    from ..accel.bvh import _morton3

    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    denom = np.where(hi > lo, hi - lo, 1.0)
    scale = np.where(hi > lo, 1023.0 / denom, 0.0)
    q = np.clip((centroids - lo) * scale, 0, 1023).astype(np.uint32)
    return np.argsort(_morton3(q), kind="stable").astype(np.int32)


def pack_scene(scene: Scene) -> PackedScene:
    centers = np.asarray(scene.spheres.center)
    radii = np.asarray(scene.spheres.radius)
    real_s = np.nonzero(radii > 0)[0]

    if len(real_s):
        order = real_s[_morton_order(centers[real_s])]
        s_pad = -(-len(order) // CLUSTER) * CLUSTER
        c = np.zeros((s_pad, 3), np.float32)
        r = np.full((s_pad,), -1.0, np.float32)
        perm = np.full((s_pad,), order[-1], np.int32)
        c[: len(order)] = centers[order]
        c[len(order):] = centers[order[-1]]
        r[: len(order)] = radii[order]
        perm[: len(order)] = order
    else:
        s_pad = CLUSTER
        c = np.zeros((s_pad, 3), np.float32)
        r = np.full((s_pad,), -1.0, np.float32)
        perm = np.zeros((s_pad,), np.int32)
    ncs = s_pad // CLUSTER
    sph_bounds = np.zeros((ncs, 8), np.float32)
    for k in range(ncs):
        cs = c[k * CLUSTER : (k + 1) * CLUSTER]
        rs = r[k * CLUSTER : (k + 1) * CLUSTER]
        live = rs > 0
        if live.any():
            rr = rs[live][:, None]
            sph_bounds[k, :3] = (cs[live] - rr).min(axis=0)
            sph_bounds[k, 3:6] = (cs[live] + rr).max(axis=0)
        # else: zero box at origin; its spheres all have r <= 0
    sph_c = c.reshape(ncs, CLUSTER, 3).transpose(0, 2, 1).copy()
    sph_ccr = ((c * c).sum(axis=1) - r * r).reshape(ncs, CLUSTER)
    sph_r = r.reshape(ncs, CLUSTER)

    pa = np.asarray(scene.triangles.pos_a)
    eab = np.asarray(scene.triangles.edge_ab)
    eac = np.asarray(scene.triangles.edge_ac)
    n = np.asarray(scene.triangles.n)
    real_t = np.nonzero((n * n).sum(axis=1) > 0)[0]

    if len(real_t):
        centroids = pa[real_t] + (eab[real_t] + eac[real_t]) / 3.0
        order = real_t[_morton_order(centroids)]
        t_pad = -(-len(order) // CLUSTER) * CLUSTER
        tpa = np.zeros((t_pad, 3), np.float32)
        teab = np.zeros((t_pad, 3), np.float32)
        teac = np.zeros((t_pad, 3), np.float32)
        tn = np.zeros((t_pad, 3), np.float32)
        tperm = np.full((t_pad,), order[-1], np.int32)
        tpa[: len(order)] = pa[order]
        teab[: len(order)] = eab[order]
        teac[: len(order)] = eac[order]
        tn[: len(order)] = n[order]
        tperm[: len(order)] = order
    else:
        t_pad = CLUSTER
        tpa = np.zeros((t_pad, 3), np.float32)
        teab = np.zeros((t_pad, 3), np.float32)
        teac = np.zeros((t_pad, 3), np.float32)
        tn = np.zeros((t_pad, 3), np.float32)
        tperm = np.zeros((t_pad,), np.int32)
    nct = t_pad // CLUSTER
    tri_bounds = np.zeros((nct, 8), np.float32)
    for k in range(nct):
        sl = slice(k * CLUSTER, (k + 1) * CLUSTER)
        live = (tn[sl] ** 2).sum(axis=1) > 0
        if live.any():
            verts = np.concatenate(
                [
                    tpa[sl][live],
                    tpa[sl][live] + teab[sl][live],
                    tpa[sl][live] + teac[sl][live],
                ]
            )
            tri_bounds[k, :3] = verts.min(axis=0)
            tri_bounds[k, 3:6] = verts.max(axis=0)

    def t3(a):
        return a.reshape(nct, CLUSTER, 3).transpose(0, 2, 1).copy()

    return PackedScene(
        sph_bounds=jnp.asarray(sph_bounds),
        sph_c=jnp.asarray(sph_c),
        sph_ccr=jnp.asarray(sph_ccr),
        sph_r=jnp.asarray(sph_r),
        sphere_perm=jnp.asarray(perm),
        tri_bounds=jnp.asarray(tri_bounds),
        tri_n=jnp.asarray(t3(tn)),
        tri_ndota=jnp.asarray((tn * tpa).sum(axis=1).reshape(nct, CLUSTER)),
        tri_eab=jnp.asarray(t3(teab)),
        tri_eac=jnp.asarray(t3(teac)),
        tri_ceaca=jnp.asarray(t3(np.cross(teac, tpa))),
        tri_ceaba=jnp.asarray(t3(np.cross(teab, tpa))),
        tri_perm=jnp.asarray(tperm),
        n_sphere_clusters=int(ncs),
        n_tri_clusters=int(nct),
    )
