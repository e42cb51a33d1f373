"""Pallas TPU closest-hit kernel: per-tile cluster-culled intersection.

This is the hot loop of the whole framework - the TPU re-design of the
reference's per-thread exhaustive scan (CalculateRayCollision,
RayTracing.shader:256-297). Compute shape (see also kernels/pack.py):

  * a grid program owns a TILE of rays; ray components are (rows, 1) f32
    columns, primitives are tested 128 at a time as (1, 128) lane rows, so
    every (ray x primitive) quantity is a dense (rows, 128) VPU tile that
    lives entirely in VMEM/registers - no HBM traffic for pairwise work
    (vs ~10 KB/ray/bounce materialized by the pure-XLA pairwise path);
  * the dot-product-heavy terms run as skinny MXU matmuls per cluster:
    spheres need d.c and o.c; triangles need the 6 Moller-Trumbore
    contractions of the per-ray features [o, d, cross(o,d)] against
    precomputed per-triangle constant vectors;
  * each 128-primitive cluster has an AABB (Morton-ordered, spatially
    tight); the kernel slab-tests the whole tile against it and `lax.cond`-
    skips the cluster when NO ray can beat its current best hit inside the
    box - the per-tile generalization of the reference's per-chunk AABB
    gate (RayTracing.shader:279-281). Dead rays are parked by the caller
    (origin at +1e9 pointing away) so they never trigger cluster visits;
  * outputs are per-ray (t, code): 8 bytes/ray. Hit point, shading normal
    and material index are gathered in a cheap XLA epilogue so the bounce
    loop's RNG and shading keep bit-parity with the non-Pallas path.

Semantics match the reference tests exactly: sphere nearest-root-only with
dst >= 0 and no epsilon (RayTracing.shader:120-146); triangle backface cull
via det >= 1e-6 with t, u, v, w >= 0 (RayTracing.shader:150-174). The
cluster prune (t_far >= 0 and t_near <= min(t_far, best_t)) only skips
primitives that cannot produce a closer valid hit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.geometry import Scene
from ..ops import vecmath as vm
from ..ops.intersect import HitRecord, _triangle_normal_at

TILE_ROWS = 1024  # rays per grid program (VMEM-bounded: pair tiles are
                  # (TILE_ROWS, 128) f32)
LANES = 128

# Dead rays are parked here by the caller: beyond every scene AABB, pointing
# away, so every cluster slab test fails (t_far < 0).
PARK_ORIGIN = 1.0e9

_INF = np.float32(np.inf)
_DET_EPS = np.float32(1e-6)


def _dotc(rays3, tab3):
    """(rows, 3) x (3, 128) MXU contraction -> (rows, 128)."""
    return jax.lax.dot_general(
        rays3,
        tab3,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _closest_hit_kernel(
    scl_ref,  # SMEM int32 (2,): [n_sphere_clusters, n_tri_clusters]
    o_ref,  # (ROWS, 3) sublane-major (for MXU contractions)
    d_ref,  # (ROWS, 3)
    of_ref,  # (3, ROWS/128, 128) lane-major (for the slab-test phase)
    df_ref,  # (3, ROWS/128, 128)
    sph_bounds_ref,  # (NCs, 8)
    sph_c_ref,  # (NCs, 3, 128)
    sph_ccr_ref,  # (NCs, 128)
    sph_r_ref,  # (NCs, 128)
    tri_bounds_ref,  # (NCt, 8)
    tri_n_ref,  # (NCt, 3, 128)
    tri_ndota_ref,  # (NCt, 128)
    tri_eab_ref,
    tri_eac_ref,
    tri_ceaca_ref,
    tri_ceaba_ref,
    t_ref,  # out (ROWS/128, 128) f32
    code_ref,  # out (ROWS/128, 128) int32
):
    o = o_ref[:]  # (R, 3)
    d = d_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # (R, 1) columns
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    od = ox * dx + oy * dy + oz * dz  # (R, 1)
    oo = ox * ox + oy * oy + oz * oz
    # cross(o, d) per ray for the triangle contractions
    co = jnp.concatenate(
        [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx], axis=1
    )  # (R, 3)

    # Lane-major copies for the cull phase: full (8, 128) VPU utilization.
    fox, foy, foz = of_ref[0], of_ref[1], of_ref[2]  # (R/128, 128)
    finv_dx = 1.0 / df_ref[0]
    finv_dy = 1.0 / df_ref[1]
    finv_dz = 1.0 / df_ref[2]

    rows = o.shape[0]
    flat_shape = (rows // LANES, LANES)
    # Running best kept LANE-MAJOR so the cull phase reads it with no
    # relayout; the pair fold pays one (R,1)->(R/128,128) reshape per
    # VISITED cluster only.
    best_t = jnp.full(flat_shape, _INF)
    best_code = jnp.zeros(flat_shape, jnp.int32)

    def tile_hits_box(bounds_ref, c, best_t):
        t0x = (bounds_ref[c, 0] - fox) * finv_dx
        t1x = (bounds_ref[c, 3] - fox) * finv_dx
        t0y = (bounds_ref[c, 1] - foy) * finv_dy
        t1y = (bounds_ref[c, 4] - foy) * finv_dy
        t0z = (bounds_ref[c, 2] - foz) * finv_dz
        t1z = (bounds_ref[c, 5] - foz) * finv_dz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return jnp.any((tf >= 0.0) & (tn <= jnp.minimum(tf, best_t)))

    def fold_min(t_pair, code_base, best_t, best_code):
        """Fold per-pair distances (R, 128) into the lane-major best."""
        t_min = jnp.min(t_pair, axis=1, keepdims=True)  # (R, 1)
        arg = jnp.argmin(t_pair, axis=1).astype(jnp.int32)[:, None]
        t_min = t_min.reshape(flat_shape)
        arg = arg.reshape(flat_shape)
        better = t_min < best_t
        best_t = jnp.where(better, t_min, best_t)
        best_code = jnp.where(better, arg + code_base, best_code)
        return best_t, best_code

    # ---- spheres: one MXU+VPU pass per visited 128-cluster ----
    def sphere_cluster(c, carry):
        best_t, best_code = carry

        def visit(carry):
            best_t, best_code = carry
            ctab = sph_c_ref[c]  # (3, 128)
            dc = _dotc(d, ctab)  # (R, 128)
            oc = _dotc(o, ctab)
            b = od - dc  # dot(o-c, d)
            cc = oo - 2.0 * oc + sph_ccr_ref[c][None, :]
            disc = b * b - cc
            tq = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            valid = (
                (disc >= 0.0)
                & (tq >= 0.0)
                & (sph_r_ref[c][None, :] > 0.0)
            )
            t_pair = jnp.where(valid, tq, _INF)
            return fold_min(t_pair, c * LANES, best_t, best_code)

        return lax.cond(
            tile_hits_box(sph_bounds_ref, c, best_t), visit, lambda x: x,
            (best_t, best_code),
        )

    best_t, best_code = lax.fori_loop(
        0, scl_ref[0], sphere_cluster, (best_t, best_code)
    )

    # ---- triangles: 6 skinny matmuls + tail per visited cluster ----
    s_total = scl_ref[0] * LANES

    def tri_cluster(c, carry):
        best_t, best_code = carry

        def visit(carry):
            best_t, best_code = carry
            det = -_dotc(d, tri_n_ref[c])
            t_det = _dotc(o, tri_n_ref[c]) - tri_ndota_ref[c][None, :]
            u_det = _dotc(co, tri_eac_ref[c]) - _dotc(d, tri_ceaca_ref[c])
            v_det = -_dotc(co, tri_eab_ref[c]) + _dotc(d, tri_ceaba_ref[c])
            w_det = det - u_det - v_det
            hit = (
                (det >= _DET_EPS)
                & (t_det >= 0.0)
                & (u_det >= 0.0)
                & (v_det >= 0.0)
                & (w_det >= 0.0)
            )
            tq = t_det / jnp.where(det >= _DET_EPS, det, 1.0)
            t_pair = jnp.where(hit, tq, _INF)
            return fold_min(
                t_pair, s_total + c * LANES, best_t, best_code
            )

        return lax.cond(
            tile_hits_box(tri_bounds_ref, c, best_t), visit, lambda x: x,
            (best_t, best_code),
        )

    best_t, best_code = lax.fori_loop(
        0, scl_ref[1], tri_cluster, (best_t, best_code)
    )

    t_ref[:] = best_t
    code_ref[:] = best_code


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_closest_hit(o, d, packed, interpret=False):
    """Launch the kernel. o, d: (B, 3) f32. Returns (t (B,), code (B,))."""
    b = o.shape[0]
    b_pad = -(-b // TILE_ROWS) * TILE_ROWS
    if b_pad != b:
        pad = b_pad - b
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])

    # lane-major copies for the in-kernel cull phase
    of = o.T.reshape(3, b_pad // LANES, LANES)
    df = d.T.reshape(3, b_pad // LANES, LANES)

    grid = (b_pad // TILE_ROWS,)
    tr = TILE_ROWS // LANES
    ray_spec = pl.BlockSpec(
        (TILE_ROWS, 3), lambda i, scl: (i, 0), memory_space=pltpu.VMEM
    )
    flat_spec = pl.BlockSpec(
        (3, tr, LANES), lambda i, scl: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = lambda: pl.BlockSpec(
        (tr, LANES), lambda i, scl: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, scl: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            ray_spec,
            ray_spec,
            flat_spec,
            flat_spec,
            full(packed.sph_bounds),
            full(packed.sph_c),
            full(packed.sph_ccr),
            full(packed.sph_r),
            full(packed.tri_bounds),
            full(packed.tri_n),
            full(packed.tri_ndota),
            full(packed.tri_eab),
            full(packed.tri_eac),
            full(packed.tri_ceaca),
            full(packed.tri_ceaba),
        ],
        out_specs=[out_spec(), out_spec()],
    )
    n_clusters = jnp.asarray(
        [packed.n_sphere_clusters, packed.n_tri_clusters], jnp.int32
    )
    t, code = pl.pallas_call(
        _closest_hit_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        n_clusters,
        o,
        d,
        of,
        df,
        packed.sph_bounds,
        packed.sph_c,
        packed.sph_ccr,
        packed.sph_r,
        packed.tri_bounds,
        packed.tri_n,
        packed.tri_ndota,
        packed.tri_eab,
        packed.tri_eac,
        packed.tri_ceaca,
        packed.tri_ceaba,
    )
    return t.reshape(-1)[:b], code.reshape(-1)[:b]


def closest_hit_pallas(
    o, d, scene: Scene, interpret: bool = False
) -> HitRecord:
    """Closest hit via the Pallas kernel + XLA epilogue. Matches
    ``closest_hit_bruteforce`` semantics except exact-tie ordering between
    primitives (kernel visits Morton order; both keep strictly-closest)."""
    packed = scene.packed
    assert packed is not None, "scene was built without packed tables"
    t, code = _run_closest_hit(o, d, packed, interpret=interpret)

    hit = jnp.isfinite(t)
    point = o + d * jnp.where(hit, t, 0.0)[:, None]

    s_slots = packed.sphere_perm.shape[0]
    is_sphere = code < s_slots
    sph_idx = packed.sphere_perm[jnp.minimum(code, s_slots - 1)]
    tri_idx = packed.tri_perm[
        jnp.clip(code - s_slots, 0, packed.tri_perm.shape[0] - 1)
    ]
    n_sph = vm.normalize(point - scene.spheres.center[sph_idx])
    n_tri = _triangle_normal_at(o, d, scene.triangles, tri_idx)
    normal = jnp.where(is_sphere[:, None], n_sph, n_tri)
    mat_idx = jnp.where(
        is_sphere,
        scene.spheres.mat_idx[sph_idx],
        scene.triangles.mat_idx[tri_idx],
    )
    mat_idx = jnp.where(hit, mat_idx, 0)
    return HitRecord(hit=hit, t=t, point=point, normal=normal, mat_idx=mat_idx)
