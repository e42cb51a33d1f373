"""Isolated sphere pair-test block roofline: the achievable ceiling of
the megakernel's hot loop, WITHOUT scheduler/slab/fetch/occupancy.

tools/vpu_roofline.py measures the pure mul+max issue rate (~8.9 T
el-ops/s on v5e, round 4 - NOT the ~4 T recorded in round 3's
speed-of-light section, which this round's re-run corrects). The pair
loop sustains only ~2.7 T by that accounting, so the question is where
the 3.3x sits: the block's own instruction mix (broadcast (1,128) rows
against (SUB,1) cluster columns, one sqrt in the chain, the where+
bitcast encode, VMEM scratch round-trips Mosaic cannot register-
allocate across scf iterations) or the kernel around it (slab tests,
scheduler, shading, refill).

This kernel replays the EXACT sphere_row_test + fold_pair sequence
(megakernel.py:778-806, wide encode) over resident (RS, 128) ray
state and a resident cluster-column table, V visits per row per grid
step, nothing else. el-ops counted exactly like ROADMAP round 3
(30/pair-test: 3 sub, 5 b, 6 cc, 4 tq chain + sqrt as 1, ~6 encode,
5 fold/bookkeeping).

Usage: python tools/pairblock_roofline.py [variant...] -> one JSON
line per variant. Variants decompose the instruction-mix cost:
  full      the exact kernel block (default)
  nosqrt    sqrt replaced by a mul (quantifies the sqrt's share)
  noenc     plain f32 min of tq, no where/bitcast encode
  nomin     encode kept, running-best min/store dropped (scratch IO)

Round-5 restructured variants (VERDICT item 3: the pair-block's
skinny-operand structure - (1, 128) ray rows x (SUB, 1) broadcast
columns - is the named residual between the block's 2.75-3.0 T
ceiling and the 8.9 T pure-stream rate; these probe whether any
reshaping of the SAME work lifts the isolated block):
  multisub2 two sub-clusters fused per op: (2*SUB, 1) columns, half
            the visits - taller sublane operands per instruction
  multisub4 four fused: (4*SUB, 1) columns, quarter the visits
  multirow  native (8, 128) ray-tile ops: all RS rows advance together
            against ONE primitive's scalar params per op (the primitive
            loop replaces the sublane broadcast)
  twophase  sqrt-free phase-1 test only (b/cc/disc + sign masks, no
            sqrt/encode/fold): the upper bound of a two-phase scheme
            where the exact t is recomputed only for rare survivors

Compare pairs_gps across variants (ops_per_pair differs for twophase).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 32
RS = 8          # rows of ray state, like TS=128/ppl=2 parity launches
NCL = 16        # resident clusters in the cols table
VISITS = 8      # cluster visits per row per outer step
STEPS = 64      # outer steps per grid program
GRID = 64
OPS_PER_PAIR = 30
_INF = np.float32(np.inf)
_WIDEN = np.int32(~2047)


def _make_kernel(variant):
    if variant.startswith("multisub"):
        fuse = int(variant[-1])

        def _kernel(rays_ref, cols_ref, o_ref, best_ref):
            _kernel_body_multisub(rays_ref, cols_ref, o_ref, best_ref,
                                  fuse)
    elif variant == "multirow":

        def _kernel(rays_ref, cols_ref, o_ref, best_ref):
            _kernel_body_multirow(rays_ref, cols_ref, o_ref, best_ref)
    else:

        def _kernel(rays_ref, cols_ref, o_ref, best_ref):
            _kernel_body(rays_ref, cols_ref, o_ref, best_ref, variant)

    return _kernel


def _kernel_body_multisub(rays_ref, cols_ref, o_ref, best_ref, fuse):
    """Same pair volume, (fuse*SUB, 1) cluster columns per op: cols is
    pre-reshaped to (NCL/fuse, fuse*SUB, 8) and each visit tests fuse
    clusters in one broadcast chain - taller sublane operands."""
    SUBF = fuse * SUB
    ncl = NCL // fuse
    ox = rays_ref[0:RS, :]
    oy = rays_ref[RS : 2 * RS, :]
    oz = rays_ref[2 * RS : 3 * RS, :]
    dx = rays_ref[3 * RS : 4 * RS, :]
    dy = rays_ref[4 * RS : 5 * RS, :]
    dz = rays_ref[5 * RS : 6 * RS, :]
    sub_iota_i = lax.broadcasted_iota(jnp.int32, (SUBF, LANES), 0)
    best_ref[...] = jnp.zeros((RS, LANES), jnp.float32) + _INF

    def step(it, carry):
        for g in range(RS):
            for v in range(VISITS // fuse):
                c = (it * 7 + g * 3 + v) % ncl
                cols = cols_ref[c]
                cx = cols[:, 0:1]
                cy = cols[:, 1:2]
                cz = cols[:, 2:3]
                r2c = cols[:, 4:5]
                ocx = ox[g : g + 1, :] - cx
                ocy = oy[g : g + 1, :] - cy
                ocz = oz[g : g + 1, :] - cz
                b = (
                    ocx * dx[g : g + 1, :]
                    + ocy * dy[g : g + 1, :]
                    + ocz * dz[g : g + 1, :]
                )
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r2c
                tq = -b - jnp.sqrt(b * b - cc)
                idx_w = (c << 5) | sub_iota_i
                enc = jnp.where(
                    tq >= 0.0,
                    pltpu.bitcast(
                        (pltpu.bitcast(tq, jnp.int32) & _WIDEN) | idx_w,
                        jnp.float32,
                    ),
                    _INF,
                )
                enc_min = jnp.min(enc, axis=0, keepdims=True)
                best_ref[g : g + 1, :] = jnp.minimum(
                    enc_min, best_ref[g : g + 1, :]
                )
        return carry

    lax.fori_loop(0, STEPS, step, jnp.int32(0))
    o_ref[...] = best_ref[...]


def _kernel_body_multirow(rays_ref, cols_ref, o_ref, best_ref):
    """Same pair volume, native (RS, 128) ray-tile ops: every op advances
    ALL ray rows against ONE primitive, whose params arrive as
    lane-replicated (1, 128) rows (cols is pre-expanded to
    (NCL * SUB * 4, 128): cx/cy/cz/r2 per primitive) - the primitive
    loop replaces the sublane-axis broadcast. Mosaic rejects a dynamic
    (1, 1) -> (RS, 128) double broadcast, so the lane axis is
    materialized in the table; the sublane broadcast (1 -> RS) is the
    same one the real kernel's ray rows use."""
    ox = rays_ref[0:RS, :]
    oy = rays_ref[RS : 2 * RS, :]
    oz = rays_ref[2 * RS : 3 * RS, :]
    dx = rays_ref[3 * RS : 4 * RS, :]
    dy = rays_ref[4 * RS : 5 * RS, :]
    dz = rays_ref[5 * RS : 6 * RS, :]
    best_ref[...] = jnp.zeros((RS, LANES), jnp.float32) + _INF

    def step(it, carry):
        for v in range(VISITS):
            c = (it * 7 + v) % NCL
            for k in range(SUB):
                blk = cols_ref[pl.ds(c * SUB * 4 + k * 4, 4), :]
                cx = blk[0:1, :]
                cy = blk[1:2, :]
                cz = blk[2:3, :]
                r2c = blk[3:4, :]
                ocx = ox - cx
                ocy = oy - cy
                ocz = oz - cz
                b = ocx * dx + ocy * dy + ocz * dz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r2c
                tq = -b - jnp.sqrt(b * b - cc)
                idx = np.int32((0 << 5)) | jnp.int32((c << 5) | k)
                enc = jnp.where(
                    tq >= 0.0,
                    pltpu.bitcast(
                        (pltpu.bitcast(tq, jnp.int32) & _WIDEN) | idx,
                        jnp.float32,
                    ),
                    _INF,
                )
                best_ref[...] = jnp.minimum(enc, best_ref[...])
        return carry

    lax.fori_loop(0, STEPS, step, jnp.int32(0))
    o_ref[...] = best_ref[...]


def _kernel_body(rays_ref, cols_ref, o_ref, best_ref, variant):
    ox = rays_ref[0:RS, :]
    oy = rays_ref[RS : 2 * RS, :]
    oz = rays_ref[2 * RS : 3 * RS, :]
    dx = rays_ref[3 * RS : 4 * RS, :]
    dy = rays_ref[4 * RS : 5 * RS, :]
    dz = rays_ref[5 * RS : 6 * RS, :]
    sub_iota_i = lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    best_ref[...] = jnp.zeros((RS, LANES), jnp.float32) + _INF

    def step(it, carry):
        for g in range(RS):
            for v in range(VISITS):
                # dynamic, step-varying cluster index: defeats hoisting
                # the cols loads out of the loop, like the drain's
                # data-dependent visit order does in the real kernel
                c = (it * 7 + g * 3 + v) % NCL
                cols = cols_ref[c]
                cx = cols[:, 0:1]
                cy = cols[:, 1:2]
                cz = cols[:, 2:3]
                r2c = cols[:, 4:5]
                ocx = ox[g : g + 1, :] - cx
                ocy = oy[g : g + 1, :] - cy
                ocz = oz[g : g + 1, :] - cz
                b = (
                    ocx * dx[g : g + 1, :]
                    + ocy * dy[g : g + 1, :]
                    + ocz * dz[g : g + 1, :]
                )
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r2c
                if variant == "twophase":
                    # phase-1 only: hit-possible + sqrt-free front
                    # lower bound (-b); the exact t would be recomputed
                    # for the rare survivors in a second pass
                    disc = b * b - cc
                    enc = jnp.where(
                        (disc >= 0.0) & (b < 0.0), -b, _INF
                    )
                    enc_min = jnp.min(enc, axis=0, keepdims=True)
                    best_ref[g : g + 1, :] = jnp.minimum(
                        enc_min, best_ref[g : g + 1, :]
                    )
                    continue
                if variant == "nosqrt":
                    tq = -b - (b * b - cc) * np.float32(0.5)
                else:
                    tq = -b - jnp.sqrt(b * b - cc)
                if variant == "noenc":
                    enc = jnp.where(tq >= 0.0, tq, _INF)
                else:
                    idx_w = (c << 5) | sub_iota_i
                    enc = jnp.where(
                        tq >= 0.0,
                        pltpu.bitcast(
                            (pltpu.bitcast(tq, jnp.int32) & _WIDEN)
                            | idx_w,
                            jnp.float32,
                        ),
                        _INF,
                    )
                enc_min = jnp.min(enc, axis=0, keepdims=True)
                if variant == "nomin":
                    # store-only (no scratch load + min): quantifies the
                    # running-best round-trip Mosaic cannot register-
                    # allocate across scf iterations
                    best_ref[g : g + 1, :] = enc_min
                else:
                    best_ref[g : g + 1, :] = jnp.minimum(
                        enc_min, best_ref[g : g + 1, :]
                    )
        return carry

    lax.fori_loop(0, STEPS, step, jnp.int32(0))
    o_ref[...] = best_ref[...]


def measure(variant: str = "full") -> dict:
    rng = np.random.default_rng(7)
    rays = rng.normal(size=(6 * RS, LANES)).astype(np.float32)
    rays[:3] += 4.0  # origins away from the cluster cloud
    d = rays[3 * RS :].reshape(3, RS, LANES)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    cols = np.zeros((NCL, SUB, 8), np.float32)
    cols[..., :3] = rng.normal(size=(NCL, SUB, 3))
    cols[..., 4] = 0.25  # r^2
    if variant.startswith("multisub"):
        fuse = int(variant[-1])
        cols = cols.reshape(NCL // fuse, fuse * SUB, 8)
    elif variant == "multirow":
        # (NCL * SUB * 4, 128): cx/cy/cz/r2 rows, lane-replicated
        cols = np.repeat(
            cols[..., [0, 1, 2, 4]].reshape(NCL * SUB * 4, 1), LANES,
            axis=1,
        ).astype(np.float32)

    fn = pl.pallas_call(
        _make_kernel(variant),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec(
                rays.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                cols.shape,
                lambda i, _nd=cols.ndim: (0,) * _nd,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (RS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((GRID * RS, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RS, LANES), jnp.float32)],
    )
    r = jnp.asarray(rays)
    c = jnp.asarray(cols)

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = acc + jnp.sum(
                    jnp.where(jnp.isfinite(fn(r, c)), 1.0, 0.0)
                )
            int(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    int(jnp.sum(jnp.where(jnp.isfinite(fn(r, c)), 1.0, 0.0)))  # warm
    t1 = timed(1)
    t10 = timed(10)
    per_call = max((t10 - t1) / 9.0, 1e-9)
    # every variant covers the SAME pair volume per call (multisub fuses
    # clusters per op, multirow fuses rows per op; visit counts adjust)
    pairs = GRID * STEPS * RS * VISITS * SUB * LANES
    ops_per_pair = 25 if variant == "twophase" else OPS_PER_PAIR
    el_ops = pairs * ops_per_pair
    return {
        "variant": variant,
        "pairblock_tflops": round(el_ops / per_call / 1e12, 3),
        "pairs_gps": round(pairs / per_call / 1e9, 2),
        "wall_ms": round(per_call * 1000, 3),
        "t1_ms": round(t1 * 1000, 3),
        "pairs": pairs,
        "ops_per_pair": ops_per_pair,
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    import sys

    variants = [a for a in sys.argv[1:] if not a.startswith("-")]
    for v in variants or ["full"]:
        print(json.dumps(measure(v)), flush=True)
