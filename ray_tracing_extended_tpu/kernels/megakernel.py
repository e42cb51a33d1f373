"""Pallas TPU megakernel: the ENTIRE per-pixel path trace in one kernel.

The reference's fragment shader is a megakernel: seed RNG, generate jittered
camera rays, loop bounces with scatter/Russian-roulette, accumulate
(RayTracing.shader:356-389). This kernel is its TPU re-design: one grid
program traces a TILE of pixels start-to-finish with every intermediate in
VMEM/registers. Per-frame HBM traffic is just the 16 B/pixel output - the
pure-XLA path materializes ~10 KB/ray/bounce and pays per-bounce gather and
dispatch overheads that dominated the frame time (measured: 2.8 ms per
32k-ray bounce at XLA level vs ~0.1 ms here).

Layout rules (all lane-major, zero transposes):
  * per-ray state: (TILE/128, 128) f32/u32 component arrays (one ray per
    VPU lane);
  * intersection: sub-clusters of 32 Morton-ordered primitives; a pair block
    is (32 prims on sublanes) x (128 rays on lanes), built by broadcasting a
    (32, 1) parameter column (lane-dim slice of the packed (SUB, 8) cluster
    table - free) against a (1, 128) ray row (sublane slice - free);
  * per-sub-cluster AABB culls on the whole tile, gated with ``pl.when``
    over VMEM scratch accumulators so skipped clusters genuinely branch
    away (``lax.cond`` is predicated by Mosaic - both arms execute); this
    is the per-tile lift of the reference's per-chunk AABB gate
    (RayTracing.shader:279-281). Dead rays are parked at +1e9 pointing
    away with zeroed throughput, so they fail every cull and their env
    re-adds multiply zero - no explicit liveness mask exists (masked
    self-referential loop carries trip Mosaic layout inference);
  * material/geometry fetch: ONE one-hot MXU contraction per ray row -
    (FETCH_ROWS, n_slots) @ (n_slots, 128) - instead of 17 XLA gathers.

Scheduling is PERSISTENT-LANE with sample re-seeding: one flat loop over
"segment slots" (static bound spp * (max_bounce + 1), early-skipped via
``pl.when`` once every lane finished) in which a lane whose path died on
the previous slot immediately starts its NEXT camera sample instead of
idling until the rest of the tile finishes the bounce. This is the TPU
equivalent of persistent-threads wavefront compaction: measured live-lane
occupancy rises from ~rays_per_path/(max_bounce+1) (~32% on RTIOW) to the
per-tile max-lane ratio. Per-lane RNG draw order is IDENTICAL to the
reference's sequential sample loop (sample k's camera draws happen right
after sample k-1's last scatter draw on that lane), so outputs are
bit-compatible with the former unrolled scheme. All per-lane state lives
in VMEM scratch refs - scf loop carries of masked-updated vectors hit
Mosaic relayout bugs, refs sidestep them. Scene-feature flags (no-tris /
no-dielectric / no-checker / no-sun...) still compile out unreachable
shading code per scene.

Semantics: full Trace parity (checker / invisible-light flags, specular
lottery, cosine scatter, Russian roulette order and draw counts, env light,
the dielectric extension) with one documented deviation: Mosaic cannot cast
uint32->f32 directly, so RandomValue uses a two's-complement fixup that
differs from XLA's rounding by <= 1 ulp on ~8% of draws - statistically
irrelevant (golden tests compare against the XLA path within MC tolerance).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.geometry import (
    FLAG_CHECKER,
    FLAG_DIELECTRIC,
    FLAG_INVISIBLE_LIGHT,
    Scene,
)
from ..utils.config import RenderConfig
from .pack import FETCH_ROWS, SUB, SUPER

# Square screen tiles: each grid program owns a TS x TS pixel block, so the
# tile's ray frustum is spatially compact and the per-tile cluster culls
# actually skip geometry (a row-major pixel strip spans half the image and
# defeats culling). Tile size balances per-program overhead (measured
# ~12 us/program on this stack -> fewer, bigger programs) against culling
# selectivity and VMEM: measured on the RTIOW headline, 96 beats 64 by
# ~6% and both beat 32/128/160. Winner-mode (big-scene) renders keep 64 -
# their resident tables (~11 MB for 70k tris) leave no VMEM headroom for
# the larger tile's scratch. RTX_MEGA_TS overrides for perf experiments
# (tools/sweep_ts.py).
import os as _os

LANES = 128


ROWDRAIN_MIN_SUBS = 1024  # auto threshold, see rowdrain_cull()


def rowdrain_cull(override: bool | None = None) -> int | None:
    """Per-row 1-level sub-cluster drain for LARGE triangle scenes
    (n_tri_supers > 1, e.g. the 70k-tri BASELINE bunny): replaces the
    two-level super/sub tile gating - where every lane pays the whole
    TILE's visit union (measured 475 of 2188 subs/slot at TS=64,
    round 2) - with per-ROW need bitmask pops over ALL subs in global
    front-to-back rank order. Measured on real bunny segments
    (tools/mesh_stats.py): per-row sub unions are 163-291 vs the tile's
    955 (whole-frame lumped slot model), and the realizable drain cost
    (rows x max-over-rows popcount, idempotent re-tests on drained
    rows) is 2.8-3.4x fewer pair blocks under both bracketing t-bound
    models. A TWO-level drain (per-super inner pops) measured only
    1.5x - the per-super max-over-rows coupling eats the win - hence
    1-level.

    HARDWARE VERDICT (v5e, tools/mesh_ab.py --rowdrain + per-scene
    A/Bs, 2026-08-18): Mosaic output bit-identical to the tile-gated
    loops (equal_frac 1.0, same seg count). Wall clock depends on
    scene size - the drain pays a fixed mask-build over ALL sub ranks
    plus SMEM-serialized pops, which only amortizes when the tile
    union it replaces is big:
      70k-tri bunny (2188 subs): 0.736 -> 0.830 Mrays/s  (+13%, WINS)
      20k-tri mesh   (624 subs): 3.30  -> 3.04           (-8%)
      8k-tri mesh    (248 subs): 6.68  -> 4.74           (-29%)
      Chess 5.9k     (186 subs): 11.33 -> 8.72           (-23%)
      35k-tri mesh  (1092 subs): 0.75  -> 0.73           (wash)
    AUTO therefore enables it only at n_tri_subs >= ROWDRAIN_MIN_SUBS
    (1024 - validated as the crossover: a wash immediately above it,
    clear losses below, the +13% win at 2x above). ppl=2 on top
    measured 0.749 on the bunny (halved rows don't pay for doubled
    unions); keep ppl=1.
    Returns 0 = force off, 1 = force on, None = auto (size rule).
    ``override`` is cfg.mega_rowdrain (the production jit-cache-safe
    surface); RTX_MEGA_ROWDRAIN wins over both when set (dev A/B)."""
    env = _os.environ.get("RTX_MEGA_ROWDRAIN")
    if env is not None:
        if env not in ("0", "1"):
            raise ValueError(
                f"RTX_MEGA_ROWDRAIN must be 0 or 1, got {env!r}"
            )
        return int(env)
    if override is not None:
        return int(bool(override))
    return None


def n_phases(override: int | None = None) -> int:
    """Slot phases for the megakernel scheduler: 1 = mixed slots, 2 =
    coherence-split (fresh camera rays and scattered survivors trace in
    alternating slots - see slot_body; measured negative on the RTIOW
    headline, ROADMAP.md). RTX_MEGA_PHASES overrides; values outside
    {1, 2} are rejected rather than silently misbehaving (0 would make
    the slot bound zero -> black frames).

    NOTE (applies to RTX_MEGA_TS too): the knobs are resolved outside
    render_frame_mega's OWN jit, but the public render_frame /
    render_frame_with_stats wrappers are themselves jitted, so through
    those entry points a knob change after the first trace hits their
    cache. The perf tools and bench call render_frame_mega directly,
    where the resolution is always fresh."""
    env = _os.environ.get("RTX_MEGA_PHASES")
    if env:
        v = int(env)
        if v not in (1, 2):
            raise ValueError(
                f"RTX_MEGA_PHASES must be 1 or 2, got {env!r}"
            )
        return v
    if override is not None:
        if override not in (1, 2):
            raise ValueError(f"mega_phases must be 1 or 2, got {override}")
        return override
    return 1


def tile_size(
    packed,
    adaptive: bool = False,
    batched: bool = False,
    paired: bool = False,
    override: int | None = None,
) -> int:
    env = _os.environ.get("RTX_MEGA_TS")
    if env:
        ts = int(env)
        # the kernel reshapes each TS x TS tile to (TS*TS//128, 128) lane
        # rows; a non-multiple would floor-truncate ROWS and silently drop
        # up to 127 pixels per tile - reject at the knob instead of
        # producing a corrupted image (or a deep Mosaic error)
        if ts <= 0 or (ts * ts) % LANES != 0:
            raise ValueError(
                f"RTX_MEGA_TS must be a positive tile size with TS*TS a "
                f"multiple of {LANES} (e.g. 32/64/96/128), got {env!r}"
            )
        return ts
    if override is not None:
        # cfg.mega_tile_size: already validated by RenderConfig.validate,
        # but direct dataclass construction can bypass it - re-check
        if override <= 0 or (override * override) % LANES != 0:
            raise ValueError(
                f"mega_tile_size must have TS*TS a multiple of {LANES}, "
                f"got {override}"
            )
        return override
    if packed.fetch_mode != "onehot":
        return 64
    # measured on the RTIOW 1080p headline: single-frame fixed-spp
    # optimum is 96 (312 ms vs 318 @ 64, 322 @ 128); with adaptive
    # refill the optimum shifts to 128 (253 Mrays/s vs 245 @ 96), and
    # K-frame-batched parity prefers 128 with ppl=2 multiplexing
    # (230 vs 212 @ 96, round 3). With COST-PAIRED lanes the optimum
    # moves again to 192 x ppl=4 (263.6 Mrays/s at K=32 vs 243 @ 128x2;
    # 224 loses cull locality: 247) - pairing needs a deep per-lane
    # pixel queue and a big in-tile pool to equalise against.
    if paired and batched and not adaptive:
        return 192
    return 128 if (adaptive or batched) else 96


def pixels_per_lane(
    adaptive: bool = False,
    batched: bool = False,
    paired: bool = False,
    override: int | None = None,
) -> int:
    """Multi-pixel lanes: each kernel lane traces this many pixels in
    sequence, averaging the pixel-intrinsic work imbalance that bounds
    parity-mode occupancy. Pixels pair from vertically-separated tile
    halves by default, or by measured cost when the launch carries a
    ``pair_costs`` map (``paired``). RTX_MEGA_PPL overrides. Defaults
    (measured, RTIOW 1080p round 3): 4 for cost-paired batched renders
    (TS=192, 263.6 Mrays/s at K=32; ppl=8 drops to 244 - too few state
    rows); 2 for blind K-frame-batched exact-spp renders (parity 194 ->
    230 Mrays/s with K=16/TS=128); 1 for adaptive refill (~95% occupancy
    already; ppl=2 measured 255 vs 281) and for single-frame renders
    (switch + drain overhead cancels the gain at 16 samples/pixel)."""
    env = _os.environ.get("RTX_MEGA_PPL")
    if env:
        v = int(env)
        if v not in (1, 2, 4, 8):
            raise ValueError(
                f"RTX_MEGA_PPL must be 1, 2, 4 or 8, got {env!r}"
            )
        return v
    if override is not None:
        if override not in (1, 2, 4, 8):
            raise ValueError(
                f"mega_pixels_per_lane must be 1, 2, 4 or 8, got {override}"
            )
        return override
    if paired and batched and not adaptive:
        return 4
    return 2 if (batched and not adaptive) else 1


def perlane_cull() -> int:
    """Per-row-uniform sub-cluster pops ("per-lane cull"): each 128-lane
    row walks only the sub-clusters its own lanes need instead of the
    union of the whole tile's needs (see ``perlane_drain`` in the
    kernel). 0 = off, 1 = frozen need masks, 2 = masks re-tightened
    once after the first pop round. RTX_MEGA_PERLANE overrides; only
    engaged where eligible (flat cluster list, 2..31 subs, culls on).
    MEASURED NEGATIVE on TPU v5e (round 4, tools/perlane_ab.py): despite
    cutting pair-test blocks 1.30-1.37x (interpret collect_stats) the
    drain LOSES wall-clock everywhere - RTIOW 1080p batched parity K=32
    285.4 -> 276.8 (mode 1) -> 256.2 (mode 2); unpaired parity 255.6 ->
    252.4 -> 234.1; adaptive shows the same ordering; a TS sweep under
    mode 2 does not recover (TS=192 256.3). The scalar-core pops do NOT
    overlap with the VPU as designed - each dynamic-bound drain iteration
    serialises the row's slab/pair work behind an SMEM-carried scalar
    dependency, costing more than the skipped visits save. Mode 2's mask
    rebuild also raises scoped-VMEM pressure (Cornell K=16 fails to
    compile under it). Default stays 0; the mechanism is kept for
    measurement reproducibility, not production."""
    env = _os.environ.get("RTX_MEGA_PERLANE")
    if env is None:
        return 0
    if env not in ("0", "1", "2"):
        raise ValueError(
            f"RTX_MEGA_PERLANE must be 0, 1 or 2, got {env!r}"
        )
    return int(env)


# NEGATIVE RESULT (round 2, measured on the RTIOW 1080p headline): gating
# row GROUPS inside a visited sub-cluster on jnp.any(mask[g0:g1]) loses at
# every granularity - 9 rows: 399 ms, 12: 374, 18: 331, 24: 322 vs 312 ms
# ungated - because with persistent-lane re-seeding every row mixes fresh
# coherent rays with old divergent ones, so groups are almost always hot
# and the scf.if + any-reduce is pure overhead. Same conclusion as the
# earlier single-row experiment (~90 ns/scf.if). Cull at sub/super
# granularity only; keep visited-sub row loops flat.

_INF = np.float32(np.inf)
# closest-hit encode masks: low log2(SUB) mantissa bits of t carry the
# within-cluster sub index (see the intersect docstring)
_SUBM = np.int32(SUB - 1)
_SUBMN = np.int32(~(SUB - 1))
# De Bruijn ctz multiplier: for a 32-bit power of two L, (L * _DEBRUIJN)
# >> 27 (logical) indexes a 32-entry table mapping to log2(L) - the
# scalar-core bit pop of the per-lane cull drain loop. The launcher
# composes the table with the f2b rank permutation so one SMEM load maps
# an isolated bit straight to its cluster index (see _debruijn_ranks).
_DEBRUIJN = np.int32(0x077CB531)
_DET_EPS = np.float32(1e-6)
_U = lambda x: jnp.uint32(x)
# fparams index of the first per-frame accumulate weight (K-frame batch):
# fp[_W0 + k] = 1 / (frame0 + k + 1), computed in XLA by the launcher
_W0 = 36

# ------------------------- in-kernel RNG (PCG) ------------------------------


def _pcg(state):
    """RayTracing.shader:193-199 on uint32 arrays."""
    state = state * _U(747796405) + _U(2891336453)
    shift = (state >> _U(28)) + _U(4)
    r = ((state >> shift) ^ state) * _U(277803737)
    return state, (r >> _U(22)) ^ r


def _u32_to_f32(v):
    s = pltpu.bitcast(v, jnp.int32)
    f = s.astype(jnp.float32)
    return jnp.where(s < 0, f + np.float32(4294967296.0), f)


def _rand(state):
    state, bits = _pcg(state)
    return state, _u32_to_f32(bits) * np.float32(1.0 / 4294967295.0)


def _rand_normal(state):
    state, r1 = _rand(state)
    state, r2 = _rand(state)
    theta = np.float32(2.0 * 3.1415926) * r1
    rho = jnp.sqrt(np.float32(-2.0) * jnp.log(r2))
    return state, rho * jnp.cos(theta)


def _rand_unit3(state):
    state, x = _rand_normal(state)
    state, y = _rand_normal(state)
    state, z = _rand_normal(state)
    inv = lax.rsqrt(x * x + y * y + z * z)
    return state, x * inv, y * inv, z * inv


def _rand_unit3_fast(state):
    """Uniform unit vector via (z, phi) area-preserving mapping: 2 draws
    and 3 transcendentals vs the reference's three Box-Muller Gaussians
    (6 draws, ~9). Identical distribution (cfg.fast_scatter doc)."""
    state, u = _rand(state)
    state, v = _rand(state)
    z = u * 2.0 - 1.0
    phi = v * np.float32(2.0 * 3.14159265)
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return state, s * jnp.cos(phi), s * jnp.sin(phi), z


def _rand_circle(state):
    state, r1 = _rand(state)
    ang = r1 * np.float32(2.0 * 3.1415)
    state, r2 = _rand(state)
    rad = jnp.sqrt(r2)
    return state, jnp.cos(ang) * rad, jnp.sin(ang) * rad


def _norm3(x, y, z):
    inv = lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


# --------------------------------- kernel -----------------------------------


def _render_kernel(
    ip_ref,  # SMEM int32 (3,): [frame, n_pix(unused), y0 band offset]
    sperm_ref,  # SMEM int32: front-to-back sphere sub-cluster order
    sperm_sup_ref,  # SMEM int32: front-to-back sphere super-cluster order
    tperm_ref,  # SMEM int32: front-to-back tri sub-cluster order
    tperm_sup_ref,  # SMEM int32: front-to-back tri super-cluster order
    # SMEM f32 (36,): camera + environment params. Index layout (must match
    # the fparams concatenation in render_frame_mega):
    #   0-2  cam position      3-11 cam rotation (row-major 3x3)
    #   12   plane_w   13 plane_h   14 focus_dist
    #   15   defocus_w 16 diverge_w 17 env_on
    #   18-20 ground colour  21-23 horizon colour  24-26 zenith colour
    #   27   sun_focus 28 sun_intensity  29-31 sun_dir  32-35 pad
    #   36.. per-frame accumulate weights 1/(frame0+k+1) (K-frame batch)
    fp_ref,
    # SMEM f32 (max(1, n_hoist)*8,): hoisted oversized spheres (pack.py
    # _hoist_candidates), 8 floats each: cx cy cz r^2 sub_base sub_idx p p
    hp_ref,
    sph_bounds_ref,  # (NSs_pad, 8) sub-cluster AABBs
    sph_super_ref,  # (NSs_pad/32, 8) super-cluster AABBs
    sph_cols_ref,  # (NSs_pad, SUB, 8): cx, cy, cz, r, r2, pad3
    tri_bounds_ref,  # (NSt_pad, 8)
    tri_super_ref,  # (NSt_pad/32, 8)
    tri_cols_ref,  # (NSt_pad, SUB, 16): pa3, eab3, eac3, n3
    fetch2_ref,  # (n_slots/128 * n_fetch_rows, 128) two-level fetch operand
    sph_attr_ref,  # (NSs_pad, SUB, nwf): winner-fetch attr rows (spheres)
    tri_attr_ref,  # (NSt_pad, SUB, nwf): winner-fetch attr rows (tris)
    pperm_ref,  # (ROWS, 128) i32 lane->local-pixel permutation (cost-guided
    # lane pairing, use_pperm; token (1, 128) otherwise). Row p*RS+g, lane
    # l holds the tile-local pixel index traced by lane (g, l) at phase p.
    acc_r_ref,  # (ROWS, 128) accum-in blocks (token (1, 128) zeros unless
    acc_g_ref,  # with_accum: see render_frames_mega - the K-frame batched
    acc_b_ref,  # launch folds completed frames into the running average)
    out_r_ref,  # (ROWS, 128) f32
    out_g_ref,
    out_b_ref,
    out_segs_ref,  # (ROWS, 128) int32
    out_hist_ref,  # (HR, 128) int32: per-bounce live counts (collect_stats)
    best_enc_ref,  # VMEM scratch (ROWS, 128) i32: (t bits & ~31) | sub idx
    best_clu_ref,  # VMEM scratch (ROWS, 128) f32: winning cluster slot base
    # persistent-lane state in VMEM scratch: every lane runs its own
    # sample/bounce state machine; the scheduler loop re-seeds dead lanes
    # with their next camera sample (see module docstring)
    s_st_ref,  # uint32 RNG state
    s_ox_ref, s_oy_ref, s_oz_ref,
    s_dx_ref, s_dy_ref, s_dz_ref,
    s_ir_ref, s_ig_ref, s_ib_ref,  # current sample's incoming light
    s_cr_ref, s_cg_ref, s_cb_ref,  # throughput (0 = lane dead)
    s_segs_ref,  # int32 live-segment counter (Mrays/s numerator)
    s_tr_ref, s_tg_ref, s_tb_ref,  # banked totals over completed samples
    s_ns_ref,  # int32 completed-sample count (current pixel, all frames)
    s_bc_ref,  # int32 bounce index of the current sample
    s_fk_ref,  # int32 current frame index within the batch (0..n_frames-1)
    s_ph_ref,  # int32 current pixel phase (0..ppl-1, multi-pixel lanes)
    oh_ref,  # (128, GB*128) f32: batched within-cluster one-hot operand
    bfet_ref,  # (n_fc*nf, GB*128) f32: batched fetch dot result
    ohw_ref,  # (SUB, ROWS*128) f32: winner-fetch one-hot (winner mode)
    wacc1_ref,  # (16, ROWS*128) f32: winner geometry accumulator
    wacc2_ref,  # (nwf, ROWS*128) f32: winner attr accumulator
    sbits_ref,  # SMEM i32: per-row need bitmasks - (RS,) for the perlane
    # drain, (RS * n_tri_supers,) flattened g*W+w words for the rowdrain
    spop_ref,  # SMEM i32: perlane mode-2 popped bits (RS,), or rowdrain
    # per-row summary words (RS * ceil(W/32),) - which words are nonzero
    cnt_ref,  # VMEM (RS, 128) f32 scratch: rowdrain per-row need counts
    # (column 0); token (1, 128) when rowdrain is off
    *,
    spp: int,
    gb: int,
    fetch_fields: tuple,
    attr_fields: tuple,
    fetch_mode: str,
    nf: int,
    max_bounce: int,
    width: int,
    height: int,
    ts: int,
    nss: int,
    nss_visit: int,
    n_hoist: int,
    nst: int,
    n_sph_supers: int,
    n_tri_supers: int,
    n_slots: int,
    features: tuple = (),
    hist_rows: int = 8,
    n_frames: int = 1,
    with_accum: bool = False,
    clamp_accum: bool = True,
    ppl: int = 1,
    use_pperm: bool = False,
    adaptive: bool = False,
    fast_scatter: bool = False,
    phases: int = 1,
    collect_stats: bool = False,
    use_cull: bool = True,
    stub_fetch: bool = False,
    stub_intersect: bool = False,
    dup_intersect: bool = False,
    dup_fetch: bool = False,
    perlane: int = 0,
    rowdrain: bool = False,
):
    pid = pl.program_id(0)
    TS = ts  # shadow: tile size is per-launch (see tile_size())
    ROWS = (ts * ts) // LANES
    # Multi-pixel lanes (ppl > 1): each lane traces ``ppl`` pixels IN
    # SEQUENCE (all of pixel A's batched frames, then pixel B's...), so
    # the per-lane state shrinks to RS = ROWS/ppl rows while the output
    # blocks keep all ROWS pixel rows - a lane's phase-p pixel is output
    # row (p * RS + g). Pairing a lane's pixels from DIFFERENT tile
    # halves averages pixel-intrinsic work imbalance (a sky lane and a
    # sphere lane have persistently different path lengths), which is
    # the parity-mode occupancy bound that K-frame batching cannot fix
    # (measured: 56% -> 64% plateau, round 3).
    RS = ROWS // ppl
    # Cull diagnostics ride the spare hist rows when stats are on and the
    # bounce histogram leaves at least 3 free: row hist_rows-1 counts
    # sphere sub-cluster visits (post-cull), -2 tri sub visits, -3 slot
    # iterations. Each count is +1 across a 128-lane row; consumers
    # normalise by 128 * n_tiles (tools/cull_stats.py).
    count_visits = collect_stats and hist_rows >= max_bounce + 4
    sub_i = lax.broadcasted_iota(jnp.int32, (RS, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (RS, LANES), 1)
    # Layout-anchored zeros: splat-constant loop-carry inits trigger a
    # Mosaic relayout bug ({0,0} -> {*,*} on scf yields); deriving them
    # from an iota pins a concrete layout.
    zero_i = lane * 0
    zero_f = lane.astype(jnp.float32) * 0.0

    def park_blend(keep_f, park_f, ox, oy, oz, dx, dy, dz):
        """Canonical park sentinel, one definition: lanes with park_f=1
        move to origin +1e9 heading (1, 0, 1e-9) - they miss all
        geometry and fail every cull; keep_f=1 lanes pass through.
        (keep_f + park_f need not cover all lanes: both-zero lanes are
        zeroed, used by segment_body's died-lane parking.)"""
        return (
            ox * keep_f + np.float32(1.0e9) * park_f,
            oy * keep_f + np.float32(1.0e9) * park_f,
            oz * keep_f + np.float32(1.0e9) * park_f,
            dx * keep_f + park_f,
            dy * keep_f,
            dz * keep_f + np.float32(1e-9) * park_f,
        )
    # camera params (fp layout documented in _run)
    cam0, cam1, cam2 = fp_ref[0], fp_ref[1], fp_ref[2]
    r00, r01, r02 = fp_ref[3], fp_ref[4], fp_ref[5]
    r10, r11, r12 = fp_ref[6], fp_ref[7], fp_ref[8]
    r20, r21, r22 = fp_ref[9], fp_ref[10], fp_ref[11]
    plane_w, plane_h, focus = fp_ref[12], fp_ref[13], fp_ref[14]
    defocus_w, diverge_w = fp_ref[15], fp_ref[16]
    env_on = fp_ref[17]
    gr0, gr1, gr2 = fp_ref[18], fp_ref[19], fp_ref[20]
    hz0, hz1, hz2 = fp_ref[21], fp_ref[22], fp_ref[23]
    zn0, zn1, zn2 = fp_ref[24], fp_ref[25], fp_ref[26]
    sun_focus, sun_int = fp_ref[27], fp_ref[28]
    sd0, sd1, sd2 = fp_ref[29], fp_ref[30], fp_ref[31]

    # Square-tile pixel mapping: pid -> (tile_x, tile_y); lane order is
    # row-major inside the TS x TS tile. Edge tiles clamp to the image and
    # re-render border pixels (cropped by the launcher). With ppl > 1 a
    # lane's phase-p pixel comes from output row (p * RS + sub_i) - tile
    # halves vertically apart, so paired pixels are anti-correlated in
    # intrinsic cost (sky rows pair with geometry rows).
    n_tx = -(-width // TS)
    t_x = pid % n_tx
    t_y = pid // n_tx
    pixs, fpxs, fpys, fpzs = [], [], [], []
    for p in range(ppl):
        if use_pperm:
            # cost-guided lane pairing: each lane's phase-p pixel comes
            # from the launcher-built permutation (heavy pixels pair with
            # light ones, equalising per-lane quota so the tile's slot
            # loop drains evenly - parity occupancy 73.6% -> ~80%
            # measured in tools/pairing_sim.py). The pixel SET per tile
            # is unchanged, so cluster-cull locality is untouched; the
            # launcher un-permutes the outputs.
            local = pperm_ref[p * RS : (p + 1) * RS, :]
        else:
            local = (sub_i + p * RS) * LANES + lane
        x = jnp.minimum(t_x * TS + local % TS, width - 1)
        # ip_ref[2] is the y offset of this device's horizontal band (0
        # on a single chip): tile rows are band-local, seeds stay global.
        y = jnp.minimum(ip_ref[2] + t_y * TS + local // TS, height - 1)
        pixs.append(y * width + x)
        u = (x.astype(jnp.float32) + 0.5) * np.float32(1.0 / width)
        v = (y.astype(jnp.float32) + 0.5) * np.float32(1.0 / height)
        lx = (u - 0.5) * plane_w
        ly = (v - 0.5) * plane_h
        # focus point = cam + R @ (lx, ly, focus)  (RayTracing.shader:365)
        fpxs.append(cam0 + r00 * lx + r01 * ly + r02 * focus)
        fpys.append(cam1 + r10 * lx + r11 * ly + r12 * focus)
        fpzs.append(cam2 + r20 * lx + r21 * ly + r22 * focus)
    pix = pixs[0]

    frame = ip_ref[0]
    # int32 multiply/add wrap identically to uint32; one array bitcast at
    # the end (RayTracing.shader:358-362 seed layout).
    seed = pltpu.bitcast(pix + frame * 719393, jnp.uint32)

    # two-level fetch one-hot bases: within-slot-cluster (128 wide) and
    # across slot-clusters (n_slots/128 wide)
    s128_iota = lax.broadcasted_iota(
        jnp.int32, (128, LANES), 0
    ).astype(jnp.float32)
    n_fc = n_slots // 128
    fc_iota = lax.broadcasted_iota(
        jnp.int32, (n_fc, LANES), 0
    ).astype(jnp.float32)

    def environment(dx, dy, dz):
        """GetEnvironmentLight (RayTracing.shader:238-251). Scene-feature
        flags compile out the whole term (env off) or the sun pow."""
        if "env" not in features:
            return zero_f, zero_f, zero_f
        t = jnp.clip(dy * np.float32(1.0 / 0.4), 0.0, 1.0)
        sky_t = jnp.power(t * t * (3.0 - 2.0 * t), np.float32(0.35))
        tg = jnp.clip((dy + 0.01) * np.float32(100.0), 0.0, 1.0)
        ground_t = tg * tg * (3.0 - 2.0 * tg)
        if "sun" in features:
            sun = (
                jnp.power(
                    jnp.maximum(dx * sd0 + dy * sd1 + dz * sd2, 0.0),
                    sun_focus,
                )
                * sun_int
            ) * (ground_t >= 1.0).astype(jnp.float32)
        else:
            sun = zero_f
        er = gr0 + (hz0 + (zn0 - hz0) * sky_t - gr0) * ground_t + sun
        eg = gr1 + (hz1 + (zn1 - hz1) * sky_t - gr1) * ground_t + sun
        eb = gr2 + (hz2 + (zn2 - hz2) * sky_t - gr2) * ground_t + sun
        return er, eg, eb

    def intersect(ox, oy, oz, dx, dy, dz):
        """Cluster-culled closest hit -> (t_approx, code) each (ROWS, 128).

        The running best lives in VMEM scratch refs and clusters are gated
        with ``pl.when``: unlike ``lax.cond`` (which Mosaic predicates -
        both arms execute), a side-effecting scf.if genuinely branches, so
        a skipped cluster costs only its 6-scalar slab test.

        The fold key is a single bit-ENCODING of (t, sub index): IEEE
        bits of a non-negative f32 are monotone in its value, so
        ``(bits(t) & ~31) | sub`` min-reduces t and argmin in ONE
        reduction instead of a min + an argmin + a two-field fold (the
        encoded value is bitcast back to f32 and min-folded as f32 -
        same ordering for these never-NaN patterns, and i32 reductions
        trip Mosaic relayout bugs). The low
        5 mantissa bits of t are sacrificed to the index: a TWO-SIDED
        perturbation of < 32 ulp (when sub < bits(t) & 31 the encode sits
        BELOW the true t, so the t-bounded slab cull can be up to ~31 ulp
        too tight and near-tie winners can differ from the XLA path at
        ulp scale - within every parity tolerance); segment_body
        re-derives the exact t of the winning primitive from its fetched
        parameters.
        Misses encode as +inf, so ``isfinite`` is the hit test.

        (Negative results, measured round 2: an expansion-form sphere
        quadratic - b = o.d - c.d, cc = o.o - 2 o.c + packed c.c - r^2,
        hoisting o.d/o.o out of the cluster loop - was ~1% SLOWER than
        this direct oc form despite fewer nominal ops, and numerically
        worse near grazes. Isolating oversized spheres into their own
        sub-cluster lost ~15%: see pack.py note.)
        """
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        # the encode keeps the FOLD itself in f32 (i32 (1,128) reductions
        # trip Mosaic relayout bugs): for non-NaN, non-negative-t bit
        # patterns, f32 ordering == i32 ordering, and the miss sentinel is
        # simply +inf (bits 0x7f800000)
        best_enc_ref[...] = zero_f + _INF
        best_clu_ref[...] = zero_f
        sub_iota_i = lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
        # Wide encode (small scenes): the CLUSTER index rides bits 5-10 of
        # the t encode - (bits(t) & ~2047) | (cluster << 5) | sub - so the
        # fold needs no separate best-cluster array: per block it is ONE
        # f32 min instead of min + compare + masked cluster write. Costs
        # 11 mantissa bits of t in the fold key (<= 2^-12 relative,
        # conservative for the slab culls; exact t is re-derived from the
        # winner's fetched parameters as before). Only for the one-hot
        # fetch path: winner mode reads best_clu_ref.
        wide = (nss + nst) <= 64 and fetch_mode == "onehot"
        _WIDEN = np.int32(~2047)

        # Hoisted oversized spheres (the RTIOW ground): one full-tile
        # elementwise quadratic per sphere from SMEM params - their
        # sub-cluster AABB could never cull (it contains the scene), so
        # clustered testing paid a whole 32-slot visit every slot. Runs
        # FIRST: a ground hit tightens best_t before any slab test, which
        # is exactly the front-to-back ideal (distance 0). Parked lanes
        # (origin +1e9 heading +x) get b > 0 -> tq < 0 -> miss.
        for k in range(n_hoist):
            hx, hy, hz = (
                hp_ref[k * 8 + 0], hp_ref[k * 8 + 1], hp_ref[k * 8 + 2]
            )
            hr2 = hp_ref[k * 8 + 3]
            base_f = hp_ref[k * 8 + 4]
            sub_k = hp_ref[k * 8 + 5].astype(jnp.int32)
            hocx, hocy, hocz = ox - hx, oy - hy, oz - hz
            hb = hocx * dx + hocy * dy + hocz * dz
            hcc = hocx * hocx + hocy * hocy + hocz * hocz - hr2
            # sqrt(neg) = NaN and NaN >= 0 is False (see sphere_cluster)
            htq = -hb - jnp.sqrt(hb * hb - hcc)
            if wide:
                cidx = (
                    hp_ref[k * 8 + 4] * np.float32(1.0 / SUB)
                ).astype(jnp.int32)
                enc = jnp.where(
                    htq >= 0.0,
                    pltpu.bitcast(
                        (pltpu.bitcast(htq, jnp.int32) & _WIDEN)
                        | (cidx << 5)
                        | sub_k,
                        jnp.float32,
                    ),
                    _INF,
                )
                best_enc_ref[...] = jnp.minimum(enc, best_enc_ref[...])
                continue
            enc = jnp.where(
                htq >= 0.0,
                pltpu.bitcast(
                    (pltpu.bitcast(htq, jnp.int32) & _SUBMN)
                    | sub_k,
                    jnp.float32,
                ),
                _INF,
            )
            old = best_enc_ref[...]
            better = enc < old
            best_enc_ref[...] = jnp.minimum(enc, old)
            oldc = best_clu_ref[...]
            best_clu_ref[...] = jnp.where(
                better, oldc * 0.0 + base_f, oldc
            )

        def tile_hits(bounds_ref, c):
            """Per-lane cluster-AABB mask (ROWS, 128): the t-bounded slab
            test (RayTracing.shader:177-187 lifted per-tile). Parked lanes
            (origin +1e9 heading +x) fail it, so finished rows drop out of
            the per-row gates automatically as the tile's tail drains."""
            best_t = best_enc_ref[...]
            t0x = (bounds_ref[c, 0] - ox) * inv_dx
            t1x = (bounds_ref[c, 3] - ox) * inv_dx
            t0y = (bounds_ref[c, 1] - oy) * inv_dy
            t1y = (bounds_ref[c, 4] - oy) * inv_dy
            t0z = (bounds_ref[c, 2] - oz) * inv_dz
            t1z = (bounds_ref[c, 5] - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            return (tf >= 0.0) & (tn <= jnp.minimum(tf, best_t))

        def fold_pair(g, valid, tq, clu_f, idx_w):
            """Fold a cluster's (SUB, 128) candidate block into row g's
            running best: a single f32 min on the bit-encode
            (bits(t) & ~31) | sub - ordering-equivalent to the i32 min
            for these never-NaN patterns - replaces a min + an argmin +
            a two-field fold (measured ~5% of the frame). In wide mode
            ``idx_w`` is the per-cluster (SUB, 128) index field
            (cluster << 5) | sub, hoisted out of the row loop so the
            encode is one AND + one OR per block; otherwise the winning
            cluster's slot base (broadcast scalar ``clu_f``) rides along
            under a strict-< mask."""
            if wide:
                enc = jnp.where(
                    valid,
                    pltpu.bitcast(
                        (pltpu.bitcast(tq, jnp.int32) & _WIDEN) | idx_w,
                        jnp.float32,
                    ),
                    _INF,
                )
                enc_min = jnp.min(enc, axis=0, keepdims=True)
                best_enc_ref[g : g + 1, :] = jnp.minimum(
                    enc_min, best_enc_ref[g : g + 1, :]
                )
                return
            enc = jnp.where(
                valid,
                pltpu.bitcast(
                    (pltpu.bitcast(tq, jnp.int32) & _SUBMN)
                    | sub_iota_i,
                    jnp.float32,
                ),
                _INF,
            )
            enc_min = jnp.min(enc, axis=0, keepdims=True)
            old = best_enc_ref[g : g + 1, :]
            better = enc_min < old
            best_enc_ref[g : g + 1, :] = jnp.minimum(enc_min, old)
            # NOTE: broadcast clu_f off a ref-loaded row - slicing a
            # splat-layout value (zero_f[g:g+1]) hits a Mosaic
            # vector_extract bug on replicated vregs
            old_clu = best_clu_ref[g : g + 1, :]
            best_clu_ref[g : g + 1, :] = jnp.where(
                better, old_clu * 0.0 + clu_f, old_clu
            )

        def visit_rows(row_visit, mask):
            # flat row loop - see the NEGATIVE RESULT note at module top
            # on why intra-visit row(-group) gating loses
            del mask
            for g in range(RS):
                row_visit(g)

        # The per-row intersection math is SHARED between the per-tile
        # visit loops and the per-lane drains (one definition keeps the
        # two gating schemes in numeric lockstep). Callers pre-slice the
        # cluster columns once per cluster resolution.

        def sphere_cols_slices(cols):
            # dead slots pack r2 = -1e30 (pack.py col 4), making
            # disc < 0 unconditionally - no r > 0 test needed
            return cols[:, 0:1], cols[:, 1:2], cols[:, 2:3], cols[:, 4:5]

        def sphere_row_test(g, cs, clu_f, idx_w):
            cx, cy, cz, r2c = cs
            ocx = ox[g : g + 1, :] - cx  # (SUB, 128)
            ocy = oy[g : g + 1, :] - cy
            ocz = oz[g : g + 1, :] - cz
            b = (
                ocx * dx[g : g + 1, :]
                + ocy * dy[g : g + 1, :]
                + ocz * dz[g : g + 1, :]
            )
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r2c
            # no-root (disc < 0) flows through as sqrt(neg) = NaN,
            # and NaN >= 0 is False - one compare covers both the
            # discriminant and the behind-ray test (saves the
            # max(), the second compare and the AND per block)
            tq = -b - jnp.sqrt(b * b - cc)
            fold_pair(g, tq >= 0.0, tq, clu_f, idx_w)

        def tri_cols_slices(cols):
            return tuple(cols[:, i : i + 1] for i in range(12))

        def tri_row_test(g, cs, clu_f, idx_w):
            (pax, pay, paz, ex1, ey1, ez1, ex2, ey2, ez2, nx, ny, nz) = cs
            gdx = dx[g : g + 1, :]
            gdy = dy[g : g + 1, :]
            gdz = dz[g : g + 1, :]
            aox = ox[g : g + 1, :] - pax
            aoy = oy[g : g + 1, :] - pay
            aoz = oz[g : g + 1, :] - paz
            daox = aoy * gdz - aoz * gdy
            daoy = aoz * gdx - aox * gdz
            daoz = aox * gdy - aoy * gdx
            det = -(gdx * nx + gdy * ny + gdz * nz)
            t_det = aox * nx + aoy * ny + aoz * nz
            u_det = ex2 * daox + ey2 * daoy + ez2 * daoz
            v_det = -(ex1 * daox + ey1 * daoy + ez1 * daoz)
            w_det = det - u_det - v_det
            # all four barycentric/t signs collapse into one min
            # (t/u/v/w >= 0 each) - 3 mins + 1 compare instead of
            # 4 compares + 3 ands
            min4 = jnp.minimum(
                jnp.minimum(t_det, u_det), jnp.minimum(v_det, w_det)
            )
            hit = (det >= _DET_EPS) & (min4 >= 0.0)
            # unguarded divide: det ~ 0 lanes produce inf/NaN in tq,
            # but ``hit`` is false there and fold_pair's where()
            # discards the encode - saves the select
            tq = t_det / det
            fold_pair(g, hit, tq, clu_f, idx_w)

        def sphere_cluster(ci, carry):
            # Front-to-back: visit clusters nearest the camera first so
            # best_t tightens early and the t-bounded slab test culls the
            # far clusters (the reference scans chunks in storage order,
            # RayTracing.shader:276-294; ordering is a pure perf refinement
            # with identical closest-hit semantics).
            c = sperm_ref[ci]
            mask = tile_hits(sph_bounds_ref, c) if use_cull else None

            def visit():
                if count_visits:
                    r = hist_rows - 1
                    out_hist_ref[r : r + 1, :] = (
                        out_hist_ref[r : r + 1, :] + 1
                    )
                cs = sphere_cols_slices(sph_cols_ref[c])  # (SUB, 8)
                clu_f = (c * SUB).astype(jnp.float32)
                idx_w = ((c << 5) | sub_iota_i) if wide else None
                visit_rows(
                    lambda g: sphere_row_test(g, cs, clu_f, idx_w), mask
                )

            if use_cull:
                pl.when(jnp.any(mask))(visit)
            else:
                visit()
            return carry

        # ---- per-lane cull (per-row-uniform pops, round 3) ----
        # The per-tile gate above makes every row pay the UNION of the
        # whole tile's needed sub-clusters (measured 9.0 visits/slot on
        # RTIOW 1080p, tools/perlane_sim.py replaying real segments with
        # these exact slab semantics). Here each 128-lane row instead
        # walks only the clusters its own lanes need: per slot, the same
        # t-bounded slab tests build a per-row need bitmask in
        # front-to-back RANK space ((RS, 1) lane-reduces), the masks
        # move to SMEM scalars, and a dynamic-bound drain loop pops each
        # row's lowest set rank on the SCALAR core - a De Bruijn ctz
        # whose table the launcher pre-composed with the f2b
        # permutation, so one SMEM load maps the isolated bit straight
        # to a cluster index for the dynamic cols load. Expected
        # iterations = max over rows of |union of the row's needs|
        # (E 7.3 vs 9.0 simulated). Two deliberate properties:
        #   - drained rows (bits == 0) pop bit pattern 0, whose ctz
        #     index aliases rank 0: they harmlessly re-test the NEAREST
        #     cluster - the encoded min-fold is idempotent - so there is
        #     no per-row branch anywhere (a pl.when row gate costs
        #     ~90 ns per skip, the NEGATIVE RESULT above).
        #   - need masks are FROZEN at slot start (post-hoist best_t) in
        #     mode 1: a row may visit a cluster the shrinking best_t
        #     would have culled; frozen-mask visits are a superset, and
        #     supersets cannot change the fold winner beyond the
        #     encode's documented ulp-scale two-sidedness. Mode 2
        #     (RTX_MEGA_PERLANE=2) REBUILDS the masks once after the
        #     first pop round - by then every row has folded its nearest
        #     cluster, so the t-bounded slab re-test drops most of the
        #     frozen-mask excess (simulated 7.27 -> ~6 iterations; the
        #     rebuild costs ~0.25 visit-equivalents of slab tests).
        def perlane_drain(bounds_ref_, perm_ref_, k_, visit_row, hist_r):
            # ranks accumulate as f32 sums of 2^r, exact only below 2^24
            # - ranks >= LO_BITS ride a second accumulator combined at
            # the SMEM extract (flat cluster lists go up to 32 subs; the
            # i32 sign bit caps eligibility at 31)
            LO_BITS = 24

            def build_bits():
                ba, bh, ca = None, None, None
                for r in range(k_):
                    m = tile_hits(bounds_ref_, perm_ref_[r])
                    anyr = jnp.max(
                        m.astype(jnp.float32), axis=1, keepdims=True
                    )  # (RS, 1)
                    if r < LO_BITS:
                        w = np.float32(2.0 ** r)
                        ba = anyr * w if ba is None else ba + anyr * w
                    else:
                        w = np.float32(2.0 ** (r - LO_BITS))
                        bh = anyr * w if bh is None else bh + anyr * w
                    ca = anyr if ca is None else ca + anyr
                return ba, bh, ca

            def extract_bits(ba, bh, g):
                b = jnp.sum(ba[g : g + 1, :]).astype(jnp.int32)
                if bh is not None:
                    b = b | (
                        jnp.sum(bh[g : g + 1, :]).astype(jnp.int32)
                        << LO_BITS
                    )
                return b

            def pop_visit(g, record):
                b = sbits_ref[g]
                low = b & (0 - b)
                sbits_ref[g] = b - low
                if record:
                    spop_ref[g] = low
                # arithmetic >> then & 31 == logical >> for the wrapped
                # product; table slot k_+j holds perm[rank(j)] (launcher
                # _debruijn_ranks)
                j = ((low * _DEBRUIJN) >> 27) & 31
                visit_row(g, perm_ref_[k_ + j])

            def count_hist():
                if count_visits:
                    out_hist_ref[hist_r : hist_r + 1, :] = (
                        out_hist_ref[hist_r : hist_r + 1, :] + 1
                    )

            bits_acc, bits_hi, cnt_acc = build_bits()
            for g in range(RS):
                sbits_ref[g] = extract_bits(bits_acc, bits_hi, g)
            if perlane >= 2:
                # one pop round, then re-tighten: rebuild the masks
                # under the now-shrunk best_t, clear each row's already
                # popped rank (its slab still passes - the fold hit it),
                # and recount scalar-side (SWAR popcount + max chain).
                count_hist()
                for g in range(RS):
                    pop_visit(g, True)
                bits2, bits2_hi, _ = build_bits()
                n_it = jnp.int32(0)
                for g in range(RS):
                    b2 = extract_bits(bits2, bits2_hi, g)
                    b2 = b2 & ~spop_ref[g]
                    sbits_ref[g] = b2
                    x = b2 - ((b2 >> 1) & 0x55555555)
                    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
                    x = (x + (x >> 4)) & 0x0F0F0F0F
                    n_it = jnp.maximum(
                        n_it, ((x * 0x01010101) >> 24) & 63
                    )
            else:
                n_it = jnp.max(cnt_acc).astype(jnp.int32)

            def drain_it(it, carry):
                count_hist()
                for g in range(RS):
                    pop_visit(g, False)
                return carry

            lax.fori_loop(0, n_it, drain_it, jnp.int32(0))

        perlane_sph = (
            perlane
            and use_cull
            and n_sph_supers <= 1
            and 2 <= nss_visit <= 31
        )
        if perlane_sph:

            def sph_visit_row(g, c):
                cs = sphere_cols_slices(sph_cols_ref[c])
                clu_f = (c * SUB).astype(jnp.float32)
                idx_w = ((c << 5) | sub_iota_i) if wide else None
                sphere_row_test(g, cs, clu_f, idx_w)

            perlane_drain(
                sph_bounds_ref, sperm_ref, nss_visit, sph_visit_row,
                hist_rows - 1,
            )
        # Hierarchical cull: one slab test per super-cluster of 32 subs
        # gates the whole block (second level of the reference's chunk
        # gate). Single-super scenes keep the flat sub loop - the fixed
        # 32-sub inner loop would test padding boxes for nothing.
        elif use_cull and n_sph_supers > 1:

            def sphere_super(si, carry):
                sup = sperm_sup_ref[si]
                smask = tile_hits(sph_super_ref, sup)

                def subs():
                    lax.fori_loop(
                        0,
                        SUPER,
                        lambda j, c2: sphere_cluster(sup * SUPER + j, c2),
                        jnp.int32(0),
                    )

                pl.when(jnp.any(smask))(subs)
                return carry

            lax.fori_loop(0, n_sph_supers, sphere_super, jnp.int32(0))
        else:
            # nss_visit excludes the trailing hoisted block (pack.py
            # guarantees n_hoist == 0 whenever supers > 1)
            lax.fori_loop(0, nss_visit, sphere_cluster, jnp.int32(0))

        def tri_cluster(ci, carry):
            c = tperm_ref[ci]
            mask = tile_hits(tri_bounds_ref, c) if use_cull else None

            def visit():
                if count_visits:
                    r = hist_rows - 2
                    out_hist_ref[r : r + 1, :] = (
                        out_hist_ref[r : r + 1, :] + 1
                    )
                cs = tri_cols_slices(tri_cols_ref[c])  # (SUB, 16)
                clu_f = ((nss + c) * SUB).astype(jnp.float32)
                idx_w = (((nss + c) << 5) | sub_iota_i) if wide else None
                visit_rows(
                    lambda g: tri_row_test(g, cs, clu_f, idx_w), mask
                )

            if use_cull:
                pl.when(jnp.any(mask))(visit)
            else:
                visit()
            return carry

        if "tris" in features:

            def tri_visit_row(g, c):
                cs = tri_cols_slices(tri_cols_ref[c])
                clu_f = ((nss + c) * SUB).astype(jnp.float32)
                idx_w = (
                    (((nss + c) << 5) | sub_iota_i) if wide else None
                )
                tri_row_test(g, cs, clu_f, idx_w)

            # per-lane cull, triangle flavour: same drain scheme as the
            # sphere branch above (sbits_ref is free again - the sphere
            # drain completed), with the Moller-Trumbore block inlined
            # per row under a dynamic cluster index.
            perlane_tri = (
                perlane
                and use_cull
                and n_tri_supers <= 1
                and 2 <= nst <= 31
            )
            # ---- per-row 1-level sub drain (rowdrain, round 4) ----
            # Large-mesh scenes (supers > 1): the two-level tile gating
            # makes every lane pay the TILE's sub visit union (475 of
            # 2188/slot on the bunny at TS=64); per-ROW unions are
            # 3-6x smaller on real segments (tools/mesh_stats.py), so
            # each 128-lane row walks only ITS union, in global
            # front-to-back rank order, via SMEM bitmask pops:
            #   - build: for each word w of 32 ranks, 32 t-bounded slab
            #     tests accumulate two f32 bit-sums per row (24+8 bits,
            #     exact) which extract to one i32 word sbits[g*W+w];
            #     per-row nonzero-word SUMMARY bits land in spop[g*SW+.]
            #     and the need COUNT accumulates in cnt_ref column 0.
            #   - drain: max-over-rows(count) iterations; each row pops
            #     its lowest set rank (summary ctz -> word ctz, both via
            #     the De Bruijn table at tperm[NTP..]), maps rank ->
            #     cluster through the global f2b perm (tperm[0..NTP)),
            #     and runs the Moller-Trumbore block for that row only.
            #     Drained rows pop bit pattern 0 -> ctz(0) resolves to
            #     rank 0 of the last-scanned summary word, i.e. the
            #     REAL cluster at global f2b rank 0 (SW == 1) or
            #     1024*(SW-1) (SW >= 2) - NOT a padding cluster. The
            #     row pays that cluster's full Moller-Trumbore block
            #     once per remaining drain iteration, but the fold
            #     stays exact: the min-fold is idempotent (re-testing
            #     a visited cluster reproduces dominated candidates),
            #     and a cluster whose t-bounded slab test failed at
            #     mask-freeze time can only yield candidates with
            #     t >= frozen best_t >= final best, which cannot win.
            #     No per-row branches by design (pl.when costs
            #     ~90 ns/row, the round-2 negative).
            # Masks are FROZEN at tri-section start (post-sphere best_t)
            # like perlane mode 1: frozen visits are a superset, which
            # cannot change the fold winner beyond the encode's
            # documented ulp-scale two-sidedness.
            rowdrain_tri = rowdrain and use_cull and n_tri_supers > 1
            if rowdrain_tri:
                W = n_tri_supers  # SUPER == 32: exactly one word/super
                SW = -(-W // 32)
                NTP = W * SUPER

                def rd_build():
                    cnt_ref[...] = zero_f
                    for g in range(RS):
                        for sw in range(SW):
                            spop_ref[g * SW + sw] = 0

                    def word_body(w, carry):
                        ba, bh, ca = None, None, None
                        for k in range(32):
                            m = tile_hits(
                                tri_bounds_ref, tperm_ref[w * 32 + k]
                            )
                            anyr = jnp.max(
                                m.astype(jnp.float32), axis=1,
                                keepdims=True,
                            )  # (RS, 1)
                            if k < 24:
                                wt = np.float32(2.0 ** k)
                                ba = anyr * wt if ba is None else (
                                    ba + anyr * wt
                                )
                            else:
                                wt = np.float32(2.0 ** (k - 24))
                                bh = anyr * wt if bh is None else (
                                    bh + anyr * wt
                                )
                            ca = anyr if ca is None else ca + anyr
                        cnt_ref[:, 0:1] = cnt_ref[:, 0:1] + ca
                        for g in range(RS):
                            word = jnp.sum(ba[g : g + 1, :]).astype(
                                jnp.int32
                            ) | (
                                jnp.sum(bh[g : g + 1, :]).astype(
                                    jnp.int32
                                )
                                << 24
                            )
                            sbits_ref[g * W + w] = word
                            sidx = g * SW + w // 32
                            spop_ref[sidx] = spop_ref[sidx] | (
                                (word != 0).astype(jnp.int32)
                                << (w % 32)
                            )
                        return carry

                    lax.fori_loop(0, W, word_body, jnp.int32(0))
                    return jnp.max(cnt_ref[:, 0:1]).astype(jnp.int32)

                def rd_pop(g):
                    # lowest nonzero summary word (static SW chain)
                    ssel = spop_ref[g * SW + SW - 1]
                    sidx = jnp.int32(g * SW + SW - 1)
                    wbase = jnp.int32(32 * (SW - 1))
                    for sw in range(SW - 2, -1, -1):
                        b = spop_ref[g * SW + sw]
                        has = b != 0
                        ssel = jnp.where(has, b, ssel)
                        sidx = jnp.where(
                            has, jnp.int32(g * SW + sw), sidx
                        )
                        wbase = jnp.where(has, jnp.int32(32 * sw), wbase)
                    low_s = ssel & (0 - ssel)
                    jw = ((low_s * _DEBRUIJN) >> 27) & 31
                    w = jnp.minimum(
                        wbase + tperm_ref[NTP + jw], jnp.int32(W - 1)
                    )
                    b = sbits_ref[g * W + w]
                    low = b & (0 - b)
                    b2 = b - low
                    sbits_ref[g * W + w] = b2
                    # drop the word's summary bit once it empties
                    # (arithmetic - low_s is exactly that bit)
                    spop_ref[sidx] = ssel - low_s * (b2 == 0).astype(
                        jnp.int32
                    )
                    jb = ((low * _DEBRUIJN) >> 27) & 31
                    r = w * 32 + tperm_ref[NTP + jb]
                    tri_visit_row(g, tperm_ref[r])

                n_it_rd = rd_build()

                def rd_drain_it(it, carry):
                    if count_visits:
                        r = hist_rows - 2
                        out_hist_ref[r : r + 1, :] = (
                            out_hist_ref[r : r + 1, :] + 1
                        )
                    for g in range(RS):
                        rd_pop(g)
                    return carry

                lax.fori_loop(0, n_it_rd, rd_drain_it, jnp.int32(0))
            elif perlane_tri:
                perlane_drain(
                    tri_bounds_ref, tperm_ref, nst, tri_visit_row,
                    hist_rows - 2,
                )
            elif use_cull and n_tri_supers > 1:

                def tri_super(si, carry):
                    sup = tperm_sup_ref[si]
                    smask = tile_hits(tri_super_ref, sup)

                    def subs():
                        lax.fori_loop(
                            0,
                            SUPER,
                            lambda j, c2: tri_cluster(sup * SUPER + j, c2),
                            jnp.int32(0),
                        )

                    pl.when(jnp.any(smask))(subs)
                    return carry

                lax.fori_loop(0, n_tri_supers, tri_super, jnp.int32(0))
            else:
                lax.fori_loop(0, nst, tri_cluster, jnp.int32(0))
        # decode: t_approx is +inf on miss (isfinite = hit test);
        # code = winning cluster slot base + sub index (fetch key)
        t_approx = best_enc_ref[...]
        if wide:
            e = pltpu.bitcast(t_approx, jnp.int32)
            code = (
                ((e >> 5) & np.int32(63)) * np.int32(SUB) + (e & _SUBM)
            ).astype(jnp.float32)
            # misses decode to slot 0 (inf bits have zero cluster/sub
            # fields); every consumer is masked by isfinite(t)
            return t_approx, code
        sub = pltpu.bitcast(t_approx, jnp.int32) & _SUBM
        code = best_clu_ref[...] + sub.astype(jnp.float32)
        return t_approx, code

    # The packer selected exactly the rows this scene's feature set can
    # read (pack.py fetch_fields); nf is that count padded to 8 sublanes.
    n_fetch_rows = nf
    fidx = {name: i for i, name in enumerate(fetch_fields)}

    # winner-fetch acc1 row meanings are the sub-cols table columns; a
    # lane reads them under its own winner's TYPE, so the sphere and
    # triangle layouts may alias the same rows (winners are per-lane
    # disjoint and every consumer selects by is_sph)
    _ACC1 = {
        "scx": 0, "scy": 1, "scz": 2, "sr2": 4,
        "pa_x": 0, "pa_y": 1, "pa_z": 2,
        "eab_x": 3, "eab_y": 4, "eab_z": 5,
        "eac_x": 6, "eac_y": 7, "eac_z": 8,
        "gn_x": 9, "gn_y": 10, "gn_z": 11,
    }
    _ACC2 = {name: i for i, name in enumerate(attr_fields)}

    def winner_fetch():
        """Winner post-pass fetch (big scenes): after the closest-hit
        fold, visit ONLY sub-clusters that won at least one lane (gated
        per super / per sub with ``pl.when``), contract their parameter
        tables against the winning-lane one-hot on the MXU, and
        accumulate into per-field row accumulators. Cost scales with
        the number of distinct winning sub-clusters per tile - a
        70k-slot mesh pays nothing for the 69k slots this tile never
        hit, where the one-hot fetch's per-row cluster combine would
        walk all n_slots/128 blocks."""
        best_clu = best_clu_ref[...]
        enc_i = pltpu.bitcast(best_enc_ref[...], jnp.int32)
        best_sub = (enc_i & _SUBM).astype(jnp.float32)
        sub_f = lax.broadcasted_iota(
            jnp.int32, (SUB, LANES), 0
        ).astype(jnp.float32)
        wacc1_ref[...] = lax.broadcasted_iota(
            jnp.int32, (16, RS * LANES), 1
        ).astype(jnp.float32) * 0.0
        wacc2_ref[...] = lax.broadcasted_iota(
            jnp.int32, (wacc2_ref.shape[0], RS * LANES), 1
        ).astype(jnp.float32) * 0.0

        def visit_sub(cols_ref, attr_ref, c, base_f):
            for g in range(RS):
                ohw_ref[:, g * LANES : (g + 1) * LANES] = (
                    (best_clu[g : g + 1, :] == base_f)
                    & (sub_f == best_sub[g : g + 1, :])
                ).astype(jnp.float32)
            cols = cols_ref[c]  # (SUB, C)
            d1 = lax.dot_general(
                cols,
                ohw_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, ROWS*128), zero on non-winning lanes
            wacc1_ref[0 : cols.shape[-1], :] += d1
            d2 = lax.dot_general(
                attr_ref[c],
                ohw_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wacc2_ref[...] += d2

        def sph_sub(c, carry):
            base_f = (c * SUB).astype(jnp.float32)
            pl.when(jnp.any(best_clu == base_f))(
                lambda: visit_sub(sph_cols_ref, sph_attr_ref, c, base_f)
            )
            return carry

        if n_sph_supers > 1:

            def sph_super(s, carry):
                lo = (s * (SUPER * SUB)).astype(jnp.float32)
                hi = lo + float(SUPER * SUB)

                def subs():
                    lax.fori_loop(
                        0,
                        SUPER,
                        lambda j, c2: sph_sub(s * SUPER + j, c2),
                        jnp.int32(0),
                    )

                pl.when(
                    jnp.any((best_clu >= lo) & (best_clu < hi))
                )(subs)
                return carry

            lax.fori_loop(0, n_sph_supers, sph_super, jnp.int32(0))
        else:
            lax.fori_loop(0, nss, sph_sub, jnp.int32(0))

        if "tris" in features:

            def tri_sub(c, carry):
                base_f = ((nss + c) * SUB).astype(jnp.float32)
                pl.when(jnp.any(best_clu == base_f))(
                    lambda: visit_sub(
                        tri_cols_ref, tri_attr_ref, c, base_f
                    )
                )
                return carry

            if n_tri_supers > 1:

                def tri_super(s, carry):
                    lo = ((nss + s * SUPER) * SUB).astype(jnp.float32)
                    hi = lo + float(SUPER * SUB)

                    def subs():
                        lax.fori_loop(
                            0,
                            SUPER,
                            lambda j, c2: tri_sub(s * SUPER + j, c2),
                            jnp.int32(0),
                        )

                    pl.when(
                        jnp.any((best_clu >= lo) & (best_clu < hi))
                    )(subs)
                    return carry

                lax.fori_loop(0, n_tri_supers, tri_super, jnp.int32(0))
            else:
                lax.fori_loop(0, nst, tri_sub, jnp.int32(0))

        def field(name):
            if name in _ACC2:
                ref, i = wacc2_ref, _ACC2[name]
            else:
                ref, i = wacc1_ref, _ACC1[name]
            return jnp.concatenate(
                [
                    ref[i : i + 1, g * LANES : (g + 1) * LANES]
                    for g in range(RS)
                ],
                axis=0,
            )

        return field

    def fetch(code):
        if fetch_mode == "winner":
            return winner_fetch()
        if stub_fetch:
            return lambda name: zero_f + np.float32(
                0.1 + 0.01 * fidx[name]
            )
        """Two-level one-hot fetch -> field(i) accessor of (ROWS, 128)
        arrays. Slot ids decompose as cc * 128 + ss. The 128-wide
        within-cluster one-hots of ``gb`` ray rows are written side by
        side into VMEM scratch and contracted in ONE wide MXU dot
        (n_fc*nf, 128) @ (128, gb*128) - 32 narrow per-row dots ran at
        ~30% MXU utilization (measured ~half the frame). The n_slots/128
        cluster blocks are then combined per row with masked adds."""
        rows = []
        for g0 in range(0, RS, gb):
            ccs = []
            for j in range(gb):
                codeg = code[g0 + j : g0 + j + 1, :]
                cc = jnp.floor(codeg * np.float32(1.0 / 128.0))
                ss = codeg - cc * np.float32(128.0)
                ccs.append(cc)
                oh_ref[:, j * LANES : (j + 1) * LANES] = (
                    s128_iota == ss
                ).astype(jnp.float32)
            bfet_ref[...] = jax.lax.dot_general(
                fetch2_ref[:],
                oh_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n_fc * n_fetch_rows, gb*128)
            for j in range(gb):
                a_c = (fc_iota == ccs[j]).astype(jnp.float32)
                b = bfet_ref[:, j * LANES : (j + 1) * LANES]
                acc = b[0:n_fetch_rows] * a_c[0:1, :]
                for c in range(1, n_fc):
                    acc = acc + (
                        b[c * n_fetch_rows : (c + 1) * n_fetch_rows]
                        * a_c[c : c + 1, :]
                    )
                rows.append(acc)

        def field(name):
            i = fidx[name]
            return jnp.concatenate(
                [rows[g][i : i + 1, :] for g in range(RS)], axis=0
            )

        return field

    def segment_body(state, ox, oy, oz, dx, dy, dz,
                     inc_r, inc_g, inc_b, col_r, col_g, col_b, bc, part,
                     t, code):
        """Trace ONE path segment for every lane (Trace body,
        RayTracing.shader:300-352).

        No explicit alive mask is carried across iterations: a dead lane's
        throughput is zeroed (miss / Russian-roulette kill / bounce budget
        exhausted), and liveness is re-derived as ``any colour channel >
        0`` - legit because a lane whose throughput is exactly black cannot
        contribute and the reference would have RR-killed it too (survive
        prob = max channel = 0). Dead-but-unfinished lanes were re-seeded
        by the scheduler before this runs; finished lanes are PARKED at
        +1e9 pointing +x so they miss everything, fail every cull, and
        their env re-adds multiply zero throughput.

        ``part`` masks the lanes tracing THIS slot (all work-holding lanes
        normally; one coherence phase of them under phase-split
        scheduling). Non-participating lanes - parked or waiting for
        their phase - pass through unchanged: ``t`` is +inf for them (the
        scheduler parks their intersect inputs), so ``hit`` is false, the
        miss/env banking is masked by ``part``, and the state outputs
        blend back their originals.

        Returns the post-segment state tuple plus ``died`` (lanes whose
        sample completed this segment - their inc must be banked).
        """
        hit = jnp.isfinite(t)

        f = fetch(code)
        m_col_r, m_col_g, m_col_b = f("col_r"), f("col_g"), f("col_b")
        if dup_fetch:
            # profiling knob: a second full fetch on a code the compiler
            # cannot prove equal; folded so the result cannot change
            # (x + 1e30 >= any material value). Delta = pure fetch cost.
            f2 = fetch(jnp.where(code < -1.0, code + 1.0, code))
            m_col_r = jnp.minimum(m_col_r, f2("col_r") + np.float32(1e30))
        m_sp_r, m_sp_g, m_sp_b = f("spec_r"), f("spec_g"), f("spec_b")
        m_smooth, m_sprob = f("smooth"), f("sprob")
        if "emissive" in features or "checker" in features:
            m_em_r, m_em_g, m_em_b = f("em_r"), f("em_g"), f("em_b")
        if {"checker", "invisible", "dielectric"} & set(features):
            m_flag = f("flag")

        # ---- exact-t recompute + hit point ----
        # The intersect fold truncated t's low 5 mantissa bits for the
        # index encode; re-derive full-precision t from the winning
        # primitive's fetched parameters (numerically STABLE forms - the
        # oc-based quadratic, t_det/det) so hit points, normals and the
        # parity with the scalar oracle are exact. Lanes that missed keep
        # garbage here; every consumer is masked by ``hit``.
        scx, scy, scz = f("scx"), f("scy"), f("scz")
        ocx_s, ocy_s, ocz_s = ox - scx, oy - scy, oz - scz
        b_s = ocx_s * dx + ocy_s * dy + ocz_s * dz
        cc_s = (
            ocx_s * ocx_s + ocy_s * ocy_s + ocz_s * ocz_s - f("sr2")
        )
        t_exact = -b_s - jnp.sqrt(jnp.maximum(b_s * b_s - cc_s, 0.0))
        if "tris" in features:
            is_sph = f("is_sph")
            pax, pay, paz = f("pa_x"), f("pa_y"), f("pa_z")
            gnx, gny, gnz = f("gn_x"), f("gn_y"), f("gn_z")
            aox, aoy, aoz = ox - pax, oy - pay, oz - paz
            det = -(dx * gnx + dy * gny + dz * gnz)
            inv_det = 1.0 / jnp.where(det == 0.0, np.float32(1.0), det)
            t_tri = (aox * gnx + aoy * gny + aoz * gnz) * inv_det
            t_exact = jnp.where(is_sph > 0.5, t_exact, t_tri)
        ts = jnp.where(hit, t_exact, 0.0)
        hpx = ox + dx * ts
        hpy = oy + dy * ts
        hpz = oz + dz * ts

        # ---- shading normal ----
        nsx, nsy, nsz = _norm3(hpx - scx, hpy - scy, hpz - scz)
        if "tris" in features:
            if "vnormals" in features:
                # barycentric interpolation of the three vertex normals
                ex1, ey1, ez1 = f("eab_x"), f("eab_y"), f("eab_z")
                ex2, ey2, ez2 = f("eac_x"), f("eac_y"), f("eac_z")
                daox = aoy * dz - aoz * dy
                daoy = aoz * dx - aox * dz
                daoz = aox * dy - aoy * dx
                ub = (ex2 * daox + ey2 * daoy + ez2 * daoz) * inv_det
                vb = -(ex1 * daox + ey1 * daoy + ez1 * daoz) * inv_det
                wb = 1.0 - ub - vb
                ntx = f("na_x") * wb + f("nb_x") * ub + f("nc_x") * vb
                nty = f("na_y") * wb + f("nb_y") * ub + f("nc_y") * vb
                ntz = f("na_z") * wb + f("nb_z") * ub + f("nc_z") * vb
            else:
                # flat-shaded mesh: all three vertex normals are equal,
                # so the interpolation is the constant na - fetch one row
                # set and skip the barycentrics entirely
                ntx, nty, ntz = f("na_x"), f("na_y"), f("na_z")
            ntx, nty, ntz = _norm3(ntx, nty, ntz)
            nx = jnp.where(is_sph > 0.5, nsx, ntx)
            ny = jnp.where(is_sph > 0.5, nsy, nty)
            nz = jnp.where(is_sph > 0.5, nsz, ntz)
        else:
            nx, ny, nz = nsx, nsy, nsz

        # ---- checker flag (RayTracing.shader:313-317) ----
        if "checker" in features:
            fx = jnp.floor(hpx)
            fz = jnp.floor(hpz)
            chx = fx - 2.0 * jnp.floor(fx * 0.5)
            chz = fz - 2.0 * jnp.floor(fz * 0.5)
            swap = (m_flag == np.float32(FLAG_CHECKER)) & (chx != chz)
            base_r = jnp.where(swap, m_em_r, m_col_r)
            base_g = jnp.where(swap, m_em_g, m_col_g)
            base_b = jnp.where(swap, m_em_b, m_col_b)
        else:
            base_r, base_g, base_b = m_col_r, m_col_g, m_col_b

        # ---- invisible light passthrough (RayTracing.shader:318-322)
        # bc is the per-lane bounce index of the current sample, so the
        # camera-ray-only check is a vector compare.
        if "invisible" in features:
            passthru = (
                hit
                & (m_flag == np.float32(FLAG_INVISIBLE_LIGHT))
                & (bc == 0)
            )
        else:
            passthru = zero_i > 0  # static False, layout-anchored
        scattering = hit & ~passthru

        # ---- scatter (RayTracing.shader:325-330) ----
        state2, u_spec = _rand(state)
        is_spec = (m_sprob >= u_spec).astype(jnp.float32)
        if fast_scatter:
            state2, ux, uy, uz = _rand_unit3_fast(state2)
        else:
            state2, ux, uy, uz = _rand_unit3(state2)
        ddx, ddy, ddz = _norm3(nx + ux, ny + uy, nz + uz)
        dn = dx * nx + dy * ny + dz * nz
        sxx = dx - 2.0 * dn * nx
        sxy = dy - 2.0 * dn * ny
        sxz = dz - 2.0 * dn * nz
        lerp_t = m_smooth * is_spec
        sdx, sdy, sdz = _norm3(
            ddx + (sxx - ddx) * lerp_t,
            ddy + (sxy - ddy) * lerp_t,
            ddz + (sxz - ddz) * lerp_t,
        )

        # dielectric extension (ops/materials.py semantics) -
        # compiled out entirely for scenes with no dielectric materials
        if "dielectric" in features:
            entering = dn < 0.0
            sign = jnp.where(entering, 1.0, -1.0)
            nex, ney, nez = nx * sign, ny * sign, nz * sign
            m_ior = f("ior")
            eta = jnp.where(entering, 1.0 / m_ior, m_ior)
            cos_t = jnp.minimum(-(dx * nex + dy * ney + dz * nez), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cannot = eta * sin_t > 1.0
            r0 = (1.0 - eta) / (1.0 + eta)
            r0 = r0 * r0
            om = 1.0 - cos_t
            om2 = om * om
            schlick = r0 + (1.0 - r0) * om2 * om2 * om
            refl = cannot | (schlick > u_spec)
            rpx = eta * (dx + cos_t * nex)
            rpy = eta * (dy + cos_t * ney)
            rpz = eta * (dz + cos_t * nez)
            k = jnp.sqrt(
                jnp.maximum(
                    1.0 - (rpx * rpx + rpy * rpy + rpz * rpz), 0.0
                )
            )
            rfx = rpx - k * nex
            rfy = rpy - k * ney
            rfz = rpz - k * nez
            den = dx * nex + dy * ney + dz * nez
            glx = jnp.where(refl, dx - 2.0 * den * nex, rfx)
            gly = jnp.where(refl, dy - 2.0 * den * ney, rfy)
            glz = jnp.where(refl, dz - 2.0 * den * nez, rfz)
            is_diel = m_flag == np.float32(FLAG_DIELECTRIC)
            ndx = jnp.where(is_diel, glx, sdx)
            ndy = jnp.where(is_diel, gly, sdy)
            ndz = jnp.where(is_diel, glz, sdz)
            d_eps = jnp.where(is_diel, np.float32(1e-4), 0.0)
            is_spec = jnp.where(is_diel, 0.0, is_spec)
        else:
            ndx, ndy, ndz = sdx, sdy, sdz
            d_eps = zero_f

        # ---- light update (RayTracing.shader:333-335); scenes with no
        # emissive material compile the emission term (and its fetch rows)
        # out entirely ----
        if "emissive" in features:
            em = f("estr")
            inc_r2 = inc_r + m_em_r * em * col_r
            inc_g2 = inc_g + m_em_g * em * col_g
            inc_b2 = inc_b + m_em_b * em * col_b
        else:
            inc_r2, inc_g2, inc_b2 = inc_r, inc_g, inc_b
        cr2 = col_r * (base_r + (m_sp_r - base_r) * is_spec)
        cg2 = col_g * (base_g + (m_sp_g - base_g) * is_spec)
        cb2 = col_b * (base_b + (m_sp_b - base_b) * is_spec)

        # ---- Russian roulette (RayTracing.shader:337-342) ----
        p = jnp.maximum(cr2, jnp.maximum(cg2, cb2))
        state2, u_rr = _rand(state2)
        survive = u_rr < p
        inv_p = 1.0 / jnp.maximum(p, np.float32(1e-30))

        # ---- miss: environment ----
        er, eg, eb = environment(dx, dy, dz)
        # non-participants are excluded: a phase-waiting LIVE lane must
        # not bank an env term (parked lanes' env re-adds multiply zero
        # colour anyway, but waiting lanes carry real throughput)
        missed = (~hit) & part

        sc = scattering
        # The RNG state only advances on scattering lanes (matching the
        # shader's inout rngState). NOTE: a uint32 vector select trips a
        # Mosaic relayout bug, so select arithmetically in uint32.
        sel = pltpu.bitcast(jnp.where(sc, zero_i + 1, zero_i), jnp.uint32)
        st_fix = state2 * sel + state * (_U(1) - sel)
        ox2 = jnp.where(passthru, hpx + dx * 0.001,
                        jnp.where(sc, hpx + ndx * d_eps, ox))
        oy2 = jnp.where(passthru, hpy + dy * 0.001,
                        jnp.where(sc, hpy + ndy * d_eps, oy))
        oz2 = jnp.where(passthru, hpz + dz * 0.001,
                        jnp.where(sc, hpz + ndz * d_eps, oz))
        dx2 = jnp.where(sc, ndx, dx)
        dy2 = jnp.where(sc, ndy, dy)
        dz2 = jnp.where(sc, ndz, dz)
        inc_r3 = jnp.where(sc, inc_r2,
                           jnp.where(missed, inc_r + er * col_r, inc_r))
        inc_g3 = jnp.where(sc, inc_g2,
                           jnp.where(missed, inc_g + eg * col_g, inc_g))
        inc_b3 = jnp.where(sc, inc_b2,
                           jnp.where(missed, inc_b + eb * col_b, inc_b))
        scs = sc & survive
        # Bounce budget: the reference loop runs indices 0..max_bounce
        # inclusive (RayTracing.shader:305); a path still alive after its
        # segment at index max_bounce simply ends.
        can_cont = bc < max_bounce
        cc_f = jnp.where(can_cont, zero_f + 1.0, zero_f)
        # Death = zeroed throughput: lanes that missed, failed Russian
        # roulette, exhausted the bounce budget, or were already dead land
        # in the zero branch. Arithmetic mask blend: a where-select on a
        # self-referential carry (col -> live -> masks -> col) trips Mosaic
        # layout inference; multiply-add of 0/1 masks compiles fine (same
        # trick as the RNG state select above).
        pass_f = jnp.where(passthru, zero_f + 1.0, zero_f) * cc_f
        scs_f = jnp.where(scs, zero_f + 1.0, zero_f) * cc_f
        part_f = jnp.where(part, zero_f + 1.0, zero_f)
        boost_r = cr2 * inv_p
        boost_g = cg2 * inv_p
        boost_b = cb2 * inv_p
        # waiting (non-participating) lanes keep their throughput; a
        # participant keeps it only on passthrough
        col_keep = pass_f + 1.0 - part_f
        col_r2 = col_r * col_keep + boost_r * scs_f
        col_g2 = col_g * col_keep + boost_g * scs_f
        col_b2 = col_b * col_keep + boost_b * scs_f
        # arithmetic parking: participating lanes that died this bounce
        # (neither passthrough nor scatter+survive) move to +1e9 heading
        # +x; non-participants keep their originals (ox2 == ox for them
        # already - hit is false - so one keep-factor covers both)
        live_f = pass_f + scs_f  # 0.0 or 1.0, disjoint masks
        dead_f = part_f - live_f  # died AND participated
        keep_f = live_f + 1.0 - part_f
        ox2, oy2, oz2, dx2, dy2, dz2 = park_blend(
            keep_f, dead_f, ox2, oy2, oz2, dx2, dy2, dz2
        )
        # A sample completed this segment iff its lane traced it and did
        # not continue; its accumulated light is banked by the scheduler.
        died = part & ~((passthru | scs) & can_cont)
        return (
            st_fix, ox2, oy2, oz2, dx2, dy2, dz2,
            inc_r3, inc_g3, inc_b3, col_r2, col_g2, col_b2, died,
        )

    # ------------------ persistent-lane scheduler ---------------------
    # Lane state machine: dead (throughput 0) with samples left -> re-seed
    # with the next camera sample, then trace; alive -> trace one segment;
    # dead with all samples done -> parked no-op. The static slot bound
    # spp * (max_bounce + 1) is the worst case (every sample surviving the
    # full bounce budget); real tiles finish in ~spp * rays_per_path slots
    # and pl.when makes the remaining slots a cheap any-reduce.
    s_st_ref[...] = seed
    s_ox_ref[...] = zero_f + np.float32(1.0e9)
    s_oy_ref[...] = zero_f + np.float32(1.0e9)
    s_oz_ref[...] = zero_f + np.float32(1.0e9)
    s_dx_ref[...] = zero_f + 1.0
    s_dy_ref[...] = zero_f
    s_dz_ref[...] = zero_f + np.float32(1e-9)
    s_ir_ref[...] = zero_f
    s_ig_ref[...] = zero_f
    s_ib_ref[...] = zero_f
    s_cr_ref[...] = zero_f
    s_cg_ref[...] = zero_f
    s_cb_ref[...] = zero_f
    s_segs_ref[...] = zero_i
    s_tr_ref[...] = zero_f
    s_tg_ref[...] = zero_f
    s_tb_ref[...] = zero_f
    s_ns_ref[...] = zero_i
    s_bc_ref[...] = zero_i
    s_fk_ref[...] = zero_i
    s_ph_ref[...] = zero_i
    if with_accum:
        # running average carried per-lane; input blocks hold the
        # caller's accumulator (frame 0's weight is 1, so stale content
        # is discarded exactly like ops/accumulate.py)
        out_r_ref[...] = acc_r_ref[...]
        out_g_ref[...] = acc_g_ref[...]
        out_b_ref[...] = acc_b_ref[...]
    elif ppl > 1:
        # piecewise half-banking folds with prior content via where();
        # clear the uninitialized output blocks first
        zero_out = lax.broadcasted_iota(
            jnp.int32, (ROWS, LANES), 1
        ).astype(jnp.float32) * 0.0
        out_r_ref[...] = zero_out
        out_g_ref[...] = zero_out
        out_b_ref[...] = zero_out
    # per-PIXEL sample quota across the frame batch; a lane advances to
    # its next frame (fresh reference seed pix + frame*719393) the moment
    # its current frame's spp quota completes, and to its next PIXEL
    # (ppl > 1) when all n_frames quotas of the current one are done -
    # idle-lane occupancy is the parity-mode bottleneck (58% measured
    # round 2; K-batching lifts it to 64%, pixel multiplexing beyond)
    quota = n_frames * spp

    def bank_out(mask, ph, vr, vg, vb, w):
        """Bank per-lane (RS, 128) pixel results into the output halves
        selected by each lane's phase: half h rows [h*RS, (h+1)*RS) hold
        phase-h pixels. ``w``: per-lane accumulate weight ((RS, 128) or
        scalar; None = plain write for the non-accum path). Unselected
        lanes keep the half's previous content (each lane writes each of
        its halves exactly once, so every output row is covered by the
        time the slot bound drains)."""
        for h in range(ppl):
            mh = mask if ppl == 1 else mask & (ph == h)
            sl = slice(h * RS, (h + 1) * RS)
            for ref, v in (
                (out_r_ref, vr), (out_g_ref, vg), (out_b_ref, vb)
            ):
                old = ref[sl, :]
                if w is None:
                    new = v
                else:
                    new = old * (1.0 - w) + v * w
                    if clamp_accum:
                        new = jnp.clip(new, 0.0, 1.0)
                # where-select, NOT an arithmetic blend: unselected
                # entries may be uninitialized output memory, and
                # NaN * 0 would poison them
                ref[sl, :] = jnp.where(mh, new, old)

    def bank_segs(mask, ph):
        """Write banked lanes' segment counters to their phase half and
        reset them (per-pixel attribution keeps edge-tile crops exact)."""
        for h in range(ppl):
            mh = mask if ppl == 1 else mask & (ph == h)
            sl = slice(h * RS, (h + 1) * RS)
            out_segs_ref[sl, :] = jnp.where(
                mh, s_segs_ref[...], out_segs_ref[sl, :]
            )
        s_segs_ref[...] = jnp.where(mask, zero_i, s_segs_ref[...])

    out_hist_ref[...] = lax.broadcasted_iota(
        jnp.int32, (hist_rows, LANES), 1
    ) * 0

    def slot_body(slot_i, carry):
        col_r = s_cr_ref[...]
        col_g = s_cg_ref[...]
        col_b = s_cb_ref[...]
        live0 = (col_r > 0.0) | (col_g > 0.0) | (col_b > 0.0)
        ns = s_ns_ref[...]
        # Phase-split scheduling (phases == 2): even slots trace ONLY
        # freshly re-seeded camera rays (spatially coherent - few cluster
        # visits), odd slots ONLY scattered survivors. Mixing them made
        # every slot pay the divergent visit rate (~13/16 subs on the
        # RTIOW headline) even though ~60% of segments are coherent
        # bounce-0 rays. Waiting lanes pass through untouched (their
        # intersect inputs are parked and all updates are part-masked).
        is_primary = (slot_i % 2) == 0 if phases == 2 else True
        # undone: this lane still owes quota samples (for its current
        # pixel, or for later pixels when ppl > 1)
        if ppl > 1:
            undone = (ns < quota) | (s_ph_ref[...] < (ppl - 1))
        else:
            undone = ns < quota

        @pl.when(jnp.any(live0 | undone))
        def _():
            if count_visits:
                r = hist_rows - 3
                out_hist_ref[r : r + 1, :] = out_hist_ref[r : r + 1, :] + 1
            if adaptive:
                # sample refill (cfg.adaptive_spp): lanes past their total
                # quota start EXTRA samples (continuing the LAST batched
                # frame's stream of their LAST pixel) while any tile lane
                # is still below it. Refill stops the moment the slowest
                # lane reaches quota, so the loop drains within one path
                # length; the slot bound still guarantees every lane
                # banks >= spp per frame (a lane only overflows AFTER
                # completing its quota).
                need = (~live0) & (undone | jnp.any(undone))
            else:
                need = (~live0) & undone

            if phases == 2:
                # fresh lanes only trace (and re-seed) on primary slots
                need = need & is_primary

            # ---- re-seed dead lanes with their next camera sample ----
            # (frag, RayTracing.shader:374-385: defocus origin jitter on
            # the cam right/up disc + diverge target jitter). The RNG
            # state advances ONLY on re-seeding lanes, so every lane's
            # draw sequence is identical to the reference's sequential
            # sample loop: sample k's camera draws happen right after
            # sample k-1's last scatter draw.
            @pl.when(jnp.any(need))
            def _():
                state = s_st_ref[...]
                ns2 = ns
                inv_spp = np.float32(1.0 / spp)
                if ppl > 1:
                    # ---- pixel switch (multi-pixel lanes) ----
                    # A lane that finished ALL batched frames of its
                    # current pixel banks that pixel's last frame (and
                    # its segment count) into the pixel's output half,
                    # then moves to its next pixel with everything reset.
                    ph = s_ph_ref[...]
                    sw = need & (ns >= quota) & (ph < (ppl - 1))
                    wl = (
                        (zero_f + fp_ref[_W0 + n_frames - 1])
                        if with_accum
                        else None
                    )
                    bank_out(
                        sw, ph,
                        s_tr_ref[...] * inv_spp,
                        s_tg_ref[...] * inv_spp,
                        s_tb_ref[...] * inv_spp, wl,
                    )
                    bank_segs(sw, ph)
                    swf = jnp.where(sw, zero_f + 1.0, zero_f)
                    ksw = 1.0 - swf
                    s_tr_ref[...] = s_tr_ref[...] * ksw
                    s_tg_ref[...] = s_tg_ref[...] * ksw
                    s_tb_ref[...] = s_tb_ref[...] * ksw
                    ns2 = jnp.where(sw, zero_i, ns)
                    s_ns_ref[...] = ns2
                    s_fk_ref[...] = jnp.where(sw, zero_i, s_fk_ref[...])
                    s_ph_ref[...] = ph + jnp.where(sw, zero_i + 1, zero_i)
                if n_frames > 1:
                    # ---- frame advance (K-frame batching) ----
                    # A lane whose current frame's spp quota just
                    # completed folds that frame's mean into its running
                    # average and moves to the next batched frame. The
                    # fold is ops/accumulate.py verbatim (weight
                    # 1/(frame+1), optional saturate); the per-frame
                    # weights were computed OUTSIDE the kernel with the
                    # same XLA divide (fp_ref tail) so sequential
                    # accumulation and the batched fold are bit-identical.
                    fk = s_fk_ref[...]
                    nsf = ns2 - fk * spp
                    fdone = need & (nsf >= spp) & (fk < (n_frames - 1))
                    fd = jnp.where(fdone, zero_f + 1.0, zero_f)
                    kfd = 1.0 - fd
                    w = zero_f
                    for k in range(n_frames - 1):
                        w = w + jnp.where(
                            fk == k, zero_f + fp_ref[_W0 + k], zero_f
                        )
                    bank_out(
                        fdone,
                        s_ph_ref[...] if ppl > 1 else None,
                        s_tr_ref[...] * inv_spp,
                        s_tg_ref[...] * inv_spp,
                        s_tb_ref[...] * inv_spp, w,
                    )
                    s_tr_ref[...] = s_tr_ref[...] * kfd
                    s_tg_ref[...] = s_tg_ref[...] * kfd
                    s_tb_ref[...] = s_tb_ref[...] * kfd
                    s_fk_ref[...] = fk + jnp.where(fdone, zero_i + 1, zero_i)
                if n_frames > 1 or ppl > 1:
                    # fresh reference seed for a lane's first sample of a
                    # new frame or pixel: pix + frame*719393
                    # (RayTracing.shader:358-362) - frames and pixels are
                    # independently seeded, which is exactly what makes
                    # cross-frame/pixel batching bit-exact
                    fk2 = s_fk_ref[...]
                    if ppl > 1:
                        ph2 = s_ph_ref[...]
                        pix_cur = zero_i
                        for p in range(ppl):
                            pix_cur = pix_cur + pixs[p] * jnp.where(
                                ph2 == p, zero_i + 1, zero_i
                            )
                    else:
                        pix_cur = pix
                    fresh = need & ((s_ns_ref[...] - fk2 * spp) == 0)
                    seed_k = pltpu.bitcast(
                        pix_cur + (frame + fk2) * 719393, jnp.uint32
                    )
                    fsel = pltpu.bitcast(
                        jnp.where(fresh, zero_i + 1, zero_i), jnp.uint32
                    )
                    state = seed_k * fsel + state * (_U(1) - fsel)
                st2, cjx, cjy = _rand_circle(state)
                cjx = cjx * defocus_w
                cjy = cjy * defocus_w
                # camRight = column 0 of R = (r00, r10, r20); camUp =
                # column 1 (RayTracing.shader:367-368).
                rox = cam0 + r00 * cjx + r01 * cjy
                roy = cam1 + r10 * cjx + r11 * cjy
                roz = cam2 + r20 * cjx + r21 * cjy
                st2, jx, jy = _rand_circle(st2)
                jx = jx * diverge_w
                jy = jy * diverge_w
                if ppl > 1:
                    # focus point of each lane's CURRENT pixel
                    ph3 = s_ph_ref[...]
                    fpx = fpy = fpz = zero_f
                    for p in range(ppl):
                        pf = jnp.where(ph3 == p, zero_f + 1.0, zero_f)
                        fpx = fpx + fpxs[p] * pf
                        fpy = fpy + fpys[p] * pf
                        fpz = fpz + fpzs[p] * pf
                else:
                    fpx, fpy, fpz = fpxs[0], fpys[0], fpzs[0]
                tx = fpx + r00 * jx + r01 * jy
                ty = fpy + r10 * jx + r11 * jy
                tz = fpz + r20 * jx + r21 * jy
                rdx, rdy, rdz = _norm3(tx - rox, ty - roy, tz - roz)
                sel = pltpu.bitcast(
                    jnp.where(need, zero_i + 1, zero_i), jnp.uint32
                )
                s_st_ref[...] = st2 * sel + state * (_U(1) - sel)
                nf = jnp.where(need, zero_f + 1.0, zero_f)
                kf = 1.0 - nf
                s_ox_ref[...] = rox * nf + s_ox_ref[...] * kf
                s_oy_ref[...] = roy * nf + s_oy_ref[...] * kf
                s_oz_ref[...] = roz * nf + s_oz_ref[...] * kf
                s_dx_ref[...] = rdx * nf + s_dx_ref[...] * kf
                s_dy_ref[...] = rdy * nf + s_dy_ref[...] * kf
                s_dz_ref[...] = rdz * nf + s_dz_ref[...] * kf
                s_cr_ref[...] = nf + s_cr_ref[...] * kf
                s_cg_ref[...] = nf + s_cg_ref[...] * kf
                s_cb_ref[...] = nf + s_cb_ref[...] * kf
                s_bc_ref[...] = jnp.where(need, zero_i, s_bc_ref[...])

            if phases == 2:
                # participants: fresh lanes on primary slots, survivors on
                # continuation slots. ``need`` is already masked to
                # primary slots; compose with AND/OR - a vector<i1>
                # arith.select (jnp.where on bool vectors) fails to
                # legalize in Mosaic.
                part = need | (live0 & jnp.logical_not(is_primary))
            else:
                part = live0 | need
            s_segs_ref[...] = s_segs_ref[...] + jnp.where(
                part, zero_i + 1, zero_i
            )
            if collect_stats:
                # per-bounce live histogram (alive-fraction observability):
                # one lane-wise reduce per bounce level, accumulated in the
                # output block. Edge tiles count their clamped border
                # duplicates too - callers normalise by counts[0], which
                # carries the same duplicates, so fractions are unbiased.
                bc_now = s_bc_ref[...]
                live_i = jnp.where(part, zero_i + 1, zero_i)
                for b_i in range(max_bounce + 1):
                    out_hist_ref[b_i : b_i + 1, :] = out_hist_ref[
                        b_i : b_i + 1, :
                    ] + jnp.sum(
                        jnp.where(bc_now == b_i, live_i, zero_i),
                        axis=0,
                        keepdims=True,
                    )

            ox = s_ox_ref[...]
            oy = s_oy_ref[...]
            oz = s_oz_ref[...]
            dx = s_dx_ref[...]
            dy = s_dy_ref[...]
            dz = s_dz_ref[...]
            if phases == 2:
                # waiting lanes are parked FOR THE INTERSECT ONLY (t =
                # +inf for them keeps segment_body's hit mask false);
                # segment_body still sees their real state and blends it
                # through unchanged
                pf = jnp.where(part, zero_f + 1.0, zero_f)
                iox, ioy, ioz, idx, idy, idz = park_blend(
                    pf, 1.0 - pf, ox, oy, oz, dx, dy, dz
                )
            else:
                iox, ioy, ioz, idx, idy, idz = ox, oy, oz, dx, dy, dz
            if stub_intersect:
                t, code = zero_f + 2.0, zero_f
            else:
                t, code = intersect(iox, ioy, ioz, idx, idy, idz)
                if dup_intersect:
                    # profiling knob: run intersect a second time on inputs
                    # the compiler cannot prove equal, fold the result in a
                    # way that cannot change t (t2 + 1e30 >= any real t);
                    # frame-time delta vs the baseline = pure intersect cost
                    t2, _ = intersect(
                        iox + np.float32(1e-30), ioy, ioz, idx, idy, idz
                    )
                    t = jnp.minimum(t, t2 + np.float32(1e30))
            any_hit = jnp.any(jnp.isfinite(t))

            # ---- full path: at least one lane hit geometry ----
            @pl.when(any_hit)
            def _():
                out = segment_body(
                    s_st_ref[...], ox, oy, oz, dx, dy, dz,
                    s_ir_ref[...], s_ig_ref[...], s_ib_ref[...],
                    s_cr_ref[...], s_cg_ref[...], s_cb_ref[...],
                    s_bc_ref[...], part, t, code,
                )
                (st2, ox2, oy2, oz2, dx2, dy2, dz2,
                 inc_r, inc_g, inc_b, col_r2, col_g2, col_b2, died) = out
                s_st_ref[...] = st2
                s_ox_ref[...] = ox2
                s_oy_ref[...] = oy2
                s_oz_ref[...] = oz2
                s_dx_ref[...] = dx2
                s_dy_ref[...] = dy2
                s_dz_ref[...] = dz2
                s_cr_ref[...] = col_r2
                s_cg_ref[...] = col_g2
                s_cb_ref[...] = col_b2
                s_bc_ref[...] = s_bc_ref[...] + jnp.where(
                    part, zero_i + 1, zero_i
                )
                # bank completed samples' light; keep in-flight inc
                df = jnp.where(died, zero_f + 1.0, zero_f)
                kf = 1.0 - df
                s_tr_ref[...] = s_tr_ref[...] + inc_r * df
                s_tg_ref[...] = s_tg_ref[...] + inc_g * df
                s_tb_ref[...] = s_tb_ref[...] + inc_b * df
                s_ir_ref[...] = inc_r * kf
                s_ig_ref[...] = inc_g * kf
                s_ib_ref[...] = inc_b * kf
                s_ns_ref[...] = s_ns_ref[...] + jnp.where(
                    died, zero_i + 1, zero_i
                )

            # ---- lean path: EVERY lane missed (sky tiles, drained tails)
            # - no scatter draws happen (parity: the reference only draws
            # inside the didHit branch), every live sample terminates on
            # the environment, so fetch + shading are skipped outright.
            @pl.when(jnp.logical_not(any_hit))
            def _():
                er, eg, eb = environment(dx, dy, dz)
                lf = jnp.where(part, zero_f + 1.0, zero_f)
                # env term masked by participation: phase-waiting lanes
                # carry live throughput and must NOT absorb sky light
                # (the old unmasked form was safe only because every
                # non-participant had zero colour)
                inc_r = s_ir_ref[...] + er * s_cr_ref[...] * lf
                inc_g = s_ig_ref[...] + eg * s_cg_ref[...] * lf
                inc_b = s_ib_ref[...] + eb * s_cb_ref[...] * lf
                s_tr_ref[...] = s_tr_ref[...] + inc_r * lf
                s_tg_ref[...] = s_tg_ref[...] + inc_g * lf
                s_tb_ref[...] = s_tb_ref[...] + inc_b * lf
                kf = 1.0 - lf
                s_ir_ref[...] = inc_r * kf
                s_ig_ref[...] = inc_g * kf
                s_ib_ref[...] = inc_b * kf
                s_ns_ref[...] = s_ns_ref[...] + jnp.where(
                    part, zero_i + 1, zero_i
                )
                # participants terminated on the environment: zero + park
                # them; waiting lanes (phase-split) blend through
                s_cr_ref[...] = s_cr_ref[...] * kf
                s_cg_ref[...] = s_cg_ref[...] * kf
                s_cb_ref[...] = s_cb_ref[...] * kf
                (s_ox_ref[...], s_oy_ref[...], s_oz_ref[...],
                 s_dx_ref[...], s_dy_ref[...], s_dz_ref[...]) = park_blend(
                    kf, lf, ox, oy, oz, dx, dy, dz
                )

        return carry

    lax.fori_loop(
        0, ppl * n_frames * spp * (max_bounce + 1) * phases, slot_body,
        jnp.int32(0),
    )

    if adaptive:
        # per-pixel mean over the samples that actually completed in the
        # LAST batched frame (>= spp; every lane reaches its quota within
        # the slot bound; refill extras all land in the last frame of the
        # lane's last pixel)
        nsf_last = s_ns_ref[...] - (n_frames - 1) * spp
        inv_n = 1.0 / jnp.maximum(
            nsf_last.astype(jnp.float32), np.float32(1.0)
        )
    else:
        inv_n = np.float32(1.0 / spp)
    # bank the final pixel's final frame (earlier frames folded at their
    # completion; earlier pixels banked at their switch). Every lane sits
    # at phase ppl-1 here - the slot bound covers all pixels' quotas.
    all_lanes = zero_i < 1
    ph_end = s_ph_ref[...] if ppl > 1 else None
    wl = (zero_f + fp_ref[_W0 + n_frames - 1]) if with_accum else None
    bank_out(
        all_lanes, ph_end,
        s_tr_ref[...] * inv_n,
        s_tg_ref[...] * inv_n,
        s_tb_ref[...] * inv_n, wl,
    )
    if ppl > 1:
        bank_segs(all_lanes, ph_end)
    else:
        out_segs_ref[:] = s_segs_ref[...]


# ------------------------------- launcher -----------------------------------


# number of (ROWS, LANES) per-lane state scratch buffers the kernel
# allocates (best enc/clu, rng, ray state, light/throughput, counters -
# keep in sync with _render_frame_mega_ts's scratch_shapes)
_N_LANE_STATE = 23
# Hardware-calibrated (round 4): launches whose estimate reached
# 17.86 MB (Balls Outdoors K=8 batched+paired at TS=192, 678 Mrays/s)
# and 18.58 MB (RTIOW parity K=32 paired at TS=224) both compile and
# run on v5e - the old 15 MB guess silently pushed the Balls bench to
# the ~30x-slower XLA path. 19 MB sits just above the largest PROVEN
# launch; beyond it we still refuse rather than risk a compile-time
# scoped-vmem OOM (one un-estimated oversized compile wedged the
# round-3 tunnel for ~8h).
_VMEM_BUDGET = 19 * 1024 * 1024


def mega_vmem_estimate(
    scene: Scene,
    cfg: RenderConfig,
    batched: bool = False,
    paired: bool = False,
) -> dict | None:
    """Estimated VMEM footprint (bytes) of the megakernel launch for this
    scene at the tile size the launcher would pick, mirroring
    _render_frame_mega_ts's actual allocation: resident tables + per-lane
    state + fetch scratch + the per-tile output blocks. ``batched``/
    ``paired`` describe a render_frames_mega launch (K-frame fold and/or
    cost-guided lane pairing): they move the tile size the launcher picks
    (128/192 vs 96) AND add per-tile input blocks the single-frame launch
    does not carry (3 accumulator blocks + the pperm block), so the
    single-frame estimate can under-count a marginal scene whose batched
    launch then blows VMEM at compile time (ADVICE round 3). None if the
    scene was never packed."""
    p = scene.packed
    if p is None:
        return None
    table_bytes = (
        p.sph_sub_cols.size
        + p.tri_sub_cols.size
        + p.sph_sub_bounds.size
        + p.tri_sub_bounds.size
        + p.sph_attr.size
        + p.tri_attr.size
        + p.fetch_tab2.size
    ) * 4
    ts = tile_size(
        p, cfg.adaptive_spp, batched=batched, paired=paired,
        override=cfg.mega_tile_size,
    )
    tile = ts * ts
    lane_state = _N_LANE_STATE * tile * 4
    # per-tile output blocks (r/g/b/segs + hist), double-buffered by the
    # pipeline
    hist_rows = -(-(cfg.max_bounce + 1) // 8) * 8
    rows = tile // LANES
    out_bytes = 2 * (4 * tile + hist_rows * LANES) * 4
    if batched:
        # K-frame batched inputs: accum-in r/g/b blocks (ROWS, 128) each,
        # double-buffered by the pipeline like the outputs
        out_bytes += 2 * 3 * tile * 4
    if paired:
        # lane->pixel permutation block (ROWS, 128) i32, double-buffered
        out_bytes += 2 * tile * 4
    if p.fetch_mode == "winner":
        nwf = p.sph_attr.shape[-1]
        fetch_scratch = (SUB + 16 + nwf) * tile * 4 + (128 + 1) * LANES * 4
    else:
        # one-hot two-level fetch: gb shrunk exactly like the launcher
        n_fc = p.fetch_tab.shape[1] // 128
        nf = p.fetch_tab2.shape[0] // n_fc
        gb = rows
        while gb > 1 and n_fc * nf * gb * LANES * 4 > 4 * 1024 * 1024:
            gb //= 2
        nwf = p.sph_attr.shape[-1]
        fetch_scratch = (
            (128 + n_fc * nf) * gb * LANES * 4  # oh + bfet
            + (SUB + 16 + nwf) * LANES * 4  # token winner scratch
        )
    _rd = rowdrain_cull(cfg.mega_rowdrain)
    if p.n_tri_supers > 1 and (
        _rd > 0 if _rd is not None
        else p.n_tri_subs >= ROWDRAIN_MIN_SUBS
    ):
        # rowdrain per-row need-count scratch (RS, 128) f32; the
        # bitmask words live in SMEM and do not count against VMEM
        fetch_scratch += rows * LANES * 4
    return {
        "tables": table_bytes,
        "lane_state": lane_state,
        "fetch_scratch": fetch_scratch,
        "outputs": out_bytes,
        "total": table_bytes + lane_state + fetch_scratch + out_bytes,
        "budget": _VMEM_BUDGET,
        "tile_size": ts,
    }


def mega_supported(
    scene: Scene,
    cfg: RenderConfig,
    batched: bool = False,
    paired: bool = False,
) -> bool:
    """Whether the megakernel can run this scene: every resident table and
    scratch buffer must fit the ~16 MB/core VMEM with headroom. The
    two-level fetch made the old 4096-slot cap obsolete (one-hot cost no
    longer scales with n_slots); the binding constraints are table bytes
    and scratch at the launch tile size. A rejection warns loudly with the
    byte breakdown - the XLA BVH fallback is ~30x slower on 70k-tri
    scenes, and silence made that cliff invisible (VERDICT round 2)."""
    est = mega_vmem_estimate(scene, cfg, batched=batched, paired=paired)
    if est is None:
        return False
    if est["total"] <= est["budget"]:
        return True
    import warnings

    warnings.warn(
        "megakernel rejected: estimated VMEM "
        f"{est['total'] / 1e6:.1f} MB > budget {est['budget'] / 1e6:.1f} MB "
        f"(tables {est['tables'] / 1e6:.1f}, lane state "
        f"{est['lane_state'] / 1e6:.1f}, fetch scratch "
        f"{est['fetch_scratch'] / 1e6:.1f} MB at tile {est['tile_size']}); "
        "falling back to the XLA path (~30x slower on large meshes). "
        "Smaller RTX_MEGA_TS may fit.",
        stacklevel=2,
    )
    return False


def render_frame_mega(
    scene: Scene,
    camera,
    cfg: RenderConfig,
    frame,
    interpret: bool = False,
    use_cull: bool = True,
    stub_fetch: bool = False,
    stub_intersect: bool = False,
    dup_intersect: bool = False,
    dup_fetch: bool = False,
    y0=0,
    band_height: int | None = None,
    collect_stats: bool = False,
    segs_map: bool = False,
):
    """Full-frame render via the megakernel.

    Returns ((H, W, 3) f32, total live ray segments uint32). Bit-compatible
    RNG layout with the XLA path (same seeds, same draw order); output
    differs only by <=1-ulp RandomValue rounding (module docstring).

    Thin wrapper: resolves the tile-size / phase env knobs OUTSIDE this
    function's jit and passes them as static args, so direct callers
    (bench, perf tools) can change them between calls without hitting a
    stale cache. The public render_frame* wrappers are themselves
    jitted, so THROUGH THEM a knob change after the first trace does
    not take effect (see n_phases docstring).
    """
    return _render_frame_mega_ts(
        scene, camera, cfg, frame,
        tile_size(
            scene.packed, cfg.adaptive_spp, override=cfg.mega_tile_size
        ),
        n_phases(cfg.mega_phases), interpret,
        use_cull, stub_fetch, stub_intersect, dup_intersect, dup_fetch,
        y0, band_height, collect_stats,
        None, 1,
        pixels_per_lane(
            cfg.adaptive_spp, override=cfg.mega_pixels_per_lane
        ),
        segs_map,
        perlane=perlane_cull(),
        rowdrain=rowdrain_cull(cfg.mega_rowdrain),
    )


def render_frames_mega(
    scene: Scene,
    camera,
    cfg: RenderConfig,
    frame0,
    accum,
    n_frames: int,
    interpret: bool = False,
    y0=0,
    band_height: int | None = None,
    segs_map: bool = False,
    pair_costs=None,
    band_local_io: bool = False,
):
    """Render ``n_frames`` consecutive frames in ONE kernel launch and fold
    them into the running average ``accum`` ((H, W, 3) f32).

    Returns (accum', total live ray segments uint32). Matches the
    sequential loop ``for k: accumulate(prev, render_frame_mega(frame0+k),
    frame0+k, cfg.clamp_accumulate)`` sample-for-sample (same RNG streams,
    same segment count; the fold itself can differ by 1 ulp per step from
    compiler mul+add contraction) - frames are independently seeded
    (pix + frame*719393, RayTracing.shader:358-362), so a lane that
    finishes its spp quota starts the NEXT frame's samples immediately
    instead of idling until the tile's slowest lane catches up. Parity
    (exact-spp) renders are max-lane-bound per tile; batching K frames
    shrinks the per-lane total-work spread by ~sqrt(K), lifting live-lane
    occupancy (the measured round-2 parity bottleneck: 58%).

    The per-frame fold uses ops/accumulate.py's exact expression with
    weights 1/(frame0+k+1) precomputed OUTSIDE the kernel by the same XLA
    divide; cfg.clamp_accumulate selects the reference's saturate
    (Accumulate.shader:48-50) vs HDR accumulation. In adaptive_spp mode
    refill extras all land in the final batched frame.

    ``pair_costs``: optional (H, W) per-pixel cost map (the ``segs_map``
    output of a previous launch). Switches the multi-pixel-lane pairing
    from blind vertical halves to cost-sorted within each tile (heavy
    pixels share lanes with light ones), raising parity occupancy from
    ~74% to ~80-89% (tools/pairing_sim.py) - the rendered image is
    BIT-IDENTICAL for any cost map, only the lane schedule (and the
    TS/ppl defaults: 192/4 vs 128/2) changes. ``segs_map``: additionally
    return the (H, W) int32 per-pixel segment counts - the cost signal
    to chain into the next launch.
    """
    paired = pair_costs is not None
    return _render_frame_mega_ts(
        scene, camera, cfg, frame0,
        tile_size(
            scene.packed, cfg.adaptive_spp, batched=n_frames > 1,
            paired=paired, override=cfg.mega_tile_size,
        ),
        n_phases(cfg.mega_phases), interpret,
        True, False, False, False, False,
        y0, band_height, False, accum, n_frames,
        pixels_per_lane(
            cfg.adaptive_spp, batched=n_frames > 1, paired=paired,
            override=cfg.mega_pixels_per_lane,
        ),
        segs_map, pair_costs, perlane=perlane_cull(),
        rowdrain=rowdrain_cull(cfg.mega_rowdrain),
        band_local_io=band_local_io,
    )


def _debruijn_ranks() -> np.ndarray:
    """32-entry ctz table: rank[(2^r * _DEBRUIJN) >>> 27] = r.

    The per-lane cull drain composes this with the front-to-back sub
    permutation (sperm[rank[...]]) so the kernel's scalar pop resolves
    an isolated need bit to a cluster index with a single SMEM load."""
    idx = (
        (np.uint32(1) << np.arange(32, dtype=np.uint32))
        * np.uint32(0x077CB531)
    ) >> np.uint32(27)
    rank = np.zeros(32, np.int32)
    rank[idx.astype(np.int64)] = np.arange(32, dtype=np.int32)
    return rank


@functools.partial(jax.jit, static_argnames=("cfg", "ts", "phases", "interpret", "use_cull", "stub_fetch", "stub_intersect", "dup_intersect", "dup_fetch", "band_height", "collect_stats", "n_frames", "ppl", "segs_map", "perlane", "rowdrain", "band_local_io"))
def _render_frame_mega_ts(
    scene: Scene,
    camera,
    cfg: RenderConfig,
    frame,
    ts: int,
    phases: int = 1,
    interpret: bool = False,
    use_cull: bool = True,
    stub_fetch: bool = False,
    stub_intersect: bool = False,
    dup_intersect: bool = False,
    dup_fetch: bool = False,
    y0=0,
    band_height: int | None = None,
    collect_stats: bool = False,
    accum=None,
    n_frames: int = 1,
    ppl: int = 1,
    segs_map: bool = False,
    pair_costs=None,
    perlane: bool = False,
    rowdrain: int | None = None,
    band_local_io: bool = False,
):
    import math as _math

    with_accum = accum is not None
    if n_frames > 1 and not with_accum:
        raise ValueError("n_frames > 1 requires an accumulator image")

    p = scene.packed
    if p.sub != SUB:
        raise ValueError(
            f"scene was packed with SUB={p.sub} but the kernel compiled "
            f"with SUB={SUB} (RTX_MEGA_SUB changed after this scene was "
            "packed?) - re-pack the scene under the current setting"
        )
    TS = ts
    ROWS = (TS * TS) // LANES
    if ROWS % ppl != 0:
        raise ValueError(
            f"pixels-per-lane {ppl} must divide the tile's {ROWS} rows"
        )
    n_pix = cfg.num_pixels
    n_tx = -(-cfg.width // TS)
    # band rendering: this launch covers rows [y0, y0 + band_height)
    bh = band_height if band_height is not None else cfg.height
    n_ty = -(-bh // TS)
    n_tiles = n_tx * n_ty

    half_fov = camera.fov_y_deg * np.float32(_math.pi / 360.0)
    plane_h = camera.focus_distance * jnp.tan(half_fov) * 2.0
    plane_w = plane_h * np.float32(cfg.width / cfg.height)
    env = scene.env
    fparams = jnp.concatenate(
        [
            camera.position,
            camera.rotation.reshape(-1),
            jnp.stack(
                [
                    plane_w,
                    plane_h,
                    camera.focus_distance,
                    camera.defocus_strength / cfg.width,
                    camera.diverge_strength / cfg.width,
                    env.enabled,
                ]
            ),
            env.ground_colour,
            env.sky_colour_horizon,
            env.sky_colour_zenith,
            jnp.stack([env.sun_focus, env.sun_intensity]),
            env.sun_dir,
            jnp.zeros((4,), jnp.float32),
            # per-frame accumulate weights for the K-frame batch (_W0..):
            # computed here with the same XLA divide ops/accumulate.py
            # uses, so the in-kernel fold is bit-identical to sequential
            # accumulation
            1.0
            / (
                jnp.asarray(frame, jnp.float32)
                + 1.0
                + jnp.arange(n_frames, dtype=jnp.float32)
            ),
        ]
    ).astype(jnp.float32)
    iparams = jnp.stack(
        [jnp.asarray(frame, jnp.int32), jnp.int32(n_pix),
         jnp.asarray(y0, jnp.int32)]
    )
    # Front-to-back cluster visit order for this camera (argsort of
    # point-to-AABB distance; traced, so camera motion does not
    # recompile). Box distance, not center distance: a huge cluster the
    # camera sits inside (the RTIOW ground sphere) has distance 0 and is
    # visited FIRST, so its hit tightens best_t before the small clusters
    # are tested - center distance sorted it last and the t-bound cull
    # never fired. Padding clusters have zero boxes at the origin - they
    # sort wherever, their primitives never hit.
    def _boxdist2(bounds):
        p = camera.position[None, :]
        q = jnp.clip(p, bounds[:, 0:3], bounds[:, 3:6])
        return jnp.sum((q - p) ** 2, axis=1)

    def _f2b(bounds):
        return jnp.argsort(_boxdist2(bounds)).astype(jnp.int32)

    def _f2b_within(bounds, n_sup):
        # front-to-back order of subs WITHIN each super block, so the
        # hierarchical gate stays valid (a super only dispatches its own
        # 32 storage-contiguous subs)
        d2 = _boxdist2(bounds)
        idx = jnp.argsort(d2.reshape(n_sup, SUPER), axis=1).astype(jnp.int32)
        base = (jnp.arange(n_sup, dtype=jnp.int32) * SUPER)[:, None]
        return (idx + base).reshape(-1)

    if p.n_sphere_supers > 1:
        sperm = _f2b_within(p.sph_sub_bounds, p.n_sphere_supers)
    else:
        # hoisted spheres (trailing subs past n_sphere_subs_visit) are
        # tested from SMEM params, not the cluster loop
        sperm = _f2b(p.sph_sub_bounds[: max(p.n_sphere_subs_visit, 1)])
    perlane_sph_ok = (
        perlane > 0
        and use_cull
        and p.n_sphere_supers <= 1
        and 2 <= p.n_sphere_subs_visit <= 31
    )
    perlane_tri_ok = (
        perlane > 0
        and use_cull
        and "tris" in p.features
        and p.n_tri_supers <= 1
        and 2 <= p.n_tri_subs <= 31
    )
    use_perlane = perlane_sph_ok or perlane_tri_ok
    perlane_mode = perlane if use_perlane else 0
    use_rowdrain = (
        (
            rowdrain > 0
            if rowdrain is not None
            else p.n_tri_subs >= ROWDRAIN_MIN_SUBS
        )
        and use_cull
        and "tris" in p.features
        and p.n_tri_supers > 1
    )
    if perlane_sph_ok:
        # drain-loop ctz table, composed with the f2b order: slot
        # nss_visit + j maps De Bruijn index j to its cluster. Ranks
        # beyond the visit count never arise (those bits are never set);
        # clamping keeps the take in range. Index 0 doubles as the
        # drained-row (bits == 0) alias - rank 0, the nearest cluster.
        ranks = np.minimum(_debruijn_ranks(), p.n_sphere_subs_visit - 1)
        sperm = jnp.concatenate([sperm, sperm[jnp.asarray(ranks)]])
    sperm_sup = _f2b(p.sph_super_bounds)
    if use_rowdrain:
        # 1-level per-row drain: GLOBAL front-to-back rank order over
        # every (padded) sub - padding boxes are inverted (pack._supers)
        # so their distance is huge and they sort last; their need bits
        # never set. The 32-entry De Bruijn ctz table rides at offset
        # NTP for the drain's summary-word and word pops.
        tperm = jnp.concatenate([
            _f2b(p.tri_sub_bounds),
            jnp.asarray(_debruijn_ranks()),
        ])
    elif p.n_tri_supers > 1:
        tperm = _f2b_within(p.tri_sub_bounds, p.n_tri_supers)
    else:
        tperm = _f2b(p.tri_sub_bounds[: max(p.n_tri_subs, 1)])
    tperm_sup = _f2b(p.tri_super_bounds)
    if perlane_tri_ok:
        ranks_t = np.minimum(_debruijn_ranks(), p.n_tri_subs - 1)
        tperm = jnp.concatenate([tperm, tperm[jnp.asarray(ranks_t)]])

    # ---- cost-guided lane pairing (multi-pixel lanes) ----
    # pair_costs: (H, W) per-pixel cost signal (segment counts from a
    # previous launch, see segs_map). Within each tile - the pixel SET
    # per tile must not change, or the cluster culls lose locality
    # (measured: cross-tile pools are also occupancy-NEGATIVE, because a
    # heavy tile's max pair then stalls several tiles' worth of lanes,
    # tools/pairing_sim.py) - pixels are cost-sorted and phase blocks
    # alternate direction, so each lane's ppl pixels sum to ~the tile
    # mean. Built in XLA from a device-resident cost map: the
    # progressive loop chains launch N's segs map into launch N+1's
    # pairing with no host round-trip.
    use_pperm = pair_costs is not None and ppl > 1
    RS_pp = ROWS // ppl
    if use_pperm:
        if band_local_io:
            # multi-chip shard: pair_costs is THIS band's
            # (band_height, W) slice - rows are already band-local
            # (band_height is TS-aligned, so all n_ty*TS rows exist);
            # y0 still seeds the kernel's GLOBAL pixel ids
            ysc = jnp.arange(n_ty * TS)
        else:
            ysc = jnp.minimum(
                jnp.asarray(y0, jnp.int32) + jnp.arange(n_ty * TS),
                cfg.height - 1,
            )
        xsc = jnp.minimum(jnp.arange(n_tx * TS), cfg.width - 1)
        cost_t = (
            pair_costs[ysc][:, xsc]
            .reshape(n_ty, TS, n_tx, TS)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, TS * TS)
        )
        order = jnp.argsort(-cost_t.astype(jnp.float32), axis=1).astype(
            jnp.int32
        )
        npl = RS_pp * LANES
        blocks = []
        for pph in range(ppl):
            blk = order[:, pph * npl : (pph + 1) * npl]
            blocks.append(blk if pph % 2 == 0 else blk[:, ::-1])
        pperm_flat = jnp.concatenate(blocks, axis=1)
        pperm_inv = jnp.argsort(pperm_flat, axis=1)
        pperm_in = pperm_flat.reshape(n_tiles * ROWS, LANES)
    else:
        pperm_in = jnp.zeros((1, LANES), jnp.int32)

    # fetch batch width: as many ray rows per MXU dot as keep the batched
    # dot result under ~4 MB of VMEM (big-slot scenes chunk the batch).
    # Winner mode never runs the one-hot fetch - its scratch shrinks to
    # token size (gb = 1).
    n_fc_l = p.fetch_tab.shape[1] // 128
    nf_l = p.fetch_tab2.shape[0] // n_fc_l
    RS = ROWS // ppl  # per-lane state rows (multi-pixel lanes)
    gb = 1 if p.fetch_mode == "winner" else RS
    while gb > 1 and n_fc_l * nf_l * gb * LANES * 4 > 4 * 1024 * 1024:
        gb //= 2
    nwf = p.sph_attr.shape[-1]

    hist_rows = -(-(cfg.max_bounce + 1) // 8) * 8

    kernel = functools.partial(
        _render_kernel,
        spp=cfg.spp,
        gb=gb,
        hist_rows=hist_rows,
        n_frames=n_frames,
        with_accum=with_accum,
        clamp_accum=cfg.clamp_accumulate,
        ppl=ppl,
        use_pperm=use_pperm,
        adaptive=cfg.adaptive_spp,
        fast_scatter=cfg.fast_scatter,
        phases=phases,
        collect_stats=collect_stats,
        fetch_fields=p.fetch_fields,
        attr_fields=p.attr_fields,
        fetch_mode=p.fetch_mode,
        ts=TS,
        nf=nf_l,
        max_bounce=cfg.max_bounce,
        width=cfg.width,
        height=cfg.height,
        nss=p.n_sphere_subs,
        nss_visit=p.n_sphere_subs_visit,
        n_hoist=p.n_hoist,
        nst=p.n_tri_subs,
        n_sph_supers=p.n_sphere_supers,
        n_tri_supers=p.n_tri_supers,
        n_slots=p.fetch_tab.shape[1],
        features=p.features,
        use_cull=use_cull,
        stub_fetch=stub_fetch,
        stub_intersect=stub_intersect,
        dup_intersect=dup_intersect,
        dup_fetch=dup_fetch,
        perlane=perlane_mode,
        rowdrain=use_rowdrain,
    )
    full = lambda a: pl.BlockSpec(
        a.shape,
        lambda i, ip, sp, sps, tp, tps, fp, hp: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (ROWS, LANES), lambda i, ip, sp, sps, tp, tps, fp, hp: (i, 0),
        memory_space=pltpu.VMEM,
    )
    if use_pperm:
        pperm_spec = [out_spec]
    else:
        pperm_spec = [
            pl.BlockSpec(
                (1, LANES),
                lambda i, ip, sp, sps, tp, tps, fp, hp: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    if with_accum:
        # accumulator input in the kernel's tile-block layout, built with
        # the kernel's exact pixel mapping (edge tiles clamp to the image,
        # bands index the FULL accumulator so inter-band clamp overlap
        # reads real rows)
        if band_local_io:
            # multi-chip shard: accum is THIS band's (band_height, W, 3)
            # slice (all n_ty*TS rows exist; rows past the image height
            # in the LAST band fold garbage that the gather crops)
            ys = jnp.arange(n_ty * TS)
        else:
            ys = jnp.minimum(
                jnp.asarray(y0, jnp.int32) + jnp.arange(n_ty * TS),
                cfg.height - 1,
            )
        xs = jnp.minimum(jnp.arange(n_tx * TS), cfg.width - 1)
        acc_g_full = accum[ys][:, xs]  # (n_ty*TS, n_tx*TS, 3)
        acc_tiled = (
            acc_g_full.reshape(n_ty, TS, n_tx, TS, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n_tiles * ROWS, LANES, 3)
        )
        if use_pperm:
            # each lane reads ITS pixel's running average: permute the
            # accumulator blocks with the same lane->pixel map
            acc_tiled = jnp.take_along_axis(
                acc_tiled.reshape(n_tiles, ROWS * LANES, 3),
                pperm_flat[..., None],
                axis=1,
            ).reshape(n_tiles * ROWS, LANES, 3)
        acc_in = [acc_tiled[..., 0], acc_tiled[..., 1], acc_tiled[..., 2]]
        acc_spec = [out_spec] * 3
    else:
        acc_in = [jnp.zeros((1, LANES), jnp.float32)] * 3
        acc_spec = [
            pl.BlockSpec(
                (1, LANES),
                lambda i, ip, sp, sps, tp, tps, fp, hp: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_tiles,),
        in_specs=[
            full(p.sph_sub_bounds),
            full(p.sph_super_bounds),
            full(p.sph_sub_cols),
            full(p.tri_sub_bounds),
            full(p.tri_super_bounds),
            full(p.tri_sub_cols),
            full(p.fetch_tab2),
            full(p.sph_attr),
            full(p.tri_attr),
        ] + pperm_spec + acc_spec,
        out_specs=[
            out_spec, out_spec, out_spec, out_spec,
            pl.BlockSpec(
                (hist_rows, LANES),
                lambda i, ip, sp, sps, tp, tps, fp, hp: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((RS, LANES), jnp.float32),  # best enc (t | sub)
            pltpu.VMEM((RS, LANES), jnp.float32),  # best cluster base
            pltpu.VMEM((RS, LANES), jnp.uint32),  # rng state
        ] + [pltpu.VMEM((RS, LANES), jnp.float32)] * 12 + [
            pltpu.VMEM((RS, LANES), jnp.int32),  # segs
        ] + [pltpu.VMEM((RS, LANES), jnp.float32)] * 3 + [
            pltpu.VMEM((RS, LANES), jnp.int32),  # samples done
            pltpu.VMEM((RS, LANES), jnp.int32),  # bounce index
            pltpu.VMEM((RS, LANES), jnp.int32),  # batch frame index
            pltpu.VMEM((RS, LANES), jnp.int32),  # pixel phase (ppl)
            pltpu.VMEM((128, gb * LANES), jnp.float32),  # one-hot batch
            pltpu.VMEM(
                (n_fc_l * nf_l, gb * LANES), jnp.float32
            ),  # fetch dot result
            # winner-fetch scratch (token-sized in onehot mode)
            pltpu.VMEM(
                (SUB, (RS if p.fetch_mode == "winner" else 1) * LANES),
                jnp.float32,
            ),  # winner one-hot
            pltpu.VMEM(
                (16, (RS if p.fetch_mode == "winner" else 1) * LANES),
                jnp.float32,
            ),  # winner geometry acc
            pltpu.VMEM(
                (nwf, (RS if p.fetch_mode == "winner" else 1) * LANES),
                jnp.float32,
            ),  # winner attr acc
            # per-row need bitmasks: perlane drain (RS,) / rowdrain
            # (RS * W,) word array; second ref holds perlane mode-2
            # popped bits (RS,) / rowdrain summary words (RS * SW,);
            # token-sized when both are off
            pltpu.SMEM((
                RS * p.n_tri_supers if use_rowdrain
                else (RS if use_perlane else 1),
            ), jnp.int32),
            pltpu.SMEM((
                RS * -(-p.n_tri_supers // 32) if use_rowdrain
                else (RS if perlane_mode >= 2 else 1),
            ), jnp.int32),
            # rowdrain per-row need counts (column 0)
            pltpu.VMEM(
                (RS if use_rowdrain else 1, LANES), jnp.float32
            ),
        ],
    )
    r, g, b, segs, hist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * hist_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(iparams, sperm, sperm_sup, tperm, tperm_sup, fparams, p.hoist_params,
      p.sph_sub_bounds, p.sph_super_bounds, p.sph_sub_cols,
      p.tri_sub_bounds, p.tri_super_bounds, p.tri_sub_cols, p.fetch_tab2,
      p.sph_attr, p.tri_attr, pperm_in, *acc_in)

    def untile(a):
        """(n_tiles * ROWS, LANES) tile-local order -> (bh, W) band crop."""
        if use_pperm:
            # outputs are in lane order; gather back to pixel order with
            # the inverse permutation before untiling
            a = jnp.take_along_axis(
                a.reshape(n_tiles, ROWS * LANES), pperm_inv, axis=1
            ).reshape(n_tiles * ROWS, LANES)
        a = a.reshape(n_ty, n_tx, TS, TS)  # [ty, tx, ly, lx]
        a = a.transpose(0, 2, 1, 3).reshape(n_ty * TS, n_tx * TS)
        return a[:bh, : cfg.width]

    img = jnp.stack([untile(r), untile(g), untile(b)], axis=-1)
    # edge tiles re-render clamped border pixels; the untile crop drops
    # them from both the image and the segment count. Bands whose rows
    # extend past the image (band_height rounds up to TS) are masked too.
    row_valid = (jnp.arange(bh) + jnp.asarray(y0, jnp.int32)) < cfg.height
    segs_total = jnp.sum(
        jnp.where(row_valid[:, None], untile(segs), 0), dtype=jnp.uint32
    )
    if collect_stats:
        # full hist_rows returned: rows [0, max_bounce] are the bounce
        # histogram; the TOP rows carry cull diagnostics when spare (see
        # count_visits in the kernel). render.py slices the public part.
        counts = jnp.sum(
            hist.reshape(n_tiles, hist_rows, LANES), axis=(0, 2)
        )
        return img, segs_total, counts
    if segs_map:
        # per-pixel segment counts ((bh, W) int32): the per-lane slot
        # participation totals in image order - the cost signal for
        # cost-guided lane pairing (tools/pairing_sim.py; pack.pair_perm)
        return img, segs_total, untile(segs)
    return img, segs_total
