"""Frame rendering driver: the TPU analog of RayTracingManager.OnRenderImage.

The reference launches one fragment thread per pixel (Graphics.Blit,
RayTracingManager.cs:76) then averages frames (accumulate pass, :79-81). Here
a frame render is a single jitted program: pixels are flattened, padded to a
lane-aligned block size, and processed as dense (block,) batches - each block
runs the spp loop (sequential, because the reference threads ONE RNG state
through all of a pixel's samples, RayTracing.shader:374-385) around the
masked bounce loop (ops/trace.py). Blocks are mapped with ``lax.map`` to
bound the (rays x primitives) intermediate footprint; multi-chip sharding
splits the same block axis across devices (parallel/sharding.py) with zero
hot-loop collectives.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .models.geometry import Scene
from .ops import rng as rng_ops
from .ops.accumulate import accumulate
from .ops.camera import Camera, focus_points, generate_rays
from .ops.intersect import HitRecord
from .ops.trace import trace
from .utils.config import RenderConfig


def _resolve_intersector(
    scene: Scene, cfg: RenderConfig
) -> Callable[..., HitRecord] | None:
    if cfg.intersector == "auto":
        if scene.tri_bvh is not None or scene.sphere_bvh is not None:
            from .accel.bvh import closest_hit_bvh

            return closest_hit_bvh
        return None  # trace() defaults to brute force
    if cfg.intersector == "mega":
        return None  # handled at frame level, not per-bounce
    if cfg.intersector == "bruteforce":
        return None
    if cfg.intersector == "bvh":
        from .accel.bvh import closest_hit_bvh

        return closest_hit_bvh
    raise ValueError(f"unknown intersector {cfg.intersector!r}")


def render_block(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    frame,
    pix_idx,
    intersect_fn=None,
    with_bounce_counts: bool = False,
):
    """Render one flat block of pixels -> (B, 3) linear radiance.

    ``pix_idx`` is (B,) int32 global pixel index (y * width + x, row 0 at the
    bottom). Out-of-range padding indices are rendered (their rays are valid,
    just redundant) and discarded by the caller - cheaper than masking inside
    the hot loop.
    """
    width = cfg.width
    pix_idx = pix_idx.astype(jnp.int32)
    x = pix_idx % width
    y = pix_idx // width
    state = rng_ops.seed(pix_idx, frame)
    fp = focus_points(camera, x, y, width, cfg.height)

    def spp_body(_, carry):
        state, total, segs, counts = carry
        state, origin, direction = generate_rays(state, camera, fp, width)
        out = trace(
            state,
            origin,
            direction,
            scene,
            cfg.max_bounce,
            intersect_fn=intersect_fn,
            with_bounce_counts=with_bounce_counts,
        )
        if with_bounce_counts:
            state, light, s, c = out
            counts = counts + c
        else:
            state, light, s = out
        return state, total + light, segs + s, counts

    init = (
        state,
        jnp.zeros((pix_idx.shape[0], 3), jnp.float32),
        jnp.zeros((pix_idx.shape[0],), jnp.int32),
        jnp.zeros((cfg.max_bounce + 1,), jnp.int32),
    )
    _, total, segs, counts = lax.fori_loop(0, cfg.spp, spp_body, init)
    if with_bounce_counts:
        return total / jnp.float32(cfg.spp), segs, counts
    return total / jnp.float32(cfg.spp), segs


def _padded_pixel_blocks(cfg: RenderConfig):
    """Static (nb, block) pixel-index grid covering the padded image."""
    import numpy as np

    n = cfg.num_pixels
    block = min(cfg.block_size, _round_up(n, 256))
    n_pad = _round_up(n, block)
    idx = np.arange(n_pad, dtype=np.int32)
    # Clamp padding lanes to the last real pixel: valid geometry, discarded.
    idx = np.minimum(idx, n - 1)
    return idx.reshape(n_pad // block, block)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _use_megakernel(
    scene: Scene,
    cfg: RenderConfig,
    batched: bool = False,
    paired: bool = False,
) -> bool:
    """The fused Pallas megakernel handles whole frames on TPU for scenes
    whose packed tables fit VMEM (one-hot fetch for small scenes, the
    winner post-pass for big ones); other intersector choices use the XLA
    bounce loop. A scene carrying a BVH still prefers the megakernel when
    supported - the BVH remains the XLA fallback. ``batched``/``paired``
    describe a render_frames_mega launch, whose tile size and per-tile
    input blocks differ from the single-frame launch (ADVICE round 3)."""
    if cfg.intersector == "mega":
        return True
    if cfg.intersector != "auto":
        return False
    try:
        import jax as _jax

        if _jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    from .kernels.megakernel import mega_supported

    return mega_supported(scene, cfg, batched=batched, paired=paired)


@functools.partial(
    jax.jit, static_argnames=("cfg", "bounce_stats")
)
def render_frame_with_stats(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    frame,
    bounce_stats: bool = False,
):
    """Render one full frame -> ((H, W, 3) f32 linear radiance, total ray
    segments traced (uint32 scalar) - the Mrays/s numerator).

    ``frame`` is a traced uint32 scalar (progressive accumulation advances it
    without recompiling). Row 0 of the output is the image BOTTOM.
    With ``bounce_stats`` a third element is returned: (max_bounce + 1,)
    int32 live-path counts per bounce index (normalise by counts[0] for the
    alive fraction - SURVEY.md section 5 observability).
    """
    if _use_megakernel(scene, cfg):
        from .kernels.megakernel import render_frame_mega

        # off-TPU (CPU tests, a user forcing intersector="mega") the
        # Mosaic pipeline is unavailable; interpret mode keeps the same
        # semantics at reduced speed
        interpret = jax.devices()[0].platform != "tpu"
        out = render_frame_mega(
            scene, camera, cfg, frame, interpret=interpret,
            collect_stats=bounce_stats,
        )
        if bounce_stats:
            # megakernel hist rows beyond the bounce histogram carry cull
            # diagnostics (kernels/megakernel.py count_visits)
            img, segs, counts = out
            return img, segs, counts[: cfg.max_bounce + 1]
        return out

    blocks = jnp.asarray(_padded_pixel_blocks(cfg))
    intersect_fn = _resolve_intersector(scene, cfg)

    def run(block_idx):
        out = render_block(
            scene, camera, cfg, frame, block_idx,
            intersect_fn=intersect_fn, with_bounce_counts=bounce_stats,
        )
        if bounce_stats:
            img, segs, counts = out
            return img, jnp.sum(segs, dtype=jnp.uint32), counts
        img, segs = out
        return img, jnp.sum(segs, dtype=jnp.uint32)

    if blocks.shape[0] == 1:
        out = run(blocks[0])
        flat, total_segs = out[0], out[1]
        counts = out[2] if bounce_stats else None
    else:
        out = lax.map(run, blocks)
        flat = out[0].reshape(-1, 3)
        total_segs = jnp.sum(out[1], dtype=jnp.uint32)
        counts = jnp.sum(out[2], axis=0) if bounce_stats else None
    flat = flat[: cfg.num_pixels]
    img = flat.reshape(cfg.height, cfg.width, 3)
    if bounce_stats:
        return img, total_segs, counts
    return img, total_segs


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_frame(scene: Scene, camera: Camera, cfg: RenderConfig, frame):
    """Render one full frame -> (H, W, 3) f32 linear radiance."""
    img, _ = render_frame_with_stats(scene, camera, cfg, frame)
    return img


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_frames", "segs_map"),
    donate_argnums=(3,),
)
def render_frames_and_accumulate(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    accum,
    frame0,
    n_frames: int = 1,
    pair_costs=None,
    segs_map: bool = False,
):
    """``n_frames`` progressive steps fused into one dispatch -> (accum',
    total ray segments uint32) (+ an (H, W) int32 per-pixel segment map
    when ``segs_map``).

    On the megakernel path this is ONE kernel launch: frames are
    independently seeded (pix + frame*719393), so a lane that finishes a
    frame's spp quota immediately starts the next frame's samples instead
    of idling for the tile's slowest lane - the parity-mode occupancy
    fix (kernels/megakernel.py render_frames_mega). Sample-for-sample
    identical to the sequential render_and_accumulate loop (fold within
    1 ulp/step of compiler contraction noise). The XLA path folds
    sequentially with the same weights.

    ``pair_costs``: optional (H, W) cost map (a previous call's
    ``segs_map`` output) enabling cost-guided lane pairing on the
    megakernel path - bit-identical output, higher occupancy (see
    render_frames_mega). Chain it across calls:
    ``acc, segs, cmap = render_frames_and_accumulate(..., pair_costs=cmap,
    segs_map=True)``. Ignored on the XLA fallback path, whose segment
    map (per-pixel cost telemetry) is also not available - it returns a
    zeros map, which a later megakernel launch treats as an identity
    pairing."""
    if _use_megakernel(
        scene, cfg, batched=n_frames > 1, paired=pair_costs is not None
    ):
        from .kernels.megakernel import render_frames_mega

        interpret = jax.devices()[0].platform != "tpu"
        return render_frames_mega(
            scene, camera, cfg, frame0, accum, n_frames,
            interpret=interpret, segs_map=segs_map, pair_costs=pair_costs,
        )
    total = jnp.uint32(0)
    for k in range(n_frames):
        cur, segs = render_frame_with_stats(
            scene, camera, cfg, frame0 + jnp.uint32(k)
        )
        accum = accumulate(
            accum, cur, frame0 + jnp.uint32(k), clamp=cfg.clamp_accumulate
        )
        total = total + segs
    if segs_map:
        return accum, total, jnp.zeros(
            (cfg.height, cfg.width), jnp.int32
        )
    return accum, total


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def render_and_accumulate(
    scene: Scene, camera: Camera, cfg: RenderConfig, accum, frame
):
    """One progressive step: render frame ``frame`` and fold it into the
    running average (the Blit-accumulate-Blit sequence of
    RayTracingManager.cs:69-84, fused on device; the accumulation buffer is
    donated so the image never round-trips to host)."""
    cur = render_frame(scene, camera, cfg, frame)
    return accumulate(accum, cur, frame, clamp=cfg.clamp_accumulate)
