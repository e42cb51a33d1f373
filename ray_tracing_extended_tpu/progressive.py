"""Progressive multi-frame renderer: the frame loop of the reference's
OnRenderImage (RayTracingManager.cs:49-93) as a production driver with
checkpoint/resume and structured metrics (both absent in the reference -
SURVEY.md section 5).

Per frame: render (megakernel or XLA path), fold into the running average
with the reference's 1/(frame+1) weighting, optionally checkpoint
(atomically) and emit one JSONL metrics line (Mrays/s from live segment
counts, spp/s, convergence delta).
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from .models.geometry import Scene
from .ops.accumulate import accumulate
from .ops.camera import Camera
from .render import render_frame_with_stats
from .utils import checkpoint as ckpt
from .utils.config import RenderConfig
from .utils.metrics import FrameMetrics, MetricsLogger


def render_progressive(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    frames: int,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    resume: bool = False,
    metrics: MetricsLogger | None = None,
    cameras=None,
    scenes=None,
    mesh=None,
    batch: int = 1,
    reset_on_move: bool = False,
):
    """Accumulate ``frames`` frames and return the (H, W, 3) average.

    ``batch``: frames fused per dispatch (static camera only). On the
    megakernel path each chunk is ONE kernel launch whose per-pixel cost
    telemetry feeds the NEXT chunk's cost-guided lane pairing
    (render.render_frames_and_accumulate pair_costs chaining) - the fast
    parity path (bench.py's parity mode; ~263 vs ~182 Mrays/s unbatched
    on the RTIOW headline). Identical estimator and accumulation values
    (fold within 1 ulp/step); per-frame alive_frac/accum_var metrics are
    unavailable (one JSONL line per chunk instead).

    ``cameras``: optional per-frame Camera sequence (fly-throughs,
    BASELINE config 5). With a static camera the running average converges
    to the scene's radiance; with per-frame cameras each frame still folds
    with the reference weighting (matching its behavior when the camera
    moves - SURVEY.md section 3.4: the reference keeps averaging into
    stale history, ghosting by design).

    ``scenes``: optional per-frame Scene sequence (animated/moving
    objects). Frame f renders scenes[f]; every scene must share the
    first frame's pytree structure and shapes (same object counts), so
    the whole animation reuses one compiled program. This is the
    reference's per-frame scene re-scan + re-upload
    (RayTracingManager.cs:95-109 InitFrame -> CreateSpheres/CreateMeshes;
    RayTracedMesh.cs:42-51): build each frame's Scene by mutating one
    SceneBuilder (set_sphere / set_mesh_transform) and calling build()
    again. Accumulation keeps folding into stale history while objects
    move - the reference's ghosting-by-design, same as a moving camera.

    ``reset_on_move``: opt-out of that ghosting (extension; requires
    ``cameras``): whenever the camera differs from the previous frame's,
    the running average restarts, so the result is the converged average
    of the TRAILING run of identical cameras. Frames within a run fold
    with the same weights as a fresh static render (the per-frame clamp
    included), and the Welford variance signal restarts with the run.

    ``mesh``: optional jax.sharding.Mesh ('spp', 'tiles') - each frame
    renders multi-chip via the sharded megakernel (horizontal bands over
    'tiles', zero hot-loop collectives; 'spp' rows render extra frame
    seeds merged by the one pmean - parallel/sharding.py). The band split
    is bit-identical to single-chip mega renders of the same frame
    indices. With spp_parallel > 1 each step folds spp_size
    equally-weighted frames at once, which matches the reference
    weighting exactly only without the per-frame clamp - HDR mode
    (clamp_accumulate=False) is required then. ``batch`` > 1 composes
    with an spp_parallel=1 mesh: the parity-headline scheduler (K-frame
    fused launches + cost-guided pairing, segment map chained across
    chunks) runs per band, bit-identical to the single-chip batched
    sequence (render_frames_mega_sharded). ``reset_on_move`` composes at
    step granularity (each step's spp_size frame seeds share a camera).
    """
    if reset_on_move and cameras is None:
        raise ValueError("reset_on_move requires a cameras sequence")
    if scenes is not None:
        if mesh is not None:
            raise ValueError(
                "per-frame scenes are single-chip only for now (the "
                "sharded path renders spp_size frame seeds of ONE scene "
                "per step)"
            )
        if batch > 1:
            raise ValueError(
                "batch > 1 fuses frames into one launch over a single "
                "scene; per-frame scenes need batch=1"
            )
        import jax as _jax

        struct0 = _jax.tree_util.tree_structure(scenes[0])
        shapes0 = [
            (x.shape, x.dtype)
            for x in _jax.tree_util.tree_leaves(scenes[0])
        ]
        for i, sc in enumerate(scenes[1:], 1):
            if (
                _jax.tree_util.tree_structure(sc) != struct0
                or [
                    (x.shape, x.dtype)
                    for x in _jax.tree_util.tree_leaves(sc)
                ]
                != shapes0
            ):
                raise ValueError(
                    f"scenes[{i}] differs in pytree structure or shapes "
                    "from scenes[0]; animated scenes must keep object "
                    "counts fixed (pad with never-hit primitives) so the "
                    "compiled program is reused"
                )
    if mesh is not None:
        if batch > 1 and mesh.shape["spp"] != 1:
            raise ValueError(
                "batch > 1 composes with the 'tiles' band split only; "
                "use an spp_parallel=1 mesh (the in-kernel K-frame fold "
                "is sequential and cannot merge across 'spp' rows)"
            )
        if batch > 1 and cameras is not None:
            raise ValueError(
                "batch > 1 fuses frames into one launch under a single "
                "camera; per-frame cameras need batch=1"
            )
        return _render_progressive_sharded(
            scene, camera, cfg, frames, mesh,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            resume=resume, metrics=metrics, cameras=cameras,
            batch=batch, reset_on_move=reset_on_move,
        )
    start_frame = 0
    accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    fingerprint = None
    if checkpoint_path is not None:
        # Fold the full camera path into the fingerprint: resuming a
        # fly-through against a checkpoint made with a different path must
        # be refused, exactly like a changed static camera.
        fingerprint = ckpt.state_hash(
            scene, cameras if cameras is not None else camera, cfg
        )
        if scenes is not None:
            # Fold the full animation into the fingerprint (content_hash
            # is precomputed at build, so this is free): resuming an
            # animated render against a different scene path must be
            # refused, exactly like a changed camera path.
            import hashlib

            hs = hashlib.sha256()
            for sc in scenes:
                part = getattr(sc, "content_hash", None)
                if part is None:
                    import dataclasses as _dc

                    part = ckpt.hash_tree(
                        _dc.replace(
                            sc, tri_bvh=None, sphere_bvh=None, packed=None
                        )
                    )
                hs.update(part.encode())
            fingerprint += ":scenes:" + hs.hexdigest()[:16]
        if reset_on_move:
            # run-relative weights are a different accumulation scheme:
            # resuming a reset_on_move checkpoint without the flag (or
            # vice versa) would silently blend incompatible weightings
            fingerprint += ":reset_on_move"
        if resume:
            import os

            if os.path.exists(checkpoint_path):
                accum_np, start_frame = ckpt.load(checkpoint_path, fingerprint)
                accum = jnp.asarray(accum_np)
    if cameras is not None and len(cameras) < start_frame + frames:
        raise ValueError(
            f"cameras covers {len(cameras)} frames; rendering frames "
            f"[{start_frame}, {start_frame + frames}) needs "
            f"{start_frame + frames}"
        )
    if scenes is not None and len(scenes) < start_frame + frames:
        raise ValueError(
            f"scenes covers {len(scenes)} frames; rendering frames "
            f"[{start_frame}, {start_frame + frames}) needs "
            f"{start_frame + frames}"
        )
    if batch > 1:
        if cameras is not None:
            raise ValueError(
                "batch > 1 fuses frames into one launch under a single "
                "camera; per-frame cameras need batch=1"
            )
        from .render import render_frames_and_accumulate

        cmap = None
        f = start_frame
        end = start_frame + frames
        while f < end:
            k = min(batch, end - f)
            t0 = time.perf_counter()
            accum, segs, cmap = render_frames_and_accumulate(
                scene, camera, cfg, accum, jnp.uint32(f), k,
                pair_costs=cmap, segs_map=True,
            )
            segs = int(segs)  # one host sync per chunk
            wall = time.perf_counter() - t0
            f += k
            if metrics is not None:
                metrics.log(
                    FrameMetrics(
                        frame=f - 1,
                        wall_s=wall,
                        rays=segs,
                        pixels=cfg.num_pixels,
                        spp=cfg.spp * k,
                        extra={"batched_frames": k},
                    )
                )
            if (
                checkpoint_path is not None
                and checkpoint_every
                and (f // checkpoint_every) > ((f - k) // checkpoint_every)
            ):
                ckpt.save(checkpoint_path, np.asarray(accum), f, fingerprint)
        if checkpoint_path is not None:
            ckpt.save(checkpoint_path, np.asarray(accum), end, fingerprint)
        return np.asarray(accum)

    def _same_cam(a, b):
        import jax

        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return len(la) == len(lb) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(la, lb)
        )

    # seg0 = first frame of the current same-camera run (reset_on_move);
    # on resume, back-scan so mid-run checkpoints keep exact weights
    seg0 = start_frame
    if reset_on_move:
        while seg0 > 0 and _same_cam(cameras[seg0 - 1], cameras[seg0]):
            seg0 -= 1

    # Welford running second moment across frames: var(mean) ~= mean(M2) /
    # (n (n - 1)) is the MC convergence signal promised in SURVEY section 5.
    m2 = jnp.zeros_like(accum)
    want_stats = metrics is not None
    for f in range(start_frame, start_frame + frames):
        cam = cameras[f] if cameras is not None else camera
        sc = scenes[f] if scenes is not None else scene
        if reset_on_move and f > start_frame and not _same_cam(
            cameras[f - 1], cam
        ):
            seg0 = f
            m2 = jnp.zeros_like(accum)
        t0 = time.perf_counter()
        out = render_frame_with_stats(
            sc, cam, cfg, jnp.uint32(f), bounce_stats=want_stats
        )
        cur, segs = out[0], out[1]
        prev = accum
        # reset_on_move folds with run-relative weights (a fresh render
        # of the run); otherwise the reference's global 1/(f+1)
        wf = (f - seg0) if reset_on_move else f
        accum = accumulate(accum, cur, wf, clamp=cfg.clamp_accumulate)
        # Welford step; skipped on a weight-0 fold (fresh sequence):
        # M2 is identically 0 at n=1, and with the per-frame clamp prev
        # is stale (zeros, or the previous camera run's average), whose
        # cross-term against (cur - saturate(cur)) would corrupt the
        # restarted variance signal on >1-radiance scenes
        if not (reset_on_move and f == seg0):
            m2 = m2 + (cur - prev) * (cur - accum)
        segs = int(segs)  # blocks until the frame is done
        wall = time.perf_counter() - t0
        if metrics is not None:
            counts = np.asarray(out[2])
            paths = max(int(counts[0]), 1)
            extra = {
                "alive_frac": [round(c / paths, 4) for c in counts.tolist()],
            }
            # frames covered by m2: since the last camera move (reset
            # mode) or since this invocation started (resume restarts
            # the variance signal, not the average)
            n = f - max(seg0, start_frame) + 1 if reset_on_move else (
                f - start_frame + 1
            )
            if n >= 2:
                extra["accum_var"] = float(
                    jnp.mean(m2) / (n * (n - 1))
                )
            metrics.log(
                FrameMetrics(
                    frame=f,
                    wall_s=wall,
                    rays=segs,
                    pixels=cfg.num_pixels,
                    spp=cfg.spp,
                    extra=extra,
                )
            )
        if (
            checkpoint_path is not None
            and checkpoint_every
            and (f + 1) % checkpoint_every == 0
        ):
            ckpt.save(checkpoint_path, np.asarray(accum), f + 1, fingerprint)

    if checkpoint_path is not None:
        ckpt.save(
            checkpoint_path,
            np.asarray(accum),
            start_frame + frames,
            fingerprint,
        )
    return np.asarray(accum)


def _render_progressive_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    frames: int,
    mesh,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    resume: bool = False,
    metrics: MetricsLogger | None = None,
    cameras=None,
    batch: int = 1,
    reset_on_move: bool = False,
):
    """Multi-chip progressive driver (BASELINE config 5 composition):
    per step, one sharded megakernel launch renders ``spp_size`` frames'
    samples (bands over 'tiles'; frame seeds over 'spp'), folded into the
    running average with the reference weighting. Step s covers frame
    indices [s * spp_size, (s + 1) * spp_size), and folding the step's
    equal-weight sample mean with weight 1/(s+1) reproduces the flat
    average over all frames rendered so far.

    ``batch`` > 1 (requires an spp_parallel=1 mesh; enforced upstream):
    the parity-headline scheduler runs per band - each chunk is ONE
    sharded launch of K frames with the cost-paired lane schedule, the
    segment map chaining into the next chunk's pairing exactly like the
    single-chip path (render_frames_mega_sharded). Bit-identical to the
    single-chip batched+paired sequence over the same frame indices.

    ``reset_on_move`` (requires ``cameras``; step granularity): when
    cameras[s] differs from cameras[s-1] the running average restarts,
    so the result is the converged average of the trailing run of
    identical cameras - each step still folds its spp_size frame seeds
    with the run-relative weight.

    NOTE (ADVICE round 3): on this path ``frames`` counts STEPS and
    ``cameras`` is PER-STEP, not per-frame - step s renders its spp_size
    frame seeds under the single camera cameras[s] (one sharded launch
    cannot move the camera between its fused frame seeds). A fly-through
    of N views over an spp-sharded mesh therefore renders N steps =
    N * spp_size frames, spp_size seeds per view - by design, not a
    stride bug; the single-chip path (mesh=None) keeps the per-frame
    contract."""
    from .parallel.sharding import render_frame_mega_sharded

    spp_size = mesh.shape["spp"]
    if spp_size > 1 and cfg.clamp_accumulate:
        raise ValueError(
            "spp-sharded progressive accumulation folds spp_size frames "
            "per step, which is not bit-equal under the reference's "
            "per-frame clamp; use HDR mode (clamp_accumulate=False) or "
            "an spp=1 mesh"
        )
    start_step = 0
    accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    fingerprint = None
    if checkpoint_path is not None:
        fingerprint = ckpt.state_hash(
            scene, cameras if cameras is not None else camera, cfg
        )
        if reset_on_move:
            fingerprint += ":reset_on_move"
        if resume:
            import os

            if os.path.exists(checkpoint_path):
                accum_np, start_step = ckpt.load(checkpoint_path, fingerprint)
                accum = jnp.asarray(accum_np)
    if cameras is not None and len(cameras) < start_step + frames:
        raise ValueError(
            f"cameras covers {len(cameras)} steps; rendering steps "
            f"[{start_step}, {start_step + frames}) needs "
            f"{start_step + frames} (one camera per step - each step "
            f"renders {spp_size} frame seeds under it)"
        )

    if batch > 1:
        # K-frame batched + cost-paired over the band split ('tiles'-only
        # mesh): the accumulator lives in band layout on-device across
        # chunks; checkpoints store the cropped image.
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.sharding import (
            mega_band_height,
            mega_bands_to_image,
            render_frames_mega_sharded,
        )

        # The TS default (and with it the band height) differs between
        # paired and unpaired launches; chain from a ZEROS cost map so
        # every chunk is cost-paired with one constant band layout. A
        # zeros map is the identity pairing - the rendered estimator is
        # bit-identical for ANY cost map (render_frames_mega docstring),
        # so this matches the single-chip chain sample-for-sample.
        bh = mega_band_height(scene, cfg, mesh, batched=True, paired=True)
        n_bands = mesh.shape["tiles"]
        pad = n_bands * bh - cfg.height
        sh = NamedSharding(mesh, P("tiles"))
        acc_bands = jax.device_put(
            jnp.concatenate(
                [
                    jnp.asarray(accum, jnp.float32),
                    jnp.zeros((pad, cfg.width, 3), jnp.float32),
                ]
            ),
            sh,
        )
        cmap = jax.device_put(
            jnp.zeros((n_bands * bh, cfg.width), jnp.int32), sh
        )
        f = start_step
        end = start_step + frames
        while f < end:
            k = min(batch, end - f)
            t0 = time.perf_counter()
            acc_bands, segs, cmap = render_frames_mega_sharded(
                scene, camera, cfg, jnp.uint32(f), acc_bands, k, mesh,
                pair_costs=cmap,
            )
            segs = int(segs)
            wall = time.perf_counter() - t0
            f += k
            if metrics is not None:
                metrics.log(
                    FrameMetrics(
                        frame=f - 1,
                        wall_s=wall,
                        rays=segs,
                        pixels=cfg.num_pixels,
                        spp=cfg.spp * k,
                        extra={
                            "batched_frames": k,
                            "mesh": dict(mesh.shape),
                        },
                    )
                )
            if (
                checkpoint_path is not None
                and checkpoint_every
                and (f // checkpoint_every) > ((f - k) // checkpoint_every)
            ):
                ckpt.save(
                    checkpoint_path, mega_bands_to_image(acc_bands, cfg),
                    f, fingerprint,
                )
        out = mega_bands_to_image(acc_bands, cfg)
        if checkpoint_path is not None:
            ckpt.save(checkpoint_path, out, end, fingerprint)
        return out

    def _same_cam(a, b):
        import jax

        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return len(la) == len(lb) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(la, lb)
        )

    seg0 = start_step
    if reset_on_move:
        while seg0 > 0 and _same_cam(cameras[seg0 - 1], cameras[seg0]):
            seg0 -= 1

    for s in range(start_step, start_step + frames):
        cam = cameras[s] if cameras is not None else camera
        if reset_on_move and s > start_step and not _same_cam(
            cameras[s - 1], cam
        ):
            seg0 = s
        t0 = time.perf_counter()
        img, segs = render_frame_mega_sharded(
            scene, cam, cfg, jnp.uint32(s * spp_size), mesh
        )
        ws = (s - seg0) if reset_on_move else s
        accum = accumulate(accum, img, ws, clamp=cfg.clamp_accumulate)
        segs = int(segs)  # one host sync per step
        wall = time.perf_counter() - t0
        if metrics is not None:
            metrics.log(
                FrameMetrics(
                    frame=s,
                    wall_s=wall,
                    rays=segs,
                    pixels=cfg.num_pixels,
                    spp=cfg.spp * spp_size,
                    extra={"mesh": dict(mesh.shape)},
                )
            )
        if (
            checkpoint_path is not None
            and checkpoint_every
            and (s + 1) % checkpoint_every == 0
        ):
            ckpt.save(checkpoint_path, np.asarray(accum), s + 1, fingerprint)

    if checkpoint_path is not None:
        ckpt.save(
            checkpoint_path, np.asarray(accum), start_step + frames,
            fingerprint,
        )
    return np.asarray(accum)
