"""Canonical benchmark: Mrays/s/chip on the RTIOW final scene, 1080p,
4 bounces (BASELINE.json headline metric; target >= 500).

Counts rays honestly: the numerator is the number of scene intersections of
LIVE path segments (dead masked lanes excluded), taken from the renderer's
per-lane segment counters - not pixels x spp x depth, which would overstate
throughput once Russian roulette / env misses terminate paths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MRAYS = 500.0  # BASELINE.md target for TPU v5e


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.models.presets import rtiow_final_scene
    from ray_tracing_extended_tpu.render import render_frame_with_stats

    scene, camera, cfg = rtiow_final_scene(
        width=1920, height=1080, max_bounce=4, spp=16
    )

    # Warmup/compile + segment count (frame 0).
    img, segs = render_frame_with_stats(scene, camera, cfg, jnp.uint32(0))
    img.block_until_ready()
    assert not np.isnan(np.asarray(img)).any(), "NaNs in benchmark render"

    # Timed steady-state frames, dispatch-pipelined like a real progressive
    # render: the segment counter accumulates on device and the host syncs
    # once at the end (per-frame host syncs would measure tunnel latency,
    # not render throughput).
    n_frames = 4
    total = jnp.uint32(0)
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        img, segs = render_frame_with_stats(
            scene, camera, cfg, jnp.uint32(f)
        )
        total = total + segs
    total_segs = int(total)
    dt = time.perf_counter() - t0

    mrays = total_segs / dt / 1e6
    paths = cfg.num_pixels * cfg.spp * n_frames
    result = {
        "metric": "Mrays/s/chip (RTIOW final scene, 1080p, 4-bounce)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "spp_per_sec": round(paths / cfg.num_pixels / dt, 3),
        "frame_ms": round(dt / n_frames * 1000, 1),
        "device": str(jax.devices()[0]),
        "rays_per_path": round(total_segs / paths, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
