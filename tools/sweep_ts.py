"""Sweep megakernel tile size (RTX_MEGA_TS) on the headline bench config.

Each size runs in a fresh subprocess (TS is baked in at module import).
"""

from __future__ import annotations

import os
import subprocess
import sys

SNIPPET = r"""
import time
import jax.numpy as jnp
from ray_tracing_extended_tpu.models.presets import rtiow_final_scene
from ray_tracing_extended_tpu.kernels.megakernel import (
    mega_vmem_estimate, render_frame_mega,
)

scene, camera, cfg = rtiow_final_scene(width=1920, height=1080,
                                       max_bounce=4, spp=16)
# refuse oversized launches BEFORE submitting - a killed oversized
# compile wedged the tunnel machine-wide for ~8h in round 3
est = mega_vmem_estimate(scene, cfg)
assert est["total"] <= est["budget"], f"oversized launch refused: {est}"
img, segs = render_frame_mega(scene, camera, cfg, jnp.uint32(0))
img.block_until_ready()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for f in range(1, 5):
        img, segs = render_frame_mega(scene, camera, cfg, jnp.uint32(f))
    img.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / 4)
import os
print(f"{ {k: v for k, v in os.environ.items() if k.startswith('RTX_')} }"
      f" {best*1e3:.1f} ms  {int(segs)/ (best*1e6/4)/4:.1f} Mrays/s")
"""

if __name__ == "__main__":
    # each arg is a bare tile size ("96") or a comma-separated env spec
    # ("RTX_MEGA_TS=64,RTX_SOME_KNOB=x")
    specs = sys.argv[1:] or ["64", "96"]
    for spec in specs:
        env = dict(os.environ)
        if spec.isdigit():
            env["RTX_MEGA_TS"] = spec
        else:
            for kv in spec.split(","):
                k, v = kv.split("=")
                env[k] = v
        try:
            subprocess.run(
                [sys.executable, "-c", SNIPPET],
                env=env,
                cwd=os.path.join(os.path.dirname(__file__), ".."),
                timeout=float(os.environ.get("RTX_AB_TIMEOUT", 1500)),
            )
        except subprocess.TimeoutExpired:
            print(f"{spec}: timed out (killed)", flush=True)
