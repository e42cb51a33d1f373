"""Per-lane cull hardware A/B: correctness gate + all RTX_MEGA_PERLANE modes.

Runs on the real chip (no JAX_PLATFORMS override): a small-frame Mosaic
output gate (modes 1/2 vs 0 must match bit-for-bit like interpret mode),
then the RTIOW 1080p adaptive + batched-parity headlines and the
eligible secondaries under each knob value. The blind-parity block
checks the pairing interaction: cost-sorting scrambles spatial
coherence within rows, which could inflate per-row need unions.

Usage: python tools/perlane_ab.py   (expect ~30-50 min of tunnel time)
"""
import os
import sys
import time
import dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

t0 = time.time()
int(jnp.ones((), jnp.int32))
print(f"tunnel ok ({time.time()-t0:.1f}s)", flush=True)

from ray_tracing_extended_tpu.models import presets
from ray_tracing_extended_tpu.kernels.megakernel import (
    render_frame_mega, render_frames_mega,
)

scene, cam, cfg = presets.rtiow_final_scene(width=1920, height=1080,
                                            max_bounce=4, spp=16)
cfg_fast = dataclasses.replace(cfg, adaptive_spp=True)

# ---- 1. Mosaic correctness gate on a small frame ----
s_s, c_s, cfg_s = presets.rtiow_final_scene(width=384, height=216,
                                            max_bounce=3, spp=2)
imgs = {}
for knob in ("0", "1", "2"):
    os.environ["RTX_MEGA_PERLANE"] = knob
    img, segs = render_frame_mega(s_s, c_s, cfg_s, jnp.uint32(1))
    int(segs)
    imgs[knob] = np.asarray(img)
for knob in ("1", "2"):
    d = np.abs(imgs["0"] - imgs[knob]).max(axis=-1)
    print(f"small-frame gate mode {knob}: pixels equal "
          f"{(d == 0).mean():.5f}, max diff {d.max():.3e}", flush=True)
    assert (d == 0).mean() > 0.995, "perlane Mosaic output drifted"

def bench_single(tag, cfgx, n=4, reps=3):
    img, segs = render_frame_mega(scene, cam, cfgx, jnp.uint32(1))
    int(segs)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        total = jnp.uint32(0)
        for f in range(2, 2 + n):
            img, segs = render_frame_mega(scene, cam, cfgx, jnp.uint32(f))
            total = total + segs
        s = int(total)
        best = max(best, s / n / (time.perf_counter() - t0) / 1e6)
    print(f"{tag}: {best:.1f} Mrays/s", flush=True)
    return best

def bench_batched(tag, scn, cm, cfgx, K, reps=3):
    acc = jnp.zeros((cfgx.height, cfgx.width, 3), jnp.float32)
    cmap = None
    acc, segs, cmap = render_frames_mega(scn, cm, cfgx, jnp.uint32(1), acc,
                                         K, segs_map=True, pair_costs=cmap)
    int(segs)  # unpaired compile+warm
    acc = jnp.zeros((cfgx.height, cfgx.width, 3), jnp.float32)
    acc, segs, cmap = render_frames_mega(scn, cm, cfgx, jnp.uint32(1 + K),
                                         acc, K, segs_map=True,
                                         pair_costs=cmap)
    int(segs)  # paired compile+warm
    best = 0.0
    f = 1 + 2 * K
    for _ in range(reps):
        t0 = time.perf_counter()
        acc2 = jnp.zeros((cfgx.height, cfgx.width, 3), jnp.float32)
        acc2, segs, cmap = render_frames_mega(scn, cm, cfgx, jnp.uint32(f),
                                              acc2, K, segs_map=True,
                                              pair_costs=cmap)
        s = int(segs)
        f += K
        best = max(best, s / (time.perf_counter() - t0) / 1e6)
    print(f"{tag}: {best:.1f} Mrays/s", flush=True)
    return best

res = {}
for knob in ("0", "1", "2"):
    os.environ["RTX_MEGA_PERLANE"] = knob
    res[f"adapt{knob}"] = bench_single(f"adaptive perlane={knob}", cfg_fast)
for knob in ("0", "1", "2"):
    os.environ["RTX_MEGA_PERLANE"] = knob
    res[f"par{knob}"] = bench_batched(f"parity K=32 paired perlane={knob}",
                                      scene, cam, cfg, 32)
print(f"RATIOS vs off: adaptive {res['adapt1']/res['adapt0']:.3f} (m1) "
      f"{res['adapt2']/res['adapt0']:.3f} (m2)  "
      f"parity {res['par1']/res['par0']:.3f} (m1) "
      f"{res['par2']/res['par0']:.3f} (m2)", flush=True)

# ---- pairing interaction: blind (spatially coherent) lanes ----
def bench_unpaired(tag, K, reps=2):
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    acc, segs = render_frames_mega(scene, cam, cfg, jnp.uint32(1), acc, K)
    int(segs)
    best = 0.0
    f = 1 + K
    for _ in range(reps):
        t0 = time.perf_counter()
        acc2 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        acc2, segs = render_frames_mega(scene, cam, cfg, jnp.uint32(f),
                                        acc2, K)
        s_ = int(segs)
        f += K
        best = max(best, s_ / (time.perf_counter() - t0) / 1e6)
    print(f"{tag}: {best:.1f} Mrays/s", flush=True)
    return best

for knob in ("0", "1", "2"):
    os.environ["RTX_MEGA_PERLANE"] = knob
    bench_unpaired(f"parity K=32 UNPAIRED perlane={knob}", 32)


# ---- TS interaction: per-row pops weaken the big-tile cull-locality
# penalty (a row pays its own needs, not the tile union), so the tile
# size optimum may move up under mode 2
os.environ["RTX_MEGA_PERLANE"] = "2"
for ts in ("192", "224"):
    os.environ["RTX_MEGA_TS"] = ts
    bench_batched(f"parity K=32 paired m2 TS={ts}", scene, cam, cfg, 32)
for ts in ("128", "160"):
    os.environ["RTX_MEGA_TS"] = ts
    bench_single(f"adaptive m2 TS={ts}", cfg_fast)
os.environ.pop("RTX_MEGA_TS", None)

# ---- secondaries ----
cs, cc, ccf = presets.cornell_box_scene(width=512, height=512,
                                        max_bounce=8, spp=16)
for knob in ("0", "2"):
    os.environ["RTX_MEGA_PERLANE"] = knob
    bench_batched(f"cornell K=16 perlane={knob}", cs, cc, ccf, 16)
try:
    from ray_tracing_extended_tpu.scene.unity import load_unity_scene
    bs, bc, bcf = load_unity_scene(
        "/root/reference/Assets/Scenes/Balls Outdoors.unity",
        overrides=dict(width=1280, height=720))
    # Balls is perlane-INELIGIBLE (1 visit sub after the ground hoist):
    # knob=1 must measure ~= knob=0 (sanity that ineligibility is free)
    for knob in ("0", "1"):
        os.environ["RTX_MEGA_PERLANE"] = knob
        bench_batched(f"balls K=8 perlane={knob}", bs, bc, bcf, 8)
except FileNotFoundError:
    pass
