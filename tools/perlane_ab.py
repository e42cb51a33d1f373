"""Per-lane cull hardware A/B: correctness gate + all RTX_MEGA_PERLANE modes.

Runs on the real chip (no JAX_PLATFORMS override): a small-frame Mosaic
output gate (modes 1/2 vs 0 must match bit-for-bit like interpret mode),
then the RTIOW 1080p adaptive + batched-parity headlines and the
eligible secondaries under each knob value. The blind-parity block
checks the pairing interaction: cost-sorting scrambles spatial
coherence within rows, which could inflate per-row need unions.

WEDGE-PROOF PROTOCOL (VERDICT round 3): every experiment block runs in
its OWN subprocess with a hard timeout - a killed oversized compile
wedged the axon tunnel machine-wide for ~8h in round 3, and in-process
experiments made the next bench the victim. The parent never imports
jax; each worker (a) pre-gates its launch with mega_vmem_estimate and
refuses oversized programs instead of submitting them, (b) health-checks
the tunnel with a tiny op before compiling, and (c) prints one JSON
line the parent appends to /tmp/perlane_ab_results.jsonl, so a lost
tunnel preserves every number measured before the loss.

Usage: python tools/perlane_ab.py            (full ~30-50 min A/B)
       python tools/perlane_ab.py --quick    (gate + headline modes only)
       python tools/perlane_ab.py --worker NAME [knobs...]  (internal)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = "/tmp/perlane_ab_results.jsonl"
WORKER_TIMEOUT = float(os.environ.get("RTX_AB_TIMEOUT", 1500))


# --------------------------- worker side ------------------------------------


def _tunnel_check():
    import jax.numpy as jnp

    t0 = time.time()
    int(jnp.ones((), jnp.int32))
    return time.time() - t0


def _vmem_gate(scene, cfg, batched=False, paired=False):
    """Refuse to submit a launch whose estimated VMEM exceeds budget -
    oversized compiles are what wedge the tunnel (round 3)."""
    from ray_tracing_extended_tpu.kernels.megakernel import (
        mega_vmem_estimate,
    )

    est = mega_vmem_estimate(scene, cfg, batched=batched, paired=paired)
    assert est is not None and est["total"] <= est["budget"], (
        f"refusing oversized launch: {est}"
    )


def worker_gate():
    """Small-frame Mosaic output: modes 1/2 must match mode 0 bit-for-bit
    (they are bit-identical in interpret mode; Mosaic must agree)."""
    import numpy as np
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.models import presets
    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    s_s, c_s, cfg_s = presets.rtiow_final_scene(
        width=384, height=216, max_bounce=3, spp=2
    )
    _vmem_gate(s_s, cfg_s)
    imgs = {}
    for knob in ("0", "1", "2"):
        os.environ["RTX_MEGA_PERLANE"] = knob
        img, segs = render_frame_mega(s_s, c_s, cfg_s, jnp.uint32(1))
        int(segs)
        imgs[knob] = np.asarray(img)
    out = {}
    for knob in ("1", "2"):
        d = np.abs(imgs["0"] - imgs[knob]).max(axis=-1)
        out[f"mode{knob}_equal_frac"] = float((d == 0).mean())
        out[f"mode{knob}_max_diff"] = float(d.max())
        assert (d == 0).mean() > 0.995, "perlane Mosaic output drifted"
    return out


def _rtiow():
    import dataclasses

    from ray_tracing_extended_tpu.models import presets

    scene, cam, cfg = presets.rtiow_final_scene(
        width=1920, height=1080, max_bounce=4, spp=16
    )
    return scene, cam, cfg, dataclasses.replace(cfg, adaptive_spp=True)


def worker_adaptive(n=4, reps=3):
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, _, cfg_fast = _rtiow()
    _vmem_gate(scene, cfg_fast)
    img, segs = render_frame_mega(scene, cam, cfg_fast, jnp.uint32(1))
    int(segs)  # blocking warm-up eats the server-side compile
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        total = jnp.uint32(0)
        for f in range(2, 2 + n):
            img, segs = render_frame_mega(scene, cam, cfg_fast, jnp.uint32(f))
            total = total + segs
        s = int(total)
        best = max(best, s / n / (time.perf_counter() - t0) / 1e6)
    return {"mrays": round(best, 2)}


def worker_parity(K=32, paired=True, reps=3, scene_name="rtiow"):
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import (
        render_frames_mega,
    )

    if scene_name == "rtiow":
        scene, cam, cfg, _ = _rtiow()
    elif scene_name == "cornell":
        from ray_tracing_extended_tpu.models import presets

        scene, cam, cfg = presets.cornell_box_scene(
            width=512, height=512, max_bounce=8, spp=16
        )
    elif scene_name == "balls":
        from ray_tracing_extended_tpu.scene.json_scene import load_json_scene

        scene, cam, cfg = load_json_scene(
            os.path.join(REPO, "scenes", "balls_outdoors.json"),
            overrides=dict(width=1280, height=720),
        )
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    _vmem_gate(scene, cfg, batched=True, paired=paired)

    def launch(f, acc, cmap):
        if paired:
            return render_frames_mega(
                scene, cam, cfg, jnp.uint32(f), acc, K,
                segs_map=True, pair_costs=cmap,
            )
        acc, segs = render_frames_mega(scene, cam, cfg, jnp.uint32(f), acc, K)
        return acc, segs, None

    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    acc, segs, cmap = launch(1, acc, None)
    int(segs)  # unpaired compile+warm
    if paired:
        acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        acc, segs, cmap = launch(1 + K, acc, cmap)
        int(segs)  # paired compile+warm
    best = 0.0
    f = 1 + 2 * K
    for _ in range(reps):
        t0 = time.perf_counter()
        acc2 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        acc2, segs, cmap = launch(f, acc2, cmap)
        s = int(segs)
        f += K
        best = max(best, s / (time.perf_counter() - t0) / 1e6)
    return {"mrays": round(best, 2)}


WORKERS = {
    "gate": worker_gate,
    "adaptive": worker_adaptive,
    "parity": lambda: worker_parity(K=32, paired=True),
    "parity_blind": lambda: worker_parity(K=32, paired=False),
    "cornell": lambda: worker_parity(K=16, paired=True,
                                     scene_name="cornell"),
    "balls": lambda: worker_parity(K=8, paired=True, scene_name="balls"),
}


def run_worker(name):
    out = {"worker": name, "tunnel_rtt_s": round(_tunnel_check(), 2)}
    out.update(WORKERS[name]())
    print("RESULT " + json.dumps(out), flush=True)


# ------------------------- orchestrator side --------------------------------


def spawn(name, env_knobs, tag=None):
    """One experiment = one killable subprocess; a wedged compile dies with
    it instead of poisoning the parent (and the next bench run)."""
    env = dict(os.environ)
    env.update(env_knobs)
    tag = tag or f"{name} {env_knobs}"
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", name],
            env=env, timeout=WORKER_TIMEOUT, capture_output=True, text=True,
        )
        line = next(
            (ln[7:] for ln in r.stdout.splitlines()
             if ln.startswith("RESULT ")),
            None,
        )
        if r.returncode != 0 or line is None:
            res = {"worker": name, "error":
                   (r.stderr or r.stdout or "").strip()[-300:]}
        else:
            res = json.loads(line)
    except subprocess.TimeoutExpired:
        res = {"worker": name,
               "error": f"timeout after {WORKER_TIMEOUT:.0f}s (killed)"}
    res["knobs"] = env_knobs
    res["tag"] = tag
    res["wall_s"] = round(time.time() - t0, 1)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)
    return res


def main():
    quick = "--quick" in sys.argv
    print(f"results -> {RESULTS}", flush=True)
    spawn("gate", {}, tag="mosaic output gate modes 0/1/2")

    res = {}
    for knob in ("0", "1", "2"):
        r = spawn("adaptive", {"RTX_MEGA_PERLANE": knob},
                  tag=f"adaptive perlane={knob}")
        res[f"adapt{knob}"] = r.get("mrays", 0.0)
    for knob in ("0", "1", "2"):
        r = spawn("parity", {"RTX_MEGA_PERLANE": knob},
                  tag=f"parity K=32 paired perlane={knob}")
        res[f"par{knob}"] = r.get("mrays", 0.0)
    if res["adapt0"] and res["par0"]:
        print(
            f"RATIOS vs off: adaptive {res['adapt1']/res['adapt0']:.3f} "
            f"(m1) {res['adapt2']/res['adapt0']:.3f} (m2)  parity "
            f"{res['par1']/res['par0']:.3f} (m1) "
            f"{res['par2']/res['par0']:.3f} (m2)", flush=True,
        )
    if quick:
        return

    # pairing interaction: blind (spatially coherent) lanes
    for knob in ("0", "1", "2"):
        spawn("parity_blind", {"RTX_MEGA_PERLANE": knob},
              tag=f"parity K=32 UNPAIRED perlane={knob}")

    # TS interaction: per-row pops weaken the big-tile cull-locality
    # penalty (a row pays its own needs, not the tile union), so the
    # tile-size optimum may move up under mode 2
    for ts in ("192", "224"):
        spawn("parity", {"RTX_MEGA_PERLANE": "2", "RTX_MEGA_TS": ts},
              tag=f"parity K=32 paired m2 TS={ts}")
    for ts in ("128", "160"):
        spawn("adaptive", {"RTX_MEGA_PERLANE": "2", "RTX_MEGA_TS": ts},
              tag=f"adaptive m2 TS={ts}")

    # secondaries
    for knob in ("0", "2"):
        spawn("cornell", {"RTX_MEGA_PERLANE": knob},
              tag=f"cornell K=16 perlane={knob}")
    # Balls is perlane-INELIGIBLE (1 visible sub after the ground hoist):
    # knob=1 must measure ~= knob=0 (sanity that ineligibility is free)
    for knob in ("0", "1"):
        spawn("balls", {"RTX_MEGA_PERLANE": knob},
              tag=f"balls K=8 perlane={knob}")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        run_worker(sys.argv[sys.argv.index("--worker") + 1])
    else:
        main()
