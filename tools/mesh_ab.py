"""Mesh-scene (70k tris, winner fetch) hardware A/B: tile size x phase
split x sub-cluster size.

BASELINE config 4 sits at ~1.44 Mrays/s - two orders below the sphere
headline - because scattered bounce rays on a dense connected surface
defeat tile-granularity culling (round 2: 475 of 2188 tri subs visited
per slot at TS=64; the pair-test volume per slot scales with
visits x state rows). The levers this A/B measures, each changing that
product a different way:

  - RTX_MEGA_TS (32/48/64/96): smaller tiles have more coherent lane
    sets, so the per-TILE visit union shrinks while the per-visit cost
    (RS state rows) shrinks linearly - per-pixel pair cost is
    visits * RS / TS^2, so halving TS wins whenever the union shrinks
    at all. Cost: 4x more grid programs (~12 us each) and per-slot
    fixed costs amortized over fewer lanes.
  - RTX_MEGA_PHASES (1/2): coherence-split scheduling. A wash on RTIOW
    (sphere unions are 9-13 of 16 regardless - ROADMAP round 2), but on
    the bunny the primary-ray union should be tens of subs vs the mixed
    union's hundreds, so splitting fresh camera rays from scattered
    survivors may cut most of the pair volume at the cost of ~1.5x more
    slots.
  - RTX_MEGA_SUB (32/16): finer sub-clusters halve the per-visit block
    and tighten boxes (+selectivity) but double slab tests and fetch
    ranks. Measured +12% on RTIOW; the bunny's economics differ (the
    visit union is 22% of subs, not 60-80%).

Gate first: every knob combination must render the small mesh frame
bit-identically to the default configuration (tiling, scheduling and
packing granularity are all estimator-invariant by construction; the
encoded-fold winner can differ only at documented ulp-scale ties).

WEDGE-PROOF PROTOCOL: one subprocess per experiment with a hard
timeout; workers pre-gate VMEM and health-check the tunnel before
compiling (tools/perlane_ab.py round-3 postmortem).

Usage: python tools/mesh_ab.py           (full sweep, ~20-30 min)
       python tools/mesh_ab.py --worker NAME [knobs via env]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = "/tmp/mesh_ab_results.jsonl"
WORKER_TIMEOUT = float(os.environ.get("RTX_AB_TIMEOUT", 900))


# --------------------------- worker side ------------------------------------


def _tunnel_check():
    import jax.numpy as jnp

    t0 = time.time()
    int(jnp.ones((), jnp.int32))
    return time.time() - t0


def _mesh(small=False):
    from ray_tracing_extended_tpu.models import presets

    if small:
        return presets.mesh_scene(width=320, height=192, spp=1)
    return presets.mesh_scene()


def _vmem_gate(scene, cfg):
    from ray_tracing_extended_tpu.kernels.megakernel import (
        mega_vmem_estimate,
    )

    est = mega_vmem_estimate(scene, cfg)
    assert est is not None and est["total"] <= est["budget"], (
        f"refusing oversized launch: {est}"
    )


def worker_gate():
    """Small mesh frame under each knob combination vs the default: the
    estimator is invariant to tiling/scheduling/packing granularity, so
    outputs must match except documented ulp-scale encode ties."""
    import numpy as np
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = _mesh(small=True)
    _vmem_gate(scene, cfg)
    img0, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
    int(segs)
    ref = np.asarray(img0)
    out = {}
    for tag, knobs in (
        ("ts32", {"RTX_MEGA_TS": "32"}),
        ("ph2", {"RTX_MEGA_PHASES": "2"}),
    ):
        for k, v in knobs.items():
            os.environ[k] = v
        try:
            img, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
            int(segs)
            d = np.abs(ref - np.asarray(img)).max(axis=-1)
            out[f"{tag}_equal_frac"] = float((d == 0).mean())
            out[f"{tag}_max_diff"] = float(d.max())
            assert (d == 0).mean() > 0.99, f"{tag} output drifted"
        finally:
            for k in knobs:
                os.environ.pop(k, None)
    return out


def worker_gate_sub16():
    """SUB=16 packs different tables (set in the env by the parent), so
    compare against a saved SUB=32 reference rendered by worker_ref16."""
    import numpy as np
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = _mesh(small=True)
    _vmem_gate(scene, cfg)
    img, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
    int(segs)
    ref = np.load("/tmp/mesh_ab_ref.npy")
    d = np.abs(ref - np.asarray(img)).max(axis=-1)
    assert (d == 0).mean() > 0.99, "SUB=16 output drifted"
    return {"sub16_equal_frac": float((d == 0).mean()),
            "sub16_max_diff": float(d.max())}


def worker_ref16():
    import numpy as np
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = _mesh(small=True)
    img, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
    int(segs)
    np.save("/tmp/mesh_ab_ref.npy", np.asarray(img))
    return {"saved": True}


def worker_mesh(reps=3, frames=2):
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = _mesh()
    _vmem_gate(scene, cfg)
    img, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
    int(segs)  # compile + warm
    best = 0.0
    f = 2
    for _ in range(reps):
        t0 = time.perf_counter()
        total = jnp.uint32(0)
        for _ in range(frames):
            img, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(f))
            total = total + segs
            f += 1
        s = int(total)
        best = max(best, s / frames / (time.perf_counter() - t0) / 1e6)
    return {"mrays": round(best, 3)}


def worker_gate_rowdrain():
    """Small mesh frame: RTX_MEGA_ROWDRAIN=1 must match the default
    two-level tile-gated output bit-for-bit on Mosaic (it does in
    interpret mode - tests/test_megakernel.py)."""
    import numpy as np
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega

    scene, cam, cfg = _mesh(small=True)
    _vmem_gate(scene, cfg)
    img0, s0 = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
    int(s0)
    os.environ["RTX_MEGA_ROWDRAIN"] = "1"
    try:
        img1, s1 = render_frame_mega(scene, cam, cfg, jnp.uint32(1))
        int(s1)
    finally:
        os.environ.pop("RTX_MEGA_ROWDRAIN", None)
    d = np.abs(np.asarray(img0) - np.asarray(img1)).max(axis=-1)
    assert (d == 0).mean() > 0.99, "rowdrain Mosaic output drifted"
    return {"equal_frac": float((d == 0).mean()),
            "max_diff": float(d.max()),
            "segs": [int(s0), int(s1)]}


def worker_scene(reps=3, frames=3):
    """Bench a parameterized tri scene at 1280x720 (RTX_AB_SCENE env:
    'chess' for the shipped JSON mirror, or an integer target_tris for
    the mesh preset). Used by --sizegate to place the rowdrain auto
    threshold."""
    import jax.numpy as jnp

    from ray_tracing_extended_tpu.render import render_frame_with_stats

    which = os.environ.get("RTX_AB_SCENE", "chess")
    if which == "chess":
        from ray_tracing_extended_tpu.scene.json_scene import (
            load_json_scene,
        )

        scene, cam, cfg = load_json_scene(
            os.path.join(REPO, "scenes", "chess.json"),
            overrides={"width": 1280, "height": 720},
        )
    else:
        from ray_tracing_extended_tpu.models import presets

        scene, cam, cfg = presets.mesh_scene(
            width=1280, height=720, spp=1, target_tris=int(which)
        )
    _vmem_gate(scene, cfg)
    img, segs = render_frame_with_stats(scene, cam, cfg, jnp.uint32(1))
    int(segs)
    best = 0.0
    f = 2
    for _ in range(reps):
        t0 = time.perf_counter()
        total = jnp.uint32(0)
        for _ in range(frames):
            img, segs = render_frame_with_stats(
                scene, cam, cfg, jnp.uint32(f)
            )
            total = total + segs
            f += 1
        s = int(total)
        best = max(best, s / frames / (time.perf_counter() - t0) / 1e6)
    return {"scene": which, "subs": int(scene.packed.n_tri_subs),
            "mrays": round(best, 3)}


WORKERS = {
    "gate": worker_gate,
    "gate_sub16": worker_gate_sub16,
    "ref16": worker_ref16,
    "mesh": worker_mesh,
    "gate_rowdrain": worker_gate_rowdrain,
    "scene": worker_scene,
}


def run_worker(name):
    out = {"worker": name, "tunnel_rtt_s": round(_tunnel_check(), 2)}
    out.update(WORKERS[name]())
    print("RESULT " + json.dumps(out), flush=True)


# ------------------------- orchestrator side --------------------------------


def spawn(name, env_knobs, tag=None):
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
    print(f"results -> {RESULTS}", flush=True)
    spawn("gate", {}, tag="output gate ts32/phases2 vs default")
    spawn("ref16", {}, tag="save SUB=32 small-frame reference")
    spawn("gate_sub16", {"RTX_MEGA_SUB": "16"},
          tag="output gate SUB=16 vs saved SUB=32")

    res = {}
    res["base"] = spawn("mesh", {}, tag="mesh TS=64 (default)")
    for ts in ("32", "48", "96"):
        res[f"ts{ts}"] = spawn("mesh", {"RTX_MEGA_TS": ts},
                               tag=f"mesh TS={ts}")
    res["ph2"] = spawn("mesh", {"RTX_MEGA_PHASES": "2"},
                       tag="mesh TS=64 phases=2")
    # best TS so far x phases=2
    best_ts = max(
        (r.get("mrays", 0.0), k) for k, r in res.items() if k != "ph2"
    )[1]
    ts_knob = {} if best_ts == "base" else {"RTX_MEGA_TS": best_ts[2:]}
    if best_ts != "base":
        res["ph2_bestts"] = spawn(
            "mesh", {**ts_knob, "RTX_MEGA_PHASES": "2"},
            tag=f"mesh {best_ts} phases=2",
        )
    res["sub16"] = spawn("mesh", {"RTX_MEGA_SUB": "16", **ts_knob},
                         tag=f"mesh SUB=16 {best_ts}")
    summary = {k: r.get("mrays", r.get("error", "?")) for k, r in res.items()}
    print("SUMMARY " + json.dumps(summary), flush=True)


def main_rowdrain():
    """Round-4 per-row 1-level drain A/B (run after the knob sweep)."""
    print(f"results -> {RESULTS}", flush=True)
    spawn("gate_rowdrain", {}, tag="rowdrain Mosaic output vs default")
    res = {}
    res["off"] = spawn("mesh", {}, tag="mesh rowdrain=0")
    res["on"] = spawn("mesh", {"RTX_MEGA_ROWDRAIN": "1"},
                      tag="mesh rowdrain=1")
    # interaction: multi-pixel lanes halve the row count (and the
    # per-iteration pop overhead) at unchanged per-row unions
    res["on_ppl2"] = spawn(
        "mesh", {"RTX_MEGA_ROWDRAIN": "1", "RTX_MEGA_PPL": "2"},
        tag="mesh rowdrain=1 ppl=2",
    )
    summary = {k: r.get("mrays", r.get("error", "?"))
               for k, r in res.items()}
    print("SUMMARY " + json.dumps(summary), flush=True)


def main_sizegate():
    """Rowdrain across the scene-size ladder (round-4 calibration of
    ROWDRAIN_MIN_SUBS; measured 2026-08-18: chess/186 subs -23%,
    8k/248 -29%, 20k/624 -8%, 70k/2188 +13% -> threshold 1024)."""
    print(f"results -> {RESULTS}", flush=True)
    for scene in ("chess", "8000", "20000", "70000"):
        res = {}
        for rd in ("0", "1"):
            res[rd] = spawn(
                "scene",
                {"RTX_AB_SCENE": scene, "RTX_MEGA_ROWDRAIN": rd},
                tag=f"{scene} rowdrain={rd}",
            )
        print(
            "SUMMARY "
            + json.dumps({
                "scene": scene,
                "off": res["0"].get("mrays", res["0"].get("error")),
                "on": res["1"].get("mrays", res["1"].get("error")),
            }),
            flush=True,
        )


if __name__ == "__main__":
    if "--worker" in sys.argv:
        run_worker(sys.argv[sys.argv.index("--worker") + 1])
    elif "--rowdrain" in sys.argv:
        main_rowdrain()
    elif "--sizegate" in sys.argv:
        main_sizegate()
    else:
        main()
