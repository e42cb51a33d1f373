"""End-to-end parity: the TPU renderer vs the scalar NumPy transcription of
the reference shader, on a tiny scene exercising every feature (diffuse,
metal, emissive, checker, invisible light, env sun, defocus + AA jitter,
Russian roulette).

The two implementations share bit-exact RNG streams but order floating-point
geometry math differently (MXU contraction form vs scalar form), so paths can
diverge on knife-edge comparisons (hit boundaries, lottery thresholds).
Agreement is therefore statistical: the overwhelming majority of pixels must
match tightly, with a small budget of diverged-path outliers.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import reference_tracer as ref
from ray_tracing_extended_tpu.models.geometry import (
    FLAG_CHECKER,
    FLAG_INVISIBLE_LIGHT,
    Environment,
)
from ray_tracing_extended_tpu.models.scene import Material, SceneBuilder
from ray_tracing_extended_tpu.ops.camera import look_at
from ray_tracing_extended_tpu.render import render_frame
from ray_tracing_extended_tpu.utils.config import RenderConfig

W, H = 32, 18
MAX_BOUNCE = 4
SPP = 4


def _materials():
    return {
        "ground": dict(
            colour=(0.7, 0.7, 0.2),
            emission_colour=(0.2, 0.2, 0.7),
            specular_colour=(1.0, 1.0, 1.0),
            emission_strength=0.0,
            smoothness=0.0,
            specular_probability=0.02,
            flag=FLAG_CHECKER,
        ),
        "red": dict(
            colour=(0.9, 0.1, 0.1),
            emission_colour=(0.0, 0.0, 0.0),
            specular_colour=(1.0, 1.0, 1.0),
            emission_strength=0.0,
            smoothness=0.4,
            specular_probability=0.3,
            flag=0,
        ),
        "mirror": dict(
            colour=(0.8, 0.8, 0.8),
            emission_colour=(0.0, 0.0, 0.0),
            specular_colour=(0.95, 0.95, 0.95),
            emission_strength=0.0,
            smoothness=1.0,
            specular_probability=1.0,
            flag=0,
        ),
        "lamp": dict(
            colour=(0.0, 0.0, 0.0),
            emission_colour=(1.0, 0.9, 0.7),
            emission_strength=5.0,
            specular_colour=(1.0, 1.0, 1.0),
            smoothness=0.0,
            specular_probability=0.0,
            flag=FLAG_INVISIBLE_LIGHT,
        ),
        "green": dict(
            colour=(0.1, 0.8, 0.2),
            emission_colour=(0.0, 0.0, 0.0),
            specular_colour=(1.0, 1.0, 1.0),
            emission_strength=0.0,
            smoothness=0.0,
            specular_probability=0.0,
            flag=0,
        ),
    }


_SPHERES = {
    "ground": ((0.0, -20.5, 4.0), 20.0),
    "red": ((-0.7, 0.0, 4.0), 0.5),
    "mirror": ((0.7, 0.1, 4.5), 0.6),
    "lamp": ((0.0, 2.2, 4.0), 1.0),
}
_TRI = (
    np.array([[-1.6, -0.5, 3.0], [-1.0, -0.5, 3.4], [-1.4, 0.5, 3.2]], np.float32)
)

_ENV = dict(
    ground=np.array([0.35, 0.3, 0.35], np.float32),
    horizon=np.array([1.0, 1.0, 1.0], np.float32),
    zenith=np.array([0.08, 0.37, 0.73], np.float32),
    sun_focus=500.0,
    sun_intensity=100.0,
    sun_dir=np.array([0.57735, 0.57735, -0.57735], np.float32),
)

_CAM = dict(fov_y=60.0, focus=4.0, defocus=2.0, diverge=0.7)


def _build_jax_scene():
    mats = _materials()
    env = Environment(
        enabled=jnp.float32(1.0),
        ground_colour=jnp.asarray(_ENV["ground"]),
        sky_colour_horizon=jnp.asarray(_ENV["horizon"]),
        sky_colour_zenith=jnp.asarray(_ENV["zenith"]),
        sun_focus=jnp.float32(_ENV["sun_focus"]),
        sun_intensity=jnp.float32(_ENV["sun_intensity"]),
        sun_dir=jnp.asarray(_ENV["sun_dir"]),
    )
    b = SceneBuilder(env=env)
    for name, (c, r) in _SPHERES.items():
        b.add_sphere(c, r, Material(**mats[name]))
    n = np.cross(_TRI[1] - _TRI[0], _TRI[2] - _TRI[0])
    n = (n / np.linalg.norm(n)).astype(np.float32)
    b.add_triangles(
        _TRI[None], np.tile(n, (1, 3, 1)), Material(**mats["green"])
    )
    return b.build()


def _build_ref_scene():
    mats = {
        k: ref.Mat(
            colour=np.array(v["colour"], np.float32),
            emission_colour=np.array(v["emission_colour"], np.float32),
            specular_colour=np.array(v["specular_colour"], np.float32),
            emission_strength=v["emission_strength"],
            smoothness=v["smoothness"],
            specular_probability=v["specular_probability"],
            flag=v["flag"],
        )
        for k, v in _materials().items()
    }
    spheres = [
        ref.Sph(np.array(c, np.float32), r, mats[name])
        for name, (c, r) in _SPHERES.items()
    ]
    n = np.cross(_TRI[1] - _TRI[0], _TRI[2] - _TRI[0])
    n = (n / np.linalg.norm(n)).astype(np.float32)
    tris = [ref.Tri(_TRI[0], _TRI[1], _TRI[2], n, n, n, mats["green"])]
    env = ref.Env(
        enabled=True,
        ground=_ENV["ground"],
        horizon=_ENV["horizon"],
        zenith=_ENV["zenith"],
        sun_focus=_ENV["sun_focus"],
        sun_intensity=_ENV["sun_intensity"],
        sun_dir=_ENV["sun_dir"],
    )
    return spheres, tris, env


def _render_both(frame):
    scene = _build_jax_scene()
    cam = look_at(
        (0.0, 0.3, 0.0),
        (0.0, 0.0, 4.0),
        fov_y_deg=_CAM["fov_y"],
        focus_distance=_CAM["focus"],
        defocus_strength=_CAM["defocus"],
        diverge_strength=_CAM["diverge"],
    )
    cfg = RenderConfig(
        width=W, height=H, max_bounce=MAX_BOUNCE, spp=SPP, block_size=256
    )
    img_jax = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(frame)))

    spheres, tris, env = _build_ref_scene()
    rot = np.asarray(cam.rotation)
    img_ref = ref.render(
        spheres,
        tris,
        env,
        np.asarray(cam.position),
        rot,
        _CAM["fov_y"],
        np.float32(_CAM["focus"]),
        _CAM["defocus"],
        _CAM["diverge"],
        W,
        H,
        MAX_BOUNCE,
        SPP,
        frame,
    )
    return img_jax, img_ref


def test_render_parity_frame0():
    img_jax, img_ref = _render_both(frame=0)
    _assert_parity(img_jax, img_ref)


def test_render_parity_frame7():
    img_jax, img_ref = _render_both(frame=7)
    _assert_parity(img_jax, img_ref)


def _assert_parity(img_jax, img_ref):
    assert img_jax.shape == img_ref.shape
    assert not np.isnan(img_jax).any()
    rel = (np.abs(img_jax - img_ref) / (1.0 + np.abs(img_ref))).max(axis=-1)
    frac_tight = (rel < 3e-3).mean()
    # Most pixels follow identical paths (identical RNG streams); a small
    # fraction may diverge on knife-edge float comparisons, and the sharp
    # sun pow(x, 500) amplifies ulp-level direction differences.
    assert frac_tight > 0.93, f"only {frac_tight:.3f} of pixels match tightly"
    assert np.median(rel) < 1e-4
    # And diverged pixels are still individual-sample-level differences, not
    # systematic bias: mean error stays small.
    assert np.abs(img_jax - img_ref).mean() < 0.02
    assert abs(img_jax.mean() - img_ref.mean()) / img_ref.mean() < 0.03


def test_mesh_scene_parity_fbx_oracle():
    """Scene-scale parity for the triangle/import pipeline (VERDICT round-1
    next-step 6): Suzanne (968 FBX triangles) rendered by the framework vs
    the scalar oracle, sharing bit-exact RNG. Round-1 parity covered only
    spheres + one triangle."""
    from ray_tracing_extended_tpu.scene.fbx import load_fbx

    path = "/root/reference/Assets/Graphics/Suzanne.fbx"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    v, f, n = load_fbx(path)
    v = np.asarray(v, np.float32)
    lo, hi = v.min(0), v.max(0)
    v = (v - (lo + hi) / 2.0) / max(hi - lo) * 2.0
    v = v.astype(np.float32)
    v[:, 2] += 3.0  # in front of the camera (+z)
    n = np.asarray(n, np.float32)

    mat_spec = dict(
        colour=(0.8, 0.5, 0.2),
        emission_colour=(0.0, 0.0, 0.0),
        specular_colour=(1.0, 1.0, 1.0),
        emission_strength=0.0,
        smoothness=0.3,
        specular_probability=0.1,
        flag=0,
    )
    env = Environment(
        enabled=jnp.float32(1.0),
        ground_colour=jnp.asarray(_ENV["ground"]),
        sky_colour_horizon=jnp.asarray(_ENV["horizon"]),
        sky_colour_zenith=jnp.asarray(_ENV["zenith"]),
        sun_focus=jnp.float32(_ENV["sun_focus"]),
        sun_intensity=jnp.float32(_ENV["sun_intensity"]),
        sun_dir=jnp.asarray(_ENV["sun_dir"]),
    )
    b = SceneBuilder(env=env)
    b.add_mesh(v, f, Material(**mat_spec), normals=n)
    scene = b.build()

    rmat = ref.Mat(
        colour=np.array(mat_spec["colour"], np.float32),
        emission_colour=np.array(mat_spec["emission_colour"], np.float32),
        specular_colour=np.array(mat_spec["specular_colour"], np.float32),
        emission_strength=0.0,
        smoothness=0.3,
        specular_probability=0.1,
        flag=0,
    )
    # The oracle scans triangles in buffer order with the SAME world data:
    # scene.triangles carries the chunked order, so read back from the
    # built scene to keep both sides' geometry bit-identical.
    tp = np.asarray(scene.triangles.pos_a)
    eab = np.asarray(scene.triangles.edge_ab)
    eac = np.asarray(scene.triangles.edge_ac)
    tn_ = np.asarray(scene.triangles.n)
    na = np.asarray(scene.triangles.normal_a)
    nb = np.asarray(scene.triangles.normal_b)
    nc = np.asarray(scene.triangles.normal_c)
    live = (tn_ ** 2).sum(1) > 0
    tris = [
        ref.Tri(tp[i], tp[i] + eab[i], tp[i] + eac[i],
                na[i], nb[i], nc[i], rmat)
        for i in np.nonzero(live)[0]
    ]
    renv = ref.Env(
        enabled=True,
        ground=_ENV["ground"],
        horizon=_ENV["horizon"],
        zenith=_ENV["zenith"],
        sun_focus=_ENV["sun_focus"],
        sun_intensity=_ENV["sun_intensity"],
        sun_dir=_ENV["sun_dir"],
    )

    w, h, mb, spp = 24, 14, 2, 1
    cam = look_at(
        (0.0, 0.4, 0.0), (0.0, 0.0, 3.0),
        fov_y_deg=50.0, focus_distance=3.0,
        defocus_strength=0.0, diverge_strength=0.5,
    )
    cfg = RenderConfig(width=w, height=h, max_bounce=mb, spp=spp,
                       block_size=256)
    img_jax = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(0)))
    img_ref = ref.render(
        [], tris, renv,
        np.asarray(cam.position), np.asarray(cam.rotation),
        50.0, np.float32(3.0), 0.0, 0.5, w, h, mb, spp, 0,
    )
    _assert_parity(img_jax, img_ref)
