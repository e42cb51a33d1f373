"""JSON scene schema: field-for-field mirror of the reference's serialized
structs so scenes port 1:1 (SURVEY.md section 5 'Config / flag system').

Example::

    {
      "settings": {"maxBounceCount": 4, "numRaysPerPixel": 16},
      "camera": {"position": [0, 1, -4], "lookAt": [0, 0, 0], "fovY": 60,
                 "focusDistance": 4, "defocusStrength": 0,
                 "divergeStrength": 0.3},
      "environment": {"enabled": true, "groundColour": [0.35, 0.3, 0.35],
                      "skyColourHorizon": [1, 1, 1],
                      "skyColourZenith": [0.08, 0.37, 0.73],
                      "sunFocus": 500, "sunIntensity": 10,
                      "sunDirection": [0.5, 0.7, -0.5]},
      "spheres": [{"position": [0, 0, 0], "radius": 0.5,
                   "material": {"colour": [1, 0, 0], "smoothness": 0.5,
                                 "specularProbability": 0.1}}],
      "meshes": [{"obj": "bunny.obj",
                  "transform": {"position": [0, 0, 0],
                                 "rotationEulerDeg": [0, 90, 0],
                                 "scale": 1.0},
                  "material": {"colour": [0.8, 0.8, 0.8]},
                  "chunked": true}]
    }

Material fields default to the reference's defaults
(RayTracingMaterial.cs:21-28); ``flag`` accepts 0-3 or the names
"none" / "checker" / "invisibleLight" / "dielectric".

Two extensions support self-contained mirrors of the six reference
Unity scenes (scene/export.py writes them; VERDICT round-3 missing
item 4 - previously every scene-level test and the Balls Outdoors
bench secondary required /root/reference to be mounted):

* ``camera.rotation``: an explicit 3x3 local-to-world rotation
  (row-major nested lists, columns = right/up/forward) instead of
  ``lookAt`` - lossless round-trip of the Unity camera transform.
* mesh entries ``{"npz": "file.npz", "group": "g000", "material":
  {...}}``: pre-baked world-space triangle soup - arrays
  ``<group>_pos`` / ``<group>_nrm`` of shape (N, 3, 3) in the NPZ,
  exactly the reference's serialized localChunks after its per-frame
  world transform (RayTracedMesh.cs:42-51) - fed to
  SceneBuilder.add_triangles like the Unity importer does.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..models.geometry import Environment
from ..models.scene import Material, SceneBuilder
from ..ops.camera import look_at
from ..utils.config import RenderConfig

_FLAGS = {"none": 0, "checker": 1, "invisiblelight": 2, "dielectric": 3}


def _material(d: dict) -> Material:
    flag = d.get("flag", 0)
    if isinstance(flag, str):
        flag = _FLAGS[flag.lower()]
    return Material(
        colour=tuple(d.get("colour", (1, 1, 1))),
        emission_colour=tuple(d.get("emissionColour", (1, 1, 1))),
        specular_colour=tuple(d.get("specularColour", (1, 1, 1))),
        emission_strength=float(d.get("emissionStrength", 0.0)),
        smoothness=float(d.get("smoothness", 0.0)),
        specular_probability=float(d.get("specularProbability", 1.0)),
        flag=int(flag),
        ior=float(d.get("ior", 1.5 if flag == 3 else 1.0)),
    )


def _transform_matrix(t: dict) -> np.ndarray:
    pos = np.asarray(t.get("position", (0, 0, 0)), np.float64)
    deg = np.asarray(t.get("rotationEulerDeg", (0, 0, 0)), np.float64)
    scale = t.get("scale", 1.0)
    scale = (
        np.asarray(scale, np.float64)
        if isinstance(scale, (list, tuple))
        else np.full(3, float(scale))
    )
    rx, ry, rz = np.radians(deg)
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = (my @ mx @ mz) * scale  # Unity rotation order (ZXY applied)
    m[:3, 3] = pos
    return m


def load_json_scene(path, overrides: dict | None = None):
    """-> (scene, camera, config). Relative mesh paths resolve against the
    JSON file's directory."""
    path = Path(path)
    spec = json.loads(path.read_text())

    envd = spec.get("environment") or {}
    sun_dir = np.asarray(envd.get("sunDirection", (0, 1, 0)), np.float32)
    sun_dir = sun_dir / max(np.linalg.norm(sun_dir), 1e-20)
    env = Environment(
        enabled=np.float32(1.0 if envd.get("enabled") else 0.0),
        ground_colour=np.asarray(
            envd.get("groundColour", (0, 0, 0)), np.float32
        ),
        sky_colour_horizon=np.asarray(
            envd.get("skyColourHorizon", (0, 0, 0)), np.float32
        ),
        sky_colour_zenith=np.asarray(
            envd.get("skyColourZenith", (0, 0, 0)), np.float32
        ),
        sun_focus=np.float32(max(1.0, float(envd.get("sunFocus", 1)))),
        sun_intensity=np.float32(
            max(0.0, float(envd.get("sunIntensity", 0)))
        ),
        sun_dir=np.asarray(sun_dir),
    )

    b = SceneBuilder(env=env)
    for s in spec.get("spheres", []):
        b.add_sphere(
            np.asarray(s["position"], np.float32),
            float(s["radius"]),
            _material(s.get("material") or {}),
        )

    any_big_mesh = False
    npz_cache: dict = {}
    n_baked_tris = 0
    for m in spec.get("meshes", []):
        if "npz" in m:
            # pre-baked world-space triangle soup (module docstring):
            # one add_triangles chunk per group, like the Unity importer
            f_npz = path.parent / m["npz"]
            if f_npz not in npz_cache:
                npz_cache[f_npz] = np.load(f_npz)
            data = npz_cache[f_npz]
            g = m["group"]
            tp = np.asarray(data[f"{g}_pos"], np.float32)
            tn = np.asarray(data[f"{g}_nrm"], np.float32)
            b.add_triangles(tp, tn, _material(m.get("material") or {}))
            n_baked_tris += len(tp)
            continue
        if "obj" in m:
            from .mesh_io import load_obj

            v, f, n = load_obj(path.parent / m["obj"])
        elif "fbx" in m:
            from .fbx import load_fbx

            v, f, n = load_fbx(path.parent / m["fbx"])
        else:
            raise ValueError("mesh entry needs 'obj', 'fbx' or 'npz'")
        if len(f) > 4096:
            any_big_mesh = True
        b.add_mesh(
            np.asarray(v),
            np.asarray(f),
            _material(m.get("material") or {}),
            normals=n,
            transform=_transform_matrix(m.get("transform") or {}),
            chunked=bool(m.get("chunked", True)),
        )

    # baked scenes follow the Unity importer's LBVH rule (unity.py:480)
    scene = b.build(
        build_bvh="tri" if (any_big_mesh or n_baked_tris > 16384) else None
    )

    settings = spec.get("settings") or {}
    camd = spec.get("camera") or {}
    if "rotation" in camd:
        from ..ops.camera import camera_from_matrix

        cam = camera_from_matrix(
            np.asarray(camd.get("position", (0, 0, -3)), np.float32),
            np.asarray(camd["rotation"], np.float32),
            fov_y_deg=float(camd.get("fovY", 60.0)),
            focus_distance=float(camd.get("focusDistance", 1.0)),
            defocus_strength=float(camd.get("defocusStrength", 0.0)),
            diverge_strength=float(camd.get("divergeStrength", 0.3)),
        )
    else:
        cam = look_at(
            camd.get("position", (0, 0, -3)),
            camd.get("lookAt", (0, 0, 0)),
            up=camd.get("up", (0, 1, 0)),
            fov_y_deg=float(camd.get("fovY", 60.0)),
            focus_distance=float(camd.get("focusDistance", 1.0)),
            defocus_strength=float(camd.get("defocusStrength", 0.0)),
            diverge_strength=float(camd.get("divergeStrength", 0.3)),
        )
    cfg = RenderConfig(
        max_bounce=int(settings.get("maxBounceCount", 4)),
        spp=int(settings.get("numRaysPerPixel", 2)),
        width=int(settings.get("width", 1280)),
        height=int(settings.get("height", 720)),
        adaptive_spp=bool(settings.get("adaptiveSpp", False)),
        fast_scatter=bool(settings.get("fastScatter", False)),
    )
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return scene, cam, cfg.validate()
