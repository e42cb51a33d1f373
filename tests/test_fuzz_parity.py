"""Randomized megakernel-vs-XLA parity: seeded random scenes sweep the
packing edge cases (cluster counts straddling SUB boundaries, oversized-
sphere hoisting, mixed sphere/triangle slots, emissive/specular spreads)
that hand-written presets cannot cover. The XLA bounce loop is the
semantic reference; the megakernel must agree except for its documented
<=1-ulp RandomValue rounding (rare knife-edge path divergence)."""

import numpy as np
import jax.numpy as jnp

from ray_tracing_extended_tpu.kernels.megakernel import render_frame_mega
from ray_tracing_extended_tpu.models.scene import Material, SceneBuilder
from ray_tracing_extended_tpu.ops.camera import look_at
from ray_tracing_extended_tpu.render import render_frame
from ray_tracing_extended_tpu.utils.config import RenderConfig


def _random_scene(seed: int, with_ground: bool, with_tris: bool,
                  with_flags: bool = False):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    n = int(rng.integers(30, 70))  # straddles 1-3 SUB clusters
    for _ in range(n):
        pos = rng.uniform([-6, 0.2, -6], [6, 2.5, 6])
        # with_flags sprinkles the material FLAG paths (checker /
        # invisible-light / dielectric) so their feature-compiled kernel
        # branches get fuzzed, not just the preset coverage
        flag = int(rng.choice([0, 0, 1, 2, 3])) if with_flags else 0
        mat = Material(
            colour=tuple(rng.uniform(0.05, 1.0, 3)),
            emission_colour=tuple(rng.uniform(0, 1, 3)),
            emission_strength=float(rng.choice([0.0, 0.0, 2.0])),
            specular_colour=tuple(rng.uniform(0.5, 1.0, 3)),
            smoothness=float(rng.uniform(0, 1)),
            specular_probability=float(rng.uniform(0, 1)),
            flag=flag,
            ior=1.5 if flag == 3 else 1.0,
        )
        b.add_sphere(tuple(pos), float(rng.uniform(0.1, 0.6)), mat)
    if with_ground:
        # dwarfs the rest -> exercises the hoist path
        b.add_sphere((0.0, -500.0, 0.0), 500.0,
                     Material.lambertian((0.5, 0.5, 0.5)))
    if with_tris:
        a = rng.uniform([-5, 0, -5], [5, 3, 5], size=(40, 1, 3))
        pos = np.concatenate(
            [a, a + rng.uniform(-1, 1, (40, 1, 3)),
             a + rng.uniform(-1, 1, (40, 1, 3))], axis=1
        ).astype(np.float32)  # (40, 3 verts, 3)
        e1 = pos[:, 1] - pos[:, 0]
        e2 = pos[:, 2] - pos[:, 0]
        n = np.cross(e1, e2)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-8)
        normals = np.repeat(n[:, None, :], 3, axis=1)
        b.add_triangles(pos, normals, Material.lambertian(
            tuple(rng.uniform(0.2, 1.0, 3))))
    scene = b.build()
    cam = look_at((0, 2.5, -10), (0, 1, 0), fov_y_deg=45)
    cfg = RenderConfig(width=48, height=32, max_bounce=3, spp=1,
                       clamp_accumulate=False)
    return scene, cam, cfg


def _check(seed, with_ground, with_tris, prebuilt=None,
           with_flags=False):
    scene, cam, cfg = prebuilt or _random_scene(
        seed, with_ground, with_tris, with_flags
    )
    a = np.asarray(render_frame(scene, cam, cfg, jnp.uint32(seed)))
    m, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(seed),
                                interpret=True)
    m = np.asarray(m)
    assert not np.isnan(m).any()
    assert int(segs) > 0
    d = np.abs(a - m).max(axis=-1)
    frac = (d < 1e-3).mean()
    assert frac > 0.99, f"seed {seed}: only {frac:.3f} pixels tight"
    assert np.abs(a - m).mean() < 2e-3


def test_fuzz_spheres_with_hoisted_ground():
    built = _random_scene(7, True, False)
    assert built[0].packed.n_hoist == 1  # the criterion must fire
    _check(7, True, False, prebuilt=built)


def test_fuzz_mixed_spheres_tris():
    _check(11, False, True)


def test_fuzz_winner_mode_hoist_tris(monkeypatch):
    """The full combination: winner post-pass fetch (forced via the slot
    threshold) x hoisted oversized sphere x mixed sphere/tri slots."""
    from ray_tracing_extended_tpu.kernels import pack as pack_mod

    monkeypatch.setattr(pack_mod, "ONEHOT_MAX_SLOTS", 0)
    built = _random_scene(23, True, True)
    assert built[0].packed.fetch_mode == "winner"
    assert built[0].packed.n_hoist == 1
    _check(23, True, True, prebuilt=built)


def test_fuzz_material_flags():
    """Checker / invisible-light / dielectric flags randomly mixed: the
    feature-specialized kernel branches must agree with the XLA path."""
    built = _random_scene(31, False, False, with_flags=True)
    feats = set(built[0].packed.features)
    assert {"checker", "invisible", "dielectric"} <= feats
    _check(31, False, False, prebuilt=built)


def test_fuzz_perlane_modes_match_default(monkeypatch):
    """Random mixed scenes under RTX_MEGA_PERLANE 1 and 2: the per-lane
    cull drains must reproduce the default per-tile-union path on scenes
    that sweep the packing edge cases (cluster counts, hoisted ground,
    mixed sphere/tri slots) - near-bit-identity, since per-row pops only
    visit supersets and the encoded min-fold is idempotent."""
    import os

    for seed in (31, 37):
        built = _random_scene(seed, seed == 31, True)
        scene = built[0]
        p = scene.packed
        # the path must actually engage for the fuzz to mean anything
        assert p.n_sphere_subs_visit >= 2 or p.n_tri_subs >= 2, seed
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", "0")
        a, _ = render_frame_mega(built[0], built[1], built[2],
                                 jnp.uint32(seed), interpret=True)
        a = np.asarray(a)
        for mode in ("1", "2"):
            monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", mode)
            b, segs = render_frame_mega(built[0], built[1], built[2],
                                        jnp.uint32(seed), interpret=True)
            b = np.asarray(b)
            assert int(segs) > 0
            d = np.abs(a - b).max(axis=-1)
            assert (d == 0).mean() > 0.995, (
                f"seed {seed} mode {mode}: {(d > 0).mean():.4f} differ"
            )


def test_fuzz_perlane_two_word_bits(monkeypatch):
    """> 24 sub-clusters exercise the two-accumulator bit build (ranks
    >= 24 ride a second f32 word combined at the SMEM extract)."""
    import os

    rng = np.random.default_rng(41)
    b = SceneBuilder()
    for _ in range(820):
        pos = rng.uniform([-8, 0.2, -8], [8, 3.0, 8])
        b.add_sphere(tuple(pos), float(rng.uniform(0.05, 0.25)),
                     Material.lambertian(tuple(rng.uniform(0.2, 1.0, 3))))
    scene = b.build()
    p = scene.packed
    assert p.n_sphere_supers <= 1 and 25 <= p.n_sphere_subs_visit <= 31, (
        p.n_sphere_subs_visit
    )
    cam = look_at((0, 3.0, -14), (0, 1, 0), fov_y_deg=45)
    cfg = RenderConfig(width=48, height=32, max_bounce=2, spp=1,
                       clamp_accumulate=False)
    monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", "0")
    a, _ = render_frame_mega(scene, cam, cfg, jnp.uint32(5),
                             interpret=True)
    a = np.asarray(a)
    for mode in ("1", "2"):
        monkeypatch.setitem(os.environ, "RTX_MEGA_PERLANE", mode)
        m, segs = render_frame_mega(scene, cam, cfg, jnp.uint32(5),
                                    interpret=True)
        m = np.asarray(m)
        assert int(segs) > 0
        d = np.abs(a - m).max(axis=-1)
        assert (d == 0).mean() > 0.995, (
            f"mode {mode}: {(d > 0).mean():.4f} differ"
        )
