"""CLI smoke tests: the render / compare entry points drive the whole
public stack (scene loading, progressive accumulation, PNG export,
cross-intersector comparison) end to end at tiny sizes on CPU."""

import json

import numpy as np

from ray_tracing_extended_tpu.cli import main


def test_cli_render_png_and_metrics(tmp_path):
    out = tmp_path / "out.png"
    metrics = tmp_path / "m.jsonl"
    rc = main([
        "render", "--scene", "preset:three_sphere",
        "--width", "64", "--height", "36", "--spp", "1",
        "--frames", "2", "--out", str(out), "--metrics", str(metrics),
    ])
    assert rc == 0
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["mrays_per_s"] > 0
    assert "alive_frac" in lines[0]
    assert "accum_var" in lines[1]  # Welford variance needs n >= 2 frames


def test_cli_render_npy_hdr(tmp_path):
    out = tmp_path / "out.npy"
    rc = main([
        "render", "--scene", "preset:three_sphere",
        "--width", "48", "--height", "32", "--spp", "1", "--hdr",
        "--frames", "1", "--out", str(out),
    ])
    assert rc == 0
    img = np.load(out)
    assert img.shape == (32, 48, 3) and img.dtype == np.float32
    assert not np.isnan(img).any()


def test_cli_render_checkpoint_resume(tmp_path):
    ck = tmp_path / "ck.npz"
    args = [
        "render", "--scene", "preset:three_sphere",
        "--width", "48", "--height", "32", "--spp", "1",
        "--checkpoint", str(ck), "--checkpoint-every", "1",
    ]
    assert main(args + ["--frames", "2"]) == 0
    assert ck.exists()
    # resume continues the accumulation: --frames more ON TOP of the
    # checkpointed 2 (progressive renders [start, start + frames))
    assert main(args + ["--frames", "4", "--resume"]) == 0
    saved = np.load(ck)
    assert int(saved["frame"]) == 6


def test_cli_compare_agrees():
    rc = main([
        "compare", "--scene", "preset:three_sphere",
        "--width", "48", "--height", "32", "--spp", "2",
        "--a", "bruteforce", "--b", "bruteforce",
    ])
    assert rc == 0


def test_cli_unknown_preset_errors():
    import pytest

    with pytest.raises(SystemExit):
        main(["render", "--scene", "preset:nope"])


def test_cli_flythrough_sharded(tmp_path):
    """--flythrough N --mesh 1x2: the (downscaled) BASELINE config-5
    command - an N-camera dolly path rendered band-sharded over the
    virtual mesh, accumulated, exported (VERDICT round-2 item 3)."""
    out = tmp_path / "fly.npy"
    metrics = tmp_path / "fly.jsonl"
    rc = main([
        "render", "--scene", "preset:rtiow",
        "--width", "64", "--height", "64",
        "--flythrough", "2", "--mesh", "1x2",
        "--out", str(out), "--metrics", str(metrics),
    ])
    assert rc == 0
    img = np.load(out)
    assert img.shape == (64, 64, 3) and not np.isnan(img).any()
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["mesh"] == {"spp": 1, "tiles": 2}


def test_cli_mesh_arg_errors():
    import pytest

    with pytest.raises(SystemExit, match="SPPxTILES"):
        main([
            "render", "--scene", "preset:three_sphere", "--mesh", "bogus",
        ])
    with pytest.raises(SystemExit, match="devices"):
        main([
            "render", "--scene", "preset:three_sphere", "--mesh", "4x4",
        ])


def test_cli_render_batched(tmp_path):
    """--batch K drives the fused cost-paired progressive path from the
    CLI; output must match the per-frame render exactly (the batched
    fold differs by <= 1 ulp/step, so compare with a tiny tolerance)."""
    import numpy as np

    out_a = tmp_path / "a.npy"
    out_b = tmp_path / "b.npy"
    rc = main(["render", "--scene", "preset:three_sphere", "--width", "48",
               "--height", "24", "--spp", "2", "--frames", "4",
               "--out", str(out_a)])
    assert rc == 0
    rc = main(["render", "--scene", "preset:three_sphere", "--width", "48",
               "--height", "24", "--spp", "2", "--frames", "4",
               "--batch", "2", "--out", str(out_b)])
    assert rc == 0
    a, b = np.load(out_a), np.load(out_b)
    assert a.shape == (24, 48, 3)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_cli_flythrough_reset_on_move(tmp_path):
    out = tmp_path / "fly.npy"
    rc = main([
        "render", "--scene", "preset:rtiow", "--width", "48",
        "--height", "32", "--spp", "1", "--max-bounce", "2",
        "--flythrough", "2", "--reset-on-move", "--out", str(out),
    ])
    assert rc == 0
    import numpy as np

    img = np.load(out)
    assert img.shape == (32, 48, 3) and not np.isnan(img).any()


def test_cli_reset_on_move_needs_flythrough():
    import pytest

    with pytest.raises(SystemExit, match="flythrough"):
        main(["render", "--scene", "preset:three_sphere",
              "--reset-on-move"])
