"""Native imageio + CLI smoke tests."""
import subprocess
import sys

import numpy as np
import pytest

from raytracer_tpu.utils import io as rio


def test_native_build_and_png_roundtrip(tmp_path):
    lib = rio._load()
    assert lib is not None, "native imageio failed to build"
    img = (np.random.default_rng(0).uniform(0, 255, (20, 30, 3))
           .astype(np.uint8))
    p = tmp_path / "x.png"
    rio.save_image(p, img)
    from PIL import Image
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)
    # PPM too.
    p2 = tmp_path / "y.ppm"
    rio.save_image(p2, img)
    back2 = np.asarray(Image.open(p2))
    np.testing.assert_array_equal(back2, img)


def test_quantise_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.uniform(-0.2, 1.2, (64, 64, 3)).astype(np.float32)
    native = rio.quantise_unit(img)
    ref = np.asarray(np.round(np.clip(img, 0, 1) * 255.0), np.uint8)
    np.testing.assert_array_equal(native, ref)


def test_cli_interactive_menu(capsys):
    """The reference's input() menu flows (RL/ray_tracer_rl_complete.py:
    498-545) as the `interactive` subcommand, with injected input."""
    import argparse

    from raytracer_tpu.cli import cmd_interactive

    args = argparse.Namespace(seed=0)
    feeds = iter(["4"])                      # show integration example
    cmd_interactive(args, input_fn=lambda _: next(feeds))
    out = capsys.readouterr().out
    assert "4. Show integration example" in out
    assert "INTEGRATION EXAMPLE" in out
    assert "guide_fn" in out

    feeds = iter(["2", "no_such_model_xyz"])  # evaluate: missing model
    cmd_interactive(args, input_fn=lambda _: next(feeds))
    out = capsys.readouterr().out
    assert "not found" in out


def test_cli_render(tmp_path):
    out = tmp_path / "r.png"
    cmd = [sys.executable, "-m", "raytracer_tpu.cli", "render",
           "--scene", "marbles4", "--out", str(out)]
    env = {"PYTHONPATH": ".", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=500,
                       cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (201, 201, 3)
    assert img.max() > 10
