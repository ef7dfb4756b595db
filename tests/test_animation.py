"""Multi-frame serving path (render/animation.py): look-at cameras, orbit
paths, and the one-dispatch frame-batched renderer.

The reference renders one fixed-camera frame per script run; the batched
renderer must reproduce the single-frame renderer exactly, frame by frame.
"""
import json
import os

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.render.animation import (camera_path_rays, lerp_eyes,
                                            look_at_rays, orbit_eyes,
                                            render_whitted_frames,
                                            scene_focus)
from raytracer_tpu.render.renderer import render_whitted
from raytracer_tpu.scene import library


def test_orbit_eyes_radius_count_and_closure():
    center = (1.0, 0.0, -2.0)
    eyes = np.asarray(orbit_eyes(center, 3.0, 5.0, 8))
    assert eyes.shape == (8, 3)
    d = np.hypot(eyes[:, 0] - center[0], eyes[:, 2] - center[2])
    np.testing.assert_allclose(d, 3.0, rtol=1e-6)
    assert (eyes[:, 1] == 5.0).all()
    # full turn: endpoint excluded (frame 8 would repeat frame 0)
    assert not np.allclose(eyes[0], eyes[-1])
    # partial arc: endpoints included
    arc = np.asarray(orbit_eyes(center, 3.0, 5.0, 3, sweep=np.pi))
    np.testing.assert_allclose(arc[0, [0, 2]], [center[0], center[2] + 3.0],
                               atol=1e-6)
    np.testing.assert_allclose(arc[-1, [0, 2]], [center[0], center[2] - 3.0],
                               atol=1e-6)


def test_lerp_eyes_endpoints():
    path = np.asarray(lerp_eyes((0, 0, 0), (2, 4, 6), 5))
    np.testing.assert_allclose(path[0], [0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(path[-1], [2, 4, 6], atol=1e-6)
    np.testing.assert_allclose(path[2], [1, 2, 3], atol=1e-6)


def test_look_at_center_pixel_points_at_target():
    eye = jnp.asarray([3.0, 2.0, 5.0])
    target = jnp.asarray([0.0, 1.0, -1.0])
    w, h = 33, 25                       # odd: centre pixel has sx = sy = 0
    origins, dirs = look_at_rays(w, h, eye=eye, target=target, fov=70.0)
    centre = np.asarray(dirs.reshape(h, w, 3)[h // 2, w // 2])
    want = np.asarray(target - eye)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(centre, want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(origins[0]), np.asarray(eye),
                               atol=1e-7)
    # all directions unit length
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1),
                               1.0, atol=1e-5)


def test_frames_match_single_frame_renderer():
    # true_original has global+point lights; custom_scene shades only via
    # the experiment harness's own path tracer and would render flat
    # background under terminalRGB from any viewpoint.
    scene, gl, pl, p = library.true_original_scene()
    # Orbit the canonical lit side (camera_position (0,0,1) looks down -z):
    # frame 0 starts at +z, so at least one frame shows lit geometry.
    target = (0.0, 0.0, 0.0)
    eyes = orbit_eyes(target, 3.0, 0.5, 3)
    w, h = 24, 18
    origins, dirs = camera_path_rays(eyes, target, w, h, fov=60.0)
    assert origins.shape == (3, w * h, 3)

    frames = render_whitted_frames(scene, gl, pl, origins, dirs, h, w,
                                   max_bounces=p["max_bounces"],
                                   background=p["background"])
    assert frames.shape == (3, h, w, 3)
    for i in range(3):
        single = render_whitted(scene, gl, pl, origins[i], dirs[i], h, w,
                                max_bounces=p["max_bounces"],
                                background=p["background"])
        np.testing.assert_allclose(np.asarray(frames[i]), np.asarray(single),
                                   rtol=2e-6, atol=2e-6)
    # the orbit actually moves the camera
    assert not np.allclose(np.asarray(frames[0]), np.asarray(frames[1]))


def test_scene_focus_ignores_walls():
    scene, _, _, _ = library.chandelier_scene()
    focus = scene_focus(scene)
    # chandelier core is around (0, 4, 8); wall spheres are r=99 at ±100
    assert abs(focus[0]) < 3.0 and 0.0 < focus[1] < 10.0 and 2.0 < focus[2] < 12.0


def test_look_at_jitter_default_matches_half_offset():
    import jax.numpy as jnp
    eye, target = jnp.asarray([0.0, 1.0, 4.0]), jnp.asarray([0.0, 0.0, 0.0])
    o1, d1 = look_at_rays(9, 7, eye=eye, target=target, fov=50.0)
    half = jnp.full((7, 9, 2), 0.5)
    o2, d2 = look_at_rays(9, 7, eye=eye, target=target, fov=50.0,
                          sample_xy=half)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)


def test_path_frames_deterministic_and_guided():
    import jax

    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.render.animation import render_path_frames
    scene, gl, pl, p = library.chandelier_scene()
    target = scene_focus(scene)
    eyes = orbit_eyes(target, 6.0, 2.0, 2)
    kw = dict(width=24, height=12, spp=2, max_bounces=3,
              background=(2.0, 2.0, 5.0))
    f1, s1 = render_path_frames(scene, jax.random.key(0), eyes, target, **kw)
    f2, s2 = render_path_frames(scene, jax.random.key(0), eyes, target, **kw)
    assert f1.shape == (2, 12, 24, 3)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert int(s1.total_rays) == int(s2.total_rays) > 0
    assert not np.allclose(np.asarray(f1[0]), np.asarray(f1[1]))

    guide = DistilledGuide.load("models/fb_chandelier_distilled.npz")
    fg, sg = render_path_frames(scene, jax.random.key(0), eyes, target,
                                guide_fn=guide.as_guide_fn(), fb_prob=1.0,
                                **kw)
    assert fg.shape == (2, 12, 24, 3)
    assert int(sg.fb_used) > 0
    assert np.isfinite(np.asarray(fg)).all()


def test_sharded_frames_match_single_device():
    from raytracer_tpu.parallel.mesh import (make_mesh,
                                             render_whitted_frames_sharded)
    scene, gl, pl, p = library.true_original_scene()
    eyes = orbit_eyes((0.0, 0.0, 0.0), 3.0, 0.5, 5)     # 5 frames → pad to 8
    w, h = 16, 12
    origins, dirs = camera_path_rays(eyes, (0.0, 0.0, 0.0), w, h, fov=60.0)
    single = render_whitted_frames(scene, gl, pl, origins, dirs, h, w,
                                   max_bounces=p["max_bounces"],
                                   background=p["background"])
    mesh = make_mesh(8, tp=1)
    sharded = render_whitted_frames_sharded(mesh, scene, gl, pl, origins,
                                            dirs, h, w,
                                            max_bounces=p["max_bounces"],
                                            background=p["background"])
    assert sharded.shape == single.shape == (5, h, w, 3)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-6, atol=2e-6)


def test_save_apng_roundtrip(tmp_path):
    from PIL import Image

    from raytracer_tpu.utils.io import save_apng
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 8, 6, 3), dtype=np.uint8)
    p = tmp_path / "anim.png"
    save_apng(p, frames, fps=5)
    im = Image.open(p)
    assert getattr(im, "n_frames", 1) == 3
    for i in range(3):
        im.seek(i)
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")),
                                      frames[i])


def test_cli_animate_writes_frames_and_stats(tmp_path, capsys):
    from raytracer_tpu.cli import main
    out = tmp_path / "anim"
    main(["animate", "--scene", "custom", "--frames", "2", "--width", "16",
          "--height", "12", "--out-dir", str(out)])
    files = sorted(os.listdir(out))
    assert "frame_000.png" in files and "frame_001.png" in files
    assert "contact_sheet.png" in files and "animation.png" in files
    stats = json.loads((out / "animation_stats.json").read_text())
    assert stats["frames"] == 2 and stats["wall_s"] > 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["frames"] == 2


def test_cli_animate_path_tracer(tmp_path, capsys):
    from raytracer_tpu.cli import main
    out = tmp_path / "anim_path"
    main(["animate", "--scene", "chandelier", "--tracer", "path",
          "--frames", "2", "--width", "16", "--height", "8", "--spp", "1",
          "--bounces", "2", "--out-dir", str(out)])
    stats = json.loads((out / "animation_stats.json").read_text())
    assert stats["tracer"] == "path" and stats["total_rays"] > 0
    assert not stats["guided"]
    assert (out / "animation.png").exists()


def test_cli_animate_template_scene(tmp_path, capsys):
    """Template scenes animate through the path tracer with registry
    routing (the cornell student); whitted is rejected (templates have no
    global/point lights)."""
    import pytest as _pytest

    from raytracer_tpu.cli import main
    out = tmp_path / "anim_cornell"
    main(["animate", "--scene", "cornell_box:1007", "--tracer", "path",
          "--guide", "registry", "--frames", "2", "--width", "16",
          "--height", "8", "--spp", "1", "--bounces", "2",
          "--out-dir", str(out)])
    stats = json.loads((out / "animation_stats.json").read_text())
    assert stats["tracer"] == "path" and stats["total_rays"] > 0
    with _pytest.raises(SystemExit):
        main(["animate", "--scene", "cornell_box:1007",
              "--out-dir", str(out)])          # whitted on a template
    with _pytest.raises(SystemExit):
        main(["animate", "--scene", "nope", "--tracer", "path",
              "--out-dir", str(out)])
