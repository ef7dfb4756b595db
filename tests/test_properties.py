"""Property, determinism, and multi-device tests — the upgrades SURVEY.md §4
prescribes over the reference's assertion-free smoke blocks."""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.parallel.mesh import (make_mesh, render_path_sharded,
                                         render_whitted_sharded,
                                         shard_fb_params)
from raytracer_tpu.render.camera import grid_rays, perspective_rays
from raytracer_tpu.render.renderer import render_whitted
from raytracer_tpu.render.path_renderer import render_path
from raytracer_tpu.scene import library
from raytracer_tpu.trace import sampling
from raytracer_tpu.trace.whitted import trace_whitted


def test_render_deterministic_same_key():
    scene, _, _, p = library.chandelier_scene()
    img1, _ = render_path(scene, jax.random.key(42), width=32, height=16,
                          spp=2, max_bounces=3,
                          camera_position=p["camera_position"])
    img2, _ = render_path(scene, jax.random.key(42), width=32, height=16,
                          spp=2, max_bounces=3,
                          camera_position=p["camera_position"])
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_different_keys_differ():
    scene, _, _, p = library.chandelier_scene()
    img1, _ = render_path(scene, jax.random.key(1), width=32, height=16,
                          spp=2, max_bounces=3,
                          camera_position=p["camera_position"])
    img2, _ = render_path(scene, jax.random.key(2), width=32, height=16,
                          spp=2, max_bounces=3,
                          camera_position=p["camera_position"])
    assert not np.array_equal(np.asarray(img1), np.asarray(img2))


def test_traced_normals_unit():
    scene, _, _, p = library.marbles4_scene()
    origins, dirs, h, w = grid_rays(20, 0.01, 1, origin=p["camera_position"])
    res = trace_whitted(scene, origins, dirs, max_bounces=8)
    n = np.asarray(res.normal)[np.asarray(res.hit)]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_sampled_directions_unit_and_hemisphere(rng):
    normal = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    for conv in ("env", "renderer", "trainer"):
        d = sampling.cosine_weighted(jax.random.key(0), normal, conv)
        dn = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(dn, axis=-1), 1.0,
                                   atol=1e-5)
        # Cosine-weighted samples lie in the upper hemisphere.
        cos = np.sum(dn * np.asarray(normal), axis=-1)
        assert (cos > -1e-5).all()


def test_path_sample_colours_bounded():
    scene, _, _, p = library.chandelier_scene()
    from raytracer_tpu.trace.path import trace_path
    o, d = perspective_rays(16, 8, fov=60, origin=p["camera_position"],
                            variant="fb")
    rgb, _ = trace_path(scene, o, d, jax.random.key(0), max_bounces=5,
                        mirror_threshold=0.0)
    a = np.asarray(rgb)
    assert (a >= 0).all() and (a <= 255).all()


def test_sharded_render_matches_single_device():
    mesh = make_mesh(8, tp=1)
    scene, gl, pl, p = library.true_original_scene()
    origins, dirs, h, w = grid_rays(16, 1.0 / 16, 1,
                                    origin=p["camera_position"])
    ref = render_whitted(scene, gl, pl, origins, dirs, h, w, max_bounces=3,
                         background=p["background"])
    out = render_whitted_sharded(mesh, scene, gl, pl, origins, dirs, h, w,
                                 max_bounces=3, background=p["background"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_chunked_render_matches_whole_wavefront():
    """chunk_rays (mega-frame HBM bound) must be invisible in the pixels,
    including a padded last chunk."""
    scene, gl, pl, p = library.planets2_scene()
    origins, dirs, h, w = grid_rays(30, 1.0 / 30, 1,
                                    origin=p["camera_position"])
    kw = dict(max_bounces=p["max_bounces"], background=p["background"])
    ref = render_whitted(scene, gl, pl, origins, dirs, h, w, **kw)
    out = render_whitted(scene, gl, pl, origins, dirs, h, w,
                         chunk_rays=1000, **kw)       # 61*61=3721 → pad
    # 1-ulp tolerance: a different wavefront shape compiles to different
    # fusion/reduction groupings, reassociating float ops.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sharded_path_render_matches_single_device():
    """Dp-sharded path render ≡ single-device, including stats counters —
    the render_whitted twin VERDICT r1 asked for (item 7)."""
    mesh = make_mesh(8, tp=1)
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(7)
    kw = dict(width=16, height=16, spp=4, max_bounces=3,
              camera_position=p["camera_position"],
              background=p["background"])
    ref, rstats = render_path(scene, key, impl="stepwise", **kw)
    out, ostats = render_path_sharded(mesh, scene, key, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert int(ostats.total_rays) == int(rstats.total_rays)
    assert int(ostats.light_hits) == int(rstats.light_hits)


def test_sharded_path_render_guided_dp_tp():
    """Guided path render over a dp×tp mesh: guide params tp-sharded, obs
    dp-sharded; must equal the single-device guided render."""
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices

    scene, _, _, p = library.chandelier_scene()
    cfg = FBConfig(z_dim=32, e_hidden_dim=256, f_hidden_dim=256,
                   b_hidden_dim=128)
    fb = TrainedFBAgent(None, scene, small_light_indices(scene),
                        p["camera_position"], config=cfg, seed=0)
    key = jax.random.key(11)
    kw = dict(width=16, height=16, spp=2, max_bounces=3,
              camera_position=p["camera_position"],
              background=p["background"])
    ref, rstats = render_path(scene, key, impl="stepwise",
                              guide_fn=fb.as_guide_fn(), **kw)

    mesh = make_mesh(8, tp=2)
    fb.params = {k: shard_fb_params(mesh, v) for k, v in fb.params.items()}
    out, ostats = render_path_sharded(mesh, scene, key,
                                      guide_fn=fb.as_guide_fn(), **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert int(ostats.fb_used) == int(rstats.fb_used)


def test_threaded_key_independence():
    """Splitting keys yields independent streams: per-level keys in the
    stepwise tracer match the fused scan schedule (covered elsewhere) and
    fold/split here is associativity-free."""
    k = jax.random.key(0)
    k1, k2 = jax.random.split(k)
    a = jax.random.uniform(k1, (8,))
    b = jax.random.uniform(k2, (8,))
    assert not np.allclose(np.asarray(a), np.asarray(b))
