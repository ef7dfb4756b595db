"""Tests for the RL renderer, workbench, and simplified FB renderer."""
import jax
import numpy as np
import pytest

from raytracer_tpu.compare.rl_renderer import (RayTracerRL, create_test_scene,
                                               render_guided)
from raytracer_tpu.compare.simplified_fb import SimplifiedFBRenderer, find_model
from raytracer_tpu.compare.workbench import (check_model_exists,
                                             compare_rl_vs_random,
                                             evaluate_policy,
                                             orthographic_render)
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_v1
from raytracer_tpu.fb.config import FBConfig
from raytracer_tpu.scene import library


def test_rl_renderer_fallback_and_render():
    rt = RayTracerRL(model_path=None)
    assert not rt.use_rl
    img = rt.render_single_view(width=40, height=30, use_rl=True)
    assert img.shape == (30, 40, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0          # lights/surfaces visible


def test_render_guided_with_policy():
    scene = create_test_scene()

    def policy(obs):
        import jax.numpy as jnp
        a = jnp.zeros(obs.shape[:-1] + (2,), obs.dtype)
        return a          # theta=0: straight along normal

    img = render_guided(scene, policy, jax.random.key(0), width=32,
                        height=24, max_bounces=3)
    assert np.isfinite(img).all()


def test_workbench_eval_and_compare(tmp_path):
    scene, gl, pl = training_scene_v1()
    env = RayTracerEnv(scene, image_width=64, image_height=64, fov=90,
                       max_bounces=4, global_lights=gl, point_lights=pl,
                       variant="rl")
    res = evaluate_policy(env, None, episodes=32)
    assert res["episodes"] == 32
    assert np.isfinite(res["avg_reward"])
    cmp = compare_rl_vs_random(env, lambda obs: np.zeros((obs.shape[0], 2),
                                                         np.float32),
                               episodes=32,
                               out_path=tmp_path / "cmp.json")
    assert (tmp_path / "cmp.json").exists()
    assert "rays_per_light_hit" in cmp


def test_model_discovery(tmp_path):
    assert check_model_exists("nonexistent_model", tmp_path) is None
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "foo.pkl").write_bytes(b"x")
    assert check_model_exists("foo", tmp_path) is not None
    assert find_model(tmp_path / "nope") is None
    fbdir = tmp_path / "fb_training_outputs"
    fbdir.mkdir()
    (fbdir / "ck.npz").write_bytes(b"x")
    assert find_model(fbdir).name == "ck.npz"


def test_orthographic_render():
    scene = create_test_scene()
    img = orthographic_render(scene, width=64, height=48)
    assert img.shape == (48, 64, 3)
    # The big gray ground and colored spheres should appear.
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 2


def test_simplified_fb_renderer():
    scene, gl, pl, p = library.custom_scene()
    sun_idx = int(np.nonzero(np.asarray(scene.id) == 7)[0][0])
    cfg = FBConfig(z_dim=16, e_hidden_dim=64, f_hidden_dim=64,
                   b_hidden_dim=32, max_bounces=4)
    r = SimplifiedFBRenderer(scene, sun_idx, config=cfg)
    img = r.render_original_style(width=24, height=24, max_bounces=3,
                                  camera_position=p["camera_position"])
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
    assert r.stats["rays_per_second"] > 0
    # fb_prob=0 without a model → no fb calls.
    assert r.stats["fb_used"] == 0
