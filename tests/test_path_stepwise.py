"""Stepwise vs fused path tracer equivalence (same key schedule →
bit-identical output)."""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.render.camera import perspective_rays
from raytracer_tpu.scene import library
from raytracer_tpu.trace.path import trace_path


def _run(impl, guide=None, fb_prob=1.0):
    scene, _, _, p = library.chandelier_scene()
    o, d = perspective_rays(32, 16, fov=60, origin=p["camera_position"],
                            variant="fb")
    return trace_path(scene, o, d, jax.random.key(7), max_bounces=4,
                      mirror_threshold=0.0, guide_fn=guide, fb_prob=fb_prob,
                      impl=impl)


def test_stepwise_matches_fused_traditional():
    rgb_f, st_f = _run("fused")
    rgb_s, st_s = _run("stepwise")
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_s))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits"):
        assert int(getattr(st_f, f)) == int(getattr(st_s, f)), f


def test_stepwise_matches_fused_guided():
    def guide(obs):
        return jnp.stack([jnp.tanh(obs[..., 0]),
                          jnp.tanh(obs[..., 1])], axis=-1)

    scene, _, _, p = library.chandelier_scene()
    o, d = perspective_rays(32, 16, fov=60, origin=p["camera_position"],
                            variant="fb")
    rgb_f, st_f = trace_path(scene, o, d, jax.random.key(3), max_bounces=4,
                             mirror_threshold=0.9, guide_fn=guide,
                             fb_prob=0.7, impl="fused")
    rgb_s, st_s = trace_path(scene, o, d, jax.random.key(3), max_bounces=4,
                             mirror_threshold=0.9, guide_fn=guide,
                             fb_prob=0.7, impl="stepwise")
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_s))
    assert int(st_f.fb_used) == int(st_s.fb_used)


def test_full_agent_fused_spec_matches_unfused():
    """The full TrainedFBAgent fuses into the stepwise level kernel
    (fb/inference.py _AgentApply) with bit-identical output to the
    separate-dispatch guide (same key schedule, same casts)."""
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices

    scene, _, _, p = library.chandelier_scene()
    agent = TrainedFBAgent(None, scene, small_light_indices(scene),
                           p["camera_position"],
                           config=FBConfig(z_dim=16, e_hidden_dim=64,
                                           f_hidden_dim=64, b_hidden_dim=32,
                                           max_bounces=4))
    o, d = perspective_rays(32, 16, fov=60, origin=p["camera_position"],
                            variant="fb")

    fused_in = agent.as_guide_fn(dtype=None)
    assert len(fused_in._fused_spec) == 3
    rgb_a, st_a = trace_path(scene, o, d, jax.random.key(5), max_bounces=4,
                             mirror_threshold=0.9, guide_fn=fused_in,
                             fb_prob=0.7, impl="stepwise")

    unfused = agent.as_guide_fn(dtype=None)
    del unfused._fused_spec                 # force the separate-dispatch path
    rgb_b, st_b = trace_path(scene, o, d, jax.random.key(5), max_bounces=4,
                             mirror_threshold=0.9, guide_fn=unfused,
                             fb_prob=0.7, impl="stepwise")
    np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
    assert int(st_a.fb_used) == int(st_b.fb_used) > 0
