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
