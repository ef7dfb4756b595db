"""Int8 quantized full-agent inference (fb/quantize.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.fb.config import FBConfig
from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices
from raytracer_tpu.fb.quantize import (Int8AgentApply, make_int8_guide,
                                       quantize_agent_params,
                                       quantize_kernel)
from raytracer_tpu.scene import library


def test_quantize_kernel_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_kernel(k)
    assert q.dtype == np.int8 and s.shape == (32,)
    err = np.abs(q.astype(np.float32) * s - k)
    # per-channel symmetric int8: error <= scale/2 per element
    assert (err <= s / 2 + 1e-6).all()


def test_quantize_zero_column_safe():
    k = np.zeros((8, 4), np.float32)
    q, s = quantize_kernel(k)
    assert (q == 0).all() and (s == 1.0).all()


@pytest.fixture(scope="module")
def agent():
    scene, _, _, p = library.chandelier_scene()
    return TrainedFBAgent("models/fb_chandelier_trained.npz", scene,
                          small_light_indices(scene),
                          p["camera_position"]), scene, p


def test_int8_matches_f32_actions(agent):
    ag, scene, p = agent
    rng = np.random.default_rng(1)
    obs = rng.normal(scale=0.5, size=(256, ag.config.obs_dim)) \
             .astype(np.float32)
    obs[:, :3] = rng.uniform(-10, 10, (256, 3))       # positions
    ref = np.asarray(ag.as_guide_fn(dtype=None)(jnp.asarray(obs)))
    q = np.asarray(ag.as_guide_fn(dtype="int8")(jnp.asarray(obs)))
    assert q.shape == ref.shape
    # quantization steers the same way: small absolute error on a
    # tanh-bounded [-0.95, 0.95] output
    assert np.abs(q - ref).max() < 0.15
    assert np.abs(q - ref).mean() < 0.03


def test_int8_apply_is_static_hashable(agent):
    ag, _, _ = agent
    a1 = Int8AgentApply(z_dim=ag.config.z_dim)
    a2 = Int8AgentApply(z_dim=ag.config.z_dim)
    assert a1 == a2 and hash(a1) == hash(a2)


def test_int8_guided_render_runs(agent):
    ag, scene, p = agent
    from raytracer_tpu.render.path_renderer import render_path

    guide = ag.as_guide_fn(dtype="int8")
    img, stats = render_path(scene, jax.random.key(3), width=32, height=16,
                             spp=2, max_bounces=4,
                             camera_position=p["camera_position"],
                             mirror_threshold=0.9, guide_fn=guide,
                             fb_prob=1.0, impl="stepwise")
    assert np.isfinite(np.asarray(img)).all()
    assert int(stats.fb_used) > 0


def test_int8_fused_spec_matches_unfused(agent):
    """The fused level-kernel path and the standalone jitted guide share
    the same quantized program semantics."""
    ag, scene, p = agent
    guide = ag.as_guide_fn(dtype="int8")
    qparams, dtype, apply = guide._fused_spec
    rng = np.random.default_rng(2)
    obs = jnp.asarray(rng.normal(size=(64, ag.config.obs_dim)),
                      jnp.float32)
    out_guide = np.asarray(guide(obs))
    out_apply = np.asarray(jax.jit(
        lambda qp, o: apply(qp, o, dtype))(qparams, obs))
    np.testing.assert_allclose(out_guide, out_apply, rtol=0, atol=1e-6)
