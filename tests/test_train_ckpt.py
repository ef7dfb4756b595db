"""Orbax training-state checkpoint/resume tests."""
import numpy as np

from raytracer_tpu.agents.ppo import PPOConfig, PPOTrainer
from raytracer_tpu.agents.sac import SACConfig, SACTrainer
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_v1
from raytracer_tpu.utils.train_ckpt import (ppo_state, resume_ppo,
                                            resume_sac, sac_state,
                                            save_train_state)


def _env():
    scene, gl, pl = training_scene_v1()
    return RayTracerEnv(scene, image_width=32, image_height=32, fov=90,
                        max_bounces=3, global_lights=gl, point_lights=pl,
                        variant="rl")


def test_ppo_resume(tmp_path):
    env = _env()
    tr = PPOTrainer(env, PPOConfig(batch_envs=16, epochs=1, minibatches=2),
                    seed=0)
    tr.train(200)
    save_train_state(tmp_path / "ppo", ppo_state(tr))
    tr2 = PPOTrainer(env, PPOConfig(batch_envs=16, epochs=1, minibatches=2),
                     seed=99)
    resume_ppo(tr2, tmp_path / "ppo")
    o = np.ones(18, np.float32)
    np.testing.assert_allclose(tr2.predict(o), tr.predict(o), atol=1e-6)
    # Resumed trainer can continue training ("continue training" flow).
    tr2.train(200)


def test_sac_resume(tmp_path):
    env = _env()
    tr = SACTrainer(env, SACConfig(batch_envs=8, learning_starts=32,
                                   batch_size=32, buffer_size=1000,
                                   hidden=(32, 32)), seed=0)
    tr.train(300, updates_per_rollout=1)
    save_train_state(tmp_path / "sac", sac_state(tr))
    tr2 = SACTrainer(env, SACConfig(batch_envs=8, learning_starts=32,
                                    batch_size=32, buffer_size=1000,
                                    hidden=(32, 32)), seed=7)
    resume_sac(tr2, tmp_path / "sac")
    o = np.ones(18, np.float32)
    np.testing.assert_allclose(tr2.predict(o), tr.predict(o), atol=1e-6)
