"""TensorBoard event writing — file-format round trip through tensorboard's
own EventFileLoader (the artifact family the reference records under
raytracer_ppo_tensorboard/PPO_1..3, RL/train_raytracer.py:143)."""
import os

import numpy as np
import pytest

from raytracer_tpu.utils.tb import SummaryWriter, next_run_dir


def _load_scalars(run_dir):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    f = [x for x in os.listdir(run_dir) if "tfevents" in x][0]
    out = []
    for e in loader_mod.EventFileLoader(os.path.join(run_dir, f)).Load():
        for v in e.summary.value:
            # the loader migrates simple_value → rank-0 float tensor
            val = (v.tensor.float_val[0] if v.tensor.float_val
                   else v.simple_value)
            out.append((e.step, v.tag, val))
    return out


def test_event_file_roundtrip(tmp_path):
    run = next_run_dir(str(tmp_path), "PPO")
    assert run.endswith("PPO_1")
    with SummaryWriter(run) as w:
        for i in range(3):
            w.add_scalar("rollout/ep_rew_mean", 0.5 * i, i * 100)
            w.add_scalar("train/loss", 10.0 - i, i * 100)
    got = _load_scalars(run)
    assert len(got) == 6
    assert got[0] == (0, "rollout/ep_rew_mean", 0.0)
    step, tag, val = got[3]
    assert (step, tag) == (100, "train/loss")
    np.testing.assert_allclose(val, 9.0)
    # SB3 directory convention: next run gets _2
    assert next_run_dir(str(tmp_path), "PPO").endswith("PPO_2")


def test_ppo_trainer_writes_events(tmp_path):
    from raytracer_tpu.agents.ppo import PPOConfig, PPOTrainer
    from raytracer_tpu.cli import _make_rl_env

    env = _make_rl_env("rl")
    tr = PPOTrainer(env, PPOConfig(batch_envs=8,
                                   tensorboard_log=str(tmp_path)), seed=0)
    tr.train(8 * (env.max_bounces + 2) * 2)          # 2 iterations
    run = os.path.join(str(tmp_path), "PPO_1")
    scalars = _load_scalars(run)
    tags = {t for _, t, _ in scalars}
    assert {"rollout/ep_rew_mean", "train/loss"} <= tags
    assert len(scalars) == 4
