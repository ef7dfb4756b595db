"""SB3 ``.zip`` → native policy import parity.

Oracle: SB3's documented deterministic-predict math replayed in numpy
directly from the raw torch state dict (stable-baselines3 itself is not
installed here):

* SAC MlpPolicy — ``unscale(tanh(mu(relu_mlp(obs))))``,
  ``unscale(a) = low + 0.5 (a+1) (high-low)`` (squash_output=True).
* PPO MlpPolicy — ``clip(action_net(tanh_mlp(obs)), low, high)``.

Checkpoints under test: the reference's own committed SB3 saves
(RL/quick_sac_model.zip, RL/ppo_raytracer.zip — reused as opaque binary
test vectors, not code).
"""
import os

import numpy as np
import pytest

SAC_ZIP = "/root/reference/RL/quick_sac_model.zip"
PPO_ZIP = "/root/reference/RL/ppo_raytracer.zip"

needs_zips = pytest.mark.skipif(
    not (os.path.exists(SAC_ZIP) and os.path.exists(PPO_ZIP)),
    reason="reference SB3 checkpoints not present")


def _relu(x):
    return np.maximum(x, 0.0)


def _lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


@needs_zips
def test_sac_zip_action_parity(rng):
    from raytracer_tpu.agents.sac import SACTrainer
    from raytracer_tpu.cli import _make_rl_env
    from raytracer_tpu.utils.sb3_import import load_sb3_zip

    tr = SACTrainer(_make_rl_env("rl"), seed=0)
    tr.load_sb3(SAC_ZIP)

    obs = rng.normal(size=(32, 18)).astype(np.float32)
    got = tr.predict(obs, deterministic=True)

    sd = load_sb3_zip(SAC_ZIP)["policy"]
    h = _relu(_lin(sd, "actor.latent_pi.2",
                   _relu(_lin(sd, "actor.latent_pi.0", obs))))
    squashed = np.tanh(_lin(sd, "actor.mu", h))
    low = np.array([0.0, 0.0], np.float32)
    high = np.array([np.pi / 2, 2 * np.pi], np.float32)
    want = low + 0.5 * (squashed + 1.0) * (high - low)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Action-space bounds came from the archive metadata, not the env.
    np.testing.assert_allclose(np.asarray(tr.high),
                               [1.5707964, 6.2831855], atol=1e-6)


@needs_zips
def test_sac_zip_critic_transfer(rng):
    """Critic + target-critic weights transfer too (resume-training path)."""
    import jax.numpy as jnp

    from raytracer_tpu.agents.sac import SACTrainer
    from raytracer_tpu.cli import _make_rl_env
    from raytracer_tpu.utils.sb3_import import load_sb3_zip

    tr = SACTrainer(_make_rl_env("rl"), seed=0)
    tr.load_sb3(SAC_ZIP)
    obs = rng.normal(size=(8, 18)).astype(np.float32)
    act = rng.uniform(-1, 1, (8, 2)).astype(np.float32)
    q1, q2 = tr.critic.apply({"params": tr.critic_params},
                             jnp.asarray(obs), jnp.asarray(act))

    sd = load_sb3_zip(SAC_ZIP)["policy"]
    x = np.concatenate([obs, act], axis=-1)
    for q, got in ((0, q1), (1, q2)):
        h = _relu(_lin(sd, f"critic.qf{q}.2",
                       _relu(_lin(sd, f"critic.qf{q}.0", x))))
        want = _lin(sd, f"critic.qf{q}.4", h)[:, 0]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@needs_zips
def test_ppo_zip_action_parity(rng):
    from raytracer_tpu.agents.ppo import PPOTrainer
    from raytracer_tpu.cli import _make_rl_env
    from raytracer_tpu.utils.sb3_import import load_sb3_zip

    tr = PPOTrainer(_make_rl_env("rl"), seed=0)
    tr.load_sb3(PPO_ZIP)

    obs = rng.normal(size=(32, 18)).astype(np.float32)
    got = tr.predict(obs, deterministic=True)

    sd = load_sb3_zip(PPO_ZIP)["policy"]
    h = np.tanh(_lin(sd, "mlp_extractor.policy_net.2",
                     np.tanh(_lin(sd, "mlp_extractor.policy_net.0", obs))))
    mean = _lin(sd, "action_net", h)
    low = np.array([0.0, 0.0], np.float32)
    high = np.array([np.pi / 2, 2 * np.pi], np.float32)
    want = np.clip(mean, low, high)
    np.testing.assert_allclose(got, want, atol=1e-5)
