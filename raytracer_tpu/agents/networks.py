"""Policy/value networks for the native RL agents (flax.linen).

Replaces stable-baselines3's "MlpPolicy" (the reference trains SB3 PPO/SAC
against its Python env, RL/train_raytracer.py:123-180,
RL/ray_tracer_rl_complete.py:83-142).  Default widths follow SB3: 64×64
tanh for PPO, 256×256 ReLU for SAC.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = {"tanh": nn.tanh, "relu": nn.relu}[self.activation]
        for f in self.features:
            x = act(nn.Dense(f)(x))
        return x


class PPOActorCritic(nn.Module):
    action_dim: int = 2
    hidden: Tuple[int, ...] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        pi = MLP(self.hidden, "tanh")(obs)
        mean = nn.Dense(self.action_dim)(pi)
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,), jnp.float32)
        v = MLP(self.hidden, "tanh")(obs)
        value = nn.Dense(1)(v)[..., 0]
        return mean, log_std, value


class SACActor(nn.Module):
    action_dim: int = 2
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = MLP(self.hidden, "relu")(obs)
        mean = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(nn.Dense(self.action_dim)(x), -20.0, 2.0)
        return mean, log_std


class SACCritic(nn.Module):
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = nn.Dense(1)(MLP(self.hidden, "relu")(x))[..., 0]
        q2 = nn.Dense(1)(MLP(self.hidden, "relu")(x))[..., 0]
        return q1, q2
