"""Reward shaping + curriculum — rebuilds of
``AdaptiveRewardRayTracerEnv`` (RL/train_raytracer_optimized.py:16-67),
``CurriculumCallback`` (:70-94) and the staged training flows
(``train_with_curriculum`` RL/train_raytracer_improved.py:208-276; 3-stage
entropy annealing RL/train_raytracer_optimized.py:146-250).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..env.raytracer_env import EnvState, RayTracerEnv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdaptiveState:
    """Wraps EnvState with the shaping counters."""

    env: EnvState
    consecutive_light_hits: jnp.ndarray   # [B] i32
    total_light_hits: jnp.ndarray         # [B] i32

    # Rollout-facing views (agents' scan bodies read state.done /
    # state.total_reward on whichever env they drive — the wrapper state
    # forwards to the wrapped EnvState so PPOTrainer/SACTrainer run on the
    # shaped env unchanged).
    @property
    def done(self):
        return self.env.done

    @property
    def total_reward(self):
        return self.env.total_reward


class AdaptiveRewardRayTracerEnv:
    """Shaping on top of the batched env, matching the reference:

    * miss → −0.5 instead of −0.1 in the base reward's miss case
    * +2.0 on landing on a light id, +0.5·streak beyond the first
    * +0.3 when the surface is >0.5 reflective
    * −0.1 when bounce_count < 2 and the base reward is positive

    The reference shapes ``_calculate_reward`` (evaluated on the pre-move
    intersection); we shape the step reward with the same terms computed on
    the same pre-move state.
    """

    def __init__(self, env: RayTracerEnv, light_ids=(99, 100)):
        self.env = env
        self.light_ids = tuple(light_ids)

    def reset(self, key, batch: int = 1, pixel=None):
        state, obs = self.env.reset(key, batch, pixel)
        zi = jnp.zeros((batch,), jnp.int32)
        return AdaptiveState(env=state, consecutive_light_hits=zi,
                             total_light_hits=zi), obs

    @partial(jax.jit, static_argnames=("self",))
    def step(self, state: AdaptiveState, action):
        s = state.env
        sc = self.env.scene
        pre_hit = s.hit
        pre_idx = s.idx
        pre_bounce = s.bounce
        was_done = s.done

        nstate, obs, base_reward, terminated, info = self.env.step(s, action)

        lid = sc.id[pre_idx]
        is_light = jnp.zeros_like(pre_hit)
        for l in self.light_ids:
            is_light = is_light | (lid == l)
        is_light = is_light & pre_hit

        streak = jnp.where(is_light, state.consecutive_light_hits + 1, 0)
        light_bonus = jnp.where(is_light,
                                2.0 + jnp.where(streak > 1,
                                                0.5 * streak.astype(jnp.float32),
                                                0.0), 0.0)
        reflective_bonus = jnp.where(
            pre_hit & (sc.reflective[pre_idx] > 0.5), 0.3, 0.0)
        short_path_penalty = jnp.where(
            (pre_bounce < 2) & (base_reward > 0), -0.1, 0.0)
        # Base miss penalty −0.1 becomes −0.5 under shaping.
        base = jnp.where(pre_hit, base_reward,
                         jnp.where(base_reward == -0.1, -0.5, base_reward))
        reward = base + light_bonus + reflective_bonus + short_path_penalty
        reward = jnp.where(was_done, 0.0, reward)

        new = AdaptiveState(env=nstate, consecutive_light_hits=streak,
                            total_light_hits=state.total_light_hits
                            + is_light.astype(jnp.int32))
        return new, obs, reward, terminated, info

    def __getattr__(self, name):
        return getattr(self.env, name)

    def __hash__(self):
        return hash((id(self.env), self.light_ids))

    def __eq__(self, other):
        return self is other


@dataclasses.dataclass
class CurriculumSchedule:
    """Phase switching at cumulative step counts (10k → phase 2, +20k →
    phase 3), mirroring CurriculumCallback."""

    phase1_steps: int = 10_000
    phase2_steps: int = 20_000

    def phase_for(self, steps: int) -> int:
        if steps < self.phase1_steps:
            return 1
        if steps < self.phase1_steps + self.phase2_steps:
            return 2
        return 3


def train_with_curriculum(make_env, trainer_cls, *, phases=(1, 2, 3),
                          steps_per_phase=(10_000, 20_000, 20_000),
                          ent_coefs=(0.1, 0.03, 0.01), seed: int = 0,
                          trainer_kwargs: Optional[dict] = None):
    """Staged training with parameter transfer between phases
    (``model2.set_parameters(model1.get_parameters())``,
    RL/train_raytracer_improved.py:258-274) and entropy annealing
    0.1→0.03→0.01 (RL/train_raytracer_optimized.py:146-250)."""
    trainer_kwargs = dict(trainer_kwargs or {})
    prev_params = None
    trainer = None
    results = []
    for phase, steps, ent in zip(phases, steps_per_phase, ent_coefs):
        env = make_env(phase)
        cfg = trainer_kwargs.pop("config", None)
        if cfg is not None and hasattr(cfg, "ent_coef"):
            cfg = dataclasses.replace(cfg, ent_coef=ent)
        trainer = trainer_cls(env, config=cfg, seed=seed + phase,
                              **trainer_kwargs)
        if prev_params is not None:
            trainer.set_parameters(prev_params)
        results.append(trainer.train(steps))
        prev_params = trainer.get_parameters()
    return trainer, results
