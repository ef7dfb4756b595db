"""Orbax training-state checkpoints.

SURVEY.md §5 maps the reference's two checkpoint families (SB3 ``.zip``,
torch ``.pth``) to "orbax checkpointing of flax params + optimizer state"
on TPU.  These helpers snapshot/restore full trainer state (params +
optimizer + counters) for the native PPO/SAC/FB trainers, enabling the
reference's "continue training" resume flow
(RL/train_raytracer_improved.py:397-409).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_train_state(path, state: dict) -> None:
    """Save a dict of pytrees (params, opt_state, counters) with orbax."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _tree_to_numpy(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path, template: dict) -> dict:
    """Restore into the structure of ``template``."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, _tree_to_numpy(template))
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r) if hasattr(t, "dtype") else r,
        template, restored)


def ppo_state(trainer) -> dict:
    return {"params": trainer.params, "opt_state": trainer.opt_state,
            "episode_rewards": np.asarray(trainer.episode_rewards,
                                          np.float32)}


def resume_ppo(trainer, path) -> None:
    state = restore_train_state(path, ppo_state(trainer))
    trainer.params = state["params"]
    trainer.opt_state = state["opt_state"]
    trainer.episode_rewards = list(np.asarray(state["episode_rewards"]))


def sac_state(trainer) -> dict:
    return {"actor": trainer.actor_params, "critic": trainer.critic_params,
            "target": trainer.target_critic_params,
            "log_alpha": trainer.log_alpha,
            "opts": (trainer.actor_opt, trainer.critic_opt,
                     trainer.alpha_opt)}


def resume_sac(trainer, path) -> None:
    state = restore_train_state(path, sac_state(trainer))
    trainer.actor_params = state["actor"]
    trainer.critic_params = state["critic"]
    trainer.target_critic_params = state["target"]
    trainer.log_alpha = state["log_alpha"]
    trainer.actor_opt, trainer.critic_opt, trainer.alpha_opt = state["opts"]
