"""Agent behavior analytics + visualisations.

Rebuilds of:

* ``RewardLoggerCallback``          — RL/train_raytracer_improved.py:20-49
* ``analyze_agent_behavior``        — :113-205 (hit frequency by object id,
                                      success by bounce count, termination
                                      reason histogram)
* policy visualisation from 5 canonical pixels — :279-346
* 6-panel ``advanced_analysis.png`` + ``agent_analysis.csv`` — :349-507
* ``visualize_3d_paths``            — RL/train_raytracer_optimized.py:366-446
* ``compare_algorithms`` PPO vs SAC — :449-546
"""
from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.raytracer_env import RayTracerEnv


class RewardLogger:
    """Episode reward logger (the SB3-callback equivalent)."""

    def __init__(self):
        self.episode_rewards: list[float] = []
        self.episode_lengths: list[int] = []

    def log_batch(self, total_rewards, bounces):
        self.episode_rewards.extend(np.asarray(total_rewards, float).tolist())
        self.episode_lengths.extend(np.asarray(bounces, int).tolist())


def analyze_agent_behavior(env: RayTracerEnv, policy: Optional[Callable],
                           *, episodes: int = 200, seed: int = 0) -> dict:
    """Batched rollouts → behavioral statistics."""
    key = jax.random.key(seed)
    key, kr = jax.random.split(key)
    state, obs = env.reset(kr, batch=episodes)
    first_idx = np.asarray(state.idx).copy()
    first_hit = np.asarray(state.hit).copy()

    reasons = np.full(episodes, "", dtype=object)
    for _ in range(env.max_bounces + 2):
        key, ka = jax.random.split(key)
        if policy is not None:
            a = jnp.asarray(policy(np.asarray(obs)))
        else:
            a = jax.random.uniform(ka, (episodes, 2), jnp.float32,
                                   minval=jnp.array([0.0, 0.0]),
                                   maxval=jnp.array([np.pi / 2,
                                                     2 * np.pi]))
        prev_done = np.asarray(state.done)
        state, obs, r, term, info = env.step(state, a)
        now_done = np.asarray(state.done) & ~prev_done
        trunc = np.asarray(info["truncated"])
        hit = np.asarray(state.hit)
        for i in np.nonzero(now_done)[0]:
            reasons[i] = ("max_bounces" if trunc[i]
                          else ("ray_escaped" if not hit[i] else "terminal"))
        if bool(np.asarray(state.done).all()):
            break

    ids = np.asarray(env.scene.id)
    final_ids = np.where(np.asarray(state.hit), ids[np.asarray(state.idx)],
                         -1)
    rewards = np.asarray(state.total_reward)
    bounces = np.asarray(state.bounce)
    success = rewards > 0

    hit_freq = Counter(int(i) for i in final_ids)
    by_bounce: dict[int, list[float]] = {}
    for b, s in zip(bounces, success):
        by_bounce.setdefault(int(b), []).append(bool(s))
    return {
        "episodes": episodes,
        "avg_reward": float(rewards.mean()),
        "hit_frequency_by_id": dict(hit_freq),
        "success_rate_by_bounce": {b: float(np.mean(v))
                                   for b, v in sorted(by_bounce.items())},
        "termination_reasons": dict(Counter(reasons.tolist())),
        "first_hit_rate": float(first_hit.mean()),
    }


def canonical_pixel_policy_probe(env: RayTracerEnv, policy: Callable) -> dict:
    """Policy actions at the 5 canonical pixels (centre + 4 mid-quadrants),
    RL/train_raytracer_improved.py:279-346."""
    w, h = env.image_width, env.image_height
    pixels = [(w // 2, h // 2), (w // 4, h // 4), (3 * w // 4, h // 4),
              (w // 4, 3 * h // 4), (3 * w // 4, 3 * h // 4)]
    out = {}
    for px in pixels:
        state, obs = env.reset(jax.random.key(0), batch=1,
                               pixel=jnp.asarray(px))
        a = np.asarray(policy(np.asarray(obs)))
        out[str(px)] = {"theta": float(a[..., 0].ravel()[0]),
                        "phi": float(a[..., 1].ravel()[0]),
                        "hit": bool(np.asarray(state.hit)[0])}
    return out


def collect_3d_paths(env: RayTracerEnv, policy: Optional[Callable], *,
                     episodes: int = 16, seed: int = 0) -> list[np.ndarray]:
    """Bounce-point chains for 3-D visualisation
    (RL/train_raytracer_optimized.py:366-446)."""
    key = jax.random.key(seed)
    key, kr = jax.random.split(key)
    state, obs = env.reset(kr, batch=episodes)
    paths = [[p] for p in np.asarray(state.point)]
    alive = np.asarray(state.hit).copy()
    for _ in range(env.max_bounces + 1):
        key, ka = jax.random.split(key)
        if policy is not None:
            a = jnp.asarray(policy(np.asarray(obs)))
        else:
            a = jax.random.uniform(ka, (episodes, 2), jnp.float32,
                                   minval=jnp.array([0.0, 0.0]),
                                   maxval=jnp.array([np.pi / 2, 2 * np.pi]))
        prev_done = np.asarray(state.done)
        state, obs, r, term, info = env.step(state, a)
        pts = np.asarray(state.point)
        hit = np.asarray(state.hit)
        for i in range(episodes):
            if not prev_done[i] and hit[i]:
                paths[i].append(pts[i])
        if bool(np.asarray(state.done).all()):
            break
    return [np.stack(p) for p in paths if len(p) > 1]


def plot_3d_paths(paths, scene, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    c = np.asarray(scene.centre)
    r = np.asarray(scene.radius)
    keep = r < 50
    ax.scatter(c[keep, 0], c[keep, 2], c[keep, 1],
               s=np.clip(r[keep] * 150, 10, 300),
               c=np.clip(np.asarray(scene.colour)[keep] / 255, 0, 1))
    for p in paths:
        ax.plot(p[:, 0], p[:, 2], p[:, 1], alpha=0.6, lw=1)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("y")
    plt.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def compare_algorithms(make_env, *, timesteps: int = 10_000, seed: int = 0,
                       out_dir: Optional[str] = None) -> dict:
    """Head-to-head PPO vs SAC (RL/train_raytracer_optimized.py:449-546)."""
    import json

    from .ppo import PPOConfig, PPOTrainer
    from .sac import SACConfig, SACTrainer
    from ..compare.workbench import evaluate_policy

    results = {}
    env = make_env()
    ppo = PPOTrainer(env, PPOConfig(batch_envs=128), seed=seed)
    ppo_out = ppo.train(timesteps)
    results["ppo"] = {**ppo_out,
                      "eval": evaluate_policy(env, lambda o: ppo.predict(o),
                                              episodes=100, seed=seed)}
    sac = SACTrainer(env, SACConfig(batch_envs=128,
                                    learning_starts=min(1000, timesteps // 4)),
                     seed=seed)
    sac_out = sac.train(timesteps)
    results["sac"] = {**sac_out,
                      "eval": evaluate_policy(env, lambda o: sac.predict(o),
                                              episodes=100, seed=seed)}
    results["winner"] = max(
        ("ppo", "sac"),
        key=lambda k: results[k]["eval"]["avg_reward"])
    if out_dir:
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(out_dir) / "algorithm_comparison.json", "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results


def advanced_analysis_png(behavior: dict, reward_history, out_path):
    """The 6-panel analysis figure (RL/train_raytracer_improved.py:430-507)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    ax = axes.ravel()
    rh = np.asarray(reward_history, float)
    ax[0].plot(rh); ax[0].set_title("episode rewards")
    if len(rh) > 10:
        w = max(1, len(rh) // 20)
        ax[1].plot(np.convolve(rh, np.ones(w) / w, "valid"))
    ax[1].set_title("moving average")
    ax[2].hist(rh, bins=30); ax[2].set_title("reward distribution")
    hf = behavior["hit_frequency_by_id"]
    ax[3].bar([str(k) for k in hf], list(hf.values()))
    ax[3].set_title("hit frequency by object id")
    sb = behavior["success_rate_by_bounce"]
    ax[4].bar([str(k) for k in sb], list(sb.values()))
    ax[4].set_title("success rate by bounce")
    tr = behavior["termination_reasons"]
    ax[5].bar([str(k) for k in tr], list(tr.values()))
    ax[5].set_title("termination reasons")
    plt.tight_layout()
    plt.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
