"""Trained-model workbench — rebuild of RL/use_trained_model.py (1069 LoC):
model discovery across path conventions (:53-74), batched N-episode
evaluation with best/worst episode dumps (:77-237), RL-vs-random comparison
with rays-per-light-hit efficiency (:604-807), 3-D scene plot (:809-877),
orthographic debug renderer (:879-962) and the 6-panel performance
visualisation (:513-602).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.intersect import NO_SUPPRESS, nearest_hit
from ..env.raytracer_env import RayTracerEnv
from ..scene.types import Scene

MODEL_PATH_CANDIDATES = [
    "{name}", "{name}.pkl", "{name}.npz", "{name}.zip", "models/{name}",
    "models/{name}.pkl", "models/{name}.zip", "./checkpoints/{name}.pkl",
]


def load_policy(path, env: RayTracerEnv, algo: Optional[str] = None):
    """Build a ``predict``-capable trainer from any checkpoint format:
    native ``.pkl`` (PPO/SAC save), or an SB3 ``.zip`` (weight-level import
    via utils/sb3_import — RL/use_trained_model.py:107's SAC.load path).

    ``algo`` ("ppo"/"sac") disambiguates; for zips it is sniffed from the
    archive's state-dict keys when omitted."""
    from ..agents.ppo import PPOTrainer
    from ..agents.sac import SACTrainer

    path = str(path)
    if path.endswith(".zip"):
        if algo is None:
            from ..utils.sb3_import import load_sb3_zip
            keys = load_sb3_zip(path)["policy"]
            algo = "sac" if any(k.startswith("actor.") for k in keys) \
                else "ppo"
        tr = (SACTrainer if algo == "sac" else PPOTrainer)(env)
        tr.load_sb3(path)
        return tr
    tr = (SACTrainer if algo == "sac" else PPOTrainer)(env)
    tr.load(path)
    return tr


def check_model_exists(name: str, base: str = ".") -> Optional[Path]:
    """Model discovery across the reference's path conventions (:53-74)."""
    for pattern in MODEL_PATH_CANDIDATES:
        p = Path(base) / pattern.format(name=name)
        if p.exists():
            return p
    return None


def evaluate_policy(env: RayTracerEnv, policy: Optional[Callable], *,
                    episodes: int = 50, seed: int = 0) -> dict:
    """Batched N-episode evaluation (:77-237): rewards, light hits,
    termination reasons, best/worst episode indices.

    Light hits are counted EXACTLY by sphere identity — a step whose ray
    lands on an emissive sphere (RL variant) or on the sun sphere
    (FB variant, ``env.sun_id``) — the way the reference histograms object
    ids (RL/train_raytracer_improved.py:113-205), not by a reward-threshold
    proxy (which conflates "brightly lit step" with "hit a light")."""
    key = jax.random.key(seed)
    key, kr = jax.random.split(key)
    state, obs = env.reset(kr, batch=episodes)
    em = np.asarray(env.scene.emitive) > 0
    ids = np.asarray(env.scene.id)

    def on_light(st, active):
        idx = np.asarray(st.idx)
        hit = np.asarray(st.hit)
        landed = (ids[idx] == env.sun_id) if env.variant == "fb" else em[idx]
        return landed & hit & active

    light_hit = np.zeros(episodes, bool)
    for _ in range(env.max_bounces + 2):
        key, ka = jax.random.split(key)
        if policy is not None:
            a = jnp.asarray(policy(np.asarray(obs)))
        else:
            if env.variant == "rl":
                a = jax.random.uniform(
                    ka, (episodes, 2), jnp.float32,
                    minval=jnp.array([0.0, 0.0]),
                    maxval=jnp.array([np.pi / 2, 2 * np.pi]))
            else:
                a = jax.random.uniform(ka, (episodes, 2), jnp.float32,
                                       minval=-1, maxval=1)
        prev_done = np.asarray(state.done)
        state, obs, r, term, info = env.step(state, a)
        light_hit |= on_light(state, ~prev_done)
        if bool(np.asarray(state.done).all()):
            break
    rewards = np.asarray(state.total_reward)
    bounces = np.asarray(state.bounce)
    return {
        "episodes": episodes,
        "avg_reward": float(rewards.mean()),
        "std_reward": float(rewards.std()),
        "best_episode": {"index": int(rewards.argmax()),
                         "reward": float(rewards.max()),
                         "bounces": int(bounces[rewards.argmax()])},
        "worst_episode": {"index": int(rewards.argmin()),
                          "reward": float(rewards.min())},
        "avg_bounces": float(bounces.mean()),
        "light_hit_rate": float(light_hit.mean()),
    }


def compare_rl_vs_random(env: RayTracerEnv, policy: Callable, *,
                         episodes: int = 100, seed: int = 0,
                         out_path: Optional[str] = None) -> dict:
    """RL-vs-random benchmark with the rays-per-light-hit efficiency metric
    (:604-807; also RL/ray_tracer_rl_complete.py:429-497)."""
    rl = evaluate_policy(env, policy, episodes=episodes, seed=seed)
    rnd = evaluate_policy(env, None, episodes=episodes, seed=seed + 1)

    def efficiency(stats):
        hits = stats["light_hit_rate"] * stats["episodes"]
        rays = stats["avg_bounces"] * stats["episodes"]
        return rays / hits if hits else float("inf")

    result = {
        "rl": rl, "random": rnd,
        "reward_improvement": (rl["avg_reward"] - rnd["avg_reward"]),
        "rays_per_light_hit": {"rl": efficiency(rl),
                               "random": efficiency(rnd)},
    }
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result


def orthographic_render(scene: Scene, *, width: int = 200, height: int = 150,
                        span: float = 12.0, z_start: float = 5.0,
                        background=(20, 20, 30)) -> np.ndarray:
    """Orthographic debug renderer (:879-962): parallel -z rays on a plane,
    flat colour of the first hit."""
    xs = np.linspace(-span / 2, span / 2, width)
    ys = np.linspace(span / 2 * height / width, -span / 2 * height / width,
                     height)
    X, Y = np.meshgrid(xs, ys)
    o = jnp.asarray(np.stack([X, Y, np.full_like(X, z_start)], -1)
                    .reshape(-1, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                         o.shape)
    h = nearest_hit(o, d, scene, jnp.full((o.shape[0],), NO_SUPPRESS,
                                          jnp.int32))
    col = np.asarray(jnp.where(h.found[:, None],
                               scene.colour[h.idx],
                               jnp.asarray(background, jnp.float32)[None]))
    return col.reshape(height, width, 3).astype(np.uint8)


def plot_scene_3d(scene: Scene, out_path: str) -> None:
    """3-D scene scatter (:809-877)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    c = np.asarray(scene.centre)
    r = np.asarray(scene.radius)
    col = np.clip(np.asarray(scene.colour) / 255.0, 0, 1)
    emis = np.asarray(scene.emitive) > 0
    keep = r < 50     # skip the giant walls for readability
    ax.scatter(c[keep, 0], c[keep, 2], c[keep, 1],
               s=np.clip(r[keep] * 200, 10, 400), c=col[keep],
               edgecolors=np.where(emis[keep], "gold", "none"))
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("y")
    plt.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def performance_plots(history: dict, out_path: str) -> None:
    """6-panel performance dashboard (:513-602): rewards, moving average,
    histogram, bounces, hit rate, losses — whichever series are present."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    panels = [(k, v) for k, v in history.items() if len(v)][:6]
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    for ax, (name, series) in zip(axes.ravel(), panels):
        series = np.asarray(series, dtype=float)
        if name.endswith("_hist"):
            ax.hist(series, bins=30)
        else:
            ax.plot(series)
            if len(series) > 20:
                w = max(1, len(series) // 20)
                ma = np.convolve(series, np.ones(w) / w, mode="valid")
                ax.plot(np.arange(len(ma)) + w - 1, ma, lw=2)
        ax.set_title(name)
    for ax in axes.ravel()[len(panels):]:
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
