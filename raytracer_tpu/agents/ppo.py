"""Native PPO on the batched ray-tracing env.

Replaces SB3 PPO (reference hyperparameters: lr 3e-4, n_steps 2048,
γ 0.99, clip 0.2, GAE λ 0.95 — RL/train_raytracer.py:123-153).  The
reference stepped ONE Python env per transition; here a whole batch of
episodes advances per jitted step and the update consumes the full masked
T×B rollout grid, so rollout+update both live on device.

Episodes are one pixel's light path (≤ max_bounces+1 steps), so a rollout
is a short scan of batched env steps rather than a long trajectory buffer.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env.raytracer_env import RayTracerEnv
from .networks import PPOActorCritic


@dataclasses.dataclass
class PPOConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    batch_envs: int = 256
    epochs: int = 4
    minibatches: int = 4
    max_grad_norm: float = 0.5
    hidden: Tuple[int, ...] = (64, 64)
    # SB3-style TensorBoard event logging (RL/train_raytracer.py:143 passes
    # tensorboard_log="./raytracer_ppo_tensorboard/"); runs land in
    # {tensorboard_log}/PPO_{N}/ like the reference's recorded PPO_1..3.
    tensorboard_log: Optional[str] = None


class PPOTrainer:
    def __init__(self, env: RayTracerEnv, config: Optional[PPOConfig] = None,
                 seed: int = 0):
        self.env = env
        self.cfg = config or PPOConfig()
        self.net = PPOActorCritic(action_dim=2, hidden=self.cfg.hidden)
        key = jax.random.key(seed)
        self.params = self.net.init(key, jnp.zeros((1, 18)))["params"]
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.adam(self.cfg.learning_rate))
        self.opt_state = self.tx.init(self.params)
        self._key = jax.random.key(seed + 1)
        # Action bounds per variant.
        if env.variant == "rl":
            self.low = jnp.array([0.0, 0.0], jnp.float32)
            self.high = jnp.array([jnp.pi / 2, 2 * jnp.pi], jnp.float32)
        else:
            self.low = jnp.array([-1.0, -1.0], jnp.float32)
            self.high = jnp.array([1.0, 1.0], jnp.float32)
        self.episode_rewards: list[float] = []
        self._rollout = self._build_rollout()
        self._update = self._build_update()
        self._train_chunk = None        # built lazily (train_on_device)

    # ------------------------------------------------------------------
    def _build_rollout(self):
        env, net = self.env, self.net
        T = env.max_bounces + 2
        B = self.cfg.batch_envs
        low, high = self.low, self.high

        @partial(jax.jit, static_argnames=())
        def rollout(params, key):
            k_reset, k_steps = jax.random.split(key)
            state, obs = env.reset(k_reset, batch=B)

            def step(carry, k):
                state, obs = carry
                mean, log_std, value = net.apply({"params": params}, obs)
                std = jnp.exp(log_std)
                u = mean + std * jax.random.normal(k, mean.shape, mean.dtype)
                logp = jnp.sum(
                    -0.5 * ((u - mean) / std) ** 2 - log_std
                    - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
                a_env = jnp.clip(u, low, high)
                active = ~state.done
                nstate, nobs, r, term, _ = env.step(state, a_env)
                rec = (obs, u, logp, value, r, active)
                return (nstate, nobs), rec

            keys = jax.random.split(k_steps, T)
            (state, obs), recs = jax.lax.scan(step, (state, obs), keys)
            _, _, _, last_value = None, None, None, net.apply(
                {"params": params}, obs)[2]
            return recs, last_value, state.total_reward

        return rollout

    def _build_update(self):
        cfg = self.cfg
        net = self.net

        def gae(rewards, values, actives, last_value):
            # rewards/values/actives: [T, B]
            T = rewards.shape[0]

            def back(carry, t):
                adv_next, v_next, active_next = carry
                # If the lane is inactive at t there is no transition.
                delta = rewards[t] + cfg.gamma * v_next * active_next - values[t]
                adv = delta + cfg.gamma * cfg.gae_lambda * adv_next * active_next
                adv = adv * actives[t]
                return (adv, values[t], actives[t]), adv

            init = (jnp.zeros_like(last_value), last_value,
                    jnp.zeros_like(last_value, dtype=bool).astype(rewards.dtype))
            _, advs = jax.lax.scan(back, init, jnp.arange(T - 1, -1, -1))
            return advs[::-1]

        def loss_fn(params, batch):
            obs, actions, logp_old, adv, ret, mask = batch
            mean, log_std, value = net.apply({"params": params}, obs)
            std = jnp.exp(log_std)
            logp = jnp.sum(-0.5 * ((actions - mean) / std) ** 2 - log_std
                           - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
            ratio = jnp.exp(logp - logp_old)
            w = mask / jnp.maximum(mask.sum(), 1.0)
            pg = -jnp.sum(w * jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv))
            vf = jnp.sum(w * (value - ret) ** 2)
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, (pg, vf)

        @jax.jit
        def update(params, opt_state, recs, last_value, key):
            obs, actions, logp, values, rewards, actives = recs
            actives = actives.astype(rewards.dtype)
            adv = gae(rewards, values, actives, last_value)
            ret = adv + values
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            mask = flat(actives)
            adv_f = flat(adv)
            adv_n = ((adv_f - (adv_f * mask).sum() / jnp.maximum(mask.sum(), 1))
                     / (jnp.sqrt(((adv_f ** 2) * mask).sum()
                                 / jnp.maximum(mask.sum(), 1)) + 1e-8))
            data = (flat(obs), flat(actions), flat(logp), adv_n * mask,
                    flat(ret), mask)
            N = data[0].shape[0]
            mb = N // cfg.minibatches

            def epoch(carry, k):
                params, opt_state = carry
                perm = jax.random.permutation(k, N)

                def mini(carry, i):
                    params, opt_state = carry
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                    mbatch = tuple(x[idx] for x in data)
                    (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, mbatch)
                    upd, opt_state = self.tx.update(g, opt_state, params)
                    params = optax.apply_updates(params, upd)
                    return (params, opt_state), l

                (params, opt_state), ls = jax.lax.scan(
                    mini, (params, opt_state), jnp.arange(cfg.minibatches))
                return (params, opt_state), ls.mean()

            keys = jax.random.split(key, cfg.epochs)
            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state), keys)
            return params, opt_state, losses.mean()

        return update

    # ------------------------------------------------------------------
    def _build_train_chunk(self, iters: int):
        """One compiled program running ``iters`` full PPO iterations
        (rollout scan + 4-epoch clipped update each) back-to-back on
        device — RL training with ZERO host round-trips inside the chunk.

        This is the on-TPU demonstration the reference's SAC pipeline
        (RL/ray_tracer_rl_complete.py:108-139) could never do: its env
        stepped one CPU episode per transition; here the env IS the
        batched TPU tracer, so rollout collection and optimisation live in
        one XLA program and the tunneled dispatch floor is paid once per
        ``iters`` iterations instead of twice per iteration."""
        rollout, update = self._rollout, self._update

        @jax.jit
        def chunk(params, opt_state, key):
            def it(carry, k):
                params, opt_state = carry
                k1, k2 = jax.random.split(k)
                recs, last_value, ep_rewards = rollout.__wrapped__(params, k1)
                params, opt_state, loss = update.__wrapped__(
                    params, opt_state, recs, last_value, k2)
                return (params, opt_state), (jnp.mean(ep_rewards), loss)

            keys = jax.random.split(key, iters)
            (params, opt_state), (rews, losses) = jax.lax.scan(
                it, (params, opt_state), keys)
            return params, opt_state, rews, losses

        return chunk

    def train_on_device(self, total_timesteps: int,
                        iters_per_dispatch: int = 8) -> dict:
        """Like :meth:`train` but with ``iters_per_dispatch`` iterations
        fused into each compiled program (see _build_train_chunk).  Returns
        the train() schema plus wall-clock and backend for the shipped
        benchmark artifact."""
        import time
        T = self.env.max_bounces + 2
        steps_per_iter = T * self.cfg.batch_envs
        iters = max(1, total_timesteps // steps_per_iter)
        n_chunks = max(1, -(-iters // iters_per_dispatch))
        if self._train_chunk is None:
            self._train_chunk = self._build_train_chunk(iters_per_dispatch)
        t0 = time.perf_counter()
        losses = []
        for _ in range(n_chunks):
            self._key, k = jax.random.split(self._key)
            self.params, self.opt_state, rews, ls = self._train_chunk(
                self.params, self.opt_state, k)
            self.episode_rewards.extend(np.asarray(rews).tolist())
            losses.extend(np.asarray(ls).tolist())
        jax.block_until_ready(self.params)
        wall = time.perf_counter() - t0
        return {"iterations": n_chunks * iters_per_dispatch,
                "timesteps": n_chunks * iters_per_dispatch * steps_per_iter,
                "final_loss": losses[-1],
                "mean_episode_reward": float(np.mean(
                    self.episode_rewards[-iters_per_dispatch:])),
                "wall_seconds": wall,
                "dispatches": n_chunks,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0])}

    def train(self, total_timesteps: int, log_every: int = 10) -> dict:
        T = self.env.max_bounces + 2
        steps_per_iter = T * self.cfg.batch_envs
        iters = max(1, total_timesteps // steps_per_iter)
        losses = []
        tb = None
        if self.cfg.tensorboard_log:
            from ..utils.tb import SummaryWriter, next_run_dir
            tb = SummaryWriter(next_run_dir(self.cfg.tensorboard_log, "PPO"))
        for i in range(iters):
            self._key, k1, k2 = jax.random.split(self._key, 3)
            recs, last_value, ep_rewards = self._rollout(self.params, k1)
            self.params, self.opt_state, loss = self._update(
                self.params, self.opt_state, recs, last_value, k2)
            losses.append(float(loss))
            self.episode_rewards.append(float(jnp.mean(ep_rewards)))
            if tb is not None:
                step = (i + 1) * steps_per_iter
                tb.add_scalar("rollout/ep_rew_mean",
                              self.episode_rewards[-1], step)
                tb.add_scalar("train/loss", losses[-1], step)
        if tb is not None:
            tb.close()
        return {"iterations": iters, "final_loss": losses[-1],
                "mean_episode_reward": float(np.mean(
                    self.episode_rewards[-log_every:]))}

    def predict(self, obs, deterministic: bool = True):
        obs = jnp.atleast_2d(jnp.asarray(obs, jnp.float32))
        mean, log_std, _ = self.net.apply({"params": self.params}, obs)
        if not deterministic:
            self._key, k = jax.random.split(self._key)
            mean = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape, mean.dtype)
        a = jnp.clip(mean, self.low, self.high)
        return np.asarray(a[0] if a.shape[0] == 1 else a)

    def save(self, path):
        """``.npz`` → flat numpy archive (pickle-free shipped-checkpoint
        format, same scheme as SACTrainer.save); anything else → pickle."""
        from pathlib import Path
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        if str(path).endswith(".npz"):
            import json as _json
            flat = {}
            for kp, leaf in jax.tree_util.tree_flatten_with_path(
                    self.params)[0]:
                key = "params" + "".join("/" + str(k.key) for k in kp)
                flat[key] = np.asarray(leaf)
            flat["__config__"] = np.frombuffer(
                _json.dumps(dataclasses.asdict(self.cfg)).encode(), np.uint8)
            np.savez(path, **flat)
            return
        import pickle
        with open(path, "wb") as f:
            pickle.dump({"params": jax.tree_util.tree_map(np.asarray,
                                                          self.params),
                         "config": dataclasses.asdict(self.cfg)}, f)

    def load(self, path):
        if str(path).endswith(".npz"):
            with np.load(path) as z:
                tree: dict = {}
                for key in z.files:
                    if key == "__config__":
                        continue
                    _, _, rest = key.partition("/")
                    node = tree
                    parts = rest.split("/")
                    for p in parts[:-1]:
                        node = node.setdefault(p, {})
                    node[parts[-1]] = jnp.asarray(z[key])
                self.params = tree
            return
        import pickle
        with open(path, "rb") as f:
            ck = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, ck["params"])

    def load_sb3(self, path):
        """Import a stable-baselines3 PPO ``.zip`` save (the reference's
        checkpoint format, RL/train_raytracer.py:150) — policy + value
        weights and the state-independent log_std; ``predict`` then
        reproduces SB3's deterministic actions (tests/test_sb3_import.py)."""
        from ..utils.sb3_import import (action_bounds, import_ppo_policy,
                                        load_sb3_zip)
        ck = load_sb3_zip(path)
        self.params = jax.tree_util.tree_map(
            jnp.asarray, import_ppo_policy(ck["policy"]))
        try:
            low, high = action_bounds(ck["data"])
            self.low, self.high = jnp.asarray(low), jnp.asarray(high)
        except ValueError:
            pass

    def set_parameters(self, params):
        """Parameter transfer between curriculum phases
        (RL/train_raytracer_improved.py:258-274)."""
        self.params = params

    def get_parameters(self):
        return self.params
