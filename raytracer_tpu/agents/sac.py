"""Native SAC on the batched ray-tracing env.

Replaces SB3 SAC with the reference's hyperparameters (lr 3e-4, buffer
100k, learning_starts 5000, batch 256, tau 0.005, auto entropy —
RL/ray_tracer_rl_complete.py:108-126; the v1 script uses lr 1e-3,
RL/train_raytracer.py:156-180).  Tanh-squashed Gaussian policy rescaled to
the env's action bounds, twin Q critics with polyak targets, automatic
temperature tuning toward target entropy −dim(A).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env.raytracer_env import RayTracerEnv
from .networks import SACActor, SACCritic


@dataclasses.dataclass
class SACConfig:
    learning_rate: float = 3e-4
    buffer_size: int = 100_000
    learning_starts: int = 5000
    batch_size: int = 256
    tau: float = 0.005
    gamma: float = 0.99
    batch_envs: int = 128
    hidden: Tuple[int, ...] = (256, 256)
    # SB3-style TensorBoard event logging; runs land in
    # {tensorboard_log}/SAC_{N}/ (the reference's PPO twin writes
    # raytracer_ppo_tensorboard/PPO_N, RL/train_raytracer.py:143).
    tensorboard_log: Optional[str] = None


class SACTrainer:
    def __init__(self, env: RayTracerEnv, config: Optional[SACConfig] = None,
                 seed: int = 0):
        self.env = env
        self.cfg = config or SACConfig()
        self.actor = SACActor(action_dim=2, hidden=self.cfg.hidden)
        self.critic = SACCritic(hidden=self.cfg.hidden)
        key = jax.random.key(seed)
        ka, kc = jax.random.split(key)
        obs0 = jnp.zeros((1, 18))
        act0 = jnp.zeros((1, 2))
        self.actor_params = self.actor.init(ka, obs0)["params"]
        self.critic_params = self.critic.init(kc, obs0, act0)["params"]
        self.target_critic_params = jax.tree_util.tree_map(
            jnp.copy, self.critic_params)
        self.log_alpha = jnp.zeros(())
        self.target_entropy = -2.0

        lr = self.cfg.learning_rate
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.alpha_tx = optax.adam(lr)
        self.actor_opt = self.actor_tx.init(self.actor_params)
        self.critic_opt = self.critic_tx.init(self.critic_params)
        self.alpha_opt = self.alpha_tx.init(self.log_alpha)

        if env.variant == "rl":
            low = np.array([0.0, 0.0], np.float32)
            high = np.array([np.pi / 2, 2 * np.pi], np.float32)
        else:
            low = np.array([-1.0, -1.0], np.float32)
            high = np.array([1.0, 1.0], np.float32)
        self.low, self.high = jnp.asarray(low), jnp.asarray(high)
        self.scale = (self.high - self.low) / 2.0
        self.mid = (self.high + self.low) / 2.0

        self._key = jax.random.key(seed + 1)
        self.buffer = _Buffer(self.cfg.buffer_size, 18, 2)
        self.total_steps = 0
        self.episode_rewards: list[float] = []
        self._update = self._build_update()

    # -- squashed policy ---------------------------------------------------
    def _sample_action(self, params, obs, key):
        mean, log_std = self.actor.apply({"params": params}, obs)
        std = jnp.exp(log_std)
        u = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        t = jnp.tanh(u)
        a = self.mid + self.scale * t
        logp = jnp.sum(
            -0.5 * ((u - mean) / std) ** 2 - log_std
            - 0.5 * jnp.log(2 * jnp.pi)
            - jnp.log(self.scale * (1 - t ** 2) + 1e-6), axis=-1)
        return a, logp

    def _build_update(self, weighted: bool = False):
        """``weighted=True`` adds a per-sample weight vector to the batch
        (used by the on-device trainer, whose ring buffer stores dead-lane
        slots with weight 0 — see train_on_device); all three losses
        become weighted means, so zero-weight samples contribute nothing.
        """
        cfg = self.cfg

        def wmean(x, w):
            if w is None:
                return jnp.mean(x)
            return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

        @jax.jit
        def update(actor_params, critic_params, target_params, log_alpha,
                   opts, batch, key):
            actor_opt, critic_opt, alpha_opt = opts
            if weighted:
                obs, action, reward, next_obs, done, w = batch
            else:
                obs, action, reward, next_obs, done = batch
                w = None
            k1, k2 = jax.random.split(key)
            alpha = jnp.exp(log_alpha)

            next_a, next_logp = self._sample_action(actor_params, next_obs, k1)
            tq1, tq2 = self.critic.apply({"params": target_params},
                                         next_obs, next_a)
            target_q = reward + cfg.gamma * (1 - done) * (
                jnp.minimum(tq1, tq2) - alpha * next_logp)
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss(cp):
                q1, q2 = self.critic.apply({"params": cp}, obs, action)
                return wmean((q1 - target_q) ** 2 + (q2 - target_q) ** 2, w)

            closs, cgrad = jax.value_and_grad(critic_loss)(critic_params)
            cupd, critic_opt = self.critic_tx.update(cgrad, critic_opt,
                                                     critic_params)
            critic_params = optax.apply_updates(critic_params, cupd)

            def actor_loss(ap):
                a, logp = self._sample_action(ap, obs, k2)
                q1, q2 = self.critic.apply({"params": critic_params}, obs, a)
                return wmean(alpha * logp - jnp.minimum(q1, q2), w), logp

            (aloss, logp), agrad = jax.value_and_grad(actor_loss,
                                                      has_aux=True)(actor_params)
            aupd, actor_opt = self.actor_tx.update(agrad, actor_opt,
                                                   actor_params)
            actor_params = optax.apply_updates(actor_params, aupd)

            def alpha_loss(la):
                return -wmean(jnp.exp(la) * jax.lax.stop_gradient(
                    logp + self.target_entropy), w)

            lloss, lgrad = jax.value_and_grad(alpha_loss)(log_alpha)
            lupd, alpha_opt = self.alpha_tx.update(lgrad, alpha_opt, log_alpha)
            log_alpha = optax.apply_updates(log_alpha, lupd)

            target_params = jax.tree_util.tree_map(
                lambda t, s: (1 - cfg.tau) * t + cfg.tau * s,
                target_params, critic_params)
            return (actor_params, critic_params, target_params, log_alpha,
                    (actor_opt, critic_opt, alpha_opt), closs, aloss)

        return update

    # -- on-device training (VERDICT r4 item 5) ----------------------------
    def _build_train_chunk(self, iters: int, updates_per_rollout: int):
        """One compiled program running ``iters`` SAC iterations (batched
        rollout scan → ring-buffer block write → ``updates_per_rollout``
        sampled updates) with the replay buffer resident ON DEVICE as
        fixed ``[cap, …]`` arrays — the pattern the reference's SAC
        pipeline (RL/ray_tracer_rl_complete.py:108-139, one CPU episode
        step per transition) could never express.

        Ring mechanics: every iteration writes its full ``T×B`` transition
        block (including dead-lane slots) at the write pointer with a
        per-slot validity weight; ``cap`` is rounded to a block multiple
        so writes never wrap mid-block.  Sampling draws uniform indices
        over the filled region and the update weights dead slots to zero
        (_build_update(weighted=True)) — the device-native equivalent of
        the host loop's ``[active]`` filtering."""
        env, cfg = self.env, self.cfg
        B = cfg.batch_envs
        T = env.max_bounces + 2
        N = T * B
        cap = max(cfg.buffer_size // N, 1) * N
        upd = self._build_update(weighted=True)
        low, high = self.low, self.high

        def rollout(actor_params, key, explore):
            k_reset, k_steps = jax.random.split(key)
            state, obs = env.reset(k_reset, batch=B)

            def step(carry, k):
                state, obs = carry
                ku, ks = jax.random.split(k)
                a_pol, _ = self._sample_action(actor_params, obs, ks)
                a_uni = jax.random.uniform(ku, (B, 2), minval=low,
                                           maxval=high)
                # x64 test mode: uniform promotes to f64; keep the carry
                # dtype stable against the policy action's dtype.
                a = jnp.where(explore, a_uni.astype(a_pol.dtype), a_pol)
                active = ~state.done
                nstate, nobs, r, term, _ = env.step(state, a)
                rec = (obs, a, r, nobs, term.astype(jnp.float32),
                       active.astype(jnp.float32))
                return (nstate, nobs), rec

            keys = jax.random.split(k_steps, T)
            (state, _), recs = jax.lax.scan(step, (state, obs), keys)
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((N,) + x.shape[2:]), recs)
            return flat, state.total_reward

        @jax.jit
        def chunk(actor_params, critic_params, target_params, log_alpha,
                  opts, buf, ptr, size, total_steps, key):
            def it(carry, k):
                (actor_params, critic_params, target_params, log_alpha,
                 opts, buf, ptr, size, total_steps) = carry
                k_roll, k_upd = jax.random.split(k)
                explore = total_steps < cfg.learning_starts
                flat, ep_rew = rollout(actor_params, k_roll, explore)
                obs_f, act_f, rew_f, nobs_f, done_f, valid_f = flat
                bo, ba, br, bn, bd, bw = buf
                dyn = jax.lax.dynamic_update_slice
                z = jnp.zeros((), ptr.dtype)        # index-dtype match (x64)
                buf = (dyn(bo, obs_f, (ptr, z)), dyn(ba, act_f, (ptr, z)),
                       dyn(br, rew_f, (ptr,)), dyn(bn, nobs_f, (ptr, z)),
                       dyn(bd, done_f, (ptr,)), dyn(bw, valid_f, (ptr,)))
                ptr2 = (ptr + N) % cap
                size2 = jnp.minimum(size + N, cap)
                total2 = total_steps + jnp.sum(valid_f).astype(jnp.int32)

                def do_upd(carry, ku):
                    (actor_params, critic_params, target_params,
                     log_alpha, opts) = carry
                    ki, kb = jax.random.split(ku)
                    idx = jax.random.randint(ki, (cfg.batch_size,), 0,
                                             jnp.maximum(size2, 1))
                    batch = (buf[0][idx], buf[1][idx], buf[2][idx],
                             buf[3][idx], buf[4][idx], buf[5][idx])
                    (actor_params, critic_params, target_params, log_alpha,
                     opts, closs, aloss) = upd.__wrapped__(
                        actor_params, critic_params, target_params,
                        log_alpha, opts, batch, kb)
                    return (actor_params, critic_params, target_params,
                            log_alpha, opts), (closs, aloss)

                can_update = size2 >= cfg.batch_size

                def run_updates(args):
                    carry0, keys = args
                    return jax.lax.scan(do_upd, carry0, keys)

                def skip_updates(args):
                    carry0, keys = args
                    z = jnp.zeros((updates_per_rollout,))
                    return carry0, (z, z)

                ukeys = jax.random.split(k_upd, updates_per_rollout)
                carry0 = (actor_params, critic_params, target_params,
                          log_alpha, opts)
                (actor_params, critic_params, target_params, log_alpha,
                 opts), (closses, alosses) = jax.lax.cond(
                    can_update, run_updates, skip_updates, (carry0, ukeys))

                out = (jnp.mean(ep_rew), jnp.mean(closses),
                       jnp.mean(alosses))
                return (actor_params, critic_params, target_params,
                        log_alpha, opts, buf, ptr2, size2, total2), out

            keys = jax.random.split(key, iters)
            carry = (actor_params, critic_params, target_params, log_alpha,
                     opts, buf, ptr, size, total_steps)
            carry, (rews, closses, alosses) = jax.lax.scan(it, carry, keys)
            return carry, rews, closses, alosses

        return chunk, cap

    def train_on_device(self, total_timesteps: int,
                        iters_per_dispatch: int = 8,
                        updates_per_rollout: int = 8) -> dict:
        """Like :meth:`train` but fused into on-device chunk programs with
        a device-resident ring replay buffer (see _build_train_chunk).
        Returns the train() schema plus wall/backend for artifacts."""
        import time
        B = self.cfg.batch_envs
        T = self.env.max_bounces + 2
        steps_per_iter = T * B
        iters = max(1, total_timesteps // steps_per_iter)
        n_chunks = max(1, -(-iters // iters_per_dispatch))
        ck = (iters_per_dispatch, updates_per_rollout)
        cache = getattr(self, "_device_chunks", None)
        if cache is None:
            cache = self._device_chunks = {}
        if ck not in cache:
            cache[ck] = self._build_train_chunk(*ck)
        chunk, cap = cache[ck]
        f32 = jnp.float32
        buf = (jnp.zeros((cap, 18), f32), jnp.zeros((cap, 2), f32),
               jnp.zeros((cap,), f32), jnp.zeros((cap, 18), f32),
               jnp.zeros((cap,), f32), jnp.zeros((cap,), f32))
        ptr = jnp.zeros((), jnp.int32)
        size = jnp.zeros((), jnp.int32)
        total = jnp.zeros((), jnp.int32)
        opts = (self.actor_opt, self.critic_opt, self.alpha_opt)
        t0 = time.perf_counter()
        closs = aloss = 0.0
        for _ in range(n_chunks):
            self._key, k = jax.random.split(self._key)
            (self.actor_params, self.critic_params,
             self.target_critic_params, self.log_alpha, opts, buf, ptr,
             size, total), rews, closses, alosses = chunk(
                self.actor_params, self.critic_params,
                self.target_critic_params, self.log_alpha, opts, buf,
                ptr, size, total, k)
            self.episode_rewards.extend(np.asarray(rews).tolist())
            closs = float(np.asarray(closses)[-1])
            aloss = float(np.asarray(alosses)[-1])
        jax.block_until_ready(self.actor_params)
        (self.actor_opt, self.critic_opt, self.alpha_opt) = opts
        wall = time.perf_counter() - t0
        self.total_steps += int(total)
        return {"total_steps": int(total),
                "buffer_capacity": cap,
                "critic_loss": closs, "actor_loss": aloss,
                "mean_episode_reward": float(np.mean(
                    self.episode_rewards[-iters_per_dispatch:])),
                "wall_seconds": wall,
                "dispatches": n_chunks,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0])}

    # -- training loop -----------------------------------------------------
    def train(self, total_timesteps: int, updates_per_rollout: int = 8) -> dict:
        env = self.env
        B = self.cfg.batch_envs
        T = env.max_bounces + 2
        closs = aloss = 0.0
        tb = None
        if self.cfg.tensorboard_log:
            from ..utils.tb import SummaryWriter, next_run_dir
            tb = SummaryWriter(next_run_dir(self.cfg.tensorboard_log, "SAC"))
        while self.total_steps < total_timesteps:
            self._key, kr, ks = jax.random.split(self._key, 3)
            state, obs = env.reset(kr, batch=B)
            for t in range(T):
                self._key, ka = jax.random.split(self._key)
                if self.total_steps < self.cfg.learning_starts:
                    a = jax.random.uniform(ka, (B, 2), minval=self.low,
                                           maxval=self.high)
                else:
                    a, _ = self._sample_action(self.actor_params, obs, ka)
                active = ~np.asarray(state.done)
                nstate, nobs, r, term, _ = env.step(state, a)
                if active.any():
                    self.buffer.add(np.asarray(obs)[active],
                                    np.asarray(a)[active],
                                    np.asarray(r)[active],
                                    np.asarray(nobs)[active],
                                    np.asarray(term)[active].astype(np.float32))
                self.total_steps += int(active.sum())
                state, obs = nstate, nobs
                if bool(np.asarray(state.done).all()):
                    break
            self.episode_rewards.append(float(np.mean(
                np.asarray(state.total_reward))))
            if (self.buffer.size >= self.cfg.batch_size
                    and self.total_steps >= self.cfg.learning_starts):
                for _ in range(updates_per_rollout):
                    self._key, kb, ku = jax.random.split(self._key, 3)
                    batch = self.buffer.sample(
                        np.random.default_rng(int(jax.random.randint(
                            kb, (), 0, 2**31 - 1))), self.cfg.batch_size)
                    (self.actor_params, self.critic_params,
                     self.target_critic_params, self.log_alpha,
                     (self.actor_opt, self.critic_opt, self.alpha_opt),
                     closs, aloss) = self._update(
                        self.actor_params, self.critic_params,
                        self.target_critic_params, self.log_alpha,
                        (self.actor_opt, self.critic_opt, self.alpha_opt),
                        tuple(jnp.asarray(b) for b in batch), ku)
            if tb is not None:
                tb.add_scalar("rollout/ep_rew_mean",
                              self.episode_rewards[-1], self.total_steps)
                tb.add_scalar("train/critic_loss", float(closs),
                              self.total_steps)
                tb.add_scalar("train/actor_loss", float(aloss),
                              self.total_steps)
                tb.add_scalar("train/ent_coef",
                              float(jnp.exp(self.log_alpha)),
                              self.total_steps)
        if tb is not None:
            tb.close()
        return {"total_steps": self.total_steps,
                "critic_loss": float(closs), "actor_loss": float(aloss),
                "mean_episode_reward": float(np.mean(
                    self.episode_rewards[-20:]))}

    def predict(self, obs, deterministic: bool = True):
        obs = jnp.atleast_2d(jnp.asarray(obs, jnp.float32))
        mean, log_std = self.actor.apply({"params": self.actor_params}, obs)
        if deterministic:
            u = mean
        else:
            self._key, k = jax.random.split(self._key)
            u = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape, mean.dtype)
        a = self.mid + self.scale * jnp.tanh(u)
        return np.asarray(a[0] if a.shape[0] == 1 else a)

    def save(self, path):
        """``.npz`` → flat numpy archive (the shipped-checkpoint format:
        no pickle execution on load, like the FB checkpoints); anything
        else → pickle (the original in-repo format)."""
        from pathlib import Path
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        if str(path).endswith(".npz"):
            import json as _json
            flat = {}
            for tree, prefix in ((self.actor_params, "actor"),
                                 (self.critic_params, "critic")):
                for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                    key = prefix + "".join("/" + str(k.key) for k in kp)
                    flat[key] = np.asarray(leaf)
            flat["log_alpha"] = np.asarray(float(self.log_alpha))
            flat["__config__"] = np.frombuffer(
                _json.dumps(dataclasses.asdict(self.cfg)).encode(), np.uint8)
            np.savez(path, **flat)
            return
        import pickle
        with open(path, "wb") as f:
            pickle.dump({"actor": to_np(self.actor_params),
                         "critic": to_np(self.critic_params),
                         "log_alpha": float(self.log_alpha),
                         "config": dataclasses.asdict(self.cfg)}, f)

    def load(self, path):
        if str(path).endswith(".npz"):
            with np.load(path) as z:
                trees = {"actor": {}, "critic": {}}
                for key in z.files:
                    if key in ("log_alpha", "__config__"):
                        continue
                    prefix, _, rest = key.partition("/")
                    node = trees[prefix]
                    parts = rest.split("/")
                    for p in parts[:-1]:
                        node = node.setdefault(p, {})
                    node[parts[-1]] = jnp.asarray(z[key])
                self.actor_params = trees["actor"]
                self.critic_params = trees["critic"]
                self.log_alpha = jnp.asarray(float(z["log_alpha"]))
            return
        import pickle
        with open(path, "rb") as f:
            ck = pickle.load(f)
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.actor_params = to_j(ck["actor"])
        self.critic_params = to_j(ck["critic"])
        self.log_alpha = jnp.asarray(ck["log_alpha"])

    def load_sb3(self, path):
        """Import a stable-baselines3 SAC ``.zip`` save (the reference's
        checkpoint format, RL/use_trained_model.py:107) — weight-level:
        actor, both critics, and the target critics all transfer, and
        ``predict`` then reproduces SB3's deterministic actions (pinned in
        tests/test_sb3_import.py)."""
        from ..utils.sb3_import import (action_bounds, import_sac_policy,
                                        load_sb3_zip)
        ck = load_sb3_zip(path)
        trees = import_sac_policy(ck["policy"])
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.actor_params = to_j(trees["actor"])
        self.critic_params = to_j(trees["critic"])
        self.target_critic_params = to_j(trees["target_critic"])
        try:
            low, high = action_bounds(ck["data"])
            self.low, self.high = jnp.asarray(low), jnp.asarray(high)
            self.scale = (self.high - self.low) / 2.0
            self.mid = (self.high + self.low) / 2.0
        except ValueError:
            pass                      # keep the env-derived bounds


class _Buffer:
    def __init__(self, capacity, obs_dim, action_dim):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.action = np.zeros((capacity, action_dim), np.float32)
        self.reward = np.zeros((capacity,), np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), np.float32)
        self.done = np.zeros((capacity,), np.float32)
        self.pos = 0
        self.size = 0

    def add(self, obs, action, reward, next_obs, done):
        n = obs.shape[0]
        idx = (self.pos + np.arange(n)) % self.capacity
        self.obs[idx] = obs
        self.action[idx] = action
        self.reward[idx] = reward
        self.next_obs[idx] = next_obs
        self.done[idx] = done
        self.pos = int((self.pos + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))

    def sample(self, rng, batch):
        idx = rng.integers(0, self.size, batch)
        return (self.obs[idx], self.action[idx], self.reward[idx],
                self.next_obs[idx], self.done[idx])
