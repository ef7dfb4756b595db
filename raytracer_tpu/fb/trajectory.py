"""Batched trajectory generation for FB training.

TPU-native form of ``RayTracedComplexTrainer.generate_trajectory``
(FB/train_complex_only.py:254-348): a random walk from a random surface
point on a random non-light sphere, recording
``(obs, action, next_obs, reward ∈ {0,1}, hit_light)`` transitions until a
light is hit, the ray escapes, or the bounce budget runs out.

The reference walks ONE trajectory at a time in Python; here ``W`` walkers
advance together under ``lax.scan`` — one device launch generates the whole
experience batch.

Preserved details: the (θ~U[0,2π], φ~U[0,π]) pole-biased surface sampling,
cosine-weighted step directions in the "trainer" tangent frame (threshold
0.999), ``direction_to_action`` hemisphere clamp, 0.001 normal offset,
exclusion of the current sphere by id, |t| nearest ordering, and the quirk
that ``accumulated colour`` never actually updates (stays black) so the obs
colour features are the light's colour only on the terminal light hit.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.intersect import nearest_hit, take_small
from ..scene.types import Scene
from ..trace import sampling
from ..trace.path import make_observation


class TrajectoryBatch(NamedTuple):
    obs: jnp.ndarray        # [T, W, 22]
    action: jnp.ndarray     # [T, W, 2]
    next_obs: jnp.ndarray   # [T, W, 22]
    reward: jnp.ndarray     # [T, W]
    hit_light: jnp.ndarray  # [T, W] bool
    hit_small: jnp.ndarray  # [T, W] bool — the hit light has radius < 0.5
    valid: jnp.ndarray      # [T, W] bool
    episode_hit: jnp.ndarray  # [W] bool — did the walker ever reach a light


@partial(jax.jit, static_argnames=("num_walkers", "max_steps", "start_bias",
                                   "guide_apply"))
def generate_trajectories(scene: Scene, key: jax.Array, *,
                          num_walkers: int = 256,
                          max_steps: int = 8,
                          start_bias: str = "uniform",
                          guide_apply=None, guide_params=None,
                          guide_proto=None, guide_prob=0.0,
                          guide_noise=0.1,
                          wall_frac: float = 0.35) -> TrajectoryBatch:
    """``start_bias``:

    * ``"uniform"`` — the reference's ``random.choice(non_light)``
      (FB/train_complex_only.py:268).  NB: on wall-heavy scenes this puts
      most walkers on the far side of radius-100 spheres and the measured
      episode hit rate is ≈0 — we verified the *reference's own* walk code
      scores 0/200 on the chandelier scene, so the training report's
      18-48%% "hit rates" must come from the missing trainer's simplified
      (non-ray-traced) experience, not this walk.
    * ``"small"`` — weight start spheres by 1/(1+r): walkers start on the
      scene-core objects, making real ray-traced training productive.
    * ``"mixed"`` — ``"small"``, but ~35%% of walkers start on WALL spheres
      (radius ≥ 5), on the core-facing surface region: the surface point is
      the projection toward a uniform target inside the scene core's
      inflated bounding box.  Rationale (measured, fb/distill.py scope
      note): a teacher trained only from core starts aims poorly from
      wall/floor surface points, which dominate 4:3 (800×600) views — the
      v2 chandelier model scores 2.8× small-light hits at 200×100 (2:1)
      but <1× at 800×600.  Pole-biased ``uniform_on_sphere`` on a
      radius-99 wall almost never lands on the ~10-unit core-facing cap,
      so wall competence needs explicit start coverage.

    Guide-in-the-loop: pass ``guide_apply(params, obs, proto) -> mean`` (a
    static callable; params/prototype travel as traced ARGUMENTS so big
    policy weights never inline as XLA constants), plus ``guide_prob``/
    ``guide_noise``.  Each step, each walker follows the current policy's
    noisy action with probability ``guide_prob`` instead of the cosine
    random walk — the experience distribution then tracks the improving
    policy (the off-policy data-collection loop the reference's random-walk
    trainers lack).
    """
    W = num_walkers
    dtype = scene.centre.dtype
    emissive = scene.emitive > 0

    k_start, k_point, k_dir, k_walk = jax.random.split(key, 4)

    # Random non-light start sphere (radius<=0 excludes pad_scene dummies).
    real = scene.radius > 0
    WALL_R = 5.0
    if start_bias in ("small", "mixed"):
        logits = jnp.where(emissive | ~real, -jnp.inf,
                           -jnp.log1p(scene.radius))
        if start_bias == "mixed":
            # Exclude walls from the small-biased draw; they get their own.
            logits = jnp.where(scene.radius >= WALL_R, -jnp.inf, logits)
    else:
        logits = jnp.where(emissive | ~real, -jnp.inf, 0.0)
    idx0 = jax.random.categorical(k_start, logits, shape=(W,))
    point0, normal0 = sampling.uniform_on_sphere(
        k_point, scene.centre[idx0], scene.radius[idx0])

    if start_bias == "mixed":
        k_point, k_wall, k_mix, k_tgt = jax.random.split(k_point, 4)
        wall = real & ~emissive & (scene.radius >= WALL_R)
        core = real & (scene.radius < WALL_R)
        # Inflated bounding box of the scene-core spheres → wall-start
        # targets cover the wall/floor area a core-framing camera sees.
        big = jnp.asarray(1e30, dtype)
        lo = jnp.min(jnp.where(core[:, None], scene.centre, big), axis=0)
        hi = jnp.max(jnp.where(core[:, None], scene.centre, -big), axis=0)
        mid, half = (lo + hi) * 0.5, (hi - lo) * 0.5 + 1.0
        target = mid + (jax.random.uniform(k_tgt, (W, 3), dtype) * 2.0
                        - 1.0) * half * 2.5
        wall_logits = jnp.where(wall, 0.0, -jnp.inf)
        idx_w = jax.random.categorical(k_wall, wall_logits, shape=(W,))
        wc = scene.centre[idx_w]
        delta = target - wc
        nrm = delta / jnp.maximum(
            jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True)), 1e-9)
        # ``wall_frac`` rides as a traced scalar (one compile for any
        # schedule): the fraction of walkers starting on wall surfaces;
        # 0.35 is the shipped v4/v5 recipe, curricula can anneal it.
        use_wall = ((jax.random.uniform(k_mix, (W,))
                     < jnp.asarray(wall_frac, dtype))
                    & jnp.any(wall) & jnp.any(core))
        idx0 = jnp.where(use_wall, idx_w, idx0)
        point0 = jnp.where(use_wall[:, None],
                           wc + nrm * scene.radius[idx_w][:, None], point0)
        normal0 = jnp.where(use_wall[:, None], nrm, normal0)
    incoming0 = sampling.cosine_weighted(k_dir, normal0, "trainer")
    mb = jnp.asarray(float(max_steps), dtype)

    def build_obs(point, normal, incoming, bounce, colour, idx):
        return make_observation(point, normal, incoming,
                               jnp.full((W,), bounce, dtype), colour,
                               scene, idx, mb)

    obs0 = build_obs(point0, normal0, incoming0, 0.0,
                     jnp.zeros((W, 3), dtype), idx0)

    def step(carry, inputs):
        point, normal, idx, obs, active = carry
        k, bounce = inputs
        k1, k2 = jax.random.split(k)

        next_dir = sampling.cosine_weighted(k1, normal, "trainer")
        action = sampling.direction_to_action(next_dir, normal, "trainer")
        if guide_apply is not None:
            k2, kg_n, kg_u = jax.random.split(k2, 3)
            g_mean = guide_apply(guide_params, obs, guide_proto)
            g_action = jnp.clip(
                g_mean + guide_noise * jax.random.normal(
                    kg_n, g_mean.shape, g_mean.dtype), -1.0, 1.0)
            g_dir = sampling.fb_action_to_direction(g_action, normal,
                                                    "trainer")
            use_g = jax.random.uniform(kg_u, (W,)) < guide_prob
            action = jnp.where(use_g[:, None], g_action, action)
            next_dir = jnp.where(use_g[:, None], g_dir, next_dir)
        o = point + normal * 0.001
        hit = nearest_hit(o, next_dir, scene, take_small(scene.id, idx),
                          by_abs=True)

        hit_light = hit.found & take_small(emissive, hit.idx)
        hit_small = hit_light & (take_small(scene.radius, hit.idx) < 0.5)
        reward = jnp.where(hit_light, 1.0, 0.0)
        colour = jnp.where(hit_light[:, None],
                           take_small(scene.colour, hit.idx).astype(dtype),
                           0.0)
        next_obs = build_obs(hit.point, hit.normal, next_dir, 0.0, colour,
                             hit.idx)
        # bounce feature of next_obs is bounce+1 (column 16 = (b+1)/max).
        next_obs = next_obs.at[:, 16].set((bounce + 1.0) / mb)

        valid = active & hit.found
        rec = (obs, action, next_obs, reward, hit_light & valid,
               hit_small & valid, valid)

        cont = active & hit.found & ~hit_light
        point = jnp.where(cont[:, None], hit.point, point)
        normal = jnp.where(cont[:, None], hit.normal, normal)
        idx = jnp.where(cont, hit.idx, idx)
        obs = jnp.where(cont[:, None], next_obs, obs)
        return (point, normal, idx, obs, cont), rec

    keys = jax.random.split(k_walk, max_steps)
    bounces = jnp.arange(max_steps, dtype=dtype)
    init = (point0, normal0, idx0, obs0, jnp.ones((W,), bool))
    _, (obs, action, next_obs, reward, hit_light, hit_small,
        valid) = jax.lax.scan(step, init, (keys, bounces))

    return TrajectoryBatch(obs=obs, action=action, next_obs=next_obs,
                           reward=reward, hit_light=hit_light,
                           hit_small=hit_small, valid=valid,
                           episode_hit=jnp.any(hit_light, axis=0))
