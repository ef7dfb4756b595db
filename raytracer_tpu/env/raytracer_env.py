"""Batched pure-JAX ray-tracing RL environment.

TPU-native rebuild of the two ``RayTracerEnv`` variants:

* ``variant="rl"`` — RL/ray_tracer_env.py:21-425: action (θ, φ) ∈
  [0, π/2] × [0, 2π]; reward = shading brightness at the *pre-move*
  intersection − 0.01·bounces; miss penalties −0.1 / −1.0.
* ``variant="fb"`` — FB/ray_tracer_env.py:21-538: action ∈ [-1, 1]² with
  θ = (a₀+1)π/4, φ = a₁π; reward rewritten around the sun sphere (id=7):
  +10 for being on / hitting the sun, else an ambient+cosine lighting
  reward with a single-sweep shadow check (0.3 … 1.0).

The reference steps ONE episode at a time through Python + SB3; here
``reset``/``step`` are jitted functions over ``B`` parallel episodes — the
whole rollout batch advances per call, which is what makes on-device RL
training viable (SURVEY.md §7 "host↔device episode loop").

Episode anatomy (both variants): an episode is one pixel's light path. The
initial camera ray is *fully Whitted-traced* (mirrors/glass resolve to a
terminal surface); each step's new ray resumes the recursive tracer with
``suppress_ids=[current id]`` and the running bounce budget.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import vec
from ..core.intersect import sphere_ts
from ..scene.types import GlobalLights, PointLights, Scene
from ..trace import sampling
from ..trace.shade import terminal_rgb
from ..trace.whitted import TraceResult, trace_whitted

OBS_DIM = 18


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Per-episode state, batched ``[B, ...]``."""

    pixel: jnp.ndarray        # [B, 2] i32 (x, y)
    ray_o: jnp.ndarray        # [B, 3]
    ray_d: jnp.ndarray        # [B, 3]
    hit: jnp.ndarray          # [B] bool — current intersection valid
    idx: jnp.ndarray          # [B] i32
    point: jnp.ndarray        # [B, 3]
    normal: jnp.ndarray       # [B, 3]
    acc_colour: jnp.ndarray   # [B, 3]
    bounce: jnp.ndarray       # [B] i32
    through: jnp.ndarray      # [B] i32
    total_reward: jnp.ndarray # [B] f32
    done: jnp.ndarray         # [B] bool


class RayTracerEnv:
    """Batched environment. All methods are jit-compiled; the instance only
    holds the (hashable-static + pytree) configuration."""

    def __init__(self, scene: Scene, *, image_width: int = 800,
                 image_height: int = 600, camera_position=(0.0, 0.0, 0.0),
                 camera_angle=(0.0, 0.0, 0.0), fov: float = 90.0,
                 max_bounces: int = 5, background=(0.0, 0.0, 0.0),
                 global_lights: Optional[GlobalLights] = None,
                 point_lights: Optional[PointLights] = None,
                 variant: str = "rl", sun_id: int = 7):
        from ..scene.types import empty_global_lights, empty_point_lights
        self.scene = scene
        self.glights = global_lights if global_lights is not None else empty_global_lights()
        self.plights = point_lights if point_lights is not None else empty_point_lights()
        self.image_width = image_width
        self.image_height = image_height
        self.camera_position = jnp.asarray(camera_position, jnp.float32)
        self.camera_angle = tuple(float(a) for a in camera_angle)
        self.fov = float(fov)
        self.max_bounces = int(max_bounces)
        self.background = jnp.asarray(background, jnp.float32)
        assert variant in ("rl", "fb")
        self.variant = variant
        self.sun_id = int(sun_id)

    # -- camera ------------------------------------------------------------
    def _initial_rays(self, pixel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RL/ray_tracer_env.py:121-142 pinhole (aspect applied once)."""
        aspect = self.image_width / self.image_height
        half = jnp.tan(jnp.asarray(self.fov * jnp.pi / 180.0 / 2.0, jnp.float32))
        x = pixel[:, 0].astype(jnp.float32)
        y = pixel[:, 1].astype(jnp.float32)
        px = (2.0 * (x + 0.5) / self.image_width - 1.0) * aspect * half
        py = (1.0 - 2.0 * (y + 0.5) / self.image_height) * half
        d = jnp.stack([px, py, -jnp.ones_like(px)], axis=-1)
        d = vec.normalise_safe(d)
        if any(a != 0.0 for a in self.camera_angle):
            d = vec.rotate_euler(d, *self.camera_angle)
        o = jnp.broadcast_to(self.camera_position, d.shape)
        return o, d

    # -- observation (RL/ray_tracer_env.py:184-222) ------------------------
    def _observation(self, s: EnvState) -> jnp.ndarray:
        sc = self.scene
        obs = jnp.concatenate([
            s.point, s.ray_d, s.normal,
            sc.reflective[s.idx][:, None], sc.transparent[s.idx][:, None],
            sc.emitive[s.idx][:, None], sc.ior[s.idx][:, None],
            s.acc_colour / 255.0,
            s.bounce[:, None].astype(jnp.float32),
            s.through[:, None].astype(jnp.float32),
        ], axis=-1)
        return jnp.where(s.hit[:, None], obs, 0.0)

    def _shade(self, res: TraceResult) -> jnp.ndarray:
        """terminalRGB with max_bounces=0 (reward + colour accumulation)."""
        return terminal_rgb(self.scene, self.glights, self.plights, res,
                            self.background, shadow_max_bounces=0)

    def _brightness_reward(self, s: EnvState, bounce) -> jnp.ndarray:
        """RL variant _calculate_reward (RL/ray_tracer_env.py:224-252)."""
        res = TraceResult(hit=s.hit, idx=s.idx, point=s.point,
                          normal=s.normal, t=jnp.zeros_like(s.point[:, 0]),
                          bounces=s.bounce, through=s.through)
        rgb = self._shade(res)
        brightness = jnp.sum(rgb, axis=-1) / (3.0 * 255.0)
        reward = brightness - 0.01 * bounce.astype(jnp.float32)
        return jnp.where(s.hit, reward, -0.1)

    def _lighting_reward(self, hit, idx, point, normal) -> jnp.ndarray:
        """FB variant _calculate_lighting_reward
        (FB/ray_tracer_env.py:280-336): 0.3 ambient + 0.7·cos-to-sun with a
        one-sweep shadow test; 0 on lights/misses, 0.1 with no sun."""
        sc = self.scene
        B = idx.shape[0]
        sun_mask = sc.id == self.sun_id
        has_sun = jnp.any(sun_mask)
        sun_i = jnp.argmax(sun_mask)                       # first matching
        sun_c = sc.centre[sun_i]

        to_sun = sun_c[None, :] - point
        sun_dist = vec.magnitude(to_sun)
        to_sun_n = vec.normalise_safe(to_sun)
        cos = jnp.maximum(vec.dot(normal, to_sun_n), 0.0)

        o = point + normal * 0.001
        t, valid = sphere_ts(o[:, None, :], to_sun_n[:, None, :],
                             sc.centre, sc.radius, point=0)
        # Exclude the hit sphere itself (identity) and the sun (by id).
        excl = (jnp.arange(sc.num_spheres)[None, :] == idx[:, None]) | sun_mask[None, :]
        valid = valid & ~excl
        # shadow_dist = |shadow hit point − intersection point|; the shadow
        # ray origin is offset 0.001 so this is t + (origin offset along ray)
        # — the reference measures from the unoffset point.
        hitp = o[:, None, :] + to_sun_n[:, None, :] * t[..., None]
        sdist = vec.magnitude(hitp - point[:, None, :])
        in_shadow = jnp.any(valid & (sdist < sun_dist[:, None]), axis=-1)

        reward = jnp.where(in_shadow, 0.3, 0.3 + 0.7 * cos)
        reward = jnp.where(has_sun, reward, 0.1)
        reward = jnp.where(sc.emitive[idx] > 0, 0.0, reward)   # on a light
        return jnp.where(hit, reward, 0.0)

    # -- API ---------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "batch"))
    def reset(self, key: jax.Array, batch: int = 1,
              pixel: Optional[jnp.ndarray] = None) -> Tuple[EnvState, jnp.ndarray]:
        B = batch
        if pixel is None:
            kx, ky = jax.random.split(key)
            px = jax.random.randint(kx, (B,), 0, self.image_width)
            py = jax.random.randint(ky, (B,), 0, self.image_height)
            pixel = jnp.stack([px, py], axis=-1)
        else:
            pixel = jnp.broadcast_to(jnp.asarray(pixel, jnp.int32), (B, 2))

        o, d = self._initial_rays(pixel)
        res = trace_whitted(self.scene, o, d, max_bounces=self.max_bounces)
        zf = jnp.zeros((B,), jnp.float32)
        zi = jnp.zeros((B,), jnp.int32)
        state = EnvState(pixel=pixel, ray_o=o, ray_d=d, hit=res.hit,
                         idx=res.idx, point=res.point, normal=res.normal,
                         acc_colour=jnp.zeros((B, 3), jnp.float32),
                         bounce=zi, through=zi, total_reward=zf,
                         done=jnp.zeros((B,), bool))
        return state, self._observation(state)

    @partial(jax.jit, static_argnames=("self",))
    def step(self, state: EnvState, action: jnp.ndarray
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
        """Advance every episode one bounce.  Returns
        ``(state, obs, reward, terminated, truncated-as-info-dict)``.
        Lanes already done pass through unchanged with zero reward."""
        s = state
        sc = self.scene
        B = s.idx.shape[0]

        missed = ~s.hit
        budget = s.hit & (s.bounce >= self.max_bounces)
        if self.variant == "fb":
            on_sun = s.hit & ~budget & (sc.id[s.idx] == self.sun_id)
        else:
            on_sun = jnp.zeros((B,), bool)
        moving = s.hit & ~budget & ~on_sun

        # Direction from action.
        if self.variant == "rl":
            new_d = sampling.env_action_to_direction(action, s.normal, "env")
        else:
            new_d = sampling.fb_action_to_direction(action, s.normal, "env")

        new_bounce = jnp.where(moving, s.bounce + 1, s.bounce)
        nxt = trace_whitted(sc, s.point, new_d,
                            max_bounces=self.max_bounces,
                            suppress_id=sc.id[s.idx],
                            bounces0=new_bounce, through0=s.through)

        # Rewards.
        if self.variant == "rl":
            # Pre-move intersection brightness (a reference quirk: the state
            # is updated only after the reward, RL/ray_tracer_env.py:361-369).
            move_reward = self._brightness_reward(s, new_bounce)
            budget_reward = self._brightness_reward(s, s.bounce)
            reward = jnp.where(missed, -1.0,
                               jnp.where(budget, budget_reward, move_reward))
            terminated = missed | budget | (moving & ~nxt.hit)
            truncated = budget | (moving & nxt.hit & (new_bounce >= self.max_bounces))
            terminated = terminated | truncated
        else:
            hit_sun_next = moving & nxt.hit & (sc.id[nxt.idx] == self.sun_id)
            lighting_next = self._lighting_reward(nxt.hit, nxt.idx, nxt.point,
                                                  nxt.normal)
            lighting_cur = self._lighting_reward(s.hit, s.idx, s.point,
                                                 s.normal)
            reward = jnp.where(missed, -1.0,
                      jnp.where(budget, lighting_cur,
                       jnp.where(on_sun, 10.0,
                        jnp.where(hit_sun_next, 10.0,
                         jnp.where(moving & ~nxt.hit, -0.1, lighting_next)))))
            terminated = (missed | budget | on_sun | hit_sun_next
                          | (moving & ~nxt.hit)
                          | (moving & (new_bounce >= self.max_bounces)))
            truncated = budget | (moving & nxt.hit & ~hit_sun_next
                                  & (new_bounce >= self.max_bounces))

        # Colour accumulation from the new intersection (max_bounces=0 shade).
        step_rgb = self._shade(nxt)
        acc = jnp.where((moving & nxt.hit)[:, None],
                        s.acc_colour + step_rgb, s.acc_colour)

        # Already-done lanes: freeze everything, emit zero reward.
        reward = jnp.where(s.done, 0.0, reward)
        terminated = jnp.where(s.done, True, terminated)
        truncated = jnp.where(s.done, False, truncated)

        # total_reward accumulation quirks: the miss branches return -1.0
        # without accumulating, and the FB already-on-sun branch only adds
        # the +10 to the info copy (RL/ray_tracer_env.py:313-323,
        # FB/ray_tracer_env.py:420-430).
        accum = reward * (~missed & ~on_sun)

        upd = moving & ~s.done
        new_state = EnvState(
            pixel=s.pixel,
            ray_o=jnp.where(upd[:, None], s.point, s.ray_o),
            ray_d=jnp.where(upd[:, None], new_d, s.ray_d),
            hit=jnp.where(upd, nxt.hit, s.hit),
            idx=jnp.where(upd, nxt.idx, s.idx),
            point=jnp.where(upd[:, None], nxt.point, s.point),
            normal=jnp.where(upd[:, None], nxt.normal, s.normal),
            acc_colour=jnp.where(upd[:, None], acc, s.acc_colour),
            bounce=jnp.where(upd, new_bounce, s.bounce),
            through=jnp.where(upd, nxt.through, s.through),
            total_reward=s.total_reward + accum,
            done=s.done | terminated,
        )
        obs = self._observation(new_state)
        info = {"truncated": truncated,
                "bounce": new_state.bounce,
                "total_reward": new_state.total_reward}
        return new_state, obs, reward, terminated, info

    def __hash__(self):
        return hash((self.image_width, self.image_height, self.fov,
                     self.max_bounces, self.variant, self.sun_id,
                     self.camera_angle, id(self.scene)))

    def __eq__(self, other):
        return self is other
