"""RL-guided renderer — rebuild of ``RayTracerRL``
(RL/ray_tracer_rl_test.py:10-366).

Loads a trained policy (native SAC/PPO checkpoint; falls back to uniform
hemisphere sampling when absent, like the reference's missing-checkpoint
fallback :12-19), renders the fixed 6-sphere test scene with per-bounce
policy guidance vs a uniform-sampling control, and writes the side-by-side
comparison image.

Faithful trace semantics (:119-216): each bounce re-traces with the FULL
recursive tracer (fresh bounce budget), shading is ambient 0.1 + hardcoded
two-light diffuse (0.4/0.3) gated by shadow tests whose occlusion rule
compares the shadow *terminus's own segment distance* against the light
distance; emissive surfaces shade at brightness 1.0; colours accumulate
with ``scaleRGB(..., 'Colour')`` rounding per bounce.
"""
from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vec
from ..scene.types import Scene, SceneBuilder
from ..trace import sampling
from ..trace.whitted import trace_whitted

LIGHT1 = (0.0, 6.0, -8.0)
LIGHT2 = (-4.0, 5.0, -8.0)


def create_test_scene() -> Scene:
    """The fixed test scene (RL/ray_tracer_rl_test.py:24-43)."""
    b = SceneBuilder()
    b.add_sphere((0, -5, -15), 10, (180, 180, 180), emitive=0.1, id=1)
    b.add_sphere((0, 0, -10), 1.5, (255, 255, 255), reflective=1.0, id=2)
    b.add_sphere((-3, 0.5, -10), 1.2, (180, 180, 255), reflective=1.0, id=3)
    b.add_sphere((3, -0.3, -10), 1.2, (255, 180, 180), reflective=1.0, id=4)
    b.add_sphere((0, 6, -8), 1.0, (255, 255, 200), emitive=1.0, id=99)
    b.add_sphere((-4, 5, -8), 0.8, (200, 255, 200), emitive=1.0, id=100)
    scene, _, _ = b.build()
    return scene


@partial(jax.jit, static_argnames=("max_bounces",))
def _bounce_kernel(scene: Scene, o, d, running, acc, *, max_bounces: int):
    """One guided-render bounce: full whitted trace + the simplified
    two-light shading; returns the hit context for the policy."""
    dtype = o.dtype
    R = o.shape[0]
    res = trace_whitted(scene, o, d, max_bounces=max_bounces)
    hit = running & res.hit

    l1 = jnp.asarray(LIGHT1, dtype)
    l2 = jnp.asarray(LIGHT2, dtype)

    def light_vis(lpos):
        to_l = lpos[None] - res.point
        dist = vec.magnitude(to_l)
        sres = trace_whitted(scene, res.point + res.normal * 0.001,
                             vec.normalise_safe(to_l), max_bounces=1,
                             suppress_id=scene.id[res.idx])
        blocked = sres.hit & (sres.t < dist)
        cos = jnp.maximum(vec.dot(res.normal, vec.normalise_safe(to_l)), 0.0)
        return ~blocked, cos

    v1, c1 = light_vis(l1)
    v2, c2 = light_vis(l2)
    diffuse = jnp.where(v1, 0.4 * c1, 0.0) + jnp.where(v2, 0.3 * c2, 0.0)
    emis = scene.emitive[res.idx] > 0
    brightness = jnp.where(emis, 1.0, 0.1 + diffuse)
    shade = jnp.round(scene.colour[res.idx].astype(dtype)
                      * brightness[:, None])
    acc = jnp.where(hit[:, None], acc + shade, acc)
    return res, hit, acc


def render_guided(scene: Scene, policy: Optional[Callable], key, *,
                  width: int = 400, height: int = 300, fov: float = 90.0,
                  max_bounces: int = 5, spp: int = 1) -> np.ndarray:
    """Render with per-bounce policy guidance (policy=None → uniform).

    ``policy(obs[R,18]) -> action[R,2]`` in the env action convention.
    """
    from ..render.camera import perspective_rays

    total = None
    for s in range(spp):
        key, ks = jax.random.split(key)
        o, d = perspective_rays(width, height, fov=fov, origin=(0, 0, 0),
                                variant="env")
        o = o.astype(jnp.float32)
        d = vec.normalise_safe(d.astype(jnp.float32))
        R = o.shape[0]
        running = jnp.ones((R,), bool)
        acc = jnp.zeros((R, 3), jnp.float32)
        for bounce in range(max_bounces):
            res, hit, acc = _bounce_kernel(scene, o, d, running, acc,
                                           max_bounces=max_bounces)
            running = hit
            if not bool(jnp.any(running)):
                break
            obs = jnp.concatenate([
                res.point, d, res.normal,
                scene.reflective[res.idx][:, None],
                scene.transparent[res.idx][:, None],
                scene.emitive[res.idx][:, None],
                scene.ior[res.idx][:, None],
                jnp.zeros((R, 3), jnp.float32),
                jnp.full((R, 1), float(bounce), jnp.float32),
                jnp.zeros((R, 1), jnp.float32),
            ], axis=-1)
            key, kd = jax.random.split(key)
            if policy is not None:
                action = jnp.asarray(policy(obs))
                new_d = sampling.env_action_to_direction(action, res.normal,
                                                         "env")
            else:
                u = jax.random.uniform(kd, (R, 2), jnp.float32)
                theta = u[:, 0] * jnp.pi / 2
                phi = u[:, 1] * 2 * jnp.pi
                new_d = sampling.local_to_world(theta, phi, res.normal, "env")
            o = jnp.where(running[:, None], res.point + res.normal * 0.001, o)
            d = jnp.where(running[:, None], new_d, d)
        total = acc if total is None else total + acc
    img = np.asarray(total)
    if spp > 1:
        img = np.trunc(img / spp)
    img = np.clip(img, 0, 255).reshape(height, width, 3)
    return img


class RayTracerRL:
    """Facade mirroring the reference class: load-or-fallback + the two
    render entry points."""

    def __init__(self, model_path: Optional[str] = "raytracer_final",
                 algo: str = "sac", seed: int = 0):
        self.scene = create_test_scene()
        self._key = jax.random.key(seed)
        self.rl_model = None
        self.use_rl = False
        if model_path and Path(str(model_path)).exists():
            try:
                self.rl_model = self._load_policy(model_path, algo)
                self.use_rl = True
            except Exception as e:                      # pragma: no cover
                print(f"RL model load failed ({e!r}); "
                      "using traditional sampling")
        else:
            print("RL model not found, using traditional sampling")

    def _load_policy(self, path, algo):
        from ..env.raytracer_env import RayTracerEnv
        env = RayTracerEnv(self.scene, image_width=400, image_height=300,
                           fov=90, max_bounces=5, variant="rl")
        if algo == "sac":
            from ..agents.sac import SACTrainer
            tr = SACTrainer(env, seed=0)
        else:
            from ..agents.ppo import PPOTrainer
            tr = PPOTrainer(env, seed=0)
        tr.load(path)
        return lambda obs: tr.predict(np.asarray(obs), deterministic=True)

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def render_single_view(self, width=400, height=300, use_rl=True):
        policy = self.rl_model if (use_rl and self.use_rl) else None
        return render_guided(self.scene, policy, self._split(),
                             width=width, height=height)

    def render_comparison(self, width=400, height=300,
                          out_path="rl_vs_traditional_comparison.png"):
        rl_img = self.render_single_view(width, height, use_rl=True)
        trad_img = self.render_single_view(width, height, use_rl=False)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (a1, a2) = plt.subplots(1, 2, figsize=(12, 5))
        a1.imshow(rl_img.astype(np.uint8))
        a1.set_title("RL-guided" if self.use_rl else "RL (fallback)")
        a1.axis("off")
        a2.imshow(trad_img.astype(np.uint8))
        a2.set_title("Traditional")
        a2.axis("off")
        plt.tight_layout()
        plt.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return rl_img, trad_img
