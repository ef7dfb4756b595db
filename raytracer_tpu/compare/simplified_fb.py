"""SimplifiedFBRenderer — rebuild of FB/output6.py (760 LoC).

Capabilities mirrored:

* model autodiscovery under ``./fb_training_outputs`` (:128-145) plus the
  reference's torch-2.6 safe-globals dance is replaced by the native
  checkpoint loader (npz or .pth via utils.torch_import),
* ``calculate_lighting_exact_original`` (:197-306): the notebook-shading
  approximation — global (3, 1, −0.75) at 0.3 + sun with min(1, 100/d²)
  attenuation at 0.9, albedo multiply (shared with the output5-style
  tracer's shading),
* FB-guided diffuse via ``choose_direction_research`` over the 22-D obs
  *with the real sun direction in the last three features* (:308-407 —
  unlike the comparison scripts' 0.5-padding),
* ``trace_ray_simple`` iterative walk (:434-577): lighting accumulation +
  mirror / 50-50 glass / FB-or-cosine diffuse,
* grid render with fov π/3 and a stats printout incl. rays/sec (:579-683).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vec
from ..core.intersect import NO_SUPPRESS, nearest_hit
from ..fb.agent import FBResearchAgent
from ..fb.config import FBConfig
from ..scene.types import Scene
from ..trace import sampling
from ..trace.output5_style import _shade_level


def find_model(base: str = "./fb_training_outputs") -> Optional[Path]:
    """Model autodiscovery (:128-145): newest checkpoint under the training
    outputs directory (native .npz preferred, reference .pth accepted)."""
    base = Path(base)
    if not base.exists():
        return None
    cands = sorted(base.glob("**/*.npz")) + sorted(base.glob("**/*.pth"))
    if not cands:
        return None
    return max(cands, key=lambda p: p.stat().st_mtime)


class SimplifiedFBRenderer:
    def __init__(self, scene: Scene, sun_idx: int,
                 model_path: Optional[str] = None,
                 config: Optional[FBConfig] = None, seed: int = 0):
        # output6 constructs the drifted legacy config (:166-179) — we keep
        # the canonical one by default and expose the legacy explicitly.
        self.config = config or FBConfig()
        self.scene = scene
        self.sun_idx = int(sun_idx)
        self.agent = FBResearchAgent(self.config, seed=seed)
        self.loaded = False
        if model_path:
            self.agent.load(model_path)
            self.loaded = True
        self._key = jax.random.key(seed)
        self.stats = {"total_rays": 0, "fb_used": 0, "render_time": 0.0,
                      "rays_per_second": 0.0}

    # -- observation with REAL sun direction (:308-407) --------------------
    def _obs_with_sun(self, point, normal, d, bounce, idx, max_bounces):
        dtype = point.dtype
        sc = self.scene
        sun_dir = vec.normalise_safe(sc.centre[self.sun_idx][None] - point)
        R = point.shape[0]
        return jnp.concatenate([
            point, d, normal,
            sc.reflective[idx][:, None].astype(dtype),
            sc.transparent[idx][:, None].astype(dtype),
            sc.emitive[idx][:, None].astype(dtype),
            sc.ior[idx][:, None].astype(dtype),
            jnp.zeros((R, 3), dtype),
            jnp.full((R, 1), bounce / max_bounces, dtype),
            jnp.zeros((R, 1), dtype),
            (sc.id[idx].astype(dtype) / 100.0)[:, None],
            sun_dir,
        ], axis=-1)

    # -- the iterative walk (:434-577) -------------------------------------
    def trace(self, origins, dirs, key, *, max_bounces: int = 6,
              fb_prob: float = 1.0):
        sc = self.scene
        dtype = origins.dtype
        R = origins.shape[0]
        o = origins
        d = vec.normalise_safe(dirs.astype(dtype))
        running = jnp.ones((R,), bool)
        acc = jnp.zeros((R, 3), dtype)
        fb_used = 0
        emissive = sc.emitive > 0
        no_sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)

        for k in range(max_bounces):
            key, k1, k2, k3 = jax.random.split(key, 4)
            hit = nearest_hit(o, d, sc, no_sup, by_abs=True)
            found = running & hit.found
            emis = found & emissive[hit.idx]
            # Lights: add their colour and stop the lane.
            acc = jnp.where(emis[:, None],
                            jnp.minimum(255.0, acc
                                        + sc.colour[hit.idx].astype(dtype)),
                            acc)
            surf = found & ~emis
            shade = _shade_level(sc, hit, dtype)
            acc = jnp.where(surf[:, None],
                            jnp.minimum(255.0, acc + shade), acc)

            mirror = surf & (sc.reflective[hit.idx] > 0.9)
            glass = surf & ~mirror & (sc.transparent[hit.idx] > 0.9)
            diffuse = surf & ~mirror & ~glass

            refl_d = vec.reflect(d, hit.normal)
            pass_thr = jax.random.uniform(k1, (R,), dtype) >= 0.5
            glass_d = jnp.where(pass_thr[:, None], d, refl_d)
            diff_d = sampling.cosine_weighted(k2, hit.normal, "renderer")
            use_fb = diffuse & (jax.random.uniform(k3, (R,), dtype) < fb_prob)
            if bool(jnp.any(use_fb)):
                obs = self._obs_with_sun(hit.point, hit.normal, d,
                                         float(k), hit.idx, max_bounces)
                action = self.agent.choose_direction_batch(obs)
                fb_d = sampling.fb_action_to_direction(
                    jnp.clip(action, -1, 1), hit.normal, "renderer")
                diff_d = jnp.where(use_fb[:, None], fb_d, diff_d)
                fb_used += int(jnp.sum(use_fb))

            new_d = jnp.where(mirror[:, None], refl_d,
                              jnp.where(glass[:, None], glass_d, diff_d))
            new_o = jnp.where(glass[:, None] & pass_thr[:, None],
                              hit.point + d * 0.001,
                              hit.point + hit.normal * 0.001)
            o = jnp.where(surf[:, None], new_o, o)
            d = jnp.where(surf[:, None], new_d, d)
            running = surf
            if not bool(jnp.any(running)):
                break
        self.stats["fb_used"] += fb_used
        return jnp.minimum(255.0, acc)

    # -- grid render, fov π/3 (:579-683) -----------------------------------
    def render_original_style(self, width: int = 200, height: int = 200, *,
                              max_bounces: int = 6,
                              camera_position=(0, 0, 1)) -> np.ndarray:
        half = np.tan((np.pi / 3) / 2)
        xs = np.linspace(-half, half, width)
        ys = np.linspace(half * height / width, -half * height / width,
                         height)
        X, Y = np.meshgrid(xs, ys)
        dirs = jnp.asarray(np.stack([X, Y, -np.ones_like(X)], -1)
                           .reshape(-1, 3), jnp.float32)
        origins = jnp.broadcast_to(jnp.asarray(camera_position, jnp.float32),
                                   dirs.shape)
        t0 = time.time()
        self._key, k = jax.random.split(self._key)
        rgb = self.trace(origins, dirs, k, max_bounces=max_bounces,
                         fb_prob=1.0 if self.loaded else 0.0)
        rgb.block_until_ready()
        dt = time.time() - t0
        rays = width * height
        self.stats["total_rays"] += rays
        self.stats["render_time"] += dt
        self.stats["rays_per_second"] = rays / dt if dt > 0 else 0
        return np.asarray(rgb).reshape(height, width, 3) / 255.0
