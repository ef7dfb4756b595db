"""CustomSceneExperiment — the 4-way unified comparison harness
(rebuild of RL/output5.py:265-1945).

Methods, all rendered with the SAME 601×601 grid camera ("unified camera",
:1251-1277):

* ``true_original`` — the exact notebook Whitted render (:416-533)
* ``traditional``   — the enhanced iterative path tracer (:609-828)
* ``rl``            — sun-biased guided sampling (:830-918)
* ``fb``            — the heuristic-FB strategy mix (:979-1165)

Outputs into a timestamped directory: ``true_original.png``, a 2×2
``unified_comparison.png`` grid, per-method performance trials, and
``custom_scene_results.json`` + a UTF-8 text summary (:1863-1945).
"""
from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..render.camera import grid_rays
from ..render.renderer import render_whitted
from ..scene import library
from ..trace.output5_style import trace_output5

CONFIG_MODES = {
    # RL/output5.py:288-323 — fast/balanced/quality presets.
    "fast_mode": dict(multiple=1, max_bounces=3, trials=10),
    "balanced_mode": dict(multiple=2, max_bounces=5, trials=25),
    "quality_mode": dict(multiple=3, max_bounces=5, trials=50),
}


class CustomSceneExperiment:
    def __init__(self, output_dir: str = "./custom_scene_results",
                 mode: str = "balanced_mode", seed: int = 0):
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.output_dir = Path(output_dir) / f"experiment_{stamp}"
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.config = dict(CONFIG_MODES[mode], mode=mode)
        self.seed = seed
        self.results: Dict = {}

    # -- cameras -----------------------------------------------------------
    def _grid(self, dtype=None):
        return grid_rays(100, 0.01, self.config["multiple"],
                         origin=(0, 0, 1))

    # -- renders -----------------------------------------------------------
    def render_true_original(self):
        scene, gl, pl, p = library.true_original_scene()
        origins, dirs, h, w = self._grid()
        t0 = time.time()
        img = render_whitted(scene, gl, pl, origins, dirs, h, w,
                             max_bounces=5, background=p["background"],
                             mode="unit")
        jax.block_until_ready(img)
        return np.asarray(img), time.time() - t0

    def render_method(self, method: str):
        scene, gl, pl, p = library.custom_scene()
        origins, dirs, h, w = self._grid()
        key = jax.random.key(self.seed + hash(method) % 1000)
        t0 = time.time()
        rgb, stats = trace_output5(scene, origins, dirs, key,
                                   max_bounces=self.config["max_bounces"],
                                   method=method)
        jax.block_until_ready(rgb)
        dt = time.time() - t0
        img = np.minimum(1.0, np.asarray(rgb).reshape(h, w, 3) / 255.0)
        return img, dt, {k: float(v) for k, v in stats.items()}

    def render_custom_scene(self, method: str, *, width: int = 200,
                            height: int = 200, spp: int = 4, seed: int = 0):
        """The spp-jittered variant (RL/output5.py:1420-1525): linspace
        camera scaled from the 601-wide original, per-sample jitter of one
        grid cell, integer-averaged samples, min(1, c/255) output."""
        import jax.numpy as jnp
        scale_factor = min(width, height) / 601
        ray_count = int(100 * scale_factor)
        ray_step = 0.01
        xs = np.linspace(-ray_count * ray_step, ray_count * ray_step, width)
        ys = np.linspace(ray_count * ray_step, -ray_count * ray_step, height)
        dx = xs[1] - xs[0] if width > 1 else 0.0
        dy = ys[0] - ys[1] if height > 1 else 0.0
        X, Y = np.meshgrid(xs, ys)
        scene, gl, pl, p = library.custom_scene()
        key = jax.random.key(seed)
        total = np.zeros((height * width, 3), np.float64)
        for s_i in range(spp):
            key, kj, kt = jax.random.split(key, 3)
            if spp > 1:
                jit = jax.random.uniform(kj, (height, width, 2)) - 0.5
                Xj = X + np.asarray(jit[..., 0]) * dx
                Yj = Y + np.asarray(jit[..., 1]) * dy
            else:
                Xj, Yj = X, Y
            dirs = jnp.asarray(np.stack([Xj, Yj, -np.ones_like(Xj)], -1)
                               .reshape(-1, 3), jnp.float32)
            origins = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0],
                                                   jnp.float32), dirs.shape)
            rgb, _ = trace_output5(scene, origins, dirs, kt,
                                   max_bounces=self.config["max_bounces"],
                                   method=method)
            total += np.asarray(rgb, np.float64)
        avg = np.trunc(total / spp)
        img = np.minimum(1.0, avg / 255.0).reshape(height, width, 3)
        return img

    def render_unified_comparison(self, save: bool = True):
        """All four methods over the identical camera grid (:1251-1418)."""
        images = {}
        times = {}
        stats = {}
        img, dt = self.render_true_original()
        images["true_original"], times["true_original"] = img, dt
        for method in ("traditional", "fb", "rl"):
            img, dt, st = self.render_method(method)
            images[method], times[method], stats[method] = img, dt, st
        if save:
            self._save_grid(images, times)
        self.results["render_times"] = times
        self.results["method_stats"] = stats
        return images, times, stats

    def _save_grid(self, images, times):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 2, figsize=(12, 12))
        order = ["true_original", "traditional", "fb", "rl"]
        for ax, name in zip(axes.ravel(), order):
            ax.imshow(np.clip(images[name], 0, 1))
            ax.set_title(f"{name}\n{times[name]:.2f}s")
            ax.axis("off")
        plt.tight_layout()
        plt.savefig(self.output_dir / "unified_comparison.png", dpi=100,
                    bbox_inches="tight")
        plt.close(fig)

    # -- performance trials (:353-414, 1578-1622) -------------------------
    def run_performance_trials(self, num_trials: Optional[int] = None):
        num_trials = num_trials or self.config["trials"]
        scene, gl, pl, p = library.custom_scene()
        results = {}
        for method in ("traditional", "fb", "rl"):
            key = jax.random.key(self.seed)
            rewards = []
            hits = []
            for t in range(num_trials):
                key, k1, k2 = jax.random.split(key, 3)
                # One random camera-ray bundle per trial.
                origins, dirs, h, w = grid_rays(8, 0.05, 1, origin=(0, 0, 1))
                rgb, st = trace_output5(scene, origins, dirs, k2,
                                        max_bounces=self.config["max_bounces"],
                                        method=method)
                rays = origins.shape[0]
                rewards.append(float(st["reward"]) / rays)
                hits.append(float(st["light_hits"]) / rays)
            results[method] = {
                "avg_reward": float(np.mean(rewards)),
                "avg_light_hits": float(np.mean(hits)),
                "trials": num_trials,
            }
        self.results["trials"] = results
        return results

    # -- persistence (:1863-1945) -----------------------------------------
    def save_custom_results(self):
        out = self.output_dir / "custom_scene_results.json"
        with open(out, "w") as f:
            json.dump({"config": self.config, "results": self.results},
                      f, indent=2)
        txt = self.output_dir / "custom_scene_summary.txt"
        with open(txt, "w", encoding="utf-8") as f:
            f.write("CUSTOM SCENE EXPERIMENT\n=======================\n\n")
            f.write(f"Mode: {self.config['mode']}\n\n")
            for section, data in self.results.items():
                f.write(f"[{section}]\n")
                f.write(json.dumps(data, indent=1))
                f.write("\n\n")
        return out

    def create_custom_scene_visualization(self, images=None):
        """Analysis figure (RL/output5.py:1688-1861): 3-D scene layout,
        method renders, per-method trial metrics."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        scene, gl, pl, p = library.custom_scene()
        fig = plt.figure(figsize=(16, 10))
        ax = fig.add_subplot(2, 3, 1, projection="3d")
        c = np.asarray(scene.centre); r = np.asarray(scene.radius)
        col = np.clip(np.asarray(scene.colour) / 255.0, 0, 1)
        emis = np.asarray(scene.emitive) > 0
        keep = r < 20
        ax.scatter(c[keep, 0], c[keep, 2], c[keep, 1],
                   s=np.clip(r[keep] * 400, 20, 600), c=col[keep],
                   edgecolors=np.where(emis[keep], "gold", "none"))
        ax.set_title("scene layout")
        slot = 2
        for name, img in (images or {}).items():
            if slot > 4:
                break
            a2 = fig.add_subplot(2, 3, slot)
            a2.imshow(np.clip(img, 0, 1)); a2.set_title(name); a2.axis("off")
            slot += 1
        trials = self.results.get("trials", {})
        if trials:
            a5 = fig.add_subplot(2, 3, 5)
            names = list(trials)
            a5.bar(names, [trials[n]["avg_reward"] for n in names])
            a5.set_title("avg reward / ray")
            a6 = fig.add_subplot(2, 3, 6)
            a6.bar(names, [trials[n]["avg_light_hits"] for n in names])
            a6.set_title("avg light hits / ray")
        plt.tight_layout()
        out = self.output_dir / "custom_scene_analysis.png"
        plt.savefig(out, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out

    def run_custom_scene_experiment(self):
        """End-to-end flow (:1527-1622)."""
        images, _, _ = self.render_unified_comparison()
        self.run_performance_trials()
        self.create_custom_scene_visualization(images)
        return self.save_custom_results()
