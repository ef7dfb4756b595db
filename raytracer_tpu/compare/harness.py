"""FB-vs-traditional comparison harness.

Rebuild of the main() flows of FB/fb_vs_traditional_chandelier.py:785-931
and FB/fb_vs_traditional_complex.py:648-796: render traditional and
FB-guided with identical camera/config, write ``comparison.png`` (side by
side + 3×-amplified difference heat map) and ``statistics.json`` with the
reference's exact schema (traditional/fb stats dicts + comparison block
with speedup / ray_efficiency / small_light_improvement) into a timestamped
directory.
"""
from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..fb.inference import TrainedFBAgent, small_light_indices
from ..render.path_renderer import render_path
from ..scene.types import Scene


def _stats_dict(stats, render_time: float) -> dict:
    d = {
        "total_rays": int(stats.total_rays),
        "total_intersections": int(stats.total_intersections),
        "light_hits": int(stats.light_hits),
        "small_light_hits": int(stats.small_light_hits),
        "render_time": render_time,
        "rays_per_second": (int(stats.total_rays) / render_time
                            if render_time > 0 else 0),
    }
    return d


def _is_distilled(model_path) -> bool:
    """A distilled deployment policy (fb.distill.DistilledGuide.save) is a
    flat npz with a ``__hidden__`` header; full FB checkpoints carry
    ``__meta__`` instead (utils/checkpoint.save_fb)."""
    p = str(model_path)
    if not p.endswith(".npz"):
        return False
    try:
        with np.load(p) as z:
            return "__hidden__" in z.files
    except Exception:
        return False


def run_comparison(scene: Scene, *, camera_position, width: int = 200,
                   height: int = 100, samples_per_pixel: int = 8,
                   max_bounces: int = 8, model_path: Optional[str] = None,
                   traditional_mirror_threshold: float = 0.0,
                   fb_mirror_threshold: float = 0.9,
                   out_dir: Optional[str] = None, scene_name: str = "scene",
                   seed: int = 0, save_png: bool = True,
                   warmup: bool = True, impl: str = "stepwise",
                   traditional_impl: Optional[str] = None,
                   fb_impl: Optional[str] = None,
                   timing_iters: int = 1,
                   fb_samples_per_pixel: Optional[int] = None,
                   spp_chunk: Optional[int] = None) -> dict:
    """Run the two renders and write artifacts.  Returns the stats dict.

    ``traditional_mirror_threshold`` defaults to the chandelier script's
    ``reflective > 0`` rule; pass 0.9 for the complex script's variant.

    ``model_path`` may be a full FB checkpoint (``.npz``/``.pth`` →
    TrainedFBAgent) or a distilled deployment policy
    (``*_distilled.npz`` → fb.distill.DistilledGuide — the near-zero-cost
    guide).  ``warmup=True`` pre-runs both renders once so the recorded
    wall-clock is the steady-state frame time, not shape compilation (the
    honest TPU number: compiles are one-time per shape and persistently
    cached; the reference's CPU timings had no compile either).

    ``timing_iters > 1`` records best-of-N wall-clock for each side (the
    tunneled TPU shows up to 3x run-to-run relay variance; the minimum is
    the honest hardware number — same policy as bench.py).

    ``fb_samples_per_pixel`` (default: same as traditional) enables the
    *matched-signal* mode: because the guided sampler finds light paths at
    a higher rate per ray, it can spend fewer samples per pixel and still
    record at least the traditional renderer's light-hit signal — turning
    the hit-rate advantage into a wall-clock advantage at equal-or-better
    signal.  The statistics.json schema is unchanged; both spp values are
    recorded in the per-renderer dicts.

    ``spp_chunk``: accumulate each side's samples in bounded-memory chunks
    inside one compiled program (render_path's high-spp mode; requires
    ``impl="fused"`` and chunk | spp) — quality comparisons at 64+ spp
    whose full wavefront would not fit in HBM.
    """
    fb_spp_val = (samples_per_pixel if fb_samples_per_pixel is None
                  else fb_samples_per_pixel)
    if spp_chunk is not None:
        # Validate BOTH sides up front — render_path's own check would
        # only fire on the fb side after the (expensive) traditional
        # render already completed.
        for label, v in (("samples_per_pixel", samples_per_pixel),
                         ("fb_samples_per_pixel", fb_spp_val)):
            if v > spp_chunk and v % spp_chunk:
                raise ValueError(
                    f"{label}={v} not divisible by spp_chunk={spp_chunk}")

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = Path(out_dir or f"./{scene_name}_comparison_{timestamp}")
    out.mkdir(parents=True, exist_ok=True)

    idx = small_light_indices(scene)
    if model_path is not None and _is_distilled(model_path):
        from ..fb.distill import DistilledGuide
        guide = DistilledGuide.load(str(model_path)).as_guide_fn()
        fb_prob = 1.0
    else:
        agent = TrainedFBAgent(model_path, scene, idx, camera_position)
        guide = agent.as_guide_fn() if agent.loaded else None
        fb_prob = 1.0 if agent.loaded else 0.0

    fb_spp = fb_spp_val
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)

    # Per-side implementation choice (VERDICT r4 item 1: a published
    # speedup must put BOTH sides on their best implementation; a shared
    # suboptimal impl — e.g. stepwise/stepwise — measures dispatch
    # overhead, not the methods).  ``impl`` remains the shared default.
    t_impl = traditional_impl or impl
    f_impl = fb_impl or impl

    def run_trad(k):
        return render_path(
            scene, k, width=width, height=height, spp=samples_per_pixel,
            max_bounces=max_bounces, camera_position=camera_position,
            mirror_threshold=traditional_mirror_threshold, impl=t_impl,
            spp_chunk=spp_chunk)

    def run_fb(k):
        # Falls back to traditional sampling with fb_prob=0 when no model,
        # matching WorkingFBRenderer's fallback.
        return render_path(
            scene, k, width=width, height=height, spp=fb_spp,
            max_bounces=max_bounces, camera_position=camera_position,
            mirror_threshold=fb_mirror_threshold, guide_fn=guide,
            fb_prob=fb_prob, impl=f_impl, spp_chunk=spp_chunk)

    if warmup:
        jax.block_until_ready(run_trad(k1)[0])
        jax.block_until_ready(run_fb(k2)[0])

    def timed(run, k):
        best, img, stats = float("inf"), None, None
        for _ in range(max(1, timing_iters)):
            t0 = time.time()
            img, stats = run(k)
            jax.block_until_ready(img)
            best = min(best, time.time() - t0)
        return img, stats, best

    trad_img, trad_stats, trad_time = timed(run_trad, k1)
    fb_img, fb_stats, fb_time = timed(run_fb, k2)

    trad_np = np.asarray(trad_img)
    fb_np = np.asarray(fb_img)
    td = _stats_dict(trad_stats, trad_time)
    td["samples_per_pixel"] = samples_per_pixel
    fd = _stats_dict(fb_stats, fb_time)
    fd["samples_per_pixel"] = fb_spp
    # fb_success is the honest counter (guided bounces whose subpath
    # terminated on a light — PathStats.fb_success), NOT the reference's
    # trivial fb_success == fb_used (complex.py:548); the success RATE the
    # reference prints (complex.py:746-748) ships in the json too.
    fd["fb_used"] = int(fb_stats.fb_used)
    fd["fb_success"] = int(fb_stats.fb_success)
    fd["fb_success_rate"] = (fd["fb_success"] / fd["fb_used"]
                             if fd["fb_used"] else 0.0)

    stats = {
        "traditional": td,
        "fb": fd,
        "implementations": {"traditional": t_impl, "fb": f_impl,
                            "timing_iters": max(1, timing_iters)},
        "comparison": {
            "speedup": trad_time / fb_time if fb_time > 0 else 0,
            "ray_efficiency": (fd["total_rays"] / td["total_rays"]
                               if td["total_rays"] else 0),
            "small_light_improvement": (
                fd["small_light_hits"] / td["small_light_hits"]
                if td["small_light_hits"] else 0),
        },
    }
    with open(out / "statistics.json", "w") as f:
        json.dump(stats, f, indent=2)

    if save_png:
        _save_comparison_png(out / "comparison.png", trad_np, fb_np,
                             td, fd)
    return stats


def _save_comparison_png(path, trad_img, fb_img, td, fd):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 5))
    ax1.imshow(np.clip(trad_img, 0, 1))
    ax1.set_title(f"Traditional\n{td['render_time']:.1f}s, "
                  f"{td['total_rays']:,} rays")
    ax1.axis("off")
    ax2.imshow(np.clip(fb_img, 0, 1))
    ax2.set_title(f"FB-Accelerated\n{fd['render_time']:.1f}s, "
                  f"{fd['total_rays']:,} rays")
    ax2.axis("off")
    diff = np.abs(fb_img - trad_img)
    ax3.imshow(np.clip(diff * 3, 0, 1), cmap="hot")
    ax3.set_title("Difference (Enhanced 3x)")
    ax3.axis("off")
    plt.tight_layout()
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def chandelier_comparison(model_path=None, **kw):
    from ..scene.library import chandelier_scene
    scene, _, _, p = chandelier_scene()
    kw.setdefault("camera_position", p["camera_position"])
    kw.setdefault("traditional_mirror_threshold", 0.0)   # `reflective > 0`
    return run_comparison(scene, model_path=model_path,
                          scene_name="chandelier", **kw)


def complex_comparison(model_path=None, **kw):
    from ..scene.complex import create_complex_scene, create_camera_for_scene
    scene, _, _ = create_complex_scene()
    kw.setdefault("camera_position", create_camera_for_scene())
    kw.setdefault("traditional_mirror_threshold", 0.9)   # `reflective > 0.9`
    return run_comparison(scene, model_path=model_path,
                          scene_name="complex", **kw)
