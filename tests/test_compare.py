"""Comparison-harness tests (small configs)."""
import json

import jax
import numpy as np
import pytest

from raytracer_tpu.compare.harness import run_comparison
from raytracer_tpu.compare.heuristic_fb import EnhancedFBAgent
from raytracer_tpu.scene import library
from raytracer_tpu.trace.output5_style import trace_output5
from raytracer_tpu.render.camera import grid_rays


def test_run_comparison_schema(tmp_path):
    scene, _, _, p = library.chandelier_scene()
    stats = run_comparison(scene, camera_position=p["camera_position"],
                           width=32, height=16, samples_per_pixel=2,
                           max_bounces=3, out_dir=tmp_path / "cmp",
                           save_png=False)
    assert set(stats) == {"traditional", "fb", "comparison",
                          "implementations"}
    for side in ("traditional", "fb"):
        s = stats[side]
        assert s["total_rays"] > 0
        assert s["rays_per_second"] > 0
    assert set(stats["comparison"]) == {"speedup", "ray_efficiency",
                                        "small_light_improvement"}
    # FB without a model must fall back (fb_prob=0 → fb_used == 0),
    # matching WorkingFBRenderer's fallback sanity runs (BASELINE.md).
    assert stats["fb"]["fb_used"] == 0
    saved = json.loads((tmp_path / "cmp" / "statistics.json").read_text())
    assert saved["traditional"]["total_rays"] == stats["traditional"]["total_rays"]


def test_run_comparison_spp_chunk(tmp_path):
    # High-spp bounded-memory mode through the comparison harness: same
    # statistics surface, every camera sample covered, and ray totals
    # within path-length noise of the unchunked fused run (the chunked
    # RNG stream differs per sample, so exact equality is not expected —
    # see test_path_chunked.py).
    scene, _, _, p = library.chandelier_scene()
    kw = dict(camera_position=p["camera_position"], width=24, height=12,
              samples_per_pixel=4, max_bounces=3, save_png=False,
              impl="fused", warmup=False)
    plain = run_comparison(scene, out_dir=tmp_path / "a", **kw)
    chunked = run_comparison(scene, out_dir=tmp_path / "b", spp_chunk=2,
                             **kw)
    assert set(chunked) == {"traditional", "fb", "comparison",
                            "implementations"}
    n = 24 * 12 * 4
    ct = chunked["traditional"]["total_rays"]
    assert n <= ct <= n * 4
    assert abs(ct - plain["traditional"]["total_rays"]) < 0.2 * n
    saved = json.loads((tmp_path / "b" / "statistics.json").read_text())
    assert saved["traditional"]["total_rays"] == ct


def test_output5_tracers_all_methods():
    scene, _, _, p = library.custom_scene()
    origins, dirs, h, w = grid_rays(10, 0.05, 1, origin=(0, 0, 1))
    for method in ("traditional", "rl", "fb"):
        rgb, stats = trace_output5(scene, origins, dirs, jax.random.key(0),
                                   max_bounces=4, method=method)
        a = np.asarray(rgb)
        assert a.shape == (h * w, 3)
        assert np.isfinite(a).all()
        assert a.min() >= 0 and a.max() <= 255
        assert float(stats["steps"]) > 0
    # Traditional brightness floor: boosted pixels scale by 80/max(1, b)
    # (which does NOT guarantee mean>=80 when channels saturate — the
    # reference formula, preserved).  Check the scale was applied: no
    # non-background pixel sits in the un-boosted dim band (0, 10).
    rgb, _ = trace_output5(scene, origins, dirs, jax.random.key(1),
                           max_bounces=4, method="traditional")
    a = np.asarray(rgb)
    bgmask = np.all(a == np.array([2.0, 2.0, 5.0]), axis=-1)
    bright = a.mean(axis=-1)
    nb = bright[~bgmask]
    assert ((nb == 0) | (nb >= 10.0)).all()


def test_heuristic_fb_agent():
    agent = EnhancedFBAgent(seed=0)
    a, info = agent.choose_direction()
    assert info["strategy"] == "exploration"     # no memory yet
    assert (np.abs(a) <= 1).all()
    obs = np.zeros(21, np.float32)
    for _ in range(8):
        agent.record_light_hit(obs, np.array([0.0, 0.0, 1.0]))
    assert agent.exploration_rate < 0.3
    assert len(agent.light_memory) <= 20
    strategies = {agent.choose_direction()[1]["strategy"]
                  for _ in range(50)}
    assert "memory_guided" in strategies


def test_custom_experiment_small(tmp_path):
    from raytracer_tpu.compare.experiment import CustomSceneExperiment
    exp = CustomSceneExperiment(output_dir=tmp_path, mode="fast_mode")
    exp.config["multiple"] = 1
    # Shrink the grid for test speed by monkeypatching the camera.
    exp._grid = lambda dtype=None: grid_rays(12, 1.0 / 12, 1,
                                             origin=(0, 0, 1))
    images, times, stats = exp.render_unified_comparison(save=False)
    assert set(images) == {"true_original", "traditional", "fb", "rl"}
    for img in images.values():
        assert np.isfinite(img).all()
    out = exp.save_custom_results()
    assert out.exists()
