"""Behavior-analytics tests."""
import numpy as np
import pytest

from raytracer_tpu.agents.analytics import (analyze_agent_behavior,
                                            advanced_analysis_png,
                                            canonical_pixel_policy_probe,
                                            collect_3d_paths, plot_3d_paths)
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_v1


@pytest.fixture(scope="module")
def env():
    scene, gl, pl = training_scene_v1()
    return RayTracerEnv(scene, image_width=64, image_height=64, fov=90,
                        max_bounces=4, global_lights=gl, point_lights=pl,
                        variant="rl")


def test_behavior_analysis(env):
    b = analyze_agent_behavior(env, None, episodes=64)
    assert b["episodes"] == 64
    assert sum(b["termination_reasons"].values()) == 64
    assert sum(b["hit_frequency_by_id"].values()) == 64
    assert 0 <= b["first_hit_rate"] <= 1


def test_policy_probe(env):
    probe = canonical_pixel_policy_probe(
        env, lambda o: np.tile(np.array([[0.4, 1.0]], np.float32),
                               (o.shape[0], 1)))
    assert len(probe) == 5
    for v in probe.values():
        assert v["theta"] == pytest.approx(0.4)


def test_3d_paths_and_plots(env, tmp_path):
    paths = collect_3d_paths(env, None, episodes=8)
    assert all(p.ndim == 2 and p.shape[1] == 3 for p in paths)
    plot_3d_paths(paths, env.scene, tmp_path / "paths.png")
    assert (tmp_path / "paths.png").exists()
    b = analyze_agent_behavior(env, None, episodes=32)
    advanced_analysis_png(b, np.random.default_rng(0).normal(size=100),
                          tmp_path / "analysis.png")
    assert (tmp_path / "analysis.png").exists()
