"""Shipped-model regression: the trained FB chandelier model must keep
beating traditional sampling on small-light hits (the framework's
learned-sampling headline; reference trained model: 1.096×, ours measured
1.63× at the full config / ~1.5× at this reduced one)."""
from pathlib import Path

import pytest

MODEL = Path(__file__).parents[1] / "models" / "fb_chandelier_trained.npz"


@pytest.mark.skipif(not MODEL.exists(), reason="shipped model missing")
def test_shipped_chandelier_model_improves_small_light_hits():
    from raytracer_tpu.compare.harness import chandelier_comparison

    stats = chandelier_comparison(model_path=str(MODEL), width=100,
                                  height=50, samples_per_pixel=4,
                                  max_bounces=8, seed=5, save_png=False,
                                  out_dir="/tmp/_trained_model_check")
    imp = stats["comparison"]["small_light_improvement"]
    assert stats["fb"]["fb_used"] > 0
    assert imp > 1.1, f"small-light improvement degraded: {imp}"
