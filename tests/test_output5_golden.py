"""Golden test for the output5 experiment tracer against the *executed*
reference ``CustomSceneExperiment._trace_enhanced_traditional`` at
max_bounces=1 (the only bounce-direction-free configuration — every lane
terminates after the deterministic first-level shading, so the fixture is
exact; fixture output5_traditional_25_mb1.npy, 25×25 grid)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.scene.types as st
from raytracer_tpu.render.camera import grid_rays
from raytracer_tpu.scene import library
from raytracer_tpu.trace.output5_style import trace_output5

GOLDEN = Path(__file__).parent / "golden"


def test_output5_traditional_matches_reference():
    scene, gl, pl, p = library.custom_scene()
    scene = st.scene_astype(scene, jnp.float64)
    o, d, h, w = grid_rays(12, 1.0 / 12, 1, origin=(0, 0, 1),
                           dtype=jnp.float64)
    rgb, _ = trace_output5(scene, o, d, jax.random.key(0), max_bounces=1,
                           method="traditional")
    img = np.asarray(rgb).reshape(h, w, 3)
    ref = np.load(GOLDEN / "output5_traditional_25_mb1.npy")
    np.testing.assert_array_equal(img, ref)
