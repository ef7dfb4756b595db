"""Golden tests against frames produced by *executing* the reference
implementation (fixtures in tests/golden/, regenerable from the working
tree with ``python scripts/gen_test_goldens.py all --check``):

* ``true_original_61.npy`` — 61×61 grid of the RL/output5.py
  render_true_original scene traced with the reference's own
  ``Ray.nearestSphereIntersect`` + ``terminalRGB`` (f64).
* ``chandelier_traditional_40x20_nojitter.npy`` — 40×20 pixel-centre
  (jitter-free) frame from the reference's chandelier
  ``TraditionalRenderer.trace_ray_traditional`` (mirror threshold > 0, so
  the frame is fully deterministic).
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.scene.types as st
from raytracer_tpu.render.camera import grid_rays, perspective_rays
from raytracer_tpu.render.renderer import render_whitted
from raytracer_tpu.scene import library
from raytracer_tpu.trace.path import trace_path

GOLDEN = Path(__file__).parent / "golden"


def test_true_original_vs_reference_output():
    scene, gl, pl, p = library.true_original_scene()
    scene = st.scene_astype(scene, jnp.float64)
    gl = st.GlobalLights(*(x.astype(jnp.float64) for x in
                           (gl.vector, gl.colour, gl.strength, gl.max_angle)))
    pl = st.PointLights(pl.id, *(x.astype(jnp.float64) for x in
                                 (pl.position, pl.colour, pl.strength,
                                  pl.max_angle)), pl.func)
    origins, dirs, h, w = grid_rays(30, 1.0 / 30.0, 1,
                                    origin=p["camera_position"],
                                    dtype=jnp.float64)
    img = np.asarray(render_whitted(scene, gl, pl, origins, dirs, h, w,
                                    max_bounces=5,
                                    background=p["background"], mode="unit"))
    ref = np.load(GOLDEN / "true_original_61.npy")
    diff = np.abs(img - ref)
    # 1-ulp noise from different f64 summation orders is expected on a few
    # percent of pixels; anything visible would be > 1/255 ≈ 4e-3.
    assert diff.max() < 1e-12
    assert (diff == 0).mean() > 0.9


def test_chandelier_traditional_vs_reference_output():
    scene, _, _, p = library.chandelier_scene()
    o, d = perspective_rays(40, 20, fov=60, origin=p["camera_position"],
                            variant="fb")
    rgb, stats = trace_path(scene, o, d, jax.random.key(0), max_bounces=3,
                            mirror_threshold=0.0)
    img = np.asarray(rgb).reshape(20, 40, 3)
    ref = np.load(GOLDEN / "chandelier_traditional_40x20_nojitter.npy")
    np.testing.assert_array_equal(img, ref)
