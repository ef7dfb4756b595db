"""Whole-trace Pallas kernel equality vs the XLA wavefront tracer.

Runs in interpreter mode on the CPU test backend; the compiled kernel was
additionally verified on a real TPU v5e (hit/idx exact match on the
800x600 chandelier frame — core/pallas_whitted.py docstring).
"""
import numpy as np
import pytest

from raytracer_tpu.core.pallas_whitted import HAVE_PALLAS, trace_whitted_pallas
from raytracer_tpu.render.camera import grid_rays, perspective_rays
from raytracer_tpu.render.renderer import material_flags
from raytracer_tpu.scene import library
from raytracer_tpu.trace.whitted import trace_whitted


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("name,fn", [
    ("true_original", library.true_original_scene),
    ("planets2", library.planets2_scene),
    ("marbles4", library.marbles4_scene),
    ("chandelier", library.chandelier_scene),
])
def test_pallas_whole_trace_matches_xla(name, fn):
    out = fn()
    scene, pr = out[0], out[-1]
    if "ray_count" in pr:
        o, d, h, w = grid_rays(12, pr["ray_step"] * pr["ray_count"] / 12.0,
                               1, origin=pr["camera_position"])
    else:
        o, d = perspective_rays(48, 32, fov=60,
                                origin=pr["camera_position"], variant="fb")
    eg, em = material_flags(scene)
    mb = pr.get("max_bounces", 5)
    a = trace_whitted(scene, o, d, max_bounces=mb, enable_glass=eg,
                      enable_mirror=em)
    b = trace_whitted_pallas(scene, o, d, max_bounces=mb, enable_glass=eg,
                             enable_mirror=em, interpret=True)
    hit = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), hit, err_msg=name)
    for f in ("idx", "bounces", "through"):
        np.testing.assert_array_equal(np.asarray(getattr(b, f))[hit],
                                      np.asarray(getattr(a, f))[hit],
                                      err_msg=f"{name}.{f}")
    for f in ("t", "point", "normal"):
        av = np.asarray(getattr(a, f))[hit].astype(np.float32)
        bv = np.asarray(getattr(b, f))[hit]
        np.testing.assert_allclose(bv, av, rtol=2e-4, atol=2e-4,
                                   err_msg=f"{name}.{f}")


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_render_whitted_pallas_impl_matches_fused():
    """render_whitted(impl="pallas") routes through the whole-trace kernel
    and matches the fused image."""
    from raytracer_tpu.render.renderer import render_whitted

    scene, gl, pl_, pr = library.true_original_scene()
    o, d, h, w = grid_rays(20, pr["ray_step"] * pr["ray_count"] / 20.0, 1,
                           origin=pr["camera_position"])
    a = render_whitted(scene, gl, pl_, o, d, h, w,
                       max_bounces=pr["max_bounces"],
                       background=pr["background"], impl="fused")
    b = render_whitted(scene, gl, pl_, o, d, h, w,
                       max_bounces=pr["max_bounces"],
                       background=pr["background"], impl="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=2e-3)
