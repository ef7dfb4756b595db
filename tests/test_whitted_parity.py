"""Golden-image parity: the JAX wavefront Whitted renderer vs the scalar
oracle on down-scaled versions of the reference's canonical frames.

This is the rebuild's version of the reference's golden-image comparison
pipelines (SURVEY.md §4 mechanism 4), with the oracle standing in for the
CPU reference renderer.  Scenes cover every core algorithm: reflection
chains + fallback (planets2 mirror), refraction + TIR walk (marbles4 glass
n=2), shadow rays + point/global lights (true original).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from raytracer_tpu.render.camera import grid_rays
from raytracer_tpu.render.renderer import render_whitted
from raytracer_tpu.scene import library


def _to_oracle(scene, glights, plights):
    spheres = [
        oracle.OSphere(centre=tuple(np.asarray(scene.centre[i], np.float64)),
                       radius=float(scene.radius[i]),
                       colour=tuple(np.asarray(scene.colour[i], np.float64)),
                       reflective=float(scene.reflective[i]),
                       transparent=float(scene.transparent[i]),
                       emitive=float(scene.emitive[i]),
                       ior=float(scene.ior[i]),
                       id=int(scene.id[i]))
        for i in range(scene.num_spheres)
    ]
    gl = [oracle.OGlobalLight(vector=tuple(np.asarray(glights.vector[i], np.float64)),
                              colour=tuple(np.asarray(glights.colour[i], np.float64)),
                              strength=float(glights.strength[i]),
                              max_angle=float(glights.max_angle[i]))
          for i in range(glights.count)]
    pl = [oracle.OPointLight(id=int(plights.id[i]),
                             position=tuple(np.asarray(plights.position[i], np.float64)),
                             colour=tuple(np.asarray(plights.colour[i], np.float64)),
                             strength=float(plights.strength[i]),
                             max_angle=float(plights.max_angle[i]),
                             func=int(plights.func[i]))
          for i in range(plights.count)]
    return spheres, gl, pl


def _compare(scene_fn, ray_count, ray_step, mse_tol=1e-9, frac_tol=0.999):
    scene, gl, pl, params = scene_fn()
    # Rebuild in float64 for bit-level comparison with the oracle.
    import raytracer_tpu.scene.types as st
    scene = st.scene_astype(scene, jnp.float64)
    gl64 = st.GlobalLights(*(x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x
                             for x in (gl.vector, gl.colour, gl.strength, gl.max_angle)))
    pl64 = st.PointLights(pl.id, pl.position.astype(jnp.float64),
                          pl.colour.astype(jnp.float64),
                          pl.strength.astype(jnp.float64),
                          pl.max_angle.astype(jnp.float64), pl.func)

    origins, dirs, h, w = grid_rays(ray_count, ray_step, 1,
                                    origin=params["camera_position"],
                                    dtype=jnp.float64)
    background = params["background"]
    miss = params.get("sky_colour", background)
    img = render_whitted(scene, gl64, pl64, origins, dirs, h, w,
                         max_bounces=params["max_bounces"],
                         background=background, miss_colour=miss,
                         mode="unit")
    img = np.asarray(img)

    spheres, ogl, opl = _to_oracle(scene, gl, pl)
    n = ray_count
    step = ray_step
    xs = [r * step for r in range(-n, 0)] + [r * step for r in range(0, n + 1)]
    ys = [r * step for r in range(n, 0, -1)] + [-r * step for r in range(0, n + 1)]
    ref = np.asarray(oracle.render(spheres, ogl, opl,
                                   tuple(map(float, params["camera_position"])),
                                   xs, ys, params["max_bounces"],
                                   tuple(map(float, background)),
                                   tuple(map(float, miss)), mode="unit"))

    diff = np.abs(img - ref)
    mse = float(np.mean(diff ** 2))
    exact = float(np.mean(diff < 1e-12))
    assert mse < mse_tol, f"pixel MSE {mse} (exact fraction {exact})"
    assert exact > frac_tol, f"exact-pixel fraction {exact}"


def test_true_original_parity():
    # 61x61 slice of the 601x601 "true original" frame: same field of view,
    # coarser grid (ray_count*ray_step == 1 as in the reference).
    _compare(library.true_original_scene, 30, 1.0 / 30.0)


def test_planets2_parity():
    # Mirror + marble + three point lights, max_bounces=10.
    _compare(library.planets2_scene, 30, 5.0 / 300.0)


def test_marbles4_parity():
    # Glass n=2 (TIR-heavy), sky-colour misses, max_bounces=8.
    _compare(library.marbles4_scene, 30, 0.2 / 30.0)


def test_compact_matches_fused():
    """trace_whitted_compact matches the fused tracer on every library
    scene: discrete fields (hit/idx/bounces/through) exactly, float fields
    to XLA codegen rounding (the per-lane op ORDER is identical, but XLA
    may contract/reassociate differently across wavefront shapes, ~1e-5
    relative on t)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raytracer_tpu.render.camera import grid_rays, perspective_rays
    from raytracer_tpu.render.renderer import material_flags
    from raytracer_tpu.scene import library
    from raytracer_tpu.trace.whitted import (trace_whitted,
                                             trace_whitted_compact)

    for name, fn in (("true_original", library.true_original_scene),
                     ("planets2", library.planets2_scene),
                     ("marbles4", library.marbles4_scene),
                     ("chandelier", library.chandelier_scene)):
        out = fn()
        scene, pr = out[0], out[-1]
        if "ray_count" in pr:
            o, d, h, w = grid_rays(pr["ray_count"], pr["ray_step"], 1,
                                   origin=pr["camera_position"])
        else:
            o, d = perspective_rays(64, 48, fov=60,
                                    origin=pr["camera_position"],
                                    variant="fb")
        eg, em = material_flags(scene)
        mb = pr.get("max_bounces", 5)
        a = trace_whitted(scene, o, d, max_bounces=mb, enable_glass=eg,
                          enable_mirror=em)
        b = trace_whitted_compact(scene, o, d, max_bounces=mb,
                                  enable_glass=eg, enable_mirror=em,
                                  min_bucket=256)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit),
                                      err_msg=name)
        hit = np.asarray(a.hit)
        for f in ("idx", "bounces", "through"):
            av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            np.testing.assert_array_equal(av[hit], bv[hit],
                                          err_msg=f"{name}.{f}")
        for f in ("t", "point", "normal"):
            av, bv = np.asarray(getattr(a, f))[hit], np.asarray(getattr(b, f))[hit]
            # Rounding compounds through deep mirror/refract chains, so a
            # tiny tail of lanes drifts further; bound both the tail size
            # and its magnitude.
            close = np.isclose(av, bv, rtol=1e-4, atol=5e-5)
            assert np.mean(close) > 0.999, f"{name}.{f}: {np.mean(close)}"
            np.testing.assert_allclose(av, bv, rtol=1e-2, atol=1e-3,
                                       err_msg=f"{name}.{f}")
