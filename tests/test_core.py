"""Unit tests for the math core: reflect/refract/intersect against
analytically known values and against the scalar oracle.

These replace the reference's notebook REPL probes (RL/Marbles 1.ipynb
cells 2-10) with real assertions.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from raytracer_tpu.core import vec
from raytracer_tpu.core.intersect import NO_SUPPRESS, nearest_hit, sphere_ts
from raytracer_tpu.scene.types import SceneBuilder, scene_astype


def test_reflect_known():
    # 45° incidence on a floor: (1,-1,0) reflects to (1,1,0)/sqrt(2).
    v = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    r = vec.reflect(v, n)
    np.testing.assert_allclose(np.asarray(r),
                               [1 / math.sqrt(2), 1 / math.sqrt(2), 0.0],
                               atol=1e-12)


def test_reflect_normal_sign_symmetric():
    v = jnp.array([0.3, -0.7, 0.2])
    n = jnp.array([0.1, 0.9, -0.2])
    r1 = vec.reflect(v, n)
    r2 = vec.reflect(v, -n)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12)


def test_refract_snell():
    # Normal incidence: direction unchanged.
    v = jnp.array([0.0, 0.0, -1.0])
    n = jnp.array([0.0, 0.0, 1.0])
    out, tir = vec.refract(v, n, 1.0, 1.5)
    assert not bool(tir)
    np.testing.assert_allclose(np.asarray(out), [0, 0, -1], atol=1e-12)

    # 45° into n=1.5: sin(theta_t) = sin(45°)/1.5 (Marbles 1 cell 10 probe).
    v = vec.normalise(jnp.array([1.0, 0.0, -1.0]))
    out, tir = vec.refract(v, n, 1.0, 1.5)
    assert not bool(tir)
    sin_t = float(out[0])
    np.testing.assert_allclose(sin_t, math.sin(math.radians(45)) / 1.5,
                               atol=1e-12)


def test_refract_tir():
    # Glass→air beyond the critical angle (41.8° for n=1.5): TIR.
    n = jnp.array([0.0, 0.0, 1.0])
    v = vec.normalise(jnp.array([1.0, 0.0, -0.5]))   # ~63° from normal
    _, tir = vec.refract(v, n, 1.5, 1.0)
    assert bool(tir)


def test_refract_matches_oracle(rng):
    for _ in range(50):
        v = tuple(rng.normal(size=3))
        n = tuple(rng.normal(size=3))
        na, nb = float(rng.uniform(1, 2)), float(rng.uniform(1, 2))
        o = oracle.v_refract(v, n, na, nb)
        out, tir = vec.refract(jnp.asarray(v, jnp.float64),
                               jnp.asarray(n, jnp.float64), na, nb)
        if o is None:
            assert bool(tir)
        else:
            assert not bool(tir)
            np.testing.assert_allclose(np.asarray(out), o, atol=1e-12)


def _one_sphere_scene(centre, radius):
    b = SceneBuilder()
    b.add_sphere(centre, radius, id=1)
    scene, _, _ = b.build()
    return scene


def test_intersect_head_on():
    scene = _one_sphere_scene((0, 0, -5), 1.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = nearest_hit(o, d, scene, jnp.full((1,), NO_SUPPRESS))
    assert bool(h.found[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.point[0]), [0, 0, -4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)


def test_intersect_behind_origin_rejected():
    # Sphere behind the camera: tca < 0 → miss (RL/ray.py:81).
    scene = _one_sphere_scene((0, 0, 5), 1.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = nearest_hit(o, d, scene, jnp.full((1,), NO_SUPPRESS))
    assert not bool(h.found[0])


def test_intersect_inside_sphere_quirk():
    # Origin inside the sphere with tca >= 0: the reference KEEPS the near
    # root even though it is negative (behind the origin).
    scene = _one_sphere_scene((0, 0, -0.5), 2.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = nearest_hit(o, d, scene, jnp.full((1,), NO_SUPPRESS))
    assert bool(h.found[0])
    assert float(h.t[0]) == pytest.approx(-1.5, abs=1e-6)


def test_grazing_hit_counts():
    # d == r exactly: the reference uses strict d > r for the miss test.
    scene = _one_sphere_scene((0, 1.0, -5), 1.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = nearest_hit(o, d, scene, jnp.full((1,), NO_SUPPRESS))
    assert bool(h.found[0])


def test_second_root():
    scene = _one_sphere_scene((0, 0, -5), 1.0)
    o = jnp.array([0.0, 0.0, -4.0])       # on the surface
    d = jnp.array([0.0, 0.0, -1.0])
    t, valid = sphere_ts(o, d, scene.centre[0], scene.radius[0], point=1)
    assert bool(valid)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-6)


def test_nearest_hit_matches_oracle(rng):
    spheres = [oracle.OSphere(centre=tuple(rng.uniform(-3, 3, 3)),
                              radius=float(rng.uniform(0.2, 1.5)), id=i)
               for i in range(8)]
    b = SceneBuilder()
    for s in spheres:
        b.add_sphere(s.centre, s.radius, id=s.id)
    scene, _, _ = b.build(dtype=jnp.float64)

    os_ = rng.uniform(-5, 5, (64, 3))
    ds = rng.normal(size=(64, 3))
    ds /= np.linalg.norm(ds, axis=-1, keepdims=True)
    h = nearest_hit(jnp.asarray(os_), jnp.asarray(ds), scene,
                    jnp.full((64,), NO_SUPPRESS))
    for k in range(64):
        best = None
        for i, s in enumerate(spheres):
            oh = oracle.sphere_intersect(tuple(os_[k]), tuple(ds[k]), s)
            if oh is not None and (best is None or oh.t < best.t):
                oh.idx = i
                best = oh
        assert bool(h.found[k]) == (best is not None), k
        if best is not None:
            assert int(h.idx[k]) == best.idx
            np.testing.assert_allclose(float(h.t[k]), best.t, atol=1e-9)


def test_suppress_id():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, id=7)
    b.add_sphere((0, 0, -10), 1.0, id=3)
    scene, _, _ = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = nearest_hit(o, d, scene, jnp.asarray([7], jnp.int32))
    assert bool(h.found[0]) and int(h.idx[0]) == 1


def test_rotate_euler_identity():
    v = jnp.array([1.0, 2.0, 3.0])
    r = vec.rotate_euler(v, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(r), [1, 2, 3], atol=1e-12)


def test_angle_between():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    assert float(vec.angle_between(a, b)) == pytest.approx(math.pi / 2)
