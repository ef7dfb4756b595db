"""Whole-trace Pallas path kernel (core/pallas_path.py) equals the XLA
tracers bit for bit — images AND stats, across padding, both precision
modes, the no-diffuse chandelier configuration, and the full renderer.

Runs in interpreter mode on the CPU backend (conftest pins cpu); the TPU
compiled path shares the same kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.render.path_renderer import render_path
from raytracer_tpu.scene.types import SceneBuilder
from raytracer_tpu.scene import library
from raytracer_tpu.trace.path import trace_path

from test_path import _lean_scene


def _mirror_scene():
    """Every real sphere emissive or mirror → no_diffuse at threshold 0.0
    (the chandelier traditional configuration's static shape)."""
    b = SceneBuilder()
    b.add_sphere((0, -100.5, 0), 100.0, (180, 180, 180), reflective=0.3,
                 id=1)
    b.add_sphere((0, 1, -5), 1.0, (220, 220, 220), reflective=0.95, id=2)
    b.add_sphere((0, 5, -5), 1.2, (255, 255, 240), emitive=1.0, id=3)
    b.add_sphere((-2, 2, -4), 0.2, (255, 240, 200), emitive=1.0, id=4)
    scene, _, _ = b.build()
    return scene


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    o = jnp.asarray([0.0, 1.0, 2.0], jnp.float32) + jnp.zeros(
        (n, 3), jnp.float32)
    d = jnp.asarray(rng.randn(n, 3), jnp.float32)
    return o, d


def _assert_equal(scene, o, d, key, **kw):
    rgb_f, st_f = trace_path(scene, o, d, key, impl="fused", **kw)
    rgb_p, st_p = trace_path(scene, o, d, key, impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(rgb_p), np.asarray(rgb_f))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits"):
        assert int(getattr(st_p, f)) == int(getattr(st_f, f)), f


def test_pallas_no_diffuse_bit_exact():
    # 3601 rays: 2 tiles with 495 padded lanes — pad must not leak into
    # stats or rgb.
    o, d = _rays(3601)
    _assert_equal(_mirror_scene(), o, d, jax.random.key(3),
                  max_bounces=4, mirror_threshold=0.0)


def _assert_close(scene, o, d, key, min_equal=0.95, **kw):
    """Diffuse-path closeness: Mosaic has no acos, so the kernel samples
    cosθ = √u₀ / sinθ = √(1−u₀) directly — exact math for the same θ, but
    ulp-level numeric divergence from the XLA sin(arccos(·)) chain, which
    bounce chaos amplifies on a minority of lanes (the same documented
    class as the compiled-TPU FMA divergence).  The integer-valued images
    must agree on ≥``min_equal`` of subpixels and the hit statistics
    within 2%."""
    rgb_f, st_f = trace_path(scene, o, d, key, impl="fused", **kw)
    rgb_p, st_p = trace_path(scene, o, d, key, impl="pallas", **kw)
    f, q = np.asarray(rgb_f), np.asarray(rgb_p)
    assert np.isfinite(q).all()
    assert (f == q).mean() >= min_equal, (f == q).mean()
    for fld in ("total_rays", "total_intersections", "light_hits"):
        a, b = int(getattr(st_f, fld)), int(getattr(st_p, fld))
        assert abs(a - b) <= max(0.02 * a, 2), (fld, a, b)


def test_pallas_diffuse_close():
    o, d = _rays(3601, seed=1)
    _assert_close(_lean_scene(), o, d, jax.random.key(7),
                  max_bounces=4, mirror_threshold=0.9)


def test_pallas_fast_mode_close():
    o, d = _rays(777, seed=2)
    _assert_close(_lean_scene(), o, d, jax.random.key(11),
                  max_bounces=3, mirror_threshold=0.9, precision="fast")


def test_pallas_guided_and_traced_scene_rejected():
    scene = _lean_scene()
    o, d = _rays(8)
    try:
        trace_path(scene, o, d, jax.random.key(0), impl="pallas",
                   guide_fn=lambda obs: jnp.zeros(obs.shape[:-1] + (2,)))
        assert False, "guide_fn should be rejected"
    except ValueError as e:
        assert "guide_fn" in str(e)


def test_render_path_pallas_matches_fused():
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(0)
    kw = dict(width=40, height=25, spp=2, max_bounces=3,
              camera_position=p["camera_position"], mirror_threshold=0.0)
    img_f, st_f = render_path(scene, key, impl="fused", **kw)
    img_p, st_p = render_path(scene, key, impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_f))
    assert int(st_p.total_rays) == int(st_f.total_rays)
    assert int(st_p.small_light_hits) == int(st_f.small_light_hits)


def test_pallas_guided_one_hot_bit_exact():
    """In-kernel student MLP parity: with one-hot weight columns the
    sequential madd chain and XLA's dot produce identical floats (zero
    terms are skipped / add exactly), so the guided pallas trace must be
    bit-exact vs fused — including the fb gate draws and fb stats."""
    import numpy as np
    from raytracer_tpu.fb.distill import DistilledGuide

    k1 = np.zeros((22, 4), np.float32)
    for j, c in enumerate((0, 1, 2, 6)):     # px, py, pz, nx — var columns
        k1[c, j] = 1.0
    k2 = np.zeros((4, 2), np.float32)
    k2[0, 0] = 1.0
    k2[3, 1] = -1.0
    params = {"Dense_0": {"kernel": jnp.asarray(k1),
                          "bias": jnp.zeros((4,), jnp.float32)},
              "Dense_1": {"kernel": jnp.asarray(k2),
                          "bias": jnp.zeros((2,), jnp.float32)}}
    guide = DistilledGuide(params, hidden=(4,)).as_guide_fn(dtype=None)

    # fb_prob=1.0: every diffuse lane takes the guided direction, so the
    # cosine sampler (whose acos-free identity form is only ulp-close to
    # the XLA chain) is computed but never selected — the MLP mechanism's
    # bit-parity is tested in isolation.
    scene = _lean_scene()
    o, d = _rays(2600, seed=4)
    key = jax.random.key(5)
    kw = dict(max_bounces=4, mirror_threshold=0.9, guide_fn=guide,
              fb_prob=1.0)
    rgb_f, st_f = trace_path(scene, o, d, key, impl="fused", **kw)
    rgb_p, st_p = trace_path(scene, o, d, key, impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(rgb_p), np.asarray(rgb_f))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits", "fb_used", "fb_success"):
        assert int(getattr(st_p, f)) == int(getattr(st_f, f)), f
    assert int(st_p.fb_used) > 0


def test_pallas_guided_bf16_student_statistically_close():
    """The bf16 student path baked into the kernel: not bit-pinned (bf16
    sequential accumulation vs the flax dot), but behaviour must match
    the fused guided run statistically.  Uses a small random student —
    tracing the SHIPPED 64×64 student's ~5k unrolled ops/level takes
    minutes-per-level on this single-core CPU (measured >16 min at 2
    levels); the shipped student's in-kernel behaviour on real TPU is
    benched instead (bench.py pallas guided lane / STATUS.md)."""
    import numpy as np
    from raytracer_tpu.fb.distill import DistilledGuide

    rng = np.random.RandomState(0)
    params = {"Dense_0": {"kernel": jnp.asarray(
                              rng.randn(22, 8).astype(np.float32) * 0.4),
                          "bias": jnp.zeros((8,), jnp.float32)},
              "Dense_1": {"kernel": jnp.asarray(
                              rng.randn(8, 2).astype(np.float32) * 0.4),
                          "bias": jnp.zeros((2,), jnp.float32)}}
    guide = DistilledGuide(params, hidden=(8,)).as_guide_fn()   # bf16

    scene = _lean_scene()
    o, d = _rays(3000, seed=9)
    key = jax.random.key(2)
    kw = dict(max_bounces=3, mirror_threshold=0.9, guide_fn=guide,
              fb_prob=1.0)
    rgb_f, st_f = trace_path(scene, o, d, key, impl="fused", **kw)
    rgb_p, st_p = trace_path(scene, o, d, key, impl="pallas", **kw)
    f, q = np.asarray(rgb_f), np.asarray(rgb_p)
    assert np.isfinite(q).all()
    assert int(st_p.fb_used) > 0
    assert (f == q).mean() >= 0.9, (f == q).mean()
    hf, hp = int(st_f.light_hits), int(st_p.light_hits)
    assert hf > 0 and 0.9 <= hp / max(hf, 1) <= 1.12, (hp, hf)


def test_hybrid_level_split_bit_exact_vs_fused():
    """Level-split hybrid (pallas level kernels + XLA guide between them,
    one jit): bit-exact vs fused in interpret mode for both the guided
    (fb_prob=1, one-hot student) and unguided diffuse configs — the level
    kernel reproduces the fused level body exactly and the guide runs as
    the same XLA code fused uses.  (TPU wall: measured 390 ms at
    800×600@8spp guided — a recorded NEGATIVE vs the whole-trace guided
    kernel's 241.6 ms; kept as the equality-tested split-architecture
    reference, see trace/path.py::_trace_path_hybrid.)"""
    import numpy as np
    from raytracer_tpu.fb.distill import DistilledGuide

    scene = _lean_scene()
    o, d = _rays(2600, seed=1)
    key = jax.random.key(5)

    k1 = np.zeros((22, 4), np.float32)
    for j, c in enumerate((0, 1, 2, 6)):
        k1[c, j] = 1.0
    k2 = np.zeros((4, 2), np.float32)
    k2[0, 0] = 1.0
    k2[3, 1] = -1.0
    params = {"Dense_0": {"kernel": jnp.asarray(k1),
                          "bias": jnp.zeros((4,), jnp.float32)},
              "Dense_1": {"kernel": jnp.asarray(k2),
                          "bias": jnp.zeros((2,), jnp.float32)}}
    guide = DistilledGuide(params, hidden=(4,)).as_guide_fn(dtype=None)

    for kw in (dict(max_bounces=4, mirror_threshold=0.9, guide_fn=guide,
                    fb_prob=1.0),
               dict(max_bounces=4, mirror_threshold=0.9)):
        rf, sf = trace_path(scene, o, d, key, impl="fused", **kw)
        rh, sh = trace_path(scene, o, d, key, impl="hybrid", **kw)
        np.testing.assert_array_equal(np.asarray(rh), np.asarray(rf))
        for f in ("total_rays", "total_intersections", "light_hits",
                  "small_light_hits", "fb_used", "fb_success"):
            assert int(getattr(sh, f)) == int(getattr(sf, f)), f
