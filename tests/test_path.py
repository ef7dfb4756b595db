"""Path-tracer tests.

Deterministic sub-cases (max_bounces=1 makes the diffuse recursion hit the
bounce budget immediately; mirror chains are deterministic at any depth) are
checked against hand-computed values; the stochastic estimator is checked
statistically against the executed reference implementation elsewhere
(bench/compare harness).
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scene.types import SceneBuilder
from raytracer_tpu.trace.path import trace_path
from raytracer_tpu.render.path_renderer import render_path
from raytracer_tpu.scene import library


def _simple_scene():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (200, 100, 50), id=1)                 # diffuse
    b.add_sphere((0, 3, -5), 0.3, (255, 255, 240), emitive=1.0, id=2)   # light
    b.add_sphere((3, 0, -5), 1.0, (220, 220, 220), reflective=0.95, id=3)
    scene, _, _ = b.build()
    return scene


def test_emissive_terminal():
    scene = _simple_scene()
    o = jnp.array([[0.0, 3.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])          # straight at the light
    rgb, stats = trace_path(scene, o, d, jax.random.key(0), max_bounces=3)
    np.testing.assert_array_equal(np.asarray(rgb[0]), [255, 255, 240])
    assert int(stats.light_hits) == 1
    assert int(stats.small_light_hits) == 1    # radius 0.3 < 0.5
    assert int(stats.total_rays) == 1


def test_miss_background():
    scene = _simple_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])           # away from everything
    rgb, stats = trace_path(scene, o, d, jax.random.key(0), max_bounces=3)
    np.testing.assert_array_equal(np.asarray(rgb[0]), [2, 2, 5])
    assert int(stats.total_intersections) == 0


def test_budget_one_bounce_deterministic():
    """max_bounces=1: diffuse hit → trunc(albedo*min(255, direct+bg)/255)
    with the recursion immediately returning the background."""
    scene = _simple_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])          # hits the diffuse sphere front
    rgb, stats = trace_path(scene, o, d, jax.random.key(0), max_bounces=1)

    # Hand computation: hit point (0,0,-4), normal (0,0,1).
    # Light at (0,3,-5) r=0.3: to_light=(0,3,-1), dist=sqrt(10),
    # cos = n.to_light_norm = -1/sqrt(10) < 0 → no direct contribution.
    # Mirror sphere is not emissive → not a light source.
    # value = trunc(albedo * min(255, 0 + bg)/255)
    albedo = np.array([200.0, 100.0, 50.0])
    bg = np.array([2.0, 2.0, 5.0])
    expect = np.trunc(albedo * np.minimum(255.0, bg) / 255.0)
    np.testing.assert_array_equal(np.asarray(rgb[0]), expect)
    # total_rays: level-0 call + the budget-terminated recursive call.
    assert int(stats.total_rays) == 2


def test_direct_lighting_value():
    """A surface point facing the light: exact int() truncated contribution."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (255, 255, 255), id=1)
    b.add_sphere((0, 0, 5), 0.2, (200, 150, 100), emitive=1.0, id=2)
    scene, _, _ = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rgb, _ = trace_path(scene, o, d, jax.random.key(1), max_bounces=1)
    # Hit (0,0,-4) n=(0,0,1); to_light (0,0,9): cos=1, dist=9.
    w = 1.0 / 81.0 * 0.3
    direct = np.trunc(w * np.array([200.0, 150.0, 100.0]))
    bg = np.array([2.0, 2.0, 5.0])
    expect = np.trunc(255.0 * np.minimum(255.0, direct + bg) / 255.0)
    np.testing.assert_array_equal(np.asarray(rgb[0]), expect)


def test_mirror_chain_deterministic():
    """Mirror → light is deterministic at depth 2."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (250, 250, 250), reflective=0.95, id=1)
    b.add_sphere((0, 0, 5), 0.5, (255, 240, 230), emitive=1.0, id=2)
    scene, _, _ = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rgb, stats = trace_path(scene, o, d, jax.random.key(2), max_bounces=4)
    # Head-on mirror hit at (0,0,-4): reflect straight back, from the offset
    # origin, hitting the light at (0,0,5) → indirect = light colour.
    # Direct at the mirror point: light is behind the normal? n=(0,0,1),
    # to_light=(0,0,9-0?) → cos=1, dist≈9: w = 0.3/81.
    w = 0.3 / (8.999**2)
    direct = np.trunc(w * np.array([255.0, 240.0, 230.0]))
    indirect = np.array([255.0, 240.0, 230.0])
    expect = np.trunc(250.0 * np.minimum(255.0, direct + indirect) / 255.0)
    np.testing.assert_array_equal(np.asarray(rgb[0]), expect)
    assert int(stats.light_hits) == 1


def test_chandelier_mirror_threshold_quirk():
    """Traditional chandelier mirrors on reflective > 0 (walls at 0.1),
    complex/FB use > 0.9 — the same wall behaves differently."""
    scene, _, _, _ = library.chandelier_scene()
    o = jnp.array([[0.0, 2.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])   # straight down at the 0.95 floor
    # Floor is 0.95-reflective: mirror under both thresholds.
    key = jax.random.key(3)
    rgb_a, _ = trace_path(scene, o, d, key, max_bounces=2, mirror_threshold=0.0)
    rgb_b, _ = trace_path(scene, o, d, key, max_bounces=2, mirror_threshold=0.9)
    np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
    # A matte wall (0.1): deterministic mirror under >0, stochastic under >0.9.
    d2 = jnp.array([[0.0, 0.0, -1.0]])  # back wall, reflective 0.1
    r1, _ = trace_path(scene, o, d2, jax.random.key(4), max_bounces=2,
                       mirror_threshold=0.0)
    r2, _ = trace_path(scene, o, d2, jax.random.key(5), max_bounces=2,
                       mirror_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_render_path_runs_and_counts():
    scene, _, _, p = library.chandelier_scene()
    img, stats = render_path(scene, jax.random.key(0), width=40, height=20,
                             spp=2, max_bounces=3,
                             camera_position=p["camera_position"],
                             mirror_threshold=0.0)
    a = np.asarray(img)
    assert a.shape == (20, 40, 3)
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1
    assert int(stats.total_rays) >= 40 * 20 * 2
    assert int(stats.total_intersections) > 0


def test_guided_sampling_hook():
    """A guide that always aims straight along the normal (action (−1, 0) →
    θ=0) must be deterministic and used for every diffuse bounce."""
    scene = _simple_scene()

    def guide(obs):
        a = jnp.zeros(obs.shape[:-1] + (2,), obs.dtype)
        return a.at[..., 0].set(-1.0)

    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rgb1, st1 = trace_path(scene, o, d, jax.random.key(0), max_bounces=3,
                           guide_fn=guide, fb_prob=1.0)
    rgb2, st2 = trace_path(scene, o, d, jax.random.key(9), max_bounces=3,
                           guide_fn=guide, fb_prob=1.0)
    np.testing.assert_array_equal(np.asarray(rgb1), np.asarray(rgb2))
    assert int(st1.fb_used) >= 1


def _normal_guide(obs):
    """Guide that always bounces straight along the surface normal
    (action (-1, 0) → θ=0 in the renderer tangent frame)."""
    a = jnp.zeros(obs.shape[:-1] + (2,), obs.dtype)
    return a.at[..., 0].set(-1.0)


def test_fb_success_counts_light_terminated_subpaths():
    """fb_success = guided bounces whose lane later terminated on a light
    (PathStats.fb_success) — not the reference's trivial == fb_used.

    Geometry: camera hits the diffuse sphere, the guided bounce travels
    along the normal straight into the light → 1 used, 1 succeeded."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (200, 100, 50), id=1)                # diffuse
    b.add_sphere((0, 0, 3), 0.3, (255, 255, 240), emitive=1.0, id=2)   # light
    scene, _, _ = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for impl in ("fused", "stepwise"):
        rgb, st = trace_path(scene, o, d, jax.random.key(0), max_bounces=3,
                             guide_fn=_normal_guide, fb_prob=1.0, impl=impl)
        assert int(st.fb_used) == 1, impl
        assert int(st.fb_success) == 1, impl
        assert int(st.light_hits) == 1, impl


def test_fb_success_zero_when_guided_bounce_misses():
    """Guided bounce that escapes to the background succeeds nothing."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (200, 100, 50), id=1)                # diffuse
    b.add_sphere((0, 9, 0), 0.3, (255, 255, 240), emitive=1.0, id=2)   # light
    scene, _, _ = b.build()

    def tangent_guide(obs):
        # action (1, 0) → θ=π/2: bounce in the tangent plane (+x here),
        # away from everything.
        a = jnp.zeros(obs.shape[:-1] + (2,), obs.dtype)
        return a.at[..., 0].set(1.0)

    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for impl in ("fused", "stepwise"):
        rgb, st = trace_path(scene, o, d, jax.random.key(0), max_bounces=3,
                             guide_fn=tangent_guide, fb_prob=1.0, impl=impl)
        assert int(st.fb_used) == 1, impl
        assert int(st.fb_success) == 0, impl


def test_fb_success_credits_every_guided_bounce_on_the_lane():
    """A light reached after TWO guided bounces credits both (each bounce's
    subpath terminated on the light)."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (200, 100, 50), id=1)        # diffuse A
    b.add_sphere((0.5, 0, 3), 1.0, (90, 120, 150), id=2)       # diffuse B
    # Light on B's normal-bounce ray (see hand geometry below), off the
    # camera axis and off the A→B corridor.
    b.add_sphere((-1.0, 0, 0.4), 0.2, (255, 255, 240), emitive=1.0, id=3)
    scene, _, _ = b.build()
    # Camera → A at (0,0,-4), n=(0,0,1); guided bounce +z → B at
    # (0,0,2.134), n=(-0.5,0,-0.866); guided bounce along n → light at
    # t≈2 (centre (-1,0,0.4) sits on that ray).
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for impl in ("fused", "stepwise"):
        rgb, st = trace_path(scene, o, d, jax.random.key(0), max_bounces=4,
                             guide_fn=_normal_guide, fb_prob=1.0, impl=impl)
        assert int(st.light_hits) == 1, impl
        assert int(st.fb_used) == 2, impl
        assert int(st.fb_success) == 2, impl


def test_fb_success_zero_without_guide():
    scene = _simple_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for impl in ("fused", "stepwise"):
        _, st = trace_path(scene, o, d, jax.random.key(0), max_bounces=3,
                           impl=impl)
        assert int(st.fb_used) == 0 and int(st.fb_success) == 0, impl


def test_guide_max_level_limits_policy_levels():
    """guide_max_level=K runs the policy only on the first K levels
    (stepwise deployment knob); K >= max_bounces is identical to None."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (200, 100, 50), id=1)        # diffuse A
    b.add_sphere((0.5, 0, 3), 1.0, (90, 120, 150), id=2)       # diffuse B
    b.add_sphere((-1.0, 0, 0.4), 0.2, (255, 255, 240), emitive=1.0, id=3)
    scene, _, _ = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    kw = dict(max_bounces=4, guide_fn=_normal_guide, fb_prob=1.0,
              impl="stepwise")
    _, full = trace_path(scene, o, d, jax.random.key(0), **kw)
    assert int(full.fb_used) == 2
    _, k1 = trace_path(scene, o, d, jax.random.key(0), guide_max_level=1,
                       **kw)
    assert int(k1.fb_used) == 1           # only the level-0 bounce guided
    rgb_a, eq = trace_path(scene, o, d, jax.random.key(0), guide_max_level=4,
                           **kw)
    rgb_b, _ = trace_path(scene, o, d, jax.random.key(0), **kw)
    np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
    assert int(eq.fb_used) == int(full.fb_used)


def test_fast_precision_matches_exact():
    """precision="fast" (squared-radius hit test + rsqrt direct lighting)
    must agree with the exact reference math on the chandelier frame:
    identical images except for rare 1-ulp trunc-site flips, and identical
    hit statistics.  Both impls route the flag."""
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library

    scene, _, _, p = library.chandelier_scene()
    kw = dict(width=64, height=32, spp=2, max_bounces=4,
              camera_position=p["camera_position"], mirror_threshold=0.0)
    img_e, st_e = render_path(scene, jax.random.key(3), **kw)
    img_f, st_f = render_path(scene, jax.random.key(3), precision="fast",
                              **kw)
    e, f = np.asarray(img_e), np.asarray(img_f)
    # Unit-range pixels: a trunc flip moves a channel by 1/255.
    assert np.abs(e - f).max() <= (1.0 / 255.0) + 1e-6
    assert (e != f).mean() < 0.02
    assert int(st_e.total_rays) == int(st_f.total_rays)
    assert abs(int(st_e.light_hits) - int(st_f.light_hits)) <= \
        0.001 * int(st_e.total_rays) + 2
    # Stepwise agrees with fused under fast too.
    img_s, st_s = render_path(scene, jax.random.key(3), precision="fast",
                              impl="stepwise", **kw)
    np.testing.assert_array_equal(np.asarray(img_s), f)
    assert int(st_s.light_hits) == int(st_f.light_hits)


def test_no_diffuse_specialisation_is_exact():
    """The all-mirror static specialisation (no_diffuse_possible) must not
    change a single bit on the chandelier traditional config, with and
    without a guide attached (the guide can never fire)."""
    from raytracer_tpu.trace.path import no_diffuse_possible
    from raytracer_tpu.scene import library

    scene, _, _, p = library.chandelier_scene()
    assert no_diffuse_possible(scene, 0.0)
    assert not no_diffuse_possible(scene, 0.9)


def test_lean_matches_fused_no_diffuse():
    """impl="lean" (production tracer: in-sweep attribute selection,
    unrolled levels, inline fold, lax.map blocking) must be bit-identical
    to impl="fused" — no-diffuse chandelier config (no RNG in play)."""
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library

    scene, _, _, p = library.chandelier_scene()
    kw = dict(width=40, height=30, spp=2, max_bounces=4,
              camera_position=p["camera_position"], mirror_threshold=0.0)
    img_f, st_f = render_path(scene, jax.random.key(0), **kw)
    img_l, st_l = render_path(scene, jax.random.key(0), impl="lean", **kw)
    np.testing.assert_array_equal(np.asarray(img_l), np.asarray(img_f))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits", "fb_used", "fb_success"):
        assert int(getattr(st_l, f)) == int(getattr(st_f, f)), f


def _lean_scene():
    """Small scene exercising every lean branch (diffuse ground, mirror,
    big + small emissive) — CPU compile of the unrolled-level programs is
    linear in sphere count, so parity tests beyond the chandelier one use
    this 5-sphere scene to keep the suite fast."""
    b = SceneBuilder()
    b.add_sphere((0, -100.5, 0), 100.0, (180, 180, 180), id=1)  # ground
    b.add_sphere((0, 1, -5), 1.0, (200, 100, 50), id=2)         # diffuse
    b.add_sphere((3, 1, -5), 1.0, (220, 220, 220), reflective=0.95, id=3)
    b.add_sphere((0, 5, -5), 1.2, (255, 255, 240), emitive=1.0, id=4)
    b.add_sphere((-2, 2, -4), 0.2, (255, 240, 200), emitive=1.0, id=5)
    scene, _, _ = b.build()
    return scene


def test_lean_matches_fused_diffuse_multiblock():
    """Diffuse bounces draw RNG: the lean prologue must reproduce the
    fused scan's exact draw schedule, including across block boundaries
    and padded lanes (R=3601 rays at block_rays=1000 → 4 blocks with 399
    dead padded lanes)."""
    from raytracer_tpu.trace.path import _trace_path_lean

    scene = _lean_scene()
    rng = np.random.RandomState(0)
    o = jnp.asarray([0.0, 1.0, 2.0], jnp.float32) + jnp.zeros(
        (3601, 3), jnp.float32)
    d = jnp.asarray(rng.randn(3601, 3), jnp.float32)
    key = jax.random.key(7)
    rgb_f, st_f = trace_path(scene, o, d, key, max_bounces=4,
                             mirror_threshold=0.9)
    rgb_l, st_l = _trace_path_lean(scene, o, d, key, max_bounces=4,
                                   mirror_threshold=0.9,
                                   background=(2.0, 2.0, 5.0), guide_fn=None,
                                   fb_prob=1.0, collect_stats=True,
                                   fast=False, block_rays=1000)
    np.testing.assert_array_equal(np.asarray(rgb_l), np.asarray(rgb_f))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits"):
        assert int(getattr(st_l, f)) == int(getattr(st_f, f)), f


def test_lean_matches_fused_guided():
    """Guided lean: obs built from in-sweep material selects + the fused
    draw schedule must reproduce the fused guided tracer bit for bit
    (same actions, same fb gate, same fb_used/fb_success)."""
    from raytracer_tpu.trace.path import _trace_path_lean

    scene = _lean_scene()
    rng = np.random.RandomState(1)
    o = jnp.asarray([0.0, 1.0, 2.0], jnp.float32) + jnp.zeros(
        (2500, 3), jnp.float32)
    d = jnp.asarray(rng.randn(2500, 3), jnp.float32)
    key = jax.random.key(11)

    # The guide mixes ALL 22 observation columns (fixed random projection)
    # so a regression in ANY in-sweep-selected column — the material
    # props at 9-12, id/100 at 18, bounce at 16, the constant pads —
    # changes actions and breaks the bit-equality below.
    proj = jnp.asarray(np.random.RandomState(3).randn(22, 2), jnp.float32)

    def guide(obs):
        return jnp.tanh(obs @ proj)

    rgb_f, st_f = trace_path(scene, o, d, key, max_bounces=4,
                             mirror_threshold=0.9, guide_fn=guide,
                             fb_prob=0.7)
    rgb_l, st_l = _trace_path_lean(scene, o, d, key, max_bounces=4,
                                   mirror_threshold=0.9,
                                   background=(2.0, 2.0, 5.0),
                                   guide_fn=guide, fb_prob=0.7,
                                   collect_stats=True, fast=False,
                                   block_rays=1024)
    np.testing.assert_array_equal(np.asarray(rgb_l), np.asarray(rgb_f))
    for f in ("total_rays", "total_intersections", "light_hits",
              "small_light_hits", "fb_used", "fb_success"):
        assert int(getattr(st_l, f)) == int(getattr(st_f, f)), f


def test_lean_fast_matches_fused_fast():
    """precision="fast" routes through lean identically to fused fast."""
    scene = _lean_scene()
    rng = np.random.RandomState(2)
    o = jnp.asarray([0.0, 1.0, 2.0], jnp.float32) + jnp.zeros(
        (900, 3), jnp.float32)
    d = jnp.asarray(rng.randn(900, 3), jnp.float32)
    key = jax.random.key(2)
    from raytracer_tpu.trace.path import _trace_path_lean
    rgb_f, _ = trace_path(scene, o, d, key, max_bounces=3,
                          mirror_threshold=0.9, precision="fast")
    rgb_l, _ = _trace_path_lean(scene, o, d, key, max_bounces=3,
                                mirror_threshold=0.9,
                                background=(2.0, 2.0, 5.0), guide_fn=None,
                                fb_prob=1.0, collect_stats=True, fast=True,
                                block_rays=4096)
    np.testing.assert_array_equal(np.asarray(rgb_l), np.asarray(rgb_f))
