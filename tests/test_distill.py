"""Policy distillation: student fidelity, persistence, and the shipped
distilled models' light-hit improvement (the deployment answer to the
reference's 6.7×-slower FB inference)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MODELS = Path(__file__).parents[1] / "models"


def test_distill_roundtrip_and_fidelity():
    from raytracer_tpu.fb.distill import (DistilledGuide, StudentPolicy,
                                          distill)

    rng = np.random.default_rng(0)
    obs = rng.normal(size=(4096, 22)).astype(np.float32)

    # A fixed "teacher": a randomly-initialised student of another width —
    # distillation must drive the student onto it.
    teacher = StudentPolicy(hidden=(32,))
    tparams = teacher.init(jax.random.key(1), jnp.zeros((1, 22)))["params"]

    def teacher_fn(o):
        return teacher.apply({"params": tparams}, o)

    res = distill(teacher_fn, obs, epochs=120, batch_size=2048,
                  hidden=(64, 64), jitter=0.0)
    assert res.final_loss < 0.05

    g = DistilledGuide(res.params, (64, 64))
    probe = jnp.asarray(rng.normal(size=(128, 22)).astype(np.float32))
    err = np.abs(np.asarray(g.as_guide_fn(dtype=None)(probe))
                 - np.asarray(teacher_fn(probe)))
    assert err.mean() < 0.25

    g.save("/tmp/_distill_rt.npz")
    g2 = DistilledGuide.load("/tmp/_distill_rt.npz")
    np.testing.assert_array_equal(
        np.asarray(g.as_guide_fn(dtype=None)(probe)),
        np.asarray(g2.as_guide_fn(dtype=None)(probe)))


@pytest.mark.skipif(
    not (MODELS / "fb_chandelier_distilled.npz").exists(),
    reason="shipped distilled model missing")
def test_shipped_distilled_chandelier_improves_small_light_hits():
    """The distilled guide must keep the teacher's learned-sampling win at
    BOTH deployment aspects (shipped v5 model — hindsight aim-sharpened
    v4 distillation, TPU: 2.49× hits at 1.80× speedup at the reference's
    200×100@8spp config, 4.04× at 1.77× at the 800×600@8spp deployment
    config).  CPU probe measurements (seed 5): 2.48× at 100×50 (2:1),
    3.66× at 120×90 (4:3); pinned with margin."""
    from raytracer_tpu.compare.harness import chandelier_comparison

    stats = chandelier_comparison(
        model_path=str(MODELS / "fb_chandelier_distilled.npz"),
        width=100, height=50, samples_per_pixel=4, max_bounces=8, seed=5,
        save_png=False, out_dir="/tmp/_distilled_chandelier_check")
    assert stats["fb"]["fb_used"] > 0
    imp = stats["comparison"]["small_light_improvement"]
    assert imp > 1.5, f"distilled small-light improvement degraded: {imp}"

    stats43 = chandelier_comparison(
        model_path=str(MODELS / "fb_chandelier_distilled.npz"),
        width=120, height=90, samples_per_pixel=4, max_bounces=8, seed=5,
        save_png=False, out_dir="/tmp/_distilled_chandelier_check43")
    imp43 = stats43["comparison"]["small_light_improvement"]
    assert imp43 > 2.2, f"4:3 distilled improvement degraded: {imp43}"


@pytest.mark.skipif(
    not (MODELS / "fb_chandelier_distilled_2to1.npz").exists(),
    reason="shipped 2:1 specialist model missing")
def test_shipped_2to1_specialist_improves_small_light_hits():
    """The 2:1 SPECIALIST student (hindsight aim-sharpened distillation of
    the v2 teacher on its own obs pool) holds its record at the
    reference's comparison aspect — TPU 200×100@8spp: 7.23×/7.36× across
    seeds; CPU probe 7.86× at 100×50@4spp seed 5 (pinned >4×).  It is
    aspect-specialised by design (0.36× at 400×300 4:3 — documented in
    STATUS.md); deployments covering both aspects use the all-around
    fb_chandelier_distilled.npz."""
    from raytracer_tpu.compare.harness import chandelier_comparison

    stats = chandelier_comparison(
        model_path=str(MODELS / "fb_chandelier_distilled_2to1.npz"),
        width=100, height=50, samples_per_pixel=4, max_bounces=8, seed=5,
        save_png=False, out_dir="/tmp/_specialist_check")
    assert stats["fb"]["fb_used"] > 0
    imp = stats["comparison"]["small_light_improvement"]
    assert imp > 4.0, f"2:1 specialist improvement degraded: {imp}"


@pytest.mark.skipif(
    not (MODELS / "fb_complex_distilled.npz").exists(),
    reason="shipped complex distilled model missing")
def test_shipped_distilled_complex_improves_small_light_hits():
    """The sharpened complex student (TPU, 200×100@8spp seed 5: 26.1×
    small-light hits at 1.50× speedup — showcase/complex_comparison_trained)
    must hold its win at the reduced CPU probe config (measured 25.6× at
    100×50@4spp seed 5; pinned >10× for Poisson margin on 38 trad hits)."""
    from raytracer_tpu.compare.harness import complex_comparison

    stats = complex_comparison(
        model_path=str(MODELS / "fb_complex_distilled.npz"),
        width=100, height=50, samples_per_pixel=4, max_bounces=8, seed=5,
        save_png=False, out_dir="/tmp/_distilled_complex_check")
    assert stats["fb"]["fb_used"] > 0
    imp = stats["comparison"]["small_light_improvement"]
    assert imp > 10.0, f"complex distilled improvement degraded: {imp}"


def test_guide_registry_routes_by_aspect():
    """fb/registry.py: static per-camera model dispatch — 2:1 crops route
    to the specialist, 4:3 to the all-around student; unknown scenes →
    None; the returned guide is render-ready (fused spec attached)."""
    from raytracer_tpu.fb import registry

    assert registry.aspect_band(200, 100) == "wide"
    assert registry.aspect_band(800, 600) == "standard"

    wide = registry.model_path_for("chandelier", 200, 100)
    std = registry.model_path_for("chandelier", 800, 600)
    if wide is None or std is None:
        pytest.skip("shipped chandelier students missing")
    assert wide.endswith("fb_chandelier_distilled_2to1.npz")
    assert std.endswith("fb_chandelier_distilled.npz")
    assert registry.model_path_for("nonexistent_scene", 200, 100) is None

    guide = registry.guide_for("chandelier", 200, 100, dtype=None)
    import jax.numpy as jnp
    out = np.asarray(guide(jnp.zeros((4, 22), jnp.float32)))
    assert out.shape == (4, 2) and np.isfinite(out).all()
    assert hasattr(guide, "_fused_spec")

    # Template scenes route to the per-type students (variation suffixes
    # resolve to the type).
    cornell = registry.model_path_for("cornell_box:1007", 200, 100)
    if cornell is not None:
        assert cornell.endswith("fb_cornell_distilled.npz")
        assert (registry.model_path_for("cornell_box", 800, 600)
                == registry.model_path_for("cornell_box:3", 800, 600))
    many = registry.model_path_for("many_lights:1003", 200, 100)
    if many is not None:
        assert many.endswith("fb_many_lights_distilled.npz")
    # occluded_lights routes to the EPISODE-pool student (round-3 fix:
    # 2.31x vs teacher 1.66x held-out — registry.py comment); round 2 had
    # it deliberately unregistered when the render-pool student collapsed.
    occ = registry.model_path_for("occluded_lights", 800, 600)
    if occ is not None:
        assert occ.endswith("fb_occluded_distilled.npz")


def test_best_of_teachers_selects_hitting_action():
    """Outcome-selected ensemble targets (fb/distill.py
    best_of_teachers_targets): with one teacher that aims exactly at a
    small emissive sphere and one that aims away, the selected target must
    be the hitting teacher's action (with the boosted weight), and ties on
    no-hit obs must fall to the FIRST teacher."""
    from raytracer_tpu.fb.distill import best_of_teachers_targets
    from raytracer_tpu.scene.types import SceneBuilder
    from raytracer_tpu.trace.sampling import direction_to_action

    light_centre = np.array([0.0, 3.0, 0.0], np.float32)
    b = SceneBuilder()
    b.add_sphere((0.0, -100.0, 0.0), 99.0, id=1)           # floor
    b.add_sphere(tuple(light_centre), 0.1, emitive=1.0, id=7)
    scene, _, _ = b.build()

    # Obs rows: surface points on the floor cap (normal up), the fields
    # best_of_teachers_targets reads are point [0:3] and normal [6:9].
    n = 64
    rng = np.random.default_rng(0)
    obs = np.zeros((n, 22), np.float32)
    obs[:, 0] = rng.uniform(-0.5, 0.5, n)                  # x
    obs[:, 1] = -1.0                                       # floor cap height
    obs[:, 2] = rng.uniform(-0.5, 0.5, n)                  # z
    obs[:, 7] = 1.0                                        # normal = +y

    import jax.numpy as jnp
    normal = jnp.asarray(obs[:, 6:9])
    to_light = jnp.asarray(light_centre[None, :] - obs[:, 0:3])
    to_light = to_light / jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    aim = np.asarray(direction_to_action(to_light, normal,
                                         convention="renderer"))

    def teacher_miss(o):                                   # grazing, misses
        return jnp.full((o.shape[0], 2), jnp.asarray([0.99, 0.5]))

    def teacher_hit(o):
        return jnp.asarray(aim[: o.shape[0]])

    targets, weights = best_of_teachers_targets(
        scene, obs, [teacher_miss, teacher_hit], bonus=9.0)
    np.testing.assert_allclose(targets, aim, atol=1e-6)
    assert (weights == 19.0).all(), weights                # 1 + 9 emis + 9 small

    # Both teachers missing (grazing rays, different azimuths) → tie at
    # score 0 → first teacher's action.
    def teacher_miss2(o):
        return jnp.full((o.shape[0], 2), jnp.asarray([0.99, -0.5]))

    targets2, weights2 = best_of_teachers_targets(
        scene, obs, [teacher_miss, teacher_miss2], bonus=9.0)
    np.testing.assert_allclose(targets2,
                               np.asarray(teacher_miss(jnp.asarray(obs))))
    assert (weights2 == 1.0).all()


def test_hindsight_aim_targets_sharpen_hits_only():
    """hindsight_aim_targets: a teacher action that lands on an emissive
    sphere is relabelled with the EXACT centre aim (and boosted weight); a
    missing action passes through unchanged at weight 1."""
    from raytracer_tpu.fb.distill import hindsight_aim_targets
    from raytracer_tpu.scene.types import SceneBuilder
    from raytracer_tpu.trace.sampling import direction_to_action

    light_centre = np.array([0.0, 3.0, 0.0], np.float32)
    b = SceneBuilder()
    b.add_sphere((0.0, -100.0, 0.0), 99.0, id=1)
    b.add_sphere(tuple(light_centre), 0.1, emitive=1.0, id=7)
    scene, _, _ = b.build()

    import jax.numpy as jnp
    n = 32
    rng = np.random.default_rng(1)
    obs = np.zeros((n, 22), np.float32)
    obs[:, 0] = rng.uniform(-0.3, 0.3, n)
    obs[:, 1] = -1.0
    obs[:, 2] = rng.uniform(-0.3, 0.3, n)
    obs[:, 7] = 1.0

    normal = jnp.asarray(obs[:, 6:9])
    to_light = jnp.asarray(light_centre[None, :] - obs[:, 0:3])
    to_light = to_light / jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    exact = np.asarray(direction_to_action(to_light, normal,
                                           convention="renderer"))
    # Near-miss-free perturbation: tilt the aim within the light's
    # subtense so the raw action still hits, but is not the exact centre.
    approx = exact + np.array([0.004, 0.0], np.float32)

    t_hit, w_hit = hindsight_aim_targets(scene, obs, approx)
    np.testing.assert_allclose(t_hit, exact, atol=1e-5)
    assert (w_hit == 19.0).all()

    grazing = np.tile(np.array([[0.99, 0.5]], np.float32), (n, 1))
    t_miss, w_miss = hindsight_aim_targets(scene, obs, grazing)
    np.testing.assert_allclose(t_miss, grazing, atol=1e-7)
    assert (w_miss == 1.0).all()


def test_matched_signal_mode_spends_fewer_samples():
    """fb_samples_per_pixel: the guided render runs at reduced spp (the
    matched-signal artifact mode) — both spp values are recorded and the
    guided side spends proportionally fewer rays."""
    from raytracer_tpu.compare.harness import chandelier_comparison

    stats = chandelier_comparison(
        model_path=str(MODELS / "fb_chandelier_distilled.npz"),
        width=40, height=20, samples_per_pixel=4, max_bounces=4, seed=3,
        save_png=False, fb_samples_per_pixel=2,
        out_dir="/tmp/_matched_signal_check")
    assert stats["traditional"]["samples_per_pixel"] == 4
    assert stats["fb"]["samples_per_pixel"] == 2
    # Half the samples → roughly half the rays (paths differ stochastically).
    ratio = stats["fb"]["total_rays"] / stats["traditional"]["total_rays"]
    assert 0.3 < ratio < 0.75, ratio


@pytest.mark.skipif(
    not (MODELS / "fb_chandelier_distilled.npz").exists(),
    reason="shipped distilled model missing")
def test_fused_guide_kernel_matches_separate_program():
    """The distilled guide fused into the level kernel
    (trace/path.py::_level_kernel_guided) is bit-identical to the
    separate-program guide path (same key schedule, same bf16 math)."""
    import jax
    import numpy as np
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library

    scene, _, _, p = library.chandelier_scene()
    g = DistilledGuide.load(str(MODELS / "fb_chandelier_distilled.npz"))
    fused = g.as_guide_fn()
    plain = g.as_guide_fn()
    del plain._fused_spec                 # force the separate-program path

    key = jax.random.key(7)
    kw = dict(width=48, height=24, spp=2, max_bounces=5,
              camera_position=p["camera_position"], mirror_threshold=0.9,
              fb_prob=1.0, impl="stepwise")
    img_f, st_f = render_path(scene, key, guide_fn=fused, **kw)
    img_p, st_p = render_path(scene, key, guide_fn=plain, **kw)
    np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_p))
    assert int(st_f.fb_used) == int(st_p.fb_used) > 0


def test_shipped_cornell_student_improves_small_light_hits(tmp_path):
    """Per-TYPE distilled student from the multi-scene GENERALIST: the
    cornell student (distilled with hindsight aim-sharpening on
    training-band variation 7) must beat uniform sampling on HELD-OUT
    cornell variations — and by more than its full teacher (teacher:
    1.69-1.78x; student measured 3.05-3.15x across variations
    {1001, 1007, 1013} at this config, CPU, seed 5).  Recipe:
    scripts/ship_models.py distill --scene cornell_box:7
    --teacher models/fb_multi_scene_trained.npz --sharpen
    --hidden 128 128 --frames 6 --epochs 40 --seed 0."""
    model = Path(__file__).parents[1] / "models" / "fb_cornell_distilled.npz"
    if not model.exists():
        pytest.skip("shipped model missing")
    from raytracer_tpu.compare.harness import run_comparison
    from raytracer_tpu.scene.templates import generate_scene

    scene, name = generate_scene("cornell_box", 1007)
    stats = run_comparison(scene, camera_position=(0.0, 0.5, 0.0),
                           width=100, height=50, samples_per_pixel=4,
                           max_bounces=8, model_path=str(model),
                           out_dir=tmp_path / "cornell_student",
                           scene_name=name, save_png=False, impl="fused",
                           seed=5)
    imp = stats["comparison"]["small_light_improvement"]
    assert stats["fb"]["fb_used"] > 0
    assert imp > 2.0, f"cornell student improvement degraded: {imp}"


def test_shipped_many_lights_student_beats_random_episodes():
    """Per-TYPE student for an OPEN-geometry template, pinned on the
    held-out EPISODE metric (open templates have ~no render-level
    small-light signal — STATUS.md): the many_lights student must beat
    the cosine random walk on held-out variations, where its own teacher
    does not (this config, seed 0: student 1.53x, teacher 1.27x; the
    24-scene eval in models/fb_many_lights_held_out.json: 1.20x vs
    0.92x).  Recipe: scripts/ship_models.py distill
    --scene many_lights:7 --teacher models/fb_multi_scene_trained.npz
    --sharpen --hidden 128 128 --frames 6 --epochs 40 --seed 0."""
    model = MODELS / "fb_many_lights_distilled.npz"
    if not model.exists():
        pytest.skip("shipped model missing")
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.fb.trajectory import generate_trajectories
    from raytracer_tpu.scene.templates import generate_scene

    guide_apply, guide_params = DistilledGuide.load(
        str(model)).as_trajectory_guide()
    key = jax.random.key(0)
    pol_rates, rnd_rates = [], []
    for i in range(6):
        scene, _ = generate_scene("many_lights", 1000 + i, pad_to=64)
        key, kp, kr = jax.random.split(key, 3)
        pol = generate_trajectories(
            scene, kp, num_walkers=256, max_steps=8, start_bias="small",
            guide_apply=guide_apply, guide_params=guide_params,
            guide_proto=jnp.zeros((64,), jnp.float32), guide_prob=1.0,
            guide_noise=0.0)
        rnd = generate_trajectories(scene, kr, num_walkers=256,
                                    max_steps=8, start_bias="small")
        pol_rates.append(float(np.asarray(pol.episode_hit).mean()))
        rnd_rates.append(float(np.asarray(rnd.episode_hit).mean()))
    ratio = np.mean(pol_rates) / max(np.mean(rnd_rates), 1e-9)
    assert ratio > 1.2, f"many_lights student episode ratio degraded: {ratio}"


OCCLUDED_STUDENT = Path(__file__).parents[1] / "models" / \
    "fb_occluded_distilled.npz"


@pytest.mark.skipif(not OCCLUDED_STUDENT.exists(), reason="model missing")
def test_shipped_occluded_student_beats_random_on_episodes():
    """The occluded_lights hole (VERDICT r2 item 6): the shipped student
    comes from the EPISODE-WALK pool (ship_models.py distill-episodes) and
    must keep beating the random walk on the held-out episode metric —
    shipped measurement 2.31x vs its teacher's 1.66x at 24x256
    (models/fb_occluded_held_out.json).  Reduced config here."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.fb.trajectory import generate_trajectories
    from raytracer_tpu.scene import templates

    student = DistilledGuide.load(str(OCCLUDED_STUDENT))
    apply_fn, guide_params = student.as_trajectory_guide()
    cfg = FBConfig()
    pol_hits, rnd_hits = [], []
    for i, var in enumerate((1000, 1008, 1016)):
        scene, _ = templates.generate_scene("occluded_lights", var, pad_to=64)
        kp, kr = jax.random.split(jax.random.key(i))
        pol = generate_trajectories(
            scene, kp, num_walkers=512, max_steps=cfg.max_bounces,
            start_bias="small", guide_apply=apply_fn,
            guide_params=guide_params,
            guide_proto=jnp.zeros((cfg.z_dim,), jnp.float32),
            guide_prob=1.0, guide_noise=0.0)
        rnd = generate_trajectories(scene, kr, num_walkers=512,
                                    max_steps=cfg.max_bounces,
                                    start_bias="small")
        pol_hits.append(float(np.asarray(pol.episode_hit).mean()))
        rnd_hits.append(float(np.asarray(rnd.episode_hit).mean()))
    p, r = np.mean(pol_hits), np.mean(rnd_hits)
    print("policy", pol_hits, "random", rnd_hits)
    assert p > r * 1.3, (p, r)


def test_registry_covers_all_eight_template_types():
    """Every type in the reference's 8-template family
    (fb_multi_scene_training final_training_report "all_performances")
    has a routing decision backed by a held-out artifact — VERDICT r3
    item 6.  The three types added in round 4 carry episode-level
    held-out evidence (student vs random z-scores) in their artifacts."""
    import json
    from pathlib import Path

    from raytracer_tpu.fb import registry

    types = ["complex_scene", "cornell_box", "mirror_maze",
             "glass_gallery", "simple_challenging", "many_lights",
             "occluded_lights", "chandelier_scene"]
    # Registry keys use the short scene names for the two canonical
    # scenes; template types route under their template name.
    routed = {t.partition(":")[0] for t, _band in registry.REGISTRY}
    for t in types:
        short = {"complex_scene": "complex",
                 "chandelier_scene": "chandelier"}.get(t, t)
        assert short in routed, f"{t} has no registry routing"

    root = Path(__file__).parents[1] / "models"
    for art, min_z in (("fb_glass_gallery_held_out.json", 3.0),
                       ("fb_simple_held_out.json", 2.0),
                       ("fb_mirror_maze_held_out.json", 1.5)):
        d = json.loads((root / art).read_text())
        assert d["student"]["ratio"] > 1.3, art
        assert d["student"]["z"] >= min_z, art
        assert (root / Path(d["student"]["model"]).name).exists(), art

    # mirror_maze's single-seed z=1.94 was the r4 borderline (ADVICE r4);
    # round 5 added two more independent seeds — the shipped routing now
    # rests on a combined z >= 3 (measured 4.34 over 147k episodes).
    mm = json.loads((root / "fb_mirror_maze_held_out.json").read_text())
    assert mm["multi_seed"]["combined"]["z"] >= 3.0
    assert len(mm["multi_seed"]["per_seed_hits"]) >= 3
