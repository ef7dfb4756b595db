"""Shipped-model regression: the trained FB chandelier model must keep
beating traditional sampling on small-light hits (the framework's
learned-sampling headline; reference trained model: 1.096×).

The shipped teacher (v4: wall-start + small-aligned training,
scripts/ship_models.py train-chandelier --scenes 320 --steps 300) is
strongest on 4:3 views where wall/floor surfaces dominate — measured
1.68× at the 120×90 probe and 1.83× at 400×300 (its distilled student:
3.62× at 1.93× speedup at the 800×600@8spp deployment config, TPU) — so
the teacher pin runs at a 4:3 probe config."""
from pathlib import Path

import numpy as np
import pytest

MODEL = Path(__file__).parents[1] / "models" / "fb_chandelier_trained.npz"
COMPLEX_MODEL = Path(__file__).parents[1] / "models" / "fb_complex_trained.npz"
MULTI_MODEL = Path(__file__).parents[1] / "models" / "fb_multi_scene_trained.npz"


@pytest.mark.skipif(not MODEL.exists(), reason="shipped model missing")
def test_shipped_chandelier_model_improves_small_light_hits():
    from raytracer_tpu.compare.harness import chandelier_comparison

    stats = chandelier_comparison(model_path=str(MODEL), width=120,
                                  height=90, samples_per_pixel=4,
                                  max_bounces=8, seed=5, save_png=False,
                                  out_dir="/tmp/_trained_model_check")
    imp = stats["comparison"]["small_light_improvement"]
    assert stats["fb"]["fb_used"] > 0
    # Measured 1.68 at this config (CPU, seed 5); pinned with margin.
    assert imp > 1.2, f"small-light improvement degraded: {imp}"


@pytest.mark.skipif(not COMPLEX_MODEL.exists(), reason="shipped model missing")
def test_shipped_complex_model_improves_light_hits():
    """Complex-scene twin: the shipped model measured 14.98× light-hit
    improvement at the full config (showcase/complex_comparison_trained/
    statistics.json; reference trained model: 7.93×).  Pinned at > 5× at
    this reduced config so a training/inference regression can't ship
    silently."""
    from raytracer_tpu.compare.harness import complex_comparison

    stats = complex_comparison(model_path=str(COMPLEX_MODEL), width=100,
                               height=50, samples_per_pixel=4,
                               max_bounces=8, seed=5, save_png=False,
                               out_dir="/tmp/_trained_complex_check")
    trad, fb = stats["traditional"], stats["fb"]
    assert fb["fb_used"] > 0
    imp = (fb["light_hits"] / max(1, trad["light_hits"])
           / max(1e-9, fb["total_rays"] / max(1, trad["total_rays"])))
    assert imp > 5.0, f"complex light-hit improvement degraded: {imp}"


@pytest.mark.skipif(not MULTI_MODEL.exists(), reason="shipped model missing")
def test_shipped_multi_scene_model_generalizes_at_render_level():
    """The multi-scene GENERALIST must improve small-light transport at
    render time on scenes it never trained on (training used variations
    0-99; held-out evals use 1000+, matching ship_models.py eval-multi).
    Measured 1.69-1.78x across cornell variations {1001, 1007, 1013} at
    this config (CPU, seed 5); pinned with margin.  This is the
    render-level counterpart of the 1.7-1.9x episode-level held-out ratio
    (models/fb_multi_scene_held_out.json)."""
    from raytracer_tpu.compare.harness import run_comparison
    from raytracer_tpu.scene.templates import generate_scene

    scene, name = generate_scene("cornell_box", 1007)
    stats = run_comparison(scene, camera_position=(0.0, 0.5, 0.0),
                           width=100, height=50, samples_per_pixel=4,
                           max_bounces=8, model_path=str(MULTI_MODEL),
                           out_dir="/tmp/_multi_generalist_check",
                           scene_name=name, save_png=False, impl="fused",
                           seed=5)
    imp = stats["comparison"]["small_light_improvement"]
    assert stats["fb"]["fb_used"] > 0
    assert imp > 1.3, f"held-out cornell improvement degraded: {imp}"


CORNELL_STUDENT = Path(__file__).parents[1] / "models" / "fb_cornell_distilled.npz"


@pytest.mark.skipif(not CORNELL_STUDENT.exists(), reason="model missing")
def test_cornell_student_beats_teacher_on_episode_metric():
    """The per-type student must hold its advantage on the STRICT
    held-out episode metric too (ship_models.py eval-multi --type
    cornell_box): measured student 3.23x vs teacher 2.56x vs random at
    24 scenes x 256 episodes.  Reduced config here; pins that the
    DistilledGuide.as_trajectory_guide adapter drives the trajectory
    generator and that the student clearly beats the random walk."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.fb.trajectory import generate_trajectories
    from raytracer_tpu.scene import templates

    student = DistilledGuide.load(str(CORNELL_STUDENT))
    apply_fn, guide_params = student.as_trajectory_guide()
    cfg = FBConfig()
    scene, _ = templates.generate_scene("cornell_box", 1005, pad_to=64)
    kp, kr = jax.random.split(jax.random.key(0))
    pol = generate_trajectories(
        scene, kp, num_walkers=512, max_steps=cfg.max_bounces,
        start_bias="small", guide_apply=apply_fn,
        guide_params=guide_params,
        guide_proto=jnp.zeros((cfg.z_dim,), jnp.float32),
        guide_prob=1.0, guide_noise=0.0)
    rnd = generate_trajectories(scene, kr, num_walkers=512,
                                max_steps=cfg.max_bounces,
                                start_bias="small")
    p = float(np.asarray(pol.episode_hit).mean())
    r = float(np.asarray(rnd.episode_hit).mean())
    assert p > 1.5 * max(r, 1e-9), f"student {p:.4f} vs random {r:.4f}"


SAC_MODEL = Path(__file__).parents[1] / "models" / "sac_raytracer.npz"


@pytest.mark.skipif(not SAC_MODEL.exists(), reason="shipped SAC missing")
def test_shipped_sac_beats_random_on_light_hits_and_reward():
    """The RL track's shipped-checkpoint pin (VERDICT r2 item 7): the
    committed SAC policy (cli rl-pipeline --cpu --timesteps 60000 --seed 0)
    must keep beating the random-action baseline on the training env —
    measured at ship time with EXACT emissive-sphere hit counting
    (VERDICT r3 item 4; the old reward>=2 proxy inflated random's rate):
    light_hit_rate 0.322 vs 0.104, avg_reward 3.36 vs 1.59 (512 episodes,
    seed 0; models/sac_raytracer_benchmark.json).
    showcase/rl_vs_traditional_comparison.png renders from THIS file."""
    from raytracer_tpu.agents.sac import SACConfig, SACTrainer
    from raytracer_tpu.compare.workbench import evaluate_policy
    from raytracer_tpu.env.raytracer_env import RayTracerEnv
    from raytracer_tpu.env.scenes import training_scene_complete

    scene, gl, pl = training_scene_complete()
    env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                       max_bounces=8, global_lights=gl, point_lights=pl,
                       variant="rl")
    tr = SACTrainer(env, SACConfig(), seed=0)
    tr.load(str(SAC_MODEL))
    policy = lambda obs: tr.predict(obs, deterministic=True)
    rl = evaluate_policy(env, policy, episodes=512, seed=0)
    rnd = evaluate_policy(env, None, episodes=512, seed=100)
    assert rl["light_hit_rate"] > rnd["light_hit_rate"] * 1.05
    assert rl["avg_reward"] > rnd["avg_reward"] * 1.5


HELD_OUT_JSON = Path(__file__).parents[1] / "models" / \
    "fb_chandelier_held_out.json"


@pytest.mark.skipif(not HELD_OUT_JSON.exists(), reason="artifact missing")
def test_chandelier_held_out_artifact_is_self_consistent():
    """The shipped held-out artifact must carry BOTH measurement families
    and explain their divergence inside the file (VERDICT r2 item 5: no
    shipped artifact contradicts the README without comment)."""
    import json
    with open(HELD_OUT_JSON) as f:
        d = json.load(f)
    for k in ("protocol", "teacher_one_step", "student_one_step",
              "render_level", "explanation"):
        assert k in d, k
    # The deployment claim: render-level improvement > 1 (recorded; the
    # live render pin is test_shipped_chandelier_model_improves_*).
    assert d["render_level"]["small_light_improvement"] > 1.0
    # If the one-step probe sits at-or-below random (the measured state),
    # the explanation must be present and name the divergence.
    t = d["teacher_one_step"]
    if t["agent_hit_rate_core"] <= t["random_hit_rate_core"]:
        assert "diverge" in d["explanation"]


HELD_OUT = Path(__file__).parents[1] / "models" / "fb_multi_scene_held_out.json"


@pytest.mark.skipif(not HELD_OUT.exists(), reason="artifact missing")
def test_flat_type_probe_verdicts_recorded():
    """VERDICT r3 item 9: the two template types that tied policy==random
    at 256 episodes (simple, chandelier) must carry a decision-grade
    verdict from the 1024-episode probe (scripts/flat_type_probe.py):
    chandelier resolved agent-failure (generalist significantly below
    random, specialist significantly above — both |z| > 2), simple
    recorded signal-starved with its counts."""
    import json

    art = json.loads(HELD_OUT.read_text())
    probe = art["flat_type_probe"]
    for t in ("simple", "chandelier"):
        assert len(probe[t]["verdict"]) > 40, t
    assert probe["chandelier"]["generalist_z"] < -2
    assert probe["chandelier"]["specialist_z"] > 2
    assert probe["simple"]["episodes"] >= 20000


PPO_BENCH = Path(__file__).parents[1] / "models" / "ppo_raytracer_benchmark.json"


@pytest.mark.skipif(not PPO_BENCH.exists(), reason="artifact missing")
def test_shipped_tpu_trained_ppo_beats_random():
    """VERDICT r4 item 3 done-bar: the TPU-trained PPO checkpoint's exact
    light-hit rate beats random at z >= 3 (shipped by
    scripts/ppo_ship_best.py — 3-stage entropy annealing, 128x128 net,
    batch 512, ~2M on-device steps; r4's 20k-step demo lost to random
    0.082 vs 0.121)."""
    import json

    d = json.loads(PPO_BENCH.read_text())
    rl, rnd = d["rl"], d["random"]
    assert rl["light_hit_rate"] > rnd["light_hit_rate"]
    assert d["light_hit_z"] >= 3.0
    assert rl["episodes"] >= 1024


SAC_TPU_BENCH = (Path(__file__).parents[1] / "models" /
                 "sac_raytracer_tpu_benchmark.json")


@pytest.mark.skipif(not SAC_TPU_BENCH.exists(), reason="artifact missing")
def test_shipped_tpu_trained_sac_beats_random():
    """VERDICT r4 item 5 done-bar: the on-device-trained SAC (device ring
    replay buffer, scripts/sac_ship_tpu.py) beats random on exact
    light-hit rate at z >= 3 (shipped: 0.1841 vs 0.0967, z=+8.05,
    2048 episodes, 55 s of TPU training)."""
    import json

    d = json.loads(SAC_TPU_BENCH.read_text())
    assert d["rl"]["light_hit_rate"] > d["random"]["light_hit_rate"]
    assert d["light_hit_z"] >= 3.0
    assert d["rl"]["episodes"] >= 1024
