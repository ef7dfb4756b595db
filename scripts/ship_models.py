"""Provenance driver for the shipped models in ``models/``.

Every checkpoint we ship is produced by a subcommand here, so the exact
recipe is reproducible:

    python scripts/ship_models.py train-chandelier [--scenes 160] [--steps 200]
    python scripts/ship_models.py train-complex    [--scenes 100] [--steps 150]
    python scripts/ship_models.py distill  --scene chandelier \
        --teacher models/fb_chandelier_trained.npz \
        --out models/fb_chandelier_distilled.npz [--hidden 128 128] ...
    python scripts/ship_models.py eval --scene chandelier \
        --model models/fb_chandelier_distilled.npz [--spp 4] [--size 100x50]

Training runs the FB method exactly as the package trainers define it
(guide-in-the-loop random walks + hindsight relabelling, fb/trainer.py);
this script only sequences them and pins seeds/output paths.  Runs on CPU
by default (training is small-network bound; the TPU is left free for
rendering benchmarks) — pass --tpu to use the default backend.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _force_cpu(args):
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")


def _override_config(args, base):
    """Apply --z-dim/--e-hidden/--f-hidden/--b-hidden on top of a trainer's
    default config; returns None (keep the default) when no flag is set."""
    import dataclasses
    if not any(v is not None for v in (args.z_dim, args.e_hidden,
                                       args.f_hidden, args.b_hidden)):
        return None
    return dataclasses.replace(
        base,
        z_dim=args.z_dim or base.z_dim,
        e_hidden_dim=args.e_hidden or base.e_hidden_dim,
        f_hidden_dim=args.f_hidden or base.f_hidden_dim,
        b_hidden_dim=args.b_hidden or base.b_hidden_dim)


def cmd_train_chandelier(args):
    _force_cpu(args)
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.trainer import ChandelierOnlyTrainer

    cfg = _override_config(args, FBConfig(max_bounces=8, f_hidden_dim=512,
                                          b_hidden_dim=256))
    tr = ChandelierOnlyTrainer(num_training_scenes=args.scenes,
                               seed=args.seed,
                               output_dir=args.workdir,
                               guide_prob=0.0, config=cfg,
                               resume_from=args.resume_from)
    # Guide-in-the-loop curriculum: random-walk exploration until the agent
    # has a light prototype and a useful policy, then ramp the fraction of
    # policy-driven steps so experience tracks the improving policy.
    # ``--wall-schedule`` sets the wall-start fraction per chunk (three
    # values) so the start-point mix can be a curriculum too — wall_frac is
    # a traced scalar in fb/trajectory.py, so any schedule shares one
    # compile.  Default = the shipped v4/v5 recipe (constant 0.35).
    chunks = [(args.scenes // 4, 0.0), (args.scenes // 4, 0.25),
              (args.scenes // 2, args.guide_prob)]
    wall = args.wall_schedule or [tr.WALL_FRAC] * len(chunks)
    assert len(wall) == len(chunks), "--wall-schedule needs 3 values"
    done = 0
    for (n, gp), wf in zip(chunks, wall):
        tr.guide_prob = gp
        tr.WALL_FRAC = wf
        tr.num_training_scenes = n
        tr.run_training(num_scenes=n, scenes_per_batch=20,
                        training_steps_per_scene=args.steps)
        done += n
        print(f"[train-chandelier] {done} scenes done (guide_prob={gp}, "
              f"wall_frac={wf}), noise={tr.agent.noise_scale:.4f}",
              flush=True)
    out = args.out or "models/fb_chandelier_trained.npz"
    tr.agent.save(out)
    held = tr.test_on_chandelier(num_tests=500)
    print(json.dumps(held, indent=2))
    print(f"saved teacher → {out}")


def cmd_train_complex(args):
    _force_cpu(args)
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.trainer import RayTracedComplexTrainer

    cfg = _override_config(args, FBConfig(max_bounces=8))
    tr = RayTracedComplexTrainer(num_training_scenes=args.scenes,
                                 seed=args.seed, output_dir=args.workdir,
                                 guide_prob=0.0, config=cfg,
                                 resume_from=args.resume_from)
    chunks = [(args.scenes // 4, 0.0), (args.scenes // 4, 0.25),
              (args.scenes // 2, args.guide_prob)]
    for n, gp in chunks:
        tr.guide_prob = gp
        tr.run_training(num_scenes=n, scenes_per_batch=20,
                        training_steps_per_scene=args.steps)
        print(f"[train-complex] +{n} scenes (guide_prob={gp})", flush=True)
    out = args.out or "models/fb_complex_trained.npz"
    tr.agent.save(out)
    print(json.dumps(tr.test_on_complex(num_tests=500), indent=2))
    print(f"saved teacher → {out}")


def cmd_train_multi(args):
    """Reference protocol (fb_multi_scene_training_*): 100 scenes cycling
    the 8 templates, 150 walker episodes per scene; report average hit
    rate to compare against the reference's recorded 34.7%
    (final_training_report.json).  ``--z-dim/--e-hidden/--f-hidden/
    --b-hidden`` override the report config for model-size scaling
    experiments (the shipped model keeps the reference config)."""
    _force_cpu(args)
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.trainer import MultiSceneFBTrainer

    cfg = _override_config(args, FBConfig())
    tr = MultiSceneFBTrainer(num_training_scenes=args.scenes,
                             seed=args.seed, output_dir=args.workdir,
                             guide_prob=0.0, config=cfg,
                             resume_from=args.resume_from)
    chunks = [(args.scenes // 4, 0.0), (args.scenes // 4, 0.25),
              (args.scenes // 2, args.guide_prob)]
    report = None
    for n, gp in chunks:
        tr.guide_prob = gp
        report = tr.run_training(num_scenes=n, scenes_per_batch=20,
                                 training_steps_per_scene=args.steps)
        print(f"[train-multi] +{n} scenes (guide_prob={gp})", flush=True)
    out = args.out or "models/fb_multi_scene_trained.npz"
    tr.agent.save(out)
    stats = report["performance_statistics"]
    print(json.dumps({"avg_hit_rate": stats["avg_hit_rate"],
                      "by_type": report["scene_type_performance"]},
                     indent=2))
    print(f"saved multi-scene agent → {out}")


def _config_from_ckpt(path):
    """Rebuild the FBConfig a checkpoint was trained with (save_fb stores
    config.to_dict() in the npz __meta__), so eval works for any model
    size without flag plumbing."""
    import dataclasses
    import json as _json

    import numpy as np

    from raytracer_tpu.fb.config import FBConfig

    meta = _json.loads(str(np.load(path, allow_pickle=False)["__meta__"]))
    fields = {f.name for f in dataclasses.fields(FBConfig)}
    return FBConfig(**{k: v for k, v in meta.get("config", {}).items()
                       if k in fields})


def cmd_eval_multi(args):
    """Held-out multi-scene evaluation — the STRICT episode hit fraction
    (did a ≤max_bounces walk land exactly on an emissive sphere) of the
    deterministic policy with a per-scene light prototype, against the
    cosine random walk, on scenes the trainer never saw (seeds 1000+,
    cycling the 8 templates).  This pins the provenance of the "1.9×
    held-out" number in STATUS.md / the shipped report.

    ``--type`` restricts to one template (held-out variations of that
    type only) and ``--model`` may be a distilled student — together they
    measure a per-type student against its teacher on the SAME episode
    metric and scenes."""
    _force_cpu(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer_tpu.compare.harness import _is_distilled
    from raytracer_tpu.fb.inference import (TrainedFBAgent,
                                            small_light_indices)
    from raytracer_tpu.fb.trainer import _CYCLE
    from raytracer_tpu.fb.trajectory import generate_trajectories
    from raytracer_tpu.scene import templates

    distilled = _is_distilled(args.model)
    if distilled:
        from raytracer_tpu.fb.config import FBConfig
        from raytracer_tpu.fb.distill import DistilledGuide
        student = DistilledGuide.load(args.model)
        guide_apply, guide_params = student.as_trajectory_guide()
        cfg = FBConfig()                     # max_bounces=8, episode budget
    else:
        from raytracer_tpu.fb.agent import FBResearchAgent
        cfg = _config_from_ckpt(args.model)
        agent = FBResearchAgent(cfg, seed=0)
        agent.load(args.model)
        guide_apply = agent.guide_apply
        guide_params = agent.params
    key = jax.random.key(args.seed)
    rows = []
    for i in range(args.scenes):
        stype = args.type or _CYCLE[i % len(_CYCLE)]
        scene, name = templates.generate_scene(stype, 1000 + i, pad_to=64)
        idx = small_light_indices(scene)
        if idx.size == 0:
            em = np.asarray(scene.emitive) > 0
            real = np.asarray(scene.radius) > 0
            idx = np.nonzero(em & real)[0]
        if distilled:
            proto = jnp.zeros((cfg.z_dim,), jnp.float32)     # unused
        else:
            ta = TrainedFBAgent(args.model, scene, idx, (0.0, 2.0, 0.0),
                                config=cfg)
            proto = jnp.asarray(ta.light_prototype)
        key, kp, kr = jax.random.split(key, 3)
        pol = generate_trajectories(
            scene, kp, num_walkers=args.episodes,
            max_steps=cfg.max_bounces, start_bias="small",
            guide_apply=guide_apply, guide_params=guide_params,
            guide_proto=proto, guide_prob=1.0, guide_noise=0.0)
        rnd = generate_trajectories(
            scene, kr, num_walkers=args.episodes,
            max_steps=cfg.max_bounces, start_bias="small")
        rows.append({
            "scene": name, "scene_type": stype.split("_")[0],
            "policy_hit_rate": float(np.asarray(pol.episode_hit).mean()),
            "random_hit_rate": float(np.asarray(rnd.episode_hit).mean()),
        })
        if (i + 1) % 20 == 0:
            print(f"[eval-multi] {i + 1}/{args.scenes} scenes", flush=True)
    p_all = float(np.mean([r["policy_hit_rate"] for r in rows]))
    r_all = float(np.mean([r["random_hit_rate"] for r in rows]))
    by_type = {}
    for r in rows:
        by_type.setdefault(r["scene_type"], []).append(
            (r["policy_hit_rate"], r["random_hit_rate"]))
    report = {
        "model": str(args.model),
        "num_scenes": args.scenes,
        "episodes_per_scene": args.episodes,
        "seed": args.seed,
        "policy_hit_rate": p_all,
        "random_hit_rate": r_all,
        "ratio": (p_all / r_all) if r_all > 0 else None,
        "by_type": {t: {"policy": float(np.mean([p for p, _ in v])),
                        "random": float(np.mean([r for _, r in v]))}
                    for t, v in by_type.items()},
    }
    out = args.out or "models/fb_multi_scene_held_out.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("policy_hit_rate", "random_hit_rate", "ratio")},
                     indent=2))
    print(f"wrote {out}")


def _scene_setup(which: str):
    """``chandelier`` / ``complex`` / any multi-scene template, optionally
    with a variation: ``cornell_box``, ``cornell_box:7``."""
    if which == "chandelier":
        from raytracer_tpu.scene.library import chandelier_scene
        scene, _, _, p = chandelier_scene()
        return scene, p["camera_position"]
    if which == "complex":
        from raytracer_tpu.scene.complex import (create_camera_for_scene,
                                                 create_complex_scene)
        scene, _, _ = create_complex_scene()
        return scene, create_camera_for_scene()
    from raytracer_tpu.scene.templates import TEMPLATES, generate_scene
    name, _, var = which.partition(":")
    if name not in TEMPLATES or (var and not var.isdigit()):
        raise SystemExit(f"unknown scene {which!r}; expected chandelier, "
                         f"complex, or one of {sorted(TEMPLATES)} with an "
                         f"optional integer variation (cornell_box:7)")
    scene, _ = generate_scene(name, int(var) if var else 0)
    # Template interiors all sit around (0, ~0.5-1, 4); the path camera
    # looks +z from the origin plane.
    return scene, (0.0, 0.5, 0.0)


def cmd_distill(args):
    _force_cpu(args)
    from raytracer_tpu.fb.distill import distill_agent
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices

    scene, cam = _scene_setup(args.scene)
    agent = TrainedFBAgent(args.teacher, scene, small_light_indices(scene),
                           cam)
    assert agent.loaded, f"teacher failed to load: {args.teacher}"
    guide, res = distill_agent(
        agent, scene, seed=args.seed, camera_position=cam,
        frames=args.frames, epochs=args.epochs,
        hidden=tuple(args.hidden), hit_weight_bonus=args.bonus,
        hindsight_sharpen=args.sharpen)
    guide.save(args.out)
    print(f"distilled {args.teacher} → {args.out}: "
          f"n_obs={res.n_obs:,} final_loss={res.final_loss:.2e} "
          f"hidden={tuple(args.hidden)} sharpen={args.sharpen}")


def cmd_distill_ensemble(args):
    """Outcome-selected ensemble distillation: one student imitating, per
    observation, whichever of several trained FB teachers measurably lands
    its action on a (small) light.  Closes the v4-vs-v2 aspect trade-off
    (STATUS.md): list the primary deployment teacher FIRST (tie-winner)."""
    _force_cpu(args)
    from raytracer_tpu.fb.distill import distill_ensemble
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices

    scene, cam = _scene_setup(args.scene)
    agents = []
    for path in args.teachers:
        a = TrainedFBAgent(path, scene, small_light_indices(scene), cam)
        assert a.loaded, f"teacher failed to load: {path}"
        agents.append(a)
    guide, res = distill_ensemble(
        agents, scene, seed=args.seed, camera_position=cam,
        frames=args.frames, epochs=args.epochs, hidden=tuple(args.hidden),
        hit_weight_bonus=args.bonus)
    guide.save(args.out)
    print(f"ensemble-distilled {len(agents)} teachers → {args.out}: "
          f"n_obs={res.n_obs:,} final_loss={res.final_loss:.2e} "
          f"hidden={tuple(args.hidden)}")


def cmd_eval(args):
    _force_cpu(args)
    from raytracer_tpu.compare.harness import (chandelier_comparison,
                                               complex_comparison,
                                               run_comparison)
    w, h = (int(x) for x in args.size.split("x"))
    if args.scene == "chandelier":
        fn = chandelier_comparison
    elif args.scene == "complex":
        fn = complex_comparison
    else:
        scene, cam = _scene_setup(args.scene)

        def fn(**kw):
            return run_comparison(scene, camera_position=cam,
                                  scene_name=args.scene.replace(":", "_v"),
                                  impl="fused", **kw)
    stats = fn(model_path=args.model, width=w, height=h,
               samples_per_pixel=args.spp, max_bounces=args.bounces,
               seed=args.seed, save_png=False,
               fb_samples_per_pixel=args.fb_spp,
               out_dir=args.out or "/tmp/_ship_eval")
    print(json.dumps({"traditional": stats["traditional"],
                      "fb": stats["fb"],
                      "comparison": stats["comparison"]}, indent=2))


def cmd_distill_episodes(args):
    """Episode-walk distillation (VERDICT r2 item 6): for open-geometry
    template types whose deployment metric is the held-out EPISODE eval
    (eval-multi), the camera-wavefront distillation pool never visits the
    surfaces episode walks traverse — measured on occluded_lights: the
    render-pool student collapses to 0.15× while its teacher scores 1.66×.
    Collect the pool FROM teacher-guided episode walks across training
    variations instead (the same distribution eval-multi measures),
    hindsight-sharpen per scene, pool, fit one student."""
    _force_cpu(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer_tpu.fb.agent import FBResearchAgent
    from raytracer_tpu.fb.distill import (DistilledGuide, distill,
                                          hindsight_aim_targets,
                                          light_hit_weights)
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices
    from raytracer_tpu.fb.trajectory import generate_trajectories
    from raytracer_tpu.scene import templates

    cfg = _config_from_ckpt(args.teacher)
    agent = FBResearchAgent(cfg, seed=0)
    agent.load(args.teacher)
    key = jax.random.key(args.seed)
    all_obs, all_tgt, all_w = [], [], []
    for i in range(args.scenes):
        # TRAINING variations (< 1000); eval-multi holds out 1000+.
        scene, _name = templates.generate_scene(args.type, i, pad_to=64)
        idx = small_light_indices(scene)
        if idx.size == 0:
            em = np.asarray(scene.emitive) > 0
            real = np.asarray(scene.radius) > 0
            idx = np.nonzero(em & real)[0]
        ta = TrainedFBAgent(args.teacher, scene, idx, (0.0, 2.0, 0.0),
                            config=cfg)
        proto = jnp.asarray(ta.light_prototype)
        key, kw = jax.random.split(key)
        batch = generate_trajectories(
            scene, kw, num_walkers=args.walkers, max_steps=cfg.max_bounces,
            start_bias="small", guide_apply=agent.guide_apply,
            guide_params=agent.params, guide_proto=proto, guide_prob=1.0,
            guide_noise=args.noise)
        valid = np.asarray(batch.valid).reshape(-1)
        obs = np.asarray(batch.obs).reshape(-1, 22)[valid]
        # Teacher targets: the DETERMINISTIC per-scene policy (the thing
        # eval-multi deploys), not the noisy exploration actions.
        tfn = ta.as_guide_fn(dtype=None)
        acts = np.clip(np.asarray(tfn(jnp.asarray(obs))), -1.0, 1.0)
        if args.sharpen:
            tgt, w = hindsight_aim_targets(scene, obs, acts,
                                           bonus=args.bonus)
        else:
            tgt = acts
            w = light_hit_weights(scene, obs, acts, bonus=args.bonus)
        all_obs.append(obs)
        all_tgt.append(tgt)
        all_w.append(w)
        if (i + 1) % 8 == 0:
            print(f"[distill-episodes] {i + 1}/{args.scenes} scenes, "
                  f"{sum(o.shape[0] for o in all_obs):,} obs", flush=True)
    obs = np.concatenate(all_obs)
    tgt = np.concatenate(all_tgt)
    w = np.concatenate(all_w)
    # Episode pools are small next to render pools (open-geometry walks
    # mostly escape after a step or two), so scale the batch down to keep
    # a useful optimiser step count.
    bs = min(args.batch_size, max(4096, obs.shape[0] // 8))
    res = distill(None, obs, seed=args.seed, hidden=tuple(args.hidden),
                  epochs=args.epochs, targets=tgt, weights=w,
                  batch_size=bs)
    guide = DistilledGuide(res.params, res.hidden)
    guide.save(args.out)
    print(f"episode-distilled {args.teacher} on {args.type} → {args.out}: "
          f"n_obs={res.n_obs:,} final_loss={res.final_loss:.2e} "
          f"hidden={tuple(args.hidden)} sharpen={args.sharpen}")


def cmd_heldout_chandelier(args):
    """Regenerate ``models/fb_chandelier_held_out.json`` for the SHIPPED
    pipeline, on the held-out chandelier variation 99 (the trainer never
    saw it — FB/train_chandelier_only.py:199-300 protocol):

    * the teacher's one-step surface probe (agent vs solid-angle random),
    * the deployed distilled student's one-step probe on the SAME keys,
    * a render-level comparison on the same held-out scene, and
    * the measured explanation of the one-step-vs-render divergence
      (STATUS.md v5 finding 1), recorded INSIDE the artifact so no shipped
      number contradicts the README without comment."""
    _force_cpu(args)
    import jax

    from raytracer_tpu.compare.harness import run_comparison
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.fb.trainer import ChandelierOnlyTrainer
    from raytracer_tpu.scene import templates

    cfg = _config_from_ckpt(args.teacher)
    tr = ChandelierOnlyTrainer(num_training_scenes=0, config=cfg,
                               output_dir="/tmp/_heldout_probe",
                               seed=args.seed)
    tr.agent.load(args.teacher)
    scene, _ = templates.generate_scene("chandelier_scene", 99,
                                        pad_to=tr.PAD_TO)
    tr._key = jax.random.key(args.seed + 99)
    teacher = tr.test_on_scene(scene, num_tests=args.tests)

    student = DistilledGuide.load(args.student)
    sfn = student.as_guide_fn(dtype=None)
    tr._key = jax.random.key(args.seed + 99)          # identical probe keys
    stud = tr.test_on_scene(scene, num_tests=args.tests, action_fn=sfn)

    # Render-level probe on the DEPLOYMENT scene (library chandelier, the
    # scene the student is registered for and showcased on).  The held-out
    # template variation 99 is the right stage for the surface probe but
    # not for a camera render: its jittered light cluster sits outside the
    # default camera frustum's reach and BOTH samplers record zero
    # small-light terminations there (measured: 0 light hits in 1.27M
    # traditional rays) — no signal either way.
    scene_r, cam = _scene_setup("chandelier")
    w, h = (int(x) for x in args.render_size.split("x"))
    rstats = run_comparison(
        scene_r, camera_position=cam, width=w, height=h,
        samples_per_pixel=args.render_spp, max_bounces=8,
        model_path=args.student, seed=args.render_seed, save_png=False,
        impl="fused", out_dir="/tmp/_heldout_render",
        scene_name="chandelier_heldout",
        traditional_mirror_threshold=0.0)

    report = {
        "protocol": {
            "held_out_scene": "chandelier_scene variation 99 "
                              "(training used variations < num_scenes)",
            "one_step_probe": "FB/train_chandelier_only.py:199-300 — "
                              "random surface point, one policy ray, hit "
                              "rate vs cosine random baseline",
            "render_probe": f"{w}x{h}@{args.render_spp}spp max_bounces=8 "
                            f"seed={args.render_seed} equal-spp comparison "
                            "(compare/harness.py) on the DEPLOYMENT scene "
                            "(see render_level.note)",
            "teacher": str(args.teacher),
            "student": str(args.student),
            "num_tests": args.tests,
        },
        "teacher_one_step": teacher,
        "student_one_step": stud,
        "render_level": {
            "note": "deployment (library) chandelier scene - the held-out "
                    "variation has no camera-reachable light signal for "
                    "either sampler (0 hits / 1.27M traditional rays)",
            "backend": "cpu probe; wall-clock speedup is only meaningful "
                       "on the TPU deployment artifacts listed below",
            "small_light_improvement":
                rstats["comparison"]["small_light_improvement"],
            "speedup": rstats["comparison"]["speedup"],
            "fb_success_rate": rstats["fb"].get("fb_success_rate"),
            "deployment_artifacts": [
                "showcase/chandelier_deployment_800x600/statistics.json",
                "showcase/chandelier_comparison_trained/statistics.json",
            ],
        },
        "explanation": (
            "One-step surface-probe hit rates and multi-bounce render "
            "improvement measure different skills and are expected to "
            "diverge (measured, STATUS.md v5 finding 1: distillation "
            "variants that RAISED one-step aimed-hit rates COLLAPSED "
            "rendered improvement).  The probe draws uniform random "
            "surface points and counts single-ray light hits; the render "
            "metric accumulates guided bounces along camera-reachable "
            "paths over 8 levels.  The deployment claim for this model "
            "family is the render-level one, pinned in tests/test_distill"
            ".py and tests/test_trained_models.py; the probe numbers are "
            "recorded here for protocol parity with the reference."),
    }
    out = args.out or "models/fb_chandelier_held_out.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in (("train-chandelier", cmd_train_chandelier),
                     ("train-complex", cmd_train_complex),
                     ("train-multi", cmd_train_multi)):
        c = sub.add_parser(name)
        c.add_argument("--scenes", type=int, default=160)
        c.add_argument("--steps", type=int, default=200)
        c.add_argument("--guide-prob", type=float, default=0.5)
        c.add_argument("--seed", type=int, default=0)
        c.add_argument("--out", default=None)
        c.add_argument("--workdir", default="/tmp/fb_ship_training")
        c.add_argument("--resume-from", default=None,
                       help="continue training from a saved checkpoint "
                            "(final or per-batch npz)")
        c.add_argument("--wall-schedule", type=float, nargs=3, default=None,
                       help="wall-start fraction per curriculum chunk "
                            "(train-chandelier only; default 0.35 0.35 "
                            "0.35, the shipped v4/v5 recipe)")
        c.add_argument("--tpu", action="store_true")
        c.add_argument("--z-dim", type=int, default=None)
        c.add_argument("--e-hidden", type=int, default=None)
        c.add_argument("--f-hidden", type=int, default=None)
        c.add_argument("--b-hidden", type=int, default=None)
        c.set_defaults(fn=fn)

    em = sub.add_parser("eval-multi")
    em.add_argument("--model", default="models/fb_multi_scene_trained.npz",
                    help="full agent .npz, or a distilled student")
    em.add_argument("--type", default=None,
                    help="restrict to one template type (e.g. cornell_box)")
    em.add_argument("--scenes", type=int, default=100)
    em.add_argument("--episodes", type=int, default=256)
    em.add_argument("--seed", type=int, default=0)
    em.add_argument("--out", default=None)
    em.add_argument("--tpu", action="store_true")
    em.set_defaults(fn=cmd_eval_multi)

    d = sub.add_parser("distill")
    d.add_argument("--scene", required=True,
                   help="chandelier, complex, or a template (cornell_box[:var])")
    d.add_argument("--teacher", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    d.add_argument("--frames", type=int, default=6)
    d.add_argument("--epochs", type=int, default=40)
    d.add_argument("--bonus", type=float, default=9.0)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--sharpen", action="store_true",
                   help="hindsight aim-sharpened targets (measured +22%% "
                        "rendered small-light improvement)")
    d.add_argument("--tpu", action="store_true")
    d.set_defaults(fn=cmd_distill)

    de = sub.add_parser("distill-ensemble")
    de.add_argument("--scene", required=True,
                    help="chandelier, complex, or a template (cornell_box[:var])")
    de.add_argument("--teachers", nargs="+", required=True,
                    help="teacher checkpoints; the FIRST wins ties")
    de.add_argument("--out", required=True)
    de.add_argument("--hidden", type=int, nargs="+", default=[128, 128])
    de.add_argument("--frames", type=int, default=6)
    de.add_argument("--epochs", type=int, default=40)
    de.add_argument("--bonus", type=float, default=9.0)
    de.add_argument("--seed", type=int, default=0)
    de.add_argument("--tpu", action="store_true")
    de.set_defaults(fn=cmd_distill_ensemble)

    dep = sub.add_parser("distill-episodes")
    dep.add_argument("--type", required=True,
                     help="template type, e.g. occluded_lights")
    dep.add_argument("--teacher",
                     default="models/fb_multi_scene_trained.npz")
    dep.add_argument("--out", required=True)
    dep.add_argument("--scenes", type=int, default=24)
    dep.add_argument("--walkers", type=int, default=8192)
    dep.add_argument("--batch-size", type=int, default=8192)
    dep.add_argument("--noise", type=float, default=0.05)
    dep.add_argument("--hidden", type=int, nargs="+", default=[128, 128])
    dep.add_argument("--epochs", type=int, default=40)
    dep.add_argument("--bonus", type=float, default=9.0)
    dep.add_argument("--seed", type=int, default=0)
    dep.add_argument("--sharpen", action="store_true")
    dep.add_argument("--tpu", action="store_true")
    dep.set_defaults(fn=cmd_distill_episodes)

    hc = sub.add_parser("heldout-chandelier")
    hc.add_argument("--teacher", default="models/fb_chandelier_trained.npz")
    hc.add_argument("--student", default="models/fb_chandelier_distilled.npz")
    hc.add_argument("--tests", type=int, default=500)
    hc.add_argument("--render-size", default="200x100")
    hc.add_argument("--render-spp", type=int, default=8)
    hc.add_argument("--render-seed", type=int, default=5)
    hc.add_argument("--seed", type=int, default=0)
    hc.add_argument("--out", default=None)
    hc.add_argument("--tpu", action="store_true")
    hc.set_defaults(fn=cmd_heldout_chandelier)

    e = sub.add_parser("eval")
    e.add_argument("--scene", required=True,
                   help="chandelier, complex, or a template (cornell_box[:var])")
    e.add_argument("--model", required=True)
    e.add_argument("--size", default="100x50")
    e.add_argument("--spp", type=int, default=4)
    e.add_argument("--fb-spp", type=int, default=None)
    e.add_argument("--bounces", type=int, default=8)
    e.add_argument("--seed", type=int, default=5)
    e.add_argument("--out", default=None)
    e.add_argument("--tpu", action="store_true")
    e.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
