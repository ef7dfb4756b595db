"""Command-line interface — the reference's script entry points as
subcommands.

    python -m raytracer_tpu.cli render --scene true_original
    python -m raytracer_tpu.cli train-ppo --timesteps 50000
    python -m raytracer_tpu.cli train-sac --timesteps 50000
    python -m raytracer_tpu.cli train-q --episodes 1000
    python -m raytracer_tpu.cli train-fb [--quick] [--scenes N]
    python -m raytracer_tpu.cli train-fb-chandelier [--quick] [--scenes N]
    python -m raytracer_tpu.cli train-fb-complex [--quick] [--scenes N]
    python -m raytracer_tpu.cli compare-chandelier [--model PATH]
    python -m raytracer_tpu.cli compare-complex [--model PATH]
    python -m raytracer_tpu.cli experiment [--mode balanced_mode]
    python -m raytracer_tpu.cli rl-pipeline  (train→evaluate→benchmark)

Mirrors: the notebooks' render loop, RL/train_raytracer.py,
RL/simple_train.py, RL/ray_tracer_rl_complete.py's full pipeline,
FB/train_*.py's --quick/--scenes argparse (FB/train_chandelier_only.py:
330-343), and the comparison mains.
"""
from __future__ import annotations

import argparse
import json
import time


def cmd_render(args):
    import jax
    import numpy as np
    from .render.camera import grid_rays, perspective_rays
    from .render.renderer import render_whitted
    from .scene import library

    fn = {"true_original": library.true_original_scene,
          "planets2": library.planets2_scene,
          "marbles4": library.marbles4_scene,
          "chandelier": library.chandelier_scene,
          "custom": library.custom_scene}[args.scene]
    scene, gl, pl, p = fn()
    if "ray_count" in p:
        origins, dirs, h, w = grid_rays(p["ray_count"], p["ray_step"],
                                        args.multiple or p.get("multiple", 1),
                                        origin=p["camera_position"])
    else:
        w, h = args.width, args.height
        origins, dirs = perspective_rays(w, h, fov=p.get("fov", 60),
                                         origin=p["camera_position"],
                                         variant="fb")
    t0 = time.time()
    img = render_whitted(scene, gl, pl, origins, dirs, h, w,
                         max_bounces=p["max_bounces"],
                         background=p["background"],
                         miss_colour=p.get("sky_colour"), mode="unit")
    img.block_until_ready()
    dt = time.time() - t0
    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    from .utils.io import save_image
    save_image(args.out, arr)
    print(f"rendered {w}x{h} in {dt:.2f}s → {args.out} "
          f"({h * w / dt / 1e6:.2f} Mrays/s)")


def cmd_animate(args):
    """Turntable animation: F look-at frames rendered in ONE device
    dispatch (render/animation.py) — the serving-path showcase.  Writes
    frame_%03d.png (+ a contact sheet) and a stats JSON."""
    import os

    import numpy as np
    from .render.animation import (camera_path_rays, orbit_eyes,
                                   render_whitted_frames, scene_focus)
    from .scene import library
    from .utils.io import save_apng, save_image

    names = {"true_original": library.true_original_scene,
             "planets2": library.planets2_scene,
             "marbles4": library.marbles4_scene,
             "chandelier": library.chandelier_scene,
             "custom": library.custom_scene}
    if args.scene in names:
        scene, gl, pl, p = names[args.scene]()
    else:
        # Multi-scene templates (cornell_box[:var]) — emissive-sphere-lit
        # path-tracer scenes with no global/point lights, so only the
        # path tracer applies; the registry routes per-type students.
        from .scene.templates import TEMPLATES, generate_scene
        tname, _, var = args.scene.partition(":")
        if tname not in TEMPLATES or (var and not var.isdigit()):
            raise SystemExit(
                f"unknown scene {args.scene!r}; expected one of "
                f"{sorted(names)} or a template {sorted(TEMPLATES)} "
                f"with an optional integer variation (cornell_box:7)")
        if args.tracer != "path":
            raise SystemExit(f"template scene {args.scene!r} has no "
                             f"global/point lights; use --tracer path")
        scene, _ = generate_scene(tname, int(var) if var else 0)
        gl = pl = None
        p = {"camera_position": (0.0, 0.5, 0.0), "max_bounces": 8,
             "background": (2.0, 2.0, 5.0)}
    target = (np.asarray(args.target, float) if args.target
              else scene_focus(scene))
    cam = np.asarray(p["camera_position"], float)
    radius = (args.radius if args.radius is not None
              else float(np.hypot(*(cam - target)[[0, 2]])) or 3.0)
    y = args.y if args.y is not None else float(cam[1])
    eyes = orbit_eyes(target, radius, y, args.frames, sweep=args.sweep)
    origins, dirs = camera_path_rays(eyes, target, args.width, args.height,
                                     fov=args.fov)

    bounces = args.bounces or p["max_bounces"]
    extra = {}
    if args.tracer == "path":
        import jax

        from .render.animation import render_path_frames
        guide_fn = None
        if args.guide == "registry":
            from .fb.registry import guide_for
            guide_fn = guide_for(args.scene, args.width, args.height)
        elif args.guide:
            from .fb.distill import DistilledGuide
            guide_fn = DistilledGuide.load(args.guide).as_guide_fn()
        t0 = time.time()
        frames, stats = render_path_frames(
            scene, jax.random.key(args.seed), eyes, target,
            width=args.width, height=args.height, spp=args.spp,
            max_bounces=bounces, fov=args.fov,
            background=p.get("background", (2.0, 2.0, 5.0)),
            guide_fn=guide_fn, fb_prob=1.0)
        frames.block_until_ready()
        dt = time.time() - t0
        extra = {"tracer": "path", "spp": args.spp,
                 "guided": bool(guide_fn),
                 "total_rays": int(stats.total_rays),
                 "light_hits": int(stats.light_hits),
                 "small_light_hits": int(stats.small_light_hits),
                 "fb_used": int(stats.fb_used),
                 "fb_success": int(stats.fb_success)}
    else:
        t0 = time.time()
        frames = render_whitted_frames(scene, gl, pl, origins, dirs,
                                       args.height, args.width,
                                       max_bounces=bounces,
                                       background=p["background"],
                                       miss_colour=p.get("sky_colour"))
        frames.block_until_ready()
        dt = time.time() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    arr = (np.clip(np.asarray(frames), 0, 1) * 255).astype(np.uint8)
    for i in range(arr.shape[0]):
        save_image(os.path.join(args.out_dir, f"frame_{i:03d}.png"), arr[i])
    cols = min(args.frames, 6)
    rows = -(-args.frames // cols)
    sheet = np.zeros((rows * args.height, cols * args.width, 3), np.uint8)
    for i in range(arr.shape[0]):
        r, c = divmod(i, cols)
        sheet[r * args.height:(r + 1) * args.height,
              c * args.width:(c + 1) * args.width] = arr[i]
    save_image(os.path.join(args.out_dir, "contact_sheet.png"), sheet)
    save_apng(os.path.join(args.out_dir, "animation.png"), arr, fps=args.fps)
    # Path tracer: count the rays actually traced (spp samples + bounce
    # extensions, from PathStats); Whitted: primary rays (bounces are
    # folded into the fused trace, matching the single-frame renderer).
    rays = extra.get("total_rays") or args.frames * args.width * args.height
    stats = {"frames": args.frames, "width": args.width,
             "height": args.height, "bounces": bounces,
             "wall_s": round(dt, 4), "ms_per_frame": round(dt * 1e3 / args.frames, 3),
             "mrays_per_s": round(rays / dt / 1e6, 2),
             "target": [round(float(v), 4) for v in np.asarray(target)],
             "radius": round(radius, 4), "y": round(y, 4), **extra}
    with open(os.path.join(args.out_dir, "animation_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


def _make_rl_env(variant="rl", max_bounces=5):
    from .env.raytracer_env import RayTracerEnv
    from .env.scenes import training_scene_v1
    scene, gl, pl = training_scene_v1()
    return RayTracerEnv(scene, image_width=800, image_height=600, fov=90,
                        max_bounces=max_bounces, global_lights=gl,
                        point_lights=pl, variant=variant)


def cmd_train_ppo(args):
    from .agents.ppo import PPOConfig, PPOTrainer
    env = _make_rl_env()
    tr = PPOTrainer(env, PPOConfig(learning_rate=args.lr,
                                   tensorboard_log=args.tensorboard_log),
                    seed=args.seed)
    out = tr.train(args.timesteps)
    print(json.dumps(out))
    tr.save(args.out)
    print(f"saved → {args.out}")
    if getattr(args, "analyze", False):
        _post_training_analysis(env, tr, "ppo_analysis")


def cmd_train_sac(args):
    from .agents.sac import SACConfig, SACTrainer
    env = _make_rl_env()
    tr = SACTrainer(env, SACConfig(learning_rate=args.lr,
                                   tensorboard_log=args.tensorboard_log),
                    seed=args.seed)
    out = tr.train(args.timesteps)
    print(json.dumps(out))
    tr.save(args.out)
    print(f"saved → {args.out}")
    if getattr(args, "analyze", False):
        _post_training_analysis(env, tr, "sac_analysis")


def _post_training_analysis(env, trainer, prefix):
    """Behavior analytics + 6-panel figure + CSV, the train_raytracer_improved
    post-training flow (RL/train_raytracer_improved.py:349-507)."""
    import numpy as np
    from .agents.analytics import (advanced_analysis_png,
                                   analyze_agent_behavior)
    from .utils.metrics import write_csv
    policy = lambda obs: trainer.predict(obs, deterministic=True)
    behavior = analyze_agent_behavior(env, policy, episodes=200)
    print(json.dumps(behavior, indent=2, default=str))
    advanced_analysis_png(behavior, trainer.episode_rewards,
                          f"{prefix}.png")
    write_csv(f"{prefix}.csv",
              [{"metric": k, "value": json.dumps(v, default=str)}
               for k, v in behavior.items()])
    print(f"analysis → {prefix}.png / {prefix}.csv")


def cmd_train_q(args):
    from .agents.tabular_q import TabularQConfig, TabularQTrainer
    env = _make_rl_env(max_bounces=5)
    tr = TabularQTrainer(env, TabularQConfig(), seed=args.seed)
    hist = tr.train(num_episodes=args.episodes)
    print(f"episodes={len(hist)} avg_reward_last_100="
          f"{sum(hist[-100:]) / max(1, len(hist[-100:])):.3f} "
          f"test={tr.test():.3f}")


def _fb_args(args):
    if args.quick:
        return 10, 50
    return args.scenes, 150


def cmd_train_fb(args, trainer_cls=None):
    from .fb.trainer import (ChandelierOnlyTrainer, MultiSceneFBTrainer,
                             RayTracedComplexTrainer)
    cls = {None: MultiSceneFBTrainer,
           "chandelier": ChandelierOnlyTrainer,
           "complex": RayTracedComplexTrainer}[trainer_cls]
    scenes, steps = _fb_args(args)
    tr = cls(num_training_scenes=scenes)
    if getattr(args, "probe_every", None):
        tr.probe_every = args.probe_every
    report = tr.run_training(num_scenes=scenes, scenes_per_batch=20,
                             training_steps_per_scene=steps)
    hist = report["training_summary"].get("render_probe_history")
    if hist:
        print(f"render probe: best improvement "
              f"{max(h['improvement'] for h in hist):.2f}x "
              f"(best_render_probe.npz)")
    if trainer_cls == "chandelier":
        tr.test_on_chandelier(num_tests=200)
    else:
        tr.test_on_complex(num_tests=200)
    print(f"avg hit rate: "
          f"{report['performance_statistics']['avg_hit_rate']:.3f}")
    print(f"outputs → {tr.output_dir}")


def cmd_compare(args, which):
    from .compare.harness import chandelier_comparison, complex_comparison
    fn = chandelier_comparison if which == "chandelier" else complex_comparison
    kw = {}
    if args.spp_chunk:
        kw = dict(spp_chunk=args.spp_chunk, impl="fused")
    stats = fn(model_path=args.model, width=args.width, height=args.height,
               samples_per_pixel=args.spp, max_bounces=args.bounces,
               fb_samples_per_pixel=args.fb_spp, out_dir=args.out,
               timing_iters=args.timing_iters, **kw)
    print(json.dumps(stats["comparison"], indent=2))


def cmd_experiment(args):
    from .compare.experiment import CustomSceneExperiment
    exp = CustomSceneExperiment(mode=args.mode)
    out = exp.run_custom_scene_experiment()
    print(f"results → {out}")


def cmd_demo(args):
    """Scripted episode walk-through — the textual equivalent of the
    reference's interactive demos (RL/train_raytracer.py:232-297,
    RL/use_trained_model.py:240-337)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    env = _make_rl_env()
    state, obs = env.reset(jax.random.key(args.seed), batch=1)
    print(f"pixel={tuple(np.asarray(state.pixel[0]))} "
          f"hit={bool(np.asarray(state.hit)[0])}")
    rng = np.random.default_rng(args.seed)
    for step in range(env.max_bounces + 1):
        a = jnp.asarray([[rng.uniform(0, np.pi / 2),
                          rng.uniform(0, 2 * np.pi)]], jnp.float32)
        state, obs, r, term, info = env.step(state, a)
        print(f"step {step}: action=({float(a[0,0]):.2f},{float(a[0,1]):.2f})"
              f" reward={float(r[0]):+.3f} bounce={int(info['bounce'][0])}"
              f" done={bool(term[0])}")
        if bool(term[0]):
            break
    print(f"total reward: {float(np.asarray(state.total_reward)[0]):+.3f}")


INTEGRATION_EXAMPLE = '''\
# Integration: trained policy as a sampling guide inside a renderer
# (the TPU-native form of RL/ray_tracer_rl_complete.py:268-426's template).
import jax
from raytracer_tpu.compare.workbench import load_policy
from raytracer_tpu.compare.rl_renderer import RayTracerRL
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_complete

scene, gl, pl = training_scene_complete()
env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                   max_bounces=8, global_lights=gl, point_lights=pl)
policy = load_policy("raytracer_sac_model.pkl", env)   # or an SB3 .zip via
                                                       # utils/sb3_import.py
renderer = RayTracerRL(model_path="raytracer_sac_model.pkl")
renderer.render_comparison(width=200, height=150)

# FB guides plug into the path tracer the same way:
#   render_path(scene, key, ..., guide_fn=guide, fb_prob=1.0)
# with guide = fb.registry.guide_for(scene_name, width, height).
# Full walk-through: docs/INTEGRATION.md.
'''


def cmd_interactive(args, input_fn=input):
    """The reference's ``input()`` menu flows as one subcommand
    (RL/ray_tracer_rl_complete.py:498-545 options menu;
    RL/train_raytracer_improved.py:349-412 training-mode menu).  Invalid or
    EOF input falls back to option 1, as in the reference."""
    from .agents.sac import SACConfig, SACTrainer
    from .compare.workbench import (check_model_exists, compare_rl_vs_random,
                                    evaluate_policy, load_policy)

    def ask(prompt, default):
        try:
            return input_fn(prompt) or default
        except Exception:
            return default

    print("=" * 80)
    print("RAY TRACING REINFORCEMENT LEARNING - COMPLETE SOLUTION")
    print("=" * 80)
    print("\nOptions:")
    print("1. Train a new model")
    print("2. Evaluate existing model")
    print("3. Demonstrate model behavior")
    print("4. Show integration example")
    print("5. Run performance benchmark (RL vs random)")
    print("6. Full pipeline (train -> evaluate -> benchmark)")
    try:
        choice = int(ask("\nSelect option (1-6): ", "1"))
    except Exception:
        choice = 1

    if choice == 1:
        # The improved-training sub-menu (train_raytracer_improved.py:355-364)
        print("\nTraining Modes:")
        print("1. Standard training (faster)")
        print("2. Curriculum learning (better results, slower)")
        print("3. Continue from saved model")
        try:
            mode = int(ask("\nSelect mode (1-3): ", "1"))
        except Exception:
            mode = 1
        timesteps = int(ask("Training timesteps (e.g., 20000): ", "20000"))
        name = ask("Model name (e.g., raytracer_sac): ", "raytracer_sac")
        if mode == 2:
            from .agents.adaptive import train_with_curriculum
            from .env.raytracer_env import RayTracerEnv
            from .env.scenes import dynamic_scene

            def phase_env(phase):
                scene, gl, pl = dynamic_scene(phase)
                return RayTracerEnv(scene, image_width=800, image_height=600,
                                    fov=90, max_bounces=5, global_lights=gl,
                                    point_lights=pl)

            t3 = max(1, timesteps // 3)
            tr, _ = train_with_curriculum(phase_env, SACTrainer,
                                          steps_per_phase=(t3, t3, t3),
                                          seed=args.seed)
            env = tr.env
        else:
            env = _make_rl_env()
            tr = SACTrainer(env, SACConfig(), seed=args.seed)
            if mode == 3:
                path = check_model_exists(name)
                if path is not None:
                    tr.load(str(path))
                    print(f"Loaded existing model: {path}")
                else:
                    print("No saved model found, starting fresh")
            print(json.dumps(tr.train(timesteps)))
        tr.save(f"{name}.pkl")
        policy = lambda obs: tr.predict(obs, deterministic=True)
        print(json.dumps(evaluate_policy(env, policy, episodes=20)))
    elif choice == 2:
        name = ask("Model name (without .zip): ", "raytracer_sac_model")
        env = _make_rl_env()
        path = check_model_exists(name)
        if path is None:
            print(f"Model '{name}' not found")
            return
        policy = load_policy(str(path), env)
        print(json.dumps(evaluate_policy(env, policy, episodes=20)))
    elif choice == 3:
        cmd_demo(args)
    elif choice == 4:
        print("\n" + "=" * 80)
        print("INTEGRATION EXAMPLE")
        print("=" * 80)
        print(INTEGRATION_EXAMPLE)
    elif choice == 5:
        env = _make_rl_env()
        name = ask("Model name (blank = random policy): ", "")
        path = check_model_exists(name) if name else None
        if path is not None:
            policy = load_policy(str(path), env)
        else:
            # reference-style graceful fallback: uniform-random policy
            import numpy as np
            rng = np.random.default_rng(args.seed)
            policy = lambda obs: rng.uniform(
                [0.0, 0.0], [np.pi / 2, 2 * np.pi], size=(obs.shape[0], 2))
        print(json.dumps(compare_rl_vs_random(env, policy, episodes=50),
                         indent=2))
    else:
        args.timesteps = int(ask("Training timesteps (e.g., 20000): ",
                                 "20000"))
        args.out = "raytracer_final.pkl"
        cmd_rl_pipeline(args)


def cmd_rl_pipeline(args):
    """The full pipeline of RL/ray_tracer_rl_complete.py: train → evaluate →
    benchmark RL vs random.  ``--algo ppo`` trains fully on-device
    (PPOTrainer.train_on_device: rollout scan + update fused per dispatch
    chunk — the TPU-native training loop); SAC keeps its host replay
    buffer, the reference-faithful off-policy configuration."""
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from .compare.workbench import compare_rl_vs_random, evaluate_policy
    from .env.raytracer_env import RayTracerEnv
    from .env.scenes import training_scene_complete

    scene, gl, pl = training_scene_complete()
    env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                       max_bounces=8, global_lights=gl, point_lights=pl,
                       variant="rl")
    algo = getattr(args, "algo", "sac")
    if algo == "ppo":
        from .agents.ppo import PPOConfig, PPOTrainer
        tr = PPOTrainer(env, PPOConfig(tensorboard_log=getattr(
            args, "tensorboard_log", None)), seed=args.seed)
        print("training (on-device PPO)...")
        print(json.dumps(tr.train_on_device(args.timesteps)))
    else:
        from .agents.sac import SACConfig, SACTrainer
        tr = SACTrainer(env, SACConfig(learning_starts=min(1000,
                                                           args.timesteps // 4),
                                       tensorboard_log=getattr(
                                           args, "tensorboard_log", None)),
                        seed=args.seed)
        print("training...")
        print(json.dumps(tr.train(args.timesteps)))
    tr.save(args.out)
    print("evaluating...")
    policy = lambda obs: tr.predict(obs, deterministic=True)
    print(json.dumps(evaluate_policy(env, policy, episodes=50)))
    print("benchmark vs random...")
    from pathlib import Path
    bench_out = str(Path(args.out).with_suffix("")) + "_benchmark.json"
    print(json.dumps(compare_rl_vs_random(env, policy, episodes=100,
                                          out_path=bench_out),
                     indent=2))
    print(f"wrote {bench_out}")


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first-ever compiles of the traced
    render programs take minutes through the axon remote-compile relay;
    cached reruns start in seconds (same policy as bench.py)."""
    import os

    import jax
    cache = os.environ.get("RAYTRACER_TPU_COMP_CACHE",
                           os.path.expanduser("~/.cache/jax_comp"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compilation_cache()
    p = argparse.ArgumentParser(prog="raytracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render")
    r.add_argument("--scene", default="true_original",
                   choices=["true_original", "planets2", "marbles4",
                            "chandelier", "custom"])
    r.add_argument("--out", default="render_output.png")
    r.add_argument("--width", type=int, default=800)
    r.add_argument("--height", type=int, default=600)
    r.add_argument("--multiple", type=int, default=None)
    r.set_defaults(fn=cmd_render)

    an = sub.add_parser("animate", help="orbit animation, all frames in "
                                        "one device dispatch")
    an.add_argument("--scene", default="chandelier",
                    help="library scene (true_original/planets2/marbles4/"
                         "chandelier/custom) or, with --tracer path, a "
                         "multi-scene template (cornell_box[:var])")
    an.add_argument("--frames", type=int, default=12)
    an.add_argument("--width", type=int, default=320)
    an.add_argument("--height", type=int, default=240)
    an.add_argument("--fov", type=float, default=60.0)
    an.add_argument("--fps", type=float, default=10.0,
                    help="APNG playback rate")
    an.add_argument("--tracer", default="whitted",
                    choices=["whitted", "path"])
    an.add_argument("--spp", type=int, default=4,
                    help="path tracer samples per pixel")
    an.add_argument("--guide", default=None,
                    help="path tracer FB guide: a student .npz, or "
                         "'registry' for per-camera dispatch")
    an.add_argument("--seed", type=int, default=0)
    an.add_argument("--bounces", type=int, default=None)
    an.add_argument("--radius", type=float, default=None,
                    help="orbit radius (default: camera↔target distance)")
    an.add_argument("--y", type=float, default=None,
                    help="camera height (default: the scene camera's y)")
    an.add_argument("--sweep", type=float, default=6.283185307179586,
                    help="arc in radians (default full turn)")
    an.add_argument("--target", type=float, nargs=3, default=None)
    an.add_argument("--out-dir", default="animation_out")
    an.set_defaults(fn=cmd_animate)

    for name, fn in [("train-ppo", cmd_train_ppo), ("train-sac", cmd_train_sac)]:
        t = sub.add_parser(name)
        t.add_argument("--timesteps", type=int, default=50_000)
        t.add_argument("--lr", type=float, default=3e-4)
        t.add_argument("--seed", type=int, default=0)
        t.add_argument("--out", default=f"{name.replace('-', '_')}_model.pkl")
        t.add_argument("--analyze", action="store_true")
        t.add_argument("--tensorboard-log", default=None,
                       help="write SB3-style TensorBoard events under "
                            "this dir (e.g. ./raytracer_ppo_tensorboard/)")
        t.set_defaults(fn=fn)

    q = sub.add_parser("train-q")
    q.add_argument("--episodes", type=int, default=1000)
    q.add_argument("--seed", type=int, default=0)
    q.set_defaults(fn=cmd_train_q)

    for name, which in [("train-fb", None),
                        ("train-fb-chandelier", "chandelier"),
                        ("train-fb-complex", "complex")]:
        t = sub.add_parser(name)
        t.add_argument("--quick", action="store_true")
        t.add_argument("--scenes", type=int, default=100)
        t.add_argument("--probe-every", type=int, default=None,
                       help="run the render-level probe every N scenes and "
                            "snapshot best_render_probe.npz (render-level "
                            "checkpoint selection)")
        t.set_defaults(fn=lambda a, w=which: cmd_train_fb(a, w))

    for name in ("compare-chandelier", "compare-complex"):
        c = sub.add_parser(name)
        c.add_argument("--model", default=None)
        c.add_argument("--width", type=int, default=200)
        c.add_argument("--height", type=int, default=100)
        c.add_argument("--spp", type=int, default=8)
        c.add_argument("--bounces", type=int, default=8)
        c.add_argument("--fb-spp", type=int, default=None,
                       help="matched-signal mode: FB samples per pixel")
        c.add_argument("--spp-chunk", type=int, default=None,
                       help="bounded-memory high-spp accumulation chunk "
                            "(switches to the fused tracer)")
        c.add_argument("--out", default=None, help="output directory")
        c.add_argument("--timing-iters", type=int, default=1,
                       help="best-of-N wall-clock (TPU relay variance)")
        c.set_defaults(fn=lambda a, w=name.split("-")[1]: cmd_compare(a, w))

    e = sub.add_parser("experiment")
    e.add_argument("--mode", default="balanced_mode",
                   choices=["fast_mode", "balanced_mode", "quality_mode"])
    e.set_defaults(fn=cmd_experiment)

    dm = sub.add_parser("demo")
    dm.add_argument("--seed", type=int, default=0)
    dm.set_defaults(fn=cmd_demo)

    it = sub.add_parser("interactive")
    it.add_argument("--seed", type=int, default=0)
    it.set_defaults(fn=cmd_interactive)

    rp = sub.add_parser("rl-pipeline")
    rp.add_argument("--algo", default="sac", choices=["sac", "ppo"],
                    help="ppo trains fully on-device (fused rollout+update "
                         "chunks); sac keeps the host replay buffer")
    rp.add_argument("--timesteps", type=int, default=20_000)
    rp.add_argument("--seed", type=int, default=0)
    rp.add_argument("--out", default="raytracer_final.pkl")
    rp.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (training steps the env one "
                         "small dispatch at a time — the tunneled TPU's "
                         "per-dispatch floor dominates there; inference/"
                         "rendering still belongs on TPU)")
    rp.add_argument("--tensorboard-log", default=None)
    rp.set_defaults(fn=cmd_rl_pipeline)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
