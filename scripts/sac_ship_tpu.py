"""Ship a TPU-trained SAC policy (VERDICT r4 item 5 done-bar).

Trains SAC entirely on-device (SACTrainer.train_on_device: device-resident
ring replay buffer + fused rollout/update chunks) at the reference's
hyperparameters (RL/ray_tracer_rl_complete.py:108-126), evaluates with
EXACT light-hit counting vs random, and writes:

* models/sac_raytracer_tpu.npz            — TPU-trained checkpoint
* models/sac_raytracer_tpu_benchmark.json — RL vs random + hit z-score
* models/sac_tpu_train.json               — training record + matched
  CPU wall probe

The r3/r4 ``sac_raytracer.npz`` (host-loop CPU-trained, 0.322 vs 0.104)
stays shipped; this artifact demonstrates the on-device pattern reaching
a win of its own.

Usage: python scripts/sac_ship_tpu.py [--timesteps 400000]
"""
import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU_PROBE = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_complete
from raytracer_tpu.agents.sac import SACConfig, SACTrainer
scene, gl, pl = training_scene_complete()
env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                   max_bounces=8, global_lights=gl, point_lights=pl,
                   variant="rl")
tr = SACTrainer(env, SACConfig(), seed=0)
rec = tr.train_on_device(int(sys.argv[1]), iters_per_dispatch=8)
print(json.dumps({"backend": rec["backend"],
                  "wall_seconds": rec["wall_seconds"],
                  "total_steps": rec["total_steps"]}))
"""


def hit_z(p1, n1, p0, n0):
    p = (p1 * n1 + p0 * n0) / (n1 + n0)
    se = math.sqrt(max(p * (1 - p) * (1 / n1 + 1 / n0), 1e-12))
    return (p1 - p0) / se


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=400_000,
                    help="nominal env timesteps (active-step count is "
                         "lower; episodes die in ~1-3 bounces)")
    ap.add_argument("--eval-episodes", type=int, default=2048)
    ap.add_argument("--cpu-probe-steps", type=int, default=40_000)
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracer_tpu.env.raytracer_env import RayTracerEnv
    from raytracer_tpu.env.scenes import training_scene_complete
    from raytracer_tpu.agents.sac import SACConfig, SACTrainer
    from raytracer_tpu.compare.workbench import compare_rl_vs_random

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, gl, pl = training_scene_complete()
    env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                       max_bounces=8, global_lights=gl, point_lights=pl,
                       variant="rl")
    tr = SACTrainer(env, SACConfig(), seed=0)

    t0 = time.perf_counter()
    rec = tr.train_on_device(args.timesteps, iters_per_dispatch=8)
    wall = time.perf_counter() - t0
    print(f"trained: {rec['total_steps']} active steps, "
          f"{rec['dispatches']} dispatches, {wall:.1f}s wall, "
          f"ep_rew={rec['mean_episode_reward']:.3f}",
          file=sys.stderr, flush=True)

    tr.save("models/sac_raytracer_tpu.npz")
    policy = lambda obs: tr.predict(obs, deterministic=True)
    bench = compare_rl_vs_random(env, policy, episodes=args.eval_episodes,
                                 out_path=None)
    z = hit_z(bench["rl"]["light_hit_rate"], args.eval_episodes,
              bench["random"]["light_hit_rate"], args.eval_episodes)
    bench["light_hit_z"] = z
    with open("models/sac_raytracer_tpu_benchmark.json", "w") as f:
        json.dump(bench, f, indent=2, default=float)
    print(f"hit_rate rl={bench['rl']['light_hit_rate']:.4f} "
          f"random={bench['random']['light_hit_rate']:.4f} z={z:+.2f}",
          file=sys.stderr, flush=True)

    envv = dict(os.environ)
    envv["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    try:
        out = subprocess.run(
            [sys.executable, "-c", CPU_PROBE, str(args.cpu_probe_steps)],
            env=envv, cwd="/root/repo", capture_output=True, text=True,
            timeout=3600, check=True)
        cpu = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        cpu = {"error": repr(e)}

    report = {
        "config": {
            "recipe": "SACTrainer.train_on_device: device ring replay "
                      "buffer (validity-weighted slots) + fused "
                      "rollout/update chunks; reference hyperparameters "
                      "RL/ray_tracer_rl_complete.py:108-126",
            "nominal_timesteps": args.timesteps, "seed": 0,
            "env": "training_scene_complete 400x300 fov75 mb8 rl",
        },
        "tpu": {**{k: rec[k] for k in ("total_steps", "buffer_capacity",
                                       "dispatches", "wall_seconds",
                                       "mean_episode_reward",
                                       "critic_loss", "backend")},
                "eval": bench["rl"], "light_hit_z_vs_random": z},
        "cpu_probe": {**cpu, "nominal_timesteps": args.cpu_probe_steps},
    }
    with open("models/sac_tpu_train.json", "w") as f:
        json.dump(report, f, indent=1, default=float)
    print("wrote models/sac_raytracer_tpu.npz, "
          "sac_raytracer_tpu_benchmark.json, sac_tpu_train.json",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
