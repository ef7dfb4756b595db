"""VERDICT r3 item 3: demonstrate RL training ON the TPU.

Trains the on-device PPO (rollout `lax.scan` + update fused per dispatch
chunk, no host replay buffer) twice with the same seed/timesteps — once
on the TPU backend, once forced-CPU — then evaluates both policies with
EXACT light-hit counting and writes:

* ``models/ppo_raytracer.npz``          — the TPU-trained checkpoint
* ``models/ppo_raytracer_benchmark.json`` — RL vs random (TPU policy)
* ``models/ppo_tpu_train.json``         — wall-clock + eval comparison

Usage: python scripts/ppo_tpu_artifact.py [--timesteps 20000]
(runs each backend in a subprocess so the jax platform choice is clean).
"""
import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys
backend = sys.argv[1]
timesteps = int(sys.argv[2])
out_path = sys.argv[3]
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
import os
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer_tpu.env.raytracer_env import RayTracerEnv
from raytracer_tpu.env.scenes import training_scene_complete
from raytracer_tpu.agents.ppo import PPOConfig, PPOTrainer
from raytracer_tpu.compare.workbench import compare_rl_vs_random, \
    evaluate_policy

scene, gl, pl = training_scene_complete()
env = RayTracerEnv(scene, image_width=400, image_height=300, fov=75,
                   max_bounces=8, global_lights=gl, point_lights=pl,
                   variant="rl")
tr = PPOTrainer(env, PPOConfig(), seed=0)
train = tr.train_on_device(timesteps)
policy = lambda obs: tr.predict(obs, deterministic=True)
ev = evaluate_policy(env, policy, episodes=128)
res = {"train": train, "eval": ev}
if backend == "tpu":
    tr.save("models/ppo_raytracer.npz")
    res["checkpoint"] = "models/ppo_raytracer.npz"
    res["benchmark"] = compare_rl_vs_random(
        env, policy, episodes=256,
        out_path="models/ppo_raytracer_benchmark.json")
with open(out_path, "w") as f:
    json.dump(res, f, indent=1, default=float)
print(json.dumps({"backend": train["backend"],
                  "wall_seconds": train["wall_seconds"],
                  "dispatches": train["dispatches"]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=20000)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    results = {}
    for backend in (["tpu"] if args.skip_cpu else ["tpu", "cpu"]):
        out = f"/tmp/ppo_train_{backend}.json"
        print(f"=== training on {backend} ===", flush=True)
        subprocess.run([sys.executable, "-c", WORKER, backend,
                        str(args.timesteps), out], check=True, env=env,
                       cwd="/root/repo")
        results[backend] = json.load(open(out))

    report = {
        "config": {"timesteps": args.timesteps, "seed": 0,
                   "env": "training_scene_complete 400x300 fov75 mb8 rl",
                   "trainer": "PPOTrainer.train_on_device "
                              "(fused rollout-scan + update chunks)"},
    }
    for b, r in results.items():
        report[b] = {
            "wall_seconds": r["train"]["wall_seconds"],
            "dispatches": r["train"]["dispatches"],
            "timesteps": r["train"]["timesteps"],
            "steps_per_sec": r["train"]["timesteps"]
            / max(r["train"]["wall_seconds"], 1e-9),
            "mean_episode_reward": r["train"]["mean_episode_reward"],
            "eval": r["eval"],
        }
    if "tpu" in results and "cpu" in results:
        report["tpu_vs_cpu_wall_ratio"] = (
            results["cpu"]["train"]["wall_seconds"]
            / results["tpu"]["train"]["wall_seconds"])
    with open("models/ppo_tpu_train.json", "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps(report, indent=1, default=float))
    print("wrote models/ppo_tpu_train.json")


if __name__ == "__main__":
    main()
