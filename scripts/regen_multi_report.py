"""Regenerate models/fb_multi_scene_training_report.json with MEASURED
agent_stats (VERDICT r4 item 4): the shipped artifact predates the
FBResearchAgent.get_stats hooks and still carries structural zeros.

Reproduces the shipping recipe exactly (commit 485cb31: train-multi
--scenes 100 --steps 150, seed 0, guide-prob curriculum 0.0/0.25/0.5) with
``probe_every=20`` added — render probes use their own fixed jax keys and
only *record* scores (fb/trainer.py render_probe), so the training RNG
stream and therefore the final weights are unchanged; this script ASSERTS
the retrained params match the shipped ``fb_multi_scene_trained.npz``
bit-for-bit before writing the report, so report and model stay one
artifact family.

Usage: python scripts/regen_multi_report.py [--no-write]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument("--workdir", default="/tmp/regen_multi")
    args = ap.parse_args()

    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.trainer import MultiSceneFBTrainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tr = MultiSceneFBTrainer(num_training_scenes=100, seed=0,
                             output_dir=args.workdir, guide_prob=0.0,
                             config=FBConfig())
    tr.probe_every = 20
    report = None
    for n, gp in ((25, 0.0), (25, 0.25), (50, 0.5)):
        tr.guide_prob = gp
        report = tr.run_training(num_scenes=n, scenes_per_batch=20,
                                 training_steps_per_scene=150)
        print(f"+{n} scenes (guide_prob={gp})", flush=True)

    st = report["training_summary"]["agent_stats"]
    print(json.dumps(st, indent=1))

    # Weight identity vs the shipped model: the report must describe the
    # model that actually ships.
    tmp = os.path.join(args.workdir, "model.npz")
    tr.agent.save(tmp)
    shipped = os.path.join(repo, "models", "fb_multi_scene_trained.npz")
    a = np.load(tmp, allow_pickle=False)
    b = np.load(shipped, allow_pickle=False)
    same = set(a.files) == set(b.files) and all(
        np.array_equal(a[k], b[k]) for k in a.files if k != "__meta__")
    print(f"weights identical to shipped: {same}")

    ok = (st["adaptability"]["num_scenes_encountered"] == 100
          and st["performance"]["avg_variance_reduction"] != 0
          and st["generalization"]["avg_generalization_score"] != 0)
    print(f"measured-stats checks pass: {ok}")
    if args.no_write:
        return
    if not same:
        print("NOT writing report: weights diverged from the shipped model "
              "— the regenerated stats would describe a different agent. "
              "Ship model+report together or investigate.")
        sys.exit(1)
    out = os.path.join(repo, "models", "fb_multi_scene_training_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
