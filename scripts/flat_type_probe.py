"""VERDICT r3 item 9: resolve the two flat template types in the
multi-scene held-out eval (simple, chandelier at policy == random, 256
episodes/scene) — signal-absent or agent-failure?

Consumes the 1024-episode probe jsons produced by ship_models.py
eval-multi (see the recipe fields below) and writes the verdicts INTO
models/fb_multi_scene_held_out.json as a ``flat_type_probe`` section.
"""
import json
import math
import sys

ARTIFACT = "models/fb_multi_scene_held_out.json"


def hits(d):
    n = d["num_scenes"] * d["episodes_per_scene"]
    return (round(d["policy_hit_rate"] * n), round(d["random_hit_rate"] * n),
            n)


def two_prop_z(h1, h2, n):
    """z statistic for equal proportions, equal n (normal approx)."""
    p = (h1 + h2) / (2 * n)
    if p in (0.0, 1.0):
        return 0.0
    se = math.sqrt(2 * p * (1 - p) / n)
    return (h1 / n - h2 / n) / se


def main():
    simple = json.load(open("/tmp/probe_simple_teacher.json"))
    chand_t = json.load(open("/tmp/probe_chand_teacher.json"))
    chand_s = json.load(open("/tmp/probe_chand_student.json"))

    sp, sr, sn = hits(simple)
    ctp, ctr, ctn = hits(chand_t)
    csp, csr, csn = hits(chand_s)

    probe = {
        "recipe": ("ship_models.py eval-multi --type {simple_challenging,"
                   "chandelier_scene} --scenes 24 --episodes 1024 --seed 0"
                   " [--model models/fb_chandelier_distilled.npz]"),
        "simple": {
            "episodes": sn,
            "policy_hits": sp, "random_hits": sr,
            "policy_rate": simple["policy_hit_rate"],
            "random_rate": simple["random_hit_rate"],
            "z": round(two_prop_z(sp, sr, sn), 2),
            "verdict": (
                "signal-starved: the episode hit base rate is ~2e-4 — at "
                f"{sn:,} held-out episodes the policy scores {sp} hits vs "
                f"random {sr} (z={two_prop_z(sp, sr, sn):.1f}, not "
                "significant).  No deployable episode-level signal exists "
                "at measurable budgets; the 256-episode tie in by_type was "
                "the same fact at lower count."),
        },
        "chandelier": {
            "episodes": ctn,
            "generalist_hits": ctp, "random_hits": ctr,
            "generalist_rate": chand_t["policy_hit_rate"],
            "random_rate": chand_t["random_hit_rate"],
            "generalist_z": round(two_prop_z(ctp, ctr, ctn), 2),
            "specialist_model": "models/fb_chandelier_distilled.npz",
            "specialist_hits": csp,
            "specialist_rate": chand_s["policy_hit_rate"],
            "specialist_z": round(two_prop_z(csp, csr, csn), 2),
            "verdict": (
                "agent-failure, not signal-absence: at 1024 episodes/scene "
                f"the GENERALIST is significantly WORSE than random ({ctp} "
                f"vs {ctr} hits, ratio {chand_t['ratio']:.2f}, "
                f"z={two_prop_z(ctp, ctr, ctn):.1f}) while the chandelier "
                f"SPECIALIST student beats random ({csp} vs {csr}, ratio "
                f"{chand_s['ratio']:.2f}, z={two_prop_z(csp, csr, csn):.1f})"
                " on the same held-out scenes.  The 256-episode tie was "
                "count-noise hiding the negative; fb/registry.py already "
                "routes chandelier to the specialist, which this probe "
                "now evidences at the episode level."),
        },
    }

    art = json.load(open(ARTIFACT))
    art["flat_type_probe"] = probe
    with open(ARTIFACT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(probe, indent=1))
    print(f"updated {ARTIFACT}", file=sys.stderr)


if __name__ == "__main__":
    main()
