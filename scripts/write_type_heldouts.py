"""VERDICT r3 item 6: write the held-out artifacts for the three template
types that had no routing decision (mirror_maze, glass_gallery,
simple_challenging), from the eval-multi jsons in /tmp.
"""
import json
import math


def z(d):
    n = d["num_scenes"] * d["episodes_per_scene"]
    h1 = round(d["policy_hit_rate"] * n)
    h2 = round(d["random_hit_rate"] * n)
    p = (h1 + h2) / (2 * n)
    if p in (0.0, 1.0):
        return 0.0, h1, h2
    se = math.sqrt(2 * p * (1 - p) / n)
    return (h1 / n - h2 / n) / se, h1, h2


def block(d, model):
    zz, h1, h2 = z(d)
    return {"model": model, "policy_hit_rate": d["policy_hit_rate"],
            "random_hit_rate": d["random_hit_rate"], "ratio": d["ratio"],
            "episodes": d["num_scenes"] * d["episodes_per_scene"],
            "policy_hits": h1, "random_hits": h2, "z": round(zz, 2)}


CASES = [
    ("mirror_maze", "fb_mirror_maze_distilled", "mirror",
     "/tmp/ho_mirror_teacher.json", "/tmp/ho_mirror_student_1k.json",
     "registered (borderline): student 1.47x random at 24,576 held-out "
     "episodes (63 vs 43 hits, z=1.94, p~0.05) while the generalist "
     "teacher is at/below random (11 vs 13 at 6,144).  The mirror-heavy "
     "geometry gives few diffuse decision points per walk, so counts stay "
     "small; the student is the measured best-available policy and ships "
     "with the borderline recorded."),
    ("glass_gallery", "fb_glass_gallery_distilled", "glass",
     "/tmp/ho_glass_teacher.json", "/tmp/ho_glass_student_1k.json",
     "registered: student 1.51x random at 24,576 held-out episodes "
     "(187 vs 124 hits, z=3.58) vs the teacher's 0.82x (23 vs 28 at "
     "6,144) — the episode-walk distillation pool + hindsight aim "
     "sharpening recovers signal the generalist teacher does not have."),
    ("simple_challenging", "fb_simple_distilled", "simple",
     "/tmp/ho_simple_teacher.json", "/tmp/ho_simple_student_1k.json",
     "registered: the type is signal-starved (episode hit base rate "
     "~2e-4; see fb_multi_scene_held_out.json flat_type_probe) but the "
     "sharpened student still clears it — 3.33x random at 24,576 "
     "held-out episodes (20 vs 6 hits, z=2.75)."),
]

for stype, model_stem, _short, teacher_f, student_f, decision in CASES:
    teacher = json.load(open(teacher_f))
    student = json.load(open(student_f))
    art = {
        "type": stype,
        "eval": ("strict held-out episode hit fraction (eval-multi --type "
                 f"{stype} --scenes 24 --seed 0; scenes = variations 1000+ "
                 "the trainer never saw); student at 1024 episodes/scene, "
                 "teacher at 256"),
        "student": block(student, f"models/{model_stem}.npz"),
        "teacher": block(teacher, "models/fb_multi_scene_trained.npz"),
        "decision": decision,
        "recipe": ("scripts/ship_models.py distill-episodes --type "
                   f"{stype} --teacher models/fb_multi_scene_trained.npz "
                   f"--out models/{model_stem}.npz --sharpen --epochs 60 "
                   "--seed 0"),
    }
    out = f"models/{model_stem.replace('_distilled', '')}_held_out.json"
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out}: student {art['student']['ratio']:.2f}x "
          f"(z={art['student']['z']}) teacher "
          f"{art['teacher']['ratio']:.2f}x")
