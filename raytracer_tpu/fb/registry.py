"""Deployment guide registry: pick the best shipped student for a
(scene, camera config) — static dispatch at render SETUP time, so the
traced program never branches.

Why it exists: distilled students are camera-distribution-specific.
Measured on the chandelier scene (TPU, equal spp; hit ratios seed 5,
wall ratios re-measured round 5 with BOTH sides impl="fused" best-of-10 —
scripts/measure_guided_ab.py, 2026-08-21):

* the all-around student (``fb_chandelier_distilled.npz``) wins every
  config jointly on hits — 2.6× small-light hits at 200×100@8spp, 4.0×
  at 800×600@8spp — at 0.85× (200×100) / 0.51× (800×600) the traditional
  tracer's wall-clock on the XLA impls (hits-per-second: 2.2× / 2.0×).
  Earlier rounds recorded ≥1× wall speedups against a then-slower
  traditional; the traditional tracer has since been optimised 5×+ and
  the wall claims here track the current BENCH numbers;
* the 2:1 SPECIALIST (``fb_chandelier_distilled_2to1.npz``) reaches
  7.9-8.0× hits at the 2:1 aspect but collapses to 0.36× at 4:3.

Cross-teacher target merging measurably fails (fb/distill.py
``best_of_teachers_targets`` caveat), so when the camera is known the
right deployment answer is per-config model choice — exactly like the
reference's own per-scene checkpoints (its artifacts ship separate
chandelier/complex models).  The registry encodes the measured winner per
aspect band; unknown scenes fall back to scene-level discovery
(``compare/workbench.py`` handles path conventions).
"""
from __future__ import annotations

import os
from typing import Optional

_MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "models")

#: (scene_name, aspect_band) → shipped checkpoint.  Aspect bands:
#: "wide" = width/height ≥ 1.8 (the reference's 2:1 comparison family),
#: "standard" = everything else (4:3 deployment renders included).
REGISTRY = {
    ("chandelier", "wide"): "fb_chandelier_distilled_2to1.npz",
    ("chandelier", "standard"): "fb_chandelier_distilled.npz",
    ("complex", "wide"): "fb_complex_distilled.npz",
    ("complex", "standard"): "fb_complex_distilled.npz",
    # Per-TYPE students distilled from the multi-scene generalist
    # (hindsight aim-sharpened; beat the full teacher on held-out
    # variations — STATUS.md).  Template names as in scene/templates.py;
    # "cornell_box:1007"-style variation suffixes resolve to the type.
    ("cornell_box", "wide"): "fb_cornell_distilled.npz",
    ("cornell_box", "standard"): "fb_cornell_distilled.npz",
    # Open-geometry templates have ~no render-level small-light signal
    # (STATUS.md), so these students are validated on the held-out EPISODE
    # metric instead (24 held-out scenes × 256 episodes, seed 0):
    # many_lights student 1.20× random vs the teacher's 0.92×
    # (models/fb_many_lights_held_out.json); occluded_lights student
    # 2.31× vs the teacher's 1.66× (models/fb_occluded_held_out.json).
    # The occluded student comes from the EPISODE-WALK distillation pool
    # (ship_models.py distill-episodes) — the camera-wavefront pool used
    # everywhere else measurably collapses for this type (0.15×, round 2:
    # render wavefronts never visit the around-the-occluder approach
    # paths the episode walks need).
    ("many_lights", "wide"): "fb_many_lights_distilled.npz",
    ("many_lights", "standard"): "fb_many_lights_distilled.npz",
    ("occluded_lights", "wide"): "fb_occluded_distilled.npz",
    ("occluded_lights", "standard"): "fb_occluded_distilled.npz",
    # Round 4: the last three template types measured (episode-walk
    # distillation + 24 held-out scenes x 1024 episodes, seed 0) — every
    # type in the reference's 8-template family now has a routing
    # decision backed by a held-out artifact:
    # glass_gallery student 1.51x random (z=3.58) vs teacher 0.82x
    # (models/fb_glass_gallery_held_out.json); simple_challenging
    # student 3.33x (z=2.75) on a signal-starved type (base rate ~2e-4;
    # models/fb_simple_held_out.json); mirror_maze student 1.62x over
    # THREE independent seeds (combined 210 vs 130 hits / 147k episodes,
    # z=4.34 — the r4 single-seed z=1.94 borderline resolved upward;
    # models/fb_mirror_maze_held_out.json "multi_seed").
    ("glass_gallery", "wide"): "fb_glass_gallery_distilled.npz",
    ("glass_gallery", "standard"): "fb_glass_gallery_distilled.npz",
    ("simple_challenging", "wide"): "fb_simple_distilled.npz",
    ("simple_challenging", "standard"): "fb_simple_distilled.npz",
    ("mirror_maze", "wide"): "fb_mirror_maze_distilled.npz",
    ("mirror_maze", "standard"): "fb_mirror_maze_distilled.npz",
}


def aspect_band(width: int, height: int) -> str:
    return "wide" if width / max(height, 1) >= 1.8 else "standard"


def model_path_for(scene_name: str, width: int, height: int,
                   models_dir: Optional[str] = None) -> Optional[str]:
    """Best shipped student checkpoint for this scene + camera, or None if
    nothing registered/on disk."""
    d = models_dir or _MODELS_DIR
    scene_name = scene_name.partition(":")[0]       # cornell_box:1007 → type
    name = REGISTRY.get((scene_name, aspect_band(width, height)))
    if name is None:
        return None
    path = os.path.join(d, name)
    return path if os.path.exists(path) else None


def guide_for(scene_name: str, width: int, height: int,
              models_dir: Optional[str] = None, dtype="auto"):
    """Load the registered student and return its fused ``guide_fn`` (ready
    for ``render_path(..., guide_fn=...)``), or None."""
    path = model_path_for(scene_name, width, height, models_dir)
    if path is None:
        return None
    from .distill import DistilledGuide
    return DistilledGuide.load(path).as_guide_fn(dtype=dtype)
