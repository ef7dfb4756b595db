"""Generate FULL-RESOLUTION parity goldens by *executing* the reference
implementation at /root/reference (read-only) — the reference's own classes
produce the frames; nothing is copied.  Offline CPU job (minutes-to-hours);
run each part in the background:

    python scripts/gen_parity_fullres.py true_original
    python scripts/gen_parity_fullres.py chandelier

Outputs (showcase/parity_fullres/):
  true_original_601_ref.npy   float32 [601, 601, 3] unit-range frame from
                              RL/output5.py:416-533 render_true_original —
                              the exact frame showcased as
                              showcase/true_original_601.png.
  chandelier_800x600_ref.npy  int32 [600, 800, 3] raw per-pixel colours from
                              FB/fb_vs_traditional_chandelier.py:431-554
                              TraditionalRenderer.trace_ray_traditional at
                              pixel centres (jitter-free, spp=1,
                              max_bounces=8).  Deterministic: every
                              non-emissive chandelier sphere has
                              reflective >= 0.1 and the chandelier renderer
                              mirrors on `reflective > 0` (:481), so no RNG
                              is ever consulted.

The companion scripts/check_parity_fullres.py renders the same frames with
raytracer_tpu and writes the MSE/checksum artifact.
"""
import sys
import time
from pathlib import Path

import numpy as np

OUT = Path(__file__).parents[1] / "showcase" / "parity_fullres"


def gen_true_original():
    sys.path.insert(0, "/root/reference/RL")
    import matplotlib
    matplotlib.use("Agg")
    import output5

    OUT.mkdir(parents=True, exist_ok=True)
    exp = output5.CustomSceneExperiment(output_dir=str(OUT / "_ref_tmp"))
    spheres = output5.create_custom_scene()["custom_scene"]
    t0 = time.time()
    img = exp.render_true_original(spheres, OUT / "_ref_tmp" / "true.png")
    print(f"reference render_true_original: {time.time() - t0:.1f}s")
    np.save(OUT / "true_original_601_ref.npy", np.asarray(img, np.float32))
    print("wrote", OUT / "true_original_601_ref.npy")


def gen_chandelier():
    sys.path.insert(0, "/root/reference/FB")
    import fb_vs_traditional_chandelier as ch

    OUT.mkdir(parents=True, exist_ok=True)
    spheres = ch.generate_chandelier_scene()
    light_sources = [s for s in spheres if s.material.emitive]
    small_lights = [s for s in light_sources if s.radius < 0.5]

    r = ch.TraditionalRenderer()
    r.scene = spheres
    r.light_sources = light_sources
    r.small_lights = small_lights
    r.camera_position = ch.Vector(0, 2, 0)
    W, H, BOUNCES = 800, 600, 8
    r.set_render_settings(W, H, max_bounces=BOUNCES, samples_per_pixel=1)

    img = np.zeros((H, W, 3), np.int32)
    t0 = time.time()
    for y in range(H):
        for x in range(W):
            ray = r.generate_camera_ray(x, y)        # pixel centre (0.5, 0.5)
            c = r.trace_ray_traditional(ray, 0)
            img[y, x] = (c.r, c.g, c.b)
        if y % 30 == 0:
            el = time.time() - t0
            print(f"row {y}/{H}  {el:.0f}s  eta {el / (y + 1) * (H - y):.0f}s",
                  flush=True)
    print(f"reference chandelier 800x600 pixel-centre: {time.time() - t0:.1f}s")
    np.save(OUT / "chandelier_800x600_ref.npy", img)
    print("wrote", OUT / "chandelier_800x600_ref.npy")


if __name__ == "__main__":
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("true_original", "all"):
        gen_true_original()
    if part in ("chandelier", "all"):
        gen_chandelier()
