"""Full-resolution parity check: render the two golden frames with
raytracer_tpu and record MSE/checksums against the executed-reference
goldens (scripts/gen_parity_fullres.py).  Writes
showcase/parity_fullres/parity.json + README.md — the artifact the
BASELINE.json north star asks for (pixel-MSE < 1e-6 vs the CPU reference
at the showcased frames).

Runs on CPU: f64 proves bit-level semantic parity; f32 is the TPU
deployment precision whose MSE the north star bounds.
"""
import hashlib
import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).parents[1] / "showcase" / "parity_fullres"


def sha(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()


def true_original(dtype):
    import raytracer_tpu.scene.types as st
    from raytracer_tpu.render.camera import grid_rays
    from raytracer_tpu.render.renderer import render_whitted
    from raytracer_tpu.scene import library

    scene, gl, pl, p = library.true_original_scene()
    if dtype == jnp.float64:
        scene = st.scene_astype(scene, dtype)
        gl = st.GlobalLights(*(x.astype(dtype) for x in
                               (gl.vector, gl.colour, gl.strength,
                                gl.max_angle)))
        pl = st.PointLights(pl.id, *(x.astype(dtype) for x in
                                     (pl.position, pl.colour, pl.strength,
                                      pl.max_angle)), pl.func)
    origins, dirs, h, w = grid_rays(100, 0.01, 3,
                                    origin=p["camera_position"], dtype=dtype)
    assert (h, w) == (601, 601), (h, w)
    img = render_whitted(scene, gl, pl, origins, dirs, h, w, max_bounces=5,
                         background=p["background"], mode="unit")
    return np.asarray(img)


def chandelier(dtype):
    import raytracer_tpu.scene.types as st
    from raytracer_tpu.render.camera import perspective_rays
    from raytracer_tpu.scene import library
    from raytracer_tpu.trace.path import trace_path

    scene, _, _, p = library.chandelier_scene()
    if dtype == jnp.float64:
        scene = st.scene_astype(scene, dtype)
    o, d = perspective_rays(800, 600, fov=60, origin=p["camera_position"],
                            variant="fb", dtype=dtype)
    rgb, _ = trace_path(scene, o.astype(dtype), d.astype(dtype),
                        jax.random.key(0), max_bounces=8,
                        mirror_threshold=0.0)
    return np.asarray(rgb).reshape(600, 800, 3)


def main():
    report = {"generated_by": "scripts/check_parity_fullres.py",
              "reference_executed_by": "scripts/gen_parity_fullres.py",
              "frames": {}}

    def diff_stats(img, ref, scale=1.0):
        """Unit-range diff statistics; divergent = off by more than one
        8-bit step (boundary-pixel chaos, see README)."""
        d = np.abs(img - ref) / scale
        per_px = d.max(axis=-1)
        agree = per_px <= 1.0 / 255.0
        return {
            "pixel_mse": float(np.mean((d) ** 2)),
            "max_abs_diff": float(d.max()),
            "exact_pixel_fraction": float((per_px == 0).mean()),
            "within_1_255_fraction": float(agree.mean()),
            "divergent_pixels": int((~agree).sum()),
            "total_pixels": int(per_px.size),
            # MSE over the agreeing pixels: the parity number with the
            # chaotic boundary pixels (deep-specular-chain sensitivity to
            # 1-ulp operand-order differences) separated out and counted
            # above instead of averaged in.
            "pixel_mse_agreeing": float(np.mean(d[agree] ** 2)),
        }

    # --- true original 601x601 (unit-range float frame) ------------------
    ref = np.load(OUT / "true_original_601_ref.npy").astype(np.float64)
    for dtype, name in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        t0 = time.time()
        img = true_original(dtype).astype(np.float64)
        st = diff_stats(img, ref)
        st["render_sha256"] = sha(img.astype(np.float32))
        st["seconds"] = round(time.time() - t0, 2)
        report["frames"].setdefault("true_original_601", {
            "config": "RL/output5.py:416-533 render_true_original "
                      "(601x601 grid, max_bounces=5)",
            "ref_sha256": sha(np.load(OUT / "true_original_601_ref.npy")),
        })[name] = st
        print(f"true_original {name}: mse={st['pixel_mse']:.3e} "
              f"max={st['max_abs_diff']:.3e} "
              f"divergent={st['divergent_pixels']}", flush=True)

    # --- chandelier 800x600 deterministic (raw int colours) --------------
    refc = np.load(OUT / "chandelier_800x600_ref.npy").astype(np.float64)
    for dtype, name in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        t0 = time.time()
        img = chandelier(dtype).astype(np.float64)
        # North-star MSE is on the unit-range image (ints / 255, clamped).
        st = diff_stats(np.minimum(1.0, img / 255.0),
                        np.minimum(1.0, refc / 255.0))
        st["render_sha256"] = sha(img.astype(np.int32))
        st["seconds"] = round(time.time() - t0, 2)
        report["frames"].setdefault("chandelier_800x600", {
            "config": "FB/fb_vs_traditional_chandelier.py trace_ray_"
                      "traditional, pixel centres, spp=1, max_bounces=8 "
                      "(deterministic: mirror on reflective>0)",
            "ref_sha256": sha(np.load(OUT / "chandelier_800x600_ref.npy")),
        })[name] = st
        print(f"chandelier {name}: mse={st['pixel_mse']:.3e} "
              f"max={st['max_abs_diff']:.3e} "
              f"exact={st['exact_pixel_fraction']:.4f}", flush=True)

    with open(OUT / "parity.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", OUT / "parity.json")


if __name__ == "__main__":
    main()
