"""Part 3: measure the no_diffuse specialisation + precision="fast" modes
on the 800x600@8spp chandelier traditional frame (VERDICT r3 item 1).

Variants (all fused, single dispatch):
  exact          — reference-parity math, now with the all-mirror
                   specialisation (no diffuse sampling for this config)
  fast           — squared-radius hit test + rsqrt direct lighting
  fast-chunk1    — fast + spp_chunk=1 (8 sub-wavefronts inside one program;
                   profile_path2 measured small wavefronts ~16% cheaper)
  exact-chunk1   — exact + spp_chunk=1

Each: wall best-of-5, then the amortized device number for the best
variant via a 4-frame lax.map chain.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_steady(fn, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library
    import numpy as np

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(0)

    variants = {
        "exact": dict(precision="exact"),
        "fast": dict(precision="fast"),
        "fast-chunk1": dict(precision="fast", spp_chunk=1),
        "exact-chunk1": dict(precision="exact", spp_chunk=1),
    }
    imgs = {}
    for name, kw in variants.items():
        def run(kw=kw):
            return render_path(scene, key, width=800, height=600, spp=8,
                               max_bounces=8,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="fused", **kw)
        t0 = time.perf_counter()
        img, stats = run()
        jax.block_until_ready(img)
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(run)
        imgs[name] = np.asarray(img)
        rays = int(stats.total_rays)
        print(f"{name:12s}: {dt*1e3:7.1f} ms wall "
              f"({rays/dt/1e6:.1f} Mrays/s)", flush=True)

    d = np.abs(imgs["exact"] - imgs["fast"])
    print(f"fast-vs-exact: max {d.max():.5f}, frac differing "
          f"{(d > 0).mean():.5f}", flush=True)

    # Amortized device time, fast mode, via the frames chain.
    from raytracer_tpu.render.animation import (orbit_eyes,
                                                render_path_frames,
                                                scene_focus)
    focus = scene_focus(scene)

    def frames(n):
        eyes = orbit_eyes(focus, 6.0, 2.0, n)
        img, _ = render_path_frames(
            scene, key, eyes, focus, width=800, height=600, spp=8,
            max_bounces=8, mirror_threshold=0.0,
            background=p["background"])
        return img, None

    t1 = time_steady(lambda: frames(1))
    t4 = time_steady(lambda: frames(4))
    print(f"exact frames-chain device (amortized): {(t4-t1)/3*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
