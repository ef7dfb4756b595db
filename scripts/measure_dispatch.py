"""Stepwise path-tracer dispatch-overhead measurement (TPU).

Times the chandelier path-trace frame at the headline config (200x100@8spp)
and the deployment shape (800x600@8spp) with the stepwise implementation,
plus the fused single-program variant where its compile is cached, so the
effect of host-side dispatch count on wall clock is measured rather than
guessed.  Run AFTER the pytest suite finishes (one CPU core: host dispatch
contends with everything else).
"""
import os
import sys
import time

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_steady(fn, warmup=1, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(0)

    for (w, h, spp, iters) in ((200, 100, 8, 10), (800, 600, 8, 5)):
        for impl in ("stepwise", "fused"):
            def run():
                return render_path(scene, key, width=w, height=h, spp=spp,
                                   max_bounces=8,
                                   camera_position=p["camera_position"],
                                   mirror_threshold=0.0, impl=impl)
            t0 = time.perf_counter()
            img, stats = run()
            jax.block_until_ready(img)
            print(f"{w}x{h}@{spp} {impl}: compile+run "
                  f"{time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            dt = time_steady(run, iters=iters)
            rays = int(stats.total_rays)
            print(f"{w}x{h}@{spp} {impl}: {dt*1e3:.1f} ms/frame, "
                  f"{rays/dt/1e6:.2f} Mrays/s", flush=True)

    # Amortized per-frame device compute of the fused program (marginal
    # cost of one more frame inside one lax.map program), for the
    # wall-vs-device split at both shapes.
    from raytracer_tpu.render.animation import (orbit_eyes,
                                                render_path_frames,
                                                scene_focus)
    focus = scene_focus(scene)
    for (w, h, spp) in ((200, 100, 8), (800, 600, 8)):
        def frames(n):
            eyes = orbit_eyes(focus, 6.0, 2.0, n)
            img, _ = render_path_frames(
                scene, key, eyes, focus, width=w, height=h, spp=spp,
                max_bounces=8, mirror_threshold=0.0,
                background=p["background"])
            return img

        t1 = time_steady(lambda: frames(1), iters=5)
        t4 = time_steady(lambda: frames(4), iters=5)
        dev_ms = (t4 - t1) / 3 * 1e3
        print(f"{w}x{h}@{spp} fused device (amortized): {dev_ms:.1f} ms, "
              f"1-frame wall {t1*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
