"""Part 8: interleaved A/B timing of lean variants vs fused to separate
relay weather from real structure.  Rounds of (fused small, lean small
1-block, lean small 8-block, fused+chunk big, lean big, lean big nostats)
measured back-to-back, 3 rounds, min and per-round values printed.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from raytracer_tpu.render.path_renderer import render_path, \
        _render_path_lean
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(0)
    MB = 8
    cam = jnp.asarray(p["camera_position"], jnp.float32)

    def lean(w, h, spp, block, stats=True):
        def fn(k=key):
            return _render_path_lean(
                scene, k, width=w, height=h, spp=spp, max_bounces=MB,
                fov=60.0, camera_position=cam, mirror_threshold=0.0,
                background=p["background"], guide_fn=None, fb_prob=1.0,
                collect_stats=stats, block_rays=block)
        return fn

    def fused(w, h, spp, **kw):
        def fn(k=key):
            return render_path(scene, k, width=w, height=h, spp=spp,
                               max_bounces=MB, camera_position=cam,
                               mirror_threshold=0.0, impl="fused", **kw)
        return fn

    cases = [
        ("fused 200x100", fused(200, 100, 8)),
        ("lean 200x100 1blk", lean(200, 100, 8, 245760)),
        ("lean 200x100 8blk", lean(200, 100, 8, 20000)),
        ("lean 200x100 nostat", lean(200, 100, 8, 245760, stats=False)),
        ("fused+chunk 800x600", fused(800, 600, 8, spp_chunk=1)),
        ("lean 800x600", lean(800, 600, 8, 245760)),
        ("lean 800x600 120k", lean(800, 600, 8, 122880)),
        ("lean 800x600 nostat", lean(800, 600, 8, 245760, stats=False)),
    ]
    # Compile everything first.
    for name, fn in cases:
        t0 = time.perf_counter()
        jax.block_until_ready(fn()[0])
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

    results = {name: [] for name, _ in cases}
    for rnd in range(4):
        for name, fn in cases:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn()[0])
                best = min(best, time.perf_counter() - t0)
            results[name].append(best * 1e3)
    for name, _ in cases:
        r = results[name]
        print(f"{name:22s}: min {min(r):7.1f} ms   rounds "
              + " ".join(f"{x:7.1f}" for x in r), flush=True)


if __name__ == "__main__":
    main()
