"""Part 2 of the fused path-kernel ablation: wavefront-size scaling.

profile_path.py showed the bare 8-level nearest-hit sweep costs 97.6 ms at
R=3.84M (3.2 ns/ray-level) while the whitted chain runs the same sweep at
0.34 ns/ray-level at R=480k.  This script measures (a) the same nearest
ablation at several R and (b) the full render through render_path's
spp_chunk path (lax.map over sub-wavefronts inside ONE program) to see
whether chunking recovers the small-wavefront efficiency.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MB = 8
FLOOR_GUESS = 26.3e-3


def time_steady(fn, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from raytracer_tpu.core import vec
    from raytracer_tpu.core.intersect import NO_SUPPRESS, nearest_hit_c
    from raytracer_tpu.render.path_renderer import _camera_bundle, render_path
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    cam = jnp.asarray(p["camera_position"], jnp.float32)
    key = jax.random.key(0)

    # --- (a) nearest-sweep scaling in R --------------------------------
    def make_nearest(spp, frames):
        R = 800 * 600 * spp

        @jax.jit
        def prog(scene, key):
            def one(k):
                k_jit, _ = jax.random.split(k)
                o, d = _camera_bundle(k_jit, width=800, height=600, spp=spp,
                                      fov=60.0, camera_position=cam)
                ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
                dn = vec.normalise_safe(d)
                dx, dy, dz = dn[:, 0], dn[:, 1], dn[:, 2]
                no_sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)
                acc = jnp.zeros((), jnp.float32)
                for i in range(MB):
                    h = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, no_sup,
                                      by_abs=True)
                    rx, ry, rz = vec.reflect_c(dx, dy, dz, h.nx, h.ny, h.nz)
                    ox = jnp.where(h.found, h.px + h.nx * 0.001, ox)
                    oy = jnp.where(h.found, h.py + h.ny * 0.001, oy)
                    oz = jnp.where(h.found, h.pz + h.nz * 0.001, oz)
                    dx = jnp.where(h.found, rx, dx)
                    dy = jnp.where(h.found, ry, dy)
                    dz = jnp.where(h.found, rz, dz)
                    acc = acc + jnp.sum(h.t[:8])
                return acc
            return jax.lax.map(one, jax.random.split(key, frames))
        return prog, R

    for spp in (1, 2, 4, 8):
        frames = max(1, 8 // spp)       # same total rays each config
        prog, R = make_nearest(spp, frames)
        t0 = time.perf_counter()
        jax.block_until_ready(prog(scene, key))
        print(f"nearest spp={spp}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(scene, key))
        per = (dt - FLOOR_GUESS) / frames
        print(f"nearest R={R:>8}: {per*1e3:7.1f} ms/prog-frame  "
              f"({per/ (R*MB) * 1e9:.3f} ns/ray-level)", flush=True)

    # --- (b) full render, chunked wavefront ----------------------------
    for spp_chunk in (1, 2, 4, 8):
        def run():
            return render_path(scene, key, width=800, height=600, spp=8,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="fused",
                               spp_chunk=spp_chunk if spp_chunk < 8 else None)
        t0 = time.perf_counter()
        img, stats = run()
        jax.block_until_ready(img)
        print(f"chunk={spp_chunk}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(run)
        print(f"render 800x600@8 spp_chunk={spp_chunk}: "
              f"{dt*1e3:7.1f} ms wall (~{(dt-FLOOR_GUESS)*1e3:.1f} device)",
              flush=True)


if __name__ == "__main__":
    main()
