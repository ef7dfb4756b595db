"""Part 4: ray-block-size sweep for the fused path tracer + bf16 VPU probe.

profile_path3: chunking the 3.84M-ray wavefront into 480k-ray sub-programs
(lax.map) cut device time 135 -> ~90 ms while removing sqrt/divs did
~nothing — the fused kernel is scheduling/memory-regime bound, not
transcendental-bound.  Measure: (a) even smaller ray blocks, (b) whether
bf16 doubles VPU sweep throughput (decides the bf16-decision design).
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, SPP, MB = 800, 600, 8, 8
R_TOTAL = W * H * SPP


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
    from raytracer_tpu.render.path_renderer import _camera_bundle, _assemble
    from raytracer_tpu.scene import library
    from raytracer_tpu.trace import path

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    cam = jnp.asarray(p["camera_position"], jnp.float32)
    key = jax.random.key(0)
    em_idx = path.emissive_indices(scene)
    raw_impl = path._trace_path_fused_impl.__wrapped__

    # --- (a) ray-block sweep (fast mode, no_diffuse) -------------------
    def make_prog(rb):
        nblk = R_TOTAL // rb

        @jax.jit
        def prog(scene, key):
            k_jit, k_trace = jax.random.split(key)
            o, d = _camera_bundle(k_jit, width=W, height=H, spp=SPP,
                                  fov=60.0, camera_position=cam)
            ob = o.reshape(nblk, rb, 3)
            db = d.reshape(nblk, rb, 3)
            keys = jax.random.split(k_trace, nblk)

            def one(args):
                ob, db, k = args
                rgb, stats = raw_impl(
                    scene, ob, db, k, None, max_bounces=MB,
                    mirror_threshold=0.0, background=p["background"],
                    guide_fn=None, g_apply=None, g_dtype=None, fb_prob=1.0,
                    collect_stats=True, emissive_idx=em_idx,
                    no_diffuse=True, fast=True)
                return rgb, stats

            rgbs, stats = jax.lax.map(one, (ob, db, keys))
            img = _assemble(rgbs.reshape(-1, 3), spp=SPP, height=H, width=W)
            return img
        return prog

    for rb in (480000, 240000, 120000, 60000, 30000):
        if R_TOTAL % rb:
            continue
        prog = make_prog(rb)
        t0 = time.perf_counter()
        jax.block_until_ready(prog(scene, key))
        print(f"rb={rb}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(scene, key))
        print(f"ray-block {rb:>7}: {dt*1e3:7.1f} ms wall", flush=True)

    # --- (b) bf16 sweep-throughput probe -------------------------------
    from raytracer_tpu.core import vec

    def make_sweep(dtype, R, iters_inner):
        sph = [(float(scene.centre[s, 0]), float(scene.centre[s, 1]),
                float(scene.centre[s, 2]), float(scene.radius[s]))
               for s in range(scene.centre.shape[0])]

        @jax.jit
        def prog(key):
            k1, k2 = jax.random.split(key)
            o = jax.random.uniform(k1, (3, R), jnp.float32, -5, 5)
            d0 = jax.random.uniform(k2, (3, R), jnp.float32, -1, 1)
            d0 = d0 / jnp.linalg.norm(d0, axis=0, keepdims=True)
            ox, oy, oz = (a.astype(dtype) for a in o)
            dx, dy, dz = (a.astype(dtype) for a in d0)
            acc = jnp.zeros((), jnp.float32)
            for i in range(iters_inner):
                big = jnp.asarray(3e38 if dtype == jnp.float32 else 3e38,
                                  jnp.float32)
                best_m = jnp.full((R,), jnp.inf, dtype)
                best_t = jnp.zeros((R,), dtype)
                for (cx, cy, cz, r) in sph:
                    lx, ly, lz = cx - ox, cy - oy, cz - oz
                    tca = lx * dx + ly * dy + lz * dz
                    d2 = jnp.maximum(lx * lx + ly * ly + lz * lz
                                     - tca * tca, 0.0)
                    thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
                    t = tca - thc
                    valid = (tca >= 0.0) & (d2 <= r * r)
                    m = jnp.where(valid, jnp.abs(t), jnp.inf)
                    better = m < best_m
                    best_m = jnp.where(better, m, best_m)
                    best_t = jnp.where(better, t, best_t)
                # feed forward so levels serialize
                ox = ox + best_t * dx * jnp.asarray(1e-6, dtype)
                acc = acc + jnp.sum(best_t[:8].astype(jnp.float32))
            return acc
        return prog

    R = 480000
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        prog = make_sweep(dtype, R, 8)
        t0 = time.perf_counter()
        jax.block_until_ready(prog(key))
        print(f"sweep {name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(key))
        per = (dt - 0.027) / (R * 8 * 1)
        print(f"sweep {name}: {dt*1e3:6.1f} ms  ({per*1e9:.2f} ns/ray-level)",
              flush=True)


if __name__ == "__main__":
    main()
