"""Ablation profile of the fused path-trace kernel's device compute (TPU).

Answers VERDICT r3 item 1's "where do the 149.7 device ms go" by timing the
800x600@8spp traditional chandelier frame with individual cost components
removed:

* full        — the shipped fused tracer (collect_stats=True)
* nostats     — per-level stat reductions off
* nodirect    — direct-lighting sweep off (emissive_idx=())
* nothreefry  — cosine sampling with CONSTANT u (threefry uniforms removed,
                trig kept)
* notrig      — cosine sampling replaced by the normal direction (threefry
                AND arccos/sin/cos removed)
* uniforms    — calibration: ONLY the tracer's per-level uniform draws
* nearest     — floor: 8 chained nearest_hit_c sweeps + reflect bounce

Protocol: each variant runs F frames inside ONE program (lax.map), wall
best-of-N; per-frame device = (t(F) - floor)/F with the dispatch floor
measured from an F=1 run of `full`.  Each variant re-jits the UNWRAPPED
fused impl so monkeypatched sampling is seen by a fresh trace (the module
jit's cache would otherwise replay the unpatched program).
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
F = 4          # frames per program for the amortized number
ITERS = 5


def time_steady(fn, warmup=1, iters=ITERS):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from raytracer_tpu.render.path_renderer import _camera_bundle
    from raytracer_tpu.scene import library
    from raytracer_tpu.trace import path, sampling

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    cam = jnp.asarray(p["camera_position"], jnp.float32)
    key = jax.random.key(0)
    em_idx = path.emissive_indices(scene)
    raw_impl = path._trace_path_fused_impl.__wrapped__

    def make_prog(emissive_idx, collect_stats, frames):
        @jax.jit
        def prog(scene, key):
            def one(k):
                k_jit, k_trace = jax.random.split(k)
                o, d = _camera_bundle(k_jit, width=W, height=H, spp=SPP,
                                      fov=60.0, camera_position=cam)
                rgb, stats = raw_impl(
                    scene, o, d, k_trace, None, max_bounces=MB,
                    mirror_threshold=0.0, background=p["background"],
                    guide_fn=None, g_apply=None, g_dtype=None, fb_prob=1.0,
                    collect_stats=collect_stats, emissive_idx=emissive_idx)
                return jnp.sum(rgb[:64])
            return jax.lax.map(one, jax.random.split(key, frames))
        return prog

    results = {}

    def run(name, prog, frames):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(scene, key))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(scene, key))
        results[name] = (dt, frames)
        print(f"{name}: {dt*1e3:.1f} ms total ({frames} frames)", flush=True)
        return dt

    # Dispatch floor from a 1-frame full run.
    t1 = run("full_f1", make_prog(em_idx, True, 1), 1)
    tF = run("full", make_prog(em_idx, True, F), F)
    floor = max(t1 - (tF - t1) / (F - 1), 0.0)
    per_full = (tF - floor) / F
    print(f"floor={floor*1e3:.1f} ms, full per-frame={per_full*1e3:.1f} ms",
          flush=True)

    def per_frame(name):
        dt, frames = results[name]
        return (dt - floor) / frames

    run("nostats", make_prog(em_idx, False, F), F)
    run("nodirect", make_prog((), True, F), F)

    # --- patched-sampling variants (fresh trace each; restore after) -----
    orig = sampling.cosine_weighted_c

    def cosine_nothreefry(key, nx, ny, nz, convention="renderer"):
        u0 = jnp.full(nx.shape, 0.37, nx.dtype)
        u1 = jnp.full(nx.shape, 0.61, nx.dtype)
        theta = jnp.arccos(jnp.sqrt(u0))
        phi = 2.0 * jnp.pi * u1
        return sampling.local_to_world_c(theta, phi, nx, ny, nz, convention)

    def cosine_notrig(key, nx, ny, nz, convention="renderer"):
        return nx, ny, nz

    try:
        sampling.cosine_weighted_c = cosine_nothreefry
        run("nothreefry", make_prog(em_idx, True, F), F)
        sampling.cosine_weighted_c = cosine_notrig
        run("notrig", make_prog(em_idx, True, F), F)
    finally:
        sampling.cosine_weighted_c = orig

    # --- calibrations ------------------------------------------------------
    R = W * H * SPP

    @jax.jit
    def uniforms_prog(key):
        def one(k):
            acc = jnp.zeros((), jnp.float32)
            for i in range(MB):
                k, sub = jax.random.split(k)
                kd, kf = jax.random.split(sub)
                u = jax.random.uniform(kd, (R, 2), jnp.float32)
                acc = acc + jnp.sum(u[:8])
            return acc
        return jax.lax.map(one, jax.random.split(key, F))

    t0 = time.perf_counter()
    jax.block_until_ready(uniforms_prog(key))
    print(f"uniforms: compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dt = time_steady(lambda: uniforms_prog(key))
    results["uniforms"] = (dt, F)
    print(f"uniforms: {dt*1e3:.1f} ms total ({F} frames)", flush=True)

    from raytracer_tpu.core.intersect import NO_SUPPRESS, nearest_hit_c
    from raytracer_tpu.core import vec

    @jax.jit
    def nearest_prog(scene, key):
        def one(k):
            k_jit, _ = jax.random.split(k)
            o, d = _camera_bundle(k_jit, width=W, height=H, spp=SPP,
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
        return jax.lax.map(one, jax.random.split(key, F))

    t0 = time.perf_counter()
    jax.block_until_ready(nearest_prog(scene, key))
    print(f"nearest: compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dt = time_steady(lambda: nearest_prog(scene, key))
    results["nearest"] = (dt, F)
    print(f"nearest: {dt*1e3:.1f} ms total ({F} frames)", flush=True)

    print("\n--- per-frame device (floor-corrected) ---", flush=True)
    for name in ("full", "nostats", "nodirect", "nothreefry", "notrig",
                 "uniforms", "nearest"):
        if name in results:
            print(f"{name:12s} {per_frame(name)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
