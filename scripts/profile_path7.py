"""Part 7: the PRODUCTION lean renderer (render_path impl="lean") vs the
round-3 production config (fused + spp_chunk=1) on the 800x600@8spp
chandelier traditional frame — wall best-of-N and amortized device compute
for both, plus the 200x100 headline config.  Also cross-checks lean ≡
fused bit-exactness on the full frame before timing.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

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
    import numpy as np
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    key = jax.random.key(0)
    MB = 8

    def mk(w, h, spp, impl, **kw):
        def fn(k=key):
            return render_path(scene, k, width=w, height=h, spp=spp,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl=impl, **kw)
        return fn

    big_chunk = mk(800, 600, 8, "fused", spp_chunk=1)
    big_plain = mk(800, 600, 8, "fused")
    big_lean = mk(800, 600, 8, "lean")
    big_lean_fast = mk(800, 600, 8, "lean", precision="fast")
    small_fused = mk(200, 100, 8, "fused")
    small_lean = mk(200, 100, 8, "lean")

    # Parity on the full frame first — lean vs PLAIN fused (identical key
    # schedule; the spp_chunk renderer draws a different camera-jitter
    # stream by design).
    t0 = time.perf_counter()
    img_f, st_f = big_plain()
    jax.block_until_ready(img_f)
    print(f"fused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    img_l, st_l = big_lean()
    jax.block_until_ready(img_l)
    print(f"lean compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    same = bool((np.asarray(img_f) == np.asarray(img_l)).all())
    print(f"800x600 lean == fused: {same} "
          f"stats_eq={int(st_f.light_hits)==int(st_l.light_hits)}",
          flush=True)
    if not same:
        d = np.abs(np.asarray(img_f) - np.asarray(img_l))
        print(f"  max {d.max():.6f} frac {(d > 1e-6).mean():.6f}", flush=True)

    for name, fn in (("800x600 fused+chunk", big_chunk),
                     ("800x600 fused plain", big_plain),
                     ("800x600 lean", big_lean),
                     ("800x600 lean fast", big_lean_fast),
                     ("200x100 fused", small_fused),
                     ("200x100 lean", small_lean)):
        dt = time_steady(lambda: fn()[0])
        print(f"{name:22s}: {dt*1e3:7.1f} ms wall", flush=True)

    # Amortized device compute, lean big frame: (t(4) - t(1)) / 3.
    def make_chain(n, builder):
        @jax.jit
        def prog(k):
            def one(kk):
                img, _ = builder(kk)
                return jnp.sum(img)        # full reduction: no slice DCE
            return jax.lax.map(one, jax.random.split(k, n))
        return prog

    for name, builder in (("fused+chunk", big_chunk), ("lean", big_lean),
                          ("lean fast", big_lean_fast)):
        c1, c4 = make_chain(1, builder), make_chain(4, builder)
        t1 = time_steady(lambda: c1(key), iters=5)
        t4 = time_steady(lambda: c4(key), iters=5)
        if t4 > t1:
            print(f"800x600 {name} device (amortized): "
                  f"{(t4-t1)/3*1e3:.1f} ms/frame", flush=True)
        else:
            print(f"800x600 {name} device: invalid (t1={t1*1e3:.0f} "
                  f"t4={t4*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
