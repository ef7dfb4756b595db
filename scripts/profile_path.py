"""Parameterized path-tracer profiler — the round-4 measurement campaign's
eight one-off scripts (profile_path{1..8}) consolidated into subcommands
(VERDICT r4 item 9).  Campaign findings live in STATUS.md and
docs/lane_counts.md; this reproduces them from the working tree.

Protocol notes (STATUS.md round-4 environment lessons):
* ONE session per A/B — the tunneled relay's wall-clock weather swings
  between sessions, and this single-core host makes any concurrent
  CPU-heavy process (pytest, training) part of the measurement.
* wall = best-of-N perf_counter; device = amortized in-program chain
  (t(n) - t(1)) / (n - 1) with the chain reducing the FULL image so XLA
  cannot dead-code part of the frame.

Subcommands:
  prod      production configs on the 800x600@8spp + 200x100@8spp
            chandelier traditional frame: fused, fused+spp_chunk, lean,
            lean-fast, pallas — wall AND device, with a full-frame
            bit-equality cross-check first  (was: profile_path7/8)
  scale     wavefront-size scaling of the fused tracer        (was: part 2)
  modes     no_diffuse / precision="fast" ablation            (was: part 3)
  blocks    lean block_rays sweep                             (was: part 4)
  literals  scene_spec literal-baking A/B (traced vs baked)   (was: part 6)

Usage: python scripts/profile_path.py prod [--iters 10] [--skip-small]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_steady(fn, warmup=1, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def device_ms(render_fn, key, n=4, iters=5):
    """Amortized device compute of one render inside an in-program chain;
    returns None when relay variance swamps the marginal cost."""
    def make_chain(m):
        @jax.jit
        def prog(k):
            def one(kk):
                img, _ = render_fn(kk)
                return jnp.sum(img)
            return jax.lax.map(one, jax.random.split(k, m))
        return prog

    c1, cn = make_chain(1), make_chain(n)
    t1 = time_steady(lambda: c1(key), iters=iters)
    tn = time_steady(lambda: cn(key), iters=iters)
    if tn <= t1:
        return None
    return (tn - t1) / (n - 1) * 1e3


def _scene():
    from raytracer_tpu.scene import library
    scene, _, _, p = library.chandelier_scene()
    return scene, p


def cmd_prod(args):
    import numpy as np
    from raytracer_tpu.render.path_renderer import render_path

    scene, p = _scene()
    key = jax.random.key(0)
    MB = 8

    def mk(w, h, spp, impl, **kw):
        def fn(k=key):
            return render_path(scene, k, width=w, height=h, spp=spp,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl=impl, **kw)
        return fn

    variants = [
        ("fused", mk(800, 600, 8, "fused")),
        ("fused+chunk", mk(800, 600, 8, "fused", spp_chunk=1)),
        ("lean", mk(800, 600, 8, "lean")),
        ("lean-fast", mk(800, 600, 8, "lean", precision="fast")),
        ("pallas", mk(800, 600, 8, "pallas")),
        ("pallas-fast", mk(800, 600, 8, "pallas", precision="fast")),
    ]

    # Full-frame bit-equality cross-check before timing (fused is the
    # reference; spp_chunk draws a different jitter stream by design).
    img_f, st_f = variants[0][1]()
    jax.block_until_ready(img_f)
    for name, fn in variants[2:]:
        if "fast" in name:
            continue
        img, st = fn()
        same = bool(jnp.array_equal(img, img_f))
        log(f"parity {name} vs fused: bit-equal={same} "
            f"small_hits={int(st.small_light_hits)}/{int(st_f.small_light_hits)}")

    for name, fn in variants:
        wall = time_steady(fn, iters=args.iters)
        dev = device_ms(fn, key)
        log(f"800x600@8spp {name:12s} wall {wall*1e3:7.1f} ms   device "
            f"{dev:.1f} ms" if dev else
            f"800x600@8spp {name:12s} wall {wall*1e3:7.1f} ms   device n/a")

    if not args.skip_small:
        for name, fn in (("fused", mk(200, 100, 8, "fused")),
                         ("lean", mk(200, 100, 8, "lean")),
                         ("pallas", mk(200, 100, 8, "pallas"))):
            wall = time_steady(fn, iters=args.iters)
            log(f"200x100@8spp {name:12s} wall {wall*1e3:7.1f} ms")


def cmd_scale(args):
    from raytracer_tpu.render.path_renderer import render_path

    scene, p = _scene()
    key = jax.random.key(0)
    for w, h in ((100, 50), (200, 100), (400, 300), (800, 600)):
        def fn(k=key, w=w, h=h):
            return render_path(scene, k, width=w, height=h, spp=8,
                               max_bounces=8,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="fused")
        wall = time_steady(fn, iters=args.iters)
        rays = w * h * 8
        log(f"{w}x{h}@8spp fused: {wall*1e3:7.1f} ms  "
            f"{rays/wall/1e6:6.1f} Msamples/s")


def cmd_modes(args):
    from raytracer_tpu.render.path_renderer import render_path

    scene, p = _scene()
    key = jax.random.key(0)
    for label, kw in (("exact mt=0.0 (no_diffuse)", dict(mirror_threshold=0.0)),
                      ("fast  mt=0.0", dict(mirror_threshold=0.0,
                                            precision="fast")),
                      ("exact mt=0.9 (diffuse)", dict(mirror_threshold=0.9)),
                      ("fast  mt=0.9", dict(mirror_threshold=0.9,
                                            precision="fast"))):
        def fn(k=key, kw=kw):
            return render_path(scene, k, width=800, height=600, spp=8,
                               max_bounces=8,
                               camera_position=p["camera_position"],
                               impl="lean", **kw)
        wall = time_steady(fn, iters=args.iters)
        log(f"800x600@8spp lean {label}: {wall*1e3:7.1f} ms")


def cmd_blocks(args):
    from raytracer_tpu.trace.path import _trace_path_lean
    from raytracer_tpu.render.camera import perspective_rays

    scene, p = _scene()
    key = jax.random.key(0)
    o, d = perspective_rays(800, 600, fov=60, origin=p["camera_position"],
                            variant="fb")
    o = jnp.tile(o, (8, 1))
    d = jnp.tile(d, (8, 1))
    for br in (61440, 122880, 245760, 491520, 983040):
        def fn(k=key, br=br):
            return _trace_path_lean(scene, o, d, k, max_bounces=8,
                                    mirror_threshold=0.0,
                                    background=(2.0, 2.0, 5.0),
                                    guide_fn=None, fb_prob=0.0,
                                    collect_stats=False, fast=False,
                                    block_rays=br)
        wall = time_steady(fn, iters=args.iters)
        log(f"lean block_rays={br:7d}: {wall*1e3:7.1f} ms")


def cmd_literals(args):
    """Traced-scene vs baked-literal lean tracer (scene_spec A/B): pass a
    scene whose arrays are jax device arrays produced inside jit so
    scene_spec returns None (traced) vs the concrete library scene."""
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.trace.path import scene_spec

    scene, p = _scene()
    key = jax.random.key(0)

    import dataclasses
    traced = jax.tree.map(jnp.asarray, scene)
    # Defeat scene_spec's numpy conversion by donating through jit once.
    traced = jax.jit(lambda s: s)(traced)
    log(f"spec(concrete) is None: {scene_spec(scene) is None}; "
        f"spec(traced) is None: {scene_spec(traced) is None}")

    for label, sc, impl in (("baked lean", scene, "lean"),
                            ("traced fused", traced, "fused")):
        def fn(k=key, sc=sc, impl=impl):
            return render_path(sc, k, width=800, height=600, spp=8,
                               max_bounces=8,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl=impl)
        wall = time_steady(fn, iters=args.iters)
        log(f"800x600@8spp {label}: {wall*1e3:7.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prod", "scale", "modes", "blocks",
                                    "literals"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-small", action="store_true")
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    {"prod": cmd_prod, "scale": cmd_scale, "modes": cmd_modes,
     "blocks": cmd_blocks, "literals": cmd_literals}[args.cmd](args)


if __name__ == "__main__":
    main()
