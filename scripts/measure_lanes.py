"""VERDICT r3 item 5 groundwork: per-level live/diffuse lane counts for
the guided chandelier comparison config (200x100@8spp, mirror_threshold
0.9) and the 800x600 deployment shape — the compaction ceiling.

The full (non-distilled) agent runs a 512-wide forward on EVERY lane at
every level; only live diffuse lanes consume the action.  The ratio
sum(diffuse_l) / (L * R) bounds what wavefront compaction before the
policy forward could save.  Prints a per-level table + the ceiling, and
times the policy forward itself on full vs compacted-size batches so the
saving is measured, not inferred.
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
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def lane_counts(scene, p, width, height, spp, max_bounces=8):
    """Trace the traditional wavefront (mirror_threshold=0.9 semantics so
    walls are diffuse, as the guided comparison config) and count
    running/diffuse lanes per level."""
    import numpy as np
    from raytracer_tpu.render.path_renderer import _camera_bundle
    from raytracer_tpu.trace.path import _level_kernel
    from raytracer_tpu.core import vec

    key = jax.random.key(0)
    k_jit, k_trace = jax.random.split(jax.random.split(key)[1])
    o, d = _camera_bundle(k_jit, width=width, height=height, spp=spp,
                          fov=60.0,
                          camera_position=jnp.asarray(p["camera_position"],
                                                      jnp.float32))
    d = vec.normalise_safe(d)
    R = o.shape[0]
    running = jnp.ones((R,), bool)
    keys = jax.random.split(k_trace, max_bounces)
    rows = []
    for k in range(max_bounces):
        (o, d, running2, state, albedo, direct, obs, diffuse, fb_u,
         normal, stats) = _level_kernel(
            scene, o, d, running, keys[k],
            jnp.asarray(float(k), jnp.float32), max_bounces=max_bounces,
            mirror_threshold=0.9, want_obs=False)
        rows.append((int(jnp.sum(running)), int(jnp.sum(diffuse))))
        running = running2
    return R, rows


def main():
    import numpy as np
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()

    for (w, h, spp) in ((200, 100, 8), (800, 600, 8)):
        R, rows = lane_counts(scene, p, w, h, spp)
        total = R * len(rows)
        live = sum(r for r, _ in rows)
        diff = sum(d for _, d in rows)
        print(f"\n{w}x{h}@{spp}spp  R={R:,}  levels={len(rows)}")
        print("lvl  running    diffuse    run%   diff%")
        for i, (r, dd) in enumerate(rows):
            print(f"{i:3d}  {r:9,} {dd:9,}  {r/R:6.1%} {dd/R:6.1%}")
        print(f"lane-hours: running {live/total:.1%}, diffuse {diff/total:.1%}"
              f" of L*R — compaction ceiling on the policy forward: "
              f"{1 - diff/total:.1%} of its FLOPs", flush=True)

    # Time the full-agent policy forward at full vs compacted batch sizes
    # (the 200x100 config: R=160k lanes; compacted ≈ diffuse share).
    try:
        from raytracer_tpu.fb.inference import TrainedFBAgent, \
            small_light_indices
        idx = small_light_indices(scene)
        agent = TrainedFBAgent(None, scene, idx, p["camera_position"])
        guide = agent.as_guide_fn()
        spec = getattr(guide, "_fused_spec", None)
        if spec is None:
            print("\nno fused spec on guide; skipping forward timing")
            return
        g_params, g_dtype, *rest = spec
        g_apply = rest[0] if rest else None
        if g_apply is None:
            print("\nno custom apply; skipping forward timing")
            return

        @jax.jit
        def fwd(params, obs):
            return g_apply(params, obs, g_dtype)

        for n in (160_000, 80_000, 40_000, 20_000, 10_000):
            obs = jnp.zeros((n, 22), jnp.float32)
            dt = time_steady(lambda: fwd(g_params, obs))
            print(f"policy forward n={n:8,}: {dt*1e3:6.2f} ms wall",
                  flush=True)
    except Exception as e:
        print(f"forward timing failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
