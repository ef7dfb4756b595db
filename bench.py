"""Benchmark — reference configs on real TPU hardware.

Primary headline: the chandelier comparison config (200×100, 8 spp,
8 bounces — ``chandelier_comparison_*/statistics.json``), traditional path
tracing.  Baseline: 7,655 rays/s on the reference's CPU (BASELINE.md).

Output protocol: the headline JSON line prints to stdout as soon as the
headline is measured (so a hang in a secondary section can't cost the
record), then a final JSON line repeats the same headline fields plus an
``extra`` dict covering the whole perf surface (FB-guided, whitted 800×600,
planets2, marbles4) — whichever line the driver parses, the headline fields
are identical.  Human-readable detail goes to stderr.
"""
import json
import os
import sys
import time

import jax

# Persistent compilation cache: first-ever compile of the big traced
# programs takes minutes through the axon remote-compile relay; cached
# reruns start in seconds.
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

BASELINE_TRAD_RAYS_PER_SEC = 7655.0      # chandelier quick, BASELINE.md
BASELINE_FB_RAYS_PER_SEC = 1199.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BENCH_ITERS = 10     # best-of-N everywhere (recorded in extra)


def time_steady(fn, *, warmup=1, iters=BENCH_ITERS):
    """Best-of-N steady-state timing: the tunneled TPU shows up to 3x
    run-to-run variance from relay/host contention, so the minimum is the
    honest hardware number.  N is recorded in the output
    (extra["bench_iters"]) so every headline is decision-grade."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.render.camera import grid_rays
    from raytracer_tpu.render.renderer import render_whitted
    from raytracer_tpu.scene import library
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices

    log(f"devices: {jax.devices()}")
    scene, gl, pl, p = library.chandelier_scene()

    # --- headline: traditional chandelier 200x100 @ 8spp, 8 bounces ------
    # fused impl: one dispatch per frame (measured r4: 30.9 ms wall vs
    # stepwise 47.1 at this config; 800x600 180.8 vs 643.6 — the stepwise
    # per-level dispatches through the tunneled relay were the round-3
    # wall-vs-device mystery, scripts/measure_dispatch.py).
    import os as _os
    impl = _os.environ.get("BENCH_IMPL", "fused")
    W, H, SPP, MB = 200, 100, 8, 8
    key = jax.random.key(0)

    def run_trad(k=key):
        return render_path(scene, k, width=W, height=H, spp=SPP,
                           max_bounces=MB,
                           camera_position=p["camera_position"],
                           mirror_threshold=0.0, impl=impl)

    t0 = time.perf_counter()
    img, stats = run_trad()
    jax.block_until_ready(img)
    log(f"traditional compile+run: {time.perf_counter() - t0:.1f}s")
    dt, (img, stats) = time_steady(run_trad)
    total_rays = int(stats.total_rays)
    trad_rps = total_rays / dt
    log(f"traditional: {dt*1e3:.1f} ms/frame, {total_rays:,} rays, "
        f"{trad_rps/1e6:.2f} Mrays/s  (baseline {BASELINE_TRAD_RAYS_PER_SEC:,.0f} rays/s)")

    # Emit the headline JSON immediately — the extra sections below are
    # informative and must not cost the record if anything hangs.
    headline = {
        "metric": "chandelier_traditional_rays_per_sec",
        "value": round(trad_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(trad_rps / BASELINE_TRAD_RAYS_PER_SEC, 1),
    }
    print(json.dumps(headline), flush=True)
    extra = {"bench_iters": BENCH_ITERS, "bench_impl": impl}

    # --- FB-guided chandelier, same config -------------------------------
    # Round-5 semantics change (recorded in STATUS.md): this lane now
    # loads the TRAINED multi-scene generalist when shipped (r2-r4 it was
    # a random-init network of the same architecture — honest for COST,
    # not skill), and runs impl="fused" like the traditional lane — the
    # r4 "fused compile prohibitive" justification no longer reproduces
    # (measured 22.4 s cold / 2.9 s cached, scripts/measure_guided_ab.py).
    idx = small_light_indices(scene)
    gen_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "models", "fb_multi_scene_trained.npz")
    agent = TrainedFBAgent(gen_path if os.path.exists(gen_path) else None,
                           scene, idx, p["camera_position"])
    extra["bench_full_agent"] = ("trained-generalist" if agent.loaded
                                 else "random-init")
    guide = agent.as_guide_fn()

    def run_fb(k=key):
        return render_path(scene, k, width=W, height=H, spp=SPP,
                           max_bounces=MB,
                           camera_position=p["camera_position"],
                           mirror_threshold=0.9, guide_fn=guide, fb_prob=1.0,
                           impl="fused")

    try:
        t0 = time.time()
        fimg, fstats = run_fb()
        jax.block_until_ready(fimg)
        log(f"fb compile+run: {time.time() - t0:.1f}s")
        fdt, (fimg, fstats) = time_steady(run_fb)
        fb_rps = int(fstats.total_rays) / fdt
        log(f"fb-guided:   {fdt*1e3:.1f} ms/frame, {int(fstats.total_rays):,} rays, "
            f"{fb_rps/1e6:.2f} Mrays/s, fb_used={int(fstats.fb_used):,} "
            f"(baseline {BASELINE_FB_RAYS_PER_SEC:,.0f} rays/s)")
        extra["chandelier_fb_rays_per_sec"] = round(fb_rps, 1)
        extra["chandelier_fb_vs_baseline"] = round(
            fb_rps / BASELINE_FB_RAYS_PER_SEC, 1)
        extra["fb_vs_traditional_speedup"] = round(fb_rps / trad_rps, 3)

        # Guide-only-first-K deployment mode for the FULL agent (VERDICT
        # r2 item 9): the policy forward dominates the guided frame, and
        # most of the hit improvement comes from the early bounces —
        # running the network on only the first 3 of 8 levels trades a
        # bounded hit fraction for most of the policy cost.
        def run_fb_k3(k=key):
            return render_path(scene, k, width=W, height=H, spp=SPP,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.9, guide_fn=guide,
                               fb_prob=1.0, impl="stepwise",
                               guide_max_level=3)

        kdt, (kimg, kstats) = time_steady(run_fb_k3)
        k_rps = int(kstats.total_rays) / kdt
        log(f"fb-first3:   {kdt*1e3:.1f} ms/frame, {k_rps/1e6:.2f} Mrays/s, "
            f"fb_used={int(kstats.fb_used):,} "
            f"small_hits={int(kstats.small_light_hits):,} "
            f"(full-agent small_hits={int(fstats.small_light_hits):,})")
        extra["fb_first3_vs_traditional_speedup"] = round(k_rps / trad_rps, 3)
        if int(fstats.small_light_hits) > 0:
            extra["fb_first3_small_hit_retention"] = round(
                int(kstats.small_light_hits)
                / int(fstats.small_light_hits), 3)
    except Exception as e:                                  # pragma: no cover
        log(f"fb bench failed: {e!r}")
        fb_rps = 0.0

    # --- FB-guided with the distilled deployment guide ---------------------
    # The shipped answer to the reference's 6.7x FB slowdown: a 64-wide
    # student policy distilled from the trained agent (fb/distill.py) whose
    # per-level cost is ~noise next to the trace itself.
    dguide = None
    try:
        from raytracer_tpu.fb.distill import DistilledGuide
        dist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "models", "fb_chandelier_distilled.npz")
        if os.path.exists(dist_path):
            dguide = DistilledGuide.load(dist_path).as_guide_fn()

            # Apples-to-apples (VERDICT r4 item 1): the guided lane runs
            # the SAME impl="fused" single-dispatch program family as the
            # traditional lane.  The stepwise twin is kept as a secondary
            # key for cross-round drift comparability (r2-r4 benched
            # guided stepwise-only; the 1.114->0.744 "drift" decomposes
            # into that impl asymmetry + session weather — see STATUS.md).
            def run_fbd(k=key, impl_="fused"):
                return render_path(scene, k, width=W, height=H, spp=SPP,
                                   max_bounces=MB,
                                   camera_position=p["camera_position"],
                                   mirror_threshold=0.9, guide_fn=dguide,
                                   fb_prob=1.0, impl=impl_)

            ddt, (dimg, dstats) = time_steady(run_fbd)
            d_rps = int(dstats.total_rays) / ddt
            log(f"fb-distilled: {ddt*1e3:.1f} ms/frame, "
                f"{int(dstats.total_rays):,} rays, {d_rps/1e6:.2f} Mrays/s, "
                f"fb_used={int(dstats.fb_used):,}")
            extra["chandelier_fb_distilled_rays_per_sec"] = round(d_rps, 1)
            extra["fb_distilled_vs_traditional_speedup"] = round(
                d_rps / trad_rps, 3)
            sdt, (_, sstats) = time_steady(
                lambda: run_fbd(impl_="stepwise"))
            extra["fb_distilled_stepwise_vs_traditional_speedup"] = round(
                (int(sstats.total_rays) / sdt) / trad_rps, 3)
            # The research-claim metric, driver-legible: guided vs
            # traditional small-light hits at the same config (same
            # key/camera; traditional ran with the reference's
            # mirror_threshold=0.0 chandelier semantics, as in
            # compare/harness.py chandelier_comparison).
            if int(stats.small_light_hits) > 0:
                extra["chandelier_fb_distilled_small_light_improvement"] = (
                    round(int(dstats.small_light_hits)
                          / int(stats.small_light_hits), 3))
    except Exception as e:                                  # pragma: no cover
        log(f"fb-distilled bench failed: {e!r}")

    # --- the DEPLOYED guide: per-camera registry dispatch -------------------
    # fb/registry.py routes this 2:1 config to the specialist student —
    # same 128x128 arch as the all-around model, so this reuses the
    # compiled program above with different params (no extra compile).
    try:
        from raytracer_tpu.fb.registry import guide_for
        rguide = guide_for("chandelier", W, H)
        if rguide is not None:
            def run_fbr(k=key):
                return render_path(scene, k, width=W, height=H, spp=SPP,
                                   max_bounces=MB,
                                   camera_position=p["camera_position"],
                                   mirror_threshold=0.9, guide_fn=rguide,
                                   fb_prob=1.0, impl="fused")

            rdt, (rimg, rstats) = time_steady(run_fbr)
            r_rps = int(rstats.total_rays) / rdt
            log(f"fb-registry: {rdt*1e3:.1f} ms/frame, "
                f"{int(rstats.total_rays):,} rays, {r_rps/1e6:.2f} Mrays/s")
            extra["fb_registry_vs_traditional_speedup"] = round(
                r_rps / trad_rps, 3)
            if int(stats.small_light_hits) > 0:
                extra["chandelier_fb_registry_small_light_improvement"] = (
                    round(int(rstats.small_light_hits)
                          / int(stats.small_light_hits), 3))
    except Exception as e:                                  # pragma: no cover
        log(f"fb-registry bench failed: {e!r}")

    # --- at-scale path tracing: 800x600 @ 8spp (the reference's own
    # traditional-render size, traditional_renders/*_stats.txt) ------------
    # At 3.8M camera samples the per-level dispatch overhead amortizes out;
    # this is the deployment-shape number (the 200x100 headline keeps the
    # reference-artifact config for comparability).
    try:
        # Deployment config (measured r4, scripts/profile_path3/4): ONE
        # fused dispatch with the wavefront sub-chunked inside the program
        # (lax.map) — small live sets schedule ~35%% better than the full
        # 3.84M-ray wavefront; exact reference math.
        def run_trad_big(k=key):
            return render_path(scene, k, width=800, height=600, spp=8,
                               max_bounces=MB, spp_chunk=1,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="fused")

        bdt, (bimg, bstats) = time_steady(run_trad_big)
        b_rps = int(bstats.total_rays) / bdt
        log(f"traditional 800x600@8spp: {bdt*1e3:.1f} ms/frame, "
            f"{int(bstats.total_rays):,} rays, {b_rps/1e6:.2f} Mrays/s")
        extra["path_800x600_traditional_rays_per_sec"] = round(b_rps, 1)
        extra["path_800x600_wall_ms"] = round(bdt * 1e3, 2)

        # Lean production tracer (impl="lean"): bit-identical image to
        # fused (tests/test_path.py), restructured to the measured TPU
        # cost profile — in-sweep attribute selects, scene literals,
        # unrolled levels + inline fold, ~240k-ray blocking
        # (scripts/profile_path4-8).  Wall headline is the better of the
        # two production configs this session (relay weather swings the
        # ranking between sessions; both recorded).
        def run_trad_big_lean(k=key):
            return render_path(scene, k, width=800, height=600, spp=8,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="lean")

        ldt, _ = time_steady(run_trad_big_lean)
        log(f"traditional 800x600@8spp lean: {ldt*1e3:.1f} ms/frame")
        extra["path_800x600_lean_wall_ms"] = round(ldt * 1e3, 2)

        # Whole-trace Pallas path kernel (core/pallas_path.py, round 5):
        # the whole frame walks all levels in VMEM — measured 44.4 ms wall
        # / 18.0 ms device vs 123.6 / 66.9 for fused+chunk.  Statistically
        # equivalent, not bit-pinned on TPU (compiler FMA divergence under
        # specular chaos, bounded ±4/255 at mb=8 — module docstring).
        pdt = float("inf")
        try:
            def run_trad_big_pallas(k=key):
                return render_path(scene, k, width=800, height=600, spp=8,
                                   max_bounces=MB,
                                   camera_position=p["camera_position"],
                                   mirror_threshold=0.0, impl="pallas")

            pdt, _ = time_steady(run_trad_big_pallas)
            log(f"traditional 800x600@8spp pallas: {pdt*1e3:.1f} ms/frame")
            extra["path_800x600_pallas_wall_ms"] = round(pdt * 1e3, 2)
        except Exception as e:                              # pragma: no cover
            log(f"800x600 pallas bench failed: {e!r}")
        extra["path_800x600_best_wall_ms"] = round(
            min(bdt, ldt, pdt) * 1e3, 2)

        # precision="fast" production mode (squared-radius test + rsqrt
        # direct lighting; measured max pixel delta 1/255 on 1e-5 of
        # pixels vs exact).
        def run_trad_big_fast(k=key):
            return render_path(scene, k, width=800, height=600, spp=8,
                               max_bounces=MB, spp_chunk=1,
                               camera_position=p["camera_position"],
                               mirror_threshold=0.0, impl="fused",
                               precision="fast")

        fdt, _ = time_steady(run_trad_big_fast)
        log(f"traditional 800x600@8spp fast: {fdt*1e3:.1f} ms/frame")
        extra["path_800x600_fast_wall_ms"] = round(fdt * 1e3, 2)
        if dguide is not None:
            def run_fbd_big(k=key, impl_="fused", **kw):
                return render_path(scene, k, width=800, height=600, spp=8,
                                   max_bounces=MB,
                                   camera_position=p["camera_position"],
                                   mirror_threshold=0.9, guide_fn=dguide,
                                   fb_prob=1.0, impl=impl_, **kw)

            fbdt, (fbimg, fbstats) = time_steady(
                lambda: run_fbd_big(spp_chunk=1))
            fb_b_rps = int(fbstats.total_rays) / fbdt
            log(f"fb-distilled 800x600@8spp: {fbdt*1e3:.1f} ms/frame, "
                f"{int(fbstats.total_rays):,} rays, {fb_b_rps/1e6:.2f} Mrays/s")
            extra["path_800x600_fb_distilled_fused_rays_per_sec"] = round(
                fb_b_rps, 1)
            # Guided Pallas kernel (in-kernel baked student, round 5):
            # measured 241.6 vs fused 400.1 ms at this shape — the best
            # guided impl at scale; the headline key takes the better.
            try:
                gpdt, (gpimg, gpstats) = time_steady(
                    lambda: run_fbd_big(impl_="pallas"))
                gp_rps = int(gpstats.total_rays) / gpdt
                log(f"fb-distilled 800x600@8spp pallas: {gpdt*1e3:.1f} ms, "
                    f"{gp_rps/1e6:.2f} Mrays/s, "
                    f"small_hits={int(gpstats.small_light_hits):,}")
                extra["path_800x600_fb_distilled_pallas_rays_per_sec"] = (
                    round(gp_rps, 1))
            except Exception as e:                          # pragma: no cover
                log(f"guided pallas bench failed: {e!r}")
                gp_rps = 0.0
            extra["path_800x600_fb_distilled_rays_per_sec"] = round(
                max(fb_b_rps, gp_rps), 1)
    except Exception as e:                                  # pragma: no cover
        log(f"800x600 path bench failed: {e!r}")

    # --- amortized device compute for the path tracer: marginal cost of
    # one more 800x600@8spp frame inside ONE program (the deployment
    # configuration: fused + sub-chunked wavefront, exact math) — the
    # north-star number (BASELINE.json <50 ms/frame target; VERDICT r3
    # item 1's done-bar is device <= 75 ms).
    try:
        import jax.numpy as _jnp
        from functools import partial as _p

        # Chains reduce the FULL image (sum(img), not a slice) so XLA
        # cannot dead-code any block/chunk of the frame — every recorded
        # device number covers the whole frame's compute.
        def make_chain(n, **kw):
            @jax.jit
            def prog(k):
                def one(kk):
                    img, _ = render_path(
                        scene, kk, width=800, height=600, spp=8,
                        max_bounces=MB,
                        camera_position=p["camera_position"],
                        mirror_threshold=0.0, **kw)
                    return _jnp.sum(img)
                return jax.lax.map(one, jax.random.split(k, n))
            return prog

        def device_ms(name, metric_key, **kw):
            c1, c4 = make_chain(1, **kw), make_chain(4, **kw)
            t1f, _ = time_steady(lambda: c1(key), iters=5)
            t4f, _ = time_steady(lambda: c4(key), iters=5)
            if t4f <= t1f:
                # Relay variance swamped the marginal cost — a 0-or-
                # negative delta would poison the driver-read metric.
                log(f"path {name} device measurement invalid this run "
                    f"(t1={t1f*1e3:.0f} ms, t4={t4f*1e3:.0f} ms)")
                return None
            pdev_ms = (t4f - t1f) / 3 * 1e3
            prays = 800 * 600 * 8                   # camera samples/frame
            log(f"path 800x600@8spp {name} device compute (amortized): "
                f"{pdev_ms:.1f} ms/frame "
                f"({prays/(pdev_ms/1e3)/1e6:.0f} Msamples/s)")
            extra[metric_key] = round(pdev_ms, 2)
            return pdev_ms

        dev_f = device_ms("fused+chunk", "path_800x600_fused_device_ms",
                          impl="fused", spp_chunk=1)
        dev_l = device_ms("lean", "path_800x600_lean_device_ms",
                          impl="lean")
        dev_p = None
        try:
            dev_p = device_ms("pallas", "path_800x600_pallas_device_ms",
                              impl="pallas")
        except Exception as e:                              # pragma: no cover
            log(f"pallas device bench failed: {e!r}")
        best_dev = min((x for x in (dev_f, dev_l, dev_p) if x is not None),
                       default=None)
        if best_dev is not None:
            extra["path_800x600_device_ms"] = round(best_dev, 2)
        device_ms("fast", "path_800x600_fast_device_ms",
                  impl="fused", spp_chunk=1, precision="fast")
        try:
            device_ms("pallas-fast", "path_800x600_pallas_fast_device_ms",
                      impl="pallas", precision="fast")
        except Exception as e:                              # pragma: no cover
            log(f"pallas-fast device bench failed: {e!r}")
    except Exception as e:                                  # pragma: no cover
        log(f"path device-compute bench failed: {e!r}")

    # --- secondary: 800x600 chandelier whitted frame (north star <50 ms) -
    try:
        from raytracer_tpu.render.camera import perspective_rays
        o, d = perspective_rays(800, 600, fov=60,
                                origin=p["camera_position"], variant="fb")

        def run_whitted():
            return render_whitted(scene, gl, pl, o, d, 600, 800,
                                  max_bounces=5, background=p["background"])

        wdt, _ = time_steady(run_whitted)
        log(f"whitted 800x600 (xla): {wdt*1e3:.1f} ms/frame "
            f"({800*600/wdt/1e6:.1f} Mrays/s primary)")
        extra["whitted_800x600_xla_ms"] = round(wdt * 1e3, 2)

        # Whole-trace Pallas kernel, same frame, same protocol (VERDICT r2
        # item 4: resolve the backend choice by one measurement protocol
        # and publish both numbers).  The headline whitted_800x600_ms is
        # the better of the two backends this session.
        pwdt = None
        try:
            def run_whitted_pallas():
                return render_whitted(scene, gl, pl, o, d, 600, 800,
                                      max_bounces=5,
                                      background=p["background"],
                                      impl="pallas")

            pwdt, _ = time_steady(run_whitted_pallas)
            log(f"whitted 800x600 (pallas): {pwdt*1e3:.1f} ms/frame "
                f"({800*600/pwdt/1e6:.1f} Mrays/s primary)")
            extra["whitted_800x600_pallas_ms"] = round(pwdt * 1e3, 2)
        except Exception as e:                              # pragma: no cover
            log(f"whitted pallas bench failed: {e!r}")
        extra["whitted_800x600_ms"] = round(
            min(wdt, pwdt if pwdt is not None else float("inf")) * 1e3, 2)

        # Amortized device compute: this environment's tunneled TPU adds a
        # ~25-30 ms fixed per-dispatch cost for programs of this family
        # (measured independent of ray count, op count, and data size —
        # STATUS.md), so the honest per-frame DEVICE time is the marginal
        # cost of one more frame inside a single program: (t(5) - t(1))/4.
        import jax.numpy as jnp
        from functools import partial as _partial
        from raytracer_tpu.render.renderer import material_flags
        from raytracer_tpu.trace.whitted import trace_whitted
        eg, em = material_flags(scene)

        @_partial(jax.jit, static_argnames=("n",))
        def chain(o, d, n):
            acc = jnp.zeros(())
            for _ in range(n):
                r = trace_whitted(scene, o + 1e-12 * acc, d, max_bounces=5,
                                  enable_glass=eg, enable_mirror=em)
                acc = acc + jnp.sum(r.t[:8])
            return acc

        t1, _ = time_steady(lambda: chain(o, d, 1), iters=5)
        t5, _ = time_steady(lambda: chain(o, d, 5), iters=5)
        dev_ms = max(t5 - t1, 1e-6) / 4 * 1e3
        log(f"whitted 800x600 device compute (amortized): {dev_ms:.2f} ms "
            f"({800*600/(dev_ms/1e3)/1e6:.0f} Mrays/s primary)")
        extra["whitted_800x600_device_ms"] = round(dev_ms, 2)

        # Same amortized-chain protocol for the Pallas kernel.
        try:
            from raytracer_tpu.core.pallas_whitted import trace_whitted_pallas

            @_partial(jax.jit, static_argnames=("n",))
            def pchain(o, d, n):
                acc = jnp.zeros(())
                for _ in range(n):
                    r = trace_whitted_pallas(
                        scene, o + 1e-12 * acc, d, max_bounces=5,
                        enable_glass=eg, enable_mirror=em,
                        interpret=jax.default_backend() != "tpu")
                    acc = acc + jnp.sum(r.t[:8])
                return acc

            # Adaptive chain length: grow n until the marginal time is
            # >= 30 ms so the subtraction is measurable above relay noise
            # (kills the r3 "0.00 ms" artifact — a published measurement
            # must carry signal, VERDICT r3 item 2).
            pt1, _ = time_steady(lambda: pchain(o, d, 1), iters=5)
            pdev = None
            for n in (5, 17, 65):
                ptn, _ = time_steady(lambda: pchain(o, d, n), iters=5)
                if ptn - pt1 >= 0.030 or n == 65:
                    pdev = max(ptn - pt1, 0.0) / (n - 1) * 1e3
                    log(f"whitted 800x600 pallas device compute "
                        f"(amortized, n={n}): {pdev:.2f} ms")
                    break
            if pdev is not None and pdev > 0:
                extra["whitted_800x600_pallas_device_ms"] = round(pdev, 2)
            else:
                log("whitted pallas device compute below measurement "
                    "floor even at n=65; omitting the metric")
        except Exception as e:                              # pragma: no cover
            log(f"whitted pallas device bench failed: {e!r}")
    except Exception as e:                                  # pragma: no cover
        log(f"whitted bench failed: {e!r}")

    # --- secondary: glass+mirror Whitted scenes (the r1 perf tail) -------
    # planets2 at the notebook mega config (2001×2001, 10 bounces, real
    # refraction walk); marbles4 at 4× (801×801, 8 bounces, glass n=2).
    for name, fn, mult in (("planets2", library.planets2_scene, 10),
                           ("marbles4", library.marbles4_scene, 4)):
        try:
            s2, g2, p2, pr = fn()
            o2, d2, h2, w2 = grid_rays(pr["ray_count"], pr["ray_step"], mult,
                                       origin=pr["camera_position"])

            # Mega frames chunk at 1M rays/program: the whole-wavefront
            # live set of the 10-bounce refract walk exceeds HBM at 4M rays.
            chunk = 1 << 20 if h2 * w2 > (1 << 21) else None

            def run_scene(impl="xla", s2=s2, g2=g2, p2=p2, o2=o2, d2=d2,
                          h2=h2, w2=w2, pr=pr, chunk=chunk):
                return render_whitted(s2, g2, p2, o2, d2, h2, w2,
                                      max_bounces=pr["max_bounces"],
                                      background=pr["background"],
                                      miss_colour=pr.get("sky_colour"),
                                      chunk_rays=chunk, impl=impl)

            t0 = time.time()
            jax.block_until_ready(run_scene())
            log(f"{name} compile+run: {time.time() - t0:.1f}s")
            sdt, _ = time_steady(run_scene, iters=3)
            extra[f"{name}_xla_ms"] = round(sdt * 1e3, 2)
            # Whole-trace Pallas whitted kernel: at the mega shapes the
            # VMEM-resident walk wins (round 5 A/B: planets2 73.4→50.4 ms,
            # marbles4 30.7→28.3 — the 800×600 "XLA wins" verdict was a
            # dispatch-floor-dominated shape).  Headline = better of two.
            pdt = float("inf")
            try:
                pdt, _ = time_steady(lambda: run_scene("pallas"), iters=3)
                extra[f"{name}_pallas_ms"] = round(pdt * 1e3, 2)
            except Exception as e:                          # pragma: no cover
                log(f"{name} pallas bench failed: {e!r}")
            best = min(sdt, pdt)
            rps = h2 * w2 / best
            log(f"{name} {w2}x{h2} whitted: xla {sdt*1e3:.1f} / pallas "
                f"{pdt*1e3:.1f} ms → {best*1e3:.1f} ms/frame "
                f"({rps/1e6:.2f} Mrays/s primary)")
            extra[f"{name}_primary_rays_per_sec"] = round(rps, 1)
            extra[f"{name}_ms"] = round(best * 1e3, 2)
        except Exception as e:                              # pragma: no cover
            log(f"{name} bench failed: {e!r}")

    # Final line: identical headline fields + the full surface, so the
    # driver's parse is the same whichever JSON line it picks up.
    print(json.dumps({**headline, "extra": extra}), flush=True)


if __name__ == "__main__":
    main()
