"""Round-5 measurement campaign: guided-vs-traditional apples-to-apples.

VERDICT r4 items 1/2's measurement half, item 7 (lean 200x100 anomaly), and
item 6 (planets2/marbles4 drift) in ONE TPU session so relay weather cannot
confound the A/B (STATUS.md environment lesson: interleave comparisons).

Variants at the reference comparison config (200x100 @ 8spp, 8 bounces,
chandelier — chandelier_comparison_*/statistics.json):

  traditional  x {fused, stepwise, lean}         (mirror_threshold=0.0)
  distilled    x {fused, stepwise, lean}         (mirror_threshold=0.9)
  registry     x {fused, stepwise}
  full agent   x {stepwise}  (+ fused attempt w/ compile-time recorded)

plus 800x600 @ 8spp: traditional fused+chunk vs distilled {fused+chunk, lean}.

Usage:  python scripts/measure_guided_ab.py [--skip-big] [--iters N]
Writes /tmp/guided_ab.json and prints a table to stderr.
"""
import argparse
import json
import os
import sys
import time

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_steady(fn, iters, warmup=1):
    compile_s = None
    for i in range(warmup):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        compile_s = time.perf_counter() - t0
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, compile_s, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from raytracer_tpu.render.path_renderer import render_path
    from raytracer_tpu.scene import library
    from raytracer_tpu.fb.inference import TrainedFBAgent, small_light_indices
    from raytracer_tpu.fb.distill import DistilledGuide
    from raytracer_tpu.fb.registry import guide_for

    log(f"devices: {jax.devices()}")
    scene, gl, pl, p = library.chandelier_scene()
    key = jax.random.key(0)
    W, H, SPP, MB = 200, 100, 8, 8
    results = {}

    models_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    dguide = DistilledGuide.load(
        os.path.join(models_dir, "fb_chandelier_distilled.npz")).as_guide_fn()
    rguide = guide_for("chandelier", W, H)
    idx = small_light_indices(scene)
    fguide = TrainedFBAgent(None, scene, idx, p["camera_position"]).as_guide_fn()

    def run(impl, guide=None, mt=0.0, w=W, h=H, **kw):
        def f(k=key):
            return render_path(scene, k, width=w, height=h, spp=SPP,
                               max_bounces=MB,
                               camera_position=p["camera_position"],
                               mirror_threshold=mt, guide_fn=guide,
                               fb_prob=1.0 if guide is not None else 0.0,
                               impl=impl, **kw)
        return f

    def bench(name, fn, iters=None):
        try:
            dt, comp, (img, stats) = time_steady(fn, iters or args.iters)
            rays = int(stats.total_rays)
            sh = int(stats.small_light_hits)
            results[name] = {"wall_ms": round(dt * 1e3, 2),
                             "compile_s": round(comp, 1),
                             "rays": rays, "small_hits": sh,
                             "rays_per_sec": round(rays / dt, 1)}
            log(f"{name:34s} {dt*1e3:8.1f} ms  {rays/dt/1e6:7.1f} Mrays/s "
                f"small_hits={sh:5d}  (first-call {comp:.1f}s)")
        except Exception as e:
            results[name] = {"error": repr(e)}
            log(f"{name:34s} FAILED: {e!r}")

    # --- 200x100 family: interleaved, one session ---
    bench("trad_fused", run("fused"))
    bench("trad_stepwise", run("stepwise"))
    bench("trad_lean", run("lean"))
    bench("distilled_fused", run("fused", dguide, 0.9))
    bench("distilled_stepwise", run("stepwise", dguide, 0.9))
    bench("distilled_lean", run("lean", dguide, 0.9))
    bench("registry_fused", run("fused", rguide, 0.9))
    bench("registry_stepwise", run("stepwise", rguide, 0.9))
    bench("full_stepwise", run("stepwise", fguide, 0.9))
    # Second pass on the headline pair to confirm weather stability.
    bench("trad_fused_rpt", run("fused"))
    bench("distilled_fused_rpt", run("fused", dguide, 0.9))

    if not args.skip_big:
        bench("big_trad_fused_chunk",
              run("fused", w=800, h=600, spp_chunk=1), iters=5)
        bench("big_distilled_fused_chunk",
              run("fused", dguide, 0.9, w=800, h=600, spp_chunk=1), iters=5)
        bench("big_distilled_lean",
              run("lean", dguide, 0.9, w=800, h=600), iters=5)
        bench("big_trad_lean", run("lean", w=800, h=600), iters=5)

    # Full-agent fused compile attempt: bounded, recorded either way.
    log("attempting full-agent fused compile (bounded by relay)...")
    t0 = time.perf_counter()
    try:
        f = run("fused", fguide, 0.9)
        jax.block_until_ready(f()[0])
        comp = time.perf_counter() - t0
        dt, _, (img, stats) = time_steady(f, args.iters)
        results["full_fused"] = {
            "wall_ms": round(dt * 1e3, 2), "compile_s": round(comp, 1),
            "rays": int(stats.total_rays),
            "small_hits": int(stats.small_light_hits),
            "rays_per_sec": round(int(stats.total_rays) / dt, 1)}
        log(f"full_fused: {dt*1e3:.1f} ms (compile {comp:.1f}s)")
    except Exception as e:
        results["full_fused"] = {"error": repr(e),
                                 "compile_s": round(time.perf_counter() - t0, 1)}
        log(f"full_fused failed after {time.perf_counter()-t0:.0f}s: {e!r}")

    with open("/tmp/guided_ab.json", "w") as fh:
        json.dump(results, fh, indent=1)
    log("wrote /tmp/guided_ab.json")

    # bench.py speedup semantics: rays/s ratio (ray counts differ between
    # the mirror_threshold=0.0 traditional and =0.9 guided branch profiles).
    tr = results.get("trad_fused", {}).get("rays_per_sec")
    for k in ("distilled_fused", "distilled_lean", "registry_fused",
              "distilled_stepwise", "full_stepwise", "full_fused"):
        if tr and results.get(k, {}).get("rays_per_sec"):
            log(f"speedup {k} vs trad_fused: "
                f"{results[k]['rays_per_sec'] / tr:.3f}")


if __name__ == "__main__":
    main()
