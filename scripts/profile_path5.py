"""Part 5: feature bisection of the fused path level kernel.

profile_path4: a minimal 29-sphere sweep over 480k rays x 8 levels runs AT
THE DISPATCH FLOOR (device ~free), while the production fused renderer
spends ~78-90 ms at the same work shape — the cost is in the surrounding
machinery, not the sweep.  This script rebuilds the renderer feature by
feature (Python-loop levels, rb=240k blocks, lax.map over blocks for the
full 800x600@8spp frame) and times each stage:

  V1  sweep only (+ camera rays)
  V2  + suppress-id compare, best_i, found
  V3  + hit point / normal construction (normalise)
  V4  + per-sphere attrs selected under `better` (albedo, em/small/mirror)
  V5  + bounce state logic (reflect, offset, masks, running)
  V6  + fast direct lighting (21 emissive spheres)
  V7  + per-level records, reverse fold, stats — a full lean renderer

All fast-mode math, traditional chandelier semantics (mirror_threshold=0,
no diffuse).  V7's image is cross-checked against render_path on a small
frame before timing the big one.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, SPP, MB = 800, 600, 8, 8
R_TOTAL = W * H * SPP
RB = 240000
NBLK = R_TOTAL // RB


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
    import numpy as np
    from raytracer_tpu.render.path_renderer import _assemble, _camera_bundle
    from raytracer_tpu.scene import library

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene, _, _, p = library.chandelier_scene()
    cam = jnp.asarray(p["camera_position"], jnp.float32)
    key = jax.random.key(0)
    N = scene.centre.shape[0]
    import numpy as _np
    SPH = [(float(scene.centre[s, 0]), float(scene.centre[s, 1]),
            float(scene.centre[s, 2]), float(scene.radius[s]),
            float(scene.colour[s, 0]), float(scene.colour[s, 1]),
            float(scene.colour[s, 2]),
            bool(scene.emitive[s] > 0),
            bool((scene.emitive[s] > 0) & (scene.radius[s] < 0.5)),
            bool(scene.reflective[s] > 0.0),
            int(scene.id[s])) for s in range(N)]
    EMI = [s for s in range(N) if SPH[s][7]]
    BG = (2.0, 2.0, 5.0)

    def level(stage, ox, oy, oz, dx, dy, dz, running):
        """One level at feature `stage`; returns updated carries + recs."""
        inf = jnp.float32(jnp.inf)
        best_m = jnp.full_like(ox, inf)
        best_t = jnp.zeros_like(ox)
        best_i = jnp.zeros(ox.shape, jnp.int32)
        ar = jnp.zeros_like(ox); ag = jnp.zeros_like(ox); ab = jnp.zeros_like(ox)
        bcx = jnp.zeros_like(ox); bcy = jnp.zeros_like(ox); bcz = jnp.zeros_like(ox)
        em = jnp.zeros_like(ox); sm = jnp.zeros_like(ox); mr = jnp.zeros_like(ox)
        for s, (cx, cy, cz, r, colr, colg, colb, e, smf, mf, sid) in enumerate(SPH):
            lx, ly, lz = cx - ox, cy - oy, cz - oz
            tca = lx * dx + ly * dy + lz * dz
            d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
            thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
            t = tca - thc
            valid = (tca >= 0.0) & (d2 <= r * r)
            m = jnp.where(valid, jnp.abs(t), inf)
            better = m < best_m
            best_m = jnp.where(better, m, best_m)
            best_t = jnp.where(better, t, best_t)
            if stage >= 2:
                best_i = jnp.where(better, s, best_i)
            if stage >= 3:
                bcx = jnp.where(better, cx, bcx)
                bcy = jnp.where(better, cy, bcy)
                bcz = jnp.where(better, cz, bcz)
            if stage >= 4:
                ar = jnp.where(better, colr, ar)
                ag = jnp.where(better, colg, ag)
                ab = jnp.where(better, colb, ab)
                em = jnp.where(better, float(e), em)
                sm = jnp.where(better, float(smf), sm)
                mr = jnp.where(better, float(mf), mr)
        found = best_m < inf
        out = [best_t, best_i.astype(jnp.float32)]
        px = py = pz = nx = ny = nz = None
        if stage >= 3:
            px = ox + dx * best_t
            py = oy + dy * best_t
            pz = oz + dz * best_t
            vx, vy, vz = px - bcx, py - bcy, pz - bcz
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            den = jnp.maximum(nrm, 1e-20)
            nx, ny, nz = vx / den, vy / den, vz / den
            out += [nx, ny, nz]
        dr = dg = db = None
        if stage >= 6:
            dr = jnp.zeros_like(ox); dg = jnp.zeros_like(ox); db = jnp.zeros_like(ox)
            for s in EMI:
                cx, cy, cz = SPH[s][0], SPH[s][1], SPH[s][2]
                colr, colg, colb = SPH[s][4], SPH[s][5], SPH[s][6]
                tx, ty, tz = cx - px, cy - py, cz - pz
                d2l = tx * tx + ty * ty + tz * tz
                inv = jax.lax.rsqrt(jnp.maximum(d2l, 1e-30))
                ldotn = tx * nx + ty * ny + tz * nz
                w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
                w = jnp.where(best_i != s, w, 0.0)
                dr = dr + jnp.trunc(w * colr)
                dg = dg + jnp.trunc(w * colg)
                db = db + jnp.trunc(w * colb)
        if stage >= 5:
            fnd = running & found
            emis = fnd & (em > 0)
            mirror = fnd & ~emis & (mr > 0)
            cont = mirror        # no diffuse in this scene/threshold
            ddn = dx * nx + dy * ny + dz * nz
            rlx = dx - 2.0 * ddn * nx
            rly = dy - 2.0 * ddn * ny
            rlz = dz - 2.0 * ddn * nz
            ox = jnp.where(cont, px + nx * 0.001, ox)
            oy = jnp.where(cont, py + ny * 0.001, oy)
            oz = jnp.where(cont, pz + nz * 0.001, oz)
            dx = jnp.where(cont, rlx, dx)
            dy = jnp.where(cont, rly, dy)
            dz = jnp.where(cont, rlz, dz)
            state = jnp.where(running,
                              jnp.where(emis, 2.0,
                                        jnp.where(cont, 3.0, 1.0)),
                              0.0)
            running = running & cont
            recs = (state, ar, ag, ab, dr, dg, db, fnd, emis,
                    fnd & (sm > 0))
            return ox, oy, oz, dx, dy, dz, running, recs
        return ox + best_t * dx * 1e-6, oy, oz, dx, dy, dz, running, tuple(out)

    def make_prog(stage):
        @jax.jit
        def prog(scene_unused, key):
            k_jit, _ = jax.random.split(key)
            o, d = _camera_bundle(k_jit, width=W, height=H, spp=SPP,
                                  fov=60.0, camera_position=cam)
            ob = o.reshape(NBLK, RB, 3)
            db_ = d.reshape(NBLK, RB, 3)

            def one(args):
                ob, dbb = args
                ox, oy, oz = ob[:, 0], ob[:, 1], ob[:, 2]
                dn = dbb / jnp.sqrt(jnp.sum(dbb * dbb, -1, keepdims=True))
                dx, dy, dz = dn[:, 0], dn[:, 1], dn[:, 2]
                running = jnp.ones((RB,), bool)
                recs = []
                stats = []
                for lv in range(MB):
                    ox, oy, oz, dx, dy, dz, running, rec = level(
                        stage, ox, oy, oz, dx, dy, dz, running)
                    if stage >= 5:
                        recs.append(rec[:7])
                        stats.append((jnp.sum(rec[7]), jnp.sum(rec[8]),
                                      jnp.sum(rec[9])))
                    else:
                        recs.append(rec)
                if stage < 7:
                    # consume everything cheaply
                    acc = jnp.zeros((), jnp.float32)
                    for rec in recs:
                        for a in rec:
                            if a is not None:
                                acc = acc + jnp.sum(a[:8].astype(jnp.float32))
                    return acc, jnp.zeros((3,), jnp.int32)
                # stage 7: reverse fold to sample colours + stats
                vr = jnp.full((RB,), BG[0], jnp.float32)
                vg = jnp.full((RB,), BG[1], jnp.float32)
                vb = jnp.full((RB,), BG[2], jnp.float32)
                for state, ar, ag, ab, dr, dg, db2 in reversed(recs):
                    cr = jnp.trunc(ar * jnp.minimum(255.0, dr + vr) / 255.0)
                    cg = jnp.trunc(ag * jnp.minimum(255.0, dg + vg) / 255.0)
                    cb = jnp.trunc(ab * jnp.minimum(255.0, db2 + vb) / 255.0)
                    is_cont = state == 3.0
                    is_emis = state == 2.0
                    is_miss = state == 1.0
                    vr = jnp.where(is_cont, cr, vr)
                    vg = jnp.where(is_cont, cg, vg)
                    vb = jnp.where(is_cont, cb, vb)
                    vr = jnp.where(is_emis, ar, vr)
                    vg = jnp.where(is_emis, ag, vg)
                    vb = jnp.where(is_emis, ab, vb)
                    vr = jnp.where(is_miss, BG[0], vr)
                    vg = jnp.where(is_miss, BG[1], vg)
                    vb = jnp.where(is_miss, BG[2], vb)
                st = jnp.stack([sum(s[i] for s in stats) for i in range(3)])
                return jnp.stack([vr, vg, vb], -1), st

            outs, st = jax.lax.map(one, (ob, db_))
            if stage < 7:
                return jnp.sum(outs), st
            img = _assemble(outs.reshape(-1, 3), spp=SPP, height=H, width=W)
            return img, jnp.sum(st, 0)
        return prog

    # correctness cross-check of V7 on a small frame vs render_path
    from raytracer_tpu.render.path_renderer import render_path
    img_ref, st_ref = render_path(scene, key, width=100, height=60, spp=2,
                                  max_bounces=MB,
                                  camera_position=p["camera_position"],
                                  mirror_threshold=0.0, precision="fast")
    global W, H, SPP, R_TOTAL, RB, NBLK
    W2, H2 = W, H
    # temporarily shrink for the check
    W, H, SPP, RB = 100, 60, 2, 100 * 60 * 2
    R_TOTAL, NBLK = W * H * SPP, 1
    prog_small = make_prog(7)
    img_small, st_small = prog_small(scene, key)
    d = np.abs(np.asarray(img_small) - np.asarray(img_ref))
    print(f"V7 small-frame check: max diff {d.max():.5f} "
          f"frac {(d > 1e-6).mean():.5f} "
          f"hits {int(st_small[1])} vs {int(st_ref.light_hits)}",
          flush=True)
    W, H, SPP = W2, H2, 8
    R_TOTAL = W * H * SPP
    RB = 240000
    NBLK = R_TOTAL // RB

    for stage in (1, 2, 3, 4, 5, 6, 7):
        prog = make_prog(stage)
        t0 = time.perf_counter()
        jax.block_until_ready(prog(scene, key)[0])
        print(f"V{stage}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(scene, key)[0])
        print(f"V{stage}: {dt*1e3:7.1f} ms wall", flush=True)


if __name__ == "__main__":
    main()
