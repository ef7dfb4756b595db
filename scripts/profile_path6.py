"""Part 6: is the lean kernel's win from structure or from baking the
sphere table as compile-time constants?  Times the V7 lean renderer
(profile_path5) with (a) scene scalars as literals and (b) scene scalars
read from the traced scene arrays, plus (c) literals + f32 best-index
(V2 showed the i32 select chain alone costs ~23 ms).
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
BG = (2.0, 2.0, 5.0)


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
    cnp = np.asarray(scene.centre)
    rnp = np.asarray(scene.radius)
    colnp = np.asarray(scene.colour)
    emnp = np.asarray(scene.emitive) > 0
    smnp = emnp & (rnp < 0.5)
    mrnp = np.asarray(scene.reflective) > 0.0
    SPH_CONST = [(float(cnp[s, 0]), float(cnp[s, 1]), float(cnp[s, 2]),
                  float(rnp[s]), float(colnp[s, 0]), float(colnp[s, 1]),
                  float(colnp[s, 2]), bool(emnp[s]), bool(smnp[s]),
                  bool(mrnp[s])) for s in range(N)]
    EMI = [s for s in range(N) if emnp[s]]

    def make_prog(mode):
        # mode: "const", "traced", "const-f32idx"
        f32idx = mode == "const-f32idx"

        @jax.jit
        def prog(scene, key):
            if mode == "traced":
                sph = [(scene.centre[s, 0], scene.centre[s, 1],
                        scene.centre[s, 2], scene.radius[s],
                        scene.colour[s, 0], scene.colour[s, 1],
                        scene.colour[s, 2], float(emnp[s]), float(smnp[s]),
                        float(mrnp[s])) for s in range(N)]
            else:
                sph = SPH_CONST
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
                    inf = jnp.float32(jnp.inf)
                    best_m = jnp.full_like(ox, inf)
                    best_t = jnp.zeros_like(ox)
                    bi0 = (jnp.zeros_like(ox) if f32idx
                           else jnp.zeros(ox.shape, jnp.int32))
                    best_i = bi0
                    ar = jnp.zeros_like(ox); ag = jnp.zeros_like(ox)
                    ab2 = jnp.zeros_like(ox)
                    bcx = jnp.zeros_like(ox); bcy = jnp.zeros_like(ox)
                    bcz = jnp.zeros_like(ox)
                    em = jnp.zeros_like(ox); sm = jnp.zeros_like(ox)
                    mr = jnp.zeros_like(ox)
                    for s, (cx, cy, cz, r, colr, colg, colb, e, smf, mf) \
                            in enumerate(sph):
                        lx, ly, lz = cx - ox, cy - oy, cz - oz
                        tca = lx * dx + ly * dy + lz * dz
                        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz
                                         - tca * tca, 0.0)
                        thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
                        t = tca - thc
                        valid = (tca >= 0.0) & (d2 <= r * r)
                        m = jnp.where(valid, jnp.abs(t), inf)
                        better = m < best_m
                        best_m = jnp.where(better, m, best_m)
                        best_t = jnp.where(better, t, best_t)
                        best_i = jnp.where(better,
                                           float(s) if f32idx else s, best_i)
                        bcx = jnp.where(better, cx, bcx)
                        bcy = jnp.where(better, cy, bcy)
                        bcz = jnp.where(better, cz, bcz)
                        ar = jnp.where(better, colr, ar)
                        ag = jnp.where(better, colg, ag)
                        ab2 = jnp.where(better, colb, ab2)
                        em = jnp.where(better, e * 1.0, em)
                        sm = jnp.where(better, smf * 1.0, sm)
                        mr = jnp.where(better, mf * 1.0, mr)
                    found = best_m < inf
                    px = ox + dx * best_t
                    py = oy + dy * best_t
                    pz = oz + dz * best_t
                    vx, vy, vz = px - bcx, py - bcy, pz - bcz
                    nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
                    den = jnp.maximum(nrm, 1e-20)
                    nx, ny, nz = vx / den, vy / den, vz / den
                    dr = jnp.zeros_like(ox); dg = jnp.zeros_like(ox)
                    db2 = jnp.zeros_like(ox)
                    for si in EMI:
                        scx, scy, scz = sph[si][0], sph[si][1], sph[si][2]
                        colr, colg, colb = sph[si][4], sph[si][5], sph[si][6]
                        tx, ty, tz = scx - px, scy - py, scz - pz
                        d2l = tx * tx + ty * ty + tz * tz
                        inv = jax.lax.rsqrt(jnp.maximum(d2l, 1e-30))
                        ldotn = tx * nx + ty * ny + tz * nz
                        w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
                        skip = (best_i != (float(si) if f32idx else si))
                        w = jnp.where(skip, w, 0.0)
                        dr = dr + jnp.trunc(w * colr)
                        dg = dg + jnp.trunc(w * colg)
                        db2 = db2 + jnp.trunc(w * colb)
                    fnd = running & found
                    emis = fnd & (em > 0)
                    mirror = fnd & ~emis & (mr > 0)
                    cont = mirror
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
                    stats.append((jnp.sum(running), jnp.sum(fnd),
                                  jnp.sum(emis), jnp.sum(fnd & (sm > 0))))
                    running = running & cont
                    recs.append((state, ar, ag, ab2, dr, dg, db2))
                vr = jnp.full((RB,), BG[0], jnp.float32)
                vg = jnp.full((RB,), BG[1], jnp.float32)
                vb = jnp.full((RB,), BG[2], jnp.float32)
                for state, ar, ag, ab2, dr, dg, db2 in reversed(recs):
                    cr = jnp.trunc(ar * jnp.minimum(255.0, dr + vr) / 255.0)
                    cg = jnp.trunc(ag * jnp.minimum(255.0, dg + vg) / 255.0)
                    cb = jnp.trunc(ab2 * jnp.minimum(255.0, db2 + vb) / 255.0)
                    is_cont = state == 3.0
                    is_emis = state == 2.0
                    is_miss = state == 1.0
                    vr = jnp.where(is_cont, cr, vr)
                    vg = jnp.where(is_cont, cg, vg)
                    vb = jnp.where(is_cont, cb, vb)
                    vr = jnp.where(is_emis, ar, vr)
                    vg = jnp.where(is_emis, ag, vg)
                    vb = jnp.where(is_emis, ab2, vb)
                    vr = jnp.where(is_miss, BG[0], vr)
                    vg = jnp.where(is_miss, BG[1], vg)
                    vb = jnp.where(is_miss, BG[2], vb)
                st = jnp.stack([sum(s[i] for s in stats) for i in range(4)])
                return jnp.stack([vr, vg, vb], -1), st

            outs, st = jax.lax.map(one, (ob, db_))
            img = _assemble(outs.reshape(-1, 3), spp=SPP, height=H, width=W)
            return img, jnp.sum(st, 0)
        return prog

    ref = None
    for mode in ("const", "const-f32idx", "traced"):
        prog = make_prog(mode)
        t0 = time.perf_counter()
        img, st = prog(scene, key)
        jax.block_until_ready(img)
        print(f"{mode}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = time_steady(lambda: prog(scene, key)[0])
        print(f"{mode:12s}: {dt*1e3:7.1f} ms wall  "
              f"stats={[int(x) for x in st]}", flush=True)
        a = np.asarray(img)
        if ref is None:
            ref = a
        else:
            d = np.abs(a - ref)
            print(f"  vs const: max {d.max():.5f} frac {(d>1e-6).mean():.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
