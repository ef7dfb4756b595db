"""Pallas TPU kernel: the ENTIRE Whitted trace in one VMEM-resident pass.

The XLA wavefront tracer (trace/whitted.py) runs each recursion level as a
fused elementwise sweep, but XLA splits the ~5k-op level body into many
loop fusions whose [R]-sized intermediates round-trip HBM.  Here a tile of
rays loads once, walks ALL recursion levels (nearest-sphere sweep, mirror
bounce, glass refraction walk, reflective-fallback bookkeeping) in VMEM
registers, and writes the terminal intersection once — HBM traffic is the
theoretical minimum (read o/d, write the result).

Semantics match :func:`raytracer_tpu.trace.whitted.trace_whitted` (the
reference recursion: budget/miss → fallback-or-none, mirror fallback
unwind, ≤10-step TIR walk, ``== 1.0`` material rule) and are
equality-tested against it in tests/test_pallas_whitted.py.

Mosaic constraints observed (STATUS.md): no i1 vector loop carries — all
fori_loop carries are f32/i32; masks inside a level are fine because the
level loop is a Python unroll.  The refraction walk is a fixed 10-step
unroll gated per level on a scalar any-glass predicate via lax.cond.

Measured (1x v5e, 800x600 chandelier frame, max_bounces=5, one protocol
same session — bench.py publishes both every run):

* wall-clock single dispatch: XLA 26.1 ms vs Pallas 26.6 ms — parity;
  both sit on this environment's ~25 ms per-dispatch relay floor (an
  earlier session recorded Pallas at 6.9 ms wall, which did not
  reproduce under the same-session protocol — relay weather, see
  STATUS.md "per-dispatch floor").
* device compute, amortized over an in-program chain: XLA ~1.1 ms vs
  Pallas ~1.7 ms — XLA's loop fusions win once the layout is
  componentized, so the XLA tracer stays the default at this shape and
  the kernel ships as the equality-tested alternative backend
  (``render_whitted(..., impl="pallas")``).

Round-5 addendum: that verdict is SHAPE-DEPENDENT.  At the notebook mega
shapes the VMEM-resident walk wins the wall-clock — planets2 2001×2001
@10 bounces: XLA 73.4 ms → Pallas **50.4 ms**; marbles4 801×801: 30.7 →
28.3 (same-session best-of-5) — the 800×600 comparison was
dispatch-floor-dominated (device ~1 ms either way).  bench.py measures
both per scene and publishes the better (``{planets2,marbles4}_ms``),
matching the whole-trace PATH kernel's result (core/pallas_path.py).

Reference hot loop being replaced either way: ~58 s of per-pixel Python
recursion (RL/ray.py:160-231).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene.types import Scene

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except ImportError:                                     # pragma: no cover
    HAVE_PALLAS = False

TILE = 2048
ROWS = TILE // 128
BIG = 3.0e38

# Status codes (match trace/whitted.py).
ACTIVE, DONE_HIT, DONE_NONE = 0.0, 1.0, 2.0


def _normalise3(x, y, z, eps=1e-20):
    m = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x / m, y / m, z / m


def _reflect3(vx, vy, vz, nx, ny, nz):
    # trace/whitted.py uses vec.reflect_c: normalise both, reflect,
    # renormalise.  Inputs here are already unit; keep the renormalise for
    # numeric parity.
    vx, vy, vz = _normalise3(vx, vy, vz)
    nx, ny, nz = _normalise3(nx, ny, nz)
    s = 2.0 * (vx * nx + vy * ny + vz * nz)
    return _normalise3(vx - nx * s, vy - ny * s, vz - nz * s)


def _refract3(vx, vy, vz, nx, ny, nz, eta):
    """Returns (dx, dy, dz, tir_mask_f32)."""
    vx, vy, vz = _normalise3(vx, vy, vz)
    nx, ny, nz = _normalise3(nx, ny, nz)
    cos_i = jnp.abs(jnp.clip(vx * nx + vy * ny + vz * nz, -1.0, 1.0))
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = (k < 0.0).astype(jnp.float32)
    f = eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))
    ox, oy, oz = _normalise3(vx * eta + nx * f, vy * eta + ny * f,
                             vz * eta + nz * f)
    return ox, oy, oz, tir


def _sphere_exit(ox, oy, oz, dx, dy, dz, cx, cy, cz, r):
    """point=1 (far root) intersection against the lane's own sphere."""
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    tca = lx * dx + ly * dy + lz * dz
    d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
    thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
    t = tca + thc
    px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
    nx, ny, nz = _normalise3(px - cx, py - cy, pz - cz)
    return px, py, pz, nx, ny, nz


def _kernel(nspheres, max_bounces, enable_glass, enable_mirror, by_abs,
            rays_ref, sph_ref, out_ref):
    f32 = jnp.float32
    # rays_ref rows: [ox oy oz dx dy dz sup] x ROWS each.
    def row(i):
        return rays_ref[i * ROWS:(i + 1) * ROWS, :]

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    sup = row(6)

    shape = ox.shape
    zero = jnp.zeros(shape, f32)
    status = zero                                   # ACTIVE
    bounces = zero
    through = zero
    # Terminal result + reflective fallback, all f32.
    r_idx, r_t, r_bn, r_th = zero, zero, zero, zero
    r_px, r_py, r_pz = zero, zero, zero
    r_nx, r_ny, r_nz = zero, zero, zero
    fb_ok = zero                                    # 0/1 fallback-valid
    f_idx, f_t, f_bn, f_th = zero, zero, zero, zero
    f_px, f_py, f_pz = zero, zero, zero
    f_nx, f_ny, f_nz = zero, zero, zero

    state = (ox, oy, oz, dx, dy, dz, sup, status, bounces, through,
             r_idx, r_t, r_bn, r_th, r_px, r_py, r_pz, r_nx, r_ny, r_nz,
             fb_ok, f_idx, f_t, f_bn, f_th, f_px, f_py, f_pz,
             f_nx, f_ny, f_nz)

    def level_body(state):
        (ox, oy, oz, dx, dy, dz, sup, status, bounces, through,
         r_idx, r_t, r_bn, r_th, r_px, r_py, r_pz, r_nx, r_ny, r_nz,
         fb_ok, f_idx, f_t, f_bn, f_th, f_px, f_py, f_pz,
         f_nx, f_ny, f_nz) = state
        # ---- nearest-sphere sweep (carries also the winning sphere's
        # centre/radius/material columns so no gather is needed) ----------
        def sweep(n, carry):
            (bm, bt, bi, bcx, bcy, bcz, br, bior, bmir, bgls) = carry
            cx = sph_ref[n, 0]
            cy = sph_ref[n, 1]
            cz = sph_ref[n, 2]
            r = sph_ref[n, 3]
            sid = sph_ref[n, 4]
            ior = sph_ref[n, 5]
            mir = sph_ref[n, 6]
            gls = sph_ref[n, 7]
            lx, ly, lz = cx - ox, cy - oy, cz - oz
            tca = lx * dx + ly * dy + lz * dz
            d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
            r2 = r * r
            thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
            t = tca - thc
            valid = (tca >= 0.0) & (d2 <= r2) & (sid != sup)
            metric = jnp.abs(t) if by_abs else t
            metric = jnp.where(valid, metric, BIG)
            better = metric < bm
            bm = jnp.where(better, metric, bm)
            bt = jnp.where(better, t, bt)
            bi = jnp.where(better, f32(0.0) + n, bi)
            bcx = jnp.where(better, cx, bcx)
            bcy = jnp.where(better, cy, bcy)
            bcz = jnp.where(better, cz, bcz)
            br = jnp.where(better, r, br)
            bior = jnp.where(better, ior, bior)
            bmir = jnp.where(better, mir, bmir)
            bgls = jnp.where(better, gls, bgls)
            return (bm, bt, bi, bcx, bcy, bcz, br, bior, bmir, bgls)

        big = jnp.full(shape, BIG, f32)
        (bm, bt, bi, bcx, bcy, bcz, br, bior, bmir, bgls) = jax.lax.fori_loop(
            0, nspheres, sweep,
            (big, zero, zero, zero, zero, zero, jnp.ones(shape, f32),
             jnp.ones(shape, f32), zero, zero))
        found = bm < BIG
        hpx, hpy, hpz = ox + dx * bt, oy + dy * bt, oz + dz * bt
        hnx, hny, hnz = _normalise3(hpx - bcx, hpy - bcy, hpz - bcz)

        active = status == ACTIVE
        fail = active & (~found | (bounces > f32(max_bounces)))
        use_fb = fail & (fb_ok > 0.5)

        def sel(m, a, b):
            return jnp.where(m, a, b)

        r_idx = sel(use_fb, f_idx, r_idx)
        r_t = sel(use_fb, f_t, r_t)
        r_bn = sel(use_fb, f_bn, r_bn)
        r_th = sel(use_fb, f_th, r_th)
        r_px = sel(use_fb, f_px, r_px)
        r_py = sel(use_fb, f_py, r_py)
        r_pz = sel(use_fb, f_pz, r_pz)
        r_nx = sel(use_fb, f_nx, r_nx)
        r_ny = sel(use_fb, f_ny, r_ny)
        r_nz = sel(use_fb, f_nz, r_nz)
        status = sel(fail, jnp.where(fb_ok > 0.5, DONE_HIT, DONE_NONE),
                     status)

        live = active & ~fail
        mirror = live & (bmir > 0.5) if enable_mirror else live & False
        glass = (live & ~mirror & (bgls > 0.5)) if enable_glass \
            else live & False
        terminal = live & ~mirror & ~glass

        r_idx = sel(terminal, bi, r_idx)
        r_t = sel(terminal, bt, r_t)
        r_bn = sel(terminal, bounces, r_bn)
        r_th = sel(terminal, through, r_th)
        r_px = sel(terminal, hpx, r_px)
        r_py = sel(terminal, hpy, r_py)
        r_pz = sel(terminal, hpz, r_pz)
        r_nx = sel(terminal, hnx, r_nx)
        r_ny = sel(terminal, hny, r_ny)
        r_nz = sel(terminal, hnz, r_nz)
        status = sel(terminal, jnp.full(shape, DONE_HIT), status)

        if enable_mirror:
            fb_ok = sel(mirror, jnp.ones(shape, f32), fb_ok)
            f_idx = sel(mirror, bi, f_idx)
            f_t = sel(mirror, bt, f_t)
            f_bn = sel(mirror, bounces, f_bn)
            f_th = sel(mirror, through, f_th)
            f_px = sel(mirror, hpx, f_px)
            f_py = sel(mirror, hpy, f_py)
            f_pz = sel(mirror, hpz, f_pz)
            f_nx = sel(mirror, hnx, f_nx)
            f_ny = sel(mirror, hny, f_ny)
            f_nz = sel(mirror, hnz, f_nz)
            rlx, rly, rlz = _reflect3(dx, dy, dz, hnx, hny, hnz)

        if enable_glass:
            # sphereExitRay: refract in, ≤10 internal TIR reflections,
            # refract out (RL/ray.py:109-157).  Fixed 10-step unroll with
            # f32 masks (no i1 carries, no data-dependent trip count),
            # skipped for tiles with no refracting lane this level (a
            # scalar-predicate cond — most levels in mixed scenes).
            def do_walk(_):
                rdx, rdy, rdz, tir_in = _refract3(dx, dy, dz,
                                                  hnx, hny, hnz, 1.0 / bior)
                epx, epy, epz, enx, eny, enz = _sphere_exit(
                    hpx, hpy, hpz, rdx, rdy, rdz, bcx, bcy, bcz, br)
                exited = zero
                wpx, wpy, wpz = zero, zero, zero
                wdx, wdy, wdz = zero, zero, zero
                for _w in range(10):
                    exdx, exdy, exdz, tir = _refract3(rdx, rdy, rdz,
                                                      -enx, -eny, -enz, bior)
                    newly = (exited < 0.5) & (tir < 0.5)
                    wpx = sel(newly, epx, wpx)
                    wpy = sel(newly, epy, wpy)
                    wpz = sel(newly, epz, wpz)
                    wdx = sel(newly, exdx, wdx)
                    wdy = sel(newly, exdy, wdy)
                    wdz = sel(newly, exdz, wdz)
                    exited = jnp.maximum(exited, newly.astype(f32))
                    rlx2, rly2, rlz2 = _reflect3(rdx, rdy, rdz,
                                                 enx, eny, enz)
                    npx, npy, npz, nnx, nny, nnz = _sphere_exit(
                        epx, epy, epz, rlx2, rly2, rlz2, bcx, bcy, bcz, br)
                    still = exited < 0.5
                    rdx = sel(still, rlx2, rdx)
                    rdy = sel(still, rly2, rdy)
                    rdz = sel(still, rlz2, rdz)
                    epx = sel(still, npx, epx)
                    epy = sel(still, npy, epy)
                    epz = sel(still, npz, epz)
                    enx = sel(still, nnx, enx)
                    eny = sel(still, nny, eny)
                    enz = sel(still, nnz, enz)
                okf = ((exited > 0.5) & (tir_in < 0.5)).astype(f32)
                return okf, wpx, wpy, wpz, wdx, wdy, wdz

            def no_walk(_):
                ones = jnp.ones(shape, f32)
                return ones, zero, zero, zero, zero, zero, zero

            (walk_okf, wpx, wpy, wpz, wdx, wdy, wdz) = jax.lax.cond(
                jnp.any(glass), do_walk, no_walk, operand=None)
            walk_ok = walk_okf > 0.5
            trapped = glass & ~walk_ok
            use_fb2 = trapped & (fb_ok > 0.5)
            r_idx = sel(use_fb2, f_idx, r_idx)
            r_t = sel(use_fb2, f_t, r_t)
            r_bn = sel(use_fb2, f_bn, r_bn)
            r_th = sel(use_fb2, f_th, r_th)
            r_px = sel(use_fb2, f_px, r_px)
            r_py = sel(use_fb2, f_py, r_py)
            r_pz = sel(use_fb2, f_pz, r_pz)
            r_nx = sel(use_fb2, f_nx, r_nx)
            r_ny = sel(use_fb2, f_ny, r_ny)
            r_nz = sel(use_fb2, f_nz, r_nz)
            status = sel(trapped,
                         jnp.where(fb_ok > 0.5, DONE_HIT, DONE_NONE),
                         status)
            glass = glass & walk_ok

        # Advance continuing lanes.
        if enable_mirror and enable_glass:
            cont = mirror | glass
            ox = sel(mirror, hpx, sel(glass, wpx, ox))
            oy = sel(mirror, hpy, sel(glass, wpy, oy))
            oz = sel(mirror, hpz, sel(glass, wpz, oz))
            dx = sel(mirror, rlx, sel(glass, wdx, dx))
            dy = sel(mirror, rly, sel(glass, wdy, dy))
            dz = sel(mirror, rlz, sel(glass, wdz, dz))
        elif enable_mirror:
            cont = mirror
            ox = sel(mirror, hpx, ox)
            oy = sel(mirror, hpy, oy)
            oz = sel(mirror, hpz, oz)
            dx = sel(mirror, rlx, dx)
            dy = sel(mirror, rly, dy)
            dz = sel(mirror, rlz, dz)
        elif enable_glass:
            cont = glass
            ox = sel(glass, wpx, ox)
            oy = sel(glass, wpy, oy)
            oz = sel(glass, wpz, oz)
            dx = sel(glass, wdx, dx)
            dy = sel(glass, wdy, dy)
            dz = sel(glass, wdz, dz)
        else:
            cont = live & False
        if enable_mirror or enable_glass:
            # suppress id of the hit sphere: carried as f32 id column.
            sup = sel(cont, _take_id(sph_ref, bi, nspheres), sup)
            bounces = sel(cont, bounces + 1.0, bounces)
            if enable_glass:
                through = sel(glass, through + 1.0, through)

        return (ox, oy, oz, dx, dy, dz, sup, status, bounces, through,
                r_idx, r_t, r_bn, r_th, r_px, r_py, r_pz, r_nx, r_ny, r_nz,
                fb_ok, f_idx, f_t, f_bn, f_th, f_px, f_py, f_pz,
                f_nx, f_ny, f_nz)

    # Unrolled level loop; each level skips entirely (scalar cond) for
    # tiles whose lanes are all terminal — tile-granular wavefront
    # compaction with no host round-trips.  Level 0 always runs.
    state = level_body(state)
    for _level in range(1, max_bounces + 2):
        any_active = jnp.any(state[7] == ACTIVE)
        state = jax.lax.cond(any_active, level_body, lambda s: s, state)

    (ox, oy, oz, dx, dy, dz, sup, status, bounces, through,
     r_idx, r_t, r_bn, r_th, r_px, r_py, r_pz, r_nx, r_ny, r_nz,
     fb_ok, f_idx, f_t, f_bn, f_th, f_px, f_py, f_pz,
     f_nx, f_ny, f_nz) = state

    def wrow(i, v):
        out_ref[i * ROWS:(i + 1) * ROWS, :] = v

    wrow(0, status)
    wrow(1, r_idx)
    wrow(2, r_t)
    wrow(3, r_px)
    wrow(4, r_py)
    wrow(5, r_pz)
    wrow(6, r_nx)
    wrow(7, r_ny)
    wrow(8, r_nz)
    wrow(9, r_bn)
    wrow(10, r_th)


def _take_id(sph_ref, idx_f, nspheres):
    """sphere id by (float) index — unrolled select chain over the table."""
    out = jnp.full(idx_f.shape, sph_ref[0, 4], jnp.float32)
    for s in range(1, nspheres):
        out = jnp.where(idx_f == jnp.float32(s), sph_ref[s, 4], out)
    return out


@partial(jax.jit, static_argnames=("max_bounces", "enable_glass",
                                   "enable_mirror", "by_abs", "interpret"))
def trace_whitted_pallas(scene: Scene, origins: jnp.ndarray,
                         dirs: jnp.ndarray, max_bounces: int = 1,
                         suppress_id: jnp.ndarray | None = None,
                         enable_glass: bool = True,
                         enable_mirror: bool = True,
                         by_abs: bool = False,
                         interpret: bool = False):
    """Whole-trace Pallas path.  Returns a
    :class:`raytracer_tpu.trace.whitted.TraceResult` (f32).  Camera-entry
    only (``bounces0``/``through0`` resume is not supported — env stepping
    keeps the XLA tracer)."""
    from ..core import vec
    from ..trace.whitted import NO_SUPPRESS, TraceResult

    R = origins.shape[0]
    d = vec.normalise_safe(dirs.astype(jnp.float32))
    o32 = origins.astype(jnp.float32)
    if suppress_id is None:
        sup = jnp.full((R,), jnp.float32(NO_SUPPRESS))
    else:
        sup = suppress_id.astype(jnp.float32)

    n_pad = (-R) % TILE
    Rp = R + n_pad
    grid_n = Rp // TILE

    def lay(a):                      # [Rp] -> per-tile (ROWS, 128) blocks
        return jnp.pad(a, (0, n_pad)).reshape(grid_n, ROWS, 128)

    comps = [lay(o32[:, 0]), lay(o32[:, 1]), lay(o32[:, 2]),
             lay(d[:, 0]), lay(d[:, 1]), lay(d[:, 2]), lay(sup)]
    rays = jnp.concatenate(comps, axis=1).reshape(grid_n * 7 * ROWS, 128)

    N = scene.num_spheres
    f32 = jnp.float32
    sph = jnp.stack([
        scene.centre[:, 0].astype(f32), scene.centre[:, 1].astype(f32),
        scene.centre[:, 2].astype(f32), scene.radius.astype(f32),
        scene.id.astype(f32),            # exact for |id| < 2^24
        scene.ior.astype(f32),
        (scene.reflective == 1.0).astype(f32),
        (scene.transparent == 1.0).astype(f32),
    ], axis=-1)                                           # [N, 8]

    out = pl.pallas_call(
        partial(_kernel, N, max_bounces, enable_glass, enable_mirror,
                by_abs),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((7 * ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # spheres, whole
        ],
        out_specs=pl.BlockSpec((11 * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * 11 * ROWS, 128), f32),
        interpret=interpret,
    )(rays, sph)

    out = out.reshape(grid_n, 11, ROWS * 128)

    def un(i):
        return out[:, i, :].reshape(Rp)[:R]

    status = un(0)
    return TraceResult(
        hit=status == DONE_HIT,
        idx=un(1).astype(jnp.int32),
        point=jnp.stack([un(3), un(4), un(5)], -1),
        normal=jnp.stack([un(6), un(7), un(8)], -1),
        t=un(2),
        bounces=un(9).astype(jnp.int32),
        through=un(10).astype(jnp.int32),
    )
