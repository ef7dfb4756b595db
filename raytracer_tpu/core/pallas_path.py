"""Pallas TPU kernel: the ENTIRE path trace in one VMEM-resident pass.

The XLA tracers (trace/path.py fused/lean) run the 8-level chandelier frame
as loop fusions whose [R]-sized per-level intermediates round-trip HBM —
the measured ~62-66 ms device floor at 800x600@8spp (BENCH_r04) against a
~15 ms VPU flop estimate.  Here a tile of rays loads once, walks ALL levels
(nearest-sphere sweep with in-sweep attribute selection, direct lighting,
mirror bounce / cosine diffuse bounce) in VMEM, folds the level records in
reverse IN the kernel, and writes rgb + per-lane stats once — HBM traffic
is the theoretical minimum (read o/d + the RNG uniforms, write rgb/stats).

Semantics: exactly ``trace/path.py`` ``_trace_path_lean_impl`` (itself
bit-identical to the fused scan — same draws, same per-lane op order):

* nearest hit in tca/thc form, ``by_abs`` metric, no suppression
  (reference path tracers use the 0.001 normal offset instead,
  FB/fb_vs_traditional_complex.py:351);
* direct = Σ over emissive spheres of ``trunc(0.3·max(0,cosθ)/d²·colour)``
  skipping the hit sphere (complex.py:333-348);
* indirect: mirror reflect when ``reflective > mirror_threshold`` else the
  cosine-weighted diffuse bounce θ=arccos(√u₀), φ=2πu₁ in the "renderer"
  tangent frame (complex.py:355-366);
* fold ``trunc(albedo · min(255, direct + child)/255)`` from the deepest
  level back to the camera (complex.py:377-386).

RNG parity: the kernel consumes the SAME uniforms the fused scan draws
(the lean prologue's per-level ``split``/``uniform`` schedule), passed in
as an input plane.  No-diffuse configs (the chandelier traditional frame)
are bit-exact vs the XLA tracers in interpret mode (asserted in
tests/test_pallas_path.py).  Diffuse configs are ulp-close, not
bit-pinned: Mosaic has no ``acos`` lowering, so cosine sampling uses the
exact identities cosθ = √u₀ / sinθ = √(1−u₀) instead of the XLA
sin(arccos(√u₀)) chain (tests pin ≥95% subpixel equality + 2% stats).
Guided runs at fb_prob=1 keep MLP-mechanism bit-parity (one-hot test).

Compiled-TPU parity bound (measured, /tmp diverge probe 2026-08-21): at
max_bounces=1 the compiled kernel is bit-exact vs impl="fused" on TPU
(90,000/90,000 subpixels equal) — sweep, direct lighting, and fold agree
exactly.  At depth the two COMPILERS' fp op fusion (Mosaic vs XLA FMA
contraction in the bounce-direction math) differs by ~1 ulp per level,
which specular chaos amplifies: 200×150@2spp chandelier, ndiff/90k =
3.9k/12.6k/21.8k at mb=2/4/8 with max |Δ| = 1/2/4 (of 255) and hit
statistics within 0.02% (22,201 vs 22,198 small hits at 800×600@8spp).
Statistically equivalent, not bit-pinned on TPU — goldens stay on
fused/lean; this is the production-throughput mode.

Measured (1× v5e, 800×600@8spp chandelier traditional, best-of-10, one
session, scripts/profile_path.py prod): wall 44.4 ms / device 18.0 ms
exact, 39.3 / 13.7 with precision="fast" — vs the XLA production tracers'
123.6 / 66.9 (fused+chunk) and 128.2 / 66.2 (lean).  This clears the
BASELINE.json <50 ms north star on one chip, 3.7× device over XLA.

Scene scalars are baked as compile-time literals (``scene_spec`` rows),
the measured ~3x lever on the XLA lean tracer (STATUS.md round-4 lessons);
traced-scene configs fall back to the XLA impls at the trace_path router.

Mosaic constraints observed (see pallas_whitted.py): levels and the sweep
are Python-unrolled (bool masks inside a level are fine; no i1 loop
carries exist because there are no loops).

Guided tracing: a distilled STUDENT bakes into the kernel as
literal-weight madd chains (``student_guide_spec`` / ``_student_mlp``;
fb-gate uniforms as a third input channel) — measured 241.6 ms vs the
XLA fused guided tracer's 400.1 at 800×600@8spp with full hit parity.
Full (512-wide) agents keep the XLA impls.  The level-split alternative
(``run_level_kernel`` + trace/path.py ``impl="hybrid"``: per-level
kernels with the guide as an XLA/MXU matmul between them) measured 390
ms — a recorded negative (the inter-kernel HBM/layout glue costs what
the in-kernel MLP costs); it ships as the equality-tested
split-architecture reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except ImportError:                                     # pragma: no cover
    HAVE_PALLAS = False

TILE = 2048
ROWS = TILE // 128

# Input row-groups per tile: ox oy oz dx dy dz act  (+ 2 uniform rows per
# level when diffuse bounces are possible, + 1 fb-gate row per level when
# guided).
_NRAY = 7
# Output row-groups: r g b  running_cnt found_cnt emis_cnt small_cnt
# (+ fb_used_cnt fb_succ_cnt when guided).
_NOUT = 7


def _normalise3(x, y, z, eps=1e-20):
    # vec.normalise_safe_c: m = max(sqrt(x²+y²+z²), eps).
    m = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x / m, y / m, z / m


def _reflect3(vx, vy, vz, nx, ny, nz):
    # vec.reflect_c: normalise both, reflect, renormalise.
    vx, vy, vz = _normalise3(vx, vy, vz)
    nx, ny, nz = _normalise3(nx, ny, nz)
    s = 2.0 * (vx * nx + vy * ny + vz * nz)
    return _normalise3(vx - nx * s, vy - ny * s, vz - nz * s)


def _local_to_world(st, ct, phi, nx, ny, nz):
    # sampling.local_to_world_c, "renderer" convention: |n.z| > 0.9 →
    # tangent = (1,0,0) directly; else cross((0,0,1), n) = (-ny, nx, 0).
    # Takes (sinθ, cosθ) directly: Mosaic has no acos lowering, so the
    # cosine-sampling caller passes the algebraic identities
    # cosθ = √u₀, sinθ = √(1−u₀) — exact math for θ = arccos(√u₀); the
    # resulting directions differ from the XLA tracers'
    # sin(arccos(·))/cos(arccos(·)) by ulps (same documented
    # statistical-equivalence class as the FMA divergence).
    anz = jnp.abs(nz)
    above = anz > 0.9
    zero = jnp.zeros_like(nx)
    one = jnp.ones_like(nx)
    tx = jnp.where(above, one, -ny)
    ty = jnp.where(above, zero, nx)
    tz = zero
    tx, ty, tz = _normalise3(tx, ty, tz)
    # bitangent = normalise(cross(n, t))
    cx = ny * tz - nz * ty
    cy = nz * tx - nx * tz
    cz = nx * ty - ny * tx
    bx, by, bz = _normalise3(cx, cy, cz)
    lx = st * jnp.cos(phi)
    ly = st * jnp.sin(phi)
    lz = ct
    return _normalise3(lx * tx + ly * bx + lz * nx,
                       lx * ty + ly * by + lz * ny,
                       lx * tz + ly * bz + lz * nz)


def _student_mlp(var_cols, guide_spec, lvl_frac):
    """In-kernel distilled-student forward on component tiles.

    ``var_cols``: the 14 per-lane observation columns that vary (pos 3,
    incoming dir 3, normal 3, refl/transp/emit/ior, id/100) as
    (ROWS, 128) arrays, in make_observation's column order with the
    CONSTANT columns removed; their contribution — colour/255 = 0,
    through = 0, the 0.5 pads, and bounce = lvl/max_bounces (a per-LEVEL
    constant) — is folded into the layer-1 bias at trace time (exact:
    Python-float math, and zero-weight columns contribute exactly 0).

    ``guide_spec``: ((W, b), ...) literal layers from
    DistilledGuide params; relu between layers, raw output.  The
    sequential madd chain differs from XLA's dot reduction order by ulps
    (same class as the documented FMA divergence; bit-parity holds for
    one-hot weight columns, which the tests use).
    """
    VAR_IDX = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 18)
    CONST = {13: 0.0, 14: 0.0, 15: 0.0, 16: lvl_frac, 17: 0.0,
             19: 0.5, 20: 0.5, 21: 0.5}
    layers, gdtype = guide_spec
    bf16 = gdtype == "bfloat16"
    if bf16:
        # The deployed DistilledGuide runs obs+params in bf16 on purpose
        # (fb/distill.py as_guide_fn: the quantisation decorrelates the
        # deterministic policy's aim across spp — measured more hits).
        # Mirror the MXU semantics, not naive bf16 chains: QUANTISE
        # inputs/weights/constants to bf16 values but multiply-accumulate
        # in f32 (bf16×bf16 products are exact in f32; the MXU
        # accumulates in f32), rounding each LAYER's output to bf16 like
        # the flax Dense chain does.  A first cut accumulated in bf16 —
        # 64 sequential roundings per unit halved the student's
        # small-light hits on TPU (measured 47k vs 89k at 800×600).
        import ml_dtypes
        import numpy as _np
        var_cols = [c.astype(jnp.bfloat16).astype(jnp.float32)
                    for c in var_cols]
        cast = lambda v: float(_np.asarray(v).astype(ml_dtypes.bfloat16))
        CONST = {k: cast(v) for k, v in CONST.items()}
        layers = tuple(
            (tuple(tuple(cast(w) for w in row) for row in W),
             tuple(cast(v) for v in b)) for W, b in layers)
    x = list(var_cols)
    for li, (W, b) in enumerate(layers):
        out_dim = len(b)
        in_idx = VAR_IDX if li == 0 else range(len(x))
        ys = []
        for j in range(out_dim):
            if li == 0:
                bias = b[j] + sum(c * W[k][j] for k, c in CONST.items())
            else:
                bias = b[j]
            acc = None
            for xi, k in enumerate(in_idx):
                w = W[k][j]
                if w == 0.0:
                    continue
                t = x[xi] * w
                acc = t if acc is None else acc + t
            acc = bias if acc is None else acc + bias
            if li < len(layers) - 1:
                acc = jnp.maximum(acc, 0.0)
            if bf16 and hasattr(acc, "astype"):
                # Per-layer bf16 rounding (flax Dense output dtype).
                acc = acc.astype(jnp.bfloat16).astype(jnp.float32)
            ys.append(acc)
        x = ys
    return [c.astype(jnp.float32) if hasattr(c, "astype") else
            jnp.float32(c) for c in x]    # [action_dim] components, f32


def _kernel(spec, emissive_idx, max_bounces, mirror_threshold, no_diffuse,
            fast, bg, guide_spec, fb_prob, rays_ref, out_ref):
    """spec: scene_spec literal rows (cx cy cz r colr colg colb refl transp
    emit ior id); all control flow static, everything Python-unrolled.
    guide_spec: None, or literal student layers → guided diffuse bounces
    with the fused tracer's fb-gate draw schedule."""
    f32 = jnp.float32
    guided = guide_spec is not None

    def row(i):
        return rays_ref[i * ROWS:(i + 1) * ROWS, :]

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    running = row(6) > 0.5
    shape = ox.shape
    zero = jnp.zeros(shape, f32)

    em_flags = [r[9] > 0 for r in spec]
    sm_flags = [e and r[3] < 0.5 for e, r in zip(em_flags, spec)]
    mr_flags = [r[7] > mirror_threshold for r in spec]
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    levels = []     # (emis, cont, miss, ar, ag, ab, dr, dg, db)
    fb_masks = []
    run_cnt, found_cnt, emis_cnt, small_cnt, fb_cnt = (zero,) * 5

    for lvl in range(max_bounces):
        # ---- nearest-hit sweep with in-sweep attribute selection
        # (_lean_sweep: same op order, by_abs metric) -----------------------
        best_m = jnp.full(shape, big, f32)
        best_t = jnp.full(shape, big, f32)
        bcx, bcy, bcz = zero, zero, zero
        e_ar, e_ag, e_ab = zero, zero, zero
        e_em = jnp.zeros(shape, bool)
        e_sm = jnp.zeros(shape, bool)
        e_mr = jnp.zeros(shape, bool)
        e_id = jnp.full(shape, -1.0, f32)       # hit sphere INDEX as f32
        if guided:                              # obs material columns
            e_rf, e_tr, e_et, e_io, e_sd = (zero,) * 5
        found = jnp.zeros(shape, bool)
        for s, r_ in enumerate(spec):
            cx, cy, cz, rr = r_[0], r_[1], r_[2], r_[3]
            lx, ly, lz = cx - ox, cy - oy, cz - oz
            tca = lx * dx + ly * dy + lz * dz
            d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
            thc = jnp.sqrt(jnp.maximum(rr * rr - d2, 0.0))
            t = tca - thc
            inside = (d2 <= rr * rr) if fast else (jnp.sqrt(d2) <= rr)
            valid = (tca >= 0.0) & inside
            m = jnp.abs(t)
            better = valid & (m < best_m)
            best_m = jnp.where(better, m, best_m)
            best_t = jnp.where(better, t, best_t)
            bcx = jnp.where(better, cx, bcx)
            bcy = jnp.where(better, cy, bcy)
            bcz = jnp.where(better, cz, bcz)
            e_ar = jnp.where(better, r_[4], e_ar)
            e_ag = jnp.where(better, r_[5], e_ag)
            e_ab = jnp.where(better, r_[6], e_ab)
            if em_flags[s]:
                e_em = e_em | better
            else:
                e_em = e_em & ~better
            if sm_flags[s]:
                e_sm = e_sm | better
            else:
                e_sm = e_sm & ~better
            if mr_flags[s]:
                e_mr = e_mr | better
            else:
                e_mr = e_mr & ~better
            e_id = jnp.where(better, f32(s), e_id)
            if guided:
                e_rf = jnp.where(better, r_[7], e_rf)
                e_tr = jnp.where(better, r_[8], e_tr)
                e_et = jnp.where(better, r_[9], e_et)
                e_io = jnp.where(better, r_[10], e_io)
                e_sd = jnp.where(better, float(r_[11]), e_sd)
            found = found | valid
        px = ox + dx * best_t
        py = oy + dy * best_t
        pz = oz + dz * best_t
        nx, ny, nz = _normalise3(px - bcx, py - bcy, pz - bcz)

        found = running & found
        emis = found & e_em
        mirror = found & ~emis & e_mr
        diffuse = found & ~emis & ~mirror
        cont = mirror | diffuse

        # ---- direct lighting (_direct_lighting_rows: per-term trunc →
        # integer-valued, so summation order is exact) ----------------------
        dr, dg, db = zero, zero, zero
        for s in emissive_idx:
            r_ = spec[s]
            tx_, ty_, tz_ = r_[0] - px, r_[1] - py, r_[2] - pz
            d2 = tx_ * tx_ + ty_ * ty_ + tz_ * tz_
            if fast:
                inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                ldotn = tx_ * nx + ty_ * ny + tz_ * nz
                w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
            else:
                dist = jnp.sqrt(d2)
                den = jnp.maximum(dist, 1e-20)
                cosang = (tx_ / den) * nx + (ty_ / den) * ny + (tz_ / den) * nz
                w = (jnp.maximum(cosang, 0.0)
                     / jnp.maximum(dist * dist, 1e-30) * 0.3)
            w = jnp.where(e_id != f32(s), w, 0.0)
            dr = dr + jnp.trunc(w * r_[4])
            dg = dg + jnp.trunc(w * r_[5])
            db = db + jnp.trunc(w * r_[6])

        # ---- bounce direction --------------------------------------------
        rlx, rly, rlz = _reflect3(dx, dy, dz, nx, ny, nz)
        use_fb = jnp.zeros(shape, bool)
        if no_diffuse:
            dfx, dfy, dfz = rlx, rly, rlz
        else:
            nu = 3 if guided else 2
            u0 = row(_NRAY + nu * lvl)
            u1 = row(_NRAY + nu * lvl + 1)
            # θ = arccos(√u₀) via identities (no acos in Mosaic).
            ct = jnp.sqrt(u0)
            st = jnp.sqrt(jnp.maximum(1.0 - u0, 0.0))
            phi = 2.0 * jnp.pi * u1
            dfx, dfy, dfz = _local_to_world(st, ct, phi, nx, ny, nz)
            if guided:
                ufb = row(_NRAY + nu * lvl + 2)
                use_fb = diffuse & (ufb < fb_prob)
                var_cols = (px, py, pz, dx, dy, dz, nx, ny, nz,
                            e_rf, e_tr, e_et, e_io, e_sd / 100.0)
                a = _student_mlp(var_cols, guide_spec,
                                 float(lvl) / max_bounces)
                a0 = jnp.clip(a[0], -1.0, 1.0)
                a1 = jnp.clip(a[1], -1.0, 1.0)
                # op order matches sampling.fb_action_to_direction_c
                gtheta = (a0 + 1.0) * jnp.pi / 4.0
                gphi = a1 * jnp.pi
                gx, gy, gz = _local_to_world(jnp.sin(gtheta),
                                             jnp.cos(gtheta), gphi,
                                             nx, ny, nz)
                dfx = jnp.where(use_fb, gx, dfx)
                dfy = jnp.where(use_fb, gy, dfy)
                dfz = jnp.where(use_fb, gz, dfz)

        ox = jnp.where(cont, px + nx * 0.001, ox)
        oy = jnp.where(cont, py + ny * 0.001, oy)
        oz = jnp.where(cont, pz + nz * 0.001, oz)
        dx = jnp.where(cont, jnp.where(mirror, rlx, dfx), dx)
        dy = jnp.where(cont, jnp.where(mirror, rly, dfy), dy)
        dz = jnp.where(cont, jnp.where(mirror, rlz, dfz), dz)

        miss = running & ~emis & ~cont
        levels.append((emis, cont, miss, e_ar, e_ag, e_ab, dr, dg, db))
        fb_masks.append(use_fb)
        run_cnt = run_cnt + running.astype(f32)
        found_cnt = found_cnt + found.astype(f32)
        emis_cnt = emis_cnt + emis.astype(f32)
        small_cnt = small_cnt + (found & e_sm).astype(f32)
        fb_cnt = fb_cnt + use_fb.astype(f32)
        running = running & cont

    # still-running lanes make one extra trace() call the reference counts
    # before its bounce-budget early return (fused impl's total_rays).
    run_cnt = run_cnt + running.astype(f32)

    # ---- inline reverse fold (same op order as the lean/fused fold) -------
    vr = jnp.full(shape, bg[0], jnp.float32)
    vg = jnp.full(shape, bg[1], jnp.float32)
    vb = jnp.full(shape, bg[2], jnp.float32)
    for emis, cont, miss, ar, ag, ab, dr, dg, db in reversed(levels):
        cr = jnp.trunc(ar * jnp.minimum(255.0, dr + vr) / 255.0)
        cg = jnp.trunc(ag * jnp.minimum(255.0, dg + vg) / 255.0)
        cb = jnp.trunc(ab * jnp.minimum(255.0, db + vb) / 255.0)
        vr = jnp.where(cont, cr, vr)
        vg = jnp.where(cont, cg, vg)
        vb = jnp.where(cont, cb, vb)
        vr = jnp.where(emis, ar, vr)
        vg = jnp.where(emis, ag, vg)
        vb = jnp.where(emis, ab, vb)
        vr = jnp.where(miss, bg[0], vr)
        vg = jnp.where(miss, bg[1], vg)
        vb = jnp.where(miss, bg[2], vb)

    def wrow(i, v):
        out_ref[i * ROWS:(i + 1) * ROWS, :] = v

    wrow(0, vr)
    wrow(1, vg)
    wrow(2, vb)
    wrow(3, run_cnt)
    wrow(4, found_cnt)
    wrow(5, emis_cnt)
    wrow(6, small_cnt)
    if guided:
        # fb_success (PathStats): guided bounces whose lane's subpath
        # later terminated emissive — each lane terminates at most once,
        # so per-lane it is fb_cnt gated on the lane's terminal-emissive
        # flag (same identity the lean impl uses).
        term_emis = levels[0][0]
        for lv in levels[1:]:
            term_emis = term_emis | lv[0]
        wrow(7, fb_cnt)
        wrow(8, jnp.where(term_emis, fb_cnt, 0.0))


def student_guide_spec(guide_fn):
    """Literal ``(layers, dtype_tag)`` for the in-kernel student MLP from a
    DistilledGuide.as_guide_fn closure (its ``_fused_spec`` carries
    ``(params, dtype)`` — fb/distill.py), or None when the guide is not a
    plain student (full agents keep the XLA impls)."""
    import numpy as _np
    spec = getattr(guide_fn, "_fused_spec", None) if guide_fn else None
    if spec is None or len(spec) != 2:
        return None
    params, dtype = spec
    try:
        layers = []
        for i in range(len(params)):
            p = params[f"Dense_{i}"]
            k = _np.asarray(p["kernel"], _np.float64)
            b = _np.asarray(p["bias"], _np.float64)
            layers.append((tuple(tuple(float(w) for w in row) for row in k),
                           tuple(float(v) for v in b)))
    except Exception:
        return None
    tag = ("bfloat16" if dtype == jnp.bfloat16
           else None if dtype is None else str(_np.dtype(dtype)))
    return (tuple(layers), tag)


@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "background", "spec", "emissive_idx",
                                   "no_diffuse", "fast", "collect_stats",
                                   "guide_spec", "fb_prob", "interpret"))
def trace_path_pallas_impl(origins, dirs, key, *, max_bounces: int,
                           mirror_threshold: float, background, spec,
                           emissive_idx, no_diffuse: bool, fast: bool,
                           collect_stats: bool = True,
                           guide_spec=None, fb_prob: float = 1.0,
                           interpret: bool = False):
    """Whole-trace Pallas path kernel on a CONCRETE (literal) scene.

    Returns ``(rgb[R, 3] f32, PathStats)``; bit-identical to the XLA
    tracers' output in the unguided case (tests/test_pallas_path.py).
    ``guide_spec`` (from :func:`student_guide_spec`) bakes a distilled
    student into the kernel: guided diffuse bounces with the fused
    tracer's draw schedule, MLP inline as literal-weight madd chains.
    Callers go through :func:`trace_path(impl="pallas")`, which handles the
    concrete-scene requirement and guide extraction.
    """
    from ..core import vec
    from ..trace.path import PathStats

    guided = guide_spec is not None
    R = origins.shape[0]
    d = vec.normalise_safe(dirs.astype(jnp.float32))
    o32 = origins.astype(jnp.float32)

    n_pad = (-R) % TILE
    Rp = R + n_pad
    grid_n = Rp // TILE

    def lay(a):                      # [Rp] -> per-tile (ROWS, 128) blocks
        return jnp.pad(a, (0, n_pad)).reshape(grid_n, ROWS, 128)

    act = jnp.ones((R,), jnp.float32)          # pad lanes get 0 → inactive
    comps = [lay(o32[:, 0]), lay(o32[:, 1]), lay(o32[:, 2]),
             lay(d[:, 0]), lay(d[:, 1]), lay(d[:, 2]), lay(act)]

    nray = _NRAY
    if not no_diffuse:
        # The fused/lean RNG schedule: per level k_diff,k_fb = split(keys[l]);
        # cosine uniforms = uniform(k_diff, (R, 2)); the fb gate draw
        # uniform(k_fb, (R,)) exists only on guided runs (fused parity).
        keys = jax.random.split(key, max_bounces)
        for lvl in range(max_bounces):
            k_diff, k_fb = jax.random.split(keys[lvl])
            u = jax.random.uniform(k_diff, (R, 2), jnp.float32)
            comps.append(lay(u[:, 0]))
            comps.append(lay(u[:, 1]))
            if guided:
                comps.append(lay(jax.random.uniform(k_fb, (R,),
                                                    jnp.float32)))
        nray = _NRAY + (3 if guided else 2) * max_bounces

    rays = jnp.concatenate(comps, axis=1).reshape(grid_n * nray * ROWS, 128)

    nout = _NOUT + (2 if guided else 0)
    out = pl.pallas_call(
        partial(_kernel, spec, emissive_idx, max_bounces, mirror_threshold,
                no_diffuse, fast, tuple(float(b) for b in background),
                guide_spec, fb_prob),
        grid=(grid_n,),
        in_specs=[pl.BlockSpec((nray * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nout * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * nout * ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
    )(rays)

    out = out.reshape(grid_n, nout, ROWS * 128)

    def un(i):
        return out[:, i, :].reshape(Rp)[:R]

    rgb = jnp.stack([un(0), un(1), un(2)], -1)
    if collect_stats:
        z = jnp.zeros((), jnp.int32)
        # Per-lane counts are small integers in f32 (exact); cast BEFORE
        # the sum — the frame totals (~31M at 800x600@8spp) exceed f32's
        # 2^24 exact-integer range.
        stats = PathStats(
            total_rays=jnp.sum(un(3).astype(jnp.int32)),
            total_intersections=jnp.sum(un(4).astype(jnp.int32)),
            light_hits=jnp.sum(un(5).astype(jnp.int32)),
            small_light_hits=jnp.sum(un(6).astype(jnp.int32)),
            fb_used=(jnp.sum(un(7).astype(jnp.int32)) if guided else z),
            fb_success=(jnp.sum(un(8).astype(jnp.int32)) if guided else z))
    else:
        z = jnp.zeros((), jnp.int32)
        stats = PathStats(z, z, z, z, z, z)
    return rgb, stats


# ---------------------------------------------------------------------------
# Level-split hybrid: ONE jit program where each bounce level runs as a
# Pallas level kernel (sweep + direct lighting + bounce-direction
# candidates in VMEM) and the guide network runs BETWEEN kernels as a
# plain XLA matmul on the MXU — the measured answer to the in-kernel
# MLP's cost (the 64×64 student's elementwise madds were ~78% of the
# whole-trace guided kernel; on the MXU the forward is ~free).  Records
# stream through HBM between levels (~0.75 ms/level at this shape), the
# fold runs in XLA.  RNG schedule matches the fused tracer (same
# split/uniform draws, passed into the kernel); cosine θ uses the same
# acos-free identities as the whole-trace kernel, so images are
# ulp-close to fused, not bit-pinned (the no-guide hybrid is pointless —
# use impl="pallas" — so this path always carries a guide).
# ---------------------------------------------------------------------------

# Level-kernel output rows: emis cont miss | ar ag ab | dr dg db |
# nox noy noz | rlx rly rlz | cfx cfy cfz | nx ny nz | refl transp emit
# ior sid | found small mirror | px py pz   (32 groups)
_NLVL_OUT = 32


def _level_kernel(spec, emissive_idx, mirror_threshold, fast,
                  rays_ref, out_ref):
    f32 = jnp.float32

    def row(i):
        return rays_ref[i * ROWS:(i + 1) * ROWS, :]

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    running = row(6) > 0.5
    u0, u1 = row(7), row(8)
    shape = ox.shape
    zero = jnp.zeros(shape, f32)

    em_flags = [r[9] > 0 for r in spec]
    sm_flags = [e and r[3] < 0.5 for e, r in zip(em_flags, spec)]
    mr_flags = [r[7] > mirror_threshold for r in spec]
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    best_m = jnp.full(shape, big, f32)
    best_t = jnp.full(shape, big, f32)
    bcx, bcy, bcz = zero, zero, zero
    e_ar, e_ag, e_ab = zero, zero, zero
    e_em = jnp.zeros(shape, bool)
    e_sm = jnp.zeros(shape, bool)
    e_mr = jnp.zeros(shape, bool)
    e_id = jnp.full(shape, -1.0, f32)
    e_rf, e_tr, e_et, e_io, e_sd = zero, zero, zero, zero, zero
    found = jnp.zeros(shape, bool)
    for s, r_ in enumerate(spec):
        cx, cy, cz, rr = r_[0], r_[1], r_[2], r_[3]
        lx, ly, lz = cx - ox, cy - oy, cz - oz
        tca = lx * dx + ly * dy + lz * dz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
        thc = jnp.sqrt(jnp.maximum(rr * rr - d2, 0.0))
        t = tca - thc
        inside = (d2 <= rr * rr) if fast else (jnp.sqrt(d2) <= rr)
        valid = (tca >= 0.0) & inside
        m = jnp.abs(t)
        better = valid & (m < best_m)
        best_m = jnp.where(better, m, best_m)
        best_t = jnp.where(better, t, best_t)
        bcx = jnp.where(better, cx, bcx)
        bcy = jnp.where(better, cy, bcy)
        bcz = jnp.where(better, cz, bcz)
        e_ar = jnp.where(better, r_[4], e_ar)
        e_ag = jnp.where(better, r_[5], e_ag)
        e_ab = jnp.where(better, r_[6], e_ab)
        if em_flags[s]:
            e_em = e_em | better
        else:
            e_em = e_em & ~better
        if sm_flags[s]:
            e_sm = e_sm | better
        else:
            e_sm = e_sm & ~better
        if mr_flags[s]:
            e_mr = e_mr | better
        else:
            e_mr = e_mr & ~better
        e_id = jnp.where(better, f32(s), e_id)
        e_rf = jnp.where(better, r_[7], e_rf)
        e_tr = jnp.where(better, r_[8], e_tr)
        e_et = jnp.where(better, r_[9], e_et)
        e_io = jnp.where(better, r_[10], e_io)
        e_sd = jnp.where(better, float(r_[11]), e_sd)
        found = found | valid
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t
    nx, ny, nz = _normalise3(px - bcx, py - bcy, pz - bcz)

    found = running & found
    emis = found & e_em
    mirror = found & ~emis & e_mr
    diffuse = found & ~emis & ~mirror
    cont = mirror | diffuse
    miss = running & ~emis & ~cont

    dr, dg, db = zero, zero, zero
    for s in emissive_idx:
        r_ = spec[s]
        tx_, ty_, tz_ = r_[0] - px, r_[1] - py, r_[2] - pz
        d2 = tx_ * tx_ + ty_ * ty_ + tz_ * tz_
        if fast:
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
            ldotn = tx_ * nx + ty_ * ny + tz_ * nz
            w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
        else:
            dist = jnp.sqrt(d2)
            den = jnp.maximum(dist, 1e-20)
            cosang = (tx_ / den) * nx + (ty_ / den) * ny + (tz_ / den) * nz
            w = (jnp.maximum(cosang, 0.0)
                 / jnp.maximum(dist * dist, 1e-30) * 0.3)
        w = jnp.where(e_id != f32(s), w, 0.0)
        dr = dr + jnp.trunc(w * r_[4])
        dg = dg + jnp.trunc(w * r_[5])
        db = db + jnp.trunc(w * r_[6])

    rlx, rly, rlz = _reflect3(dx, dy, dz, nx, ny, nz)
    ct = jnp.sqrt(u0)
    st = jnp.sqrt(jnp.maximum(1.0 - u0, 0.0))
    phi = 2.0 * jnp.pi * u1
    cfx, cfy, cfz = _local_to_world(st, ct, phi, nx, ny, nz)

    def wrow(i, v):
        out_ref[i * ROWS:(i + 1) * ROWS, :] = v

    for i, v in enumerate((
            emis.astype(jnp.float32), cont.astype(jnp.float32),
            miss.astype(jnp.float32), e_ar, e_ag, e_ab, dr, dg, db,
            px + nx * 0.001, py + ny * 0.001, pz + nz * 0.001,
            rlx, rly, rlz, cfx, cfy, cfz, nx, ny, nz,
            e_rf, e_tr, e_et, e_io, e_sd,
            found.astype(jnp.float32), e_sm.astype(jnp.float32),
            mirror.astype(jnp.float32), px, py, pz)):
        wrow(i, v)


@partial(jax.jit, static_argnames=("spec", "emissive_idx",
                                   "mirror_threshold", "fast", "interpret"))
def run_level_kernel(ox, oy, oz, dx, dy, dz, running, u0, u1, *, spec,
                     emissive_idx, mirror_threshold, fast,
                     interpret=False):
    """One bounce level through the Pallas kernel on [R] component
    arrays; returns a dict of [R] outputs (see _NLVL_OUT layout).  Hot
    path of trace_path(impl="hybrid")."""
    R = ox.shape[0]
    n_pad = (-R) % TILE
    Rp = R + n_pad
    grid_n = Rp // TILE

    def lay(a):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad)).reshape(
            grid_n, ROWS, 128)

    comps = [lay(ox), lay(oy), lay(oz), lay(dx), lay(dy), lay(dz),
             lay(running.astype(jnp.float32)), lay(u0), lay(u1)]
    rays = jnp.concatenate(comps, axis=1).reshape(grid_n * 9 * ROWS, 128)
    out = pl.pallas_call(
        partial(_level_kernel, spec, emissive_idx, mirror_threshold, fast),
        grid=(grid_n,),
        in_specs=[pl.BlockSpec((9 * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_NLVL_OUT * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * _NLVL_OUT * ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
    )(rays)
    out = out.reshape(grid_n, _NLVL_OUT, ROWS * 128)

    def un(i):
        return out[:, i, :].reshape(Rp)[:R]

    names = ("emis", "cont", "miss", "ar", "ag", "ab", "dr", "dg", "db",
             "nox", "noy", "noz", "rlx", "rly", "rlz", "cfx", "cfy", "cfz",
             "nx", "ny", "nz", "refl", "transp", "emitf", "ior", "sid",
             "found", "small", "mirror", "px", "py", "pz")
    return {n: un(i) for i, n in enumerate(names)}
