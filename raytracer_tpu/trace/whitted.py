"""Wavefront Whitted tracer — the TPU-native form of the reference's
recursive ``Ray.nearestSphereIntersect`` (RL/ray.py:160-231).

The reference recurses per ray with Python objects; here the *entire ray
population* advances together through a bounded ``lax.fori_loop`` over
recursion levels, with per-lane masks selecting among {miss, terminal,
mirror, refract-walk} — no data-dependent control flow, so XLA fuses the
whole walk into one kernel.

Faithful recursion semantics (the tricky part, see SURVEY.md §7 "hard
parts"):

* A level entered with ``bounces > max_bounces`` returns None
  (RL/ray.py:173-174).
* ``reflective == True`` (exact value 1 — Python ``0.95 == True`` is False!)
  → bounce with ``suppress_ids=[hit id]``; if the recursion below returns
  None the reflective surface returns *its own* intersection
  (RL/ray.py:180-201).  Iteratively: the deepest reflective intersection in
  the chain is kept as a fallback result.
* ``transparent == True`` → refract in, march internally with a ≤10-step
  TIR-reflect loop (``sphereExitRay``, RL/ray.py:109-157), refract out and
  continue; a trapped ray or a failed chain returns None *through* the
  transparent level (RL/ray.py:226-229) — i.e. the fallback logic skips
  transparent levels, which overwriting-only-on-reflective reproduces.
* Anything else is a terminal intersection handed to shading.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import vec
from ..core.intersect import (NO_SUPPRESS, nearest_hit, nearest_hit_c,
                              single_sphere_exit_c, take_small)
from ..scene.types import Scene

# Status codes for each ray lane.
ACTIVE = 0
DONE_HIT = 1    # terminal intersection recorded in the result fields
DONE_NONE = 2   # chain failed with no reflective fallback → background


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TraceResult:
    """Vectorised equivalent of the reference ``Intersection`` terminus."""

    hit: jnp.ndarray       # [R] bool — True where a terminal surface was found
    idx: jnp.ndarray       # [R] i32  — sphere index of the terminus
    point: jnp.ndarray     # [R, 3]
    normal: jnp.ndarray    # [R, 3]
    t: jnp.ndarray         # [R] f    — the terminus's own segment distance
                           #            (Intersection.distance semantics: t of
                           #            the final intersection relative to the
                           #            last ray segment, not cumulative)
    bounces: jnp.ndarray   # [R] i32  — recursion depth at the terminus
    through: jnp.ndarray   # [R] i32  — transparent objects passed through


def _refract_walk_c(dx, dy, dz, nhx, nhy, nhz, phx, phy, phz,
                    cx, cy, cz, radius, ior, dtype, relevant=None):
    """``sphereExitRay`` (RL/ray.py:109-157), component (SoA) form.

    Returns ``(ok, epx, epy, epz, edx, edy, edz)``; ``ok`` False where the
    ray is trapped after 10 internal reflections (the reference prints
    "TRAPPED RAY" and returns None) or where the entry refraction itself
    TIRs (the reference would crash on that; physically impossible for
    ior >= 1)."""
    one = jnp.asarray(1.0, dtype)
    rdx, rdy, rdz, tir_in = vec.refract_c(dx, dy, dz, nhx, nhy, nhz,
                                          one, ior)
    # First exit intersection: march from the entry point along the
    # internal dir.
    (_, epx, epy, epz, enx, eny, enz) = single_sphere_exit_c(
        phx, phy, phz, rdx, rdy, rdz, cx, cy, cz, radius)

    zeros = jnp.zeros_like(dx)

    def body(carry):
        (exited, rdx, rdy, rdz, epx, epy, epz, enx, eny, enz,
         opx, opy, opz, odx, ody, odz) = carry
        exdx, exdy, exdz, tir = vec.refract_c(rdx, rdy, rdz,
                                              -enx, -eny, -enz, ior, one)
        newly = (~exited) & (~tir)
        opx = jnp.where(newly, epx, opx)
        opy = jnp.where(newly, epy, opy)
        opz = jnp.where(newly, epz, opz)
        odx = jnp.where(newly, exdx, odx)
        ody = jnp.where(newly, exdy, ody)
        odz = jnp.where(newly, exdz, odz)
        exited_next = exited | newly
        # TIR lanes: reflect internally and find the next exit point.
        rlx, rly, rlz = vec.reflect_c(rdx, rdy, rdz, enx, eny, enz)
        (_, npx, npy, npz, nnx, nny, nnz) = single_sphere_exit_c(
            epx, epy, epz, rlx, rly, rlz, cx, cy, cz, radius)
        still = ~exited_next
        rdx = jnp.where(still, rlx, rdx)
        rdy = jnp.where(still, rly, rdy)
        rdz = jnp.where(still, rlz, rdz)
        epx = jnp.where(still, npx, epx)
        epy = jnp.where(still, npy, epy)
        epz = jnp.where(still, npz, epz)
        enx = jnp.where(still, nnx, enx)
        eny = jnp.where(still, nny, eny)
        enz = jnp.where(still, nnz, enz)
        return (exited_next, rdx, rdy, rdz, epx, epy, epz, enx, eny, enz,
                opx, opy, opz, odx, ody, odz)

    init = (0, (jnp.zeros_like(dx, bool), rdx, rdy, rdz, epx, epy, epz,
                enx, eny, enz, zeros, zeros, zeros, zeros, zeros, zeros))

    rel = (jnp.ones_like(dx, bool) if relevant is None else relevant)

    def cond(state):
        n, (exited, *_rest) = state
        # TIR is rare: bail out as soon as every *glass* lane has exited
        # (the reference's loop only spins for trapped lanes).
        return (n < 10) & ~jnp.all(exited | ~rel)

    def wbody(state):
        n, carry = state
        return n + 1, body(carry)

    _, (exited, _rdx, _rdy, _rdz, _epx, _epy, _epz, _enx, _eny, _enz,
        opx, opy, opz, odx, ody, odz) = jax.lax.while_loop(cond, wbody, init)
    ok = exited & (~tir_in)
    return ok, opx, opy, opz, odx, ody, odz


@partial(jax.jit, static_argnames=("max_bounces", "enable_glass",
                                   "enable_mirror", "use_pallas"))
def trace_whitted(scene: Scene, origins: jnp.ndarray, dirs: jnp.ndarray,
                  max_bounces: int = 1,
                  suppress_id: jnp.ndarray | None = None,
                  bounces0: jnp.ndarray | None = None,
                  through0: jnp.ndarray | None = None,
                  enable_glass: bool = True,
                  enable_mirror: bool = True,
                  use_pallas: bool = False) -> TraceResult:
    """Trace a wavefront of rays to their Whitted termini.

    ``origins``/``dirs``: ``[R, 3]`` (dirs need not be normalised — the
    reference's ``Ray.__init__`` normalises, and so do we).  ``suppress_id``,
    ``bounces0``, ``through0`` let callers resume mid-chain exactly like the
    recursive signature (env stepping uses this).

    ``enable_glass``/``enable_mirror``: static specialisation — pass False
    (when the host knows the scene has no exactly-1.0 transparent/reflective
    spheres, see ``material_flags``) to compile out the refract walk /
    mirror bounce entirely.
    """
    dtype = origins.dtype
    R = origins.shape[0]
    d = vec.normalise_safe(dirs.astype(dtype))
    ox, oy, oz = origins[:, 0], origins[:, 1], origins[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    if suppress_id is None:
        suppress_id = jnp.full((R,), NO_SUPPRESS, jnp.int32)
    bounces = jnp.zeros((R,), jnp.int32) if bounces0 is None else bounces0.astype(jnp.int32)
    through = jnp.zeros((R,), jnp.int32) if through0 is None else through0.astype(jnp.int32)

    status = jnp.full((R,), ACTIVE, jnp.int32)
    zi = jnp.zeros((R,), jnp.int32)
    zf = jnp.zeros((R,), dtype)
    res = dict(idx=zi, px=zf, py=zf, pz=zf, nx=zf, ny=zf, nz=zf,
               t=zf, bounces=zi, through=zi)
    fbr = dict(res)
    fb_valid = jnp.zeros((R,), bool)

    zero_mask = jnp.zeros_like(scene.reflective, bool)
    is_mirror = (scene.reflective == 1.0) if enable_mirror else zero_mask
    is_glass = (scene.transparent == 1.0) if enable_glass else zero_mask
    # (the `== True` rule, RL/ray.py:180,204)

    # Component (SoA) carries throughout: an [R, 3] array puts the 3-wide
    # axis on the TPU's 128-lane dimension (~4% utilisation); [R]-shaped
    # xyz components keep every select/update at full VPU width (the same
    # layout rationale as nearest_hit's unrolled sweep — this was worth
    # ~4x on the 800x600 chandelier frame).
    def level(_, carry):
        (ox, oy, oz, dx, dy, dz, suppress_id, bounces, through, status,
         res, fb_valid, fbr) = carry

        active = status == ACTIVE
        zero_lanes = jnp.zeros_like(active)
        if use_pallas:
            from ..core.pallas_intersect import nearest_hit_pallas
            h = nearest_hit_pallas(jnp.stack([ox, oy, oz], -1),
                                   jnp.stack([dx, dy, dz], -1),
                                   scene, suppress_id)
            from ..core.intersect import NearestHitC
            hit = NearestHitC(found=h.found, idx=h.idx, t=h.t,
                              px=h.point[:, 0], py=h.point[:, 1],
                              pz=h.point[:, 2], nx=h.normal[:, 0],
                              ny=h.normal[:, 1], nz=h.normal[:, 2])
        else:
            hit = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, suppress_id)
        level_hit = dict(idx=hit.idx, px=hit.px, py=hit.py, pz=hit.pz,
                         nx=hit.nx, ny=hit.ny, nz=hit.nz, t=hit.t,
                         bounces=bounces, through=through)

        def select(mask, a, b):
            return {k: jnp.where(mask, a[k], b[k]) for k in b}

        over_budget = bounces > max_bounces
        # Chain fails here: no hit, or budget exceeded (RL/ray.py:170-174).
        fail = active & (~hit.found | over_budget)
        # On failure, fall back to the deepest reflective intersection if any.
        res = select(fail & fb_valid, fbr, res)
        status = jnp.where(fail, jnp.where(fb_valid, DONE_HIT, DONE_NONE), status)

        live = active & ~fail
        mirror = ((live & take_small(is_mirror, hit.idx))
                  if enable_mirror else zero_lanes)
        glass = ((live & ~mirror & take_small(is_glass, hit.idx))
                 if enable_glass else zero_lanes)
        terminal = live & ~mirror & ~glass

        # Terminal: record the intersection (bounces/through as of this level,
        # RL/ray.py:176-177).
        res = select(terminal, level_hit, res)
        status = jnp.where(terminal, DONE_HIT, status)

        # Mirror: update the fallback and bounce (RL/ray.py:180-201).
        fb_valid = fb_valid | mirror
        fbr = select(mirror, level_hit, fbr)
        rlx, rly, rlz = vec.reflect_c(dx, dy, dz, hit.nx, hit.ny, hit.nz)

        # Glass: refraction walk through the sphere (RL/ray.py:204-229).
        # Gated on a scalar any-glass predicate: levels where no lane is
        # refracting (most levels in mixed scenes) skip the walk entirely.
        if enable_glass:
            def do_walk(_):
                return _refract_walk_c(
                    dx, dy, dz, hit.nx, hit.ny, hit.nz,
                    hit.px, hit.py, hit.pz,
                    take_small(scene.centre[:, 0], hit.idx),
                    take_small(scene.centre[:, 1], hit.idx),
                    take_small(scene.centre[:, 2], hit.idx),
                    take_small(scene.radius, hit.idx),
                    take_small(scene.ior, hit.idx), dtype, relevant=glass)

            def no_walk(_):
                return (jnp.ones_like(glass), hit.px, hit.py, hit.pz,
                        dx, dy, dz)

            (ok, epx, epy, epz, edx, edy, edz) = jax.lax.cond(
                jnp.any(glass), do_walk, no_walk, operand=None)
        else:
            ok = jnp.ones_like(glass)
            epx, epy, epz = hit.px, hit.py, hit.pz
            edx, edy, edz = dx, dy, dz
        trapped = glass & ~ok
        # Trapped → None through this level → fallback (or background).
        res = select(trapped & fb_valid, fbr, res)
        status = jnp.where(trapped, jnp.where(fb_valid, DONE_HIT, DONE_NONE), status)
        glass = glass & ok

        # Advance continuing lanes.
        cont = mirror | glass
        ox = jnp.where(mirror, hit.px, jnp.where(glass, epx, ox))
        oy = jnp.where(mirror, hit.py, jnp.where(glass, epy, oy))
        oz = jnp.where(mirror, hit.pz, jnp.where(glass, epz, oz))
        dx = jnp.where(mirror, rlx, jnp.where(glass, edx, dx))
        dy = jnp.where(mirror, rly, jnp.where(glass, edy, dy))
        dz = jnp.where(mirror, rlz, jnp.where(glass, edz, dz))
        suppress_id = jnp.where(cont, take_small(scene.id, hit.idx),
                                suppress_id)
        bounces = jnp.where(cont, bounces + 1, bounces)
        through = jnp.where(glass, through + 1, through)

        return (ox, oy, oz, dx, dy, dz, suppress_id, bounces, through,
                status, res, fb_valid, fbr)

    carry = (ox, oy, oz, dx, dy, dz, suppress_id, bounces, through, status,
             res, fb_valid, fbr)
    # Levels 0..max_bounces can produce intersections; one extra level turns
    # an over-budget chain into its fallback/None.
    carry = jax.lax.fori_loop(0, max_bounces + 2, level, carry)
    status, res = carry[9], carry[10]

    return TraceResult(hit=status == DONE_HIT, idx=res["idx"],
                       point=jnp.stack([res["px"], res["py"], res["pz"]], -1),
                       normal=jnp.stack([res["nx"], res["ny"], res["nz"]], -1),
                       t=res["t"], bounces=res["bounces"],
                       through=res["through"])


# ---------------------------------------------------------------------------
# Compacted stepwise tracer.
#
# The fused loop above sweeps the FULL wavefront at every level, but after
# level 0 only the mirror/glass lanes continue — in typical scenes a few
# percent (the chandelier's 3 decorative spheres).  Here the host loop
# compacts the live lanes into the smallest power-of-two bucket after each
# level, so level 0 costs one full sweep and the deeper levels run on tiny
# wavefronts.  CAVEAT: this trades dead-lane arithmetic for per-level host
# round-trips, which only pays on a low-latency device link — through this
# environment's tunneled TPU it measures 4-8x SLOWER than fused (see
# render_whitted's ``impl`` docstring), so it ships opt-in, never default.  Per-lane math is IDENTICAL to the fused body
# (same op order); discrete outputs match exactly and float outputs match
# to XLA codegen rounding (~1e-5 rel — XLA may contract/reassociate
# differently across wavefront shapes), pinned by
# tests/test_whitted_parity.py::test_compact_matches_fused.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_bounces", "enable_glass",
                                   "enable_mirror"))
def _level_compact(scene: Scene, o, d, suppress_id, bounces, through,
                   fb_valid, fb_idx, fb_point, fb_normal, fb_t, fb_bounces,
                   fb_through, valid, *, max_bounces: int,
                   enable_glass: bool, enable_mirror: bool):
    """One recursion level on a compacted live wavefront.  Mirrors the
    fused ``level`` body lane-for-lane (same component math); ``valid``
    masks bucket padding."""
    dtype = o.dtype
    zero_mask = jnp.zeros_like(scene.reflective, bool)
    is_mirror = (scene.reflective == 1.0) if enable_mirror else zero_mask
    is_glass = (scene.transparent == 1.0) if enable_glass else zero_mask
    zero_lanes = jnp.zeros_like(valid)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    hit = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, suppress_id)
    hit_point = jnp.stack([hit.px, hit.py, hit.pz], -1)
    hit_normal = jnp.stack([hit.nx, hit.ny, hit.nz], -1)
    over_budget = bounces > max_bounces
    fail = valid & (~hit.found | over_budget)
    live = valid & ~fail
    mirror = ((live & take_small(is_mirror, hit.idx))
              if enable_mirror else zero_lanes)
    glass = ((live & ~mirror & take_small(is_glass, hit.idx))
             if enable_glass else zero_lanes)
    terminal = live & ~mirror & ~glass

    rlx, rly, rlz = vec.reflect_c(dx, dy, dz, hit.nx, hit.ny, hit.nz)
    refl_d = jnp.stack([rlx, rly, rlz], -1)

    if enable_glass:
        def do_walk(_):
            return _refract_walk_c(
                dx, dy, dz, hit.nx, hit.ny, hit.nz, hit.px, hit.py, hit.pz,
                take_small(scene.centre[:, 0], hit.idx),
                take_small(scene.centre[:, 1], hit.idx),
                take_small(scene.centre[:, 2], hit.idx),
                take_small(scene.radius, hit.idx),
                take_small(scene.ior, hit.idx), dtype, relevant=glass)

        def no_walk(_):
            return (jnp.ones_like(glass), hit.px, hit.py, hit.pz,
                    dx, dy, dz)

        (ok, epx, epy, epz, edx, edy, edz) = jax.lax.cond(
            jnp.any(glass), do_walk, no_walk, operand=None)
    else:
        ok = jnp.ones_like(glass)
        epx, epy, epz = hit.px, hit.py, hit.pz
        edx, edy, edz = dx, dy, dz
    exit_point = jnp.stack([epx, epy, epz], -1)
    exit_dir = jnp.stack([edx, edy, edz], -1)
    trapped = glass & ~ok
    glass_ok = glass & ok

    # Result for lanes finishing at this level.  fail/trapped use the
    # fallback recorded at an EARLIER level (a glass lane never updates its
    # own fallback this level, so entry-time fb_* is correct for both).
    use_fb = (fail | trapped) & fb_valid
    done_hit = use_fb | terminal
    out_idx = jnp.where(use_fb, fb_idx, hit.idx)
    out_point = jnp.where(use_fb[:, None], fb_point, hit_point)
    out_normal = jnp.where(use_fb[:, None], fb_normal, hit_normal)
    out_t = jnp.where(use_fb, fb_t, hit.t)
    out_bounces = jnp.where(use_fb, fb_bounces, bounces)
    out_through = jnp.where(use_fb, fb_through, through)

    # Mirror lanes update their fallback and continue.
    fb_valid = fb_valid | mirror
    fb_idx = jnp.where(mirror, hit.idx, fb_idx)
    fb_point = jnp.where(mirror[:, None], hit_point, fb_point)
    fb_normal = jnp.where(mirror[:, None], hit_normal, fb_normal)
    fb_t = jnp.where(mirror, hit.t, fb_t)
    fb_bounces = jnp.where(mirror, bounces, fb_bounces)
    fb_through = jnp.where(mirror, through, fb_through)

    cont = mirror | glass_ok
    o = jnp.where(mirror[:, None], hit_point,
                  jnp.where(glass_ok[:, None], exit_point, o))
    d = jnp.where(mirror[:, None], refl_d,
                  jnp.where(glass_ok[:, None], exit_dir, d))
    suppress_id = jnp.where(cont, take_small(scene.id, hit.idx), suppress_id)
    bounces = jnp.where(cont, bounces + 1, bounces)
    through = jnp.where(glass_ok, through + 1, through)

    return (done_hit, out_idx, out_point, out_normal, out_t, out_bounces,
            out_through, cont, o, d, suppress_id, bounces, through,
            fb_valid, fb_idx, fb_point, fb_normal, fb_t, fb_bounces,
            fb_through, jnp.sum(cont))


@partial(jax.jit, static_argnames=())
def _scatter_done(done_hit, out_idx, out_point, out_normal, out_t,
                  out_bounces, out_through, idx_map, R_sentinel,
                  hitf, idxf, pointf, normalf, tf, bouncesf, throughf):
    tgt = jnp.where(done_hit, idx_map, R_sentinel)
    hitf = hitf.at[tgt].set(True, mode="drop")
    idxf = idxf.at[tgt].set(out_idx, mode="drop")
    pointf = pointf.at[tgt].set(out_point, mode="drop")
    normalf = normalf.at[tgt].set(out_normal, mode="drop")
    tf = tf.at[tgt].set(out_t, mode="drop")
    bouncesf = bouncesf.at[tgt].set(out_bounces, mode="drop")
    throughf = throughf.at[tgt].set(out_through, mode="drop")
    return hitf, idxf, pointf, normalf, tf, bouncesf, throughf


@partial(jax.jit, static_argnames=("bucket",))
def _compact_live(cont, arrs, idx_map, *, bucket: int):
    n = jnp.sum(cont)
    sel = jnp.nonzero(cont, size=bucket, fill_value=0)[0]
    valid = jnp.arange(bucket) < n
    out = tuple(a[sel] for a in arrs)
    return out, idx_map[sel], valid


def trace_whitted_compact(scene: Scene, origins: jnp.ndarray,
                          dirs: jnp.ndarray, max_bounces: int = 1,
                          suppress_id: jnp.ndarray | None = None,
                          bounces0: jnp.ndarray | None = None,
                          through0: jnp.ndarray | None = None,
                          enable_glass: bool = True,
                          enable_mirror: bool = True,
                          min_bucket: int = 1024) -> TraceResult:
    """Equivalent to :func:`trace_whitted` (discrete fields exact, floats
    to XLA rounding), with host-driven live-lane compaction between levels
    (one host sync per level).  Not callable under ``jit`` — the bucket
    size is data-dependent."""
    dtype = origins.dtype
    R = origins.shape[0]
    d = vec.normalise_safe(dirs.astype(dtype))
    o = origins

    if suppress_id is None:
        suppress_id = jnp.full((R,), NO_SUPPRESS, jnp.int32)
    bounces = (jnp.zeros((R,), jnp.int32) if bounces0 is None
               else bounces0.astype(jnp.int32))
    through = (jnp.zeros((R,), jnp.int32) if through0 is None
               else through0.astype(jnp.int32))

    zero3 = jnp.zeros((R, 3), dtype)
    zi = jnp.zeros((R,), jnp.int32)
    zf = jnp.zeros((R,), dtype)
    hitf = jnp.zeros((R,), bool)
    idxf, pointf, normalf = zi, zero3, zero3
    tf, bouncesf, throughf = zf, zi, zi

    live = (o, d, suppress_id, bounces, through,
            jnp.zeros((R,), bool), zi, zero3, zero3, zf, zi, zi)
    idx_map = jnp.arange(R, dtype=jnp.int32)
    valid = jnp.ones((R,), bool)

    for _ in range(max_bounces + 2):
        (done_hit, out_idx, out_point, out_normal, out_t, out_bounces,
         out_through, cont, *new_live, n_cont) = _level_compact(
            scene, *live, valid, max_bounces=max_bounces,
            enable_glass=enable_glass, enable_mirror=enable_mirror)
        (hitf, idxf, pointf, normalf, tf, bouncesf, throughf) = \
            _scatter_done(done_hit, out_idx, out_point, out_normal, out_t,
                          out_bounces, out_through, idx_map, R,
                          hitf, idxf, pointf, normalf, tf, bouncesf,
                          throughf)
        n = int(n_cont)
        if n == 0:
            break
        bucket = max(min_bucket, 1 << (max(n - 1, 1)).bit_length())
        bucket = min(bucket, live[0].shape[0])
        live, idx_map, valid = _compact_live(cont, tuple(new_live), idx_map,
                                             bucket=bucket)
    return TraceResult(hit=hitf, idx=idxf, point=pointf, normal=normalf,
                       t=tf, bounces=bouncesf, through=throughf)
