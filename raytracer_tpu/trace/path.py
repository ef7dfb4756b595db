"""Wavefront stochastic path tracer — the TPU-native form of the FB
comparison renderers' recursive tracers:

* ``TraditionalRenderer.trace_ray_traditional``
  (FB/fb_vs_traditional_complex.py:299-389; chandelier copy :460-554)
* ``WorkingFBRenderer.trace_ray_fb``
  (FB/fb_vs_traditional_complex.py:486-601; chandelier copy :620-737)

Per level: nearest hit (no id suppression — self-hits are avoided with the
reference's 0.001 normal offset), then

* ``bounce >= max_bounces`` or miss → background (2, 2, 5)
* emissive → the sphere's colour (light-hit counters)
* direct   = Σ over emissive spheres of ``int(colour * cosθ / d² * 0.3)``
  per channel (no shadow test — reference "simplified" direct lighting)
* indirect = mirror reflect if ``reflective > mirror_threshold`` else a
  cosine-weighted diffuse bounce — or, with probability ``fb_prob``, a
  direction from a learned policy over a 22-D observation (the FB branch).
  The reference ran one NN forward *per ray per bounce* on CPU — its
  measured 6.7× slowdown; here the whole wavefront's policy evaluation is
  one batched forward per level.
* combine: ``trunc(albedo * min(255, direct + indirect) / 255)``
  (int() truncation and min-clamps preserved).

The single-recursive-call chain becomes a forward ``lax.scan`` over levels
recording per-level (state, albedo, direct), then a reverse fold applying
the combine — no recursion, fully fused.

``mirror_threshold`` quirk: the chandelier *traditional* renderer mirrors on
``reflective > 0`` (so its 0.1-reflective walls mirror!) while the complex
traditional renderer and both FB renderers use ``> 0.9`` — both preserved
via the parameter (chandelier :481 vs complex :349,535, chandelier FB :669).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import vec
from ..core.intersect import NO_SUPPRESS, nearest_hit_c, take_small
from ..scene.types import Scene
from . import sampling

# Per-level lane states.
_INACTIVE = 0   # terminated at an earlier level
_MISS = 1       # miss or bounce budget → background
_EMISSIVE = 2   # terminal on a light → light colour
_CONT = 3       # continuing: fold albedo/direct with the deeper value


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PathStats:
    """The reference renderers' stats counters (complex.py:270-276).

    ``fb_success`` is measured honestly here: the number of guided
    (FB-sampled) bounces whose lane's subpath later terminated on an
    emissive sphere.  The reference increments fb_success unconditionally
    right after choose_direction (complex.py:548 — trivially equal to
    fb_used); its output6.py:519 variant counts "guide returned a usable
    direction".  This counter is the statistic both were reaching for:
    guided bounces that actually found light, so fb_success ≤ fb_used and
    ``fb_success / fb_used`` is a real success rate."""

    total_rays: jnp.ndarray
    total_intersections: jnp.ndarray
    light_hits: jnp.ndarray
    small_light_hits: jnp.ndarray
    fb_used: jnp.ndarray
    fb_success: jnp.ndarray


def _direct_lighting_c(scene, px, py, pz, nx, ny, nz, idx, emissive_mask,
                       dtype, emissive_idx=None, fast: bool = False):
    """Per-level direct term (complex.py:333-348): Σ over emissive spheres
    of ``trunc(0.3·max(0,cosθ)/d² · colour)``, skipping the hit sphere —
    unrolled per sphere in scalar components AND per rgb channel (see
    nearest_hit's layout note; the trunc makes each term integer-valued so
    summation order is exact).  Returns ``(dr, dg, db)``.

    ``emissive_idx`` (static tuple of sphere indices, ascending) restricts
    the unroll to the CONCRETE scene's emissive spheres — bit-exact, since
    every non-emissive sphere's term is ``trunc(0 · col) == 0`` and the
    summation order among emissive spheres is unchanged.  On padded
    template scenes (64 slots, ≤8 lights) this removes ~90% of the
    direct-lighting sweep; callers derive it from a concrete scene the
    same way renderer.material_flags specialises the refract walk.

    ``fast``: the per-light sqrt + 4 divides become one ``rsqrt`` + 3
    muls: ``cosθ/d² = (L·n)·inv³`` with ``inv = rsqrt(|L|²)``.  Same
    quantity to ~1 ulp; the trunc sites can flip only when ``w·col``
    lands within rounding of an integer (rare; the precision="fast"
    render path accepts this, goldens stay on exact)."""
    dr = jnp.zeros_like(px)
    dg = jnp.zeros_like(px)
    db = jnp.zeros_like(px)
    spheres = (range(scene.centre.shape[0]) if emissive_idx is None
               else emissive_idx)
    for s in spheres:
        cx, cy, cz = scene.centre[s, 0], scene.centre[s, 1], scene.centre[s, 2]
        tx, ty, tz = cx - px, cy - py, cz - pz
        d2 = tx * tx + ty * ty + tz * tz
        if fast:
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
            ldotn = tx * nx + ty * ny + tz * nz
            w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
        else:
            dist = jnp.sqrt(d2)
            den = jnp.maximum(dist, 1e-20)          # normalise_safe semantics
            cosang = (tx / den) * nx + (ty / den) * ny + (tz / den) * nz
            w = (jnp.maximum(cosang, 0.0)
                 / jnp.maximum(dist * dist, 1e-30) * 0.3)
        w = jnp.where(emissive_mask[s] & (idx != s), w, 0.0)
        col = scene.colour[s].astype(dtype)
        dr = dr + jnp.trunc(w * col[0])
        dg = dg + jnp.trunc(w * col[1])
        db = db + jnp.trunc(w * col[2])
    return dr, dg, db


def emissive_indices(scene) -> Optional[tuple]:
    """Static emissive-sphere index tuple from a CONCRETE scene, or None
    when the scene is traced (keep the full sweep)."""
    try:
        import numpy as _np
        em = _np.asarray(scene.emitive) > 0
        return tuple(int(i) for i in _np.nonzero(em)[0])
    except Exception:
        return None


def no_diffuse_possible(scene, mirror_threshold: float) -> bool:
    """Static: can a diffuse bounce ever fire on this CONCRETE scene at
    this mirror threshold?  False when every real (radius > 0) sphere is
    either emissive or mirrors (``reflective > mirror_threshold``) — then
    the per-level cosine sampling, its threefry draws, and any guide
    forward are computed-and-discarded work the tracer statically skips
    (the chandelier traditional config, mirror_threshold=0.0, is exactly
    this case: chandelier renderer's ``reflective > 0`` rule,
    FB/fb_vs_traditional_chandelier.py:481).  Bit-exact: no random value
    or guide action reaches the output when no lane can be diffuse."""
    try:
        import numpy as _np
        real = _np.asarray(scene.radius) > 0
        em = _np.asarray(scene.emitive) > 0
        mirror = _np.asarray(scene.reflective) > mirror_threshold
        return bool((em | mirror)[real].all())
    except Exception:
        return False


def make_observation(point, normal, ray_dir, bounce_count, colour, scene,
                     idx, max_bounces):
    """22-D FB observation (FB/fb_vs_traditional_complex.py:446-467 /
    train_complex_only.py:128-146): pos, incoming dir, normal, material(4),
    colour/255, bounce/max, through=0, id/100, pad (0.5, 0.5, 0.5)."""
    dtype = point.dtype
    halfpad = jnp.full(point.shape[:-1] + (3,), 0.5, dtype)
    return jnp.concatenate([
        point, ray_dir, normal,
        take_small(scene.reflective, idx)[..., None].astype(dtype),
        take_small(scene.transparent, idx)[..., None].astype(dtype),
        take_small(scene.emitive, idx)[..., None].astype(dtype),
        take_small(scene.ior, idx)[..., None].astype(dtype),
        (colour / 255.0).astype(dtype),
        (bounce_count / max_bounces)[..., None].astype(dtype),
        jnp.zeros(point.shape[:-1] + (1,), dtype),
        (take_small(scene.id, idx).astype(dtype) / 100.0)[..., None],
        halfpad,
    ], axis=-1)


def trace_path(scene: Scene, origins: jnp.ndarray, dirs: jnp.ndarray,
               key: jax.Array, *, max_bounces: int = 3,
               mirror_threshold: float = 0.9,
               background=(2.0, 2.0, 5.0),
               guide_fn: Optional[Callable] = None,
               fb_prob: float = 1.0,
               collect_stats: bool = True,
               impl: str = "fused",
               guide_max_level: Optional[int] = None,
               precision: str = "exact"):
    """Trace ``[R]`` sample rays to integer sample colours ``[R, 3]``.

    ``guide_fn(obs[R,22]) -> action[R,2]`` enables the FB branch; actions are
    clipped to [-1, 1] and mapped θ=(a₀+1)π/4, φ=a₁π in the renderer tangent
    frame.  Returns ``(rgb, PathStats)``.

    ``impl="fused"`` compiles the whole level scan (+ the guide network, if
    any) into one XLA program; ``impl="stepwise"`` runs a Python loop over
    levels calling one small jitted level kernel + the guide as separate
    programs — bit-identical results (same key schedule), but compile time
    scales with ONE level instead of the whole unrolled pipeline, which
    matters on slow remote-compile TPU paths.

    ``guide_max_level=K`` runs the guide network only on the first ``K``
    levels; deeper diffuse bounces fall back to cosine sampling (same key
    schedule either way).  Deployment knob for the FULL (non-distilled)
    agent, whose per-level forward dominates the frame: most of the
    measured hit-rate improvement comes from the early bounces, so
    K=2-3 of 8 keeps most of the signal at a fraction of the policy
    cost.  Stepwise-impl only (the guided deployment path).

    ``precision="fast"`` swaps the exact-reference sweep math for the
    cheaper equivalents (squared-radius hit test, rsqrt direct lighting —
    see nearest_hit_c / _direct_lighting_c): same image up to rare 1-ulp
    integer flips at the trunc sites; the production-serving mode.
    "exact" (default) is the reference-parity mode the goldens pin."""
    if max_bounces < 1:
        raise ValueError(f"max_bounces must be >= 1, got {max_bounces} "
                         "(the reference's renderers always trace at least "
                         "the camera level)")
    if precision not in ("exact", "fast"):
        raise ValueError(f"unknown precision {precision!r}")
    fast = precision == "fast"
    if impl in ("stepwise", "stepwise-pallas"):
        return _trace_path_stepwise(scene, origins, dirs, key,
                                    max_bounces=max_bounces,
                                    mirror_threshold=mirror_threshold,
                                    background=background, guide_fn=guide_fn,
                                    fb_prob=fb_prob,
                                    collect_stats=collect_stats,
                                    use_pallas=(impl == "stepwise-pallas"),
                                    guide_max_level=guide_max_level,
                                    fast=fast)
    if guide_max_level is not None:
        raise ValueError("guide_max_level requires impl='stepwise'")
    if impl == "lean":
        return _trace_path_lean(scene, origins, dirs, key,
                                max_bounces=max_bounces,
                                mirror_threshold=mirror_threshold,
                                background=background, guide_fn=guide_fn,
                                fb_prob=fb_prob, collect_stats=collect_stats,
                                fast=fast)
    if impl == "pallas":
        return _trace_path_pallas(scene, origins, dirs, key,
                                  max_bounces=max_bounces,
                                  mirror_threshold=mirror_threshold,
                                  background=background, guide_fn=guide_fn,
                                  collect_stats=collect_stats, fast=fast,
                                  fb_prob=fb_prob)
    if impl == "hybrid":
        return _trace_path_hybrid(scene, origins, dirs, key,
                                  max_bounces=max_bounces,
                                  mirror_threshold=mirror_threshold,
                                  background=background, guide_fn=guide_fn,
                                  fb_prob=fb_prob,
                                  collect_stats=collect_stats, fast=fast)
    if impl != "fused":
        raise ValueError(f"unknown impl {impl!r}")
    return _trace_path_fused(scene, origins, dirs, key,
                             max_bounces=max_bounces,
                             mirror_threshold=mirror_threshold,
                             background=background, guide_fn=guide_fn,
                             fb_prob=fb_prob, collect_stats=collect_stats,
                             fast=fast)


def _trace_path_pallas(scene, origins, dirs, key, *, max_bounces,
                       mirror_threshold, background, guide_fn,
                       collect_stats, fast, fb_prob=1.0):
    """Whole-trace Pallas kernel (core/pallas_path.py): CONCRETE scenes
    only — the kernel bakes the sphere table as literals.  A distilled
    STUDENT guide is baked in as literal-weight madd chains
    (student_guide_spec); full agents keep the XLA impls (their 512-wide
    forward belongs on the MXU)."""
    from ..core.pallas_path import student_guide_spec, trace_path_pallas_impl
    gspec = None
    if guide_fn is not None:
        gspec = student_guide_spec(guide_fn)
        if gspec is None:
            raise ValueError(
                "impl='pallas' supports distilled-student guides only "
                "(DistilledGuide.as_guide_fn); full agents use "
                "impl='fused'/'lean'")
    spec = scene_spec(scene)
    if spec is None:
        raise ValueError("impl='pallas' requires a concrete scene "
                         "(scene_spec); traced scenes use the XLA impls")
    no_diff = no_diffuse_possible(scene, mirror_threshold)
    return trace_path_pallas_impl(
        origins, dirs, key, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold,
        background=tuple(float(b) for b in background), spec=spec,
        emissive_idx=emissive_indices(scene), no_diffuse=no_diff,
        fast=fast, collect_stats=collect_stats,
        guide_spec=None if no_diff else gspec, fb_prob=fb_prob,
        interpret=jax.default_backend() != "tpu")


def _trace_path_hybrid(scene, origins, dirs, key, *, max_bounces,
                       mirror_threshold, background, guide_fn, fb_prob,
                       collect_stats, fast):
    """Level-split hybrid (core/pallas_path.py run_level_kernel): the
    bounce levels run as Pallas kernels, the guide network runs between
    them on the MXU, all in ONE jit — the measured answer to both the
    in-kernel MLP's VPU cost and the XLA tracers' HBM-fused level
    bodies.  Concrete scenes only; guided or unguided."""
    spec = scene_spec(scene)
    if spec is None:
        raise ValueError("impl='hybrid' requires a concrete scene "
                         "(scene_spec); traced scenes use the XLA impls")
    return call_with_split_guide(
        _trace_path_hybrid_impl, guide_fn, origins, dirs, key,
        max_bounces=max_bounces, mirror_threshold=mirror_threshold,
        background=tuple(float(b) for b in background), fb_prob=fb_prob,
        collect_stats=collect_stats, spec=spec,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast,
        interpret=jax.default_backend() != "tpu")


@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "background", "guide_fn", "g_apply",
                                   "g_dtype", "collect_stats", "spec",
                                   "emissive_idx", "no_diffuse", "fast",
                                   "interpret"))
def _trace_path_hybrid_impl(origins, dirs, key, g_params, *,
                            max_bounces, mirror_threshold, background,
                            guide_fn=None, g_apply=None, g_dtype=None,
                            fb_prob=1.0, collect_stats=True, spec=None,
                            emissive_idx=None, no_diffuse=False,
                            fast=False, interpret=False):
    from ..core.pallas_path import run_level_kernel

    dtype = jnp.float32
    R = origins.shape[0]
    bg = jnp.asarray(background, dtype)
    d = vec.normalise_safe(dirs.astype(dtype))
    guided = guide_fn is not None or g_apply is not None

    def level(carry, inputs):
        ox, oy, oz, dx, dy, dz, running = carry
        k, subkey = inputs
        if no_diffuse:
            u0 = jnp.zeros((R,), dtype)
            u1 = jnp.zeros((R,), dtype)
        else:
            k_diff, k_fb = jax.random.split(subkey)
            u = jax.random.uniform(k_diff, (R, 2), dtype)
            u0, u1 = u[:, 0], u[:, 1]
        o = run_level_kernel(ox, oy, oz, dx, dy, dz, running, u0, u1,
                             spec=spec, emissive_idx=emissive_idx,
                             mirror_threshold=mirror_threshold, fast=fast,
                             interpret=interpret)
        emis = o["emis"] > 0.5
        cont = o["cont"] > 0.5
        mirror = o["mirror"] > 0.5
        found = o["found"] > 0.5
        diffuse = cont & ~mirror
        dfx, dfy, dfz = o["cfx"], o["cfy"], o["cfz"]
        if no_diffuse:
            dfx, dfy, dfz = o["rlx"], o["rly"], o["rlz"]
            use_fb = jnp.zeros((R,), bool)
        elif guided:
            use_fb = diffuse & (jax.random.uniform(k_fb, (R,), dtype)
                                < fb_prob)
            shp = (R,)
            obs = jnp.concatenate([
                jnp.stack([o["px"], o["py"], o["pz"]], -1),
                jnp.stack([dx, dy, dz], -1),
                jnp.stack([o["nx"], o["ny"], o["nz"]], -1),
                o["refl"][..., None], o["transp"][..., None],
                o["emitf"][..., None], o["ior"][..., None],
                jnp.zeros(shp + (3,), dtype),
                jnp.full(shp + (1,), k, dtype) / max_bounces,
                jnp.zeros(shp + (1,), dtype),
                (o["sid"] / 100.0)[..., None],
                jnp.full(shp + (3,), 0.5, dtype),
            ], axis=-1)
            raw = (g_apply(g_params, obs, g_dtype) if g_apply is not None
                   else guide_fn(obs))
            action = jnp.clip(raw, -1.0, 1.0)
            fbx, fby, fbz = sampling.fb_action_to_direction_c(
                action, o["nx"], o["ny"], o["nz"], "renderer")
            dfx = jnp.where(use_fb, fbx, dfx)
            dfy = jnp.where(use_fb, fby, dfy)
            dfz = jnp.where(use_fb, fbz, dfz)
        else:
            use_fb = jnp.zeros((R,), bool)

        ox = jnp.where(cont, o["nox"], ox)
        oy = jnp.where(cont, o["noy"], oy)
        oz = jnp.where(cont, o["noz"], oz)
        dx = jnp.where(cont, jnp.where(mirror, o["rlx"], dfx), dx)
        dy = jnp.where(cont, jnp.where(mirror, o["rly"], dfy), dy)
        dz = jnp.where(cont, jnp.where(mirror, o["rlz"], dfz), dz)

        state = jnp.where(running,
                          jnp.where(emis, _EMISSIVE,
                                    jnp.where(cont, _CONT, _MISS)),
                          _INACTIVE).astype(jnp.int8)
        level_stats = (jnp.sum(running), jnp.sum(found), jnp.sum(emis),
                       jnp.sum(found & (o["small"] > 0.5)),
                       jnp.sum(use_fb))
        out = (state, o["ar"], o["ag"], o["ab"], o["dr"], o["dg"], o["db"],
               use_fb)
        return (ox, oy, oz, dx, dy, dz, running & cont), (out, level_stats)

    keys = jax.random.split(key, max_bounces)
    running0 = jnp.ones((R,), bool)
    carry0 = (origins[:, 0].astype(dtype), origins[:, 1].astype(dtype),
              origins[:, 2].astype(dtype), d[:, 0], d[:, 1], d[:, 2],
              running0)
    (*_, still_running), (recs, stats_seq) = jax.lax.scan(
        level, carry0, (jnp.arange(max_bounces, dtype=dtype), keys))

    states, ars, ags, abs_, drs, dgs, dbs, fbms = recs

    vr0 = jnp.full((R,), bg[0], dtype)
    vg0 = jnp.full((R,), bg[1], dtype)
    vb0 = jnp.full((R,), bg[2], dtype)

    def fold(i, value):
        vr, vg, vb = value
        lvl = max_bounces - 1 - i
        st = states[lvl]
        cr = jnp.trunc(ars[lvl] * jnp.minimum(255.0, drs[lvl] + vr) / 255.0)
        cg = jnp.trunc(ags[lvl] * jnp.minimum(255.0, dgs[lvl] + vg) / 255.0)
        cb = jnp.trunc(abs_[lvl] * jnp.minimum(255.0, dbs[lvl] + vb) / 255.0)
        is_cont = st == _CONT
        is_emis = st == _EMISSIVE
        is_miss = st == _MISS
        vr = jnp.where(is_cont, cr, vr)
        vg = jnp.where(is_cont, cg, vg)
        vb = jnp.where(is_cont, cb, vb)
        vr = jnp.where(is_emis, ars[lvl], vr)
        vg = jnp.where(is_emis, ags[lvl], vg)
        vb = jnp.where(is_emis, abs_[lvl], vb)
        vr = jnp.where(is_miss, bg[0], vr)
        vg = jnp.where(is_miss, bg[1], vg)
        vb = jnp.where(is_miss, bg[2], vb)
        return vr, vg, vb

    vr, vg, vb = jax.lax.fori_loop(0, max_bounces, fold, (vr0, vg0, vb0))
    rgb = jnp.stack([vr, vg, vb], -1)

    if collect_stats:
        total_rays = jnp.sum(stats_seq[0]) + jnp.sum(still_running)
        term_emis = jnp.any(states == _EMISSIVE, axis=0)
        stats = PathStats(
            total_rays=total_rays,
            total_intersections=jnp.sum(stats_seq[1]),
            light_hits=jnp.sum(stats_seq[2]),
            small_light_hits=jnp.sum(stats_seq[3]),
            fb_used=jnp.sum(stats_seq[4]),
            fb_success=jnp.sum(fbms & term_emis[None, :]),
        )
    else:
        z = jnp.zeros((), jnp.int32)
        stats = PathStats(z, z, z, z, z, z)
    return rgb, stats


def _trace_path_fused(scene: Scene, origins: jnp.ndarray, dirs: jnp.ndarray,
                      key: jax.Array, *, max_bounces: int = 3,
                      mirror_threshold: float = 0.9,
                      background=(2.0, 2.0, 5.0),
                      guide_fn: Optional[Callable] = None,
                      fb_prob: float = 1.0,
                      collect_stats: bool = True,
                      fast: bool = False):
    """Fused-tracer entry: routes big-net guides' params around the jit.

    A guide carrying ``_fused_spec`` with a custom apply (the full
    TrainedFBAgent) must have its params passed as jit *arguments* —
    calling the guide closure inside the traced program would inline the
    network weights as constants, and >10 MB of literal MLIR SIGILLs the
    TPU compiler (the same rule as fb.inference.as_guide_fn; observed on
    the multi-scene agent under impl="fused").  Distilled students stay on
    the static-closure path: their ~10 KB of literals fuse harmlessly.
    """
    return call_with_split_guide(
        _trace_path_fused_impl, guide_fn, scene, origins, dirs, key,
        max_bounces=max_bounces, mirror_threshold=mirror_threshold,
        background=background, fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast)


def split_guide(guide_fn):
    """``(guide_fn, g_params, g_apply, g_dtype)`` — separate a big-net
    guide into a traced params pytree + hashable apply so callers can pass
    the params as jit arguments (see _trace_path_fused's docstring).  For
    distilled students / plain callables everything stays in ``guide_fn``
    and the other three are None."""
    spec = (getattr(guide_fn, "_fused_spec", None)
            if guide_fn is not None else None)
    if spec is not None and len(spec) > 2 and spec[2] is not None:
        return None, spec[0], spec[2], spec[1]
    return guide_fn, None, None, None


def call_with_split_guide(jit_fn, guide_fn, *args, **kw):
    """Invoke a jitted render/trace function with a guide's parameters
    routed AROUND the jit boundary (split_guide) — the one place the
    split/route dance lives, so every new jit boundary above trace_path
    gets the big-net-safe routing structurally instead of by convention.
    ``jit_fn`` must accept ``g_params`` (traced pytree kwarg) and the
    static kwargs ``guide_fn`` / ``g_apply`` / ``g_dtype``."""
    guide_fn, g_params, g_apply, g_dtype = split_guide(guide_fn)
    return jit_fn(*args, g_params=g_params, guide_fn=guide_fn,
                  g_apply=g_apply, g_dtype=g_dtype, **kw)


@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "guide_fn", "g_apply", "g_dtype",
                                   "collect_stats", "emissive_idx",
                                   "no_diffuse", "fast"))
def _trace_path_fused_impl(scene: Scene, origins: jnp.ndarray,
                           dirs: jnp.ndarray, key: jax.Array,
                           g_params, *, max_bounces: int = 3,
                           mirror_threshold: float = 0.9,
                           background=(2.0, 2.0, 5.0),
                           guide_fn: Optional[Callable] = None,
                           g_apply=None, g_dtype=None,
                           fb_prob: float = 1.0,
                           collect_stats: bool = True,
                           emissive_idx: Optional[tuple] = None,
                           no_diffuse: bool = False,
                           fast: bool = False):
    dtype = origins.dtype
    R = origins.shape[0]
    bg = jnp.asarray(background, dtype)
    d = vec.normalise_safe(dirs.astype(dtype))

    emissive_mask = scene.emitive > 0            # "light_sources" membership
    small_mask = emissive_mask & (scene.radius < 0.5)
    is_mirror = scene.reflective > mirror_threshold

    no_sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)

    # Component (SoA) carries — see nearest_hit's layout note: [R]-shaped
    # xyz/rgb components keep the VPU at full lane width.
    def level(carry, inputs):
        ox, oy, oz, dx, dy, dz, running = carry
        k, subkey = inputs

        hit = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, no_sup,
                            by_abs=True, fast=fast)
        found = running & hit.found

        emis = found & take_small(emissive_mask, hit.idx)
        mirror = found & ~emis & take_small(is_mirror, hit.idx)
        diffuse = found & ~emis & ~mirror
        cont = mirror | diffuse

        # Direct lighting: sum over emissive spheres, skipping the hit sphere
        # itself (complex.py:333-348).  cos > 0 gate == max(0, cos) here.
        # Unrolled per sphere (same layout rationale as nearest_hit); the
        # per-light trunc makes every contribution integer-valued, so the
        # sequential sum is exactly the reference's.
        dr, dg, db = _direct_lighting_c(scene, hit.px, hit.py, hit.pz,
                                        hit.nx, hit.ny, hit.nz, hit.idx,
                                        emissive_mask, dtype,
                                        emissive_idx=emissive_idx, fast=fast)

        # Bounce direction.  With no_diffuse (static: every real sphere is
        # emissive or mirrors at this threshold — no_diffuse_possible) the
        # cosine/guide machinery can never influence a lane: skip the RNG
        # draws, the trig, and any policy forward; mirror reflect is the
        # only continuing direction.  Bit-exact where it applies.
        rlx, rly, rlz = vec.reflect_c(dx, dy, dz, hit.nx, hit.ny, hit.nz)
        if no_diffuse:
            dfx, dfy, dfz = rlx, rly, rlz
            use_fb = jnp.zeros((R,), bool)
        else:
            k_diff, k_fb = jax.random.split(subkey)
            dfx, dfy, dfz = sampling.cosine_weighted_c(k_diff, hit.nx,
                                                       hit.ny, hit.nz,
                                                       "renderer")
            if guide_fn is not None or g_apply is not None:
                use_fb = diffuse & (jax.random.uniform(k_fb, (R,), dtype)
                                    < fb_prob)
                obs = make_observation(
                    jnp.stack([hit.px, hit.py, hit.pz], -1),
                    jnp.stack([hit.nx, hit.ny, hit.nz], -1),
                    jnp.stack([dx, dy, dz], -1),
                    jnp.full((R,), k, dtype),
                    jnp.zeros((R, 3), dtype), scene, hit.idx, max_bounces)
                raw = (g_apply(g_params, obs, g_dtype) if g_apply is not None
                       else guide_fn(obs))
                action = jnp.clip(raw, -1.0, 1.0)
                fbx, fby, fbz = sampling.fb_action_to_direction_c(
                    action, hit.nx, hit.ny, hit.nz, "renderer")
                dfx = jnp.where(use_fb, fbx, dfx)
                dfy = jnp.where(use_fb, fby, dfy)
                dfz = jnp.where(use_fb, fbz, dfz)
            else:
                use_fb = jnp.zeros((R,), bool)

        nox = hit.px + hit.nx * 0.001                    # offset origin
        noy = hit.py + hit.ny * 0.001
        noz = hit.pz + hit.nz * 0.001
        ox = jnp.where(cont, nox, ox)
        oy = jnp.where(cont, noy, oy)
        oz = jnp.where(cont, noz, oz)
        dx = jnp.where(cont, jnp.where(mirror, rlx, dfx), dx)
        dy = jnp.where(cont, jnp.where(mirror, rly, dfy), dy)
        dz = jnp.where(cont, jnp.where(mirror, rlz, dfz), dz)

        state = jnp.where(running,
                          jnp.where(emis, _EMISSIVE,
                                    jnp.where(cont, _CONT, _MISS)),
                          _INACTIVE).astype(jnp.int8)
        ar = take_small(scene.colour[:, 0], hit.idx).astype(dtype)
        ag = take_small(scene.colour[:, 1], hit.idx).astype(dtype)
        ab = take_small(scene.colour[:, 2], hit.idx).astype(dtype)
        level_stats = (jnp.sum(running), jnp.sum(found), jnp.sum(emis),
                       jnp.sum(found & take_small(small_mask, hit.idx)),
                       jnp.sum(use_fb))
        out = (state, ar, ag, ab, dr, dg, db, use_fb)
        return (ox, oy, oz, dx, dy, dz, running & cont), (out, level_stats)

    keys = jax.random.split(key, max_bounces)
    running0 = jnp.ones((R,), bool)
    carry0 = (origins[:, 0], origins[:, 1], origins[:, 2],
              d[:, 0], d[:, 1], d[:, 2], running0)
    (*_, still_running), (recs, stats_seq) = jax.lax.scan(
        level, carry0, (jnp.arange(max_bounces, dtype=dtype), keys))

    states, ars, ags, abs_, drs, dgs, dbs, fbms = recs   # [L, R] each

    # Reverse fold: value flows from the deepest level back to the camera.
    # Lanes still running after L levels hit the bounce-budget background.
    # The emissive colour IS the albedo (light colour), so no separate rec.
    vr0 = jnp.full((R,), bg[0], dtype)
    vg0 = jnp.full((R,), bg[1], dtype)
    vb0 = jnp.full((R,), bg[2], dtype)

    def fold(i, value):
        vr, vg, vb = value
        lvl = max_bounces - 1 - i
        st = states[lvl]
        cr = jnp.trunc(ars[lvl] * jnp.minimum(255.0, drs[lvl] + vr) / 255.0)
        cg = jnp.trunc(ags[lvl] * jnp.minimum(255.0, dgs[lvl] + vg) / 255.0)
        cb = jnp.trunc(abs_[lvl] * jnp.minimum(255.0, dbs[lvl] + vb) / 255.0)
        is_cont = st == _CONT
        is_emis = st == _EMISSIVE
        is_miss = st == _MISS
        vr = jnp.where(is_cont, cr, vr)
        vg = jnp.where(is_cont, cg, vg)
        vb = jnp.where(is_cont, cb, vb)
        vr = jnp.where(is_emis, ars[lvl], vr)
        vg = jnp.where(is_emis, ags[lvl], vg)
        vb = jnp.where(is_emis, abs_[lvl], vb)
        vr = jnp.where(is_miss, bg[0], vr)
        vg = jnp.where(is_miss, bg[1], vg)
        vb = jnp.where(is_miss, bg[2], vb)
        return vr, vg, vb

    vr, vg, vb = jax.lax.fori_loop(0, max_bounces, fold, (vr0, vg0, vb0))
    rgb = jnp.stack([vr, vg, vb], -1)

    if collect_stats:
        # stats_seq is a tuple of per-level stacked counters [L]; the lanes
        # still running after L levels make one extra trace() call that the
        # reference counts before its bounce-budget early return.
        total_rays = jnp.sum(stats_seq[0]) + jnp.sum(still_running)
        # A guided bounce "succeeded" if its lane later terminated on an
        # emissive sphere.  Each lane terminates at most once (the scan
        # masks it _INACTIVE afterwards), and use_fb only fires on
        # continuing diffuse lanes, so the lane-level emissive flag is
        # exactly "the subpath below this bounce found light".
        term_emis = jnp.any(states == _EMISSIVE, axis=0)
        stats = PathStats(
            total_rays=total_rays,
            total_intersections=jnp.sum(stats_seq[1]),
            light_hits=jnp.sum(stats_seq[2]),
            small_light_hits=jnp.sum(stats_seq[3]),
            fb_used=jnp.sum(stats_seq[4]),
            fb_success=jnp.sum(fbms & term_emis[None, :]),
        )
    else:
        z = jnp.zeros((), jnp.int32)
        stats = PathStats(z, z, z, z, z, z)
    return rgb, stats


# ---------------------------------------------------------------------------
# Stepwise implementation: identical math + key schedule, one small jitted
# kernel per level plus the guide as its own program.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "use_pallas", "want_obs", "emissive_idx",
                                   "no_diffuse", "fast"))
def _level_kernel(scene: Scene, o, d, running, subkey, lvl, *,
                  max_bounces: int, mirror_threshold: float,
                  use_pallas: bool = False, want_obs: bool = True,
                  emissive_idx: Optional[tuple] = None,
                  no_diffuse: bool = False, fast: bool = False):
    """One path-trace level.  Internals run on [R]-shaped components (see
    nearest_hit's layout note); o/d/normal cross the program boundary as
    [R, 3] (one stack each — the boundary arrays are few and cheap next to
    the per-sphere sweeps)."""
    dtype = o.dtype
    R = o.shape[0]
    emissive_mask = scene.emitive > 0
    small_mask = emissive_mask & (scene.radius < 0.5)
    is_mirror = scene.reflective > mirror_threshold
    no_sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    if use_pallas:
        from ..core.intersect import NearestHitC
        from ..core.pallas_intersect import nearest_hit_pallas
        h = nearest_hit_pallas(o, d, scene, no_sup, by_abs=True)
        hit = NearestHitC(found=h.found, idx=h.idx, t=h.t,
                          px=h.point[:, 0], py=h.point[:, 1],
                          pz=h.point[:, 2], nx=h.normal[:, 0],
                          ny=h.normal[:, 1], nz=h.normal[:, 2])
    else:
        hit = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, no_sup,
                            by_abs=True, fast=fast)
    found = running & hit.found
    emis = found & take_small(emissive_mask, hit.idx)
    mirror = found & ~emis & take_small(is_mirror, hit.idx)
    diffuse = found & ~emis & ~mirror
    cont = mirror | diffuse

    dr, dg, db = _direct_lighting_c(scene, hit.px, hit.py, hit.pz,
                                    hit.nx, hit.ny, hit.nz, hit.idx,
                                    emissive_mask, dtype,
                                    emissive_idx=emissive_idx, fast=fast)

    rlx, rly, rlz = vec.reflect_c(dx, dy, dz, hit.nx, hit.ny, hit.nz)
    if no_diffuse:
        # Static: no lane can be diffuse (no_diffuse_possible) — skip the
        # cosine draw and the fb gate entirely, bit-exact.
        dfx, dfy, dfz = rlx, rly, rlz
        fb_u = jnp.ones((R,), dtype)            # gate never passes
    else:
        k_diff, k_fb = jax.random.split(subkey)
        dfx, dfy, dfz = sampling.cosine_weighted_c(k_diff, hit.nx, hit.ny,
                                                   hit.nz, "renderer")
        fb_u = jax.random.uniform(k_fb, (R,), dtype)

    normal = jnp.stack([hit.nx, hit.ny, hit.nz], -1)
    if want_obs:
        obs = make_observation(jnp.stack([hit.px, hit.py, hit.pz], -1),
                               normal, d,
                               jnp.full((R,), lvl, dtype),
                               jnp.zeros((R, 3), dtype), scene, hit.idx,
                               max_bounces)
    else:
        obs = jnp.zeros((R, 0), dtype)      # no guide → skip the 22-wide build

    ox = jnp.where(cont, hit.px + hit.nx * 0.001, ox)
    oy = jnp.where(cont, hit.py + hit.ny * 0.001, oy)
    oz = jnp.where(cont, hit.pz + hit.nz * 0.001, oz)
    dx = jnp.where(cont, jnp.where(mirror, rlx, dfx), dx)
    dy = jnp.where(cont, jnp.where(mirror, rly, dfy), dy)
    dz = jnp.where(cont, jnp.where(mirror, rlz, dfz), dz)
    o = jnp.stack([ox, oy, oz], -1)
    d = jnp.stack([dx, dy, dz], -1)

    state = jnp.where(running,
                      jnp.where(emis, _EMISSIVE,
                                jnp.where(cont, _CONT, _MISS)),
                      _INACTIVE).astype(jnp.int8)
    ar = take_small(scene.colour[:, 0], hit.idx).astype(dtype)
    ag = take_small(scene.colour[:, 1], hit.idx).astype(dtype)
    ab = take_small(scene.colour[:, 2], hit.idx).astype(dtype)
    stats = (jnp.sum(running), jnp.sum(found), jnp.sum(emis),
             jnp.sum(found & take_small(small_mask, hit.idx)))
    return (o, d, running & cont, state, (ar, ag, ab), (dr, dg, db), obs,
            diffuse, fb_u, normal, stats)


def _student_forward(params, obs, dtype):
    """Inline forward of fb.distill.StudentPolicy (Dense/relu chain) —
    numerically identical to DistilledGuide.as_guide_fn's flax apply in the
    same dtype (cast params+obs, matmul+bias per layer, relu between,
    f32 out).  Params ride as jit ARGUMENTS (never closed over: constant-
    inlined weights SIGILL the TPU compiler on big nets and defeat the
    compile cache on all nets)."""
    x = obs if dtype is None else obs.astype(dtype)
    n_layers = len(params)
    for i in range(n_layers):
        p = params[f"Dense_{i}"]
        k, b = p["kernel"], p["bias"]
        if dtype is not None:
            k, b = k.astype(dtype), b.astype(dtype)
        x = x @ k + b
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x.astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "use_pallas", "guide_dtype",
                                   "guide_apply", "emissive_idx",
                                   "no_diffuse", "fast"))
def _level_kernel_guided(scene: Scene, o, d, running, subkey, lvl,
                         guide_params, fb_prob, *, max_bounces: int,
                         mirror_threshold: float, use_pallas: bool = False,
                         guide_dtype=jnp.bfloat16, guide_apply=None,
                         emissive_idx: Optional[tuple] = None,
                         no_diffuse: bool = False, fast: bool = False):
    """One level with the guide network FUSED into the program: obs build
    → policy forward → action → bounce direction all in one dispatch (the
    separate-program guide costs 2 extra host→device dispatches per level,
    which at small wavefronts through the tunneled TPU is most of the
    guided-vs-traditional gap).  Same key schedule and bf16 guide math as
    the unfused path.

    ``guide_apply`` (static, hashable) maps ``(params, obs, dtype) →
    action``; None selects the distilled-student MLP (_student_forward).
    fb.inference passes a full-agent apply so the 512-wide TrainedFBAgent
    fuses the same way (params ride as traced arguments either way — never
    closed over, see _student_forward's note)."""
    (o2, d2, running2, state, albedo, direct, obs, diffuse, fb_u,
     normal, stats) = _level_kernel(
        scene, o, d, running, subkey, lvl, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold, use_pallas=use_pallas,
        want_obs=not no_diffuse, emissive_idx=emissive_idx,
        no_diffuse=no_diffuse, fast=fast)
    if no_diffuse:
        # Statically no diffuse lane → the guide can never fire; skip the
        # policy forward entirely (bit-exact, see no_diffuse_possible).
        return (o2, d2, running2, state, albedo, direct,
                jnp.zeros(o.shape[:1], bool), stats)
    apply_fn = guide_apply if guide_apply is not None else _student_forward
    action = apply_fn(guide_params, obs, guide_dtype)
    use_fb = diffuse & (fb_u < fb_prob)
    d2 = _apply_guide(action, normal, use_fb, d2, diffuse)
    return (o2, d2, running2, state, albedo, direct, use_fb, stats)


@jax.jit
def _apply_guide(action, normal, use_fb, d, cont):
    fbx, fby, fbz = sampling.fb_action_to_direction_c(
        jnp.clip(action, -1.0, 1.0),
        normal[:, 0], normal[:, 1], normal[:, 2], "renderer")
    m = use_fb & cont
    return jnp.stack([jnp.where(m, fbx, d[:, 0]),
                      jnp.where(m, fby, d[:, 1]),
                      jnp.where(m, fbz, d[:, 2])], -1)


@jax.jit
def _fold_level(state, albedo, direct, bg, value):
    """One reverse-fold step on per-channel components: ``albedo``/
    ``direct``/``value`` are ``(r, g, b)`` tuples of [R] arrays."""
    is_cont = state == _CONT
    is_emis = state == _EMISSIVE
    is_miss = state == _MISS
    out = []
    for c in range(3):
        comb = jnp.trunc(albedo[c] * jnp.minimum(255.0, direct[c] + value[c])
                         / 255.0)
        v = jnp.where(is_cont, comb, value[c])
        v = jnp.where(is_emis, albedo[c], v)
        v = jnp.where(is_miss, bg[c], v)
        out.append(v)
    return tuple(out)


import weakref

_GUIDE_JIT_CACHE: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()
_GUIDE_JIT_BY_ID: dict = {}


def _jit_guide(guide_fn):
    """jit the guide once per callable (compiles once, reused every level
    and every frame) — calling a flax apply eagerly per level costs
    hundreds of tiny dispatches.

    Guides marked ``_no_rejit`` manage their own jit with params passed as
    arguments (see fb.inference.as_guide_fn) — wrapping those again would
    re-inline the weights as constants, which crashes the TPU compiler on
    big networks."""
    if getattr(guide_fn, "_no_rejit", False) or hasattr(guide_fn, "lower"):
        return guide_fn
    key = id(guide_fn)
    hit = _GUIDE_JIT_BY_ID.get(key)
    if hit is None or hit[0]() is not guide_fn:
        jitted = jax.jit(guide_fn)
        _GUIDE_JIT_BY_ID[key] = (weakref.ref(guide_fn), jitted)
        return jitted
    return hit[1]


def _trace_path_stepwise(scene: Scene, origins, dirs, key, *,
                         max_bounces: int, mirror_threshold: float,
                         background, guide_fn, fb_prob: float,
                         collect_stats: bool, use_pallas: bool = False,
                         guide_max_level: Optional[int] = None,
                         fast: bool = False):
    dtype = origins.dtype
    R = origins.shape[0]
    bg = jnp.asarray(background, dtype)
    d = vec.normalise_safe(dirs.astype(dtype))
    o = origins
    running = jnp.ones((R,), bool)
    keys = jax.random.split(key, max_bounces)
    em_idx = emissive_indices(scene)
    no_diff = no_diffuse_possible(scene, mirror_threshold)
    fused_spec = (getattr(guide_fn, "_fused_spec", None)
                  if guide_fn is not None else None)
    guide = (_jit_guide(guide_fn)
             if guide_fn is not None and fused_spec is None else None)
    if fused_spec is not None:
        # (params, dtype) → distilled student; (params, dtype, apply) →
        # custom policy forward (e.g. the full TrainedFBAgent).
        g_params, g_dtype, *rest = fused_spec
        g_apply = rest[0] if rest else None
        fb_prob_arr = jnp.asarray(fb_prob, dtype)

    # No host syncs inside the loop: all counters stay on device and the
    # loop always runs max_bounces levels (inactive lanes are masked).
    recs = []
    stats_dev = []
    fb_masks = []
    for k in range(max_bounces):
        lvl = jnp.asarray(float(k), dtype)
        guided_level = (guide_max_level is None or k < guide_max_level)
        if not guided_level and (fused_spec is not None or guide is not None):
            # Past the guide budget: plain cosine level, no policy forward
            # (guide-only-first-K deployment mode; key schedule unchanged —
            # _level_kernel draws the same splits, the guide draw is
            # simply unused).
            (o, d, running, state, albedo, direct, _obs, _diffuse, _fb_u,
             _normal, stats) = _level_kernel(
                scene, o, d, running, keys[k], lvl,
                max_bounces=max_bounces, mirror_threshold=mirror_threshold,
                use_pallas=use_pallas, want_obs=False, emissive_idx=em_idx,
                no_diffuse=no_diff, fast=fast)
            recs.append((state, albedo, direct))
            stats_dev.append(stats)
            continue
        if fused_spec is not None:
            (o, d, running, state, albedo, direct, use_fb, stats) = \
                _level_kernel_guided(
                    scene, o, d, running, keys[k], lvl, g_params,
                    fb_prob_arr, max_bounces=max_bounces,
                    mirror_threshold=mirror_threshold,
                    use_pallas=use_pallas, guide_dtype=g_dtype,
                    guide_apply=g_apply, emissive_idx=em_idx,
                    no_diffuse=no_diff, fast=fast)
            fb_masks.append(use_fb)
            recs.append((state, albedo, direct))
            stats_dev.append(stats)
            continue
        (o, d, running, state, albedo, direct, obs, diffuse, fb_u,
         normal, stats) = _level_kernel(
            scene, o, d, running, keys[k], lvl,
            max_bounces=max_bounces, mirror_threshold=mirror_threshold,
            use_pallas=use_pallas, want_obs=guide is not None,
            emissive_idx=em_idx, no_diffuse=no_diff, fast=fast)
        if guide is not None:
            use_fb = diffuse & (fb_u < fb_prob)
            action = guide(obs)
            d = _apply_guide(action, normal, use_fb, d, diffuse)
            fb_masks.append(use_fb)
        recs.append((state, albedo, direct))
        stats_dev.append(stats)

    return _stepwise_epilogue(tuple(recs), tuple(stats_dev), running,
                              tuple(fb_masks), bg)


@jax.jit
def _stepwise_epilogue(recs, stats_dev, running, fb_masks, bg):
    """Reverse fold + stats aggregation for the stepwise tracer, fused into
    ONE program.  Chaining ``_fold_level`` and the Python-sum stat
    reductions eagerly costs ~40-50 small dispatches per frame — through
    the tunneled TPU's fixed per-dispatch overhead that is a large share of
    the stepwise frame's wall clock at deployment shapes, for work that is
    a few elementwise passes on device.  The level count is baked into the
    pytree structure, so each (max_bounces, guided?) shape compiles once.
    Math is bit-identical to the eager chain (same ops, same order)."""
    R = recs[0][0].shape[0]
    dtype = bg.dtype
    value = tuple(jnp.full((R,), bg[c], dtype) for c in range(3))
    for state, albedo, direct in reversed(recs):
        value = _fold_level(state, albedo, direct, bg, value)
    value = jnp.stack(value, -1)

    sums = [sum(s[i] for s in stats_dev) for i in range(4)]
    still = jnp.sum(running)
    zi = jnp.int32
    if fb_masks:
        term_emis = _terminated_emissive([r[0] for r in recs])
        fb_used = sum(jnp.sum(m) for m in fb_masks).astype(zi)
        fb_success = sum(jnp.sum(m & term_emis) for m in fb_masks).astype(zi)
    else:
        fb_used = jnp.zeros((), zi)
        fb_success = jnp.zeros((), zi)
    stats = PathStats(
        total_rays=(sums[0] + still).astype(zi),
        total_intersections=sums[1].astype(zi),
        light_hits=sums[2].astype(zi),
        small_light_hits=sums[3].astype(zi),
        fb_used=fb_used,
        fb_success=fb_success,
    )
    return value, stats


@jax.jit
def _terminated_emissive(states):
    """[R] mask: the lane's (unique) terminal state was _EMISSIVE — see
    PathStats.fb_success."""
    out = states[0] == _EMISSIVE
    for st in states[1:]:
        out = out | (st == _EMISSIVE)
    return out


# ---------------------------------------------------------------------------
# Lean implementation: the production-serving tracer.  Bit-identical output
# to impl="fused" (same RNG draws, same op order per lane), restructured
# around the measured TPU cost profile (scripts/profile_path4-6):
#
# * per-sphere attributes (albedo, emissive/small/mirror flags, the obs
#   material props) are selected IN the nearest-hit sweep under the same
#   `better` mask instead of post-hoc ``take_small`` chains — the i32
#   ``idx == s`` select chains were ~23 ms of the 800×600 frame on their
#   own while the sweep itself runs near the dispatch floor;
# * the CONCRETE scene's sphere scalars are baked as compile-time
#   literals (``scene_spec``) — measured 186 ms → 66 ms wall on the
#   800×600 frame with identical images (scripts/profile_path6: traced
#   scalar reads defeat constant folding across the whole sweep).  One
#   compile per scene, amortised by the persistent compilation cache —
#   the serving model (one scene, many frames).  Tracer-driven scenes
#   fall back to traced reads automatically;
# * levels are Python-unrolled and the reverse fold is inlined in the same
#   program (no lax.scan level carries or [L, R] stacked records in HBM);
# * the wavefront is processed in ``block_rays``-sized blocks via
#   ``lax.map`` — the ~240k-ray live set schedules ~35% better than a
#   full 3.84M-ray wavefront.
#
# RNG parity: the fused scan draws, per level, ``k_diff, k_fb =
# split(keys[lvl])`` then ``uniform(k_diff, (R, 2))`` (inside
# cosine_weighted_c) and ``uniform(k_fb, (R,))``.  The lean prologue makes
# the *identical* draws for the full wavefront up front and hands each
# block its slice, so every lane sees the same uniforms → the same sample
# directions → the same image, bit for bit (asserted lean≡fused in
# tests/test_path.py).
#
# Footprint note: the prologue materialises all L levels of uniforms for
# the FULL wavefront (O(L·R) HBM — ~350 MB at 800×600@8spp with 8 bounces
# guided), so the per-block live-set shrinkage does not shrink the RNG
# buffer.  That is the price of bit-parity with the fused draw schedule:
# per-block key derivation would draw different uniforms per lane and
# forfeit the lean≡fused equality family.  Frames/spp large enough to OOM
# here should render via impl="fused" + spp_chunk (bounded live set, no
# prologue).
# ---------------------------------------------------------------------------

def scene_spec(scene) -> Optional[tuple]:
    """Static per-sphere literal table from a CONCRETE scene, or None when
    the scene is traced.  Row: ``(cx, cy, cz, r, colr, colg, colb, refl,
    transp, emit, ior, id)`` as Python floats — exact f64 images of the f32
    array values, so every op against them produces the identical f32
    result (weak-typed constants; images asserted identical).  Radius-0
    padding rows are kept: the fused sweep visits them too, and dropping
    them could (measure-zero) flip a ``d2 == 0`` exact-graze hit."""
    try:
        import numpy as _np
        c = _np.asarray(scene.centre)
        r = _np.asarray(scene.radius)
        col = _np.asarray(scene.colour)
        rf = _np.asarray(scene.reflective)
        tr = _np.asarray(scene.transparent)
        em = _np.asarray(scene.emitive)
        io = _np.asarray(scene.ior)
        sid = _np.asarray(scene.id)
    except Exception:
        return None
    return tuple(
        (float(c[s, 0]), float(c[s, 1]), float(c[s, 2]), float(r[s]),
         float(col[s, 0]), float(col[s, 1]), float(col[s, 2]),
         float(rf[s]), float(tr[s]), float(em[s]), float(io[s]),
         int(sid[s]))
        for s in range(c.shape[0]))


def _sphere_rows(scene, spec, dtype):
    """Uniform per-sphere scalar access for the lean sweep: literal tuples
    when ``spec`` is static, traced array reads otherwise (same op order
    downstream either way; traced colour/material reads cast to ``dtype``
    exactly as the fused impl's ``take_small(...).astype(dtype)``)."""
    if spec is not None:
        return list(spec)
    n = scene.centre.shape[0]
    return [(scene.centre[s, 0], scene.centre[s, 1], scene.centre[s, 2],
             scene.radius[s],
             scene.colour[s, 0].astype(dtype),
             scene.colour[s, 1].astype(dtype),
             scene.colour[s, 2].astype(dtype),
             scene.reflective[s].astype(dtype),
             scene.transparent[s].astype(dtype),
             scene.emitive[s].astype(dtype),
             scene.ior[s].astype(dtype),
             scene.id[s].astype(dtype))
            for s in range(n)]


def _lean_sweep(ox, oy, oz, dx, dy, dz, rows, extra_vals, *, fast):
    """Nearest-hit sweep with in-sweep attribute selection.

    Math and op order are exactly ``nearest_hit_c(by_abs=True)`` with no
    suppression (the path tracers never suppress — they use the 0.001
    normal offset).  ``rows``: per-sphere scalar tuples (_sphere_rows);
    ``extra_vals``: per-attribute lists of per-sphere scalars whose
    hit-lane value is selected under the same ``better`` mask; entries for
    lanes with no valid hit are zeros (callers only consume them under
    ``found``, same as the fused impl's ``take_small`` values are only
    consumed under ``found``).  Returns
    ``(found, best_i, px, py, pz, nx, ny, nz, extras)``."""
    dtype = ox.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    best_m = jnp.full(ox.shape, big, dtype)
    best_t = jnp.full(ox.shape, big, dtype)
    best_i = jnp.zeros(ox.shape, jnp.int32)
    bcx = jnp.zeros(ox.shape, dtype)
    bcy = jnp.zeros(ox.shape, dtype)
    bcz = jnp.zeros(ox.shape, dtype)
    extras = [jnp.zeros(ox.shape, bool) if vals_bool else
              jnp.zeros(ox.shape, dtype)
              for vals, vals_bool in extra_vals]
    found = jnp.zeros(ox.shape, bool)
    for s, row in enumerate(rows):
        cx, cy, cz, r = row[0], row[1], row[2], row[3]
        lx, ly, lz = cx - ox, cy - oy, cz - oz
        tca = lx * dx + ly * dy + lz * dz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
        thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
        t = tca - thc
        inside = (d2 <= r * r) if fast else (jnp.sqrt(d2) <= r)
        valid = (tca >= 0.0) & inside
        m = jnp.abs(t)                                  # by_abs ordering
        better = valid & (m < best_m)
        best_m = jnp.where(better, m, best_m)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, s, best_i)
        bcx = jnp.where(better, cx, bcx)
        bcy = jnp.where(better, cy, bcy)
        bcz = jnp.where(better, cz, bcz)
        extras = [jnp.where(better, vals[s], e)
                  for (vals, _), e in zip(extra_vals, extras)]
        found = found | valid
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t
    nx, ny, nz = vec.normalise_safe_c(px - bcx, py - bcy, pz - bcz)
    return found, best_i, px, py, pz, nx, ny, nz, extras


def _direct_lighting_rows(rows, emissive_flags, px, py, pz, nx, ny, nz, idx,
                          dtype, emissive_idx, fast):
    """_direct_lighting_c on per-sphere scalar rows (literal or traced) —
    identical math and summation order, so identical trunc-site integers.
    ``emissive_flags[s]``: Python bool (static spec) or traced bool."""
    dr = jnp.zeros_like(px)
    dg = jnp.zeros_like(px)
    db = jnp.zeros_like(px)
    spheres = (range(len(rows)) if emissive_idx is None else emissive_idx)
    for s in spheres:
        cx, cy, cz = rows[s][0], rows[s][1], rows[s][2]
        tx, ty, tz = cx - px, cy - py, cz - pz
        d2 = tx * tx + ty * ty + tz * tz
        if fast:
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
            ldotn = tx * nx + ty * ny + tz * nz
            w = jnp.maximum(ldotn * inv, 0.0) * (inv * inv) * 0.3
        else:
            dist = jnp.sqrt(d2)
            den = jnp.maximum(dist, 1e-20)
            cosang = (tx / den) * nx + (ty / den) * ny + (tz / den) * nz
            w = (jnp.maximum(cosang, 0.0)
                 / jnp.maximum(dist * dist, 1e-30) * 0.3)
        w = jnp.where(emissive_flags[s] & (idx != s), w, 0.0)
        dr = dr + jnp.trunc(w * rows[s][4])
        dg = dg + jnp.trunc(w * rows[s][5])
        db = db + jnp.trunc(w * rows[s][6])
    return dr, dg, db


def _trace_path_lean(scene, origins, dirs, key, *, max_bounces,
                     mirror_threshold, background, guide_fn, fb_prob,
                     collect_stats, fast, block_rays: int = 245760):
    spec = scene_spec(scene)
    return call_with_split_guide(
        _trace_path_lean_impl, guide_fn,
        None if spec is not None else scene, origins, dirs, key,
        max_bounces=max_bounces, mirror_threshold=mirror_threshold,
        background=background, fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast,
        block_rays=block_rays, spec=spec)


@partial(jax.jit, static_argnames=("max_bounces", "mirror_threshold",
                                   "guide_fn", "g_apply", "g_dtype",
                                   "collect_stats", "emissive_idx",
                                   "no_diffuse", "fast", "block_rays",
                                   "spec"))
def _trace_path_lean_impl(scene: Optional[Scene], origins, dirs, key,
                          g_params, *,
                          max_bounces: int, mirror_threshold: float,
                          background=(2.0, 2.0, 5.0),
                          guide_fn: Optional[Callable] = None,
                          g_apply=None, g_dtype=None, fb_prob: float = 1.0,
                          collect_stats: bool = True,
                          emissive_idx: Optional[tuple] = None,
                          no_diffuse: bool = False, fast: bool = False,
                          block_rays: int = 245760,
                          spec: Optional[tuple] = None):
    dtype = origins.dtype
    R = origins.shape[0]
    bg = jnp.asarray(background, dtype)
    d = vec.normalise_safe(dirs.astype(dtype))
    guided = guide_fn is not None or g_apply is not None

    # Static block layout: nblk blocks of RB rays, last one padded with
    # inactive lanes (running=False → never counted, value left at bg,
    # sliced off below).
    nblk = max(1, -(-R // block_rays))
    RB = -(-R // nblk)
    pad = nblk * RB - R

    def blocks(x, fill=0.0):
        if pad:
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, width, constant_values=fill)
        return x.reshape((nblk, RB) + x.shape[1:])

    # RNG prologue — the fused scan's exact draw schedule on the FULL
    # wavefront (see the section comment), sliced per block.
    keys = jax.random.split(key, max_bounces)
    cos_u, fb_u = [], []
    for lvl in range(max_bounces):
        if no_diffuse:
            cos_u.append(None)
            fb_u.append(None)
            continue
        k_diff, k_fb = jax.random.split(keys[lvl])
        cos_u.append(blocks(jax.random.uniform(k_diff, (R, 2), dtype)))
        fb_u.append(blocks(jax.random.uniform(k_fb, (R,), dtype))
                    if guided else None)

    rows = _sphere_rows(scene, spec, dtype)
    if spec is not None:
        em_flags = [row[9] > 0 for row in spec]                # Python bools
        sm_flags = [e and row[3] < 0.5 for e, row in zip(em_flags, spec)]
        mr_flags = [row[7] > mirror_threshold for row in spec]
    else:
        em_flags = [scene.emitive[s] > 0 for s in range(len(rows))]
        sm_flags = [em_flags[s] & (scene.radius[s] < 0.5)
                    for s in range(len(rows))]
        mr_flags = [scene.reflective[s] > mirror_threshold
                    for s in range(len(rows))]
    # (values, is_bool) per in-sweep-selected attribute.
    extra_vals = [([row[4] for row in rows], False),
                  ([row[5] for row in rows], False),
                  ([row[6] for row in rows], False),
                  (em_flags, True), (sm_flags, True), (mr_flags, True)]
    if guided:
        # The 22-D obs material segment (make_observation's take_small
        # reads) selected in-sweep instead.
        extra_vals += [([row[7] for row in rows], False),
                       ([row[8] for row in rows], False),
                       ([row[9] for row in rows], False),
                       ([row[10] for row in rows], False),
                       ([row[11] for row in rows], False)]

    lane = jnp.arange(nblk * RB, dtype=jnp.int32).reshape(nblk, RB)
    xs = (blocks(origins[:, 0]), blocks(origins[:, 1]), blocks(origins[:, 2]),
          blocks(d[:, 0]), blocks(d[:, 1]), blocks(d[:, 2]),
          lane < R,
          tuple(u for u in cos_u if u is not None),
          tuple(u for u in fb_u if u is not None))

    def one(args):
        ox, oy, oz, dx, dy, dz, running, cos_us, fb_us = args
        levels = []          # (is_emis, is_cont, is_miss, ar, ag, ab,
        #                       dr, dg, db) per level
        lstats = []
        fb_masks = []
        for lvl in range(max_bounces):
            found, idx, px, py, pz, nx, ny, nz, ex = _lean_sweep(
                ox, oy, oz, dx, dy, dz, rows, extra_vals, fast=fast)
            ar, ag, ab, em, sm, mr = ex[:6]
            found = running & found
            emis = found & em
            mirror = found & ~emis & mr
            diffuse = found & ~emis & ~mirror
            cont = mirror | diffuse

            dr, dg, db = _direct_lighting_rows(
                rows, em_flags, px, py, pz, nx, ny, nz, idx, dtype,
                emissive_idx, fast)

            rlx, rly, rlz = vec.reflect_c(dx, dy, dz, nx, ny, nz)
            if no_diffuse:
                dfx, dfy, dfz = rlx, rly, rlz
                use_fb = jnp.zeros(ox.shape, bool)
            else:
                u = cos_us[lvl]
                theta = jnp.arccos(jnp.sqrt(u[..., 0]))
                phi = 2.0 * jnp.pi * u[..., 1]
                dfx, dfy, dfz = sampling.local_to_world_c(
                    theta, phi, nx, ny, nz, "renderer")
                if guided:
                    use_fb = diffuse & (fb_us[lvl] < fb_prob)
                    refl, transp, emitf, ior, sid = ex[6:]
                    shp = ox.shape
                    obs = jnp.concatenate([
                        jnp.stack([px, py, pz], -1),
                        jnp.stack([dx, dy, dz], -1),
                        jnp.stack([nx, ny, nz], -1),
                        refl[..., None], transp[..., None],
                        emitf[..., None], ior[..., None],
                        jnp.zeros(shp + (3,), dtype),
                        jnp.full(shp + (1,), float(lvl), dtype) / max_bounces,
                        jnp.zeros(shp + (1,), dtype),
                        (sid / 100.0)[..., None],
                        jnp.full(shp + (3,), 0.5, dtype),
                    ], axis=-1)
                    raw = (g_apply(g_params, obs, g_dtype)
                           if g_apply is not None else guide_fn(obs))
                    action = jnp.clip(raw, -1.0, 1.0)
                    fbx, fby, fbz = sampling.fb_action_to_direction_c(
                        action, nx, ny, nz, "renderer")
                    dfx = jnp.where(use_fb, fbx, dfx)
                    dfy = jnp.where(use_fb, fby, dfy)
                    dfz = jnp.where(use_fb, fbz, dfz)
                else:
                    use_fb = jnp.zeros(ox.shape, bool)

            ox = jnp.where(cont, px + nx * 0.001, ox)
            oy = jnp.where(cont, py + ny * 0.001, oy)
            oz = jnp.where(cont, pz + nz * 0.001, oz)
            dx = jnp.where(cont, jnp.where(mirror, rlx, dfx), dx)
            dy = jnp.where(cont, jnp.where(mirror, rly, dfy), dy)
            dz = jnp.where(cont, jnp.where(mirror, rlz, dfz), dz)

            is_miss = running & ~emis & ~cont
            levels.append((emis, cont, is_miss, ar, ag, ab, dr, dg, db))
            lstats.append((jnp.sum(running), jnp.sum(found), jnp.sum(emis),
                           jnp.sum(found & sm), jnp.sum(use_fb)))
            fb_masks.append(use_fb)
            running = running & cont

        # Inline reverse fold — same op order as the fused fold.
        vr = jnp.full(ox.shape, bg[0], dtype)
        vg = jnp.full(ox.shape, bg[1], dtype)
        vb = jnp.full(ox.shape, bg[2], dtype)
        for emis, cont, is_miss, ar, ag, ab, dr, dg, db in reversed(levels):
            cr = jnp.trunc(ar * jnp.minimum(255.0, dr + vr) / 255.0)
            cg = jnp.trunc(ag * jnp.minimum(255.0, dg + vg) / 255.0)
            cb = jnp.trunc(ab * jnp.minimum(255.0, db + vb) / 255.0)
            vr = jnp.where(cont, cr, vr)
            vg = jnp.where(cont, cg, vg)
            vb = jnp.where(cont, cb, vb)
            vr = jnp.where(emis, ar, vr)
            vg = jnp.where(emis, ag, vg)
            vb = jnp.where(emis, ab, vb)
            vr = jnp.where(is_miss, bg[0], vr)
            vg = jnp.where(is_miss, bg[1], vg)
            vb = jnp.where(is_miss, bg[2], vb)

        term_emis = levels[0][0]
        for lv in levels[1:]:
            term_emis = term_emis | lv[0]
        sums = [sum(s[i] for s in lstats) for i in range(5)]
        fb_success = sum(jnp.sum(m & term_emis) for m in fb_masks)
        st = jnp.stack([sums[0] + jnp.sum(running), sums[1], sums[2],
                        sums[3], sums[4], fb_success])
        return jnp.stack([vr, vg, vb], -1), st

    if nblk == 1:
        rgb, st = one(jax.tree.map(lambda x: x[0], xs))
    else:
        rgb, st = jax.lax.map(one, xs)
        rgb = rgb.reshape(-1, 3)
        st = jnp.sum(st, axis=0)
    rgb = rgb[:R]

    if collect_stats:
        stats = PathStats(total_rays=st[0], total_intersections=st[1],
                          light_hits=st[2], small_light_hits=st[3],
                          fb_used=st[4], fb_success=st[5])
    else:
        z = jnp.zeros((), jnp.int32)
        stats = PathStats(z, z, z, z, z, z)
    return rgb, stats
