"""The output5 experiment tracers, vectorised.

Rebuild of the per-method tracers in ``CustomSceneExperiment``
(RL/output5.py): iterative *additive* path tracing — per bounce the surface
shading (hardcoded blue global light + the custom-scene sun with shadow
sweep) is accumulated with 255-clamps, then the next direction comes from
the method's policy:

* ``traditional`` — ``_trace_enhanced_traditional`` (:609-828): cosine
  diffuse, mirror on truthy reflective, 50/50 reflect-or-pass-through
  glass; emissive hit returns (255, 255, 200) outright; final brightness
  floor 80.
* ``rl`` — ``_trace_custom_rl`` (:830-918): sun-biased sampling
  (θ~U[0,π/4], φ~U[π/2,3π/2], env tangent frame); lights accumulate and the
  walk continues; final floor: +30 per channel if brightness < 30.
* ``fb`` — ``_trace_custom_fb`` (:979-1165): per-bounce lighting is
  ambient ``trunc(albedo*0.2) + (40, 40, 100)`` plus sun diffuse
  ``trunc(albedo*cos*0.8)`` gated by a shadow sweep that skips emissive
  blockers; emissive hits add the light colour and the walk CONTINUES;
  directions come from the EnhancedFBAgent strategy mix (exploration vs
  sun-seeking, exploration_rate 0.3, env tangent frame); final additive
  brightness boost to 50.  The reference's sequential per-ray memory
  updates don't vectorise; the wavefront version freezes the strategy mix
  at the agent's current exploration rate — noted redesign, same sampling
  distributions.

The traditional method's per-bounce shading constants: global light
(20, 20, 255) from direction (3, 1, −0.75) at strength 0.3, sun
(255, 255, 204) at (−0.6, 0.2, 6) with attenuation min(1, 100/d²) and
strength 0.9, int-truncation at each contribution.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import vec
from ..core.intersect import NO_SUPPRESS, nearest_hit
from ..scene.types import Scene
from . import sampling

SUN_POS = (-0.6, 0.2, 6.0)
SUN_COLOUR = (255.0, 255.0, 204.0)
GLOBAL_DIR = (3.0, 1.0, -0.75)
GLOBAL_COLOUR = (20.0, 20.0, 255.0)


def _sun_visible(scene: Scene, hit, dtype, skip_emissive: bool):
    """Single shadow sweep toward the hardcoded sun; ``skip_emissive``
    matches the fb tracer's blocker filter (:1060-1062)."""
    from ..core.intersect import sphere_ts
    sun = jnp.asarray(SUN_POS, dtype)
    to_sun = sun[None] - hit.point
    sun_dist = vec.magnitude(to_sun)
    to_sun_n = vec.normalise_safe(to_sun)
    o = hit.point + hit.normal * 0.001
    t, valid = sphere_ts(o[:, None, :], to_sun_n[:, None, :],
                         scene.centre, scene.radius, point=0)
    excl = (jnp.arange(scene.num_spheres)[None, :] == hit.idx[:, None])
    if skip_emissive:
        excl = excl | (scene.emitive > 0)[None, :]
    valid = valid & ~excl
    sp = o[:, None, :] + to_sun_n[:, None, :] * t[..., None]
    sdist = vec.magnitude(sp - hit.point[:, None, :])
    blocked = jnp.any(valid & (sdist < sun_dist[:, None]), axis=-1)
    cos = jnp.maximum(vec.dot(hit.normal, to_sun_n), 0.0)
    return ~blocked, cos


def _shade_level_fb(scene: Scene, hit, dtype):
    """The fb method's per-bounce lighting (:1070-1105): albedo ambient
    + global ambient (40,40,100), sun diffuse 0.8 gated by the
    emissive-skipping shadow sweep."""
    albedo = scene.colour[hit.idx].astype(dtype)
    visible, cos = _sun_visible(scene, hit, dtype, skip_emissive=True)
    ambient = jnp.minimum(255.0, jnp.trunc(albedo * 0.2)
                          + jnp.asarray((40.0, 40.0, 100.0), dtype)[None])
    diffuse = jnp.where(visible[:, None],
                        jnp.trunc(albedo * (cos * 0.8)[:, None]), 0.0)
    return jnp.minimum(255.0, ambient + diffuse)


def _shade_level(scene: Scene, hit, dtype):
    """Per-bounce 'original-like' lighting (RL/output5.py:663-729)."""
    gdir = vec.normalise_safe(jnp.asarray(GLOBAL_DIR, dtype))
    gcol = jnp.asarray(GLOBAL_COLOUR, dtype)
    scol = jnp.asarray(SUN_COLOUR, dtype)
    sun = jnp.asarray(SUN_POS, dtype)

    gcos = jnp.maximum(vec.dot(hit.normal, gdir), 0.0)
    global_contrib = jnp.trunc(gcol[None] * gcos[:, None] * 0.3)

    to_sun = sun[None] - hit.point
    sun_dist = vec.magnitude(to_sun)
    to_sun_n = vec.normalise_safe(to_sun)
    # Shadow sweep excluding the hit sphere (single-bounce test).
    o = hit.point + hit.normal * 0.001
    from ..core.intersect import sphere_ts
    t, valid = sphere_ts(o[:, None, :], to_sun_n[:, None, :],
                         scene.centre, scene.radius, point=0)
    excl = (jnp.arange(scene.num_spheres)[None, :] == hit.idx[:, None])
    valid = valid & ~excl
    sp = o[:, None, :] + to_sun_n[:, None, :] * t[..., None]
    sdist = vec.magnitude(sp - hit.point[:, None, :])
    blocked = jnp.any(valid & (sdist < sun_dist[:, None]), axis=-1)

    atten = jnp.minimum(1.0, 100.0 / jnp.maximum(sun_dist**2, 1e-20))
    cos = jnp.maximum(vec.dot(hit.normal, to_sun_n), 0.0)
    sun_contrib = jnp.trunc(scol[None] * (cos * 0.9 * atten)[:, None])
    sun_contrib = jnp.where(blocked[:, None], 0.0, sun_contrib)

    combined = jnp.minimum(255.0, global_contrib + sun_contrib)
    albedo = scene.colour[hit.idx].astype(dtype)
    return jnp.trunc(albedo * combined / 255.0)


@partial(jax.jit, static_argnames=("max_bounces", "method",
                                   "exploration_rate"))
def trace_output5(scene: Scene, origins, dirs, key, *, max_bounces: int = 5,
                  method: str = "traditional",
                  exploration_rate: float = 0.3):
    """Returns ``(rgb [R,3], stats)`` with
    stats = (light_hits, steps, reward_sum)."""
    dtype = origins.dtype
    R = origins.shape[0]
    d = vec.normalise_safe(dirs.astype(dtype))
    o = origins
    bg = jnp.asarray((2.0, 2.0, 5.0), dtype)
    emissive = scene.emitive > 0
    no_sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)

    def level(carry, inputs):
        o, d, acc, running, done_colour_set, out = carry
        lvl, k = inputs
        k1, k2, k3 = jax.random.split(k, 3)

        hit = nearest_hit(o, d, scene, no_sup, by_abs=True)
        miss = running & ~hit.found
        # Traditional: miss at level 0 → background; later → keep acc.
        if method == "traditional":
            bg_now = miss & (lvl == 0)
            out = jnp.where(bg_now[:, None], bg[None], out)
            done_colour_set = done_colour_set | bg_now
        running = running & hit.found

        emis = running & emissive[hit.idx]
        if method == "traditional":
            # Emissive: return (255,255,200) outright (:652-657).
            out = jnp.where(emis[:, None],
                            jnp.asarray((255.0, 255.0, 200.0), dtype)[None],
                            out)
            done_colour_set = done_colour_set | emis
            running = running & ~emis
            shade = _shade_level(scene, hit, dtype)
            acc = jnp.where(running[:, None],
                            jnp.minimum(255.0, acc + shade), acc)
        else:
            # RL/FB: light colour accumulates, walk continues (:869-880,
            # :1033-1044).
            lc = scene.colour[hit.idx].astype(dtype)
            acc = jnp.where(emis[:, None], jnp.minimum(255.0, acc + lc), acc)
            if method == "fb":
                shade = _shade_level_fb(scene, hit, dtype)
                acc = jnp.where((running & ~emis)[:, None],
                                jnp.minimum(255.0, acc + shade), acc)

        # Next direction by policy.
        if method == "traditional":
            refl = scene.reflective[hit.idx] > 0          # truthy rule
            transp = ~refl & (scene.transparent[hit.idx] > 0)
            mirror_d = vec.reflect(d, hit.normal)
            diff_d = sampling.cosine_weighted(k1, hit.normal, "renderer")
            pass_through = jax.random.uniform(k2, (R,), dtype) >= 0.5
            glass_d = jnp.where(pass_through[:, None], d, mirror_d)
            glass_o = jnp.where(pass_through[:, None],
                                hit.point + d * 0.001,
                                hit.point + hit.normal * 0.001)
            new_d = jnp.where(refl[:, None], mirror_d,
                              jnp.where(transp[:, None], glass_d, diff_d))
            new_o = jnp.where(transp[:, None], glass_o,
                              hit.point + hit.normal * 0.001)
        else:
            u = jax.random.uniform(k1, (R, 3), dtype)
            if method == "rl":
                sun_seek = jnp.ones((R,), bool)
            else:
                sun_seek = u[:, 2] >= exploration_rate
            theta = jnp.where(sun_seek, u[:, 0] * jnp.pi / 4,
                              u[:, 0] * jnp.pi / 2)
            phi = jnp.where(sun_seek,
                            jnp.pi / 2 + u[:, 1] * jnp.pi,
                            u[:, 1] * 2 * jnp.pi)
            new_d = sampling.local_to_world(theta, phi, hit.normal, "env")
            new_o = hit.point + hit.normal * 0.001

        o = jnp.where(running[:, None], new_o, o)
        d = jnp.where(running[:, None], new_d, d)
        stats = (jnp.sum(emis), jnp.sum(running | emis | miss))
        return (o, d, acc, running, done_colour_set, out), stats

    acc0 = jnp.zeros((R, 3), dtype)
    out0 = jnp.zeros((R, 3), dtype)
    keys = jax.random.split(key, max_bounces)
    init = (o, d, acc0, jnp.ones((R,), bool), jnp.zeros((R,), bool), out0)
    (o, d, acc, running, done_set, out), stats_seq = jax.lax.scan(
        level, init, (jnp.arange(max_bounces), keys))

    # Final colour per method (floors from the reference).
    if method == "traditional":
        dark = jnp.all(acc == 0.0, axis=-1)
        bright = jnp.mean(acc, axis=-1)
        scale = 80.0 / jnp.maximum(1.0, bright)
        boosted = jnp.minimum(255.0, jnp.trunc(acc * scale[:, None]))
        final = jnp.where((bright < 80.0)[:, None], boosted, acc)
        final = jnp.minimum(255.0, final)
        final = jnp.where(dark[:, None], bg[None], final)
        rgb = jnp.where(done_set[:, None], out, final)
    elif method == "rl":
        final = jnp.minimum(255.0, acc)
        bright = jnp.mean(final, axis=-1)
        rgb = jnp.where((bright < 30.0)[:, None],
                        jnp.minimum(255.0, final + 30.0), final)
    else:  # fb — additive boost to brightness 50 (:1146-1159)
        dark = jnp.all(acc == 0.0, axis=-1)
        bright = jnp.mean(acc, axis=-1)
        boost = jnp.maximum(50.0 - bright, 0.0)
        boosted = jnp.minimum(255.0, acc + boost[:, None])
        final = jnp.where((bright < 50.0)[:, None], boosted,
                          jnp.minimum(255.0, acc))
        rgb = jnp.where(dark[:, None], bg[None], final)

    light_hits = jnp.sum(stats_seq[0])
    steps = jnp.sum(stats_seq[1])
    return rgb, {"light_hits": light_hits, "steps": steps,
                 "reward": light_hits * 10.0}
