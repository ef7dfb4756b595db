"""Whitted terminal shading — vectorised ``Intersection.terminalRGB``
(reference RL/ray.py:37-65) plus the light-falloff model (RL/light.py:3-37).

Shading model, per terminal intersection:

* emissive term: ``object.colour * emitive``
* Σ global lights: linear angular falloff of the angle between the surface
  normal and the light's direction-of-origin — no shadow test, no cosine
  clamp (RL/ray.py:43-45).
* Σ point lights: a *shadow ray* toward the light traced with the full
  recursive tracer (``max_bounces=0`` by default at every reference call
  site); the surface is lit only if the shadow ray terminates on a sphere
  carrying the light's own id (RL/ray.py:47-62).  With ``max_bounces=0``
  that means: nearest non-self hit is the light sphere — a reflective
  blocker returns itself (id mismatch) and a transparent blocker returns
  None, both occluding.
* final: ``background + round(albedo * illumination / 255)`` per channel;
  the only rounding site is ``Colour.illuminate`` (RL/colour.py:21-28,
  Python ``round`` = banker's rounding = ``jnp.round``).

Shadow rays run as one ``[R]``-wide nearest-hit sweep per point light
(lights are few and statically known; unrolling avoids ``[R, P, 3]``
broadcast temporaries the same way nearest_hit unrolls its sphere axis) —
no recursion, one fused kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import vec
from ..core.intersect import take_small
from ..scene.types import GlobalLights, PointLights, Scene
from .whitted import TraceResult, trace_whitted


def incidence(angle: jnp.ndarray, max_angle: jnp.ndarray) -> jnp.ndarray:
    """Linear angular falloff (RL/light.py:3-9): 0 beyond ``max_angle``,
    else ``(max_angle - angle) / max_angle``."""
    rel = (max_angle - angle) / max_angle
    return jnp.where(angle > max_angle, 0.0, rel)


@partial(jax.jit, static_argnames=("shadow_max_bounces",))
def terminal_rgb(scene: Scene, glights: GlobalLights, plights: PointLights,
                 res: TraceResult, background: jnp.ndarray,
                 shadow_max_bounces: int = 0) -> jnp.ndarray:
    """Shade a wavefront of termini.  Returns raw reference-unit RGB
    ``[R, 3]`` floats (pre-clip, can exceed 255 exactly like the reference's
    ``Colour``).  Lanes with ``res.hit == False`` get ``background``
    (callers may substitute a sky colour instead, as Marbles 4 does).

    Everything runs on [R]-shaped xyz/rgb components (an [R, 3] array puts
    the 3-wide axis on the 128-lane dimension — ~4% VPU utilisation; the
    same layout rationale as nearest_hit's unrolled sweep)."""
    dtype = res.point.dtype
    background = jnp.asarray(background, dtype)
    px, py, pz = res.point[:, 0], res.point[:, 1], res.point[:, 2]
    nx, ny, nz = res.normal[:, 0], res.normal[:, 1], res.normal[:, 2]
    alb_r = take_small(scene.colour[:, 0], res.idx).astype(dtype)    # [R]
    alb_g = take_small(scene.colour[:, 1], res.idx).astype(dtype)
    alb_b = take_small(scene.colour[:, 2], res.idx).astype(dtype)
    emitivity = take_small(scene.emitive, res.idx).astype(dtype)

    il_r = alb_r * emitivity                                 # RL/ray.py:41
    il_g = alb_g * emitivity
    il_b = alb_b * emitivity

    # Global lights (RL/ray.py:43-45), unrolled per light: no [R, G]
    # broadcast temporaries (same layout rationale as nearest_hit).
    for g in range(glights.count):
        gx = glights.vector[g, 0].astype(dtype)              # scalars
        gy = glights.vector[g, 1].astype(dtype)
        gz = glights.vector[g, 2].astype(dtype)
        ang = vec.angle_between_c(nx, ny, nz, gx, gy, gz)    # [R]
        rel = (incidence(ang, glights.max_angle[g].astype(dtype))
               * glights.strength[g].astype(dtype))
        il_r = il_r + rel * glights.colour[g, 0].astype(dtype)
        il_g = il_g + rel * glights.colour[g, 1].astype(dtype)
        il_b = il_b + rel * glights.colour[g, 2].astype(dtype)

    # Point lights with shadow rays (RL/ray.py:47-62), one [R] sweep per
    # light instead of a [R*P] broadcast+reshape.
    if plights.count:
        self_id = take_small(scene.id, res.idx)              # [R]
    for p in range(plights.count):
        lx = plights.position[p, 0].astype(dtype)            # scalars
        ly = plights.position[p, 1].astype(dtype)
        lz = plights.position[p, 2].astype(dtype)
        tx, ty, tz = lx - px, ly - py, lz - pz               # [R] each
        if shadow_max_bounces == 0:
            # Fast path: with max_bounces=0 the recursive shadow trace
            # reduces exactly to one nearest-hit sweep — a mirror blocker
            # returns *itself* (its recursion is over budget → fallback,
            # RL/ray.py:198-201), a glass blocker returns None through the
            # transparent level (:226-229), anything else terminates on
            # itself.  So: lit ⇔ nearest non-suppressed hit is the light's
            # sphere and not glass-ruled.
            from ..core.intersect import nearest_hit_c
            sdx, sdy, sdz = vec.normalise_safe_c(tx, ty, tz)
            sh = nearest_hit_c(px, py, pz, sdx, sdy, sdz, scene, self_id)
            glass_rule = ((take_small(scene.transparent, sh.idx) == 1.0)
                          & (take_small(scene.reflective, sh.idx) != 1.0))
            terminus_id = jnp.where(sh.found & ~glass_rule,
                                    take_small(scene.id, sh.idx), NO_ID)
        else:
            to_light = jnp.stack([tx, ty, tz], -1)
            sres = trace_whitted(scene, res.point, to_light,
                                 max_bounces=shadow_max_bounces,
                                 suppress_id=self_id)
            terminus_id = jnp.where(sres.hit, take_small(scene.id, sres.idx),
                                    NO_ID)
        # Skip a light whose id matches the shaded object (RL/ray.py:48);
        # also guards lanes where the shadow origin is garbage (miss lanes).
        lit = ((terminus_id == plights.id[p])
               & (self_id != plights.id[p]) & res.hit)

        ang = vec.angle_between_c(nx, ny, nz, tx, ty, tz)    # [R]
        dist = vec.magnitude_c(tx, ty, tz)
        rel = (incidence(ang, plights.max_angle[p].astype(dtype))
               * plights.strength[p].astype(dtype))
        # func == -1: no distance term; func == 0: linear /distance (RL/light.py:33-37).
        rel = jnp.where(plights.func[p] == 0, rel / dist, rel)
        rel = jnp.where(lit, rel, 0.0)
        il_r = il_r + rel * plights.colour[p, 0].astype(dtype)
        il_g = il_g + rel * plights.colour[p, 1].astype(dtype)
        il_b = il_b + rel * plights.colour[p, 2].astype(dtype)

    # Colour.illuminate: per-channel round(albedo * light/255) (RL/colour.py:21-28),
    # then add the background (RL/ray.py:65).
    sh_r = background[0] + jnp.round(alb_r * il_r / 255.0)
    sh_g = background[1] + jnp.round(alb_g * il_g / 255.0)
    sh_b = background[2] + jnp.round(alb_b * il_b / 255.0)
    shaded = jnp.stack([sh_r, sh_g, sh_b], -1)
    return jnp.where(res.hit[:, None], shaded, background[None, :])


NO_ID = jnp.int32(-2147483647)
