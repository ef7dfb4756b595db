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

Shadow rays are batched as a second intersection sweep over
``[rays × point_lights]`` — no recursion, one fused kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import vec
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
    (callers may substitute a sky colour instead, as Marbles 4 does)."""
    dtype = res.point.dtype
    background = jnp.asarray(background, dtype)
    R = res.point.shape[0]
    albedo = scene.colour[res.idx].astype(dtype)             # [R, 3]
    emitivity = scene.emitive[res.idx].astype(dtype)

    illum = albedo * emitivity[:, None]                      # RL/ray.py:41

    # Global lights (RL/ray.py:43-45).
    if glights.count:
        gvec = glights.vector.astype(dtype)                  # [G, 3]
        ang = vec.angle_between(res.normal[:, None, :], gvec[None, :, :])  # [R, G]
        rel = incidence(ang, glights.max_angle.astype(dtype)) * glights.strength.astype(dtype)
        illum = illum + jnp.sum(rel[..., None] * glights.colour.astype(dtype)[None], axis=1)

    # Point lights with shadow rays (RL/ray.py:47-62).
    if plights.count:
        P = plights.count
        self_id = scene.id[res.idx]                          # [R]
        lpos = plights.position.astype(dtype)                # [P, 3]
        to_light = lpos[None, :, :] - res.point[:, None, :]  # [R, P, 3]

        shadow_o = jnp.broadcast_to(res.point[:, None, :], (R, P, 3)).reshape(-1, 3)
        shadow_d = to_light.reshape(-1, 3)
        shadow_sup = jnp.broadcast_to(self_id[:, None], (R, P)).reshape(-1)
        if shadow_max_bounces == 0:
            # Fast path: with max_bounces=0 the recursive shadow trace
            # reduces exactly to one nearest-hit sweep — a mirror blocker
            # returns *itself* (its recursion is over budget → fallback,
            # RL/ray.py:198-201), a glass blocker returns None through the
            # transparent level (:226-229), anything else terminates on
            # itself.  So: lit ⇔ nearest non-suppressed hit is the light's
            # sphere and not glass-ruled.
            from ..core.intersect import nearest_hit
            from ..core import vec as _vec
            sh = nearest_hit(shadow_o, _vec.normalise_safe(shadow_d), scene,
                             shadow_sup)
            glass_rule = ((scene.transparent[sh.idx] == 1.0)
                          & (scene.reflective[sh.idx] != 1.0))
            terminus_id = jnp.where(sh.found & ~glass_rule,
                                    scene.id[sh.idx], NO_ID)
        else:
            sres = trace_whitted(scene, shadow_o, shadow_d,
                                 max_bounces=shadow_max_bounces,
                                 suppress_id=shadow_sup)
            terminus_id = jnp.where(sres.hit, scene.id[sres.idx], NO_ID)
        lit = (terminus_id.reshape(R, P) == plights.id[None, :])
        # Skip a light whose id matches the shaded object (RL/ray.py:48);
        # also guards lanes where the shadow origin is garbage (miss lanes).
        lit = lit & (self_id[:, None] != plights.id[None, :]) & res.hit[:, None]

        ang = vec.angle_between(res.normal[:, None, :], to_light)       # [R, P]
        dist = vec.magnitude(to_light)
        rel = incidence(ang, plights.max_angle.astype(dtype)) * plights.strength.astype(dtype)
        # func == -1: no distance term; func == 0: linear /distance (RL/light.py:33-37).
        rel = jnp.where(plights.func[None, :] == 0, rel / dist, rel)
        rel = jnp.where(lit, rel, 0.0)
        illum = illum + jnp.sum(rel[..., None] * plights.colour.astype(dtype)[None], axis=1)

    # Colour.illuminate: per-channel round(albedo * light/255) (RL/colour.py:21-28),
    # then add the background (RL/ray.py:65).
    shaded = background[None, :] + jnp.round(albedo * illum / 255.0)
    return jnp.where(res.hit[:, None], shaded, background[None, :])


NO_ID = jnp.int32(-2147483647)
