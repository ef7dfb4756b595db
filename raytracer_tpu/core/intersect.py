"""Ray-sphere intersection in the reference's geometric ``tca/thc`` form.

Reference: ``Ray.sphereDiscriminant`` (RL/ray.py:73-107) and the nearest-hit
select ``Intersection.nearestIntersection`` (RL/ray.py:10-20).

Preserved semantics:

* ``tca < 0``  → miss ("intersection is behind origin — this doesn't work
  when line is inside sphere", RL/ray.py:81-82).  Kept verbatim: a ray whose
  closest approach is behind the origin misses even from inside the sphere.
* sqrt-domain guard: ``d = sqrt(L.L - tca^2)`` clamps a negative radicand to
  0 (the reference's try/except at RL/ray.py:84-88).
* ``d > r`` (strictly) → miss; grazing hits with ``d == r`` count.
* ``point=0`` selects ``t0 = tca - thc`` (near root, may be negative when the
  origin is inside the sphere — the reference keeps such hits and its
  nearest-select happily picks negative distances); ``point=1`` selects
  ``t1 = tca + thc`` (exit root, used by the refraction walk).
* Nearest select = first strict minimum in sphere order (``<`` comparison at
  RL/ray.py:18), which ``argmin`` reproduces.

Everything is written batched: ``o``/``d`` carry an arbitrary leading batch
shape ``[...]`` and the scene axis is broadcast, so one fused XLA kernel
covers the whole ray wavefront.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import vec
from ..scene.types import Scene

# Sentinel id meaning "no suppressed sphere" (initial camera rays).
NO_SUPPRESS = jnp.int32(-2147483648)


class NearestHit(NamedTuple):
    """Nearest-intersection result for a batch of rays."""

    found: jnp.ndarray   # [...] bool
    idx: jnp.ndarray     # [...] i32 — sphere index (garbage where not found)
    t: jnp.ndarray       # [...] f   — signed distance along the ray
    point: jnp.ndarray   # [..., 3]
    normal: jnp.ndarray  # [..., 3] — outward normal at the hit


def sphere_ts(o: jnp.ndarray, d: jnp.ndarray, centre: jnp.ndarray,
              radius: jnp.ndarray, point: int = 0):
    """Distances + validity of ray/sphere intersections.

    ``o``/``d``: ``[..., 3]`` (d must be normalised).  ``centre``/``radius``
    broadcast against the batch (typically ``[N, 3]``/``[N]`` against
    ``[..., 1, 3]`` rays).  Returns ``(t, valid)``.
    """
    L = centre - o
    tca = vec.dot(L, d)
    d2 = vec.dot(L, L) - tca * tca
    d2 = jnp.maximum(d2, 0.0)          # sqrt-domain guard (RL/ray.py:84-88)
    dist = jnp.sqrt(d2)
    thc = jnp.sqrt(jnp.maximum(radius * radius - d2, 0.0))
    t = jnp.where(point == 0, tca - thc, tca + thc)
    valid = (tca >= 0.0) & (dist <= radius)
    return t, valid


def nearest_hit(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                suppress_id: jnp.ndarray, by_abs: bool = False) -> NearestHit:
    """Nearest non-suppressed intersection for each ray in the batch.

    ``suppress_id``: ``[...]`` i32 — spheres whose id equals it are skipped
    (the reference's ``suppress_ids`` list always holds at most one id:
    RL/ray.py:189,216).  Pass ``NO_SUPPRESS`` for no suppression.

    ``by_abs`` selects the ordering metric: the core tracer compares the
    *signed* near-root distance (``Intersection.nearestIntersection``,
    RL/ray.py:18), while the FB path tracers re-sort by
    ``point.distanceFrom(origin)`` = |t| (FB/fb_vs_traditional_complex.py:
    305-312) — which matters because the room interiors sit *inside* the
    giant wall spheres, producing behind-origin hits with negative t that
    compete by absolute distance.
    """
    ob = o[..., None, :]                       # [..., 1, 3]
    db = d[..., None, :]
    t, valid = sphere_ts(ob, db, scene.centre, scene.radius, point=0)
    valid = valid & (scene.id != suppress_id[..., None])

    big = jnp.asarray(jnp.finfo(t.dtype).max, t.dtype)
    metric = jnp.abs(t) if by_abs else t
    m_masked = jnp.where(valid, metric, big)
    idx = jnp.argmin(m_masked, axis=-1).astype(jnp.int32)
    found = jnp.any(valid, axis=-1)
    t_masked = jnp.where(valid, t, big)
    t_hit = jnp.take_along_axis(t_masked, idx[..., None], axis=-1)[..., 0]

    centre = scene.centre[idx]
    radius = scene.radius[idx]
    phit = o + d * t_hit[..., None]
    nhit = vec.normalise_safe(phit - centre)
    return NearestHit(found=found, idx=idx, t=t_hit, point=phit, normal=nhit)


def single_sphere_exit(o: jnp.ndarray, d: jnp.ndarray, centre: jnp.ndarray,
                       radius: jnp.ndarray):
    """``sphereDiscriminant(sphere, point=1)`` against one known sphere.

    Used by the internal refraction walk (RL/ray.py:120-147) where the ray
    marches inside a single sphere.  ``centre``/``radius`` are per-ray
    (``[..., 3]``/``[...]``).  Returns ``(valid, point, normal)``.
    """
    t, valid = sphere_ts(o, d, centre, radius, point=1)
    phit = o + d * t[..., None]
    nhit = vec.normalise_safe(phit - centre)
    return valid, phit, nhit
