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
  RL/ray.py:18), which the unrolled where-chain reproduces exactly.

Everything is written batched over an arbitrary leading ray shape ``[...]``;
the sphere axis is *unrolled in scalar components* rather than broadcast:
TPU lays ``[R, N]``/``[R, 3]`` temporaries out in (8, 128) tiles whose
3-wide minor axes pad 42×, and the argmin+gather select serialises — the
where-chain form measured ~27× faster over a 10-level wavefront walk and
fuses into one pass over ``[R]``-shaped registers.
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


class NearestHitC(NamedTuple):
    """Component (structure-of-arrays) nearest-hit: point/normal as three
    separate [...] arrays each, keeping elementwise consumers at full VPU
    lane width (an [R, 3] array puts the 3-wide axis on the 128-lane
    dimension — ≈4% utilisation)."""

    found: jnp.ndarray
    idx: jnp.ndarray
    t: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray


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
    # Unrolled min-sweep over the (small, statically-known) sphere list,
    # in scalar components.  The obvious alternative — broadcast to
    # [..., N] then argmin + gather — materialises [R, N] temporaries and
    # TPU-unfriendly gathers, and XLA lays the [R, 3] forms out as
    # T(8,128) tiles (the 3-wide minor axis pads to 128): measured ~27×
    # slower on a 10-level wavefront walk than this where-chain, which
    # fuses into one pass over [R]-shaped registers with no gather at all.
    # Semantics are bit-identical: same op order per sphere, and the
    # strict `<` keeps the first minimum exactly like argmin.
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    h = nearest_hit_c(ox, oy, oz, dx, dy, dz, scene, suppress_id,
                      by_abs=by_abs)
    phit = jnp.stack([h.px, h.py, h.pz], axis=-1)
    nhit = jnp.stack([h.nx, h.ny, h.nz], axis=-1)
    return NearestHit(found=h.found, idx=h.idx, t=h.t, point=phit,
                      normal=nhit)


def nearest_hit_c(ox, oy, oz, dx, dy, dz, scene: Scene, suppress_id,
                  by_abs: bool = False, fast: bool = False) -> NearestHitC:
    """Component form of :func:`nearest_hit` (same math, same op order per
    lane; the point/normal assembly is per-component instead of stacked).

    ``fast``: replace the ``sqrt(d2) <= r`` hit test with the equivalent
    ``d2 <= r*r`` (one sqrt per sphere instead of two — the sweep is the
    hot loop of every tracer).  Equal in exact arithmetic; in floating
    point a graze hit within 1 ulp of the silhouette can flip, so the
    exact form stays the default for the reference-parity goldens (the
    Pallas backend already uses the squared form, equality-tested)."""
    dtype = ox.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    best_m = jnp.full(ox.shape, big, dtype)
    best_t = jnp.full(ox.shape, big, dtype)
    best_i = jnp.zeros(ox.shape, jnp.int32)
    bcx = jnp.zeros(ox.shape, dtype)
    bcy = jnp.zeros(ox.shape, dtype)
    bcz = jnp.zeros(ox.shape, dtype)
    found = jnp.zeros(ox.shape, bool)
    for s in range(scene.centre.shape[0]):
        cx, cy, cz = scene.centre[s, 0], scene.centre[s, 1], scene.centre[s, 2]
        r = scene.radius[s]
        lx, ly, lz = cx - ox, cy - oy, cz - oz            # L = centre - o
        tca = lx * dx + ly * dy + lz * dz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
        thc = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
        t = tca - thc
        if fast:
            inside = d2 <= r * r
        else:
            inside = jnp.sqrt(d2) <= r
        valid = (tca >= 0.0) & inside & (scene.id[s] != suppress_id)
        m = jnp.abs(t) if by_abs else t
        better = valid & (m < best_m)
        best_m = jnp.where(better, m, best_m)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, s, best_i)
        bcx = jnp.where(better, cx, bcx)
        bcy = jnp.where(better, cy, bcy)
        bcz = jnp.where(better, cz, bcz)
        found = found | valid
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t
    nx, ny, nz = vec.normalise_safe_c(px - bcx, py - bcy, pz - bcz)
    return NearestHitC(found=found, idx=best_i, t=best_t,
                       px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz)


def take_small(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for a small (statically-sized) first axis, as an
    unrolled where-chain instead of a gather.  TPU gathers serialise on the
    sublane axis; for the ≤64-row sphere/light tables used here the select
    chain fuses into the surrounding elementwise pass and costs ~nothing.
    Bit-identical to ``table[idx]`` for in-range indices."""
    n = table.shape[0]
    expand = (Ellipsis,) + (None,) * (table.ndim - 1)
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    for s in range(1, n):
        out = jnp.where((idx == s)[expand], table[s], out)
    return out


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


def single_sphere_exit_c(ox, oy, oz, dx, dy, dz, cx, cy, cz, radius):
    """Component form of :func:`single_sphere_exit`.  Returns
    ``(valid, px, py, pz, nx, ny, nz)``."""
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    tca = lx * dx + ly * dy + lz * dz
    d2 = jnp.maximum(lx * lx + ly * ly + lz * lz - tca * tca, 0.0)
    dist = jnp.sqrt(d2)
    thc = jnp.sqrt(jnp.maximum(radius * radius - d2, 0.0))
    t = tca + thc                                       # exit root (point=1)
    valid = (tca >= 0.0) & (dist <= radius)
    px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
    nx, ny, nz = vec.normalise_safe_c(px - cx, py - cy, pz - cz)
    return valid, px, py, pz, nx, ny, nz
