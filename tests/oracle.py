"""Slow, trusted scalar-math oracle used for golden tests.

This is an *independent* re-implementation of the reference semantics
(documented in SURVEY.md and the raytracer_tpu docstrings) in plain Python
floats — written stack-based rather than recursive, against tuples rather
than Vector/Colour objects, so it is structurally unlike the reference while
agreeing with it numerically.  The JAX wavefront tracer is validated against
this oracle on small images.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

Vec = Tuple[float, float, float]


def v_add(a, b): return (a[0] + b[0], a[1] + b[1], a[2] + b[2])
def v_sub(a, b): return (a[0] - b[0], a[1] - b[1], a[2] - b[2])
def v_scale(a, s): return (a[0] * s, a[1] * s, a[2] * s)
def v_dot(a, b): return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
def v_mag(a): return math.sqrt(v_dot(a, a))


def v_norm(a):
    m = v_mag(a)
    return (a[0] / m, a[1] / m, a[2] / m)


def v_angle(a, b):
    c = v_dot(a, b) / (v_mag(a) * v_mag(b))
    return math.acos(max(-1.0, min(1.0, c)))


def v_reflect(v, n):
    v = v_norm(v)
    n = v_norm(n)
    return v_norm(v_sub(v, v_scale(n, 2.0 * v_dot(v, n))))


def v_refract(v, n, na, nb):
    """Returns refracted dir or None on TIR."""
    v = v_norm(v)
    n = v_norm(n)
    eta = na / nb
    ci = max(-1.0, min(1.0, v_dot(v, n)))
    ci = abs(ci)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    if k < 0:
        return None
    return v_norm(v_add(v_scale(v, eta), v_scale(n, eta * ci - math.sqrt(k))))


@dataclass
class OSphere:
    centre: Vec
    radius: float
    colour: Vec = (128, 128, 128)
    reflective: float = 0.0
    transparent: float = 0.0
    emitive: float = 0.0
    ior: float = 1.0
    id: int = 0


@dataclass
class OGlobalLight:
    vector: Vec
    colour: Vec
    strength: float
    max_angle: float


@dataclass
class OPointLight:
    id: int
    position: Vec
    colour: Vec
    strength: float
    max_angle: float
    func: int = 0


@dataclass
class OHit:
    idx: int
    point: Vec
    normal: Vec
    t: float
    bounces: int = 0
    through: int = 0


def sphere_intersect(o: Vec, d: Vec, s: OSphere, second: bool = False
                     ) -> Optional[OHit]:
    """tca/thc form with the reference's guards: tca<0 miss, clamp the
    sqrt radicand, strict d>r miss; second=True takes the far root."""
    L = v_sub(s.centre, o)
    tca = v_dot(L, d)
    if tca < 0:
        return None
    rad = v_dot(L, L) - tca * tca
    dd = math.sqrt(rad) if rad > 0 else 0.0
    if dd > s.radius:
        return None
    thc = math.sqrt(max(s.radius * s.radius - dd * dd, 0.0))
    t = tca + thc if second else tca - thc
    p = v_add(o, v_scale(d, t))
    n = v_norm(v_sub(p, s.centre))
    return OHit(idx=-1, point=p, normal=n, t=t)


def trace(o: Vec, d: Vec, spheres: List[OSphere], suppress_id: Optional[int],
          max_bounces: int) -> Optional[OHit]:
    """Iterative unwind-free port of the recursive nearestSphereIntersect:
    walks the chain keeping the deepest reflective hit as a fallback."""
    d = v_norm(d)
    bounces = 0
    through = 0
    fallback: Optional[OHit] = None
    for _level in range(max_bounces + 2):
        best: Optional[OHit] = None
        for i, s in enumerate(spheres):
            if suppress_id is not None and s.id == suppress_id:
                continue
            h = sphere_intersect(o, d, s)
            if h is not None and (best is None or h.t < best.t):
                h.idx = i
                best = h
        if best is None or bounces > max_bounces:
            return fallback
        best.bounces = bounces
        best.through = through
        s = spheres[best.idx]
        if s.reflective == 1.0:
            fallback = best
            d = v_reflect(d, best.normal)
            o = best.point
            suppress_id = s.id
            bounces += 1
            continue
        if s.transparent == 1.0:
            rd = v_refract(d, best.normal, 1.0, s.ior)
            if rd is None:
                return fallback  # reference would crash; treat as trapped
            ex = sphere_intersect(best.point, rd, s, second=True)
            exited = False
            for _n in range(10):
                out = v_refract(rd, v_scale(ex.normal, -1.0), s.ior, 1.0)
                if out is not None:
                    exited = True
                    break
                rd = v_reflect(rd, ex.normal)
                ex = sphere_intersect(ex.point, rd, s, second=True)
            if not exited:
                return fallback  # trapped ray
            o = ex.point
            d = out
            suppress_id = s.id
            bounces += 1
            through += 1
            continue
        return best
    return fallback


def shade(hit: OHit, spheres: List[OSphere],
          background: Vec, glights: List[OGlobalLight],
          plights: List[OPointLight], shadow_max_bounces: int = 0) -> Vec:
    """terminalRGB: emissive + global incidence + shadow-tested point
    lights, then background + round(albedo * illum / 255)."""
    s = spheres[hit.idx]
    illum = [s.colour[0] * s.emitive, s.colour[1] * s.emitive,
             s.colour[2] * s.emitive]

    def incid(angle, max_angle):
        if angle > max_angle:
            return 0.0
        return (max_angle - angle) / max_angle

    for g in glights:
        rel = incid(v_angle(hit.normal, g.vector), g.max_angle) * g.strength
        for c in range(3):
            illum[c] += g.colour[c] * rel

    for p in plights:
        if s.id == p.id:
            continue
        to_l = v_sub(p.position, hit.point)
        term = trace(hit.point, to_l, spheres, s.id, shadow_max_bounces)
        if term is None or spheres[term.idx].id != p.id:
            continue
        rel = incid(v_angle(hit.normal, to_l), p.max_angle) * p.strength
        if p.func == 0:
            rel /= v_mag(to_l)
        for c in range(3):
            illum[c] += p.colour[c] * rel

    # Python round = banker's rounding, matching the reference's Colour.illuminate.
    out = tuple(background[c] + round(s.colour[c] * illum[c] / 255.0)
                for c in range(3))
    return out


def render(spheres, glights, plights, origin, xs, ys, max_bounces,
           background, miss_colour=None, mode="unit"):
    """Grid render matching the notebook loop.  xs left→right, ys top→bottom."""
    if miss_colour is None:
        miss_colour = background
    img = []
    for Y in ys:
        row = []
        for X in xs:
            h = trace(origin, (X, Y, -1.0), spheres, None, max_bounces)
            if h is None:
                c = miss_colour
            else:
                c = shade(h, spheres, background, glights, plights)
            if mode == "unit":
                row.append(tuple(min(1.0, v / 255.0) for v in c))
            else:
                row.append(c)
        img.append(row)
    return img
