"""Vector math on raw ``f32[..., 3]`` arrays.

TPU-native replacement for the reference's object-oriented ``Vector`` class
(reference: RL/vector.py:5-127).  Everything here is a pure function over
stacked xyz arrays so that it vmaps/jits cleanly and maps onto the VPU.

Semantics preserved from the reference:

* ``reflect``       — RL/vector.py:64-67   (normalise both inputs, reflect, renormalise)
* ``refract``       — RL/vector.py:69-92   (scratchapixel form, clamped cosI, returns a
                      TIR flag instead of the reference's ``False`` sentinel)
* ``angle_between`` — RL/vector.py:60-61   (arccos of normalised dot product)
* ``rotate_euler``  — RL/vector.py:117-127 (row-vector times rotation matrix)
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing xyz axis (reference RL/vector.py:94-95)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product A x B (reference RL/vector.py:97-104)."""
    return jnp.cross(a, b)


def magnitude(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(v, v))


def normalise(v: jnp.ndarray) -> jnp.ndarray:
    """Normalise; the reference divides by magnitude with no epsilon
    (RL/vector.py:110-112). We keep that: a zero vector yields nan exactly as
    the reference would raise/propagate — callers mask such lanes."""
    return v / magnitude(v)[..., None]


def normalise_safe(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalise with an epsilon floor for lanes that will be masked out."""
    m = magnitude(v)
    return v / jnp.maximum(m, eps)[..., None]


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return magnitude(b - a)


def angle_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """arccos(a.b / (|a||b|)) with the product clamped to [-1, 1] for FP
    safety (reference RL/vector.py:60-61 relies on numpy's arccos domain)."""
    c = dot(a, b) / (magnitude(a) * magnitude(b))
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect ``v`` in normal ``n`` (reference RL/vector.py:64-67).

    The reference normalises both inputs and renormalises the output; the
    formula is sign-symmetric in ``n`` so orientation does not matter.
    """
    vn = normalise_safe(v)
    nn = normalise_safe(n)
    r = vn - nn * (2.0 * dot(vn, nn))[..., None]
    return normalise_safe(r)


def refract(v: jnp.ndarray, n: jnp.ndarray, eta_a, eta_b):
    """Snell refraction of ``v`` through surface with normal ``n`` going from
    medium ``eta_a`` into ``eta_b`` (reference RL/vector.py:69-92).

    Returns ``(dir, tir)`` where ``tir`` is True where the reference would
    have returned ``False`` (total internal reflection, k < 0).  ``dir`` is
    garbage in TIR lanes and must be masked by the caller.

    Faithful quirks: cosI is |v.n| clamped to [-1, 1]; the normal is *not*
    flipped (the reference always receives an against-the-ray normal at its
    call sites).
    """
    vn = normalise_safe(v)
    nn = normalise_safe(n)
    eta = jnp.asarray(eta_a / eta_b)
    cos_i = jnp.clip(dot(vn, nn), -1.0, 1.0)
    cos_i = jnp.abs(cos_i)
    k = 1.0 - eta**2 * (1.0 - cos_i**2)
    tir = k < 0.0
    k_safe = jnp.maximum(k, 0.0)
    out = vn * eta[..., None] + nn * (eta * cos_i - jnp.sqrt(k_safe))[..., None]
    return normalise_safe(out), tir


# ---------------------------------------------------------------------------
# Component (structure-of-arrays) forms.
#
# TPU lays an [R, 3] array out with the 3-wide minor axis on the 128-lane
# dimension (≈4% lane utilisation); carrying xyz as three separate [R]
# arrays keeps every element-wise op at full VPU width (the same layout
# rationale as core.intersect.nearest_hit's unrolled sweep — measured ~10x
# on the whitted trace loop).  Sums associate left-to-right, which is also
# exactly the reference's ``self.x*v.x + self.y*v.y + self.z*v.z`` order
# (RL/vector.py:94-95) — so f64 oracle parity is preserved to the ulp.
# ---------------------------------------------------------------------------

def dot_c(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def magnitude_c(x, y, z):
    return jnp.sqrt(dot_c(x, y, z, x, y, z))


def normalise_safe_c(x, y, z, eps: float = 1e-20):
    m = jnp.maximum(magnitude_c(x, y, z), eps)
    return x / m, y / m, z / m


def angle_between_c(ax, ay, az, bx, by, bz):
    c = (dot_c(ax, ay, az, bx, by, bz)
         / (magnitude_c(ax, ay, az) * magnitude_c(bx, by, bz)))
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def reflect_c(vx, vy, vz, nx, ny, nz):
    """Component form of :func:`reflect` (same math, same normalisations)."""
    vx, vy, vz = normalise_safe_c(vx, vy, vz)
    nx, ny, nz = normalise_safe_c(nx, ny, nz)
    s = 2.0 * dot_c(vx, vy, vz, nx, ny, nz)
    return normalise_safe_c(vx - nx * s, vy - ny * s, vz - nz * s)


def refract_c(vx, vy, vz, nx, ny, nz, eta_a, eta_b):
    """Component form of :func:`refract`.  Returns ``(dx, dy, dz, tir)``."""
    vx, vy, vz = normalise_safe_c(vx, vy, vz)
    nx, ny, nz = normalise_safe_c(nx, ny, nz)
    eta = jnp.asarray(eta_a / eta_b)
    cos_i = jnp.abs(jnp.clip(dot_c(vx, vy, vz, nx, ny, nz), -1.0, 1.0))
    k = 1.0 - eta**2 * (1.0 - cos_i**2)
    tir = k < 0.0
    f = eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))
    ox, oy, oz = normalise_safe_c(vx * eta + nx * f, vy * eta + ny * f,
                                  vz * eta + nz * f)
    return ox, oy, oz, tir


def euler_rotation_matrix(ax, ay, az) -> jnp.ndarray:
    """The reference's Euler rotation matrix (RL/vector.py:117-127).

    ``angle.x`` = rotation in the xy plane, ``angle.y`` = rotation around the
    y axis, ``angle.z`` = bank; applied as a row-vector matmul ``v @ R``.
    """
    a, b, c = ax, ay, az
    sin, cos = jnp.sin, jnp.cos
    return jnp.array(
        [
            [cos(c) * cos(b) * cos(a) - sin(c) * sin(a),
             cos(c) * cos(b) * sin(a) + sin(c) * cos(a),
             -cos(c) * sin(b)],
            [-sin(c) * cos(b) * cos(a) - cos(c) * sin(a),
             -sin(c) * cos(b) * sin(a) + cos(c) * cos(a),
             sin(c) * sin(b)],
            [sin(b) * cos(a), sin(b) * sin(a), cos(b)],
        ]
    )


def rotate_euler(v: jnp.ndarray, ax, ay, az) -> jnp.ndarray:
    """Rotate xyz vectors by the reference Euler matrix: ``v @ R``."""
    return v @ euler_rotation_matrix(ax, ay, az)
