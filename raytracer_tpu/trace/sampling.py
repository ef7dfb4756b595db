"""Direction sampling and tangent frames.

The reference carries three slightly different tangent-frame conventions —
all preserved behind one parametrised helper:

* ``env``      — RL/ray_tracer_env.py:166-173: threshold 0.9 on |n.z|;
                 below → tangent = cross((0,0,1), n); above → cross((1,0,0), n).
* ``renderer`` — FB/fb_vs_traditional_*.py (e.g. complex.py:355-360):
                 threshold 0.9; |n.z| > 0.9 → tangent = (1,0,0) *directly*
                 (not a cross product); else cross((0,0,1), n).
* ``trainer``  — FB/train_complex_only.py:82-90: like ``env`` but with
                 threshold 0.999.

Also the two action conventions:

* RL env action = (θ, φ) ∈ [0, π/2] × [0, 2π]  (RL/ray_tracer_env.py:113-119)
* FB action     = (a₀, a₁) ∈ [-1, 1]² with θ = (a₀+1)π/4, φ = a₁π
                 (FB/ray_tracer_env.py:170-172, FB/fb_vs_traditional_*.py)

and the inverse map ``direction_to_action`` (FB/train_complex_only.py:98-125).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vec

def tangent_frame(normal: jnp.ndarray, convention: str = "renderer"):
    """Build (tangent, bitangent) for normals ``[..., 3]``."""
    _Z = jnp.array([0.0, 0.0, 1.0], normal.dtype)
    _X = jnp.array([1.0, 0.0, 0.0], normal.dtype)
    nz = jnp.abs(normal[..., 2])
    if convention == "renderer":
        thresh = 0.9
        above = _X * jnp.ones_like(normal)                 # tangent = (1,0,0)
    elif convention == "env":
        thresh = 0.9
        above = vec.cross(jnp.broadcast_to(_X, normal.shape), normal)
    elif convention == "trainer":
        thresh = 0.999
        above = vec.cross(jnp.broadcast_to(_X, normal.shape), normal)
    else:
        raise ValueError(f"unknown tangent convention {convention!r}")
    below = vec.cross(jnp.broadcast_to(_Z, normal.shape), normal)
    tangent = jnp.where((nz > thresh)[..., None], above, below)
    tangent = vec.normalise_safe(tangent)
    bitangent = vec.normalise_safe(vec.cross(normal, tangent))
    return tangent, bitangent


def local_to_world(theta, phi, normal, convention: str = "renderer"):
    """Spherical (θ from normal, φ around it) → world direction."""
    tangent, bitangent = tangent_frame(normal, convention)
    st = jnp.sin(theta)
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                       jnp.cos(theta)], axis=-1)
    world = (local[..., 0:1] * tangent + local[..., 1:2] * bitangent
             + local[..., 2:3] * normal)
    return vec.normalise_safe(world)


def cosine_weighted(key, normal, convention: str = "renderer"):
    """Cosine-weighted hemisphere sample: θ = arccos(sqrt(u1)), φ = 2π u2
    (FB/fb_vs_traditional_complex.py:363-366 et al.)."""
    u = jax.random.uniform(key, normal.shape[:-1] + (2,), normal.dtype)
    theta = jnp.arccos(jnp.sqrt(u[..., 0]))
    phi = 2.0 * jnp.pi * u[..., 1]
    return local_to_world(theta, phi, normal, convention)


def fb_action_to_direction(action, normal, convention: str = "renderer"):
    """FB convention: θ = (a₀+1)π/4 ∈ [0, π/2], φ = a₁π ∈ [-π, π]."""
    theta = (action[..., 0] + 1.0) * jnp.pi / 4.0
    phi = action[..., 1] * jnp.pi
    return local_to_world(theta, phi, normal, convention)


# ---------------------------------------------------------------------------
# Component (SoA) forms — same math on [R]-shaped xyz components (an [R, 3]
# array puts the 3-wide axis on the TPU's 128-lane dimension, ~4%
# utilisation; see core.vec's component-forms note).
# ---------------------------------------------------------------------------

def _cross_c(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def tangent_frame_c(nx, ny, nz, convention: str = "renderer"):
    """Component form of :func:`tangent_frame`.  Returns
    ``(tx, ty, tz, bx, by, bz)``."""
    anz = jnp.abs(nz)
    zero = jnp.zeros_like(nx)
    one = jnp.ones_like(nx)
    if convention == "renderer":
        thresh = 0.9
        ax_, ay_, az_ = one, zero, zero                     # tangent = (1,0,0)
    elif convention in ("env", "trainer"):
        thresh = 0.9 if convention == "env" else 0.999
        # cross((1,0,0), n) = (0, -nz, ny)
        ax_, ay_, az_ = zero, -nz, ny
    else:
        raise ValueError(f"unknown tangent convention {convention!r}")
    # cross((0,0,1), n) = (-ny, nx, 0)
    bx_, by_, bz_ = -ny, nx, zero
    above = anz > thresh
    tx = jnp.where(above, ax_, bx_)
    ty = jnp.where(above, ay_, by_)
    tz = jnp.where(above, az_, bz_)
    tx, ty, tz = vec.normalise_safe_c(tx, ty, tz)
    cx, cy, cz = _cross_c(nx, ny, nz, tx, ty, tz)
    bx, by, bz = vec.normalise_safe_c(cx, cy, cz)
    return tx, ty, tz, bx, by, bz


def local_to_world_c(theta, phi, nx, ny, nz, convention: str = "renderer"):
    """Component form of :func:`local_to_world`.  Returns ``(wx, wy, wz)``."""
    tx, ty, tz, bx, by, bz = tangent_frame_c(nx, ny, nz, convention)
    st = jnp.sin(theta)
    lx = st * jnp.cos(phi)
    ly = st * jnp.sin(phi)
    lz = jnp.cos(theta)
    return vec.normalise_safe_c(lx * tx + ly * bx + lz * nx,
                                lx * ty + ly * by + lz * ny,
                                lx * tz + ly * bz + lz * nz)


def cosine_weighted_c(key, nx, ny, nz, convention: str = "renderer"):
    """Component form of :func:`cosine_weighted` (same key → same sample:
    the uniform draw keeps the [..., 2] shape and dtype)."""
    u = jax.random.uniform(key, nx.shape + (2,), nx.dtype)
    theta = jnp.arccos(jnp.sqrt(u[..., 0]))
    phi = 2.0 * jnp.pi * u[..., 1]
    return local_to_world_c(theta, phi, nx, ny, nz, convention)


def fb_action_to_direction_c(action, nx, ny, nz,
                             convention: str = "renderer"):
    """Component form of :func:`fb_action_to_direction`."""
    theta = (action[..., 0] + 1.0) * jnp.pi / 4.0
    phi = action[..., 1] * jnp.pi
    return local_to_world_c(theta, phi, nx, ny, nz, convention)


def env_action_to_direction(action, normal, convention: str = "env"):
    """RL env convention: action already is (θ, φ) in [0, π/2] × [0, 2π]."""
    return local_to_world(action[..., 0], action[..., 1], normal, convention)


def direction_to_action(direction, normal, convention: str = "trainer"):
    """World direction → FB action in [-1, 1]² with hemisphere clamp
    (FB/train_complex_only.py:98-125)."""
    tangent, bitangent = tangent_frame(normal, convention)
    lx = vec.dot(direction, tangent)
    ly = vec.dot(direction, bitangent)
    lz = vec.dot(direction, normal)
    theta = jnp.arccos(jnp.clip(lz, -1.0, 1.0))
    theta = jnp.minimum(theta, jnp.pi / 2)
    phi = jnp.arctan2(ly, lx)
    a0 = (theta / (jnp.pi / 2)) * 2.0 - 1.0
    a1 = phi / jnp.pi
    return jnp.stack([a0, a1], axis=-1)


def uniform_on_sphere(key, centre, radius):
    """Random surface point + outward normal, matching the reference's
    (θ ~ U[0,2π], φ ~ U[0,π]) *non-uniform* parameterisation
    (FB/train_complex_only.py:54-65 — pole-biased, preserved)."""
    u = jax.random.uniform(key, centre.shape[:-1] + (2,), centre.dtype)
    theta = 2.0 * jnp.pi * u[..., 0]
    phi = jnp.pi * u[..., 1]
    offset = jnp.stack([jnp.sin(phi) * jnp.cos(theta),
                        jnp.sin(phi) * jnp.sin(theta),
                        jnp.cos(phi)], axis=-1)
    point = centre + offset * radius[..., None]
    return point, offset
