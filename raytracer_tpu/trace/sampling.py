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
