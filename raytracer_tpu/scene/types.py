"""Struct-of-arrays scene representation.

The reference keeps scenes as Python lists of ``Sphere`` objects holding
``Vector``/``Colour``/``Material`` instances (RL/object.py:3-9,
RL/material.py:3-8, RL/light.py:12-37).  On TPU the scene is a pytree of
device arrays, jit-compiled against its static shape (sphere count) and
resident in HBM; per-ray work broadcasts against it on the VPU.

Material semantics preserved: the core Whitted tracer treats ``reflective``
and ``transparent`` as *equal-to-True* booleans (``RL/ray.py:180,204`` uses
``== True`` which only matches the exact value 1), while the FB path tracers
threshold floats (``> 0.9`` at FB/fb_vs_traditional_complex.py:349,535 and
``> 0`` at FB/fb_vs_traditional_chandelier.py:481).  We store floats and let
each tracer apply its own rule.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Sphere-only scene as stacked arrays (all shape [N] or [N, 3])."""

    centre: jnp.ndarray      # [N, 3] f32
    radius: jnp.ndarray      # [N]    f32
    colour: jnp.ndarray      # [N, 3] f32 — RGB in 0..255 reference units
    reflective: jnp.ndarray  # [N]    f32
    transparent: jnp.ndarray # [N]    f32
    emitive: jnp.ndarray     # [N]    f32
    ior: jnp.ndarray         # [N]    f32 — refractive_index
    id: jnp.ndarray          # [N]    i32

    @property
    def num_spheres(self) -> int:
        return self.centre.shape[0]

    def replace(self, **kw) -> "Scene":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GlobalLights:
    """Directional lights (reference GlobalLight, RL/light.py:12-22).

    ``vector`` is the direction the light *comes from*; shading compares the
    surface normal against it with a linear angular falloff."""

    vector: jnp.ndarray     # [G, 3] f32
    colour: jnp.ndarray     # [G, 3] f32
    strength: jnp.ndarray   # [G]    f32
    max_angle: jnp.ndarray  # [G]    f32  (radians)

    @property
    def count(self) -> int:
        return self.vector.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointLights:
    """Point lights (reference PointLight, RL/light.py:25-37).

    ``func == -1`` → no distance term; ``func == 0`` → divide by distance
    (linear, not inverse-square — a reference quirk we keep)."""

    id: jnp.ndarray         # [P]    i32 — matches the emitting sphere's id
    position: jnp.ndarray   # [P, 3] f32
    colour: jnp.ndarray     # [P, 3] f32
    strength: jnp.ndarray   # [P]    f32
    max_angle: jnp.ndarray  # [P]    f32
    func: jnp.ndarray       # [P]    i32

    @property
    def count(self) -> int:
        return self.id.shape[0]


def empty_global_lights() -> GlobalLights:
    z = jnp.zeros((0,), jnp.float32)
    return GlobalLights(vector=jnp.zeros((0, 3), jnp.float32),
                        colour=jnp.zeros((0, 3), jnp.float32),
                        strength=z, max_angle=z)


def empty_point_lights() -> PointLights:
    z = jnp.zeros((0,), jnp.float32)
    return PointLights(id=jnp.zeros((0,), jnp.int32),
                       position=jnp.zeros((0, 3), jnp.float32),
                       colour=jnp.zeros((0, 3), jnp.float32),
                       strength=z, max_angle=z,
                       func=jnp.zeros((0,), jnp.int32))


# ---------------------------------------------------------------------------
# Host-side builder API — the ergonomic equivalent of the reference's
# Sphere/Material/Colour constructors, producing device SoA at the end.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SphereSpec:
    centre: Sequence[float]
    radius: float
    colour: Sequence[float] = (128, 128, 128)   # reference default Colour(128,128,128)
    reflective: float = 0.0
    transparent: float = 0.0
    emitive: float = 0.0
    ior: float = 1.0
    id: int = 0


class SceneBuilder:
    """Accumulates sphere/light specs on host, emits device arrays."""

    def __init__(self) -> None:
        self.spheres: List[SphereSpec] = []
        self._glights: List[dict] = []
        self._plights: List[dict] = []

    def add_sphere(self, centre, radius, colour=(128, 128, 128), *,
                   reflective=0.0, transparent=0.0, emitive=0.0,
                   ior=1.0, id=0) -> "SceneBuilder":
        self.spheres.append(SphereSpec(centre, radius, colour,
                                       float(reflective), float(transparent),
                                       float(emitive), float(ior), int(id)))
        return self

    def add_global_light(self, vector, colour, strength=1.0,
                         max_angle=np.pi / 2) -> "SceneBuilder":
        self._glights.append(dict(vector=vector, colour=colour,
                                  strength=float(strength),
                                  max_angle=float(max_angle)))
        return self

    def add_point_light(self, id, position, colour, strength=1.0,
                        max_angle=np.pi / 2, func=0) -> "SceneBuilder":
        self._plights.append(dict(id=int(id), position=position,
                                  colour=colour, strength=float(strength),
                                  max_angle=float(max_angle), func=int(func)))
        return self

    def build(self, dtype=jnp.float32):
        scene = build_scene(self.spheres, dtype)
        gl = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            self._build_globals())
        pl = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            self._build_points())
        return scene, gl, pl

    def _build_globals(self) -> GlobalLights:
        if not self._glights:
            return empty_global_lights()
        return GlobalLights(
            vector=_f32([g["vector"] for g in self._glights]),
            colour=_f32([g["colour"] for g in self._glights]),
            strength=_f32([g["strength"] for g in self._glights]),
            max_angle=_f32([g["max_angle"] for g in self._glights]),
        )

    def _build_points(self) -> PointLights:
        if not self._plights:
            return empty_point_lights()
        return PointLights(
            id=jnp.asarray([p["id"] for p in self._plights], jnp.int32),
            position=_f32([p["position"] for p in self._plights]),
            colour=_f32([p["colour"] for p in self._plights]),
            strength=_f32([p["strength"] for p in self._plights]),
            max_angle=_f32([p["max_angle"] for p in self._plights]),
            func=jnp.asarray([p["func"] for p in self._plights], jnp.int32),
        )


def build_scene(specs: Sequence[SphereSpec], dtype=jnp.float32) -> Scene:
    def arr(vals):
        return jnp.asarray(np.asarray(vals, dtype=np.float64), dtype=dtype)
    return Scene(
        centre=arr([s.centre for s in specs]),
        radius=arr([s.radius for s in specs]),
        colour=arr([s.colour for s in specs]),
        reflective=arr([s.reflective for s in specs]),
        transparent=arr([s.transparent for s in specs]),
        emitive=arr([s.emitive for s in specs]),
        ior=arr([s.ior for s in specs]),
        id=jnp.asarray([s.id for s in specs], jnp.int32),
    )


def scene_astype(scene: Scene, dtype) -> Scene:
    """Cast the float leaves of a scene (f64 parity mode on CPU)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, scene)
