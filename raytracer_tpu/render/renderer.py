"""Whitted frame renderer: camera rays → wavefront trace → shading → image.

The reference's per-pixel double loop (RL/output5.py:render_true_original,
Planets/Marbles notebook cells) collapses into one jitted pipeline over the
whole pixel grid.

Two output conventions, both from the reference:

* ``mode="unit"``   — ``min(1, c/255)`` per channel (RL/output5.py:514-518).
* ``mode="raw"``    — raw reference-unit ints via ``getList()`` (notebooks);
  values may exceed 255 exactly as the reference's matplotlib clip would see.

Misses take ``miss_colour`` (the notebooks' sky/background substitution,
e.g. Marbles 4's ``sky_colour``) and hits are shaded on ``background``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..scene.types import GlobalLights, PointLights, Scene
from ..trace.shade import terminal_rgb
from ..trace.whitted import trace_whitted


@partial(jax.jit, static_argnames=("max_bounces", "height", "width", "mode"))
def render_whitted(scene: Scene, glights: GlobalLights, plights: PointLights,
                   origins: jnp.ndarray, dirs: jnp.ndarray,
                   height: int, width: int, *, max_bounces: int = 5,
                   background=(0.0, 0.0, 0.0),
                   miss_colour: Optional[tuple] = None,
                   mode: str = "unit") -> jnp.ndarray:
    """Render an ``[H, W, 3]`` frame.  ``miss_colour`` defaults to
    ``background`` (Planets notebooks use the background for misses;
    Marbles 4 substitutes a sky colour)."""
    dtype = origins.dtype
    background = jnp.asarray(background, dtype)
    miss = background if miss_colour is None else jnp.asarray(miss_colour, dtype)

    res = trace_whitted(scene, origins, dirs, max_bounces=max_bounces)
    rgb = terminal_rgb(scene, glights, plights, res, background)
    rgb = jnp.where(res.hit[:, None], rgb, miss[None, :])

    img = rgb.reshape(height, width, 3)
    if mode == "unit":
        return jnp.minimum(1.0, img / 255.0)
    if mode == "raw":
        return img
    raise ValueError(f"unknown mode {mode!r}")
