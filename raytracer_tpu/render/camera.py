"""Camera models.

Two families, both preserved exactly:

* ``grid_camera`` — the original notebooks' planar grid: directions
  ``D = (X, Y, -1)`` deliberately *unnormalised* at construction (they get
  normalised inside ``Ray.__init__`` anyway).  X sweeps left→right,
  Y top→bottom, built from ``RAY_COUNT``/``RAY_STEP``/``multiple``
  (RL/Planets 1.ipynb cell 0; reproduced at RL/output5.py:421-433).
* ``perspective_camera`` — two NDC/fov variants:
  - ``variant="env"``: the gym env's pinhole with aspect applied once and
    optional Euler rotation (RL/ray_tracer_env.py:121-142).
  - ``variant="fb"``: the FB comparison renderers' version, which applies
    the aspect ratio **twice** (once to screen_x, once via half_width =
    half_height * aspect) — a reference bug preserved knowingly
    (FB/fb_vs_traditional_complex.py:285-297).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import vec


def grid_rays(ray_count: int = 100, ray_step: float = 0.01, multiple: int = 1,
              origin=(0.0, 0.0, 1.0), dtype=jnp.float32
              ) -> Tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Notebook grid rays.  Returns ``(origins [H*W,3], dirs [H*W,3], H, W)``.

    ``X_RAYS = [-N..N] * step``, ``Y_RAYS = [N..-N] * step`` with
    ``N = ray_count * multiple`` and ``step = ray_step / multiple``;
    image is ``(2N+1) x (2N+1)``, row-major with Y outer (top row first).
    """
    n = ray_count * multiple
    step = ray_step / multiple
    # Match the reference's list construction exactly: r*step for integer r.
    xs = np.array([r * step for r in range(-n, 0)] +
                  [r * step for r in range(0, n + 1)])
    ys = np.array([r * step for r in range(n, 0, -1)] +
                  [-r * step for r in range(0, n + 1)])
    X, Y = np.meshgrid(xs, ys)                      # [H, W]
    dirs = np.stack([X, Y, np.full_like(X, -1.0)], axis=-1).reshape(-1, 3)
    h, w = len(ys), len(xs)
    origins = np.broadcast_to(np.asarray(origin, dtype=np.float64),
                              (h * w, 3)).copy()
    return (jnp.asarray(origins, dtype), jnp.asarray(dirs, dtype), h, w)


def perspective_rays(width: int, height: int, *, fov: float = 60.0,
                     origin=(0.0, 0.0, 0.0), variant: str = "fb",
                     sample_xy: Optional[jnp.ndarray] = None,
                     camera_angle: Optional[Tuple[float, float, float]] = None,
                     dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective pinhole rays for every pixel.

    ``sample_xy``: optional ``[H, W, 2]`` sub-pixel offsets in [0, 1) (spp
    jitter); defaults to pixel centres (0.5, 0.5).

    Returns ``(origins [H*W, 3], dirs [H*W, 3])``; dirs unnormalised (the
    tracer normalises, matching ``Ray.__init__``).
    """
    aspect = width / height
    fov_rad = np.radians(fov)
    px = jnp.arange(width, dtype=dtype)[None, :]
    py = jnp.arange(height, dtype=dtype)[:, None]
    if sample_xy is None:
        sx = jnp.asarray(0.5, dtype)
        sy = jnp.asarray(0.5, dtype)
    else:
        sx = sample_xy[..., 0].astype(dtype)
        sy = sample_xy[..., 1].astype(dtype)

    if variant == "fb":
        # FB/fb_vs_traditional_complex.py:285-297 — aspect applied twice.
        ndc_x = (px + sx) / width
        ndc_y = (py + sy) / height
        screen_x = (2.0 * ndc_x - 1.0) * aspect
        screen_y = 1.0 - 2.0 * ndc_y
        half_height = np.tan(fov_rad / 2)
        half_width = half_height * aspect
        screen_x = screen_x * half_width
        screen_y = screen_y * half_height
    elif variant == "env":
        # RL/ray_tracer_env.py:121-134 — aspect applied once.
        screen_x = (2.0 * (px + sx) / width - 1.0) * aspect * np.tan(fov_rad / 2)
        screen_y = (1.0 - 2.0 * (py + sy) / height) * np.tan(fov_rad / 2)
    else:
        raise ValueError(f"unknown perspective variant {variant!r}")

    screen_x, screen_y = jnp.broadcast_arrays(screen_x, screen_y)
    dirs = jnp.stack([screen_x, screen_y, jnp.full_like(screen_x, -1.0)],
                     axis=-1).reshape(-1, 3)
    if camera_angle is not None and any(a != 0 for a in camera_angle):
        dirs = vec.rotate_euler(vec.normalise_safe(dirs), *camera_angle)
    origins = jnp.broadcast_to(jnp.asarray(origin, dtype), dirs.shape)
    return origins, dirs
