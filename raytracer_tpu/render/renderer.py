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
import numpy as np

from ..scene.types import GlobalLights, PointLights, Scene
from ..trace.shade import terminal_rgb
from ..trace.whitted import trace_whitted, trace_whitted_compact


def material_flags(scene: Scene):
    """Host-side static specialisation flags: does the scene contain any
    exactly-1.0 transparent / reflective spheres (the only values the core
    tracer's ``== True`` rule reacts to)?  Requires a concrete scene."""
    import numpy as np
    return (bool(np.any(np.asarray(scene.transparent) == 1.0)),
            bool(np.any(np.asarray(scene.reflective) == 1.0)))


@partial(jax.jit, static_argnames=("max_bounces", "enable_glass",
                                   "enable_mirror", "use_pallas"))
def _shade_flat(scene: Scene, glights: GlobalLights, plights: PointLights,
                origins: jnp.ndarray, dirs: jnp.ndarray, *,
                max_bounces: int, background, miss_colour,
                enable_glass: bool, enable_mirror: bool,
                use_pallas: bool) -> jnp.ndarray:
    """Flat ``[R, 3]`` reference-unit shading of a ray wavefront — the
    chunk-reusable compiled body of the frame renderer."""
    dtype = origins.dtype
    background = jnp.asarray(background, dtype)
    miss = background if miss_colour is None else jnp.asarray(miss_colour, dtype)

    res = trace_whitted(scene, origins, dirs, max_bounces=max_bounces,
                        enable_glass=enable_glass,
                        enable_mirror=enable_mirror, use_pallas=use_pallas)
    rgb = terminal_rgb(scene, glights, plights, res, background)
    return jnp.where(res.hit[:, None], rgb, miss[None, :])


@jax.jit
def _shade_result(scene: Scene, glights: GlobalLights, plights: PointLights,
                  res, background, miss) -> jnp.ndarray:
    rgb = terminal_rgb(scene, glights, plights, res, background)
    return jnp.where(res.hit[:, None], rgb, miss[None, :])


def _shade_flat_pallas_trace(scene: Scene, glights, plights, origins, dirs,
                             *, max_bounces: int, background, miss_colour,
                             enable_glass: bool, enable_mirror: bool,
                             use_pallas: bool) -> jnp.ndarray:
    """Whole-trace Pallas backend (core/pallas_whitted.py): the full
    recursion in one VMEM-resident kernel, then the XLA shade pass.
    ``use_pallas`` accepted for signature parity."""
    dtype = origins.dtype
    from ..core.pallas_whitted import trace_whitted_pallas
    bg = jnp.asarray(background, dtype)
    miss = bg if miss_colour is None else jnp.asarray(miss_colour, dtype)
    res = trace_whitted_pallas(scene, origins, dirs,
                               max_bounces=max_bounces,
                               enable_glass=enable_glass,
                               enable_mirror=enable_mirror,
                               interpret=jax.default_backend() != "tpu")
    return _shade_result(scene, glights, plights, res, bg, miss)


def _shade_flat_compact(scene: Scene, glights, plights, origins, dirs, *,
                        max_bounces: int, background, miss_colour,
                        enable_glass: bool, enable_mirror: bool,
                        use_pallas: bool) -> jnp.ndarray:
    """Compacted-wavefront variant of ``_shade_flat`` (same image up to
    XLA codegen rounding, ~1e-5 rel):
    the trace runs level-by-level with live-lane compaction — level 0 is
    the only full-wavefront sweep — then one jitted shade pass.  Host-driven,
    so only usable eagerly; ``use_pallas`` is accepted for signature parity
    (the compact levels use the XLA sweep)."""
    dtype = origins.dtype
    bg = jnp.asarray(background, dtype)
    miss = bg if miss_colour is None else jnp.asarray(miss_colour, dtype)
    res = trace_whitted_compact(scene, origins, dirs,
                                max_bounces=max_bounces,
                                enable_glass=enable_glass,
                                enable_mirror=enable_mirror)
    return _shade_result(scene, glights, plights, res, bg, miss)


@partial(jax.jit, static_argnames=("max_bounces", "height", "width", "mode",
                                   "enable_glass", "enable_mirror",
                                   "use_pallas"))
def _render_whitted(scene: Scene, glights: GlobalLights,
                    plights: PointLights, origins: jnp.ndarray,
                    dirs: jnp.ndarray, height: int, width: int, *,
                    max_bounces: int, background, miss_colour, mode: str,
                    enable_glass: bool, enable_mirror: bool,
                    use_pallas: bool) -> jnp.ndarray:
    rgb = _shade_flat(scene, glights, plights, origins, dirs,
                      max_bounces=max_bounces, background=background,
                      miss_colour=miss_colour, enable_glass=enable_glass,
                      enable_mirror=enable_mirror, use_pallas=use_pallas)
    img = rgb.reshape(height, width, 3)
    if mode == "unit":
        return jnp.minimum(1.0, img / 255.0)
    if mode == "raw":
        return img
    raise ValueError(f"unknown mode {mode!r}")


def render_whitted(scene: Scene, glights: GlobalLights, plights: PointLights,
                   origins: jnp.ndarray, dirs: jnp.ndarray,
                   height: int, width: int, *, max_bounces: int = 5,
                   background=(0.0, 0.0, 0.0),
                   miss_colour: Optional[tuple] = None,
                   mode: str = "unit", use_pallas: bool = False,
                   chunk_rays: Optional[int] = None,
                   impl: str = "auto",
                   n_valid: Optional[int] = None) -> jnp.ndarray:
    """Render an ``[H, W, 3]`` frame.  ``miss_colour`` defaults to
    ``background`` (Planets notebooks use the background for misses;
    Marbles 4 substitutes a sky colour).

    Statically specialises away the refract walk / mirror bounce when the
    concrete scene has no exactly-1.0 transparent / reflective spheres.

    ``chunk_rays`` traces the wavefront in fixed-size chunks through ONE
    compiled program (last chunk edge-padded to size): mega frames whose
    whole-wavefront live set exceeds HBM (e.g. planets2 2001×2001 ×
    10-bounce refract walk) render at full fidelity, bounded-memory.

    ``impl``: ``"fused"`` = one XLA program (the only option under ``jit``,
    and the default); ``"pallas"`` = the whole-trace VMEM-resident kernel
    (core/pallas_whitted.py; measured at XLA-compute parity on v5e — the
    componentized XLA tracer already hits ~1.1 ms device compute per
    800×600 frame); ``"compact"`` = host-driven live-lane compaction
    between recursion levels (same image up to XLA codegen rounding).
    Compaction only pays on hosts with a low-latency device link: measured
    on the tunneled TPU here, the per-level host round-trips cost 4-8x
    more than the dead-lane resweeps they save (800x600 whitted 132.5 ms
    compact vs 34.9 ms fused; marbles4 801x801 358.7 vs 42.6 ms), so
    ``"auto"`` resolves to fused.

    ``n_valid``: when the flat wavefront carries padding rays past the
    image (dp-sharded renders pad to a multiple of the mesh size —
    parallel/mesh.shard_rays), only the first ``n_valid == height*width``
    rays form the image; the padded tail traces through the same pipeline
    and is cropped before reshape.
    """
    try:
        enable_glass, enable_mirror = material_flags(scene)
        concrete = True
    except Exception:       # traced scene (called under jit): keep both on
        enable_glass = enable_mirror = True
        concrete = False
    background = tuple(np.asarray(background, float).tolist())
    miss_colour = (None if miss_colour is None else
                   tuple(np.asarray(miss_colour, float).tolist()))
    kw = dict(max_bounces=max_bounces, background=background,
              miss_colour=miss_colour, enable_glass=enable_glass,
              enable_mirror=enable_mirror, use_pallas=use_pallas)
    n = origins.shape[0]
    n_out = n if n_valid is None else n_valid
    if n_out != height * width:
        raise ValueError(f"n_valid/ray count {n_out} != {height}x{width}")
    if impl == "auto":
        impl = "fused"
    if impl == "compact" and (not concrete
                              or isinstance(origins, jax.core.Tracer)):
        impl = "fused"          # compaction needs eager, concrete inputs
    shade = {"compact": _shade_flat_compact,
             "pallas": _shade_flat_pallas_trace}.get(impl, _shade_flat)

    def finish(flat):
        img = flat[:n_out].reshape(height, width, 3)
        if mode == "unit":
            return jnp.minimum(1.0, img / 255.0)
        if mode == "raw":
            return img
        raise ValueError(f"unknown mode {mode!r}")

    if chunk_rays is None or chunk_rays >= n:
        if impl in ("compact", "pallas") or n != n_out:
            return finish(shade(scene, glights, plights, origins, dirs, **kw))
        return _render_whitted(scene, glights, plights, origins, dirs,
                               height, width, mode=mode, **kw)
    parts = []
    for i in range(0, n, chunk_rays):
        o, d = origins[i:i + chunk_rays], dirs[i:i + chunk_rays]
        if o.shape[0] < chunk_rays:                   # pad → same program
            pad = [(0, chunk_rays - o.shape[0]), (0, 0)]
            o, d = jnp.pad(o, pad, mode="edge"), jnp.pad(d, pad, mode="edge")
        parts.append(shade(scene, glights, plights, o, d, **kw))
    return finish(jnp.concatenate(parts))
