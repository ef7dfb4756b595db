"""Multi-frame rendering in ONE device dispatch — the serving path.

New capability beyond the reference (which renders exactly one frame per
script run, e.g. RL/output5.py:render_true_original): look-at cameras,
orbit/lerp camera paths, and ``render_whitted_frames`` which maps the whole
Whitted pipeline over F cameras *inside one jitted program* with
``lax.map``.

Why this is the TPU-first design: through this environment's tunneled TPU
every dispatch pays a fixed 25-35 ms independent of program size, while the
device compute of one 800x600 Whitted frame is ~1.1 ms (measured in
STATUS.md / bench.py ``whitted_800x600_device_ms``).  Rendering F frames
per dispatch therefore costs ``floor + F * compute`` instead of
``F * (floor + compute)`` — a turntable animation runs ~20x cheaper per
frame than frame-at-a-time serving.  ``lax.map`` (not ``vmap``) keeps the
live wavefront at single-frame size, so mega frames still fit in HBM.

The reference has no camera-path machinery at all; its cameras always look
down -z from a fixed point (RL/ray_tracer_env.py:121-142,
FB/fb_vs_traditional_complex.py:285-297).  The look-at camera here reuses
the env variant's single-aspect NDC mapping and generalises the view
direction with an orthonormal basis.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.types import GlobalLights, PointLights, Scene
from .renderer import _shade_flat, material_flags


def look_at_rays(width: int, height: int, *, eye, target,
                 fov: float = 60.0, up=(0.0, 1.0, 0.0),
                 sample_xy: Optional[jnp.ndarray] = None,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective rays from ``eye`` toward ``target``.

    NDC/fov mapping matches the env camera's single-aspect convention
    (RL/ray_tracer_env.py:121-134); the fixed ``(x, y, -1)`` direction is
    generalised to ``sx*right + sy*up' + forward`` with an orthonormal
    look-at basis.  ``sample_xy``: optional ``[H, W, 2]`` sub-pixel
    offsets in [0, 1) (spp jitter); defaults to pixel centres.  Returns
    ``(origins [H*W,3], dirs [H*W,3])``; dirs are unit length.
    ``eye``/``target`` may be traced arrays (vmap-able over frames).
    """
    eye = jnp.asarray(eye, dtype)
    target = jnp.asarray(target, dtype)
    up = jnp.asarray(up, dtype)

    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    cam_up = jnp.cross(right, fwd)

    aspect = width / height
    half = float(np.tan(np.radians(fov) / 2))
    px = jnp.arange(width, dtype=dtype)[None, :]
    py = jnp.arange(height, dtype=dtype)[:, None]
    if sample_xy is None:
        ox_s = jnp.asarray(0.5, dtype)
        oy_s = jnp.asarray(0.5, dtype)
    else:
        ox_s = sample_xy[..., 0].astype(dtype)
        oy_s = sample_xy[..., 1].astype(dtype)
    sx = (2.0 * (px + ox_s) / width - 1.0) * aspect * half
    sy = (1.0 - 2.0 * (py + oy_s) / height) * half
    sx, sy = jnp.broadcast_arrays(sx, sy)
    dirs = (sx[..., None] * right + sy[..., None] * cam_up + fwd)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs.reshape(-1, 3)
    origins = jnp.broadcast_to(eye, dirs.shape)
    return origins, dirs


def orbit_eyes(center, radius: float, y: float, n_frames: int, *,
               start_angle: float = 0.0, sweep: float = 2 * np.pi,
               dtype=jnp.float32) -> jnp.ndarray:
    """``[F, 3]`` camera positions on a horizontal circle of ``radius``
    around ``center`` at absolute height ``y`` (a turntable path).  The
    first frame sits at ``start_angle`` (0 = +z side, matching the
    canonical scenes' down--z cameras); ``sweep`` < 2π gives a partial arc
    with endpoints included."""
    center = np.asarray(center, np.float64)
    closed = abs(sweep - 2 * np.pi) < 1e-12
    ang = start_angle + (np.linspace(0.0, sweep, n_frames, endpoint=not closed)
                         if n_frames > 1 else np.array([0.0]))
    xs = center[0] + radius * np.sin(ang)
    zs = center[2] + radius * np.cos(ang)
    ys = np.full_like(xs, y)
    return jnp.asarray(np.stack([xs, ys, zs], axis=-1), dtype)


def lerp_eyes(start, end, n_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[F, 3]`` linear dolly path from ``start`` to ``end`` inclusive."""
    t = np.linspace(0.0, 1.0, max(n_frames, 1))[:, None]
    path = (1 - t) * np.asarray(start, np.float64) + t * np.asarray(end, np.float64)
    return jnp.asarray(path, dtype)


def camera_path_rays(eyes: jnp.ndarray, target, width: int, height: int, *,
                     fov: float = 60.0, up=(0.0, 1.0, 0.0)
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for every frame of a camera path: ``eyes [F,3]`` all looking at
    ``target`` (a single point or ``[F,3]``).  Returns
    ``(origins [F,R,3], dirs [F,R,3])``."""
    eyes = jnp.asarray(eyes)
    target = jnp.asarray(target, eyes.dtype)
    if target.ndim == 1:
        target = jnp.broadcast_to(target, eyes.shape)
    gen = partial(_lookat_pair, width=width, height=height, fov=fov, up=up)
    return jax.vmap(gen)(eyes, target)


def _lookat_pair(eye, target, *, width, height, fov, up):
    return look_at_rays(width, height, eye=eye, target=target, fov=fov, up=up)


@partial(jax.jit, static_argnames=("height", "width", "max_bounces", "mode",
                                   "enable_glass", "enable_mirror"))
def _render_frames(scene: Scene, glights: GlobalLights, plights: PointLights,
                   origins: jnp.ndarray, dirs: jnp.ndarray,
                   height: int, width: int, *, max_bounces: int,
                   background, miss_colour, mode: str,
                   enable_glass: bool, enable_mirror: bool) -> jnp.ndarray:
    def one(od):
        o, d = od
        rgb = _shade_flat(scene, glights, plights, o, d,
                          max_bounces=max_bounces, background=background,
                          miss_colour=miss_colour, enable_glass=enable_glass,
                          enable_mirror=enable_mirror, use_pallas=False)
        img = rgb.reshape(height, width, 3)
        return jnp.minimum(1.0, img / 255.0) if mode == "unit" else img

    return jax.lax.map(one, (origins, dirs))


def render_whitted_frames(scene: Scene, glights: GlobalLights,
                          plights: PointLights, origins: jnp.ndarray,
                          dirs: jnp.ndarray, height: int, width: int, *,
                          max_bounces: int = 5, background=(0.0, 0.0, 0.0),
                          miss_colour: Optional[tuple] = None,
                          mode: str = "unit") -> jnp.ndarray:
    """Render ``[F, H, W, 3]`` frames from ``origins``/``dirs`` ``[F, R, 3]``
    in ONE compiled program (``lax.map`` over frames — single-frame memory
    footprint, one dispatch for the whole sequence).

    Output conventions and material specialisation match
    ``renderer.render_whitted``; each frame equals the single-frame
    renderer's output for the same rays.
    """
    if mode not in ("unit", "raw"):
        raise ValueError(f"unknown mode {mode!r}")
    try:
        enable_glass, enable_mirror = material_flags(scene)
    except Exception:           # traced scene: keep both branches on
        enable_glass = enable_mirror = True
    background = tuple(np.asarray(background, float).tolist())
    miss_colour = (None if miss_colour is None else
                   tuple(np.asarray(miss_colour, float).tolist()))
    return _render_frames(scene, glights, plights, origins, dirs,
                          height, width, max_bounces=max_bounces,
                          background=background, miss_colour=miss_colour,
                          mode=mode, enable_glass=enable_glass,
                          enable_mirror=enable_mirror)


def _render_path_frames(scene: Scene, key, eyes, targets, *, height, width,
                        spp, max_bounces, fov, mirror_threshold, background,
                        guide_fn, fb_prob, collect_stats):
    # Big-net guide params ride as jit arguments
    # (trace/path.call_with_split_guide) — closed-over weights inlined
    # into this frame-batched program would SIGILL the TPU compiler.
    from ..trace.path import (call_with_split_guide, emissive_indices,
                              no_diffuse_possible)
    return call_with_split_guide(
        _render_path_frames_jit, guide_fn, scene, key, eyes, targets,
        height=height, width=width, spp=spp, max_bounces=max_bounces,
        fov=fov, mirror_threshold=mirror_threshold, background=background,
        fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold))


@partial(jax.jit, static_argnames=("height", "width", "spp", "max_bounces",
                                   "fov", "mirror_threshold", "guide_fn",
                                   "g_apply", "g_dtype", "collect_stats",
                                   "emissive_idx", "no_diffuse"))
def _render_path_frames_jit(scene: Scene, key, eyes, targets, *, g_params,
                            height, width, spp, max_bounces, fov,
                            mirror_threshold, background, guide_fn, g_apply,
                            g_dtype, fb_prob, collect_stats,
                            emissive_idx=None, no_diffuse=False):
    from ..trace.path import _trace_path_fused_impl
    from .path_renderer import _assemble

    def one(args):
        eye, target, k = args
        k_jit, k_trace = jax.random.split(k)
        jit = jax.random.uniform(k_jit, (spp, height, width, 2), jnp.float32)
        o, d = jax.vmap(lambda j: look_at_rays(
            width, height, eye=eye, target=target, fov=fov,
            sample_xy=j))(jit)                         # [spp, H*W, 3]
        rgb, stats = _trace_path_fused_impl(
            scene, o.reshape(-1, 3), d.reshape(-1, 3), k_trace, g_params,
            max_bounces=max_bounces, mirror_threshold=mirror_threshold,
            background=background, guide_fn=guide_fn, g_apply=g_apply,
            g_dtype=g_dtype, fb_prob=fb_prob, collect_stats=collect_stats,
            emissive_idx=emissive_idx, no_diffuse=no_diffuse)
        return _assemble(rgb, spp=spp, height=height, width=width), stats

    keys = jax.random.split(key, eyes.shape[0])
    imgs, stats = jax.lax.map(one, (eyes, targets, keys))
    stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), stats)
    return imgs, stats


def render_path_frames(scene: Scene, key, eyes: jnp.ndarray, target, *,
                       width: int, height: int, spp: int = 4,
                       max_bounces: int = 3, fov: float = 60.0,
                       mirror_threshold: float = 0.9,
                       background=(2.0, 2.0, 5.0), guide_fn=None,
                       fb_prob: float = 1.0, collect_stats: bool = True):
    """Path-traced camera path: ``[F, H, W, 3]`` frames + summed PathStats
    in ONE compiled program — the guided-sampling serving path (the
    distilled FB guide runs inside each frame's fused trace, so a learned
    sampler animates at the same dispatch cost as the traditional one).

    ``eyes [F, 3]`` look at ``target`` (point or ``[F, 3]``) with the
    single-aspect look-at camera + per-sample jitter; pixel averaging is
    the reference's integer ``floor(sum/spp)`` (render_path._assemble).
    """
    eyes = jnp.asarray(eyes, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if target.ndim == 1:
        target = jnp.broadcast_to(target, eyes.shape)
    background = tuple(np.asarray(background, float).tolist())
    return _render_path_frames(scene, key, eyes, target, height=height,
                               width=width, spp=spp, max_bounces=max_bounces,
                               fov=fov, mirror_threshold=mirror_threshold,
                               background=background, guide_fn=guide_fn,
                               fb_prob=fb_prob, collect_stats=collect_stats)


def scene_focus(scene: Scene) -> np.ndarray:
    """Default look-at target: per-axis median centre of the scene's
    non-wall spheres (radius < 50 — the room/wall spheres in the canonical
    scenes are r=99/1000).  Median, not mean: one distant backdrop sphere
    must not drag the target out of the object cluster.  Host-side helper
    for CLI defaults; pass an explicit target for production paths."""
    c = np.asarray(scene.centre, np.float64)
    r = np.asarray(scene.radius, np.float64)
    live = (r > 0) & (r < 50.0)
    if not live.any():
        live = r > 0
    return np.median(c[live], axis=0)
