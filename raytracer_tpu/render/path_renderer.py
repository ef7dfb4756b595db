"""Path-traced frame renderer — the TPU form of the FB comparison
``render`` loops (FB/fb_vs_traditional_complex.py:391-422 traditional,
:603-635 FB; chandelier copies :739-771).

Per pixel: ``spp`` jittered perspective samples, summed as integer sample
colours then **integer-divided** by spp (``//`` in the reference), and
finally ``min(1, c/255)`` per channel.  Jitter is ``0.5 + (U-0.5)`` on each
axis, i.e. uniform in [0, 1).

All spp samples for all pixels trace as one wavefront of ``H*W*spp`` rays.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..scene.types import Scene
from ..trace.path import (PathStats, _trace_path_fused_impl,
                          _trace_path_lean_impl, call_with_split_guide,
                          emissive_indices, no_diffuse_possible, scene_spec,
                          trace_path)
from .camera import perspective_rays


@partial(jax.jit, static_argnames=("width", "height", "spp", "fov"))
def _camera_bundle(key, *, width, height, spp, fov, camera_position):
    dtype = jnp.float32
    # Jitter: sample offsets 0.5 + (U - 0.5) per sample per pixel.
    jit = jax.random.uniform(key, (spp, height, width, 2), dtype)

    def rays_for_sample(j):
        return perspective_rays(width, height, fov=fov,
                                origin=camera_position, variant="fb",
                                sample_xy=j, dtype=dtype)

    origins, dirs = jax.vmap(rays_for_sample)(jit)      # [spp, H*W, 3]
    return origins.reshape(-1, 3), dirs.reshape(-1, 3)


@partial(jax.jit, static_argnames=("spp", "height", "width"))
def _assemble(rgb, *, spp, height, width):
    # Integer //spp average of integer sample colours (reference quirk).
    sample_sum = jnp.sum(rgb.reshape(spp, height, width, 3), axis=0)
    pixel = jnp.floor(sample_sum / spp)
    return jnp.minimum(1.0, pixel / 255.0)


def _render_path_fused(scene, key, *, width, height, spp, max_bounces, fov,
                       camera_position, mirror_threshold, background,
                       guide_fn, fb_prob, collect_stats, fast=False):
    # Big-net guides' params ride as jit arguments, not closed-over
    # constants (trace/path.call_with_split_guide — inlined weights SIGILL
    # the TPU compiler); this outer jit boundary must route them too.
    return call_with_split_guide(
        _render_path_fused_jit, guide_fn, scene, key, width=width,
        height=height, spp=spp, max_bounces=max_bounces, fov=fov,
        camera_position=camera_position, mirror_threshold=mirror_threshold,
        background=background, fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast)


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_bounces",
                                   "mirror_threshold", "guide_fn", "g_apply",
                                   "g_dtype", "fov", "collect_stats",
                                   "emissive_idx", "no_diffuse", "fast"))
def _render_path_fused_jit(scene, key, *, g_params, width, height, spp,
                           max_bounces, fov, camera_position,
                           mirror_threshold, background, guide_fn, g_apply,
                           g_dtype, fb_prob, collect_stats,
                           emissive_idx=None, no_diffuse=False, fast=False):
    k_jit, k_trace = jax.random.split(key)
    origins, dirs = _camera_bundle(
        k_jit, width=width, height=height, spp=spp, fov=fov,
        camera_position=camera_position)
    rgb, stats = _trace_path_fused_impl(
        scene, origins, dirs, k_trace, g_params, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold, background=background,
        guide_fn=guide_fn, g_apply=g_apply, g_dtype=g_dtype,
        fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_idx, no_diffuse=no_diffuse, fast=fast)
    img = _assemble(rgb, spp=spp, height=height, width=width)
    return img, stats


def _render_path_lean(scene, key, *, width, height, spp, max_bounces, fov,
                      camera_position, mirror_threshold, background,
                      guide_fn, fb_prob, collect_stats, fast=False,
                      block_rays=245760):
    spec = scene_spec(scene)
    return call_with_split_guide(
        _render_path_lean_jit, guide_fn,
        None if spec is not None else scene, key, width=width,
        height=height, spp=spp, max_bounces=max_bounces, fov=fov,
        camera_position=camera_position, mirror_threshold=mirror_threshold,
        background=background, fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast,
        block_rays=block_rays, spec=spec)


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_bounces",
                                   "mirror_threshold", "guide_fn", "g_apply",
                                   "g_dtype", "fov", "collect_stats",
                                   "emissive_idx", "no_diffuse", "fast",
                                   "block_rays", "spec"))
def _render_path_lean_jit(scene, key, *, g_params, width, height, spp,
                          max_bounces, fov, camera_position,
                          mirror_threshold, background, guide_fn, g_apply,
                          g_dtype, fb_prob, collect_stats,
                          emissive_idx=None, no_diffuse=False, fast=False,
                          block_rays=245760, spec=None):
    """One dispatch: camera bundle → lean block tracer → assembly.  Output
    is bit-identical to the fused renderer (same draws, same op order —
    see trace/path.py's lean section); the internals are restructured to
    the measured TPU cost profile."""
    k_jit, k_trace = jax.random.split(key)
    origins, dirs = _camera_bundle(
        k_jit, width=width, height=height, spp=spp, fov=fov,
        camera_position=camera_position)
    rgb, stats = _trace_path_lean_impl(
        scene, origins, dirs, k_trace, g_params, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold, background=background,
        guide_fn=guide_fn, g_apply=g_apply, g_dtype=g_dtype,
        fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_idx, no_diffuse=no_diffuse, fast=fast,
        block_rays=block_rays, spec=spec)
    img = _assemble(rgb, spp=spp, height=height, width=width)
    return img, stats


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_bounces",
                                   "mirror_threshold", "fov", "collect_stats",
                                   "emissive_idx", "no_diffuse", "fast",
                                   "spec", "background", "guide_spec",
                                   "fb_prob", "interpret"))
def _render_path_pallas_jit(key, *, width, height, spp, max_bounces, fov,
                            camera_position, mirror_threshold, background,
                            collect_stats, emissive_idx, no_diffuse, fast,
                            spec, guide_spec=None, fb_prob=1.0, interpret):
    """ONE dispatch: camera bundle → whole-trace Pallas kernel → assembly
    (core/pallas_path.py; concrete scene; optional baked student guide —
    the router in render_path enforces/extracts both)."""
    from ..core.pallas_path import trace_path_pallas_impl
    k_jit, k_trace = jax.random.split(key)
    origins, dirs = _camera_bundle(
        k_jit, width=width, height=height, spp=spp, fov=fov,
        camera_position=camera_position)
    rgb, stats = trace_path_pallas_impl(
        origins, dirs, k_trace, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold, background=background,
        spec=spec, emissive_idx=emissive_idx, no_diffuse=no_diffuse,
        fast=fast, collect_stats=collect_stats, guide_spec=guide_spec,
        fb_prob=fb_prob, interpret=interpret)
    img = _assemble(rgb, spp=spp, height=height, width=width)
    return img, stats


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_bounces",
                                   "mirror_threshold", "fov", "collect_stats",
                                   "emissive_idx", "no_diffuse", "fast",
                                   "spec", "background", "guide_fn",
                                   "g_apply", "g_dtype", "interpret"))
def _render_path_hybrid_jit(key, g_params, *, width, height, spp,
                            max_bounces, fov, camera_position,
                            mirror_threshold, background, collect_stats,
                            emissive_idx, no_diffuse, fast, spec,
                            guide_fn=None, g_apply=None, g_dtype=None,
                            fb_prob=1.0, interpret=False):
    """ONE dispatch: camera bundle → level-split hybrid (Pallas level
    kernels + MXU guide between them) → assembly."""
    from ..trace.path import _trace_path_hybrid_impl
    k_jit, k_trace = jax.random.split(key)
    origins, dirs = _camera_bundle(
        k_jit, width=width, height=height, spp=spp, fov=fov,
        camera_position=camera_position)
    rgb, stats = _trace_path_hybrid_impl(
        origins, dirs, k_trace, g_params, max_bounces=max_bounces,
        mirror_threshold=mirror_threshold, background=background,
        guide_fn=guide_fn, g_apply=g_apply, g_dtype=g_dtype,
        fb_prob=fb_prob, collect_stats=collect_stats, spec=spec,
        emissive_idx=emissive_idx, no_diffuse=no_diffuse, fast=fast,
        interpret=interpret)
    img = _assemble(rgb, spp=spp, height=height, width=width)
    return img, stats


def _render_path_chunked(scene, key, *, width, height, spp_chunk, chunks,
                         max_bounces, fov, camera_position, mirror_threshold,
                         background, guide_fn, fb_prob, collect_stats,
                         fast=False):
    return call_with_split_guide(
        _render_path_chunked_jit, guide_fn, scene, key, width=width,
        height=height, spp_chunk=spp_chunk, chunks=chunks,
        max_bounces=max_bounces, fov=fov, camera_position=camera_position,
        mirror_threshold=mirror_threshold, background=background,
        fb_prob=fb_prob, collect_stats=collect_stats,
        emissive_idx=emissive_indices(scene),
        no_diffuse=no_diffuse_possible(scene, mirror_threshold), fast=fast)


@partial(jax.jit, static_argnames=("width", "height", "spp_chunk", "chunks",
                                   "max_bounces", "mirror_threshold",
                                   "guide_fn", "g_apply", "g_dtype", "fov",
                                   "collect_stats", "emissive_idx",
                                   "no_diffuse", "fast"))
def _render_path_chunked_jit(scene, key, *, g_params, width, height,
                             spp_chunk, chunks, max_bounces, fov,
                             camera_position, mirror_threshold, background,
                             guide_fn, g_apply, g_dtype, fb_prob,
                             collect_stats, emissive_idx=None,
                             no_diffuse=False, fast=False):
    """High-spp render at bounded memory in ONE dispatch: ``lax.map`` over
    ``chunks`` independent ``spp_chunk``-sample sub-renders, accumulating
    integer sample sums, then ONE ``floor(total / spp_total)`` — exactly
    the reference's integer ``//spp`` average semantics
    (FB/fb_vs_traditional_complex.py:391-422) applied to the full sample
    set, while only ``spp_chunk × H × W`` rays are ever live."""
    keys = jax.random.split(key, chunks)

    def one(k):
        k_jit, k_trace = jax.random.split(k)
        origins, dirs = _camera_bundle(
            k_jit, width=width, height=height, spp=spp_chunk, fov=fov,
            camera_position=camera_position)
        rgb, stats = _trace_path_fused_impl(
            scene, origins, dirs, k_trace, g_params,
            max_bounces=max_bounces, mirror_threshold=mirror_threshold,
            background=background, guide_fn=guide_fn, g_apply=g_apply,
            g_dtype=g_dtype, fb_prob=fb_prob, collect_stats=collect_stats,
            emissive_idx=emissive_idx, no_diffuse=no_diffuse, fast=fast)
        return jnp.sum(rgb.reshape(spp_chunk, height, width, 3), axis=0), stats

    sums, stats = jax.lax.map(one, keys)
    pixel = jnp.floor(jnp.sum(sums, axis=0) / (spp_chunk * chunks))
    img = jnp.minimum(1.0, pixel / 255.0)
    stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), stats)
    return img, stats


def render_path(scene: Scene, key: jax.Array, *, width: int, height: int,
                spp: int = 4, max_bounces: int = 3, fov: float = 60.0,
                camera_position=(0.0, 2.0, 0.0),
                mirror_threshold: float = 0.9,
                background=(2.0, 2.0, 5.0),
                guide_fn: Optional[Callable] = None,
                fb_prob: float = 1.0,
                collect_stats: bool = True,
                impl: str = "fused",
                spp_chunk: Optional[int] = None,
                guide_max_level: Optional[int] = None,
                precision: str = "exact"):
    """Render ``[H, W, 3]`` unit-range image + PathStats.

    ``impl`` selects the trace implementation (see ``trace_path``);
    "fused" is one fully-fused XLA program, "lean" is the production
    serving renderer — bit-identical output to "fused" (same draws, same
    per-lane op order; asserted in tests/test_path.py) restructured to the
    measured TPU cost profile (in-sweep attribute selection, unrolled
    levels, inline fold, ~240k-ray blocking — scripts/profile_path4-6),
    "stepwise" keeps TPU compile time flat in max_bounces and compiles the
    guide network separately from the tracer.

    ``spp_chunk``: accumulate ``spp`` samples in independent chunks of this
    size inside one compiled program (``lax.map``) — high-spp quality
    renders whose full wavefront would not fit in HBM run at
    ``spp_chunk``-sized memory with no extra dispatches.  Requires
    ``impl="fused"`` and ``spp % spp_chunk == 0``; the pixel average is the
    reference's integer ``floor(sum/spp)`` over the full sample set.
    """
    cam = jnp.asarray(camera_position, jnp.float32)
    if precision not in ("exact", "fast"):
        raise ValueError(f"unknown precision {precision!r}")
    fast = precision == "fast"
    if guide_max_level is not None and impl != "stepwise":
        raise ValueError("guide_max_level requires impl='stepwise' "
                         "(see trace_path)")
    if impl == "lean":
        if spp_chunk is not None:
            raise ValueError("impl='lean' does its own wavefront blocking; "
                             "spp_chunk applies to impl='fused'")
        return _render_path_lean(
            scene, key, width=width, height=height, spp=spp,
            max_bounces=max_bounces, fov=fov, camera_position=cam,
            mirror_threshold=mirror_threshold, background=background,
            guide_fn=guide_fn, fb_prob=fb_prob, collect_stats=collect_stats,
            fast=fast)
    if impl == "pallas":
        if spp_chunk is not None:
            raise ValueError("impl='pallas' traces the full wavefront "
                             "in-kernel; spp_chunk applies to impl='fused'")
        from ..core.pallas_path import student_guide_spec
        gspec = None
        if guide_fn is not None:
            gspec = student_guide_spec(guide_fn)
            if gspec is None:
                raise ValueError(
                    "impl='pallas' supports distilled-student guides only "
                    "(DistilledGuide.as_guide_fn); full agents use "
                    "impl='fused'/'lean'")
        spec = scene_spec(scene)
        if spec is None:
            raise ValueError("impl='pallas' requires a concrete scene "
                             "(scene_spec)")
        no_diff = no_diffuse_possible(scene, mirror_threshold)
        return _render_path_pallas_jit(
            key, width=width, height=height, spp=spp,
            max_bounces=max_bounces, fov=fov, camera_position=cam,
            mirror_threshold=mirror_threshold,
            background=tuple(float(b) for b in background),
            collect_stats=collect_stats,
            emissive_idx=emissive_indices(scene), no_diffuse=no_diff,
            fast=fast, spec=spec,
            guide_spec=None if no_diff else gspec, fb_prob=fb_prob,
            interpret=jax.default_backend() != "tpu")
    if impl == "hybrid":
        if spp_chunk is not None:
            raise ValueError("impl='hybrid' traces the full wavefront; "
                             "spp_chunk applies to impl='fused'")
        spec = scene_spec(scene)
        if spec is None:
            raise ValueError("impl='hybrid' requires a concrete scene "
                             "(scene_spec)")
        from ..trace.path import call_with_split_guide as _cwsg
        return _cwsg(
            _render_path_hybrid_jit, guide_fn, key,
            width=width, height=height, spp=spp, max_bounces=max_bounces,
            fov=fov, camera_position=cam,
            mirror_threshold=mirror_threshold,
            background=tuple(float(b) for b in background),
            collect_stats=collect_stats,
            emissive_idx=emissive_indices(scene),
            no_diffuse=no_diffuse_possible(scene, mirror_threshold),
            fast=fast, spec=spec, fb_prob=fb_prob,
            interpret=jax.default_backend() != "tpu")
    if spp_chunk is not None and spp_chunk < spp:
        if impl != "fused":
            raise ValueError("spp_chunk requires impl='fused'")
        if spp % spp_chunk:
            raise ValueError(f"spp={spp} not divisible by spp_chunk={spp_chunk}")
        return _render_path_chunked(
            scene, key, width=width, height=height, spp_chunk=spp_chunk,
            chunks=spp // spp_chunk, max_bounces=max_bounces, fov=fov,
            camera_position=cam, mirror_threshold=mirror_threshold,
            background=background, guide_fn=guide_fn, fb_prob=fb_prob,
            collect_stats=collect_stats, fast=fast)
    if impl == "fused":
        return _render_path_fused(
            scene, key, width=width, height=height, spp=spp,
            max_bounces=max_bounces, fov=fov, camera_position=cam,
            mirror_threshold=mirror_threshold, background=background,
            guide_fn=guide_fn, fb_prob=fb_prob, collect_stats=collect_stats,
            fast=fast)
    k_jit, k_trace = jax.random.split(key)
    origins, dirs = _camera_bundle(
        k_jit, width=width, height=height, spp=spp, fov=fov,
        camera_position=cam)
    rgb, stats = trace_path(scene, origins, dirs, k_trace,
                            max_bounces=max_bounces,
                            mirror_threshold=mirror_threshold,
                            background=background, guide_fn=guide_fn,
                            fb_prob=fb_prob, collect_stats=collect_stats,
                            impl=impl, guide_max_level=guide_max_level,
                            precision=precision)
    img = _assemble(rgb, spp=spp, height=height, width=width)
    return img, stats
