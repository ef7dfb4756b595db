"""Device-mesh sharding.

The reference has no distributed layer at all (SURVEY.md §2.5 — SB3 vec-env
imports are dead code; single process, single CPU).  The TPU-native scaling
design is:

* **Rendering** — pure data parallelism over the pixel/ray axis: rays are
  sharded ``P('dp')`` across the mesh, the scene SoA is replicated, and the
  only cross-chip traffic is the final image gather + ``psum`` of the stats
  counters, riding ICI.
* **FB training** — batch sharded over ``dp``; the wide (512/256) FB layers
  optionally shard their hidden axis over ``tp`` (tensor parallelism sized
  to the model: at 512 wide it is optional headroom, not a necessity).
  Gradient reduction is XLA's automatic ``psum`` under jit.

Pipeline/sequence/expert parallelism are deliberately absent: there is no
layer pipeline depth, the only "sequence" is the bounce chain (handled as
wavefront scan), and the forward heads are an ensemble, not routed experts
— see SURVEY.md §2.5 for the per-strategy mapping.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """Mesh over available devices: ``(dp, tp)`` with ``dp = n // tp``."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    assert n % tp == 0, (n, tp)
    arr = np.array(devs).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_rays(mesh: Mesh, *arrays):
    """Place ray-wavefront arrays with the batch axis sharded over dp.

    Pads the leading axis up to a multiple of the dp size (XLA requires
    equal shards); returns (padded arrays, original length).
    """
    dp = mesh.shape["dp"]
    out = []
    n0 = arrays[0].shape[0]
    n_pad = (-n0) % dp
    for a in arrays:
        if n_pad:
            # Edge-replicate rather than zero-pad: a zero direction would
            # NaN under normalisation in the path tracer; a duplicated live
            # ray is always safe and the padded rows are cropped after.
            pad_width = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, pad_width, mode="edge")
        sh_a = NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1))))
        out.append(jax.device_put(a, sh_a))
    return out, n0


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (scene, params) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_fb_params(mesh: Mesh, params, min_dim: int = 128):
    """Tensor-parallel placement for FB params: shard the last (output)
    axis of any kernel whose width is divisible by the tp size and at least
    ``min_dim``; everything else replicates.  With XLA's SPMD partitioner
    the matching activations shard automatically and the contractions
    insert the ICI collectives."""
    tp = mesh.shape["tp"]

    def place(x):
        if (x.ndim >= 2 and x.shape[-1] >= min_dim
                and x.shape[-1] % tp == 0):
            spec = P(*([None] * (x.ndim - 1) + ["tp"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def render_whitted_sharded(mesh: Mesh, scene, glights, plights, origins,
                           dirs, height: int, width: int, **kw):
    """Data-parallel Whitted render over the mesh: rays sharded, scene
    replicated, GSPMD inserts the gather at image assembly.

    One code path with the single-device renderer: padded wavefronts ride
    ``render_whitted(n_valid=...)`` so shading / miss / mode / material-flag
    specialisation can never drift from the unsharded frame."""
    from ..render.renderer import render_whitted

    (o, d), n0 = shard_rays(mesh, origins, dirs)
    scene = replicate(mesh, scene)
    glights = replicate(mesh, glights)
    plights = replicate(mesh, plights)
    return render_whitted(scene, glights, plights, o, d, height, width,
                          n_valid=n0, **kw)


def render_whitted_frames_sharded(mesh: Mesh, scene, glights, plights,
                                  origins, dirs, height: int, width: int, *,
                                  max_bounces: int = 5,
                                  background=(0.0, 0.0, 0.0),
                                  miss_colour=None, mode: str = "unit"):
    """Frame-parallel serving over the mesh: the camera-path axis shards
    ``P('dp')`` via ``shard_map``, so each chip renders its own slice of
    the animation with ZERO cross-chip traffic until the host gathers the
    stacked frames — the third parallel axis next to ray-dp and tensor-tp
    (turntables/batch serving scale linearly in chips).

    ``origins``/``dirs``: ``[F, R, 3]`` (see render/animation.py).  F pads
    up to a multiple of the dp size (edge-replicated frames, cropped
    after).  Each frame still renders through the full lax.map pipeline of
    ``render_whitted_frames``, so per-chip memory stays single-frame.
    """
    from ..render.animation import _render_frames
    from ..render.renderer import material_flags

    try:
        enable_glass, enable_mirror = material_flags(scene)
    except Exception:
        enable_glass = enable_mirror = True
    background = tuple(np.asarray(background, float).tolist())
    miss_colour = (None if miss_colour is None else
                   tuple(np.asarray(miss_colour, float).tolist()))

    dp = mesh.shape["dp"]
    f0 = origins.shape[0]
    pad = (-f0) % dp
    if pad:
        pw = [(0, pad), (0, 0), (0, 0)]
        origins = jnp.pad(origins, pw, mode="edge")
        dirs = jnp.pad(dirs, pw, mode="edge")
    fspec = P("dp", None, None)
    origins = jax.device_put(origins, NamedSharding(mesh, fspec))
    dirs = jax.device_put(dirs, NamedSharding(mesh, fspec))

    def body(sc, gl, pl, o, d):
        return _render_frames(sc, gl, pl, o, d, height, width,
                              max_bounces=max_bounces, background=background,
                              miss_colour=miss_colour, mode=mode,
                              enable_glass=enable_glass,
                              enable_mirror=enable_mirror)

    # check_vma off: the tracer's fori_loop carries are seeded from the
    # replicated scene and only become dp-varying inside the loop body —
    # semantically fine (every lane is per-frame data), but the static
    # varying-axis checker rejects the mixed carry types.
    out = jax.shard_map(body, mesh=mesh,
                        in_specs=(P(), P(), P(), fspec, fspec),
                        out_specs=P("dp", None, None, None),
                        check_vma=False)(scene, glights, plights,
                                         origins, dirs)
    return out[:f0]


def render_path_sharded(mesh: Mesh, scene, key, *, width: int, height: int,
                        spp: int = 4, max_bounces: int = 3, fov: float = 60.0,
                        camera_position=(0.0, 2.0, 0.0),
                        mirror_threshold: float = 0.9,
                        background=(2.0, 2.0, 5.0), guide_fn=None,
                        fb_prob: float = 1.0, collect_stats: bool = True,
                        impl: str = "stepwise"):
    """Data-parallel path-traced render: the ``H*W*spp`` sample wavefront is
    sharded ``P('dp')``, the scene replicated; a guide (if given) then runs
    its forward on dp-sharded observations — with tp-sharded guide params
    GSPMD inserts the tp collectives inside the policy matmuls.

    ``impl='stepwise'`` keeps the guide in its own compiled program between
    levels (the TPU-friendly configuration — see trace_path)."""
    from ..render.path_renderer import _assemble, _camera_bundle
    from ..trace.path import trace_path

    k_jit, k_trace = jax.random.split(key)
    cam = jnp.asarray(camera_position, jnp.float32)
    origins, dirs = _camera_bundle(k_jit, width=width, height=height,
                                   spp=spp, fov=fov, camera_position=cam)
    (o, d), n0 = shard_rays(mesh, origins, dirs)
    scene_r = replicate(mesh, scene)
    rgb, stats = trace_path(scene_r, o, d, k_trace, max_bounces=max_bounces,
                            mirror_threshold=mirror_threshold,
                            background=background, guide_fn=guide_fn,
                            fb_prob=fb_prob, collect_stats=collect_stats,
                            impl=impl)
    img = _assemble(rgb[:n0], spp=spp, height=height, width=width)
    return img, stats
