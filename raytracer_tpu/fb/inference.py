"""Trained-FB inference: light prototype + batched guided sampling.

Rebuild of ``TrainedFBAgent`` (FB/fb_vs_traditional_complex.py:147-256,
chandelier copy :147-270):

* load a checkpoint (native ``.npz`` or a reference ``.pth`` with the
  ``fb_learner_state`` schema),
* pre-compute the **light prototype**: encode 5 random surface samples per
  small light (radius < 0.5) with the to-camera incoming direction, mean the
  latents and L2-normalise (:204-247),
* ``choose_direction(obs)`` = backward_model(encode(obs), prototype) mean,
  clipped to [-1, 1]; ``use_mean=False`` adds log-var sampling noise
  (chandelier :256-270).

The reference ran this once per diffuse bounce per ray on CPU (the measured
6.7× slowdown, BASELINE.md); ``as_guide_fn`` hands the whole thing to
``trace_path`` as one batched forward per bounce wavefront.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.types import Scene
from .config import FBConfig
from .networks import make_networks


@dataclasses.dataclass(frozen=True)
class _AgentApply:
    """Hashable ``(params, obs, dtype) → action-mean`` forward for fusing
    the full agent into the stepwise level kernel
    (trace/path.py _level_kernel_guided guide_apply).  flax modules are
    frozen dataclasses, so this is a valid static jit argument and two
    agents with the same architecture share one compiled level program."""

    enc: Any
    bwd: Any

    def __call__(self, params, obs, dtype):
        proto = params["proto"]
        if dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(dtype), t)
            params = {"encoder": cast(params["encoder"]),
                      "backward": cast(params["backward"])}
            obs = obs.astype(dtype)
            proto = proto.astype(dtype)
        out = self.enc.apply({"params": params["encoder"]}, obs)
        z, _ = jnp.split(out, 2, axis=-1)
        mean, _ = self.bwd.apply({"params": params["backward"]}, z,
                                 jnp.broadcast_to(proto, z.shape))
        return mean.astype(jnp.float32)


class TrainedFBAgent:
    def __init__(self, model_path: Optional[str], scene: Scene,
                 small_light_idx: np.ndarray, camera_position,
                 config: Optional[FBConfig] = None, seed: int = 0):
        self.config = config or FBConfig()
        self.enc, self.fwd, self.bwd = make_networks(self.config)
        self.camera_position = np.asarray(camera_position, np.float32)
        self._rng = np.random.default_rng(seed)
        self._sample_key = jax.random.key(seed)

        if model_path is None:
            self.params = self._init_params(seed)
            self.loaded = False
        else:
            self.params = self._load(model_path)
            self.loaded = True

        self.light_prototype = self._compute_light_prototype(
            scene, small_light_idx)

    def _init_params(self, seed):
        key = jax.random.key(seed)
        ke, kf, kb = jax.random.split(key, 3)
        c = self.config
        return {
            "encoder": self.enc.init(ke, jnp.zeros((1, c.obs_dim)))["params"],
            "forward": self.fwd.init(kf, jnp.zeros((1, c.z_dim)),
                                     jnp.zeros((1, c.action_dim)))["params"],
            "backward": self.bwd.init(kb, jnp.zeros((1, c.z_dim)),
                                      jnp.zeros((1, c.z_dim)))["params"],
        }

    def _load(self, path):
        path = str(path)
        if path.endswith(".pth"):
            from ..utils.torch_import import (import_fb_learner_state,
                                              load_torch_checkpoint)
            ck = load_torch_checkpoint(path)
            return import_fb_learner_state(ck, self.config)
        from ..utils.checkpoint import load_fb
        params, _, _ = load_fb(path, self.config)
        return {"encoder": params.encoder, "forward": params.forward,
                "backward": params.backward}

    def encode(self, obs: jnp.ndarray) -> jnp.ndarray:
        out = self.enc.apply({"params": self.params["encoder"]}, obs)
        mean, _ = jnp.split(out, 2, axis=-1)
        return mean

    def _observation_for_light(self, point, normal, incoming, colour,
                               sphere_id):
        """22-D obs as _create_observation builds it for prototype samples
        (:184-202): material = the light's (emitive), bounce features 0,
        pad (0.5, 0.5, 0.5)."""
        return np.concatenate([
            point, incoming, normal,
            [0.0, 0.0, 1.0, 1.0],                    # refl, transp, emit, ior
            np.asarray(colour, np.float32) / 255.0,
            [0.0, 0.0, float(sphere_id) / 100.0, 0.5, 0.5, 0.5],
        ]).astype(np.float32)

    def _compute_light_prototype(self, scene: Scene,
                                 small_light_idx: np.ndarray,
                                 num_samples_per_light: int = 5) -> np.ndarray:
        centres = np.asarray(scene.centre)
        radii = np.asarray(scene.radius)
        colours = np.asarray(scene.colour)
        ids = np.asarray(scene.id)
        latents = []
        obs_rows = []
        for i in np.asarray(small_light_idx):
            to_cam = self.camera_position - centres[i]
            n = np.linalg.norm(to_cam)
            to_cam = to_cam / n if n > 1e-8 else to_cam
            for _ in range(num_samples_per_light):
                theta = self._rng.uniform(0, 2 * np.pi)
                phi = self._rng.uniform(0, np.pi)
                offset = np.array([np.sin(phi) * np.cos(theta),
                                   np.sin(phi) * np.sin(theta),
                                   np.cos(phi)]) * radii[i]
                point = centres[i] + offset
                on = np.linalg.norm(offset)
                normal = offset / on if on > 1e-8 else offset
                obs_rows.append(self._observation_for_light(
                    point, normal, to_cam, colours[i], ids[i]))
        if not obs_rows:
            return np.zeros((self.config.z_dim,), np.float32)
        z = np.asarray(self.encode(jnp.asarray(np.stack(obs_rows))))
        proto = z.mean(axis=0)
        n = np.linalg.norm(proto)
        if n > 1e-8:
            proto = proto / n
        return proto.astype(np.float32)

    def choose_direction(self, obs, use_mean: bool = True) -> np.ndarray:
        obs = jnp.atleast_2d(jnp.asarray(obs, jnp.float32))
        z = self.encode(obs)
        proto = jnp.broadcast_to(jnp.asarray(self.light_prototype), z.shape)
        mean, log_var = self.bwd.apply({"params": self.params["backward"]},
                                       z, proto)
        if not use_mean:
            self._sample_key, k = jax.random.split(self._sample_key)
            std = jnp.exp(0.5 * log_var)
            mean = mean + std * jax.random.normal(k, mean.shape, mean.dtype)
        a = np.clip(np.asarray(mean), -1.0, 1.0)
        return a[0] if a.shape[0] == 1 else a

    def as_guide_fn(self, dtype="auto"):
        """A ``obs[R,22] -> action[R,2]`` callable for trace_path.

        The params are passed as jit *arguments*, not closed-over constants:
        weights inlined as literals blow the program up to >10 MB of MLIR
        and crash the TPU compiler's fusion cost model (observed SIGILL in
        TpuPriorityFusionQueue::NormalizedComputationCost).

        ``dtype="auto"`` (default) picks bfloat16 on TPU backends — the
        policy matmuls halve their HBM traffic and run the MXU at full rate
        (measured: guide cost 130 → 65 ms/frame at the chandelier config);
        actions are a sampler steer, not geometry, so precision headroom is
        ample.  Non-TPU backends keep f32 (exact parity with the float64
        oracle tests).  Pass an explicit dtype (or None for f32) to
        override.  ``dtype="int8"`` selects the dynamically-quantized
        int8 policy (fb/quantize.py) — int8 MXU matmuls at 2× the bf16
        rate.
        """
        if dtype == "int8":
            from .quantize import make_int8_guide
            return make_int8_guide(self)
        if dtype == "auto":
            dtype = (jnp.bfloat16
                     if jax.default_backend() not in ("cpu", "gpu")
                     else None)
        enc, bwd = self.enc, self.bwd

        @jax.jit
        def _forward(params, proto, obs):
            if dtype is not None:
                params = jax.tree_util.tree_map(lambda x: x.astype(dtype),
                                                params)
                obs = obs.astype(dtype)
                proto = proto.astype(dtype)
            out = enc.apply({"params": params["encoder"]}, obs)
            z, _ = jnp.split(out, 2, axis=-1)
            mean, _ = bwd.apply({"params": params["backward"]}, z,
                                jnp.broadcast_to(proto, z.shape))
            return mean.astype(jnp.float32)

        params = self.params
        proto = jnp.asarray(self.light_prototype)

        def guide(obs):
            return _forward(params, proto, obs)

        guide._no_rejit = True        # consumed by trace_path's stepwise impl
        # Stepwise tracing fuses the whole policy into the level kernel —
        # same program shape as the distilled student, just a bigger apply
        # (saves 2 host→device dispatches per level; the big-net params
        # still ride as jit arguments).
        guide._fused_spec = ({"encoder": params["encoder"],
                              "backward": params["backward"],
                              "proto": proto},
                             dtype, _AgentApply(self.enc, self.bwd))
        return guide


def small_light_indices(scene: Scene, radius_below: float = 0.5) -> np.ndarray:
    """Emissive spheres with radius < 0.5 — the reference's "small lights"
    partition (FB/fb_vs_traditional_chandelier.py:802-804)."""
    em = np.asarray(scene.emitive) > 0
    sm = np.asarray(scene.radius) < radius_below
    return np.nonzero(em & sm)[0]
