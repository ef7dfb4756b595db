"""Checkpointing.

Native format: a single ``.npz`` holding the flattened FB param pytree plus
config/metadata — fast, dependency-free, and readable anywhere.  (Orbax is
available in the image and used by the RL agents for optimizer state; the
FB format stays npz for parity with the reference's single-file ``.pth``
checkpoints, schema described at FB/fb_vs_traditional_complex.py:161-179.)
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                 for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat, prefix=""):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                 for p in path)
        arr = jnp.asarray(flat[key])
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {key}: checkpoint "
                             f"{arr.shape} vs model {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_fb(path, params, config, **extra):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for name in ("encoder", "forward", "backward", "target_encoder"):
        flat.update(_flatten(getattr(params, name), prefix=f"{name}::"))
    meta = {"config": config.to_dict(),
            "noise_scale": float(extra.get("noise_scale", 0.0)),
            "updates": int(extra.get("updates", 0))}
    lm = extra.get("light_memory") or []
    np.savez(path, __meta__=json.dumps(meta),
             __light_memory__=(np.stack(lm) if lm
                               else np.zeros((0, config.z_dim), np.float32)),
             **flat)


def load_fb(path, config) -> Tuple[object, dict, dict]:
    """Load into a freshly-initialised param template for ``config``."""
    from ..fb.agent import FBParams, FBResearchAgent

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    tmp = FBResearchAgent(config, seed=0)
    parts = {}
    for name in ("encoder", "forward", "backward", "target_encoder"):
        flat = {k[len(name) + 2:]: data[k] for k in data.files
                if k.startswith(name + "::")}
        if not flat:
            # Slim inference-only checkpoints carry encoder+backward only;
            # missing parts keep their fresh initialisation.
            parts[name] = getattr(tmp.params, name)
            continue
        parts[name] = _unflatten_like(getattr(tmp.params, name), flat)
    params = FBParams(**parts)
    lm = [row for row in data["__light_memory__"]]
    extra = {"light_memory": lm, "noise_scale": meta.get("noise_scale"),
             "updates": meta.get("updates")}
    return params, meta.get("config", {}), extra
