"""Import reference PyTorch FB checkpoints into flax parameter trees.

Handles both network families:

* the "Enhanced" family re-declared at FB/fb_vs_traditional_complex.py:37-142
  (checkpoint schema: top-level ``fb_learner_state`` →
  ``{encoder, forward_model, backward_model}`` torch state dicts), and
* the earlier "simple" family surviving in ``fb_model_simple.pth``
  (flat ``{encoder, forward_model, backward_model, config, train_steps}``).

Conversions: torch ``Linear.weight`` is ``[out, in]`` → flax Dense kernel is
its transpose; ``LayerNorm.{weight,bias}`` → ``{scale,bias}``; torch
``MultiheadAttention.in_proj_weight`` ``[3H, H]`` splits into q/k/v kernels
reshaped to flax's ``[H, heads, head_dim]``.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _dense(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def _layernorm(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _attention(sd, name, num_heads):
    w_in = np.asarray(sd[f"{name}.in_proj_weight"])       # [3H, H]
    b_in = np.asarray(sd[f"{name}.in_proj_bias"])         # [3H]
    H = w_in.shape[1]
    hd = H // num_heads
    out = {}
    for i, part in enumerate(("query", "key", "value")):
        w = w_in[i * H:(i + 1) * H]                       # [H, H] (out, in)
        b = b_in[i * H:(i + 1) * H]
        out[part] = {"kernel": w.T.reshape(H, num_heads, hd),
                     "bias": b.reshape(num_heads, hd)}
    wo = np.asarray(sd[f"{name}.out_proj.weight"])        # [H, H] (out, in)
    bo = np.asarray(sd[f"{name}.out_proj.bias"])
    out["out"] = {"kernel": wo.T.reshape(num_heads, hd, H), "bias": bo}
    return out


def _res_block(sd, prefix):
    """Reference ResidualBlock: net = [Linear, LayerNorm, ReLU, Linear,
    LayerNorm] → flax ResidualBlock{Dense_0, LayerNorm_0, Dense_1,
    LayerNorm_1}."""
    return {"Dense_0": _dense(sd, f"{prefix}.net.0"),
            "LayerNorm_0": _layernorm(sd, f"{prefix}.net.1"),
            "Dense_1": _dense(sd, f"{prefix}.net.3"),
            "LayerNorm_1": _layernorm(sd, f"{prefix}.net.4")}


def import_enhanced_encoder(sd: Dict, num_attn_heads: int = 4) -> Dict:
    """Torch EnhancedEncoder state dict → flax Encoder params."""
    p = {
        "Dense_0": _dense(sd, "input_proj.0"),
        "LayerNorm_0": _layernorm(sd, "input_proj.1"),
        "MultiHeadDotProductAttention_0":
            _attention(sd, "attention", num_attn_heads),
        "Dense_1": _dense(sd, "output.0"),
        "Dense_2": _dense(sd, "output.2"),
    }
    for i in range(3):
        p[f"ResidualBlock_{i}"] = _res_block(sd, f"res_blocks.{i}")
    return p


def import_enhanced_forward(sd: Dict, num_heads: int, num_layers: int) -> Dict:
    """Torch EnhancedForwardModel → flax ForwardModel params.
    Dense order in flax __call__: input, per-layer GLU Dense, then per-head
    (hidden Dense, out Dense)."""
    p = {"Dense_0": _dense(sd, "input_net.0"),
         "LayerNorm_0": _layernorm(sd, "input_net.1")}
    d = 1
    for i in range(num_layers):
        p[f"Dense_{d}"] = _dense(sd, f"gated_blocks.{i}.0")
        d += 1
    for h in range(num_heads):
        p[f"Dense_{d}"] = _dense(sd, f"heads.{h}.0")
        d += 1
        p[f"Dense_{d}"] = _dense(sd, f"heads.{h}.2")
        d += 1
    return p


def import_enhanced_backward(sd: Dict, num_layers: int = 2) -> Dict:
    p = {"Dense_0": _dense(sd, "input_net.0"),
         "LayerNorm_0": _layernorm(sd, "input_net.1"),
         "Dense_1": _dense(sd, "mean_head"),
         "Dense_2": _dense(sd, "log_var_head")}
    for i in range(num_layers):
        p[f"ResidualBlock_{i}"] = _res_block(sd, f"res_blocks.{i}")
    return p


def import_simple_encoder(sd: Dict) -> Dict:
    return {"Dense_0": _dense(sd, "net.0"),
            "Dense_1": _dense(sd, "net.2"),
            "Dense_2": _dense(sd, "net.4")}


def import_simple_forward(sd: Dict, num_heads: int = 2) -> Dict:
    p = {"Dense_0": _dense(sd, "input_layer"),
         "Dense_1": _dense(sd, "hidden_layers.0")}
    for h in range(num_heads):
        p[f"Dense_{2 + h}"] = _dense(sd, f"heads.{h}")
    return p


def import_simple_backward(sd: Dict) -> Dict:
    return {"Dense_0": _dense(sd, "input_layer"),
            "Dense_1": _dense(sd, "hidden_layers.0"),
            "Dense_2": _dense(sd, "output_layer")}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference ``.pth``, tolerating pickled classes from the
    missing ``fb_ray_tracing`` module (stubbed)."""
    import sys
    import types

    import torch

    if "fb_ray_tracing" not in sys.modules:
        stub = types.ModuleType("fb_ray_tracing")
        stub.__getattr__ = lambda name: type(name, (), {})
        sys.modules["fb_ray_tracing"] = stub
    ck = torch.load(path, map_location="cpu", weights_only=False)
    if "fb_learner_state" in ck:
        ck = ck["fb_learner_state"]
    return ck


def import_fb_learner_state(ck: Dict, config) -> Dict:
    """``fb_learner_state`` schema → dict of flax param trees for the
    Enhanced family (encoder/forward/backward)."""
    return {
        "encoder": import_enhanced_encoder(ck["encoder"]),
        "forward": import_enhanced_forward(ck["forward_model"],
                                           config.num_forward_heads,
                                           config.num_layers),
        "backward": import_enhanced_backward(ck["backward_model"]),
    }
