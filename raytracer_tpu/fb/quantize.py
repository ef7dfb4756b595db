"""Int8 quantized inference for the full ``TrainedFBAgent`` policy.

STATUS.md gap 3: the full 512-wide agent fused into the level kernel is
FLOP-bound on the guide matmuls (the distilled student is the deployment
answer, but the full agent is what research iterations render with).  TPU
MXUs run int8×int8→int32 at twice the bf16 rate, so weight+activation int8
is the remaining lever on the full-agent path.

Scheme (standard dynamic post-training quantization):

* weights  — symmetric per-output-channel int8 (``scale = max|w|/127``),
  quantized once at guide construction;
* activations — symmetric per-row (per-ray) dynamic int8, computed inside
  the kernel from the live batch;
* matmuls  — ``lax.dot_general(int8, int8) -> int32``, rescaled by the
  outer product of the two scales; LayerNorm / residual adds / tanh stay
  f32.

The single-token self-attention block reduces exactly to
``x + out_proj(v_proj(x))`` (softmax over one key is 1 — see
fb/networks.py), so the quantized encoder runs two 512×512 int8 matmuls
where flax computes four plus a softmax.

Usage: ``TrainedFBAgent.as_guide_fn(dtype="int8")`` — same ``_fused_spec``
contract as the bf16 path (params ride as jit arguments; the apply object
is a hashable static argument), so stepwise tracing fuses it into the
level kernel unchanged.

**Measured result (TPU v5 lite, 2026-08-18): NEGATIVE.**  Standalone
guide forward over a 160k-ray wavefront: f32 42.7 ms, bf16 33.3 ms,
int8 **49.7 ms**; full guided chandelier frame (200×100 @ 8 spp,
8 bounces): bf16 126.8 ms vs int8 251.7 ms.  XLA's TPU lowering does not
map these int8 ``dot_general``s onto the double-rate MXU path at these
shapes — the int32 accumulation plus the per-row dynamic quantize/
dequantize (VPU work proportional to activations) costs more than the
bf16 matmuls it replaces.  The module stays as an equality-tested
exploration (tests/test_quantize.py pins action parity within 0.15 on a
tanh-bounded output); bf16 remains the full-agent setting and the
distilled student (fb/distill.py) remains the deployment answer.

Reference provenance: the policy being quantized is the rebuild of
``TrainedFBAgent.choose_direction`` (FB/fb_vs_traditional_complex.py:
147-256); quantization itself has no reference counterpart (the reference
runs f32 torch on CPU).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Quantization (host side, once per guide)
# --------------------------------------------------------------------------

def quantize_kernel(kernel: np.ndarray):
    """Symmetric per-output-channel int8: returns (int8[in,out], f32[out])."""
    k = np.asarray(kernel, np.float32)
    scale = np.max(np.abs(k), axis=0) / 127.0
    scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
    q = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    return q, scale


def _qdense_params(p):
    q, s = quantize_kernel(np.asarray(p["kernel"]))
    return {"qkernel": jnp.asarray(q), "wscale": jnp.asarray(s),
            "bias": jnp.asarray(p["bias"], jnp.float32)}


def _ln_params(p):
    return {"scale": jnp.asarray(p["scale"], jnp.float32),
            "bias": jnp.asarray(p["bias"], jnp.float32)}


def _resblock_params(p):
    return {"Dense_0": _qdense_params(p["Dense_0"]),
            "LayerNorm_0": _ln_params(p["LayerNorm_0"]),
            "Dense_1": _qdense_params(p["Dense_1"]),
            "LayerNorm_1": _ln_params(p["LayerNorm_1"])}


def quantize_agent_params(params: dict, proto, num_res_blocks: int = 3):
    """Quantize the inference path of the FB policy: encoder (without the
    unused q/k attention projections and log-var half) + backward mean
    head.  ``params`` is the TrainedFBAgent param dict
    ({"encoder", "backward"}); returns the pytree consumed by
    ``Int8AgentApply``."""
    e = params["encoder"]
    attn = e["MultiHeadDotProductAttention_0"]
    # v kernel (in, heads, head_dim) -> (in, heads*head_dim); out kernel
    # (heads, head_dim, out) -> (heads*head_dim, out).
    vk = np.asarray(attn["value"]["kernel"])
    ok = np.asarray(attn["out"]["kernel"])
    d_in, n_h, d_h = vk.shape
    v_flat = {"kernel": vk.reshape(d_in, n_h * d_h),
              "bias": np.asarray(attn["value"]["bias"]).reshape(n_h * d_h)}
    o_flat = {"kernel": ok.reshape(n_h * d_h, -1),
              "bias": np.asarray(attn["out"]["bias"])}
    qe = {
        "Dense_0": _qdense_params(e["Dense_0"]),
        "LayerNorm_0": _ln_params(e["LayerNorm_0"]),
        "attn_v": _qdense_params(v_flat),
        "attn_out": _qdense_params(o_flat),
        "Dense_1": _qdense_params(e["Dense_1"]),
        "Dense_2": _qdense_params(e["Dense_2"]),
    }
    for i in range(num_res_blocks):
        qe[f"ResidualBlock_{i}"] = _resblock_params(e[f"ResidualBlock_{i}"])
    b = params["backward"]
    qb = {
        "Dense_0": _qdense_params(b["Dense_0"]),
        "LayerNorm_0": _ln_params(b["LayerNorm_0"]),
        "ResidualBlock_0": _resblock_params(b["ResidualBlock_0"]),
        "ResidualBlock_1": _resblock_params(b["ResidualBlock_1"]),
        "Dense_1": _qdense_params(b["Dense_1"]),   # action mean head
    }
    return {"encoder": qe, "backward": qb,
            "proto": jnp.asarray(proto, jnp.float32)}


# --------------------------------------------------------------------------
# Quantized forward (traced)
# --------------------------------------------------------------------------

def _qdense(p, x):
    """Dynamic per-row int8 activation quant + int8 matmul + rescale."""
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    sx = jnp.where(sx > 0, sx, 1.0)
    qx = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(qx, p["qkernel"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * p["wscale"]) + p["bias"]


def _ln(p, x, eps: float = 1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _resblock(p, x):
    h = _qdense(p["Dense_0"], x)
    h = jax.nn.relu(_ln(p["LayerNorm_0"], h))
    h = _qdense(p["Dense_1"], h)
    return x + _ln(p["LayerNorm_1"], h)


@dataclasses.dataclass(frozen=True)
class Int8AgentApply:
    """``(qparams, obs, dtype) -> action-mean`` — the int8 twin of
    fb.inference._AgentApply; hashable, so it rides as a static jit
    argument of the fused level kernel.  ``dtype`` is ignored (the int8
    path fixes its own compute types)."""

    z_dim: int
    num_res_blocks: int = 3

    def __call__(self, qparams, obs, dtype=None):
        e = qparams["encoder"]
        x = _qdense(e["Dense_0"], obs.astype(jnp.float32))
        x = jax.nn.relu(_ln(e["LayerNorm_0"], x))
        for i in range(self.num_res_blocks):
            x = _resblock(e[f"ResidualBlock_{i}"], x)
        # single-token attention == x + out(v(x))
        x = x + _qdense(e["attn_out"], _qdense(e["attn_v"], x))
        x = jax.nn.relu(_qdense(e["Dense_1"], x))
        z = _qdense(e["Dense_2"], x)[..., : self.z_dim]

        b = qparams["backward"]
        proto = jnp.broadcast_to(qparams["proto"], z.shape)
        h = jnp.concatenate([z, proto], axis=-1)
        h = jax.nn.relu(_ln(b["LayerNorm_0"], _qdense(b["Dense_0"], h)))
        h = _resblock(b["ResidualBlock_0"], h)
        h = _resblock(b["ResidualBlock_1"], h)
        return jnp.tanh(_qdense(b["Dense_1"], h)) * 0.95


def make_int8_guide(agent):
    """Build an ``obs[R,22] -> action[R,2]`` guide from a TrainedFBAgent
    with int8 weights/activations; same ``_no_rejit``/``_fused_spec``
    contract as ``TrainedFBAgent.as_guide_fn``."""
    qparams = quantize_agent_params(agent.params, agent.light_prototype)
    apply = Int8AgentApply(z_dim=agent.config.z_dim)

    @jax.jit
    def _forward(qp, obs):
        return apply(qp, obs)

    def guide(obs):
        return _forward(qparams, obs)

    guide._no_rejit = True
    guide._fused_spec = (qparams, None, apply)
    return guide
