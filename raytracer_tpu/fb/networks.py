"""Forward-Backward representation networks in flax.linen.

Architectural rebuild of the reference's PyTorch modules, re-declared
"exactly as in training" at FB/fb_vs_traditional_complex.py:37-142:

* ``Encoder``       — input proj (Linear+LayerNorm+ReLU+Dropout 0.1),
                      3 residual blocks, single-token 4-head self-attention
                      with residual add, output MLP → 2·z_dim (mean‖log_var).
* ``ForwardModel``  — (z‖action) proj, ``num_layers`` GLU gated blocks,
                      ``num_heads`` Gaussian heads each predicting next-z
                      (mean, log_var) — an ensemble, not MoE (SURVEY §2.5).
* ``BackwardModel`` — (z_t‖z_next) proj, 2 residual blocks, action mean
                      head ``tanh·0.95`` + log_var head.

bfloat16-friendly: widths are MXU-aligned (512/256 multiples of 128 lanes
after batching); the whole per-bounce policy evaluation batches over the
ray wavefront instead of the reference's per-ray forward passes.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .config import FBConfig


class ResidualBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim)(x)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim)(h)
        h = nn.LayerNorm()(h)
        return x + h


class Encoder(nn.Module):
    """Maps a 22-D observation to (mean ‖ log_var) of the z-distribution."""

    z_dim: int = 64
    hidden_dim: int = 512
    num_res_blocks: int = 3
    num_attn_heads: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        for _ in range(self.num_res_blocks):
            x = ResidualBlock(self.hidden_dim)(x)
        # Single-token self-attention: softmax over one key is identity, so
        # this is the v/out projection pair — kept for architectural parity.
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_attn_heads, qkv_features=self.hidden_dim)
        x = x + attn(x[..., None, :], x[..., None, :])[..., 0, :]
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.z_dim * 2)(x)

    def encode_mean(self, x):
        out = self(x)
        mean, _ = jnp.split(out, 2, axis=-1)
        return mean


class ForwardModel(nn.Module):
    """(z, action) → list of per-head (mean, log_var) next-z predictions."""

    z_dim: int = 64
    action_dim: int = 2
    hidden_dim: int = 512
    num_heads: int = 3
    num_layers: int = 2

    @nn.compact
    def __call__(self, z, action) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        x = jnp.concatenate([z, action], axis=-1)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        for _ in range(self.num_layers):
            h = nn.Dense(self.hidden_dim * 2)(x)
            a, b = jnp.split(h, 2, axis=-1)
            x = a * nn.sigmoid(b)                     # GLU
        preds = []
        for _ in range(self.num_heads):
            h = nn.Dense(self.hidden_dim)(x)
            h = nn.relu(h)
            params = nn.Dense(self.z_dim * 2)(h)
            mean, log_var = jnp.split(params, 2, axis=-1)
            preds.append((mean, log_var))
        return preds


class BackwardModel(nn.Module):
    """(z_t, z_next) → (action mean ∈ [-0.95, 0.95]², action log_var)."""

    z_dim: int = 64
    action_dim: int = 2
    hidden_dim: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, z_t, z_next):
        x = jnp.concatenate([z_t, z_next], axis=-1)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        for _ in range(self.num_layers):
            x = ResidualBlock(self.hidden_dim)(x)
        mean = jnp.tanh(nn.Dense(self.action_dim)(x)) * 0.95
        log_var = nn.Dense(self.action_dim)(x)
        return mean, log_var


class SimpleEncoder(nn.Module):
    """The earlier 'simple' FB family, reconstructed from the surviving
    ``fb_model_simple.pth`` tensor shapes (encoder net.0/2/4: 22→128→128→
    2·z_dim): a plain ReLU MLP emitting (mean ‖ log_var)."""

    z_dim: int = 32
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.z_dim * 2)(x)


class SimpleForwardModel(nn.Module):
    """fb_model_simple.pth: input (z‖action)→hidden, one hidden layer,
    per-head mean-only predictions of next-z."""

    z_dim: int = 32
    hidden_dim: int = 128
    num_heads: int = 2

    @nn.compact
    def __call__(self, z, action):
        x = jnp.concatenate([z, action], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return [nn.Dense(self.z_dim)(x) for _ in range(self.num_heads)]


class SimpleBackwardModel(nn.Module):
    """fb_model_simple.pth: (z_t‖z_next)→hidden→hidden→action."""

    hidden_dim: int = 64
    action_dim: int = 2

    @nn.compact
    def __call__(self, z_t, z_next):
        x = jnp.concatenate([z_t, z_next], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return jnp.tanh(nn.Dense(self.action_dim)(x))


def make_networks(cfg: FBConfig):
    enc = Encoder(z_dim=cfg.z_dim, hidden_dim=cfg.e_hidden_dim)
    fwd = ForwardModel(z_dim=cfg.z_dim, action_dim=cfg.action_dim,
                       hidden_dim=cfg.f_hidden_dim,
                       num_heads=cfg.num_forward_heads,
                       num_layers=cfg.num_layers)
    bwd = BackwardModel(z_dim=cfg.z_dim, action_dim=cfg.action_dim,
                        hidden_dim=cfg.b_hidden_dim, num_layers=2)
    return enc, fwd, bwd
