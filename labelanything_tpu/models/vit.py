"""Standard (HF-style) ViT backbone for MAE / ImageNet-21k / DINO encoders.

The reference reaches these backbones through ``transformers.ViTModel`` with
``interpolate_pos_encoding=True`` and drops the CLS token, reshaping tokens to
a spatial map (reference: label_anything/models/build_encoder.py:43-101).
This is the TPU-native equivalent: a plain pre-LN ViT whose weights can be
name-mapped from the HF checkpoints.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.resize import resize_bilinear
from .common import MLPBlock


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm1")(x)
        b, n, d = y.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(y)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(y)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(y)

        def split(t):
            return t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        x = x + out
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(self.dim, int(self.dim * self.mlp_ratio), act=self.act,
                     dtype=self.dtype, name="mlp")(y)
        return x + y


class StandardViT(nn.Module):
    """Pre-LN ViT with CLS token and interpolated position embeddings.

    ``__call__`` returns the channels-last spatial feature map (B, H/p, W/p, D)
    with the CLS token dropped, matching ``ViTModelWrapper.forward``
    (reference: build_encoder.py:84-101).
    """

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pretrain_grid: int = 14  # 224px pretraining grid for pos-emb interpolation
    layernorm_eps: float = 1e-12
    final_layernorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.embed_dim),
        )
        cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            patch_pe = patch_pe.reshape(
                1, self.pretrain_grid, self.pretrain_grid, self.embed_dim
            )
            # HF interpolate_pos_encoding uses bicubic
            patch_pe = jax.image.resize(
                patch_pe, (1, gh, gw, self.embed_dim), method="cubic",
                antialias=False)
            patch_pe = patch_pe.reshape(1, gh * gw, self.embed_dim)

        cls = jnp.broadcast_to(cls_token + cls_pe, (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x + patch_pe], axis=1)

        for i in range(self.depth):
            x = EncoderBlock(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x)
        if self.final_layernorm:
            x = nn.LayerNorm(epsilon=self.layernorm_eps, dtype=self.dtype,
                             name="norm")(x)
        return x[:, 1:].reshape(b, gh, gw, self.embed_dim)
