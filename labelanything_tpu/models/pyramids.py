"""Feature-pyramid neck for ResNet/Swin backbones
(reference: label_anything/models/pyramids.py:6-157).

Channels-last: feature pyramids are dicts ``{"stageN": (B, H, W, C)}``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear


def pyramid_sine_position_embedding(
    shape, d_model: int, temperature: float = 20.0
) -> jax.Array:
    """Sine PE over an (unmasked) grid (reference: pyramids.py:6-41).
    Returns (1, H, W, d_model)."""
    h, w = shape
    embedding_dim = d_model // 2
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / embedding_dim)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)[None]


class PyramidNeck(nn.Module):
    """Project multi-scale feature maps to d_model, add sine+level PE,
    upsample to the finest level and fuse with a 1x1 conv
    (reference: pyramids.py:44-157)."""

    intermediate_channel_sizes: Sequence[int]
    feature_levels: Sequence[str] = ("stage2", "stage3", "stage4")
    d_model: int = 512
    positional_embedding_temperature: float = 20.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature_pyramid: Dict[str, jax.Array]) -> jax.Array:
        levels = [feature_pyramid[k] for k in self.feature_levels
                  if k in feature_pyramid]
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (len(levels), self.d_model))

        projected: List[jax.Array] = []
        for i, fm in enumerate(levels):
            x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}")(fm)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_gn_{i}")(x)
            pos = pyramid_sine_position_embedding(
                x.shape[1:3], self.d_model,
                self.positional_embedding_temperature).astype(x.dtype)
            x = x + pos + level_embed[i][None, None, None]
            projected.append(x)

        target = projected[0].shape[1:3]
        for i in range(1, len(projected)):
            projected[i] = resize_bilinear(projected[i], target,
                                           spatial_axes=(1, 2))
        fused = jnp.concatenate(projected, axis=-1)
        return nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                       name="final_conv")(fused)


class PyramidLamNeck(nn.Module):
    """``is_pyramids`` neck of the base Lam: PyramidNeck followed by a
    channel LayerNorm (reference: build_lam.py:173-178
    ``nn.Sequential(PyramidNeck(...), LayerNorm2d(embed_dim))``). Consumes
    a per-image feature-pyramid dict and emits one fused (B, H, W, d) map
    at the finest level's resolution."""

    intermediate_channel_sizes: Sequence[int]
    d_model: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature_pyramid: Dict[str, jax.Array]) -> jax.Array:
        from .common import LayerNorm2d

        x = PyramidNeck(
            intermediate_channel_sizes=tuple(self.intermediate_channel_sizes),
            d_model=self.d_model, dtype=self.dtype, name="pyramid",
        )(feature_pyramid)
        return LayerNorm2d(self.d_model, dtype=self.dtype, name="ln")(x)
