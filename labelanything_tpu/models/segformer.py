"""SegFormer MiT hierarchical encoder, TPU-native flax.

The reference builds arbitrary HF backbones via ``AutoModel.from_pretrained``
(reference: label_anything/models/build_encoder.py:137-140); its
``COCO_multilevel`` config uses ``nvidia/segformer-b0-finetuned-ade-512-512``
whose ``config.hidden_sizes`` size the multilevel prompt encoders
(reference: build_lam.py:303-330). This is the architecture-equivalent
native implementation (Xie et al., SegFormer, NeurIPS 2021): overlapping
strided-conv patch embeddings, efficient self-attention with spatial
reduction, and Mix-FFN with a 3x3 depthwise conv. Weights are name-mappable
from the HF checkpoint by utils.torch_import.

TPU notes: everything is static-shape; the spatial-reduction attention is a
dense (N, N/sr^2) matmul that XLA tiles onto the MXU, and the depthwise conv
is the only VPU-bound op. Channels-last throughout.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

MIT_B0_STAGE_DIMS = {"stage1": 32, "stage2": 64, "stage3": 160, "stage4": 256}
MIT_STAGE_STRIDES = {"stage1": 4, "stage2": 8, "stage3": 16, "stage4": 32}


class OverlapPatchEmbed(nn.Module):
    """Strided conv with overlap (k7s4 for stage 1, k3s2 after) + LayerNorm."""

    dim: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel // 2
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                    name="proj")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class EfficientAttention(nn.Module):
    """Self-attention whose k/v run on a sr x sr strided-conv-reduced map —
    the (N, N) score matrix becomes (N, N/sr^2), MXU-friendly at stage-1
    token counts."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        dh = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, dh)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="sr_norm")(kv_in)
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, -1, 2, self.num_heads, dh)
        k, v = kv[:, :, 0], kv[:, :, 1]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(
            self.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """Dense -> 3x3 depthwise conv (positional mixing) -> GELU -> Dense."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.gelu(x, approximate=False)  # HF uses exact-erf GELU
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + EfficientAttention(
            self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype,
            name="attn")(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                      name="norm1")(x))
        x = x + MixFFN(self.dim, self.dim * self.mlp_ratio, dtype=self.dtype,
                       name="mlp")(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                                name="norm2")(x))
        return x


class MixVisionTransformer(nn.Module):
    """MiT backbone emitting AutoBackbone-style ``{"stageN": (B, h, w, C)}``
    channels-last stage maps (all four stages, matching the reference's use
    of ``config.hidden_sizes``, build_lam.py:326-330)."""

    out_features: Sequence[str] = ("stage1", "stage2", "stage3", "stage4")
    embed_dims: Sequence[int] = (32, 64, 160, 256)       # b0
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 output_hidden_states: bool = True) -> Dict[str, jax.Array]:
        out = {}
        for i, (dim, depth, heads, sr) in enumerate(zip(
                self.embed_dims, self.depths, self.num_heads, self.sr_ratios)):
            x = OverlapPatchEmbed(
                dim, kernel=7 if i == 0 else 3, stride=4 if i == 0 else 2,
                dtype=self.dtype, name=f"patch_embed{i + 1}")(x)
            for j in range(depth):
                x = MiTBlock(dim, heads, sr, self.mlp_ratio, dtype=self.dtype,
                             name=f"block{i + 1}_{j}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{i + 1}")(x)
            stage = f"stage{i + 1}"
            if stage in self.out_features:
                out[stage] = x
        return out


def build_mit_b0(out_features=("stage1", "stage2", "stage3", "stage4"),
                 **kwargs):
    """nvidia/segformer-b0 equivalent (reference: build_encoder.py:137-140
    AutoModel fallback; hidden_sizes (32, 64, 160, 256))."""
    kwargs.pop("image_size", None)  # fully convolutional, no fixed size
    return MixVisionTransformer(out_features=tuple(out_features), **kwargs)
