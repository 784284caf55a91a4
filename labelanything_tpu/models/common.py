"""Shared neural building blocks (reference: label_anything/models/common.py).

All modules are flax.linen, channels-last, and dtype-parametric: parameters
live in fp32, compute can be bf16 (``dtype`` attribute) so the MXU runs at
full rate.

Masking semantics
-----------------
The reference ``Attention.forward`` accepts ``key_mask``/``attn_mask`` but its
score-masking is a no-op as written (reference: models/common.py:118-140 —
``score_mask`` is built from ``torch.zeros_like`` and the mask contents are
never OR-ed in), so the released checkpoints were effectively trained without
attention masking. We therefore expose ``apply_masks``:

* ``apply_masks=False`` (default) reproduces the reference computation
  bit-for-bit (masks ignored inside attention; validity is still honoured by
  downstream masked pooling).
* ``apply_masks=True`` applies the documented semantics (-inf scores at
  masked keys), recommended for from-scratch TPU training.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention, mask_to_bias

SAM_EMBED_DIM = 256


class MLPBlock(nn.Module):
    """Two-layer MLP (reference: models/common.py:19-37)."""

    embedding_dim: int
    mlp_dim: int
    act: Callable = nn.gelu
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = self.act(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="lin2")(x)


class LayerNorm2d(nn.Module):
    """Channel layer-norm for spatial maps (reference: models/common.py:42-55).

    Operates on channels-last (..., H, W, C) inputs; normalizes the channel
    axis only, matching the reference's NCHW dim-1 normalization.
    """

    num_channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        xf = (xf - u) * jax.lax.rsqrt(s + self.eps)
        return (weight * xf + bias).astype(self.dtype)


class Attention(nn.Module):
    """Multi-head attention with projection-width downsampling
    (reference: models/common.py:58-147).

    ``downsample_rate`` shrinks the internal q/k/v width to
    ``embedding_dim // downsample_rate`` — the SAM trick that keeps decoder
    cross-attention cheap.
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        key_mask: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        internal_dim = self.embedding_dim // self.downsample_rate
        assert internal_dim % self.num_heads == 0, "num_heads must divide internal dim"
        head_dim = internal_dim // self.num_heads

        qp = nn.Dense(internal_dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal_dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal_dim, dtype=self.dtype, name="v_proj")(v)

        def split_heads(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qp, kp, vp = split_heads(qp), split_heads(kp), split_heads(vp)

        bias = None
        if self.apply_masks:
            if key_mask is not None:
                # (B, K) validity -> broadcast over heads and queries
                bias = mask_to_bias(key_mask[:, None, None, :].astype(bool))
            if attn_mask is not None:
                am = mask_to_bias(attn_mask.astype(bool))
                bias = am if bias is None else bias + am

        out = dot_product_attention(qp, kp, vp, bias=bias)
        if self.dropout > 0.0:
            # The reference drops attention *probabilities*; dropping the
            # attention output is the streaming-kernel-compatible equivalent
            # used here (disabled by default in every released config).
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)

        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class AttentionMLPBlock(nn.Module):
    """Post-norm attention + MLP block (reference: models/common.py:151-184).

    Note the reference applies the *same* LayerNorm instance twice
    (``self.norm`` is reused); we reproduce that parameter sharing.
    """

    embed_dim: int
    downsample_rate: int
    mlp_dim: int
    num_heads: int
    act: Callable = nn.gelu
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: Optional[jax.Array] = None,
        v: Optional[jax.Array] = None,
        key_mask: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        if k is None:
            k = q
        if v is None:
            v = q
        # torch nn.LayerNorm default eps (the flax default is 1e-6)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        attn = Attention(
            embedding_dim=self.embed_dim,
            num_heads=self.num_heads,
            downsample_rate=self.downsample_rate,
            dropout=self.dropout,
            apply_masks=self.apply_masks,
            dtype=self.dtype,
            name="attn",
        )
        mlp = MLPBlock(
            embedding_dim=self.embed_dim,
            mlp_dim=self.mlp_dim,
            act=self.act,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )
        attn_out = norm(
            attn(q, k, v, key_mask, attn_mask, deterministic=deterministic) + q
        )
        return norm(mlp(attn_out, deterministic=deterministic) + attn_out)
