"""Fusion transformers (reference: label_anything/models/transformer.py).

Token tensors are (B, N, D); image tensors arrive channels-last (B, H, W, D)
and are flattened to (B, HW, D) at the boundary. ``query_mask`` / ``key_mask``
arguments follow the reference call signatures; whether they actually mask is
governed by ``apply_masks`` (see models/common.py docstring for the reference
masking no-op).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Attention, AttentionMLPBlock, MLPBlock


def _flatten_image(x: jax.Array) -> jax.Array:
    """(B, H, W, D) -> (B, HW, D)."""
    b, h, w, d = x.shape
    return x.reshape(b, h * w, d)


class _DenseP(nn.Module):
    """Dense-compatible parameters ({kernel, bias}, identical names and
    initializers) WITHOUT applying the layer — the fused TwoWay kernel
    (ops/fused_twoway.py) consumes the raw arrays while the parameter tree
    stays byte-compatible with the unfused nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNP(nn.Module):
    """LayerNorm-compatible parameters ({scale, bias})."""

    @nn.compact
    def __call__(self, dim: int):
        return (self.param("scale", nn.initializers.ones, (dim,)),
                self.param("bias", nn.initializers.zeros, (dim,)))


class _AttnP(nn.Module):
    """Attention-compatible parameter subtree (q/k/v/out projections)."""

    embedding_dim: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self):
        internal = self.embedding_dim // self.downsample_rate
        return (*_DenseP(internal, name="q_proj")(self.embedding_dim),
                *_DenseP(internal, name="k_proj")(self.embedding_dim),
                *_DenseP(internal, name="v_proj")(self.embedding_dim),
                *_DenseP(self.embedding_dim, name="out_proj")(internal))


class _MLPP(nn.Module):
    """MLPBlock-compatible parameter subtree (lin1/lin2)."""

    embedding_dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        return (*_DenseP(self.mlp_dim, name="lin1")(self.embedding_dim),
                *_DenseP(self.embedding_dim, name="lin2")(self.mlp_dim))


class _TwoWayLayerP(nn.Module):
    """TwoWayAttentionBlock-compatible parameter subtree, emitted in the
    exact order ops/fused_twoway._twoway_math consumes."""

    embedding_dim: int
    mlp_dim: int
    attention_downsample_rate: int

    @nn.compact
    def __call__(self):
        d = self.embedding_dim
        return (
            *_AttnP(d, 1, name="self_attn")(),
            *_LNP(name="norm1")(d),
            *_AttnP(d, self.attention_downsample_rate,
                    name="cross_attn_token_to_image")(),
            *_LNP(name="norm2")(d),
            *_MLPP(d, self.mlp_dim, name="mlp")(),
            *_LNP(name="norm3")(d),
            *_AttnP(d, self.attention_downsample_rate,
                    name="cross_attn_image_to_token")(),
            *_LNP(name="norm4")(d),
        )


class IdentityTransformer(nn.Module):
    """Pass-through fusion (reference: transformer.py:17-23)."""

    @nn.compact
    def __call__(self, image_embedding, image_pe, token_embedding, query_mask=None,
                 *, deterministic: bool = True):
        return token_embedding, _flatten_image(image_embedding)


class OneWayAttentionBlock(nn.Module):
    """Cross-attention block: queries attend to keys
    (reference: transformer.py:106-155)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_mask=None, *, deterministic=True):
        q = queries + query_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dropout=self.dropout, apply_masks=self.apply_masks, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(q, keys, keys, key_mask=key_mask, deterministic=deterministic)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        mlp_out = MLPBlock(
            self.embedding_dim, self.mlp_dim, act=self.activation,
            dropout=self.dropout, dtype=self.dtype, name="mlp",
        )(queries, deterministic=deterministic)
        queries = queries + mlp_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)
        return queries


class OneWayTransformer(nn.Module):
    """Image tokens attend to class tokens (reference: transformer.py:26-103)."""

    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, token_embedding, query_mask=None,
                 *, deterministic: bool = True):
        queries = _flatten_image(image_embedding)
        image_pe = _flatten_image(image_pe)
        keys = token_embedding
        for i in range(self.depth):
            queries = OneWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                activation=self.activation,
                attention_downsample_rate=self.attention_downsample_rate,
                dropout=self.dropout,
                apply_masks=self.apply_masks,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, image_pe, key_mask=query_mask, deterministic=deterministic)
        return keys, queries


class TwoWayAttentionBlock(nn.Module):
    """SAM-style bidirectional block (reference: transformer.py:255-330)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, query_mask=None,
                 *, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        self_attn = Attention(
            self.embedding_dim, self.num_heads, dropout=self.dropout,
            apply_masks=self.apply_masks, dtype=self.dtype, name="self_attn",
        )
        if self.skip_first_layer_pe:
            queries = self_attn(queries, queries, queries, key_mask=query_mask,
                                deterministic=deterministic)
        else:
            q = queries + query_pe
            queries = queries + self_attn(q, q, queries, deterministic=deterministic)
        queries = ln("norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dropout=self.dropout,
            apply_masks=self.apply_masks, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys, deterministic=deterministic)
        queries = queries + attn_out
        queries = ln("norm2")(queries)

        mlp_out = MLPBlock(
            self.embedding_dim, self.mlp_dim, act=self.activation,
            dropout=self.dropout, dtype=self.dtype, name="mlp",
        )(queries, deterministic=deterministic)
        queries = queries + mlp_out
        queries = ln("norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dropout=self.dropout,
            apply_masks=self.apply_masks, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries, key_mask=query_mask, deterministic=deterministic)
        keys = keys + attn_out
        keys = ln("norm4")(keys)

        return queries, keys


class TwoWayTransformer(nn.Module):
    """Token<->image bidirectional fusion (reference: transformer.py:157-252)."""

    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embedding: jax.Array,   # (B, H, W, D) channels-last
        image_pe: jax.Array,          # (B or 1, H, W, D)
        point_embedding: jax.Array,   # (B, N, D)
        query_mask: Optional[jax.Array] = None,
        *,
        image_shift: Optional[jax.Array] = None,  # (B, D) uniform per-instance
        image_shift_map: Optional[jax.Array] = None,   # (B, H, W, Cm)
        image_shift_proj: Optional[jax.Array] = None,  # (Cm, D)
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """With ``image_shift``, ``image_embedding`` holds B/group SHARED base
        maps and the effective per-instance input is
        ``base[b // group] + image_shift[b]`` (spatially uniform shift) — the
        blockdiag path exploits this exactly (rank-1 linearity); other paths
        expand it eagerly. ``image_shift_map`` + ``image_shift_proj`` add a
        spatially-varying low-rank term ``map @ proj`` (the factored mask
        correction, Cm = mask_in_chans): the blockdiag path streams the
        Cm-channel map and folds ``proj`` into its packed projection."""
        from ..ops.attention import _on_tpu
        from ..ops import fused_twoway as _ft
        from ..ops import twoway_blockdiag as _bd

        keys = _flatten_image(image_embedding)
        queries = point_embedding

        # layout-optimal blockdiag path (ops/twoway_blockdiag.py): legal when
        # attention is effectively unmasked (query_mask absent, or present but
        # a no-op because apply_masks=False — the reference-parity default),
        # dropout is off, and the positional source is shared across instances
        blockdiag = (_bd._ENABLE and (_on_tpu() or _bd._FORCE)
                     and (query_mask is None or not self.apply_masks)
                     and self.dropout == 0.0
                     and image_pe.shape[0] == 1)
        # fused whole-transformer kernel (ops/fused_twoway.py): measured
        # negative result, disabled; kept runnable for tests/the record
        fused = (not blockdiag
                 and _ft._ENABLE and (_on_tpu() or _ft._INTERPRET)
                 and query_mask is None and self.dropout == 0.0
                 and image_pe.shape[0] == 1)
        if image_shift is not None and not blockdiag:
            if point_embedding.shape[0] % image_embedding.shape[0] != 0:
                raise ValueError(
                    f"image_shift expansion needs the token-instance count "
                    f"({point_embedding.shape[0]}) divisible by the base-"
                    f"image count ({image_embedding.shape[0]})")
            group = point_embedding.shape[0] // image_embedding.shape[0]
            image_embedding = (
                jnp.repeat(image_embedding, group, axis=0)
                + image_shift[:, None, None, :].astype(image_embedding.dtype))
            if image_shift_map is not None:
                image_embedding = image_embedding + (
                    image_shift_map @ image_shift_proj
                ).astype(image_embedding.dtype)
            keys = _flatten_image(image_embedding)
            image_shift = image_shift_map = image_shift_proj = None
        if blockdiag:
            params = []
            for i in range(self.depth):
                params.extend(_TwoWayLayerP(
                    self.embedding_dim, self.mlp_dim,
                    self.attention_downsample_rate,
                    name=f"layers_{i}")())
            params.extend(_AttnP(
                self.embedding_dim, self.attention_downsample_rate,
                name="final_attn_token_to_image")())
            params.extend(_LNP(name="norm_final_attn")(self.embedding_dim))
            key_pe = _flatten_image(image_pe)[0]
            shift_map = (None if image_shift_map is None
                         else _flatten_image(image_shift_map))
            return _bd.twoway_blockdiag(
                keys, queries, key_pe, tuple(params), self.depth,
                self.num_heads, self.attention_downsample_rate,
                self.activation, self.dtype, key_shift=image_shift,
                key_shift_map=shift_map, key_shift_proj=image_shift_proj)
        if fused:
            params = []
            for i in range(self.depth):
                params.extend(_TwoWayLayerP(
                    self.embedding_dim, self.mlp_dim,
                    self.attention_downsample_rate,
                    name=f"layers_{i}")())
            params.extend(_AttnP(
                self.embedding_dim, self.attention_downsample_rate,
                name="final_attn_token_to_image")())
            params.extend(_LNP(name="norm_final_attn")(self.embedding_dim))
            key_pe = _flatten_image(image_pe)[0].astype(self.dtype)
            return _ft.fused_twoway_transformer(
                keys.astype(self.dtype), queries.astype(self.dtype),
                key_pe, tuple(params), self.depth, self.num_heads,
                self.activation)

        image_pe = _flatten_image(jnp.broadcast_to(image_pe, image_embedding.shape))

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                activation=self.activation,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dropout=self.dropout,
                apply_masks=self.apply_masks,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe, query_mask=query_mask,
              deterministic=deterministic)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dropout=self.dropout,
            apply_masks=self.apply_masks, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys, deterministic=deterministic)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class AffinityBlock(nn.Module):
    """DCAMA-style mask-valued attention block (reference: transformer.py:332-364)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_features, support_features, support_masks, image_pe,
                 attn_mask=None, *, deterministic: bool = True):
        bc, hw, _ = image_features.shape
        pe = _flatten_image(image_pe)  # (1, HW, D)
        shots = support_features.shape[1] // hw
        support_pe = jnp.tile(pe, (1, shots, 1))
        queries = image_features + pe
        keys = support_features + support_pe
        out = AttentionMLPBlock(
            embed_dim=self.embedding_dim,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            act=self.activation,
            downsample_rate=self.attention_downsample_rate,
            dropout=self.dropout,
            apply_masks=self.apply_masks,
            dtype=self.dtype,
            name="attention",
        )(queries, keys, support_masks, attn_mask=attn_mask, deterministic=deterministic)
        return out + image_features


class AffinityTransformer(nn.Module):
    """Stack of AffinityBlocks (reference: transformer.py:362-403)."""

    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    activation: Callable = nn.relu
    attention_downsample_rate: int = 2
    dropout: float = 0.0
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, support_features, support_masks, image_pe,
                 flag_examples, *, deterministic: bool = True):
        hw = image_embedding.shape[1]
        # (B, M, C) flags -> per-(b,c) key mask over (M * HW) support tokens
        b, m, c = flag_examples.shape
        attn_mask = jnp.repeat(
            flag_examples.transpose(0, 2, 1).reshape(b * c, m), hw, axis=-1
        )
        attn_mask = jnp.broadcast_to(
            attn_mask[:, None, None, :], (b * c, self.num_heads, hw, m * hw)
        )
        for i in range(self.depth):
            image_embedding = AffinityBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                activation=self.activation,
                attention_downsample_rate=self.attention_downsample_rate,
                dropout=self.dropout,
                apply_masks=self.apply_masks,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(image_embedding, support_features, support_masks, image_pe,
              attn_mask=attn_mask, deterministic=deterministic)
        return image_embedding
