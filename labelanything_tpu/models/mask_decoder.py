"""Mask decoders (reference: label_anything/models/mask_decoder.py).

``MaskDecoderLam`` fuses class embeddings with query-image features through a
fusion transformer, upsamples with transposed convs, and classifies every
pixel by a class-embedding · pixel-embedding dot product — one einsum on the
MXU (reference: mask_decoder.py:299-314).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict
from .common import LayerNorm2d

_NEG_INF = float("-inf")


class MLP(nn.Module):
    """Simple relu-MLP head (reference: mask_decoder.py:776-805)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_layers):
            dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoderLam(nn.Module):
    """Prototype-based mask decoder (reference: mask_decoder.py:169-363)."""

    transformer_dim: int
    transformer: nn.Module
    spatial_convs: Optional[int] = None
    activation: Callable = nn.gelu
    segment_example_logits: bool = False
    classification_layer_downsample_rate: int = 8
    conv_upsample_stride: int = 2
    classification_levels: int = 1
    dropout: float = 0.0
    conv_classification: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        td = self.transformer_dim
        ds = self.classification_layer_downsample_rate
        first_ds = ds // 2 if ds > 1 else 1
        self._has_upscaling = self.conv_upsample_stride > 1 or ds > 1
        if self._has_upscaling:
            s = self.conv_upsample_stride
            # transpose_kernel=True matches torch ConvTranspose2d semantics
            # (kernel layout (kh, kw, O, I)) for bit-compatible weight import
            self.up_conv1 = nn.ConvTranspose(
                td // first_ds, (s, s), strides=(s, s), transpose_kernel=True,
                dtype=self.dtype,
            )
            self.up_ln = LayerNorm2d(td // first_ds, dtype=self.dtype)
            self.up_conv2 = nn.ConvTranspose(
                td // ds, (s, s), strides=(s, s), transpose_kernel=True,
                dtype=self.dtype,
            )
            self.class_mlp = MLP(
                hidden_dim=td,
                output_dim=td // ds,
                num_layers=3,
                dropout=self.dropout,
                dtype=self.dtype,
            )
        if self.classification_levels > 1:
            self.level_reducer = nn.Conv(
                1, (3, 3), padding="SAME", dtype=self.dtype
            )
        if self.spatial_convs is not None:
            convs = []
            for i in range(self.spatial_convs):
                convs.append(
                    nn.Conv(td // ds, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"spatial_conv_{i}")
                )
            self.spatial_conv_layers = convs
            self.spatial_conv_norms = [
                LayerNorm2d(td // ds, dtype=self.dtype, name=f"spatial_ln_{i}")
                for i in range(max(self.spatial_convs - 1, 0))
            ]
        if self.conv_classification:
            self.prototype_tconv = [
                nn.ConvTranspose(td // ds, (3, 3), strides=(1, 1), use_bias=False,
                                 transpose_kernel=True, dtype=self.dtype,
                                 name=f"prototype_tconv_{i}")
                for i in range(2)
            ]

    def _get_pe_result(self, pe_result: dict, flag_examples: Optional[jax.Array]):
        if BatchKeys.FLAG_EXAMPLES in pe_result:
            flag_examples = pe_result[BatchKeys.FLAG_EXAMPLES]
        if self.segment_example_logits:
            embs = pe_result[ResultDict.EXAMPLES_CLASS_EMBS]
            b, m, c, d = embs.shape
            class_embeddings = embs.reshape(b, m * c, d)
            embedding_mask = flag_examples.reshape(b, m * c)
        else:
            class_embeddings = pe_result[ResultDict.CLASS_EMBS]
            embedding_mask = (flag_examples.sum(axis=1) > 0).astype(jnp.int32)
        return class_embeddings, flag_examples, embedding_mask

    def _upscale(self, query_embeddings, class_embeddings, *, deterministic=True):
        if not self._has_upscaling:
            return query_embeddings, class_embeddings
        x = self.up_conv1(query_embeddings)
        x = self.activation(self.up_ln(x))
        x = self.up_conv2(x)
        class_embeddings = self.class_mlp(class_embeddings, deterministic=deterministic)
        return x, class_embeddings

    def _apply_spatial_convs(self, x):
        if self.spatial_convs is None:
            return x
        for i, conv in enumerate(self.spatial_conv_layers):
            x = conv(x)
            if i < self.spatial_convs - 1:
                x = self.activation(self.spatial_conv_norms[i](x))
        return x

    def _classify(self, query_embeddings, class_embeddings, flag_examples):
        """query: (B, h, w, D'); class: (B, n_emb, D') -> logits (B, C, h, w)."""
        b, h, w, d = query_embeddings.shape
        if self.conv_classification:
            # dynamic per-sample 5x5-padded conv with prototype kernels
            ce = class_embeddings.reshape(-1, 1, 1, d)
            for tconv in self.prototype_tconv:
                ce = tconv(ce)
            kh, kw = ce.shape[1:3]
            n_emb = class_embeddings.shape[1]
            kernels = ce.reshape(b, n_emb, kh, kw, d)

            def conv_one(q, k):
                # q: (h, w, d); k: (n, kh, kw, d)
                return jax.lax.conv_general_dilated(
                    q[None],
                    k.transpose(1, 2, 3, 0),  # HWIO
                    window_strides=(1, 1),
                    padding=[(2, 2), (2, 2)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )[0]

            seg = jax.vmap(conv_one)(query_embeddings, kernels)  # (B, h, w, n)
            seg = seg.transpose(0, 3, 1, 2)
        else:
            seg = jnp.einsum(
                "bnd,bhwd->bnhw", class_embeddings, query_embeddings,
                preferred_element_type=jnp.float32,
            )
        if self.segment_example_logits:
            b_, n_emb = seg.shape[:2]
            c = flag_examples.shape[2]
            m = n_emb // c
            seg = seg.reshape(b_, m, c, h, w)
            valid = flag_examples[..., None, None].astype(bool)
            seg = jnp.where(valid, seg, _NEG_INF)
            seg = seg.max(axis=1)
        return seg

    def __call__(
        self,
        query_embeddings: jax.Array,        # (B, h, w, D) channels-last
        support_embeddings: Optional[jax.Array],
        image_pe: jax.Array,                # (1, h, w, D)
        pe_result: dict,
        flag_examples: Optional[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        b, h, w, d = query_embeddings.shape
        class_embeddings, flag_examples, embedding_mask = self._get_pe_result(
            pe_result, flag_examples
        )

        class_embeddings, query_tokens = self.transformer(
            query_embeddings, image_pe, class_embeddings, embedding_mask,
            deterministic=deterministic,
        )
        query_embeddings = query_tokens.reshape(b, h, w, d)

        cls1 = None
        if self.classification_levels > 1:
            cls1 = self._classify(query_embeddings, class_embeddings, flag_examples)

        upscaled, class_embeddings = self._upscale(
            query_embeddings, class_embeddings, deterministic=deterministic
        )
        upscaled = self._apply_spatial_convs(upscaled)
        cls0 = self._classify(upscaled, class_embeddings, flag_examples)

        if self.classification_levels <= 1:
            return cls0

        h0, w0 = cls0.shape[-2:]
        cls1 = resize_bilinear(cls1, (h0, w0))
        stacked = jnp.stack([cls0, cls1], axis=-1)  # (B, C, h0, w0, 2)
        bc = stacked.shape[0] * stacked.shape[1]
        seg = self.level_reducer(stacked.reshape(bc, h0, w0, 2))
        return seg.reshape(cls0.shape[0], cls0.shape[1], h0, w0)
