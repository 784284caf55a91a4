"""DCAMA-style affinity mask decoder
(reference: label_anything/models/mask_decoder.py:367-648).

TPU-first deviation: the reference compacts the (B·C) axis with a dynamic
boolean ``batch_mask`` to skip padded classes (reference:
mask_decoder.py:607-620). Here the computation stays dense and static-shaped;
padded class logits are set to ``-inf`` at the end, which is what the
reference's scatter-into-``-inf`` produces for the valid outputs too.

``prototype_merge`` ("PrototypeAffinity", reference: mask_decoder.py:511-555)
is not implemented: the reference code path rearranges the (B, C, 64)
prototype tensor as ``"b d (c heads)"`` with ``heads=8`` while the affinity
tensor uses ``heads=32`` over a (B·C, 32, h, w) map, so the following matmul
has inconsistent batch/contraction dims for general (B, C); it cannot execute
in the reference either and is treated as dead code.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict
from .common import LayerNorm2d

_NEG_INF = float("-inf")


class AffinityDecoder(nn.Module):
    transformer_dim: int
    transformer: nn.Module
    spatial_convs: Optional[int] = None
    activation: Callable = nn.gelu
    classification_layer_downsample_rate: int = 8
    transformer_feature_size: Optional[int] = None
    class_fusion: str = "sum"
    prototype_merge: bool = False
    transformer_keys_are_images: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.prototype_merge:
            raise NotImplementedError(
                "PrototypeAffinity is broken in the reference: the merge "
                "branch returns an unbound variable and its head split is "
                "internally inconsistent (mask_decoder.py:511-555, 630-648) "
                "— reproduced by tests/test_variants.py::"
                "test_reference_prototype_affinity_is_broken."
            )
        td = self.transformer_dim
        ds = self.classification_layer_downsample_rate
        depths = (td // (ds // 4), td // (ds // 2), td // ds)
        self.up_convs = [
            nn.ConvTranspose(d, (2, 2), strides=(2, 2), transpose_kernel=True,
                             dtype=self.dtype, name=f"up_conv{i}")
            for i, d in enumerate(depths)
        ]
        self.up_lns = [
            LayerNorm2d(d, dtype=self.dtype, name=f"up_ln{i}")
            for i, d in enumerate(depths)
        ]
        self.out_conv = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv")
        if self.spatial_convs is not None:
            self.spatial_conv_layers = [
                nn.Conv(td, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"spatial_conv_{i}")
                for i in range(self.spatial_convs)
            ]
            self.spatial_conv_norms = [
                LayerNorm2d(td, dtype=self.dtype, name=f"spatial_ln_{i}")
                for i in range(max(self.spatial_convs - 1, 0))
            ]

    def _apply_classes_to_features(self, features: jax.Array, classes: jax.Array):
        """features: (B, N, C, h, w, D); classes: (B, N, C, D)
        (reference: mask_decoder.py:493-509)."""
        cls = classes[:, :, :, None, None, :]
        if self.class_fusion == "sum":
            return features + cls
        if self.class_fusion == "mul":
            return features * cls
        if self.class_fusion == "softmax":
            b, m, c, d = classes.shape
            soft = jax.nn.softmax(classes.reshape(b, m * c, d), axis=1)
            return features * soft.reshape(b, m, c, d)[:, :, :, None, None, :]
        if self.class_fusion == "sigmoid":
            return features * nn.sigmoid(cls)
        raise ValueError(f"Unknown class_fusion {self.class_fusion!r}")

    def _rescale(self, x: jax.Array, size) -> jax.Array:
        """Bilinear rescale of channels-last (..., h, w, D)."""
        return resize_bilinear(x, size, spatial_axes=(-3, -2))

    def __call__(
        self,
        query_embeddings: jax.Array,      # (B, h, w, D)
        support_embeddings: jax.Array,    # (B, N, h, w, D)
        image_pe: jax.Array,              # (1, h, w, D)
        pe_result: dict,
        flag_examples: jax.Array,         # (B, N, C)
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        b, n, h, w, d = support_embeddings.shape
        support_masks = pe_result[ResultDict.EXAMPLES_CLASS_SRC]  # (B*N*C, h, w, D)
        c = support_masks.shape[0] // (b * n)
        support_masks = support_masks.reshape(b, n, c, h, w, d)
        class_examples_embeddings = pe_result[ResultDict.EXAMPLES_CLASS_EMBS]
        support_masks = self._apply_classes_to_features(
            support_masks, class_examples_embeddings
        )

        cur_size = (h, w)
        tfs = self.transformer_feature_size
        if tfs is not None:
            query_embeddings = self._rescale(query_embeddings, (tfs, tfs))
            support_embeddings = self._rescale(support_embeddings, (tfs, tfs))
            support_masks = self._rescale(support_masks, (tfs, tfs))
            ht, wt = tfs, tfs
        else:
            ht, wt = h, w

        # (B, h, w, D) -> (B*C, hw, D)
        q = jnp.repeat(
            query_embeddings.reshape(b, 1, ht * wt, d), c, axis=1
        ).reshape(b * c, ht * wt, d)
        sm = (
            support_masks.transpose(0, 2, 1, 3, 4, 5)
            .reshape(b * c, n * ht * wt, d)
        )
        if self.transformer_keys_are_images:
            se = jnp.repeat(
                support_embeddings.reshape(b, 1, n * ht * wt, d), c, axis=1
            ).reshape(b * c, n * ht * wt, d)
        else:
            se = sm

        q = self.transformer(
            q, se, sm, image_pe, flag_examples, deterministic=deterministic
        )
        q = q.reshape(b * c, ht, wt, d)
        if tfs is not None:
            q = self._rescale(q, cur_size)

        if self.spatial_convs is not None:
            for i, conv in enumerate(self.spatial_conv_layers):
                q = conv(q)
                if i < self.spatial_convs - 1:
                    q = self.activation(self.spatial_conv_norms[i](q))

        for conv, ln in zip(self.up_convs, self.up_lns):
            q = self.activation(ln(conv(q)))
        logits = self.out_conv(q)  # (B*C, h8, w8, 1)
        h8, w8 = logits.shape[1:3]
        logits = logits.reshape(b, c, h8, w8)

        # classes with no flagged example anywhere -> -inf (dense equivalent
        # of the reference's batch_mask scatter, mask_decoder.py:607-620)
        class_valid = flag_examples.any(axis=1)  # (B, C)
        return jnp.where(class_valid[:, :, None, None], logits, _NEG_INF)
