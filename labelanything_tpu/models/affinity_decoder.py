"""DCAMA-style affinity mask decoder
(reference: label_anything/models/mask_decoder.py:367-648).

TPU-first deviation: the reference compacts the (B·C) axis with a dynamic
boolean ``batch_mask`` to skip padded classes (reference:
mask_decoder.py:607-620). Here the computation stays dense and static-shaped;
padded class logits are set to ``-inf`` at the end, which is what the
reference's scatter-into-``-inf`` produces for the valid outputs too.

``prototype_merge`` ("PrototypeAffinity", reference: mask_decoder.py:511-555)
is implemented *as intended*, not as written: the reference code path cannot
execute (it rearranges the (B, C, 64) prototype tensor as ``"b d (c heads)"``
with ``heads=8`` while the affinity tensor uses ``heads=32``, and the merge
branch returns an unbound variable — reproduced by tests/test_variants.py::
test_reference_prototype_affinity_is_broken). See ``_prototype_merge`` for
the itemized reconstruction.
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
        if self.prototype_merge:
            # Faithful-as-intended PrototypeAffinity (reference:
            # mask_decoder.py:443-458, 511-555). The reference path cannot
            # execute (see module docstring + tests/test_variants.py::
            # test_reference_prototype_affinity_is_broken); deviations that
            # make it well-formed are documented inline in
            # ``_prototype_merge``.
            from .common import AttentionMLPBlock

            third_depth = td // ds
            self.proto_heads = 8  # the prototype-side split the ref declares
            assert third_depth % self.proto_heads == 0, (
                "transformer_dim/downsample_rate must be divisible by the "
                "8-way prototype head split")
            self.attn_token_to_image = AttentionMLPBlock(
                embed_dim=td, downsample_rate=1, mlp_dim=2048, num_heads=8,
                act=self.activation, dtype=self.dtype,
                name="attn_token_to_image")
            # ref: MLP(td, td, second_layer_depth, 3); the correlation
            # below needs the *affinity* channel count (third_depth) — one
            # of the reference's shape inconsistencies resolved here.
            from .mask_decoder import MLP

            self.class_embedding_mlp = MLP(
                hidden_dim=td, output_dim=third_depth, num_layers=3,
                dtype=self.dtype, name="class_embedding_mlp")
            self.proto_ln = LayerNorm2d(self.proto_heads, dtype=self.dtype,
                                        name="proto_ln")
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

        # classes with no flagged example anywhere -> -inf (dense equivalent
        # of the reference's batch_mask scatter, mask_decoder.py:607-620)
        class_valid = flag_examples.any(axis=1)  # (B, C)

        if self.prototype_merge:
            logits = self._prototype_merge(
                q, pe_result[ResultDict.CLASS_EMBS], image_pe, class_valid,
                deterministic=deterministic)
        else:
            for conv, ln in zip(self.up_convs, self.up_lns):
                q = self.activation(ln(conv(q)))
            logits = self.out_conv(q)  # (B*C, h8, w8, 1)
            h8, w8 = logits.shape[1:3]
            logits = logits.reshape(b, c, h8, w8)

        return jnp.where(class_valid[:, :, None, None], logits, _NEG_INF)

    def _prototype_merge(self, q: jax.Array, prototypes: jax.Array,
                         image_pe: jax.Array, class_valid: jax.Array,
                         *, deterministic: bool = True) -> jax.Array:
        """Faithful-as-intended PrototypeAffinity merge (reference:
        mask_decoder.py:511-555 ``prototype_transformer``).

        The reference branch is dead code — it NameErrors on return and its
        head split is internally inconsistent — so this implements what the
        code was evidently *for*: class prototypes attend to the class-max
        affinity map, are projected to the upscaled-affinity channel space,
        and a per-head prototype/affinity correlation map joins the affinity
        features for the final classification conv. Deviations, each fixing
        a reference impossibility:

        * one head count (8, the prototype-side split) on both correlation
          operands — ref used heads=8 vs heads=32 (mask_decoder.py:536-546);
        * the prototype MLP projects to third_depth so the correlation
          contracts over matching channels — ref projected to
          second_layer_depth, which cannot contract against the
          third_depth affinity map;
        * the final 1x1 conv consumes the concatenated
          (third_depth + heads) channels — ref fed 2x third_depth into a
          conv built for third_depth;
        * padded classes are flag-masked densely (no -inf scatter *into*
          conv inputs, which NaN-poisons ConvTranspose even for valid rows);
        * the reference also upscales ``reduce_embeddings`` alongside and
          discards the result (mask_decoder.py:533-535) — dead compute,
          skipped.

        q: (B*C, h, w, D) post-spatial-conv affinity features;
        prototypes: (B, C, D); image_pe: (1, h, w, D);
        class_valid: (B, C). Returns (B, C, h8, w8) logits.
        """
        bc, h, w, d = q.shape
        b, c = class_valid.shape
        qd = q.reshape(b, c, h, w, d)

        # class-max image map, padded classes excluded from the max
        neg = jnp.finfo(qd.dtype).min
        reduced = jnp.max(
            jnp.where(class_valid[:, :, None, None, None], qd, neg), axis=1
        )  # (B, h, w, D)

        keys = (reduced + image_pe).reshape(b, h * w, d)
        protos = self.attn_token_to_image(
            prototypes, keys, keys, deterministic=deterministic)  # (B, C, D)
        protos = self.class_embedding_mlp(
            protos, deterministic=deterministic)  # (B, C, third_depth)

        # upscale the affinity features: full blocks 0,1 then conv of block
        # 2 (ref applies output_upscaling[:7], i.e. the third ConvTranspose
        # without its LN+act, which lands on proto_logits and affinity in
        # the second loop — mask_decoder.py:533-551)
        for conv, ln in zip(self.up_convs[:2], self.up_lns[:2]):
            q = self.activation(ln(conv(q)))
        q = self.up_convs[2](q)  # (B*C, h8, w8, third_depth)
        h8, w8 = q.shape[1:3]
        td3 = q.shape[-1]
        heads = self.proto_heads
        dh = td3 // heads

        # per-head prototype/affinity correlation
        aff = q.reshape(b, c, h8, w8, heads, dh)
        pr = protos.reshape(b, c, heads, dh)
        proto_logits = jnp.einsum("bcxyhd,bchd->bcxyh", aff, pr)
        proto_logits = proto_logits.reshape(bc, h8, w8, heads)

        q = self.activation(self.up_lns[2](q))
        proto_logits = self.activation(self.proto_ln(proto_logits))
        feats = jnp.concatenate([q, proto_logits], axis=-1)
        logits = self.out_conv(feats)  # (B*C, h8, w8, 1)
        return logits.reshape(b, c, h8, w8)
