"""Prompt / prompt-image encoders (reference: label_anything/models/prompt_encoder.py).

Design notes (TPU-first):
  * All episode axes (B batch, M examples, C classes, N annotations) are
    static; validity is carried by flag tensors, so the whole encoder is one
    jit-compiled graph per shape bucket — no data-dependent prompt dropping.
    (The reference drops absent prompt modalities dynamically in
    ``Lam.prepare_prompts``; here modality presence is static batch metadata.)
  * Boolean-mask writes of the reference (e.g. ``emb[labels == NULL] = 0``)
    become ``jnp.where`` selects.
  * The B·M·C instance axis is flattened into the batch dimension of one big
    TwoWayTransformer call — on TPU there is no reason for the reference's
    ``chunk_size`` OOM loop (reference: prompt_encoder.py:677-694); memory is
    instead controlled with ``nn.remat`` if needed.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import adaptive_avg_pool, resize_bilinear
from ..typing import BatchKeys, Label, ResultDict
from .common import Attention, AttentionMLPBlock, LayerNorm2d
from .transformer import OneWayAttentionBlock, TwoWayTransformer


def _shared_keys_disabled() -> bool:
    """Kill switch for the rank-1 shared-keys fusion fast path.

    Read at TRACE time: set LA_TPU_DISABLE_SHARED_KEYS=1 before the first
    forward is jit-compiled; toggling it afterwards has no effect on cached
    executables. Falsy spellings ('', '0', 'false', 'no', 'off') leave the
    fast path enabled."""
    return os.environ.get("LA_TPU_DISABLE_SHARED_KEYS", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _mask_factor_disabled() -> bool:
    """Kill switch for the factored with-masks fusion path (rank-16 mask
    correction through the shared-keys machinery; see __call__). Read at
    TRACE time, like LA_TPU_DISABLE_SHARED_KEYS."""
    return os.environ.get("LA_TPU_DISABLE_MASK_FACTOR", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


class _Conv1x1(nn.Module):
    """1x1 conv with its parameters exposed (kernel (1, 1, Cin, Cout) +
    bias), param-tree-compatible with nn.Conv. The factored with-masks path
    folds this kernel into downstream projection weights, which nn.Conv's
    encapsulation cannot express."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x: jax.Array) -> jax.Array:
        return (x.astype(self.dtype) @ self.kernel[0, 0].astype(self.dtype)
                + self.bias.astype(self.dtype))

    def kernel_bias(self):
        return (self.kernel[0, 0].astype(self.dtype),
                self.bias.astype(self.dtype))


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding
    (reference: prompt_encoder.py:187-233).

    The Gaussian projection matrix is a non-trainable buffer in the reference;
    here it is a parameter stored in the ``params`` collection but excluded
    from optimization by the trainer's frozen-parameter mask (see
    train/optim.py), so checkpoints round-trip uniformly.
    """

    num_pos_feats: int = 64
    scale: float = 1.0

    def setup(self):
        self.positional_encoding_gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key: self.scale * jax.random.normal(key, (2, self.num_pos_feats)),
        )

    def _pe_encoding(self, coords: jax.Array) -> jax.Array:
        """coords in [0,1], shape (..., 2) -> (..., 2*num_pos_feats)."""
        coords = 2.0 * coords - 1.0
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2.0 * math.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]) -> jax.Array:
        """Dense grid PE, returned channels-last: (H, W, D)."""
        h, w = size
        y_embed = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x_embed = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [
                jnp.broadcast_to(x_embed[None, :], (h, w)),
                jnp.broadcast_to(y_embed[:, None], (h, w)),
            ],
            axis=-1,
        )
        return self._pe_encoding(grid)

    def forward_with_coords(
        self, coords: jax.Array, image_size: Tuple[int, int]
    ) -> jax.Array:
        """Encode unnormalized (..., 2) xy coords."""
        coords = coords / jnp.asarray(
            [image_size[1], image_size[0]], dtype=coords.dtype
        )
        return self._pe_encoding(coords)


class RandomMatrixEncoder(nn.Module):
    """Symmetric class-identity encoder (reference: prompt_encoder.py:233-277).

    Adds a randomly drawn row of a learned bank to all sparse and dense
    embeddings of each class, making class identity permutation-symmetric.
    Sampling uses the ``class_rows`` rng stream when provided (training);
    otherwise rows ``0..C-1`` are used deterministically (the bg class always
    receives row 0, as in the reference).
    """

    bank_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, dense_embeddings: jax.Array, sparse_embeddings: jax.Array):
        """dense: (B, M, C, H, W, D); sparse: (B, M, C, N, D)."""
        bank = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.bank_size, self.embed_dim),
        )[0, 0]
        c = sparse_embeddings.shape[2]
        if self.has_rng("class_rows"):
            key = self.make_rng("class_rows")
            fg_rows = jax.random.permutation(key, self.bank_size - 1)[: c - 1] + 1
            rows = jnp.concatenate([jnp.zeros((1,), dtype=fg_rows.dtype), fg_rows])
        else:
            rows = jnp.arange(c)
        # cast the fp32 bank to the embeddings' dtype BEFORE adding: a raw
        # add would promote the whole (B, M, C, H, W, D) dense array to fp32
        # (doubling its HBM footprint through the fusion transformer)
        class_encoding = bank[rows].astype(dense_embeddings.dtype)  # (C, D)
        sparse_embeddings = sparse_embeddings + class_encoding[None, None, :, None, :]
        dense_embeddings = (
            dense_embeddings + class_encoding[None, None, :, None, None, :]
        )
        return dense_embeddings, sparse_embeddings


class IdentityClassEncoder(nn.Module):
    """No class encoding (reference default when ``class_encoder=None``)."""

    @nn.compact
    def __call__(self, dense_embeddings, sparse_embeddings):
        return dense_embeddings, sparse_embeddings


class EmbeddingTransformer(nn.Module):
    """Cross-attention class-embedding extraction
    (reference: prompt_encoder.py:280-313)."""

    emb_dim: int
    num_embeddings: int
    num_layers: int = 2
    embedding_dropout: float = 0.2
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, image_pe, flag_examples, *, deterministic: bool = True):
        """src: (B*M*C, H, W, D); flags: (B, M, C)."""
        b, m, c = flag_examples.shape
        h, w, d = src.shape[-3:]
        n = self.num_embeddings
        emb_table = self.param(
            "embeddings",
            nn.initializers.normal(stddev=1.0),
            (n, self.emb_dim),
        )
        embeddings = jnp.broadcast_to(emb_table[None], (b * c, n, self.emb_dim))
        key_mask = jnp.repeat(
            flag_examples.transpose(0, 2, 1).reshape(b * c, m), h * w, axis=-1
        )
        src = (
            src.reshape(b, m, c, h * w, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b * c, m * h * w, d)
        )
        for i in range(self.num_layers):
            embeddings = OneWayAttentionBlock(
                embedding_dim=self.emb_dim, num_heads=8,
                apply_masks=self.apply_masks, dtype=self.dtype, name=f"layers_{i}",
            )(embeddings, src, jnp.zeros_like(embeddings), key_mask=key_mask,
              deterministic=deterministic)

        flag_embeddings = (flag_examples.sum(axis=1) > 0).astype(jnp.int32)  # (B, C)
        flag_embeddings = jnp.broadcast_to(flag_embeddings[:, None, :], (b, n, c))
        if not deterministic and self.embedding_dropout > 0.0:
            key = self.make_rng("dropout")
            included = jax.random.uniform(key, (n,)) > self.embedding_dropout
            # guarantee at least one embedding survives
            included = jnp.where(included.any(), included, included.at[0].set(True))
            flag_embeddings = flag_embeddings * included[None, :, None].astype(jnp.int32)
        embeddings = embeddings.reshape(b, c, n, self.emb_dim).transpose(0, 2, 1, 3)
        return {
            ResultDict.EXAMPLES_CLASS_EMBS: embeddings,       # (B, n, C, D)
            BatchKeys.FLAG_EXAMPLES: flag_embeddings,          # (B, n, C)
        }


class GuidedPooler(nn.Module):
    """Gumbel-softmax fg/bg mask chooser extraction
    (reference: prompt_encoder.py:315-393).

    Faithfulness notes: the reference (a) builds ``nn.MultiheadAttention``
    without ``batch_first``, so the self-attention runs over the (B·M·C)
    axis with pixels as the batch; (b) applies ``F.gumbel_softmax`` with the
    default ``dim=-1``, i.e. over the W axis of the NCHW mask logits. Both
    quirks are reproduced.
    """

    emb_dim: int
    num_embeddings: int
    tau: float = 0.5
    dtype: jnp.dtype = jnp.float32

    def _chooser(self, x, name):
        d = self.emb_dim
        x = nn.relu(nn.Conv(d // 2, (1, 1), dtype=self.dtype, name=f"{name}_0")(x))
        x = nn.relu(nn.Conv(d // 4, (1, 1), dtype=self.dtype, name=f"{name}_1")(x))
        x = nn.relu(nn.Conv(d // 8, (1, 1), dtype=self.dtype, name=f"{name}_2")(x))
        return nn.Conv(self.num_embeddings + 1, (1, 1), dtype=self.dtype,
                       name=f"{name}_3")(x)

    def _act(self, logits, deterministic):
        # gumbel softmax over the W axis (reference dim=-1 on NCHW)
        if not deterministic and self.has_rng("gumbel"):
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape)
            logits = logits + g
        return jax.nn.softmax(logits / self.tau, axis=2)

    @nn.compact
    def __call__(self, src, image_pe, flag_examples, *, deterministic=True):
        """src: (B*M*C, h, w, D); flags: (B, M, C)."""
        b, m, c = flag_examples.shape
        h, w, d = src.shape[-3:]
        n = self.num_embeddings
        src = src + image_pe
        src6 = src.reshape(b, m, c, h, w, d)
        fg_src = src6[:, :, 1:]
        bg_src = fg_src.mean(axis=2, keepdims=True)
        fg_flags = flag_examples[:, :, 1:]
        bg_flags = (fg_flags.sum(axis=2) > 0).astype(jnp.int32)[:, :, None]

        attn = Attention(self.emb_dim, num_heads=8, dtype=self.dtype,
                         name="attention")

        def seq_attn(x, cc):
            # tokens over the (b m c) axis, pixels as batch (reference quirk)
            toks = x.reshape(b * m * cc, h * w, d).transpose(1, 0, 2)
            out = attn(toks, toks, toks, deterministic=deterministic)
            return out.transpose(1, 0, 2).reshape(b * m * cc, h, w, d)

        fg = seq_attn(fg_src, c - 1)
        bg = seq_attn(bg_src, 1)

        fg_mask = self._act(self._chooser(fg, "fg_chooser"), deterministic)
        bg_mask = self._act(self._chooser(bg, "bg_chooser"), deterministic)
        # drop chooser channel 0; (bmc, h, w, n) -> (n, bmc, 1, h, w)
        fg_mask = fg_mask[..., 1:].transpose(3, 0, 1, 2)[:, :, None]
        bg_mask = bg_mask[..., 1:].transpose(3, 0, 1, 2)[:, :, None]

        # adaptive_avg_pool2d(mask * src, (1, 1)) == mean over (H, W)
        fg_e = (fg_mask * fg.transpose(0, 3, 1, 2)[None]).mean(axis=(3, 4))
        bg_e = (bg_mask * bg.transpose(0, 3, 1, 2)[None]).mean(axis=(3, 4))
        fg_e = fg_e.transpose(1, 0, 2)  # (n, bmc', d) -> (bmc', n, d)
        bg_e = bg_e.transpose(1, 0, 2)
        fg_e = fg_e.reshape(b, m, c - 1, n, d).transpose(0, 3, 1, 2, 4)
        fg_e = fg_e.reshape(b, n * m, c - 1, d)
        bg_e = bg_e.reshape(b, m, 1, n, d).transpose(0, 3, 1, 2, 4)
        bg_e = bg_e.reshape(b, n * m, 1, d)
        embeddings = jnp.concatenate([bg_e, fg_e], axis=2)  # (B, n*M, C, D)

        flags = jnp.concatenate([bg_flags, fg_flags], axis=2)
        flags = jnp.tile(flags, (1, n, 1))
        return {
            ResultDict.EXAMPLES_CLASS_EMBS: embeddings,
            BatchKeys.FLAG_EXAMPLES: flags,
            ResultDict.MASK_EMBEDDINGS: (bg_mask, fg_mask),
        }


class PromptImageEncoder(nn.Module):
    """Fuses visual prompts with support-image features into per-class
    embeddings (reference: prompt_encoder.py:396-827 — the LAM core novelty).

    Forward contract (channels-last):
      image_embeddings: (B, M, H, W, D) support features
      points: optional (coords (B,M,C,Np,2), labels (B,M,C,Np))
      boxes: optional (boxes (B,M,C,Nb,4), flags (B,M,C,Nb))
      masks: optional (masks (B,M,C,Hm,Wm), flags (B,M,C))
      flag_examples: (B, M, C)

    Returns dict with CLASS_EMBS (B,C,D), EXAMPLES_CLASS_EMBS (B,M,C,D),
    FLAG_EXAMPLES, EXAMPLES_CLASS_SRC.
    """

    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int
    transformer: nn.Module
    class_encoder: nn.Module
    example_class_attention: bool = True
    class_attention: bool = False
    class_embedding_dim: Optional[int] = None
    example_attention: bool = False
    activation: Callable = nn.gelu
    use_support_features: bool = True
    embeddings_per_example: int = 1
    embedding_extraction: Optional[str] = None
    dropout: float = 0.0
    num_heads: int = 8
    attention_downsample_rate: int = 2
    mlp_dim: int = 2048
    apply_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # pos/neg point + 2 box corners (reference: prompt_encoder.py:50-55)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.not_a_mask_embed = self.param(
            "not_a_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_sparse_embedding = self.param(
            "no_sparse_embedding", nn.initializers.normal(1.0), (1, self.embed_dim)
        )

        c = self.mask_in_chans
        self.mask_downscaling = [
            nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_down_conv1"),
            LayerNorm2d(c // 4, dtype=self.dtype, name="mask_down_ln1"),
            nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_down_conv2"),
            LayerNorm2d(c, dtype=self.dtype, name="mask_down_ln2"),
            # param-exposing 1x1 (same tree names/shapes as nn.Conv): the
            # factored with-masks path folds this kernel into the fusion
            # transformer's packed projection (rank-Cm correction)
            _Conv1x1(self.embed_dim, c, dtype=self.dtype,
                     name="mask_down_conv3"),
        ]

        self.sparse_embedding_attention = AttentionMLPBlock(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            downsample_rate=1,
            mlp_dim=self.mlp_dim,
            act=self.activation,
            dropout=self.dropout,
            apply_masks=self.apply_masks,
            dtype=self.dtype,
        )

        class_embedding_dim = self.class_embedding_dim
        if class_embedding_dim is not None:
            class_attn_ds_rate = 1
            self.class_projector_in = nn.Dense(class_embedding_dim, dtype=self.dtype)
            self.class_projector_out = nn.Dense(self.embed_dim, dtype=self.dtype)
        else:
            class_embedding_dim = self.embed_dim
            class_attn_ds_rate = self.attention_downsample_rate
            self.class_projector_in = None
            self.class_projector_out = None

        def merge_block():
            return AttentionMLPBlock(
                embed_dim=class_embedding_dim,
                num_heads=self.num_heads,
                downsample_rate=class_attn_ds_rate,
                mlp_dim=self.mlp_dim,
                act=self.activation,
                dropout=self.dropout,
                apply_masks=self.apply_masks,
                dtype=self.dtype,
            )

        self.class_attention_block = merge_block() if self.class_attention else None
        self.example_attention_block = merge_block() if self.example_attention else None
        self.class_example_attention_block = (
            merge_block() if self.example_class_attention else None
        )

        if not self.use_support_features:
            self.proto_chooser = [
                nn.Conv(self.embed_dim // 8, (1, 1), dtype=self.dtype, name="proto_chooser_0"),
                nn.Conv(1, (1, 1), dtype=self.dtype, name="proto_chooser_1"),
            ]

        if self.embedding_extraction == "cross_attention":
            self.embedding_extraction_module = EmbeddingTransformer(
                emb_dim=self.embed_dim,
                num_embeddings=self.embeddings_per_example,
                apply_masks=self.apply_masks,
                dtype=self.dtype,
            )
        elif self.embedding_extraction == "pooler":
            self.embedding_extraction_module = GuidedPooler(
                emb_dim=self.embed_dim,
                num_embeddings=self.embeddings_per_example,
                dtype=self.dtype,
            )
        else:
            self.embedding_extraction_module = None

    # ------------------------------------------------------------------ #
    # prompt embedding
    # ------------------------------------------------------------------ #

    def get_dense_pe(self) -> jax.Array:
        """(1, H, W, D) dense positional encoding of the feature grid."""
        return self.pe_layer(self.image_embedding_size)[None]

    def _embed_points(self, coords: jax.Array, labels: jax.Array, pad: bool) -> jax.Array:
        """coords: (B, M, C, N, 2); labels: (B, M, C, N) in {-1, 0, 1}.

        Returns (B, M, C, N(+1), D). The reference appends a (0, 0) padding
        point with label -1 when no boxes are present
        (reference: prompt_encoder.py:83-103).
        """
        coords = coords + 0.5  # center of pixel
        if pad:
            b, m, c, _, _ = coords.shape
            coords = jnp.concatenate(
                [coords, jnp.zeros((b, m, c, 1, 2), coords.dtype)], axis=3
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, m, c, 1), labels.dtype)], axis=3
            )
        pe = self.pe_layer.forward_with_coords(coords, self.input_image_size)
        lbl = labels[..., None]
        pe = jnp.where(lbl == Label.NULL, self.not_a_point_embed[0], pe)
        pe = jnp.where(lbl == Label.NEGATIVE, pe + self.point_embeddings[0], pe)
        pe = jnp.where(lbl == Label.POSITIVE, pe + self.point_embeddings[1], pe)
        return pe

    def _embed_boxes(self, boxes: jax.Array, flags: jax.Array) -> jax.Array:
        """boxes: (B, M, C, N, 4) xyxy; flags: (B, M, C, N).

        Returns (B, M, C, 2N, D) — two corner tokens per box; padding boxes
        collapse to ``not_a_point_embed`` (reference: prompt_encoder.py:646-668).

        Faithfulness note: the reference builds the corner-token padding mask
        with ``padding.repeat(1, 1, 1, 2)`` — a TILED pattern [f0..fN,f0..fN]
        applied to box-major token order [b0c0,b0c1,b1c0,...], so for N>1 a
        corner token is masked by the *wrong* box's flag
        (reference: prompt_encoder.py:659-663). Reproduced bit-for-bit here,
        since released checkpoints were trained with this masking.
        """
        b, m, c, n, _ = boxes.shape
        corners = (boxes + 0.5).reshape(b, m, c, n, 2, 2)
        pe = self.pe_layer.forward_with_coords(corners, self.input_image_size)
        corner_emb = jnp.stack(
            [self.point_embeddings[2], self.point_embeddings[3]], axis=0
        )  # (2, D)
        pe = pe + corner_emb[None, None, None, None]
        pe = pe.reshape(b, m, c, 2 * n, self.embed_dim)
        flags_tiled = jnp.concatenate([flags, flags], axis=-1)[..., None]
        pe = jnp.where(flags_tiled == Label.NULL, self.not_a_point_embed[0], pe)
        return pe

    def _embed_masks(self, masks: jax.Array, mask_flags: jax.Array) -> jax.Array:
        """masks: (B, M, C, Hm, Wm); flags: (B, M, C).

        Returns channels-last dense embeddings (B, M, C, Hm/4, Wm/4, D).
        """
        b, m, c, hm, wm = masks.shape
        x = masks.reshape(b * m * c, hm, wm, 1).astype(self.dtype)
        conv1, ln1, conv2, ln2, conv3 = self.mask_downscaling
        x = self.activation(ln1(conv1(x)))
        x = self.activation(ln2(conv2(x)))
        x = conv3(x)
        h, w = x.shape[1:3]
        x = x.reshape(b, m, c, h, w, self.embed_dim)
        is_null = (mask_flags == Label.NULL)[..., None, None, None]
        return jnp.where(is_null, self.not_a_mask_embed[0], x)

    def _embed_sparse(self, points, boxes, bmc):
        """Sparse prompt embedding + per-example token attention (the sparse
        half of embed_points_masks)."""
        b, m, c = bmc
        sparse_parts = []
        if points is not None:
            coords, labels = points
            sparse_parts.append(
                self._embed_points(coords, labels, pad=(boxes is None)))
        if boxes is not None:
            sparse_parts.append(self._embed_boxes(*boxes))
        if sparse_parts:
            sparse = jnp.concatenate(sparse_parts, axis=3)
        else:
            sparse = jnp.broadcast_to(
                self.no_sparse_embedding[0][None, None, None, None],
                (b, m, c, 1, self.embed_dim),
            )

        # attention over all class-tokens of one example: (b m) (c n) d
        n_tok = sparse.shape[3]
        sparse = sparse.reshape(b * m, c * n_tok, self.embed_dim)
        sparse = self.sparse_embedding_attention(sparse)
        return sparse.reshape(b, m, c, n_tok, self.embed_dim)

    def _embed_masks_factored(self, masks: jax.Array, mask_flags: jax.Array):
        """Factored dense mask embedding for the rank-Cm fusion fast path.

        Runs the mask_downscaling TRUNK only (conv1/ln1/act/conv2/ln2/act —
        everything except the final 1x1 conv) and splits the dense embedding
        exactly as ``dense == h2 @ W3 + u``:

          * h2: (B, M, C, h', w', Cm) trunk features, ZEROED on NULL
            instances (Cm = mask_in_chans, 16 — the rank of the spatial
            correction);
          * u: (B, M, C, D) spatially-uniform term — conv3's bias for real
            masks, ``not_a_mask_embed`` for NULL instances (where h2 is 0,
            so h2 @ W3 + u == not_a_mask_embed verbatim, matching
            _embed_masks' where());
          * W3: (Cm, D) the final 1x1 kernel, returned for folding into the
            fusion transformer's packed projection.

        The point: downstream consumers stream the 16-channel h2 instead of
        the 256-channel dense map (16x fewer bytes/MACs on every projection
        that touches it), and the uniform u rides the existing rank-1
        shared-keys machinery."""
        b, m, c, hm, wm = masks.shape
        x = masks.reshape(b * m * c, hm, wm, 1).astype(self.dtype)
        conv1, ln1, conv2, ln2, conv3 = self.mask_downscaling
        x = self.activation(ln1(conv1(x)))
        x = self.activation(ln2(conv2(x)))
        h, w = x.shape[1:3]
        x = x.reshape(b, m, c, h, w, x.shape[-1])
        is_null = mask_flags == Label.NULL
        x = jnp.where(is_null[..., None, None, None], 0.0, x)
        w3, bias = conv3.kernel_bias()
        u = jnp.where(is_null[..., None],
                      self.not_a_mask_embed[0].astype(self.dtype),
                      jnp.broadcast_to(bias, (b, m, c, self.embed_dim)))
        return x, u, w3

    def embed_points_masks(self, points, boxes, masks):
        """Sparse + dense prompt embedding (reference: prompt_encoder.py:564-644).

        Returns:
          sparse: (B, M, C, N_tok, D)
          dense: (B, M, C, h, w, D)
        """
        if points is not None:
            shape = points[0].shape
        elif boxes is not None:
            shape = boxes[0].shape
        elif masks is not None:
            shape = masks[0].shape
        else:
            raise ValueError("No prompts provided")
        b, m, c = shape[0], shape[1], shape[2]
        sparse = self._embed_sparse(points, boxes, (b, m, c))

        if masks is not None:
            dense = self._embed_masks(*masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[0][None, None, None, None, None],
                (b, m, c, h, w, self.embed_dim),
            )
        return sparse, dense

    # ------------------------------------------------------------------ #
    # fusion + pooling
    # ------------------------------------------------------------------ #

    def apply_transformer(self, src, pos_src, sparse_embeddings, *, deterministic=True):
        """Run the fusion transformer over the flattened B·M·C axis.

        src: (B, M, C, h, w, D); sparse: (B, M, C, N, D);
        pos_src: (1, h, w, D). Returns fused (B*M*C, h, w, D).
        """
        b, m, c, h, w, d = src.shape
        src = src.reshape(b * m * c, h, w, d)
        sparse = sparse_embeddings.reshape(b * m * c, sparse_embeddings.shape[3], d)
        _, keys = self.transformer(
            src, pos_src, sparse, deterministic=deterministic
        )
        return keys.reshape(b * m * c, h, w, d)

    def apply_transformer_shared(self, src_base, pos_src, sparse_embeddings,
                                 shift, *, shift_map=None,
                                 shift_map_proj=None, deterministic=True):
        """Shared-keys fast path: the per-(example, class) image operand is
        ``src_base[b, m] + shift[b, m, c]`` with a spatially UNIFORM shift
        (no mask prompts: dense = no_mask_embed + class-bank row). The
        transformer exploits the rank-1 structure so layer 1's image-side
        work runs per (b, m) instead of per (b, m, c) — exact by linearity
        (the reference instead chunks this axis for memory,
        reference: prompt_encoder.py:677-694).

        With ``shift_map`` (B, M, C, h, w, Cm) + ``shift_map_proj`` (Cm, D)
        — the factored mask correction — the effective operand grows the
        spatially-varying term ``shift_map @ shift_map_proj``; the
        transformer streams the 16-channel map directly (rank-Cm path).

        src_base: (B, M, h, w, D); sparse: (B, M, C, N, D); shift: (B, M, C, D).
        Returns fused (B*M*C, h, w, D)."""
        b, m, c, n, d = sparse_embeddings.shape
        h, w = src_base.shape[2:4]
        src = src_base.reshape(b * m, h, w, d)
        sparse = sparse_embeddings.reshape(b * m * c, n, d)
        if shift_map is not None:
            shift_map = shift_map.reshape(
                (b * m * c, h, w, shift_map.shape[-1]))
        _, keys = self.transformer(
            src, pos_src, sparse,
            image_shift=shift.reshape(b * m * c, d),
            image_shift_map=shift_map,
            image_shift_proj=shift_map_proj,
            deterministic=deterministic,
        )
        return keys.reshape(b * m * c, h, w, d)

    def prompt_class_information_merge(self, embeddings, flag_examples, *, deterministic=True):
        """Class/example token mixing (reference: prompt_encoder.py:696-717).

        embeddings: (B, M, C, D'); flags: (B, M, C).
        """
        b, m, c, _ = embeddings.shape
        if self.class_projector_in is not None:
            embeddings = self.class_projector_in(embeddings)
        d = embeddings.shape[-1]

        if self.class_attention_block is not None:
            x = embeddings.reshape(b * m, c, d)
            km = flag_examples.reshape(b * m, c)
            x = self.class_attention_block(x, key_mask=km, deterministic=deterministic)
            embeddings = x.reshape(b, m, c, d)

        if self.example_attention_block is not None:
            x = embeddings.transpose(0, 2, 1, 3).reshape(b * c, m, d)
            km = flag_examples.transpose(0, 2, 1).reshape(b * c, m)
            x = self.example_attention_block(x, key_mask=km, deterministic=deterministic)
            embeddings = x.reshape(b, c, m, d).transpose(0, 2, 1, 3)

        if self.class_example_attention_block is not None:
            x = embeddings.reshape(b, m * c, d)
            km = flag_examples.reshape(b, m * c)
            x = self.class_example_attention_block(x, key_mask=km, deterministic=deterministic)
            embeddings = x.reshape(b, m, c, d)

        if self.class_projector_out is not None:
            embeddings = self.class_projector_out(embeddings)
        return embeddings

    def _obtain_embeddings(self, src, pos_src, flag_examples, *, deterministic=True):
        """Pool fused features to per-(example, class) embeddings and reduce
        over examples (reference: prompt_encoder.py:719-750)."""
        if self.embedding_extraction_module is not None:
            return self.embedding_extraction_module(
                src, pos_src, flag_examples, deterministic=deterministic
            )

        b, m, c = flag_examples.shape
        d = src.shape[-1]
        if self.embeddings_per_example and self.embeddings_per_example > 1:
            k = int(math.isqrt(self.embeddings_per_example))
            # (BMC, h, w, D) -> adaptive pool to (k, k)
            x = src.transpose(0, 3, 1, 2)  # (BMC, D, h, w)
            x = adaptive_avg_pool(x, (k, k))  # (BMC, D, k, k)
            x = x.reshape(b, m, c, d, k * k).transpose(0, 1, 4, 2, 3)  # b m k2 c d
            embeddings = x.reshape(b, m * k * k, c, d)
            flag_examples = jnp.repeat(flag_examples, k * k, axis=1)
        else:
            embeddings = src.mean(axis=(1, 2))  # (BMC, D)
            embeddings = embeddings.reshape(b, m, c, d)

        embeddings = self.prompt_class_information_merge(
            embeddings, flag_examples, deterministic=deterministic
        )

        flags = flag_examples[..., None].astype(embeddings.dtype)
        normalizer = flags.sum(axis=1)
        normalizer = jnp.where(normalizer == 0, 1.0, normalizer)
        class_embeddings = (embeddings * flags).sum(axis=1) / normalizer  # (B, C, D)
        return {
            BatchKeys.FLAG_EXAMPLES: flag_examples,
            ResultDict.CLASS_EMBS: class_embeddings,
            ResultDict.EXAMPLES_CLASS_EMBS: embeddings,
        }

    def __call__(
        self,
        image_embeddings: jax.Array,
        points: Optional[Tuple[jax.Array, jax.Array]],
        boxes: Optional[Tuple[jax.Array, jax.Array]],
        masks: Optional[Tuple[jax.Array, jax.Array]],
        flag_examples: jax.Array,
        *,
        deterministic: bool = True,
    ) -> dict:
        # eligibility for the structured fusion fast paths
        # (ops/twoway_blockdiag.py): Random/Identity class encoders only add
        # a spatially-uniform (C, D) row, so the image operand decomposes as
        # base[b, m] + <structured correction>
        structured_ok = (
            self.use_support_features
            and isinstance(self.transformer, TwoWayTransformer)
            and isinstance(self.class_encoder,
                           (RandomMatrixEncoder, IdentityClassEncoder))
            and not _shared_keys_disabled()
        )
        # rank-1: no mask prompts — dense is the uniform no_mask_embed
        uniform_dense = masks is None and structured_ok
        # rank-Cm: mask prompts — dense == h2 @ W3 + u with a 16-channel h2
        # (mask_downscaling's final 1x1 factored out), so layer 1 streams
        # 16-wide trunk features instead of the 256-wide dense map
        factored_dense = (masks is not None and structured_ok
                          and not _mask_factor_disabled())

        if factored_dense:
            b, m, c = masks[0].shape[:3]
            sparse = self._embed_sparse(points, boxes, (b, m, c))
        else:
            sparse, dense = self.embed_points_masks(points, boxes, masks)
            b, m, c = dense.shape[:3]
        pos_src = self.get_dense_pe()  # (1, h, w, D)

        if factored_dense:
            h2, u, w3 = self._embed_masks_factored(*masks)
            if image_embeddings.shape[2:4] != h2.shape[3:5]:
                # resize the TRUNK features (Cm=16 channels, 16x cheaper
                # than resizing the 256-dim dense map); exact: the 1x1 conv
                # is channel-wise linear, so it commutes with bilinear
                # interpolation
                h2 = resize_bilinear(
                    h2.reshape((-1,) + h2.shape[3:]),
                    image_embeddings.shape[2:4],
                    spatial_axes=(1, 2),
                ).reshape(h2.shape[:3] + image_embeddings.shape[2:4]
                          + h2.shape[-1:])
            proxy = u[:, :, :, None, None, :]
            shift_enc, sparse_enc = self.class_encoder(proxy, sparse)
            src = self.apply_transformer_shared(
                image_embeddings, pos_src,
                sparse_enc, shift_enc[:, :, :, 0, 0, :],
                shift_map=h2, shift_map_proj=w3,
                deterministic=deterministic,
            )
        elif uniform_dense:
            proxy = jnp.broadcast_to(
                self.no_mask_embed[0][None, None, None, None, None],
                (b, m, c, 1, 1, self.embed_dim),
            )
            shift_enc, sparse_enc = self.class_encoder(proxy, sparse)
            src = self.apply_transformer_shared(
                image_embeddings, pos_src,
                sparse_enc, shift_enc[:, :, :, 0, 0, :],
                deterministic=deterministic,
            )
        else:
            if image_embeddings.shape[2:4] != dense.shape[3:5]:
                dense = resize_bilinear(
                    dense.reshape((-1,) + dense.shape[3:]),
                    image_embeddings.shape[2:4],
                    spatial_axes=(1, 2),
                ).reshape(dense.shape[:3] + image_embeddings.shape[2:4]
                          + dense.shape[-1:])

            if self.use_support_features:
                src = image_embeddings[:, :, None] + dense  # (B, M, C, h, w, D)
            else:
                src = dense

            dense_enc, sparse_enc = self.class_encoder(src, sparse)
            src = self.apply_transformer(
                dense_enc, pos_src, sparse_enc, deterministic=deterministic
            )

        if not self.use_support_features:
            x = src
            x = nn.relu(self.proto_chooser[0](x))
            gate = nn.sigmoid(self.proto_chooser[1](x))
            img = jnp.repeat(
                image_embeddings.reshape((-1,) + image_embeddings.shape[2:]), c, axis=0
            )
            src = img * gate

        result = self._obtain_embeddings(
            src, pos_src, flag_examples, deterministic=deterministic
        )
        return {**result, ResultDict.EXAMPLES_CLASS_SRC: src}


class PromptImagePoolEncoder(PromptImageEncoder):
    """"TokenPool" variant (reference: prompt_encoder.py:830-915): class-encoded
    dense embeddings are summed into the support features, a single
    transformer pass runs per example (not per class), and per-class
    embeddings are mean-pooled from the class token groups."""

    def __call__(
        self,
        image_embeddings: jax.Array,
        points,
        boxes,
        masks,
        flag_examples: jax.Array,
        *,
        deterministic: bool = True,
    ) -> dict:
        sparse, dense = self.embed_points_masks(points, boxes, masks)
        b, m, c = dense.shape[:3]
        d = self.embed_dim

        if image_embeddings.shape[2:4] != dense.shape[3:5]:
            dense = resize_bilinear(
                dense.reshape((-1,) + dense.shape[3:]),
                image_embeddings.shape[2:4],
                spatial_axes=(1, 2),
            ).reshape(dense.shape[:3] + image_embeddings.shape[2:4] + dense.shape[-1:])

        dense, sparse = self.class_encoder(dense, sparse)
        # sum class-encoded dense maps into the per-example feature map
        src = image_embeddings + dense.sum(axis=2)  # (B, M, h, w, D)
        h, w = src.shape[2:4]
        pos_src = self.get_dense_pe()

        n_tok = sparse.shape[3]
        sparse_bm = sparse.reshape(b * m, c * n_tok, d)
        src_bm = src.reshape(b * m, h, w, d)
        queries, _ = self.transformer(
            src_bm, pos_src, sparse_bm, deterministic=deterministic
        )
        # mean-reduce each class' token group
        queries = queries.reshape(b, m, c, n_tok, d).mean(axis=3)  # (B, M, C, D)

        embeddings = self.prompt_class_information_merge(
            queries, flag_examples, deterministic=deterministic
        )
        flags = flag_examples[..., None].astype(embeddings.dtype)
        normalizer = jnp.where(flags.sum(axis=1) == 0, 1.0, flags.sum(axis=1))
        class_embeddings = (embeddings * flags).sum(axis=1) / normalizer
        return {
            BatchKeys.FLAG_EXAMPLES: flag_examples,
            ResultDict.CLASS_EMBS: class_embeddings,
            ResultDict.EXAMPLES_CLASS_EMBS: embeddings,
            ResultDict.EXAMPLES_CLASS_SRC: src_bm,
        }
