"""Vanilla SAM (reference: label_anything/models/sam.py and
mask_decoder.py:23-165 MaskDecoder, prompt_encoder.py:21-233 PromptEncoder).

Used for embedding generation with released SAM checkpoints and as the
``AdaptedSam`` per-class baseline over LAM episode batches. The dynamic
per-image prompt filtering of the reference (sam.py:218-252) is replaced by
static shapes + validity flags, as everywhere in this framework.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, Label, ResultDict
from .common import LayerNorm2d
from .mask_decoder import MLP
from .prompt_encoder import PositionEmbeddingRandom


class SamPromptEncoder(nn.Module):
    """SAM's original prompt encoder (reference: prompt_encoder.py:21-233)."""

    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        c = self.mask_in_chans
        self.mask_downscaling = [
            nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="mask_down_conv1"),
            LayerNorm2d(c // 4, dtype=self.dtype, name="mask_down_ln1"),
            nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="mask_down_conv2"),
            LayerNorm2d(c, dtype=self.dtype, name="mask_down_ln2"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    name="mask_down_conv3"),
        ]

    def get_dense_pe(self) -> jax.Array:
        return self.pe_layer(self.image_embedding_size)[None]

    def __call__(self, points, boxes, masks):
        """points: (coords (B, N, 2), labels (B, N)); boxes: (B, N, 4);
        masks: (B, H, W). Returns (sparse (B, T, D), dense (B, h, w, D))."""
        parts = []
        bs = None
        if points is not None:
            coords, labels = points
            bs = coords.shape[0]
            coords = coords + 0.5
            if boxes is None:
                coords = jnp.concatenate(
                    [coords, jnp.zeros((bs, 1, 2), coords.dtype)], axis=1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((bs, 1), labels.dtype)], axis=1)
            pe = self.pe_layer.forward_with_coords(coords, self.input_image_size)
            lbl = labels[..., None]
            pe = jnp.where(lbl == Label.NULL, self.not_a_point_embed[0], pe)
            pe = jnp.where(lbl == Label.NEGATIVE, pe + self.point_embeddings[0], pe)
            pe = jnp.where(lbl == Label.POSITIVE, pe + self.point_embeddings[1], pe)
            parts.append(pe)
        if boxes is not None:
            bs = boxes.shape[0]
            corners = (boxes + 0.5).reshape(bs, -1, 2, 2)
            pe = self.pe_layer.forward_with_coords(corners, self.input_image_size)
            corner_emb = jnp.stack(
                [self.point_embeddings[2], self.point_embeddings[3]], axis=0)
            pe = pe + corner_emb[None, None]
            parts.append(pe.reshape(bs, -1, self.embed_dim))
        sparse = (jnp.concatenate(parts, axis=1) if parts
                  else jnp.zeros((1, 0, self.embed_dim)))

        if masks is not None:
            x = masks[..., None].astype(self.dtype)
            conv1, ln1, conv2, ln2, conv3 = self.mask_downscaling
            x = nn.gelu(ln1(conv1(x)))
            x = nn.gelu(ln2(conv2(x)))
            dense = conv3(x)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[0][None, None, None],
                ((bs or 1), h, w, self.embed_dim))
        return sparse, dense


class SamMaskDecoder(nn.Module):
    """SAM's original decoder (reference: mask_decoder.py:23-165)."""

    transformer_dim: int
    transformer: nn.Module
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        td = self.transformer_dim
        self.num_mask_tokens = self.num_multimask_outputs + 1
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, td))
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, td))
        self.up_conv1 = nn.ConvTranspose(td // 4, (2, 2), strides=(2, 2),
                                         transpose_kernel=True, dtype=self.dtype)
        self.up_ln = LayerNorm2d(td // 4, dtype=self.dtype)
        self.up_conv2 = nn.ConvTranspose(td // 8, (2, 2), strides=(2, 2),
                                         transpose_kernel=True, dtype=self.dtype)
        self.output_hypernetworks_mlps = [
            MLP(hidden_dim=td, output_dim=td // 8, num_layers=3,
                dtype=self.dtype, name=f"hyper_mlp_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            hidden_dim=self.iou_head_hidden_dim,
            output_dim=self.num_mask_tokens,
            num_layers=self.iou_head_depth, dtype=self.dtype)

    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool,
                 *, deterministic: bool = True):
        bs = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None],
                              (bs,) + output_tokens.shape),
             sparse_prompt_embeddings], axis=1)

        src = jnp.broadcast_to(image_embeddings, (bs,) + image_embeddings.shape[1:]) \
            + dense_prompt_embeddings
        hs, src_out = self.transformer(src, image_pe, tokens,
                                       deterministic=deterministic)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]

        h, w = src.shape[1:3]
        upscaled = src_out.reshape(bs, h, w, self.transformer_dim)
        upscaled = nn.gelu(self.up_ln(self.up_conv1(upscaled)))
        upscaled = nn.gelu(self.up_conv2(upscaled))

        hyper = jnp.stack([
            mlp(mask_tokens_out[:, i]) for i, mlp in
            enumerate(self.output_hypernetworks_mlps)], axis=1)  # (B, T, d8)
        masks = jnp.einsum("btd,bhwd->bthw", hyper, upscaled,
                           preferred_element_type=jnp.float32)
        iou_pred = self.iou_prediction_head(iou_token_out)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


class Sam(nn.Module):
    """(reference: sam.py:21-183)."""

    image_encoder: nn.Module
    prompt_encoder: SamPromptEncoder
    mask_decoder: SamMaskDecoder
    image_size: int = 1024
    mask_threshold: float = 0.0

    def __call__(self, batched_input: Dict[str, Any],
                 multimask_output: bool = False, *, deterministic: bool = True):
        images = batched_input[BatchKeys.IMAGES]  # (B, H, W, 3)
        embeddings = self.image_encoder(images)
        points = None
        if BatchKeys.PROMPT_POINTS in batched_input:
            points = (batched_input[BatchKeys.PROMPT_POINTS],
                      batched_input[BatchKeys.FLAG_POINTS])
        boxes = batched_input.get(BatchKeys.PROMPT_BBOXES)
        masks = batched_input.get(BatchKeys.PROMPT_MASKS)
        sparse, dense = self.prompt_encoder(points, boxes, masks)
        seg, iou = self.mask_decoder(
            embeddings, self.prompt_encoder.get_dense_pe(), sparse, dense,
            multimask_output, deterministic=deterministic)
        s = self.image_size
        seg = resize_bilinear(seg, (s, s))
        return {ResultDict.LOGITS: seg, "iou_predictions": iou}


class AdaptedSam(Sam):
    """LAM-batch adapter (reference: sam.py:186-365): runs SAM once per
    (example, class) with that class's prompts; merges per-class binary masks
    into multi-class logits (bg = -max(fg))."""

    mask_size: int = 256

    def __call__(self, batch: Dict[str, Any], multimask_output: bool = False,
                 *, deterministic: bool = True):
        # consumes the RAW episode batch: prompt tensors carry the full
        # N-image axis (query at slot 0 with its own annotations)
        images = batch[BatchKeys.IMAGES]  # (B, N, H, W, 3)
        b, m = images.shape[:2]
        c = batch[BatchKeys.FLAG_EXAMPLES].shape[2]
        flat_images = images.reshape((b * m,) + images.shape[2:])
        embeddings = self.image_encoder(flat_images)  # (BM, h, w, D)
        d = embeddings.shape[-1]
        h, w = embeddings.shape[1:3]
        # per (b, m, class) binary prediction, bg class excluded
        emb_rep = jnp.repeat(embeddings, c - 1, axis=0)

        points = (
            batch[BatchKeys.PROMPT_POINTS][:, :, 1:].reshape(b * m * (c - 1), -1, 2),
            batch[BatchKeys.FLAG_POINTS][:, :, 1:].reshape(b * m * (c - 1), -1),
        )
        boxes = batch[BatchKeys.PROMPT_BBOXES][:, :, 1:].reshape(
            b * m * (c - 1), -1, 4)
        sparse, dense = self.prompt_encoder(points, boxes, None)
        seg, _ = self.mask_decoder(
            emb_rep, self.prompt_encoder.get_dense_pe(), sparse, dense,
            multimask_output=False, deterministic=deterministic)
        seg = seg[:, 0].reshape(b, m, c - 1, *seg.shape[2:])[:, 0]  # query slot
        bg = -jnp.max(seg, axis=1, keepdims=True)
        seg = jnp.concatenate([bg, seg], axis=1)
        s = self.image_size
        seg = resize_bilinear(seg, (s, s))
        return {ResultDict.LOGITS: seg}


def build_sam(encoder_builder, image_size: int = 1024, patch_size: int = 16,
              adapted: bool = False, dtype=jnp.float32, **kwargs):
    """(reference: build_sam.py)."""
    from .transformer import TwoWayTransformer

    embed_dim = 256
    grid = image_size // patch_size
    cls = AdaptedSam if adapted else Sam
    return cls(
        image_encoder=encoder_builder(dtype=dtype),
        prompt_encoder=SamPromptEncoder(
            embed_dim=embed_dim, image_embedding_size=(grid, grid),
            input_image_size=(image_size, image_size), mask_in_chans=16,
            dtype=dtype),
        mask_decoder=SamMaskDecoder(
            transformer_dim=embed_dim,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=embed_dim, mlp_dim=2048, num_heads=8,
                dtype=dtype),
            dtype=dtype),
        image_size=image_size,
    )


def build_sam_vit_b(**kwargs):
    from .build_encoder import build_vit_b

    return build_sam(build_vit_b, **kwargs)


def build_sam_vit_l(**kwargs):
    from .build_encoder import build_vit_l

    return build_sam(build_vit_l, **kwargs)


def build_sam_vit_h(**kwargs):
    from .build_encoder import build_vit_h

    return build_sam(build_vit_h, **kwargs)


def build_asam_vit_b(**kwargs):
    return build_sam_vit_b(adapted=True, **kwargs)
