"""PANet few-shot baseline (reference: label_anything/models/panet/ — VGG16
encoder + masked-average-pooling prototypes + scaled cosine similarity,
adapted to the LAM episode batch contract like the reference's wrapper
``panet/__init__.py:31,142``).

Eval-only vendored baseline in the reference; ported natively here so the
``parameters/validation`` competitor configs have a runnable counterpart.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_nearest
from ..typing import BatchKeys, ResultDict

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 feature extractor (conv5_3, stride 8 with dilated last stage as
    in PANet's backbone)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pool_count = 0
        conv_idx = 0
        for v in _VGG16_CFG:
            if v == "M":
                pool_count += 1
                # PANet keeps stride-8 features: only the first 3 pools stride
                stride = 2 if pool_count <= 3 else 1
                x = nn.max_pool(x, (2, 2), strides=(stride, stride),
                                padding="SAME")
            else:
                dilation = 2 if pool_count >= 4 else 1
                x = nn.Conv(v, (3, 3), kernel_dilation=(dilation, dilation),
                            padding="SAME", dtype=self.dtype,
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x


class PANet(nn.Module):
    """(reference: panet/__init__.py + panet/panet.py)."""

    image_size: int = 417
    scaler: float = 20.0
    encoder: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        encoder = self.encoder or VGG16Features(dtype=self.dtype, name="encoder")
        images = batch[BatchKeys.IMAGES]  # (B, N, H, W, 3); slot 0 = query
        b, n = images.shape[:2]
        feats = encoder(images.reshape((b * n,) + images.shape[2:]))
        fh, fw, d = feats.shape[1:]
        feats = feats.reshape(b, n, fh, fw, d)
        query, support = feats[:, 0], feats[:, 1:]          # (B, h, w, D) / (B, M, h, w, D)

        prompt_masks = batch[BatchKeys.PROMPT_MASKS]        # (B, M, C, Hm, Wm)
        c = prompt_masks.shape[2]
        masks = resize_nearest(
            prompt_masks.reshape((-1,) + prompt_masks.shape[3:]), (fh, fw)
        ).reshape(b, -1, c, fh, fw)
        m = masks.shape[1]
        support = support[:, :m]

        # masked average pooling -> per-class prototypes (bg = complement)
        fg = jnp.einsum("bmhwd,bmchw->bcd", support, masks)
        fg_norm = jnp.maximum(masks.sum(axis=(1, 3, 4)), 1e-5)[..., None]
        fg_proto = fg / fg_norm                              # (B, C, D)
        bg_mask = 1.0 - masks[:, :, 1:].max(axis=2)          # (B, M, h, w)
        bg = jnp.einsum("bmhwd,bmhw->bd", support, bg_mask)
        bg_proto = bg / jnp.maximum(bg_mask.sum(axis=(1, 2, 3)), 1e-5)[:, None]
        protos = jnp.concatenate([bg_proto[:, None], fg_proto[:, 1:]], axis=1)

        qn = query / jnp.maximum(
            jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-8)
        pn = protos / jnp.maximum(
            jnp.linalg.norm(protos, axis=-1, keepdims=True), 1e-8)
        seg = jnp.einsum("bhwd,bcd->bchw", qn, pn,
                         preferred_element_type=jnp.float32) * self.scaler
        seg = resize_bilinear(seg, (self.image_size, self.image_size))
        if BatchKeys.FLAG_GTS in batch:
            seg = jnp.where(batch[BatchKeys.FLAG_GTS][:, :, None, None],
                            seg, float("-inf"))
        return {ResultDict.LOGITS: seg}


def build_panet(image_size: int = 417, **kwargs) -> PANet:
    return PANet(image_size=image_size)


class SAMFewShotModel(nn.Module):
    """SAM + few-shot composition (reference: models/samfew.py:12-95):
    missing support mask prompts are filled by SAM predictions from the
    sparse prompts, then the episode runs through the few-shot model."""

    sam: nn.Module
    fewshot: nn.Module
    image_size: int = 1024

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        sam_out = self.sam(batch, deterministic=deterministic)
        sam_logits = sam_out[ResultDict.LOGITS]              # (B, C, S, S)
        sam_masks = (sam_logits > 0).astype(
            batch[BatchKeys.PROMPT_MASKS].dtype)
        b, m, c, hm, wm = batch[BatchKeys.PROMPT_MASKS].shape
        sam_masks = resize_nearest(sam_masks, (hm, wm))      # (B, C, Hm, Wm)
        flags = batch[BatchKeys.FLAG_MASKS][..., None, None].astype(bool)
        filled = jnp.where(
            flags, batch[BatchKeys.PROMPT_MASKS],
            jnp.broadcast_to(sam_masks[:, None],
                             batch[BatchKeys.PROMPT_MASKS].shape))
        new_batch = dict(batch)
        new_batch[BatchKeys.PROMPT_MASKS] = filled
        new_batch[BatchKeys.FLAG_MASKS] = jnp.ones_like(
            batch[BatchKeys.FLAG_MASKS])
        return self.fewshot(new_batch, deterministic=deterministic)
