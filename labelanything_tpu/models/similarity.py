"""Training-free cosine-similarity few-shot baseline
(reference: label_anything/models/similarity.py:9-207).

For every query pixel and class, the logit is the maximum cosine similarity
to any support pixel belonging to that class; the background class covers
support pixels with no foreground mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_nearest
from ..typing import BatchKeys, ResultDict

_NEG_INF = float("-inf")


class SimilarityFewShotSegmenter(nn.Module):
    encoder: Optional[nn.Module] = None
    similarity: str = "cosine"
    image_size: Optional[int] = None
    custom_preprocess: bool = False
    compare_size: Optional[int] = None

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        if self.similarity != "cosine":
            raise NotImplementedError("only cosine similarity is supported")

        if BatchKeys.EMBEDDINGS in batch:
            embeddings = batch[BatchKeys.EMBEDDINGS]  # (B, M, H, W, D)
        else:
            if self.encoder is None:
                raise ValueError("Encoder is None and no embeddings provided")
            images = batch[BatchKeys.IMAGES]
            b, m = images.shape[:2]
            flat = self.encoder(images.reshape((-1,) + images.shape[2:]))
            embeddings = flat.reshape((b, m) + flat.shape[1:])
        b, m = embeddings.shape[:2]

        if self.compare_size is not None:
            cs = self.compare_size
            flat = embeddings.reshape((-1,) + embeddings.shape[2:])
            flat = resize_bilinear(flat, (cs, cs), spatial_axes=(1, 2))
            embeddings = flat.reshape((b, m) + flat.shape[1:])
        else:
            cs = embeddings.shape[2]

        query = embeddings[:, 0]       # (B, H, W, D)
        support = embeddings[:, 1:]    # (B, M-1, H, W, D)
        query = query / jnp.maximum(
            jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
        support = support / jnp.maximum(
            jnp.linalg.norm(support, axis=-1, keepdims=True), 1e-12)

        prompt_masks = batch[BatchKeys.PROMPT_MASKS]  # (B, M-1, C, Hm, Wm)
        b_, m1, c = prompt_masks.shape[:3]
        pm = resize_nearest(
            prompt_masks.reshape((-1,) + prompt_masks.shape[3:]), (cs, cs)
        ).reshape(b_, m1, c, cs * cs)
        bg = (pm[:, :, 1:].sum(axis=2) == 0).astype(pm.dtype)
        pm = jnp.concatenate([bg[:, :, None], pm[:, :, 1:]], axis=2)

        h, w = query.shape[1:3]
        q = query.reshape(b, h * w, -1)
        s = support.reshape(b, m1, cs * cs, -1)
        sim = jnp.einsum("bqd,bmkd->bqmk", q, s,
                         preferred_element_type=jnp.float32)

        # per-class max over support pixels of that class
        logits = []
        for n in range(c):
            class_mask = pm[:, :, n, :][:, None]  # (B, 1, M1, K)
            msim = jnp.where(class_mask > 0, sim, _NEG_INF)
            logits.append(msim.reshape(b, h * w, -1).max(axis=-1))
        seg = jnp.stack(logits, axis=1).reshape(b, c, h, w)

        s_out = self.image_size or cs
        seg = resize_bilinear(seg, (s_out, s_out))
        if BatchKeys.DIMS in batch and self.image_size is not None:
            from .lam import Lam, get_preprocess_shape

            dims = batch[BatchKeys.DIMS].reshape(b, -1, 2)[:, 0]
            if self.custom_preprocess:
                ih, iw = get_preprocess_shape(dims[:, 0], dims[:, 1], s_out)
                rows = jnp.arange(s_out)[None, :] < ih[:, None]
                cols = jnp.arange(s_out)[None, :] < iw[:, None]
                valid = rows[:, :, None] & cols[:, None, :]
                seg = jnp.where(valid[:, None], seg, _NEG_INF)
                bg0 = jnp.where(valid, seg[:, 0], 0.0)
                seg = jnp.concatenate([bg0[:, None], seg[:, 1:]], axis=1)
        return {ResultDict.LOGITS: seg}


def build_similarity(encoder=None, similarity="cosine", image_size=None,
                     custom_preprocess=False, compare_size=None, **kwargs):
    return SimilarityFewShotSegmenter(
        encoder=encoder, similarity=similarity, image_size=image_size,
        custom_preprocess=custom_preprocess, compare_size=compare_size)
