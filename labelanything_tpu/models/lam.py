"""LAM: Label-Anything Model top-level module
(reference: label_anything/models/lam.py).

TPU-first deviations from the reference, all behaviour-preserving for
training/eval protocols:

  * **Fixed-frame postprocess.** The reference interpolates logits to each
    sample's original resolution inside ``forward`` (dynamic output shapes,
    reference: lam.py:383-452). Here the jit-compiled forward returns logits
    in the fixed ``image_size`` frame with the padded region set to ``-inf``
    (background forced to 0), and ground truths are rasterized into the same
    frame by the host pipeline. Exact original-resolution logits for eval
    parity are produced by :func:`labelanything_tpu.inference.postprocess_to_original`
    on the host.
  * **Static prompt modalities.** ``prepare_prompts`` keys on dict membership
    only; the host sampler guarantees a modality key is present iff it is
    active for the batch (the reference branches on runtime flag contents,
    reference: lam.py:214-240).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict
from .common import LayerNorm2d

_NEG_INF = float("-inf")


def get_preprocess_shape(oldh, oldw, long_side_length):
    """Long-side resize shape (reference: data/utils.py:441-449). Works on
    python ints and jnp arrays alike."""
    scale = long_side_length * 1.0 / jnp.maximum(
        jnp.asarray(oldh, jnp.float32), jnp.asarray(oldw, jnp.float32)
    )
    newh = jnp.floor(oldh * scale + 0.5).astype(jnp.int32)
    neww = jnp.floor(oldw * scale + 0.5).astype(jnp.int32)
    return newh, neww


class Neck(nn.Module):
    """image_embed_dim -> embed_dim projection neck
    (reference: build_lam.py:150-171)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.embed_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = LayerNorm2d(self.embed_dim, dtype=self.dtype, name="ln1")(x)
        x = nn.Conv(self.embed_dim, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = LayerNorm2d(self.embed_dim, dtype=self.dtype, name="ln2")(x)
        return x


class Lam(nn.Module):
    """End-to-end multi-class few-shot segmentation model
    (reference: lam.py:24-453)."""

    prompt_encoder: nn.Module
    mask_decoder: nn.Module
    image_encoder: Optional[nn.Module] = None
    neck: Optional[nn.Module] = None
    image_size: int = 1024
    custom_preprocess: bool = True

    def prepare_query_example_embeddings(
        self, batched_input: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        """(reference: lam.py:138-170). Embeddings/images are (B, N, H, W, C)
        channels-last; index 0 along N is the query. A pyramid-cache dict
        ``{"stageN": (B, N, H, W, C)}`` is fused by the is_pyramids neck."""
        if BatchKeys.EMBEDDINGS in batched_input:
            embeddings = batched_input[BatchKeys.EMBEDDINGS]
            if isinstance(embeddings, dict):
                embeddings = self._fuse_pyramid(embeddings)
            else:
                b, n = embeddings.shape[:2]
                if self.neck is not None:
                    flat = embeddings.reshape((b * n,) + embeddings.shape[2:])
                    flat = self.neck(flat)
                    embeddings = flat.reshape((b, n) + flat.shape[1:])
        elif BatchKeys.IMAGES in batched_input:
            images = self._maybe_normalize(batched_input)
            b, n = images.shape[:2]
            flat = images.reshape((b * n,) + images.shape[2:])
            flat = self.image_encoder(flat)
            if self.neck is not None:
                flat = self.neck(flat)
            embeddings = flat.reshape((b, n) + flat.shape[1:])
        else:
            raise ValueError("Either 'images' or 'embeddings' must be provided.")
        return embeddings[:, 0], embeddings[:, 1:]

    def _maybe_normalize(self, batched_input) -> jax.Array:
        """uint8 ingest path: pixels ship unnormalized (4x fewer bytes) and
        CustomNormalize's semantics run on device (ops/image_norm.py;
        reference host op: data/transforms.py:27-46)."""
        from ..ops.image_norm import maybe_normalize_images

        return maybe_normalize_images(
            batched_input[BatchKeys.IMAGES], batched_input[BatchKeys.DIMS],
            self.image_size, self.custom_preprocess,
            resized_dims=batched_input.get(BatchKeys.RESIZED_DIMS))

    def _fuse_pyramid(self, pyramid: Dict[str, jax.Array]) -> jax.Array:
        """Fuse a {"stageN": (B, N, H, W, C)} pyramid-cache dict through the
        is_pyramids neck (reference: build_lam.py:172-178)."""
        first = next(iter(pyramid.values()))
        b, n = first.shape[:2]
        flat = {k: v.reshape((b * n,) + v.shape[2:]) for k, v in pyramid.items()}
        fused = self.neck(flat)
        return fused.reshape((b, n) + fused.shape[1:])

    def prepare_embeddings(self, batched_input: Dict[str, jax.Array]) -> jax.Array:
        if BatchKeys.EMBEDDINGS in batched_input:
            embeddings = batched_input[BatchKeys.EMBEDDINGS]
            if isinstance(embeddings, dict):
                return self._fuse_pyramid(embeddings)
            b, n = embeddings.shape[:2]
            if self.neck is not None:
                flat = embeddings.reshape((b * n,) + embeddings.shape[2:])
                flat = self.neck(flat)
                embeddings = flat.reshape((b, n) + flat.shape[1:])
            return embeddings
        if BatchKeys.IMAGES in batched_input:
            images = self._maybe_normalize(batched_input)
            b, n = images.shape[:2]
            flat = images.reshape((b * n,) + images.shape[2:])
            flat = self.image_encoder(flat)
            if self.neck is not None:
                flat = self.neck(flat)
            return flat.reshape((b, n) + flat.shape[1:])
        raise ValueError("Either 'images' or 'embeddings' must be provided.")

    @staticmethod
    def prepare_prompts(batched_input: Dict[str, jax.Array]):
        """Static modality selection (see module docstring)."""
        points = boxes = masks = None
        if BatchKeys.PROMPT_POINTS in batched_input:
            points = (
                batched_input[BatchKeys.PROMPT_POINTS],
                batched_input[BatchKeys.FLAG_POINTS],
            )
        if BatchKeys.PROMPT_BBOXES in batched_input:
            boxes = (
                batched_input[BatchKeys.PROMPT_BBOXES],
                batched_input[BatchKeys.FLAG_BBOXES],
            )
        if BatchKeys.PROMPT_MASKS in batched_input:
            masks = (
                batched_input[BatchKeys.PROMPT_MASKS],
                batched_input[BatchKeys.FLAG_MASKS],
            )
        return points, boxes, masks, batched_input[BatchKeys.FLAG_EXAMPLES]

    def get_dense_pe(self) -> jax.Array:
        return self.prompt_encoder.get_dense_pe()

    def _forward(self, batched_input, *, deterministic=True):
        query_embeddings, prompt_embeddings = self.prepare_query_example_embeddings(
            batched_input
        )
        points, boxes, masks, flag_examples = self.prepare_prompts(batched_input)
        pe_result = self.prompt_encoder(
            image_embeddings=prompt_embeddings,
            points=points,
            boxes=boxes,
            masks=masks,
            flag_examples=flag_examples,
            deterministic=deterministic,
        )
        seg = self.mask_decoder(
            query_embeddings=query_embeddings,
            support_embeddings=prompt_embeddings,
            image_pe=self.get_dense_pe(),
            pe_result=pe_result,
            flag_examples=flag_examples,
            deterministic=deterministic,
        )
        return seg, pe_result

    def __call__(self, batched_input: Dict[str, Any], *, deterministic: bool = True):
        seg, pe_result = self._forward(batched_input, deterministic=deterministic)
        seg = self.postprocess_masks_fixed(seg, batched_input[BatchKeys.DIMS])
        if BatchKeys.FLAG_GTS in batched_input:
            flag_gts = batched_input[BatchKeys.FLAG_GTS]
            seg = jnp.where(flag_gts[:, :, None, None], seg, _NEG_INF)
        result = {
            ResultDict.LOGITS: seg,
            ResultDict.EXAMPLES_CLASS_EMBS: pe_result[ResultDict.EXAMPLES_CLASS_EMBS],
        }
        if ResultDict.MASK_EMBEDDINGS in pe_result:
            result[ResultDict.MASK_EMBEDDINGS] = pe_result[ResultDict.MASK_EMBEDDINGS]
        return result

    def generate_class_embeddings(self, example_dict, *, deterministic: bool = True):
        """(reference: lam.py:349-361)."""
        prompt_embeddings = self.prepare_embeddings(example_dict)
        points, boxes, masks, flag_examples = self.prepare_prompts(example_dict)
        return self.prompt_encoder(
            image_embeddings=prompt_embeddings,
            points=points,
            boxes=boxes,
            masks=masks,
            flag_examples=flag_examples,
            deterministic=deterministic,
        )

    def predict(self, batched_input, class_embeddings, *, deterministic: bool = True):
        """Decode the query image against cached class embeddings
        (reference: lam.py:362-382)."""
        query_embeddings = self.prepare_embeddings(batched_input)[:, 0]
        seg = self.mask_decoder(
            query_embeddings=query_embeddings,
            support_embeddings=None,
            image_pe=self.get_dense_pe(),
            pe_result=class_embeddings,
            flag_examples=None,
            deterministic=deterministic,
        )
        return self.postprocess_masks_fixed(seg, batched_input[BatchKeys.DIMS])

    def raw_decode(self, batched_input, class_embeddings, *,
                   deterministic: bool = True) -> jax.Array:
        """Decoder-resolution logits for cached class embeddings (the
        pre-postprocess counterpart of ``predict``, used by host-side
        original-resolution evaluation)."""
        query_embeddings = self.prepare_embeddings(batched_input)[:, 0]
        return self.mask_decoder(
            query_embeddings=query_embeddings,
            support_embeddings=None,
            image_pe=self.get_dense_pe(),
            pe_result=class_embeddings,
            flag_examples=None,
            deterministic=deterministic,
        )

    def postprocess_masks_fixed(self, seg: jax.Array, dims: jax.Array) -> jax.Array:
        """Upscale logits to the fixed ``image_size`` frame and -inf-mask the
        per-sample padding region (bg forced to 0), matching the reference's
        unpad semantics without dynamic shapes (reference: lam.py:383-452).

        seg: (B, C, h, w); dims: (B, N, 2) original (H, W) — row 0 is the
        query image's size.

        Under bf16 compute the interpolation + pad-mask run in bf16: the
        decoder's (B, C, 120, 120) logits are fp32 accumulations of bf16
        operands, and writing the 16x-larger upscaled map in fp32 doubles
        the postprocess HBM bill for precision the inputs never had
        (measured 0.349 -> 0.153 ms at decode shapes,
        scripts/microbench_post.py; the loss upcasts logits on entry).
        ``LA_TPU_POSTPROCESS_FP32=1`` restores the fp32 path for A/B —
        read at TRACE time (like LA_TPU_DISABLE_FUSED_BWD): set it before
        the first compilation; flipping it later has no effect on already-
        jitted programs. Numerics bound: tests/test_postprocess_bf16.py
        asserts the bf16 branch's logits stay within bf16 ulp of fp32 and
        the episode argmax/mIoU delta is ~0 (measured value in PERF.md).
        """
        s = self.image_size
        if (getattr(self.mask_decoder, "dtype", jnp.float32) == jnp.bfloat16
                and os.environ.get("LA_TPU_POSTPROCESS_FP32", "0") != "1"):
            seg = seg.astype(jnp.bfloat16)
        seg = resize_bilinear(seg, (s, s))
        if not self.custom_preprocess:
            return seg
        qdims = dims.reshape(dims.shape[0], -1, 2)[:, 0, :]
        ih, iw = get_preprocess_shape(qdims[:, 0], qdims[:, 1], s)
        rows = jnp.arange(s)[None, :] < ih[:, None]  # (B, S)
        cols = jnp.arange(s)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]  # (B, S, S)
        # single fused pass: pad fill is 0 for the bg channel, -inf for the
        # rest (the reference's where + concat makes two extra full copies
        # of the logits — at 480px that is ~90 MB of HBM traffic per step)
        c = seg.shape[1]
        fill = jnp.full((c,), _NEG_INF, seg.dtype).at[0].set(0.0)
        return jnp.where(valid[:, None], seg, fill[None, :, None, None])


class BinaryLam(Lam):
    """Per-class binary decomposition (reference: lam.py:456-528).

    Runs the base model once per foreground class with a (bg, class-c)
    two-class episode and merges the per-class logits: each pixel's background
    logit is gathered from the binary run whose foreground logit won.
    The reference dynamically gathers only examples flagged for class c; here
    all M examples are kept with flags zeroed instead (static shapes — masked
    pooling gives the same class embeddings).
    """

    def _build_class_input(self, x: Dict[str, jax.Array], c: int):
        sel = [0, c]
        out = dict(x)
        for key in (BatchKeys.PROMPT_MASKS, BatchKeys.PROMPT_BBOXES,
                    BatchKeys.PROMPT_POINTS, BatchKeys.FLAG_MASKS,
                    BatchKeys.FLAG_BBOXES, BatchKeys.FLAG_POINTS,
                    BatchKeys.FLAG_EXAMPLES):
            if key in x:
                out[key] = x[key][:, :, sel]
        out.pop(BatchKeys.FLAG_GTS, None)
        return out

    def __call__(self, batched_input: Dict[str, Any], *, deterministic: bool = True):
        flag_examples = batched_input[BatchKeys.FLAG_EXAMPLES]
        b, m, c = flag_examples.shape
        logits = []
        embeddings_dim = None
        for ci in range(1, c):
            seg, pe_result = self._forward(
                self._build_class_input(batched_input, ci),
                deterministic=deterministic,
            )
            embeddings_dim = pe_result[ResultDict.EXAMPLES_CLASS_EMBS].shape[-1]
            logits.append(seg)
        logits = jnp.stack(logits, axis=1)  # (B, C-1, 2, h, w)
        fg = logits[:, :, 1]
        bgs = logits[:, :, 0]
        # bg logit of the winning class per pixel, as a one-hot contraction:
        # per-pixel take_along_axis lowers to a scalarized gather loop on
        # TPU (see train/losses._class_onehot). Clamp first: 0 * -inf from a
        # NON-selected lane would poison the sum with NaN (take_along_axis
        # was immune to garbage in unselected lanes).
        bgs = jnp.maximum(bgs, jnp.finfo(bgs.dtype).min)
        sel = jax.nn.one_hot(jnp.argmax(fg, axis=1), c - 1, axis=1,
                             dtype=bgs.dtype)
        bg = (bgs * sel).sum(axis=1, keepdims=True)
        seg = jnp.concatenate([bg, fg], axis=1)
        seg = self.postprocess_masks_fixed(seg, batched_input[BatchKeys.DIMS])
        if BatchKeys.FLAG_GTS in batched_input:
            seg = jnp.where(
                batched_input[BatchKeys.FLAG_GTS][:, :, None, None], seg, _NEG_INF
            )
        return {
            ResultDict.LOGITS: seg,
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((b, m, c, embeddings_dim)),
        }
