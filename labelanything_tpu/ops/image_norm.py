"""Device-side image normalization for the uint8 ingest path.

The reference normalizes on the host (CustomNormalize: /255, ImageNet
mean/std, bottom-right zero pad — reference: label_anything/data/
transforms.py:27-46) and ships fp32 pixels. On TPU that is 4x the
host->device bytes and three full fp32 passes on the (GIL-bound) loader
workers per image. This op moves the arithmetic into the jitted step: the
loader ships resized+padded uint8 (data/transforms.py preprocess_image with
``normalize=False``) and the model normalizes on device, bit-matching the
host semantics:

  * the valid region gets ``(u8/255 - mean) / std`` in fp32 (same op order
    as the host, so fp32 results agree to the ulp);
  * the bottom/right pad region is ZERO in the NORMALIZED frame (the host
    pads after normalizing). The valid extent per image is recomputed from
    the original (H, W) in ``BatchKeys.DIMS`` with the same round-half-up
    rule as ``get_preprocess_shape`` (data/utils.py:441-449 in the
    reference), done in exact integer arithmetic:
    ``int(h*S/m + 0.5) == (2*h*S + m) // (2*m)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD


def preprocess_shape_traced(dims: jax.Array, long_side: int):
    """Traced ``get_preprocess_shape``: dims (..., 2) int -> (nh, nw), each
    (...,) int32, using exact integer round-half-up (no fp rounding drift
    against the host's float computation)."""
    h = dims[..., 0].astype(jnp.int32)
    w = dims[..., 1].astype(jnp.int32)
    m = jnp.maximum(h, w)
    nh = (2 * h * long_side + m) // (2 * m)
    nw = (2 * w * long_side + m) // (2 * m)
    return nh, nw


def normalize_images(images: jax.Array, dims: jax.Array, long_side: int,
                     custom_preprocess: bool = True,
                     resized_dims: jax.Array | None = None) -> jax.Array:
    """uint8 (..., S, S, 3) -> normalized fp32, pad region zeroed.

    ``dims`` is the per-image original (H, W) (any leading shape matching
    ``images.shape[:-3]``); with ``custom_preprocess=False`` every image
    fills the square frame and no pad masking applies.

    ``resized_dims`` is the post-resize content extent (h, w) SHIPPED BY THE
    LOADER (BatchKeys.RESIZED_DIMS) — the exact shape the host resize
    produced, used verbatim when present. The traced re-derivation below is
    the fallback for synthetic callers (where dims are constructed and there
    is no host resize to match). A brute-force search of all near-tie
    (h, m) up to m=100000 at S=1024 found the exact-integer fallback and
    the host's f64 arithmetic always agree, but the shipped extent is exact
    BY CONSTRUCTION and immune to host-side arithmetic changes
    (advisor r4)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = images.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    if custom_preprocess:
        s = images.shape[-2]
        if resized_dims is not None:
            nh = resized_dims[..., 0].astype(jnp.int32)
            nw = resized_dims[..., 1].astype(jnp.int32)
        else:
            nh, nw = preprocess_shape_traced(dims, long_side)
        row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        valid = ((row < nh[..., None, None])
                 & (col < nw[..., None, None]))         # (..., S, S)
        x = x * valid[..., None].astype(x.dtype)
    return x


def maybe_normalize_images(images: jax.Array, dims: jax.Array,
                           long_side: int,
                           custom_preprocess: bool = True,
                           resized_dims: jax.Array | None = None) -> jax.Array:
    """Pass-through for the legacy fp32 host-normalized path; normalize on
    device when the loader shipped uint8 pixels."""
    if images.dtype == jnp.uint8:
        return normalize_images(images, dims, long_side, custom_preprocess,
                                resized_dims=resized_dims)
    return images
