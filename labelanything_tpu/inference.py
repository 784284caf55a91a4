"""Host-side exact postprocessing for evaluation parity
(reference: label_anything/models/lam.py:383-452).

The jit-compiled model returns logits in the fixed ``image_size`` frame; the
reference protocol evaluates at each image's original resolution. This module
reproduces the reference postprocess bit-for-bit on the host: bilinear resize
to model size, per-sample unpad, bilinear resize to original dims, -inf pad
to the batch max with background forced to 0.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from .data.transforms import get_preprocess_shape
from .ops.resize import resize_bilinear


def postprocess_to_original(
    seg,  # (B, C, h, w) decoder-resolution logits (pre fixed-frame masking)
    original_sizes: Sequence[Tuple[int, int]],
    image_size: int,
    custom_preprocess: bool = True,
) -> np.ndarray:
    """Exact reference postprocess. Returns (B, C, Hmax, Wmax) float32."""
    seg = np.asarray(resize_bilinear(jnp.asarray(seg), (image_size, image_size)))
    b, c = seg.shape[:2]
    max_h = max(h for h, _ in original_sizes)
    max_w = max(w for _, w in original_sizes)
    out = np.full((b, c, max_h, max_w), -np.inf, np.float32)
    for i, (h, w) in enumerate(original_sizes):
        if custom_preprocess:
            ih, iw = get_preprocess_shape(h, w, image_size)
            cropped = seg[i, :, :ih, :iw]
        else:
            cropped = seg[i]
        resized = np.asarray(resize_bilinear(jnp.asarray(cropped[None]), (h, w)))[0]
        out[i, :, :h, :w] = resized
    bg = out[:, 0]
    bg[np.isneginf(bg)] = 0.0
    return out


def predict_original_resolution(model, params, batch, class_embeddings=None):
    """Run the decoder and postprocess at original resolutions.

    ``batch`` must carry decoder inputs plus DIMS (B, N, 2). Returns
    (B, C, Hmax, Wmax) logits matching the reference's Lam.forward output."""
    import jax

    from .typing import BatchKeys

    if class_embeddings is None:
        seg, _ = jax.jit(lambda p, b: model.apply(p, b, method="_forward"))(
            params, batch)
    else:
        seg = jax.jit(lambda p, b, c: model.apply(p, b, c, method="raw_decode"))(
            params, batch, class_embeddings)
    dims = np.asarray(batch[BatchKeys.DIMS]).reshape(
        len(seg), -1, 2)[:, 0]
    return postprocess_to_original(
        seg, [tuple(d) for d in dims], model.image_size,
        model.custom_preprocess)
