"""Segmentation metrics as pure confusion-matrix functions
(reference: label_anything/utils/metrics.py:28-52).

Design: each jitted eval step returns a (C, C) confusion-matrix contribution;
accumulation is a pytree sum, so cross-device reduction is a single ``psum``
(the TPU equivalent of the reference's ``accelerator.gather`` + torchmetrics
sync, reference: experiment/run.py:374-389).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..typing import IGNORE_INDEX


def confusion_matrix(preds: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """(B, H, W) int preds/target -> (C, C) confusion matrix; IGNORE_INDEX
    pixels excluded."""
    valid = target != IGNORE_INDEX
    t = jnp.where(valid, target, 0)
    p = jnp.clip(preds, 0, num_classes - 1)
    idx = t * num_classes + p
    flat = jnp.where(valid, idx, num_classes * num_classes)  # overflow bin
    counts = jnp.bincount(
        flat.reshape(-1), length=num_classes * num_classes + 1
    )[:-1]
    return counts.reshape(num_classes, num_classes)


def iou_per_class(confmat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (iou (C,), support-valid mask (C,))."""
    tp = jnp.diagonal(confmat)
    union = confmat.sum(axis=0) + confmat.sum(axis=1) - tp
    valid = union > 0
    iou = jnp.where(valid, tp / jnp.maximum(union, 1), 0.0)
    return iou, valid


def mean_iou(confmat: jax.Array) -> jax.Array:
    """Macro mIoU over classes with support (torchmetrics macro semantics)."""
    iou, valid = iou_per_class(confmat)
    return iou.sum() / jnp.maximum(valid.sum(), 1)


def strict_mean_iou(confmat: jax.Array) -> jax.Array:
    """Macro mIoU with the background IoU removed from the average
    (reference: utils/metrics.py:28-37)."""
    iou, valid = iou_per_class(confmat)
    fg_iou, fg_valid = iou[1:], valid[1:]
    return fg_iou.sum() / jnp.maximum(fg_valid.sum(), 1)


def binary_confusion_matrix(preds: jax.Array, target: jax.Array) -> jax.Array:
    """FB-IoU statistics: everything > 0 is foreground
    (reference: utils/metrics.py:44-51)."""
    valid = target != IGNORE_INDEX
    p = (preds > 0).astype(jnp.int32)
    t = (jnp.where(valid, target, 0) > 0).astype(jnp.int32)
    idx = jnp.where(valid, t * 2 + p, 4)
    counts = jnp.bincount(idx.reshape(-1), length=5)[:4]
    return counts.reshape(2, 2)


def fb_iou(confmat2: jax.Array) -> jax.Array:
    """Binary (foreground/background) Jaccard from a 2x2 confusion matrix —
    torchmetrics BinaryJaccardIndex computes IoU of the positive class."""
    tp = confmat2[1, 1]
    union = confmat2[1, 0] + confmat2[0, 1] + tp
    return tp / jnp.maximum(union, 1)
