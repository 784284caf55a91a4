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
    pixels excluded.

    Computed as a one-hot contraction (an MXU matmul) rather than
    ``bincount``: scatter-adds lower to scalarized loops on TPU, the same
    pathology as per-pixel gathers (see losses._class_onehot). The einsum
    keeps the batch axis and sums per-sample matrices as INTEGERS: fp32
    counting is exact only to 2^24, which one cell of a large
    background-dominated eval batch can exceed; per-sample cells are
    bounded by H*W (<= 2^24 up to 4096px)."""
    return confusion_matrix_per_sample(preds, target, num_classes).sum(axis=0)


def confusion_matrix_per_sample(preds: jax.Array, target: jax.Array,
                                num_classes: int) -> jax.Array:
    """Per-sample (B, C, C) episode confusion matrices — the device half of
    the train loop's metric accumulation: the host folds these tiny
    matrices through the per-sample episode->global class LUT
    (experiment/run.py fold_global_confusion) instead of fetching full-
    resolution predictions every step (reference gathers preds every
    log_frequency: experiment/run.py:374-389)."""
    valid = target != IGNORE_INDEX
    t = jnp.where(valid, target, 0)
    p = jnp.clip(preds, 0, num_classes - 1)
    classes = jnp.arange(num_classes, dtype=t.dtype)
    oh_t = (t[..., None] == classes).astype(jnp.float32) * valid[..., None]
    oh_p = (p[..., None] == classes).astype(jnp.float32)
    cm = jnp.einsum("bhwc,bhwd->bcd", oh_t, oh_p)
    return jnp.round(cm).astype(jnp.int32)


def fold_confusion_global(cm_ps: jax.Array, lut: jax.Array,
                          num_global: int) -> jax.Array:
    """Fold per-sample EPISODE confusion matrices (B, C_ep, C_ep) through
    per-sample episode->global class LUTs (B, C_ep) into one (G, G) int32
    global matrix — the DEVICE counterpart of the host
    ``fold_global_confusion`` (experiment/run.py), numerically identical.

    Computed per sample in fp32 (cells bounded by H*W <= 2^24, exact) and
    summed over the batch as integers, so large batches at high resolution
    never cross fp32's exact-count range. Keeping this inside the jitted
    train pass removes the per-step device->host confusion fetch — over a
    tunneled link a ~24 ms round trip per pass (reference gathers every
    log_frequency: experiment/run.py:374-389)."""
    classes = jnp.arange(num_global, dtype=lut.dtype)
    oh = (lut[..., None] == classes).astype(jnp.float32)     # (B, Cp, G)
    per = jnp.einsum("bpg,bpq,bqh->bgh", oh,
                     cm_ps.astype(jnp.float32), oh)
    return jnp.round(per).astype(jnp.int32).sum(axis=0)


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
    """Reference ``StrictMeanIoU`` (utils/metrics.py:28-37), replicated
    EXACTLY for protocol parity: torchmetrics-1.7.1 macro mIoU over PRESENT
    classes, then ``(macro * C_total - bg_iou) / (C_total - 1)`` where
    ``C_total`` is the full confmat size — NOT the present-class count.
    The two differ whenever any global class is absent from the eval
    (early-epoch train windows, short val runs); matching the published
    protocol requires the reference's formula, quirk included. When the
    background class itself has no support the reference yields NaN; here
    bg_iou clamps to 0 (never hit in practice — bg is always present)."""
    iou, valid = iou_per_class(confmat)
    macro = iou.sum() / jnp.maximum(valid.sum(), 1)
    c = confmat.shape[0]
    bg_union = confmat[0, 0] + confmat[0, 1:].sum() + confmat[1:, 0].sum()
    bg_iou = confmat[0, 0] / jnp.maximum(bg_union, 1)
    return (macro * c - bg_iou) / (c - 1)


def binary_confusion_matrix(preds: jax.Array, target: jax.Array) -> jax.Array:
    """FB-IoU statistics: everything > 0 is foreground
    (reference: utils/metrics.py:44-51). One-hot contraction, not bincount
    (see confusion_matrix)."""
    valid = target != IGNORE_INDEX
    p = (preds > 0).astype(jnp.float32)
    t = (jnp.where(valid, target, 0) > 0).astype(jnp.float32)
    v = valid.astype(jnp.float32)
    oh_t = jnp.stack([(1.0 - t) * v, t * v], axis=-1)
    oh_p = jnp.stack([1.0 - p, p], axis=-1)
    cm = jnp.einsum("bhwc,bhwd->bcd", oh_t, oh_p)  # per-sample: fp32-exact
    return jnp.round(cm).astype(jnp.int32).sum(axis=0)


def fb_iou(confmat2: jax.Array) -> jax.Array:
    """Binary (foreground/background) Jaccard from a 2x2 confusion matrix —
    torchmetrics BinaryJaccardIndex computes IoU of the positive class."""
    tp = confmat2[1, 1]
    union = confmat2[1, 0] + confmat2[0, 1] + tp
    return tp / jnp.maximum(union, 1)


# ---- host (NumPy) mirrors -------------------------------------------- #
# The train/val loops accumulate confusion matrices on the HOST (tiny
# LUT-folded int64 arrays); computing the scalar metrics through the jnp
# versions would dispatch ~15 micro-ops to the device per log line — over
# a tunneled TPU that is milliseconds of stall per log_frequency window.
# These mirrors are the same formulas in NumPy, bit-equal in fp64-vs-fp32
# tolerance (tests/test_metrics.py).

def _np_iou_per_class(confmat):
    import numpy as _np

    cm = _np.asarray(confmat, dtype=_np.float64)
    tp = _np.diagonal(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - tp
    valid = union > 0
    iou = _np.where(valid, tp / _np.maximum(union, 1), 0.0)
    return iou, valid


def mean_iou_np(confmat) -> float:
    iou, valid = _np_iou_per_class(confmat)
    return float(iou.sum() / max(valid.sum(), 1))


def strict_mean_iou_np(confmat) -> float:
    import numpy as _np

    iou, valid = _np_iou_per_class(confmat)
    macro = iou.sum() / max(valid.sum(), 1)
    cm = _np.asarray(confmat, dtype=_np.float64)
    c = cm.shape[0]
    bg_union = cm[0, 0] + cm[0, 1:].sum() + cm[1:, 0].sum()
    bg_iou = cm[0, 0] / max(bg_union, 1)
    return float((macro * c - bg_iou) / (c - 1))


def fb_iou_np(confmat2) -> float:
    import numpy as _np

    cm = _np.asarray(confmat2, dtype=_np.float64)
    tp = cm[1, 1]
    union = cm[1, 0] + cm[0, 1] + tp
    return float(tp / max(union, 1))


# --------------------------------------------------------------------- #
# PANet / DENet / ASNet mIoU variants + aux metrics
# (reference: label_anything/utils/metrics.py:54-392, label_anything/metrics.py)
# --------------------------------------------------------------------- #

import numpy as np


class PmIoU:
    """PANet-protocol mean IoU (reference: utils/metrics.py:54-168 PmIoU).

    Per sample and class, TP/FP/FN are counted ONLY when the class appears
    in that sample's target (absent classes contribute NaN in the reference
    and are skipped here); IoU is summed-statistics per class, then averaged
    over the requested label set."""

    def __init__(self, max_label: int = 20):
        self.n = max_label + 1
        self.tp = np.zeros(self.n)
        self.fp = np.zeros(self.n)
        self.fn = np.zeros(self.n)
        self.present = np.zeros(self.n, bool)

    def update(self, pred: np.ndarray, target: np.ndarray):
        pred, target = np.asarray(pred), np.asarray(target)
        if pred.ndim == 3:
            for i in range(pred.shape[0]):
                self.update(pred[i], target[i])
            return
        valid = target != IGNORE_INDEX
        for label in range(self.n):
            t = target == label
            if not t.any():
                continue
            p = (pred == label) & valid
            self.present[label] = True
            self.tp[label] += np.sum(p & t)
            self.fp[label] += np.sum(p & ~t)
            self.fn[label] += np.sum(t & ~p)

    def compute(self, labels=None) -> float:
        labels = np.asarray(labels if labels is not None
                            else range(1, self.n))
        keep = labels[self.present[labels]]
        if keep.size == 0:
            return float("nan")
        iou = self.tp[keep] / (self.tp[keep] + self.fp[keep] + self.fn[keep])
        return float(iou.mean())


def dm_iou(confmat: jax.Array, eps: float = 1e-8) -> jax.Array:
    """DENet-protocol mean IoU (reference: utils/metrics.py:216-254 DmIoU):
    plain mean over ALL classes (bg included) with an eps-clipped union, so
    absent classes contribute 0 rather than being skipped."""
    tp = jnp.diagonal(confmat).astype(jnp.float32)
    union = confmat.sum(axis=0) + confmat.sum(axis=1) - jnp.diagonal(confmat)
    iu = tp / jnp.clip(union.astype(jnp.float32), eps, None)
    return jnp.mean(iu)


class ImIoU:
    """ASNet-protocol mean IoU (reference: utils/metrics.py:258-360 ImIoU):
    per-episode intersection/union histograms over local ids are scattered
    onto global class slots; mIoU = mean over the classes of interest of
    inter / max(union, 1)."""

    def __init__(self, class_ids, nclass: int = 20):
        self.class_ids = np.asarray(class_ids)
        self.inter = np.zeros(nclass + 1)
        self.union = np.zeros(nclass + 1)

    def update(self, pred: np.ndarray, target: np.ndarray,
               class_map: np.ndarray):
        """pred/target (H, W) in local ids 0..way; class_map (way+1,) maps
        local -> global (index 0 = bg)."""
        way = len(class_map) - 1
        pred, target = np.asarray(pred), np.asarray(target)
        in_range = lambda x: (x >= 0) & (x <= way)
        inter = np.bincount(
            pred[(pred == target) & in_range(pred)].astype(int),
            minlength=way + 1)[: way + 1]
        a_p = np.bincount(pred[in_range(pred)].astype(int),
                          minlength=way + 1)[: way + 1]
        a_t = np.bincount(target[in_range(target)].astype(int),
                          minlength=way + 1)[: way + 1]
        union = a_p + a_t - inter
        np.add.at(self.inter, class_map, inter)
        np.add.at(self.union, class_map, union)

    def compute(self) -> float:
        inter = self.inter[self.class_ids]
        union = self.union[self.class_ids]
        return float(np.mean(inter / np.maximum(union, 1.0)))


def macro_f1(confmat: jax.Array) -> jax.Array:
    """Macro F1 over classes with support (torchmetrics F1Score
    macro semantics, reference: label_anything/metrics.py F1)."""
    tp = jnp.diagonal(confmat)
    fp = confmat.sum(axis=0) - tp
    fn = confmat.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    valid = denom > 0
    f1 = jnp.where(valid, 2 * tp / jnp.maximum(denom, 1), 0.0)
    return f1.sum() / jnp.maximum(valid.sum(), 1)


class StreamingBinaryAUC:
    """Binary AUROC from score histograms (reference:
    label_anything/metrics.py AUC wraps torchmetrics AUROC). Scores are
    bucketed into ``bins`` thresholds; AUC comes from the trapezoidal ROC
    integral — exact when scores take <= bins distinct values, otherwise
    within O(1/bins)."""

    def __init__(self, bins: int = 512):
        self.bins = bins
        self.pos = np.zeros(bins)
        self.neg = np.zeros(bins)

    def update(self, scores: np.ndarray, target: np.ndarray):
        """scores in [0, 1]; target binary {0, 1}."""
        scores = np.clip(np.asarray(scores).reshape(-1), 0.0, 1.0)
        target = np.asarray(target).reshape(-1)
        idx = np.minimum((scores * self.bins).astype(int), self.bins - 1)
        self.pos += np.bincount(idx[target == 1], minlength=self.bins)
        self.neg += np.bincount(idx[target == 0], minlength=self.bins)

    def compute(self) -> float:
        # descending-threshold cumulative TPR/FPR
        tp = np.cumsum(self.pos[::-1])
        fp = np.cumsum(self.neg[::-1])
        if tp[-1] == 0 or fp[-1] == 0:
            return float("nan")
        tpr = np.concatenate([[0.0], tp / tp[-1]])
        fpr = np.concatenate([[0.0], fp / fp[-1]])
        return float(np.trapezoid(tpr, fpr))
