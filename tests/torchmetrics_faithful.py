"""Faithful reimplementation of the torchmetrics 1.7.1 bases the reference
metrics subclass (the reference pins ``torchmetrics==1.7.1`` in uv.lock).

torchmetrics is not installed in this environment; ``tests/_reference.py``
stubs it with inert ``Metric`` bases — enough to import the reference, not
enough to run its metric protocol. This module provides update/compute
-faithful ``MulticlassJaccardIndex`` / ``BinaryJaccardIndex`` replacements
and an ``install()`` that re-binds them into the torchmetrics stub and
reloads ``label_anything.utils.metrics``, so the reference's OWN
``StrictMeanIoU.compute`` / ``DistributedBinaryJaccardIndex.update`` code
(reference: label_anything/utils/metrics.py:28-51) runs verbatim on top.

Semantics mirrored from torchmetrics 1.7.1 source:
  * ``_multiclass_confusion_matrix_update``: flatten, drop pixels where
    ``target == ignore_index``, ``bincount(C * target + preds)``.
  * ``_jaccard_index_reduce(average="macro")``: per-class IoU with
    ``_safe_divide`` (0 where the union is 0), unit weights EXCEPT classes
    absent from both confmat axes (``confmat.sum(0)+confmat.sum(1)==0``)
    which get weight 0 — i.e. macro averages over PRESENT classes only.
  * ``average="binary"``: ``cm[1,1] / (cm[0,1] + cm[1,0] + cm[1,1])``.
"""

from __future__ import annotations

import importlib
import sys

import torch


def _safe_divide(num: torch.Tensor, denom: torch.Tensor) -> torch.Tensor:
    return torch.where(denom == 0, torch.zeros_like(num, dtype=torch.float64),
                       num.double() / denom.double())


def _jaccard_index_reduce(confmat: torch.Tensor, average: str,
                          ignore_index=None) -> torch.Tensor:
    confmat = confmat.double()
    if average == "binary":
        return _safe_divide(confmat[1, 1],
                            confmat[0, 1] + confmat[1, 0] + confmat[1, 1])
    ignore_index_cond = (ignore_index is not None
                         and 0 <= ignore_index < confmat.shape[0])
    num = torch.diag(confmat)
    denom = confmat.sum(0) + confmat.sum(1) - num
    jaccard = _safe_divide(num, denom)
    if average is None or average == "none":
        return jaccard
    if average == "weighted":
        weights = confmat.sum(1)
    else:  # macro
        weights = torch.ones_like(jaccard)
        if ignore_index_cond:
            weights[ignore_index] = 0
        weights[(confmat.sum(0) + confmat.sum(1)) == 0] = 0
    return ((weights * jaccard) / weights.sum()).sum()


class MulticlassJaccardIndex(torch.nn.Module):
    def __init__(self, num_classes: int, average: str = "macro",
                 ignore_index=None, validate_args: bool = True, **kw):
        super().__init__()
        self.num_classes = num_classes
        self.average = average
        self.ignore_index = ignore_index
        self.confmat = torch.zeros(num_classes, num_classes,
                                   dtype=torch.int64)

    def update(self, preds: torch.Tensor, target: torch.Tensor) -> None:
        preds = preds.reshape(-1).long()
        target = target.reshape(-1).long()
        if self.ignore_index is not None:
            keep = target != self.ignore_index
            preds, target = preds[keep], target[keep]
        c = self.num_classes
        idx = target * c + preds
        self.confmat += torch.bincount(idx, minlength=c * c).reshape(c, c)

    def compute(self) -> torch.Tensor:
        return _jaccard_index_reduce(self.confmat, self.average,
                                     ignore_index=self.ignore_index)

    def reset(self) -> None:
        self.confmat.zero_()


class BinaryJaccardIndex(torch.nn.Module):
    def __init__(self, threshold: float = 0.5, ignore_index=None,
                 validate_args: bool = True, **kw):
        super().__init__()
        self.threshold = threshold
        self.ignore_index = ignore_index
        self.confmat = torch.zeros(2, 2, dtype=torch.int64)

    def update(self, preds: torch.Tensor, target: torch.Tensor) -> None:
        preds = preds.reshape(-1)
        target = target.reshape(-1).long()
        if preds.is_floating_point():
            preds = (preds > self.threshold).long()
        preds = preds.long()
        if self.ignore_index is not None:
            keep = target != self.ignore_index
            preds, target = preds[keep], target[keep]
        idx = target * 2 + preds
        self.confmat += torch.bincount(idx, minlength=4).reshape(2, 2)

    def compute(self) -> torch.Tensor:
        return _jaccard_index_reduce(self.confmat, "binary")

    def reset(self) -> None:
        self.confmat.zero_()


def install():
    """Re-bind the torchmetrics stub's Jaccard classes to the faithful ones
    and reload the reference metrics module, so its subclasses pick up the
    working bases. Returns the reloaded ``label_anything.utils.metrics``."""
    from tests import _reference

    _reference.setup()
    tmc = sys.modules["torchmetrics.classification"]
    tmc.MulticlassJaccardIndex = MulticlassJaccardIndex
    tmc.BinaryJaccardIndex = BinaryJaccardIndex
    sys.modules.pop("label_anything.utils.metrics", None)
    return _reference.load("label_anything.utils.metrics")
