"""Segmentation losses (reference: label_anything/loss/).

All losses are pure jittable functions over (logits, target) where
``logits`` is (B, C, H, W) (may contain -inf at masked classes/pixels) and
``target`` is (B, H, W) int with IGNORE_INDEX padding. -inf logits are
neutralized through the masked softmax/CE formulations below, matching the
reference's use of ``ignore_index`` semantics.

``LabelAnythingLoss`` is a flax module (it owns the learnable SigLIP
temperature/bias of the prompt-contrastive component) mirroring the
reference's ``WrapperModule`` pattern (reference: loss/__init__.py:30-116).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..typing import BatchKeys, IGNORE_INDEX, LossDict, ResultDict


def _valid_mask(target: jax.Array) -> jax.Array:
    return target != IGNORE_INDEX


def _safe_target(target: jax.Array) -> jax.Array:
    return jnp.where(_valid_mask(target), target, 0)


def _class_onehot(target: jax.Array, num_classes: int) -> jax.Array:
    """(B, C, H, W) one-hot of the (ignore-safe) target by lane comparison.

    Per-pixel gathers (``take_along_axis`` over the class axis,
    ``table[tgt]`` weight lookups) lower to scalarized gather loops on TPU —
    measured 36 ms of a 41 ms train step at (8, 6, 480, 480). A broadcast
    compare + contraction is pure VPU work and costs <1 ms."""
    tgt = _safe_target(target)
    classes = jnp.arange(num_classes, dtype=tgt.dtype)
    return (tgt[:, None] == classes[None, :, None, None]).astype(jnp.float32)


def cross_entropy_per_pixel(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-pixel CE with -inf-safe log-softmax; ignored pixels return 0."""
    valid = _valid_mask(target)
    # -inf logits (masked classes / padding) must not poison the logsumexp
    logits = jnp.maximum(logits, jnp.finfo(logits.dtype).min)
    logp = jax.nn.log_softmax(logits, axis=1)
    oh = _class_onehot(target, logits.shape[1])
    ce = -(logp * oh).sum(axis=1)
    return jnp.where(valid, ce, 0.0)


def get_weight_matrix_from_labels(
    target: jax.Array, num_classes: int
) -> Tuple[jax.Array, jax.Array]:
    """Inverse-log-frequency pixel weights (reference: loss/utils.py:17-43).

    Returns (weight_matrix (B, H, W), class_weights (C,)).
    """
    valid = _valid_mask(target)
    onehot = _class_onehot(target, num_classes)          # (B, C, H, W)
    onehot = onehot * valid[:, None]
    counts = onehot.sum(axis=(0, 2, 3))                   # (C,)
    total = counts.sum()
    freq_w = 1.0 / jnp.log(1.1 + counts / jnp.maximum(total, 1.0))
    class_weights = jnp.where(counts > 0, freq_w, 1.0)
    # per-pixel lookup as a one-hot contraction (no TPU-hostile gather)
    weight_matrix = (onehot * class_weights[None, :, None, None]).sum(axis=1)
    weight_matrix = weight_matrix * valid
    return weight_matrix, class_weights


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    gamma: float = 2.0,
    weight_matrix: Optional[jax.Array] = None,
    **_: Any,
) -> jax.Array:
    """(reference: loss/focal.py:8-25); mean over valid pixels."""
    ce = cross_entropy_per_pixel(logits, target)
    pt = jnp.exp(-ce)
    focal = (1.0 - pt) ** gamma * ce
    if weight_matrix is not None:
        focal = focal * weight_matrix
    valid = _valid_mask(target)
    # reference uses plain mean over all pixels (ignored pixels contribute
    # 0 CE there because F.cross_entropy zeroes them before reduction='none'
    # ... actually reduction='none' keeps 0 at ignored): mean over ALL pixels
    return focal.sum() / jnp.maximum(valid.size, 1)


def dice_loss(
    logits: jax.Array,
    target: jax.Array,
    average: str = "macro",
    class_weights: Optional[jax.Array] = None,
    eps: float = 1e-6,
    **_: Any,
) -> jax.Array:
    """Sørensen-Dice loss (reference: loss/dice.py:11-123)."""
    num_classes = logits.shape[1]
    valid = _valid_mask(target)
    tgt = _safe_target(target)
    logits = jnp.maximum(logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits, axis=1)
    onehot = jax.nn.one_hot(tgt, num_classes, dtype=probs.dtype)
    onehot = onehot * valid[..., None]
    onehot = jnp.moveaxis(onehot, -1, 1)  # (B, C, H, W)

    if average == "macro":
        dims = (2, 3)
        intersection = (probs * onehot).sum(axis=dims)
        cardinality = (probs + onehot).sum(axis=dims)
        dice = (2.0 * intersection + eps) / (cardinality + eps)  # (B, C)
        loss = 1.0 - dice
        if class_weights is not None:
            loss = loss * class_weights[None, :]
        return loss.mean(axis=1).mean()
    # micro
    dims = (1, 2, 3)
    intersection = (probs * onehot).sum(axis=dims)
    cardinality = (probs + onehot).sum(axis=dims)
    dice = (2.0 * intersection + eps) / (cardinality + eps)
    return (1.0 - dice).mean()


def false_positive_loss(
    logits: jax.Array, target: jax.Array, eps: float = 1e-6, **_: Any
) -> jax.Array:
    """Suppress probability mass on classes absent from each sample's GT
    (reference: loss/fp.py:10-36)."""
    num_classes = logits.shape[1]
    valid = _valid_mask(target)
    tgt = _safe_target(target)
    onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32) * valid[..., None]
    present = onehot.sum(axis=tuple(range(1, onehot.ndim - 1))) > 0  # (B, C)
    not_included = 1.0 - present.astype(jnp.float32)

    logits = jnp.maximum(logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits, axis=1)
    fp = probs * not_included[:, :, None, None] * valid[:, None]
    fp = fp.sum(axis=1) / (not_included.sum(axis=1)[:, None, None] + eps)
    return fp.sum() / jnp.maximum(valid.sum(), 1)


def loss_orthogonality(embedding: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean |cosine| between distinct embeddings (reference: loss/utils.py:46-66)."""
    b, n = embedding.shape[:2]
    flat = embedding.reshape(b, n, -1)
    norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
    flat = flat / (norm + eps)
    sim = jnp.einsum("bnd,bmd->bnm", flat, flat)
    sim = sim * (1.0 - jnp.eye(n)[None])
    return jnp.abs(sim).sum() / (b * (n * n - n))


def class_embedding_contrastive_loss(result: Dict[str, jax.Array]) -> jax.Array:
    embs = result[ResultDict.EXAMPLES_CLASS_EMBS]
    b, m, c, d = embs.shape
    return loss_orthogonality(embs.reshape(b, m * c, d))


def prompt_contrastive_loss(
    result: Dict[str, jax.Array], t_prime: jax.Array, bias: jax.Array
) -> jax.Array:
    """SigLIP-style contrastive loss over per-example class embeddings
    (reference: loss/prompt.py:12-47)."""
    embs = result[ResultDict.EXAMPLES_CLASS_EMBS]
    flag_examples = result[BatchKeys.FLAG_EXAMPLES]
    b, m, c, d = embs.shape

    flags = flag_examples.reshape(b, m * c, 1)
    valid_elements = (flags > 0).sum(axis=1)  # (B, 1)
    pair_valid = (flags > 0) & (flags > 0).transpose(0, 2, 1)  # (B, MC, MC)
    upper = jnp.triu(jnp.ones((m * c, m * c), bool), k=1)[None]
    pair_mask = pair_valid & upper

    x = embs.reshape(b, m * c, d)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    dots = jnp.einsum("bnd,bmd->bnm", x, x) * jnp.exp(t_prime) + bias

    contrastive = jnp.tile(jnp.eye(c), (m, m))[None]  # same class across examples
    contrastive = 2.0 * contrastive - 1.0
    loss = -jax.nn.log_sigmoid(dots * contrastive)
    loss = loss / jnp.maximum(valid_elements[:, :, None], 1)
    return jnp.where(pair_mask, loss, 0.0).sum() / b


def symmetric_loss(input1: jax.Array, input2: jax.Array, labels: jax.Array,
                   t: float = 1.0, norm: bool = True) -> jax.Array:
    """CLIP-style symmetric cross-entropy (reference: loss/symmetric.py:5-21).
    ``labels`` is the identity-pairing matrix as in the reference pretraining
    loop (rows one-hot over columns)."""
    if norm:
        input1 = input1 / jnp.maximum(
            jnp.linalg.norm(input1, axis=1, keepdims=True), 1e-12)
        input2 = input2 / jnp.maximum(
            jnp.linalg.norm(input2, axis=1, keepdims=True), 1e-12)
    logits = input1 @ input2.T * jnp.exp(jnp.asarray(t, jnp.float32))

    def soft_ce(lg, lb):
        return -(jax.nn.log_softmax(lg, axis=-1) * lb).sum(axis=-1).mean()

    return 0.5 * (soft_ce(logits, labels) + soft_ce(logits.T, labels.T))


def _mask_balance_loss(mask: jax.Array, tol: float = 0.25) -> jax.Array:
    """(reference: loss/mask.py loss_balance). mask: (B, N, 1, H, W)."""
    b, n = mask.shape[:2]
    eps = 1e-6
    summed = mask.reshape(b, n, -1).sum(axis=-1)
    target = (jnp.abs(summed).sum(axis=1) / n)[:, None]
    balance = (jnp.abs(summed - target) / (target + eps)).sum(axis=1) / n
    return nn.relu(balance - tol).sum() / b


def _entropy(probabilities: jax.Array) -> jax.Array:
    eps = 1e-10
    p = probabilities + eps
    return -(p * jnp.log(p) / jnp.log(2.0)).sum(axis=-1)


def mask_embedding_loss(result: Dict[str, jax.Array],
                        alpha: float = 0.2, beta: float = 0.4,
                        gamma: float = 0.4) -> jax.Array:
    """GuidedPooler mask regularizer (reference: loss/mask.py
    MaskEmbeddingLoss): balance the per-embedding mask mass, plus entropy and
    orthogonality terms over the soft choices."""
    bg, fg = result[ResultDict.MASK_EMBEDDINGS]
    # (n, BMC, 1, H, W) -> (BMC, n, 1, H, W)
    bg = jnp.moveaxis(bg, 0, 1)
    fg = jnp.moveaxis(fg, 0, 1)
    balance = 0.5 * (_mask_balance_loss(bg) + _mask_balance_loss(fg)) * alpha

    def flat(m):
        b, n = m.shape[:2]
        return m.reshape(b, n, -1)

    entropy = 0.5 * (
        _entropy(flat(bg) / jnp.maximum(flat(bg).sum(-1, keepdims=True), 1e-6)).mean()
        + _entropy(flat(fg) / jnp.maximum(flat(fg).sum(-1, keepdims=True), 1e-6)).mean()
    ) * beta
    ortho = 0.5 * (loss_orthogonality(flat(bg)) + loss_orthogonality(flat(fg))) * gamma
    return balance + entropy + ortho


LOGITS_LOSSES = {
    "focal": focal_loss,
    "dice": dice_loss,
    "fp": false_positive_loss,
}


class LabelAnythingLoss(nn.Module):
    """Weighted loss combination (reference: loss/__init__.py:30-116).

    ``components`` maps names to kwargs dicts; each must contain ``weight``.
    Example: ``{"focal": {"weight": 1.0, "gamma": 2.0}}``.
    """

    components: Any  # Dict[str, Dict[str, Any]] — kept Any for hashability
    class_weighting: bool = False

    @nn.compact
    def __call__(self, result: Dict[str, jax.Array], target: jax.Array):
        components = dict(self.components)
        from .rmi import rmi_loss  # local import to avoid cycle

        logits_losses = {**LOGITS_LOSSES, "rmi": rmi_loss}

        logits = result[ResultDict.LOGITS] if isinstance(result, dict) else result
        # mixed-precision policy: the model computes in its configured dtype
        # (bf16 under the trained config), the loss ALWAYS reduces in fp32 —
        # log-softmax/focal terms in bf16 lose the small-probability tail
        # (reference trains through Accelerate's mixed-precision autocast,
        # which likewise keeps losses fp32: experiment/run.py:122-131)
        if logits.dtype != jnp.float32:
            logits = logits.astype(jnp.float32)
            if isinstance(result, dict):
                result = {**result, ResultDict.LOGITS: logits}
        weight_matrix = class_weights = None
        if self.class_weighting:
            weight_matrix, class_weights = get_weight_matrix_from_labels(
                target, logits.shape[1]
            )

        total = 0.0
        parts: Dict[str, jax.Array] = {}
        for name, cfg in components.items():
            cfg = dict(cfg)
            weight = cfg.pop("weight")
            if name in logits_losses:
                value = logits_losses[name](
                    logits, target,
                    weight_matrix=weight_matrix, class_weights=class_weights, **cfg
                )
            elif name == "prompt_contrastive":
                t_prime = self.param(
                    "t_prime", lambda k: jnp.log(jnp.full((1,), 10.0))
                )
                bias = self.param("bias", lambda k: jnp.full((1,), -10.0))
                value = prompt_contrastive_loss(result, t_prime, bias)
            elif name == "emb_contrastive":
                value = class_embedding_contrastive_loss(result)
            elif name == "masks":
                value = mask_embedding_loss(result, **cfg)
            else:
                raise ValueError(f"Unknown loss component {name!r}")
            parts[name] = value
            total = total + weight * value
        return {LossDict.VALUE: total, LossDict.COMPONENTS: parts}
