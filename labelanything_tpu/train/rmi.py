"""Region Mutual Information loss (reference: label_anything/loss/rmi.py,
adapted from ZJULearning/RMI).

Fully static-shaped JAX port. The reference promotes the covariance algebra to
float64 for stability; JAX runs fp32 by default, so the Cholesky/inverse are
regularized with the same ``_POS_ALPHA`` jitter and computed in fp32 —
numerically adequate for the 9x9 (radius 3) systems involved.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..typing import IGNORE_INDEX

_CLIP_MIN = 1e-6
_POS_ALPHA = 5e-4


def _avg_pool(x: jax.Array, size: int, stride: int, padding: int) -> jax.Array:
    """torch-style count-includes-pad average pooling on (N, C, H, W)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 1, size, size),
        window_strides=(1, 1, stride, stride),
        padding=((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )
    return summed / (size * size)


def _neighbor_vectors(x: jax.Array, radius: int) -> jax.Array:
    """Stack radius x radius shifted crops: (N, C, H, W) ->
    (N, C, r*r, H-r+1, W-r+1) (reference: rmi.py:27-69)."""
    n, c, h, w = x.shape
    nh, nw = h - (radius - 1), w - (radius - 1)
    crops = [
        x[:, :, y:y + nh, xx:xx + nw]
        for y in range(radius)
        for xx in range(radius)
    ]
    return jnp.stack(crops, axis=2)


def _log_det_cholesky(m: jax.Array) -> jax.Array:
    chol = jnp.linalg.cholesky(m)
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, 1e-12)), axis=-1)


def rmi_loss(
    logits: jax.Array,
    target: jax.Array,
    rmi_radius: int = 3,
    rmi_pool_size: int = 4,
    rmi_pool_stride: int = 4,
    loss_weight_lambda: float = 0.5,
    lambda_way: int = 1,
    weight_matrix: Optional[jax.Array] = None,
    **_: Any,
) -> jax.Array:
    """(reference: rmi.py:210-434). logits (B, C, H, W); target (B, H, W)."""
    num_classes = logits.shape[1]
    label_mask = (target != IGNORE_INDEX).astype(jnp.float32)  # (B, H, W)
    tgt = jnp.where(target == IGNORE_INDEX, 0, target)
    onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
    onehot = onehot * label_mask[..., None]  # (B, H, W, C)

    # PART I: masked binary cross entropy over sigmoid(logits)
    logits = jnp.maximum(logits, jnp.finfo(logits.dtype).min)
    logits_nhwc = logits.transpose(0, 2, 3, 1)
    # bce = -[y log p + (1-y) log(1-p)], numerically via logsigmoid
    bce = -(
        onehot * jax.nn.log_sigmoid(logits_nhwc)
        + (1.0 - onehot) * jax.nn.log_sigmoid(-logits_nhwc)
    )
    pix_weight = label_mask
    if weight_matrix is not None:
        pix_weight = pix_weight * weight_matrix
    valid_pixels = label_mask.sum()
    bce_loss = (bce * pix_weight[..., None]).sum() / (valid_pixels + 1.0)

    # PART II: RMI lower bound
    probs = jax.nn.sigmoid(logits) * label_mask[:, None] + _CLIP_MIN
    labels_4d = onehot.transpose(0, 3, 1, 2)

    p, s = rmi_pool_size, rmi_pool_stride
    if s > 1:
        pad = p // 2
        labels_4d = _avg_pool(labels_4d, p, s, pad)
        probs = _avg_pool(probs, p, s, pad)

    half_d = rmi_radius * rmi_radius
    la = _neighbor_vectors(labels_4d, rmi_radius)
    pr = _neighbor_vectors(probs, rmi_radius)
    n, c = la.shape[:2]
    la = la.reshape(n, c, half_d, -1)
    pr = pr.reshape(n, c, half_d, -1)

    la = la - la.mean(axis=3, keepdims=True)
    pr = pr - pr.mean(axis=3, keepdims=True)
    la = jax.lax.stop_gradient(la)

    eye = jnp.eye(half_d)[None, None]
    la_cov = la @ la.swapaxes(2, 3)
    pr_cov = pr @ pr.swapaxes(2, 3)
    pr_cov_inv = jnp.linalg.inv(pr_cov + eye * _POS_ALPHA)
    la_pr_cov = la @ pr.swapaxes(2, 3)
    appro_var = la_cov - la_pr_cov @ pr_cov_inv @ la_pr_cov.swapaxes(2, 3)

    rmi_now = 0.5 * _log_det_cholesky(appro_var + eye * _POS_ALPHA)  # (N, C)
    rmi_per_class = rmi_now.reshape(-1, num_classes).mean(axis=0) / float(half_d)
    rmi = rmi_per_class.sum()

    if lambda_way:
        return loss_weight_lambda * bce_loss + rmi * (1.0 - loss_weight_lambda)
    return bce_loss + rmi * loss_weight_lambda
