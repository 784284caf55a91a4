"""Image resize ops with PyTorch-compatible sampling semantics.

The reference postprocess path (reference: label_anything/models/lam.py:383-452)
relies on ``F.interpolate(mode="bilinear", align_corners=False)``. JAX's
``jax.image.resize`` with ``antialias=False`` uses the same half-pixel-center
convention, which we verify against torch in the test-suite.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: Sequence[int], spatial_axes=(-2, -1)) -> jax.Array:
    """Bilinear resize of the two ``spatial_axes`` to ``size`` (H, W).

    Matches torch ``align_corners=False`` / no antialiasing semantics.
    """
    axes = [a % x.ndim for a in spatial_axes]
    shape = list(x.shape)
    shape[axes[0]] = int(size[0])
    shape[axes[1]] = int(size[1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def resize_nearest(x: jax.Array, size: Sequence[int], spatial_axes=(-2, -1)) -> jax.Array:
    axes = [a % x.ndim for a in spatial_axes]
    shape = list(x.shape)
    shape[axes[0]] = int(size[0])
    shape[axes[1]] = int(size[1])
    return jax.image.resize(x, shape, method="nearest")


def adaptive_avg_pool(x: jax.Array, out_hw: Sequence[int]) -> jax.Array:
    """Adaptive average pooling over the trailing two axes of (..., H, W).

    Equivalent to ``torch.nn.functional.adaptive_avg_pool2d``: output bin
    ``i`` averages input rows ``[floor(i*H/out), ceil((i+1)*H/out))``.
    Implemented as two dense pooling matmuls so it stays static-shaped and
    MXU-friendly for any (H, out) combination.
    """
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])

    def pool_matrix(n_in: int, n_out: int) -> jax.Array:
        starts = (jnp.arange(n_out) * n_in) // n_out
        ends = -((-(jnp.arange(n_out) + 1) * n_in) // n_out)  # ceil
        idx = jnp.arange(n_in)[None, :]
        member = (idx >= starts[:, None]) & (idx < ends[:, None])
        weights = member / (ends - starts)[:, None]
        return weights.astype(x.dtype)  # (n_out, n_in)

    ph = pool_matrix(h, oh)
    pw = pool_matrix(w, ow)
    x = jnp.einsum("...hw,oh->...ow", x, ph)
    x = jnp.einsum("...hw,ow->...ho", x, pw)
    # note: second einsum output axes are (..., oh, ow)
    return x
