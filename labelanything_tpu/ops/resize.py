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


def _bilinear_matrix(n_in: int, n_out: int, dtype) -> jax.Array:
    """Dense (n_out, n_in) interpolation matrix for half-pixel
    (``align_corners=False``) bilinear sampling with edge clamping — the
    exact torch / ``jax.image.resize(antialias=False)`` weight scheme. Each
    output row holds the two neighbor weights (or one, at the clamped
    edges), so ``M @ x`` IS the resize along that axis."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    w_hi = jnp.clip(pos - lo, 0.0, 1.0)
    cols = jnp.arange(n_in, dtype=jnp.float32)[None, :]
    m = ((cols == lo[:, None]) * (1.0 - w_hi[:, None])
         + (cols == hi[:, None]) * w_hi[:, None])
    return m.astype(dtype)


def resize_bilinear(x: jax.Array, size: Sequence[int], spatial_axes=(-2, -1)) -> jax.Array:
    """Bilinear resize of the two ``spatial_axes`` to ``size`` (H, W).

    Matches torch ``align_corners=False`` / no antialiasing semantics.

    Implemented as two dense interpolation matmuls: ``jax.image.resize``
    lowers to per-axis gather/pad pipelines that leave several unfused HBM
    passes on TPU (measured ~3.5x slower at decode-postprocess shapes,
    scripts/microbench_decode3.py); a (n_out, n_in) matmul rides the MXU
    and fuses with its consumers. fp32 inputs use HIGHEST matmul precision
    so results stay within fp32 rounding of the exact weights.
    """
    axes = [a % x.ndim for a in spatial_axes]
    shape = list(x.shape)
    shape[axes[0]] = int(size[0])
    shape[axes[1]] = int(size[1])
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    mh = _bilinear_matrix(x.shape[axes[0]], int(size[0]), x.dtype)
    mw = _bilinear_matrix(x.shape[axes[1]], int(size[1]), x.dtype)
    if axes == [x.ndim - 2, x.ndim - 1]:
        x = jnp.einsum("...hw,Hh->...Hw", x, mh, precision=prec)
        return jnp.einsum("...hw,Ww->...hW", x, mw, precision=prec)
    if x.ndim >= 3 and axes == [x.ndim - 3, x.ndim - 2]:
        x = jnp.einsum("...hwc,Hh->...Hwc", x, mh, precision=prec)
        return jnp.einsum("...hwc,Ww->...hWc", x, mw, precision=prec)
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


def resize_bilinear_ac(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Bilinear ``align_corners=True`` resize on channels-last (B, H, W, C)
    (torch ``F.interpolate(..., align_corners=True)`` — used by the DCAMA and
    FPTrans baselines throughout)."""
    b, h, w, c = x.shape
    nh, nw = int(size[0]), int(size[1])
    ys = jnp.linspace(0.0, h - 1.0, nh) if nh > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, w - 1.0, nw) if nw > 1 else jnp.zeros((1,))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_nearest_torch(x: jax.Array, size: Sequence[int],
                         spatial_axes=(-2, -1)) -> jax.Array:
    """torch legacy ``mode='nearest'`` semantics: src = floor(dst * in/out)
    (differs from jax.image.resize's round-half-pixel rule by one source
    pixel on exact ties)."""
    axes = sorted(a % x.ndim for a in spatial_axes)
    for axis, n_out in zip(axes, size):
        n_in = x.shape[axis]
        idx = (jnp.arange(int(n_out)) * n_in) // int(n_out)
        x = jnp.take(x, idx, axis=axis)
    return x
