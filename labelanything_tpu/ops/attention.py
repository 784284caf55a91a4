"""Scaled dot-product attention with TPU-friendly dispatch.

The hot attention paths of the framework all route through
:func:`dot_product_attention`, so the Pallas flash-attention kernel (see
:mod:`labelanything_tpu.ops.flash_attention`) can be switched in centrally for
large, tile-aligned sequence lengths while small/ragged shapes fall back to a
plain XLA einsum (which XLA fuses well on the MXU anyway).

Shapes follow the (batch, heads, tokens, head_dim) convention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Tokens below this bound never benefit from a custom kernel: the whole
# (q, k) score matrix fits comfortably in VMEM and XLA fuses it already.
_FLASH_MIN_TOKENS = 1024
_NEG_INF = float("-inf")


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Multi-head attention core.

    Args:
      q: (B, H, Q, Dh) queries.
      k: (B, H, K, Dh) keys.
      v: (B, H, K, Dh) values.
      bias: optional additive attention bias broadcastable to (B, H, Q, K);
        use ``-inf`` entries for masking.
      scale: score scale; defaults to ``1/sqrt(Dh)``.
      use_flash: force the Pallas flash kernel on/off; default auto.

    Returns:
      (B, H, Q, Dh) attention output in the dtype of ``v``.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = 1.0 / (head_dim ** 0.5)

    q_len, k_len = q.shape[-2], k.shape[-2]
    if use_flash is None:
        use_flash = (
            _on_tpu()
            and bias is None
            and q_len >= _FLASH_MIN_TOKENS
            and k_len >= _FLASH_MIN_TOKENS
            and q_len % 128 == 0
            and k_len % 128 == 0
            and head_dim in (32, 64, 128, 256)
        )
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, bias, scale)


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Convert a boolean validity mask (True = attend) to an additive bias."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), _NEG_INF, dtype))
