"""Pallas TPU attention kernel.

Block-tiled attention that keeps the (q_block, K) score tile entirely in VMEM,
so the score matrix never round-trips through HBM (the usual bandwidth cost of
naive attention). At the sequence lengths this framework encounters
(<= 4096 image tokens for SAM-ViT @1024px), the full K/V of one (batch, head)
slice fits comfortably in VMEM, so a one-shot softmax per q-block is both
simpler and faster than a streaming flash loop.

The backward pass recomputes attention with the plain XLA formulation: at
these sequence lengths recompute-based VJP is memory-optimal and XLA fuses it
well, while keeping this kernel forward-only and simple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)          # (BQ, D)
    k = k_ref[0].astype(jnp.float32)          # (K, D)
    v = v_ref[0]                              # (K, D)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # (BQ, K)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _flash_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    b, h, q_len, d = q.shape
    k_len = k.shape[-2]
    bh = b * h
    q3 = q.reshape(bh, q_len, d)
    k3 = k.reshape(bh, k_len, d)
    v3 = v.reshape(bh, k_len, d)

    block_q = min(_BLOCK_Q, q_len)
    grid = (bh, q_len // block_q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len * k_len * d,
            bytes_accessed=(q3.size + k3.size + v3.size + bh * q_len * d) * q.dtype.itemsize,
            transcendentals=bh * q_len * k_len,
        ),
    )(q3, k3, v3)
    return out.reshape(b, h, q_len, d)


def _xla_ref(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    return _flash_fwd_impl(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_ref(a, b, c, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
