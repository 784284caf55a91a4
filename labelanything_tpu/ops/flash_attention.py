"""Pallas TPU attention kernels.

Two kernels share one structure (score tile resident in VMEM, one-shot
softmax per q-block — at SAM's sequence lengths (<= 4096 tokens) the full
K/V of one (batch, head) slice fits in VMEM, so no streaming accumulator is
needed):

* ``flash_attention``: plain attention. Saves the HBM round-trip of the
  (Q, K) score matrix.
* ``flash_attention_relpos``: SAM/ViTDet global attention with decomposed
  relative-position bias (reference: label_anything/models/image_encoder.py:
  340-376). The naive formulation materializes TWO (B, heads, HW, HW) fp32
  tensors (bias + scores) — 6.4 GB for ViT-B @1024px batch 8, an HBM OOM on
  v5e. Here the bias is reconstructed per tile from the tiny factored terms
  rel_h (BH, HW, H) and rel_w (BH, HW, W):
      bias[q, (kh, kw)] = rel_h[q, kh] + rel_w[q, kw]
  so nothing quadratic ever touches HBM.

Backward passes recompute with the XLA formulation (flash recompute-VJP);
for rel-pos training the XLA path materializes the bias per-block — fine at
training batch sizes, and the LAM trainval configs freeze/skip the image
encoder anyway (lam_no_vit).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 256

# Toggled by tests to run the kernels in Pallas interpret mode on CPU, so the
# grid/block logic is covered without TPU hardware.
_INTERPRET = False


def _pick_block_q(q_len: int) -> int:
    """Largest q-block (multiple of the 128-row MXU tile) dividing q_len.

    The grid is ``q_len // block_q`` with no tail masking, so block_q MUST
    divide q_len (round 1 silently left the tail rows unwritten for q_len
    divisible by 128 but not 256, e.g. 1152). Callers gate on
    ``q_len % 128 == 0``; short sequences run as one block."""
    if q_len <= _BLOCK_Q:
        return q_len
    for cand in (_BLOCK_Q, 128):
        if q_len % cand == 0:
            return cand
    raise ValueError(f"flash attention requires q_len % 128 == 0, got {q_len}")


# --------------------------------------------------------------------- #
# plain attention
# --------------------------------------------------------------------- #

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


def _pick_group(bh: int) -> int:
    """Rows per grid step for the short-sequence batched kernel: small
    windows one-per-step drown in per-matmul latency (measured ~10ms for
    SAM's 2400x196 windows); batching ~24 windows per step cut that ~25%."""
    for cand in (24, 16, 12, 8, 6, 4, 3, 2):
        if bh % cand == 0:
            return cand
    return 1


def _attn_kernel_batched(q_ref, k_ref, v_ref, o_ref):
    """(G, N, D) blocks: scale pre-folded into q by the caller."""
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o / denom).astype(o_ref.dtype)


def _flash_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    b, h, q_len, d = q.shape
    k_len = k.shape[-2]
    bh = b * h
    q3 = q.reshape(bh, q_len, d)
    k3 = k.reshape(bh, k_len, d)
    v3 = v.reshape(bh, k_len, d)

    if q_len <= _BLOCK_Q and q_len == k_len:
        # short sequences (SAM windows): batch G rows per grid step
        g = _pick_group(bh)
        q3 = (q3.astype(jnp.float32) * scale).astype(q.dtype)
        out = pl.pallas_call(
            _attn_kernel_batched,
            out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v.dtype),
            grid=(bh // g,),
            in_specs=[pl.BlockSpec((g, q_len, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((g, q_len, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(q3, k3, v3)
        return out.reshape(b, h, q_len, d)

    block_q = _pick_block_q(q_len)
    assert q_len % block_q == 0, (q_len, block_q)
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
        interpret=_INTERPRET,
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


# --------------------------------------------------------------------- #
# fused decomposed rel-pos attention (SAM global attention)
# --------------------------------------------------------------------- #

def _onehot_expand(kh: int, kw: int):
    """[e_h; e_w]: (Kh+Kw, Kh*Kw) one-hot rows so a SINGLE (BQ, Kh+Kw)
    matmul expands bias[q, kh*Kw+kw] = rh[q, kh] + rw[q, kw] onto the flat
    key axis (Mosaic cannot shape-cast the score tile to 3D; the combined
    matmul has a 128-wide inner dim for Kh=Kw=64, twice the MXU occupancy
    of two separate 64-dim matmuls — measured ~16% faster global layers)."""
    k_len = kh * kw
    lane = jax.lax.broadcasted_iota(jnp.int32, (kh, k_len), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (kh, k_len), 0)
    e_h = (lane // kw == row).astype(jnp.float32)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (kw, k_len), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, k_len), 0)
    e_w = (lane_w % kw == row_w).astype(jnp.float32)
    return jnp.concatenate([e_h, e_w], axis=0)


def _relpos_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                   *, kh: int, kw: int):
    """Scale is pre-folded into q by the caller (saves one full elementwise
    pass over the quadratic score tile)."""
    q = q_ref[0].astype(jnp.float32)           # (BQ, D)
    k = k_ref[0].astype(jnp.float32)           # (K, D)
    v = v_ref[0]                               # (K, D)
    r = jnp.concatenate([rh_ref[0], rw_ref[0]], axis=1).astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (BQ, Kh*Kw)
    s = s + jax.lax.dot_general(
        r, _onehot_expand(kh, kw),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _relpos_kernel_batched(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                           *, kh: int, kw: int):
    """(G, N, ...) blocks for short windows; scale pre-folded into q."""
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    r = jnp.concatenate(
        [rh_ref[...], rw_ref[...]], axis=2).astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(
        r, _onehot_expand(kh, kw),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o / denom).astype(o_ref.dtype)


def _relpos_fwd_impl(q, k, v, rel_h, rel_w, scale: float,
                     grid_hw: Tuple[int, int]):
    """q/k/v: (BH, HW, D); rel_h: (BH, HW, H); rel_w: (BH, HW, W)."""
    bh, q_len, d = q.shape
    kh, kw = grid_hw
    k_len = kh * kw
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # fold the scale

    if q_len <= _BLOCK_Q:
        g = _pick_group(bh)
        return pl.pallas_call(
            functools.partial(_relpos_kernel_batched, kh=kh, kw=kw),
            out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v.dtype),
            grid=(bh // g,),
            in_specs=[
                pl.BlockSpec((g, q_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, k_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, k_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, q_len, kh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, q_len, kw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, q_len, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(q, k, v, rel_h, rel_w)

    block_q = _pick_block_q(q_len)
    assert q_len % block_q == 0, (q_len, block_q)
    grid = (bh, q_len // block_q)

    return pl.pallas_call(
        functools.partial(_relpos_kernel, kh=kh, kw=kw),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kw), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len * k_len * d,
            bytes_accessed=(3 * bh * q_len * d + rel_h.size + rel_w.size)
            * q.dtype.itemsize,
            transcendentals=bh * q_len * k_len,
        ),
        interpret=_INTERPRET,
    )(q, k, v, rel_h, rel_w)


def _relpos_xla_ref(q, k, v, rel_h, rel_w, scale, grid_hw):
    kh, kw = grid_hw
    bh, q_len, d = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(bh, q_len, kh * kw)
    p = jax.nn.softmax(s + bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_relpos(q, k, v, rel_h, rel_w, scale: float,
                           grid_hw: Tuple[int, int]):
    """Fused SAM global attention. q/k/v (BH, HW, D); rel factored biases."""
    return _relpos_fwd_impl(q, k, v, rel_h, rel_w, scale, grid_hw)


def _relpos_fwd(q, k, v, rel_h, rel_w, scale, grid_hw):
    return _relpos_fwd_impl(q, k, v, rel_h, rel_w, scale, grid_hw), (
        q, k, v, rel_h, rel_w)


def _relpos_bwd(scale, grid_hw, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda a, b, c, rh, rw: _relpos_xla_ref(a, b, c, rh, rw, scale, grid_hw),
        q, k, v, rel_h, rel_w,
    )
    return vjp(g)


flash_attention_relpos.defvjp(_relpos_fwd, _relpos_bwd)
