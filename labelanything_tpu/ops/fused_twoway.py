"""Fused TwoWayTransformer kernel — the decode-path hot loop.

The prompt-encoder fusion (reference: label_anything/models/
prompt_encoder.py:671-694 runs the SAM TwoWayTransformer per (example,
class) instance; transformer at reference transformer.py:157-330) is ~80%
of decode cost. Its arithmetic is small — ~0.4 GFLOP per instance: the
heavy tensors are (S=900, 256) image tokens hit by 128-wide downsampled
projections — but the XLA graph is ~50 ops per layer (4 attentions with
head splits at dh=16/32, 4 LayerNorms, residuals, transposes), each a
separate HBM round trip over the 44 MB instance batch, and none of the
matmuls is big enough to hide its neighbors. Measured utilization of the
fusion stage: ~6% MFU.

This kernel runs the ENTIRE transformer (both TwoWayAttentionBlocks + the
final token-to-image attention + every LayerNorm) for one instance per
grid step, keeping the (S, 256) keys tile and all weights (~5 MB) in VMEM
throughout: HBM traffic collapses to one read + one write of the instance
batch plus a one-time weight load.

Attention with tiny heads (dh = 16 after the SAM downsample) is hostile to
the MXU if computed per head. Instead ALL heads are computed in one pair
of matmuls via block-diagonal operand expansion:

    S_all = qp @ KD        KD (I, H*Mk)  = kp^T tiled per head, rows
                           outside head h's dh-slice zeroed — so column
                           block h is exactly qp_h @ kp_h^T
    out   = P_norm @ VD    VD (H*Mk, I)  = vp tiled per head with the
                           same masks — column slice h receives P_h @ vp_h

The H-fold FLOP blowup only touches score/PV matmuls whose minimum cost is
microscopic (Mq or Mk is the ~16-token sparse axis); the well-shaped
(900, 256) x (256, 128) projections dominate and run once. Softmax is
segment-wise over each head's Mk-lane block: one row-global bounded shift
(valid per segment — any per-row constant is), exp2, segment sums by a
0/1 matmul, reciprocal multiply.

Constraints (gated in models/transformer.py): no dropout, no query mask,
shared positional source across instances (image_pe batch 1 — always true
in the prompt encoder, which broadcasts one pos grid).

Backward = XLA recompute of the same math (custom_vjp), like every other
kernel here.

MEASURED NEGATIVE RESULT — kernel DISABLED (_ENABLE = False), kept for the
record like ops/fused_window.py. On the v5e chip:

  * isolated (scripts/microbench_twoway.py, 96 inst x S=900 N=8 D=256
    bf16): fused 5.49 ms vs unfused 5.50 ms — exactly nothing.
  * end-to-end decode bench: 2705 eps/s fused vs 3193-3358 unfused
    (0.83x), both for the 1-instance/grid-step and the G-instances/step
    restructure.

Why the VMEM-residency argument fails: with one (or G) instance(s) per
grid step, every op inside the step is tiny (the biggest matmul is
900x256 @ 256x128 = 59 MFLOP, ~0.3 us of MXU), and the ~60-op chain per
step runs SERIALLY on the one tensor core with no cross-step overlap
beyond the input double-buffer — ~1 us/op of issue overhead dominates.
The unfused XLA path runs the same chain at (96*900, 256) batched shapes,
~100 us/op, overlapping each op's HBM traffic with its neighbor's
compute; its LayerNorm/residual chains are already fusion-merged by XLA.
The decode fusion stage is latency/bandwidth-bound, not traffic-bound at
kernel-visible granularity: beating XLA here would need a token-block
grid with cross-block reductions for the token->image attention (a
flash-style 2-pass per layer), not instance-grain fusion.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634

# Tests toggle CPU interpret mode, mirroring flash_attention._INTERPRET.
_INTERPRET = False
# Disabled: measured no faster than the XLA path in isolation and 0.83x
# end-to-end (see module header). Tests force-enable to keep it correct.
_ENABLE = False

# params-tuple layout per Attention: (Wq, bq, Wk, bk, Wv, bv, Wo, bo)
_ATTN_N = 8
# per TwoWayAttentionBlock: self_attn, norm1, cross_t2i, norm2,
# mlp(lin1, lin2), norm3, cross_i2t, norm4
_LAYER_N = _ATTN_N * 3 + 2 * 4 + 4


def twoway_param_count(depth: int) -> int:
    return depth * _LAYER_N + _ATTN_N + 2


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=-1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
    return (xf - u) * jax.lax.rsqrt(s + eps) * scale + bias


def _seg_masks(heads: int, dh: int, mk: int):
    """(I, H*Mk) 0/1 head mask M[c, h*Mk + t] = [c in head h's dh-slice] and
    (H*Mk, H) segment-sum matrix."""
    i = heads * dh
    c = jax.lax.broadcasted_iota(jnp.int32, (i, heads * mk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (i, heads * mk), 1)
    head_of_c = c // dh
    head_of_col = col // mk
    mask = (head_of_c == head_of_col).astype(jnp.float32)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (heads * mk, heads), 0)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (heads * mk, heads), 1)
    seg = (col2 // mk == h2).astype(jnp.float32)
    return mask, seg


def _attention(q3, k3, v3, params, heads: int, dtype):
    """All-heads attention via block-diagonal expansion over G batched
    instances. q3 (G, Mq, D), k3/v3 (G, Mk, D) fp32; returns (G, Mq, D).

    The projections run ONCE at M = G*Mq / G*Mk (MXU-shaped); only the
    score/softmax/PV core — whose FLOPs are microscopic (one of Mq/Mk is
    the ~16-token sparse axis) — loops per instance, and the G chains are
    data-independent so Mosaic interleaves them across engine gaps."""
    wq, bq, wk, bk, wv, bv, wo, bo = [p.astype(jnp.float32) for p in params]
    i = wq.shape[1]
    dh = i // heads
    g_, mq, d = q3.shape
    mk = k3.shape[1]
    scale = dh ** -0.5

    qp = jnp.dot(q3.reshape(g_ * mq, d), wq,
                 preferred_element_type=jnp.float32) + bq     # (G*Mq, I)
    kp = jnp.dot(k3.reshape(g_ * mk, d), wk,
                 preferred_element_type=jnp.float32) + bk
    vp = jnp.dot(v3.reshape(g_ * mk, d), wv,
                 preferred_element_type=jnp.float32) + bv
    qp = qp * (scale * _LOG2E)

    mask, seg = _seg_masks(heads, dh, mk)            # (I, H*Mk), (H*Mk, H)
    outs = []
    for g in range(g_):
        qg = qp[g * mq:(g + 1) * mq]
        kg = kp[g * mk:(g + 1) * mk]
        vg = vp[g * mk:(g + 1) * mk]
        kd = jnp.tile(kg.T, (1, heads)) * mask       # (I, H*Mk)
        vd = jnp.tile(vg, (heads, 1)) * mask.T       # (H*Mk, I)
        s = jnp.dot(qg, kd, preferred_element_type=jnp.float32)
        # row-global bounded shift (Cauchy-Schwarz; constant per row, so
        # every segment's softmax is exact — see flash_attention.py)
        q_norm = jnp.sqrt(jnp.sum(qg * qg, axis=-1, keepdims=True))
        k_norm = jnp.sqrt(jnp.max(jnp.sum(kd * kd, axis=0)))
        p = jnp.exp2(s - q_norm * k_norm)
        sums = jnp.dot(p, seg, preferred_element_type=jnp.float32)
        inv = 1.0 / jnp.maximum(sums, jnp.finfo(jnp.float32).tiny)
        p = p * jnp.dot(inv, seg.T, preferred_element_type=jnp.float32)
        outs.append(jnp.dot(p.astype(dtype), vd.astype(dtype),
                            preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=0)              # (G*Mq, I)
    out = jnp.dot(out, wo, preferred_element_type=jnp.float32) + bo
    return out.reshape(g_, mq, d)


def _mlp(x, w1, b1, w2, b2, act):
    g_, n, d = x.shape
    h = jnp.dot(x.reshape(g_ * n, d), w1.astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = act(h)
    out = jnp.dot(h, w2.astype(jnp.float32),
                  preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return out.reshape(g_, n, d)


def _twoway_math(keys0, q0, key_pe, params, *, depth: int, heads: int,
                 act, dtype):
    """The full transformer on fp32 (G, S, D)/(G, N, D) operands; shared by
    the Pallas kernel body (G = instances per grid step) and the XLA
    recompute reference (G = full batch). ``key_pe`` is (S, D), shared."""
    key_pe = key_pe[None]
    it = iter(params)

    def take(n):
        return tuple(next(it) for _ in range(n))

    queries = q0
    keys = keys0
    for layer in range(depth):
        self_p = take(_ATTN_N)
        n1 = take(2)
        t2i = take(_ATTN_N)
        n2 = take(2)
        mlp_p = take(4)
        n3 = take(2)
        i2t = take(_ATTN_N)
        n4 = take(2)
        if layer == 0:
            queries = _attention(queries, queries, queries, self_p, heads,
                                 dtype)
        else:
            q = queries + q0
            queries = queries + _attention(q, q, queries, self_p, heads,
                                           dtype)
        queries = _ln(queries, n1[0].astype(jnp.float32),
                      n1[1].astype(jnp.float32))
        q = queries + q0
        k = keys + key_pe
        queries = queries + _attention(q, k, keys, t2i, heads, dtype)
        queries = _ln(queries, n2[0].astype(jnp.float32),
                      n2[1].astype(jnp.float32))
        queries = queries + _mlp(queries, *mlp_p, act)
        queries = _ln(queries, n3[0].astype(jnp.float32),
                      n3[1].astype(jnp.float32))
        q = queries + q0
        k = keys + key_pe
        keys = keys + _attention(k, q, queries, i2t, heads, dtype)
        keys = _ln(keys, n4[0].astype(jnp.float32),
                   n4[1].astype(jnp.float32))

    fin = take(_ATTN_N)
    nf = take(2)
    q = queries + q0
    k = keys + key_pe
    queries = queries + _attention(q, k, keys, fin, heads, dtype)
    queries = _ln(queries, nf[0].astype(jnp.float32),
                  nf[1].astype(jnp.float32))
    return queries, keys


def _pick_g(b: int, cap: int = 8) -> int:
    """Instances per grid step: largest divisor of b up to ``cap``. One
    instance per step serializes ~60 small dependent ops (measured 2696
    eps/s vs 3265 unfused); batching restores MXU-shaped projections and
    gives the scheduler independent attention chains to interleave."""
    best = 1
    for cand in range(2, cap + 1):
        if b % cand == 0:
            best = cand
    return best


def _twoway_kernel(keys_ref, q0_ref, pe_ref, *rest, depth: int, heads: int,
                   act, n_params: int):
    params = [r[...] for r in rest[:n_params]]
    q_out, k_out = rest[n_params], rest[n_params + 1]
    keys0 = keys_ref[...].astype(jnp.float32)
    q0 = q0_ref[...].astype(jnp.float32)
    key_pe = pe_ref[...].astype(jnp.float32)
    queries, keys = _twoway_math(keys0, q0, key_pe, params, depth=depth,
                                 heads=heads, act=act, dtype=k_out.dtype)
    q_out[...] = queries.astype(q_out.dtype)
    k_out[...] = keys.astype(k_out.dtype)


def _fused_impl(keys, queries, key_pe, params, depth, heads, act):
    b, s, d = keys.shape
    n = queries.shape[1]
    g = _pick_g(b)
    n_params = len(params)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    inst = lambda shape: pl.BlockSpec((g,) + shape, lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    q_o, k_o = pl.pallas_call(
        functools.partial(_twoway_kernel, depth=depth, heads=heads, act=act,
                          n_params=n_params),
        out_shape=(jax.ShapeDtypeStruct((b, n, d), queries.dtype),
                   jax.ShapeDtypeStruct((b, s, d), keys.dtype)),
        grid=(b // g,),
        in_specs=[inst((s, d)), inst((n, d)), full((s, d))]
        + [full(p.shape) for p in params],
        out_specs=(inst((n, d)), inst((s, d))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(keys, queries, key_pe, *params)
    return q_o, k_o


def _fused_xla_ref(keys, queries, key_pe, params, depth, heads, act):
    q_o, k_o = _twoway_math(
        keys.astype(jnp.float32), queries.astype(jnp.float32),
        key_pe.astype(jnp.float32), params, depth=depth, heads=heads,
        act=act, dtype=keys.dtype)
    return q_o.astype(queries.dtype), k_o.astype(keys.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_twoway_transformer(keys, queries, key_pe, params,
                             depth: int, heads: int, act):
    """Run the whole TwoWayTransformer in one pallas_call per instance.

    Args:
      keys: (B, S, D) flattened image tokens per instance.
      queries: (B, N, D) initial sparse tokens (also the query pos source,
        exactly as in TwoWayTransformer.__call__).
      key_pe: (S, D) image positional encoding, shared by all instances.
      params: flat tuple in _twoway_math order (models/transformer.py
        _fused_params builds it with checkpoint-identical naming).
      depth, heads, act: static transformer config.

    Returns (queries, keys) like the module."""
    return _fused_impl(keys, queries, key_pe, params, depth, heads, act)


def _fwd(keys, queries, key_pe, params, depth, heads, act):
    return (_fused_impl(keys, queries, key_pe, params, depth, heads, act),
            (keys, queries, key_pe, params))


def _bwd(depth, heads, act, res, g):
    keys, queries, key_pe, params = res
    _, vjp = jax.vjp(
        lambda k, q, pe, p: _fused_xla_ref(k, q, pe, p, depth, heads, act),
        keys, queries, key_pe, params)
    return vjp(g)


fused_twoway_transformer.defvjp(_fwd, _bwd)
