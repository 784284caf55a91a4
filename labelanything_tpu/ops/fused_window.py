"""Fused windowed-attention block kernel for SAM/ViTDet windowed layers.

The reference window path (reference: label_anything/models/image_encoder.py:
134-197, 258-337) runs, per windowed transformer block:

    pad -> window_partition (6D reshape+transpose) -> qkv -> per-window
    rel-pos attention -> proj -> window_unpartition -> crop -> residual add

On TPU the attention itself is cheap at 196 tokens (~2.7 ms of a 9.1 ms
block for ViT-B @1024 batch 8); the rest is HBM glue — the partition and
unpartition transposes move the full activation with misaligned 14-wide
tiles, and qkv packing, the head-major output transpose, proj, and the
residual add each add another full pass over ~50 MB.

This kernel replaces everything between (and including) the padded qkv
tensor and the residual add with ONE pallas_call:

  * The window partition/unpartition becomes BlockSpec index maps — the
    grid is (B, Hp/ws, Wp/ws) and each step reads/writes one (ws, ws)
    spatial tile directly; no transposed copy of the stream ever exists.
  * q/k/v head slices are cut from the (T, 3C) qkv block in VMEM.
  * The decomposed rel-pos bias is folded into the score matmul by operand
    concatenation: q_cat = [q * scale * log2(e) | r], k_cat = [k | E] where
    r is the factored (T, 2*ws) bias and E the one-hot expansion with
    E[(kh, kw), j] = 1 at j == kh and j == ws + kw. The contraction grows
    dh -> dh + 2*ws (64 -> 92 for SAM), which stays inside the same 128-lane
    MXU tile — the bias matmul is literally free. (The same trick measured
    SLOWER for global attention, where 2*ws = 128 pushes the contraction to
    192 and the one-hot columns re-stream per q block; at window size 196
    the whole k_cat is VMEM-resident, so neither cost exists.)
  * Softmax uses the bounded-shift + MXU-denominator scheme of
    ops/flash_attention.py (see that module's docstring): the shift bound is
    Cauchy-Schwarz on the CONCATENATED operands (which bounds score + bias
    in one term), v gains a ones column so PV emits the denominator.
  * The output projection and the residual add run in the same kernel
    step, so attention output never round-trips HBM head-major.

The backward pass recomputes through an XLA reference formulation
(custom_vjp), matching the other flash kernels; eval/extraction dominates
this path (LAM trainval freezes the encoder).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _LOG2E, _augment_v, _finish, _shift_bound

# Toggled by tests (CPU interpret mode), mirroring flash_attention._INTERPRET.
_INTERPRET = False

# DISABLED BY DEFAULT — measured negative result (kept for the record, like
# the operand-augmentation and software-pipelining notes in
# flash_attention.py): on v5e, ViT-B @1024 batch 8, one windowed block runs
# 10.0 ms fused (one window/grid-step) and 10.9 ms row-batched, vs 9.4 ms
# for the existing partition + packed-kernel path and 17.0 ms pure XLA.
# The hypothesis that partition/unpartition transposes + proj/residual HBM
# passes cost ~3 ms/block was wrong — XLA overlaps them well — while the
# fused kernel pays real costs the split path avoids: per-(window, head)
# 64-wide lane-slice relayouts of the qkv block in VMEM, M=196->256 MXU
# padding on the fused projection (the split path projects at M=32768), and
# lost overlap between the attention kernel and neighboring XLA matmuls.
# ViTBlock uses the partition + windowed-kernel path when False.
_ENABLE = False


def _onehot_window_keys(ws: int, dtype) -> jax.Array:
    """(T, 2*ws) with [(kh, kw), j] = 1 at j == kh and at j == ws + kw, so
    bias[q, (kh, kw)] = rel_h[q, kh] + rel_w[q, kw] emerges from the score
    matmul when concatenated onto k."""
    t = ws * ws
    key = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * ws), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * ws), 1)
    e_h = (lane == key // ws).astype(dtype)
    e_w = (lane - ws == key % ws).astype(dtype)
    return e_h + e_w


def _fused_window_kernel(x_ref, qkv_ref, r_ref, e_ref, wp_ref, bp_ref, o_ref,
                         *, heads: int, scale: float):
    """One grid step = one ROW of windows: batching nw windows per step
    keeps the batched attention matmuls wide (nw*heads tiles in flight) and
    lets the fused projection run at M = nw*T (~1024 after MXU padding,
    4.5% pad waste instead of the 30% a single 196-row window pays)."""
    ws = x_ref.shape[2]
    nw = x_ref.shape[3]
    t = ws * ws
    c = x_ref.shape[-1]
    dh = c // heads
    g = nw * heads

    qkv_row = qkv_ref[0, 0]                       # (ws, nw, ws, 3C)
    r_row = r_ref[0, :, 0]                        # (heads, ws, nw, ws, 2ws)
    e = e_ref[...].astype(jnp.float32)            # (T, 2*ws)

    # per-(window, head) stacks; 64-wide lane slices relayout in VMEM
    qs, ks, vs, rs = [], [], [], []
    for w in range(nw):
        win = qkv_row[:, w].reshape(t, 3 * c)     # (T, 3C)
        for h in range(heads):
            qs.append(win[:, h * dh:(h + 1) * dh])
            ks.append(win[:, c + h * dh:c + (h + 1) * dh])
            vs.append(win[:, 2 * c + h * dh:2 * c + (h + 1) * dh])
            rs.append(r_row[h, :, w].reshape(t, 2 * ws))
    q3 = jnp.stack(qs)                            # (G, T, dh)
    k3 = jnp.stack(ks)
    v3 = jnp.stack(vs)
    r3 = jnp.stack(rs).astype(jnp.float32)        # (G, T, 2ws)

    lg = jnp.float32(scale * _LOG2E)
    q_cat = jnp.concatenate([q3.astype(jnp.float32) * lg, r3], axis=-1)
    k_cat = jnp.concatenate(
        [k3.astype(jnp.float32),
         jnp.broadcast_to(e[None], (g,) + e.shape)], axis=-1)
    v_aug = _augment_v(v3)

    m = _shift_bound(q_cat, k_cat)                # (G, T, 1)
    s = jax.lax.dot_general(q_cat, k_cat, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - m).astype(v_aug.dtype)
    o = jax.lax.dot_general(p, v_aug, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = _finish(o, dh, qkv_row.dtype)             # (G, T, dh)

    # (G, T, dh) -> (nw*T, C): lane concat per window, sublane concat rows
    att = jnp.concatenate(
        [jnp.concatenate([o[w * heads + h] for h in range(heads)], axis=-1)
         for w in range(nw)], axis=0)             # (nw*T, C)
    y = jax.lax.dot_general(
        att, wp_ref[...].astype(att.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bp_ref[...].astype(jnp.float32)
    # residual in window order, then scatter back to row-major spatial
    x_row = x_ref[0, 0]                           # (ws, nw, ws, C)
    for w in range(nw):
        y_w = y[w * t:(w + 1) * t] + x_row[:, w].reshape(t, c).astype(jnp.float32)
        o_ref[0, 0, :, w] = y_w.reshape(ws, ws, c).astype(o_ref.dtype)


def _fused_window_impl(x, qkv, r, w_proj, b_proj, scale: float, heads: int,
                       ws: int):
    b, hp, wp_, c = x.shape
    nh, nw = hp // ws, wp_ // ws
    e = _onehot_window_keys(ws, qkv.dtype)
    grid = (b, nh)
    # 6D window VIEWS: splitting Hp = nh*ws and Wp = nw*ws is layout-free,
    # and Mosaic's (8, 128) minor-dim block constraint is satisfied because
    # every block dim equals its array dim on the last two axes. One block
    # spans a full row of nw windows.
    x6 = x.reshape(b, nh, ws, nw, ws, c)
    qkv6 = qkv.reshape(b, nh, ws, nw, ws, 3 * c)
    r6 = r.reshape(b, heads, nh, ws, nw, ws, 2 * ws)
    out = pl.pallas_call(
        functools.partial(_fused_window_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, nh, ws, nw, ws, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ws, nw, ws, c),
                         lambda i, y: (i, y, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ws, nw, ws, 3 * c),
                         lambda i, y: (i, y, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, 1, ws, nw, ws, 2 * ws),
                         lambda i, y: (i, 0, y, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws * ws, 2 * ws), lambda i, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, y: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ws, nw, ws, c),
                               lambda i, y: (i, y, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * nh * nw
            * (2 * heads * ws**4 * (2 * (c // heads) + 2 * ws + 1)
               + 2 * ws**2 * c * c),
            bytes_accessed=(x.size * 2 + qkv.size + r.size) * x.dtype.itemsize,
            transcendentals=b * nh * nw * heads * ws**4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x6, qkv6, r6, e, w_proj, b_proj)
    return out.reshape(b, hp, wp_, c)


def _fused_window_xla_ref(x, qkv, r, w_proj, b_proj, scale, heads, ws):
    """XLA recompute (backward + CPU fallback): same math, window partition
    as reshape/transpose."""
    b, hp, wp_, c = x.shape
    dh = c // heads
    nh, nw = hp // ws, wp_ // ws
    t = ws * ws

    def windows(a):
        ch = a.shape[-1]
        a = a.reshape(b, nh, ws, nw, ws, ch)
        return a.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, t, ch)

    qkv_w = windows(qkv)                                     # (BW, T, 3C)
    qkv_w = qkv_w.reshape(-1, t, 3, heads, dh)
    q, k, v = jnp.moveaxis(qkv_w, 2, 0)                      # (BW, T, H, dh)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)                              # (BW, H, T, dh)
    r_w = (r.transpose(0, 2, 3, 1, 4)
           .reshape(b, nh, ws, nw, ws, heads, 2 * ws)
           .transpose(0, 1, 3, 5, 2, 4, 6)
           .reshape(b * nh * nw, heads, t, 2 * ws))
    bias = (r_w.astype(jnp.float32) / _LOG2E)
    bias = (bias[..., :ws, None] + bias[..., None, ws:]).reshape(
        bias.shape[:3] + (t,))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale + bias
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, nh, nw, ws, ws, c)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp_, c)
    y = (jnp.einsum("bhwc,cd->bhwd", o, w_proj.astype(o.dtype),
                    preferred_element_type=jnp.float32)
         + b_proj.astype(jnp.float32))
    return (y + x.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_window_attention(x, qkv, r, w_proj, b_proj, scale: float,
                           heads: int, ws: int):
    """Windowed rel-pos attention + proj + residual in one kernel.

    Args:
      x: (B, Hp, Wp, C) residual input, spatially padded to window multiples
        (pad AFTER norm1 — identical to the reference's partition padding).
      qkv: (B, Hp, Wp, 3C) qkv projection of the padded normed input;
        channel layout (3, heads, dh) flattened, as in ViTAttention.
      r: (B, heads, Hp, Wp, 2*ws) factored rel-pos bias [rel_h | rel_w] per
        INTRA-window coordinate, already multiplied by log2(e).
      w_proj, b_proj: output projection parameters (C, C) / (C,).
      scale: attention scale 1/sqrt(dh).
      heads, ws: head count and window size.

    Returns (B, Hp, Wp, C): x + proj(window_attention(qkv)).
    """
    return _fused_window_impl(x, qkv, r, w_proj, b_proj, scale, heads, ws)


def _fw_fwd(x, qkv, r, w_proj, b_proj, scale, heads, ws):
    return (_fused_window_impl(x, qkv, r, w_proj, b_proj, scale, heads, ws),
            (x, qkv, r, w_proj, b_proj))


def _fw_bwd(scale, heads, ws, res, g):
    x, qkv, r, w_proj, b_proj = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: _fused_window_xla_ref(
            a, b, c, d, e, scale, heads, ws), x, qkv, r, w_proj, b_proj)
    return vjp(g)


fused_window_attention.defvjp(_fw_fwd, _fw_bwd)
