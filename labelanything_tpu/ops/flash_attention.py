"""Pallas TPU attention kernels.

One kernel family serves both plain attention and SAM/ViTDet decomposed
relative-position attention (reference: label_anything/models/
image_encoder.py:340-376). At SAM's sequence lengths (<= 4096 tokens) the
full K/V of one (batch, head) slice fits in VMEM, so no streaming
accumulator is needed; short windowed sequences are batched G-per-grid-step
instead.

The naive rel-pos formulation materializes TWO (B, heads, HW, HW) fp32
tensors (bias + scores) — 6.4 GB for ViT-B @1024px batch 8, an HBM OOM on
v5e. Here the decomposed bias
    bias[q, (kh, kw)] = rel_h[q, kh] + rel_w[q, kw]
is reconstructed per VMEM tile by ONE skinny MXU matmul against a
VMEM-resident one-hot expansion matrix (see ``_onehot_expand``), so nothing
quadratic ever touches HBM.

Softmax is VPU-bound at these shapes (the score tile has seq^2 elements but
the matmuls only ~4*seq*d MACs per score row), so the kernels spend three
more tricks on it:
  1. exp -> exp2 with log2(e) pre-folded into q_aug: one fewer multiply
     pass over the quadratic tile.
  2. The softmax denominator is computed by the MXU, not the VPU: callers
     append a ones column to V (``_augment_v``), so the PV matmul yields
     ``[P@V | rowsum(P)]`` in one pass — the N dim was padding up to the
     MXU tile anyway, making the extra column free.
  3. Bounded-shift softmax: the shift uses a row-wise UPPER BOUND on the
     score max — Cauchy-Schwarz ``||q_aug_i|| * max_j ||k_aug_j||`` — not
     the exact max. Softmax is shift-invariant, so the result is identical
     (numerator and denominator both scale by 2^-L); the bound keeps
     exp2 <= 1 so nothing overflows, and the looseness L is a few exponent
     units for LN-normalized activations — harmless in fp32. The payoff:
     the exact max is a full VPU pass over the quadratic tile AND a
     serialization barrier (exp cannot start until every score tile
     exists). With a bound computed from the skinny (rows, d) operands,
     each k-block's matmul -> exp2 -> PV chain is independent, so Mosaic
     can overlap MXU matmuls with VPU exponentials across the unrolled
     k-blocks instead of idling each engine in phases.

Backward passes: the lane-layout rel-pos kernels (the SAM ViT trained path,
reference: label_anything/models/image_encoder.py:340-376 under
parameters/trainval/*) have FUSED Pallas backward kernels — flash-style
two-pass recompute with the factored bias folded into the block-wise
softmax reconstruction, dk/dv accumulated in fp32 VMEM scratch across
q-block grid steps, and the factored-bias gradient produced by one skinny
matmul per score tile (nothing quadratic touches HBM in the backward
either). The bounded softmax shift makes this cheap: it is a pure function
of the skinny (rows, d) operands, so the backward recomputes it exactly
without saved statistics, and only the denominator needs one extra QK pass.
Kill switch ``LA_TPU_DISABLE_FUSED_BWD=1`` falls back to the XLA
recompute-VJP (q-chunked above _BWD_CHUNK_THRESHOLD tokens to bound live
quadratic memory), which also serves the packed (ViT-H dh=80) layout and
all non-bf16 dtypes (see _fused_bwd_ok).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 512
_BLOCK_K = 512
_LOG2E = 1.4426950408889634  # exp(x) == exp2(x * log2(e))

# Toggled by tests to run the kernels in Pallas interpret mode on CPU, so the
# grid/block logic is covered without TPU hardware.
_INTERPRET = False

# Debug mode: skip the softmax-denominator underflow clamp so a row whose
# bounded shift is pathologically loose produces NaN (loud) instead of 0.
_DEBUG_DENOM = False


def _pick_block_q(q_len: int) -> int:
    """Largest q-block (multiple of the 128-row MXU tile) dividing q_len.

    The grid is ``q_len // block_q`` with no tail masking, so block_q MUST
    divide q_len (round 1 silently left the tail rows unwritten for q_len
    divisible by 128 but not 256, e.g. 1152). Callers gate on
    ``q_len % 128 == 0``; short sequences run as one block."""
    if q_len <= _BLOCK_Q:
        return q_len
    for cand in (_BLOCK_Q, 256, 128):
        if q_len % cand == 0:
            return cand
    raise ValueError(f"flash attention requires q_len % 128 == 0, got {q_len}")


def _pick_blocks_long(q_len: int) -> Tuple[int, int]:
    """(block_q, block_k) for the long-sequence rel-pos kernels.

    Measured on the ViT-B@1024 global layer (VPU-bias lanes kernel, batch
    8): (512, 512) 7.60 ms, (1024, 512) 7.01, (1024, 256) 6.63, (1024,
    1024) 6.79, (2048, 256) 7.02, (256, 512) 10.1 — tall q-blocks amortize
    the loop-invariant bias tiles and 256-wide k-blocks pipeline best.
    Falls back to the generic divisor picker for lengths 1024/256 do not
    divide."""
    bq = 1024 if q_len % 1024 == 0 and q_len > 1024 else _pick_block_q(q_len)
    bk = 256 if q_len % 256 == 0 else q_len
    return bq, bk


def _pick_group(bh: int, tile_elems: int, budget: int = 2_000_000) -> int:
    """Rows per grid step for the short-sequence batched kernel: small
    windows one-per-step drown in per-matmul latency; batching windows per
    step amortizes it. Pick the largest divisor of ``bh`` whose fp32 score
    tile (G * tile_elems) stays under ``budget`` elements (8 MB — Mosaic
    needs ~2x the score tile of scoped VMEM stack for the softmax
    intermediates plus double-buffered operand blocks, and the scoped
    limit is 100 MB)."""
    best = 1
    for cand in range(2, bh + 1):
        if bh % cand == 0 and cand * tile_elems <= budget:
            best = cand
    return best


def _augment_v(v: jax.Array) -> jax.Array:
    """Append a ones column: PV then yields [P@V | rowsum(P)] in one matmul.

    The "free column" premise holds only when head_dim is NOT a multiple of
    the 128-lane tile width (SAM/LAM head dims are 64/80 — always padded
    anyway). For d % 128 == 0 the d+1 column would push PV onto the next
    lane tile, roughly doubling PV width and VMEM; such shapes should
    prefer a VPU rowsum denominator instead."""
    ones = jnp.ones(v.shape[:-1] + (1,), v.dtype)
    return jnp.concatenate([v, ones], axis=-1)


def _finish(o_aug: jax.Array, d: int, out_dtype) -> jax.Array:
    """Split [P@V | denom] and normalize.

    The denominator is clamped away from zero: with the BOUNDED shift (not
    the exact max) there is no max(p) == 1 guarantee, so a pathologically
    loose bound (large ||q||*||k|| with near-orthogonal vectors) could
    underflow every exp2 term and 0/0 a whole row; clamping yields 0 for
    such rows instead of NaN. Healthy rows (denom >= ~2^-100) are exact.
    Note the XLA backward recomputes the EXACT softmax, so a silently
    zeroed forward row would disagree with its gradient — set
    ``_DEBUG_DENOM = True`` (tests) to turn dead rows into NaN so the
    training NaN sentinel trips instead."""
    denom = o_aug[..., d:d + 1]
    if not _DEBUG_DENOM:
        denom = jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
    return (o_aug[..., :d] / denom).astype(out_dtype)


def _shift_bound(q, k, r=None, rh_width: int = 0):
    """Row-wise upper bound on the (log2-domain) score max: Cauchy-Schwarz
    ``||q_i|| * max_j ||k_j||`` plus, when the factored rel-pos bias ``r``
    is given, ``rowmax(rel_h) + rowmax(rel_w)`` (tight separately — the two
    halves index independent key axes). Works on (rows, d) or (G, rows, d)
    operands."""
    q_norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    k_norm = jnp.sqrt(jnp.max(jnp.sum(k * k, axis=-1), axis=-1))
    if k.ndim == 3:
        k_norm = k_norm[:, None, None]
    m = q_norm * k_norm
    if r is not None:
        m = m + jnp.max(r[..., :rh_width], axis=-1, keepdims=True)
        m = m + jnp.max(r[..., rh_width:], axis=-1, keepdims=True)
    return m


def _bias_loop_vpu(q, k, v, r, m, *, rh_width: int, kw: int, block_k: int,
                   d: int, out_dtype, int8_scores: bool = False):
    """Flash inner loop with the rel-pos bias applied by VPU broadcast adds
    instead of the one-hot expansion matmul.

    Requires row-major keys (j = ky*kw + kx) and ``block_k % kw == 0``:
    each k-block then covers ``block_k // kw`` whole ky rows, so the
    rel_w half of the factored bias tiles the lane axis exactly
    (loop-invariant — built once, with the softmax shift folded in) and
    the rel_h half is a per-row scalar lane-broadcast. This deletes one
    of the THREE MXU passes per score tile (QK / bias-expand / PV), the
    kernels' measured bottleneck: 8.9 -> 7.9 ms on the ViT-B@1024 global
    layer (scripts/microbench_softmax_dtype.py mode e; bf16 VPU tiles —
    mode f — measured slower and stay out). Numerics: identical sums
    reassociated, max |delta| 6e-5 on unit-scale bf16 inputs.

    ``int8_scores`` (LA_TPU_INT8_SCORES=1, round-5 experiment): the score
    dot runs with int8 operands (symmetric per-row/per-key scales,
    dequantized on the VPU). MEASURED NEGATIVE on v5e at SAM-1024 global
    shapes: 13.04 vs 12.21 ms (0.94x) — the hoped-for 2x int8 MXU rate
    does not materialize through this toolchain's Mosaic lowering, while
    the per-tile int32->f32 dequant multiply adds VPU work the previously
    hidden exp2 pipeline can no longer absorb (plus per-grid-step k
    requantization). Output drift rel ~1.6e-2 (score quantization at
    1/127 per operand). Kept opt-in for future toolchains; default off."""
    bq = q.shape[0]
    rows = block_k // kw
    rh = r[:, :rh_width]
    rww = jnp.concatenate([r[:, rh_width:]] * rows, axis=1) - m
    k_len = k.shape[0]
    if int8_scores:
        sq = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0   # (BQ, 1)
        sk = jnp.max(jnp.abs(k), axis=1, keepdims=True) / 127.0   # (K, 1)
        q8 = jnp.round(q / jnp.maximum(sq, 1e-30)).astype(jnp.int8)
        k8 = jnp.round(k / jnp.maximum(sk, 1e-30)).astype(jnp.int8)
    o = jnp.zeros((bq, d + 1), jnp.float32)
    for kb in range(0, k_len, block_k):
        if int8_scores:
            s32 = jax.lax.dot_general(
                q8, k8[kb:kb + block_k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * (sq * sk[kb:kb + block_k].T)
        else:
            s = jax.lax.dot_general(
                q, k[kb:kb + block_k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        r0 = kb // kw
        rh2 = jnp.concatenate(
            [jnp.broadcast_to(rh[:, r0 + i:r0 + i + 1], (bq, kw))
             for i in range(rows)], axis=1)
        p = jnp.exp2(s + rh2 + rww).astype(v.dtype)
        o = o + jax.lax.dot_general(
            p, v[kb:kb + block_k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return _finish(o, d, out_dtype)


def _int8_scores_enabled() -> bool:
    """Opt-in int8 score-dot experiment (trace-time read, like the other
    kernel flags)."""
    import os

    return os.environ.get("LA_TPU_INT8_SCORES", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def vpu_bias_ok(kh: int, kw: int, n: int, block_k: int) -> bool:
    """Preconditions of :func:`_bias_loop_vpu` (see its docstring)."""
    return kh * kw == n and block_k % kw == 0 and kw >= 8


# --------------------------------------------------------------------- #
# kernel bodies (q pre-scaled by scale*log2e, v ones-augmented;
# the contraction dim of q/k may be bias-augmented — see module docstring)
# --------------------------------------------------------------------- #

def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, d: int, block_k: int):
    q = q_ref[0].astype(jnp.float32)          # (BQ, Dc)
    k = k_ref[0].astype(jnp.float32)          # (K, Dc)
    v = v_ref[0]                              # (K, D+1)
    m = _shift_bound(q, k)                     # (BQ, 1)

    k_len = k.shape[0]
    o = jnp.zeros((q.shape[0], d + 1), jnp.float32)
    for kb in range(0, k_len, block_k):       # static offsets -> lax.slice
        s = jax.lax.dot_general(
            q, k[kb:kb + block_k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # (BQ, block_k), log2-scaled
        p = jnp.exp2(s - m).astype(v.dtype)
        o = o + jax.lax.dot_general(
            p, v[kb:kb + block_k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # (BQ, D+1)
    o_ref[0] = _finish(o, d, o_ref.dtype)


def _attn_kernel_batched(q_ref, k_ref, v_ref, o_ref, *, d: int):
    """(G, N, ...) blocks for short (windowed) sequences."""
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    m = _shift_bound(q, k)                     # (G, N, 1)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - m).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = _finish(o, d, o_ref.dtype)


def _run_flash(q3: jax.Array, k3: jax.Array, v3: jax.Array, d: int) -> jax.Array:
    """Dispatch the (BH, Q, Dc) x (BH, K, Dc) x (BH, K, D+1) kernels.

    ``Dc`` is the (possibly bias-augmented) contraction dim; ``d`` the true
    head dim of the output."""
    bh, q_len, _ = q3.shape
    k_len = k3.shape[1]

    if q_len <= _BLOCK_Q and q_len == k_len:
        g = _pick_group(bh, q_len * k_len)
        return pl.pallas_call(
            functools.partial(_attn_kernel_batched, d=d),
            out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v3.dtype),
            grid=(bh // g,),
            in_specs=[
                pl.BlockSpec((g,) + q3.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g,) + k3.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g,) + v3.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, q_len, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(q3, k3, v3)

    block_q = _pick_block_q(q_len)
    assert q_len % block_q == 0, (q_len, block_q)
    grid = (bh, q_len // block_q)
    block_k = _BLOCK_K if k_len % _BLOCK_K == 0 else k_len
    dc = q3.shape[-1]

    return pl.pallas_call(
        functools.partial(_attn_kernel, d=d, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), v3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, dc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, d + 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * q_len * k_len * (dc + d),
            bytes_accessed=(q3.size + k3.size + v3.size + bh * q_len * d)
            * q3.dtype.itemsize,
            transcendentals=bh * q_len * k_len,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q3, k3, v3)


# --------------------------------------------------------------------- #
# plain attention
# --------------------------------------------------------------------- #

def _flash_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    b, h, q_len, d = q.shape
    k_len = k.shape[-2]
    bh = b * h
    q3 = (q.reshape(bh, q_len, d).astype(jnp.float32) * (scale * _LOG2E)
          ).astype(q.dtype)
    k3 = k.reshape(bh, k_len, d)
    v3 = _augment_v(v.reshape(bh, k_len, d))
    return _run_flash(q3, k3, v3, d).reshape(b, h, q_len, d)


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
# fused decomposed rel-pos attention (SAM global + windowed attention)
# --------------------------------------------------------------------- #

def _onehot_expand(kh: int, kw: int, dtype):
    """[e_h; e_w]: (Kh+Kw, Kh*Kw) one-hot rows so a SINGLE (BQ, Kh+Kw)
    matmul expands bias[q, kh*Kw+kw] = rh[q, kh] + rw[q, kw] onto the flat
    key axis (Mosaic cannot shape-cast the score tile to 3D; the combined
    matmul has a 128-wide inner dim for Kh=Kw=64, twice the MXU occupancy
    of two separate 64-dim matmuls). Built once in XLA, kept VMEM-resident
    in the kernels via a constant index map.

    An operand-augmentation variant ([q|rh|rw] @ [k|e_h|e_w].T in one
    matmul) was measured SLOWER on v5e (9.5 vs 8.2 ms/layer for ViT-B@1024
    batch 8): the widened contraction re-streams the one-hot columns
    through the MXU for every q block and the k_aug materialization adds
    HBM traffic, while the separate skinny bias matmul pipelines fine."""
    k_len = kh * kw
    lane = jax.lax.broadcasted_iota(jnp.int32, (kh, k_len), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (kh, k_len), 0)
    e_h = (lane // kw == row).astype(dtype)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (kw, k_len), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, k_len), 0)
    e_w = (lane_w % kw == row_w).astype(dtype)
    return jnp.concatenate([e_h, e_w], axis=0)


def _relpos_fwd_impl(q, k, v, rel_h, rel_w, scale: float,
                     grid_hw: Tuple[int, int]):
    """Unpacked-layout entry: q/k/v (BH, HW, D); rel factored biases
    (BH, HW, H) / (BH, HW, W). Implemented as the heads=1 case of the
    packed kernels (one kernel family to maintain); model code uses
    :func:`flash_attention_relpos_packed` directly to skip the stack."""
    bh, q_len, d = q.shape
    # the packed kernels stack q/k/v, which requires square attention;
    # SAM rel-pos attention always has q_len == Kh*Kw == k_len
    assert k.shape == q.shape and v.shape == q.shape, (
        "flash_attention_relpos requires q/k/v of identical shape "
        f"(got {q.shape}, {k.shape}, {v.shape})")
    qkv = jnp.stack([q, k, v], axis=1)          # (BH, 3, HW, D)
    r = (jnp.concatenate([rel_h, rel_w], axis=-1).astype(jnp.float32)
         * _LOG2E).astype(q.dtype)[:, None]     # (BH, 1, HW, Kh+Kw)
    return _packed_fwd_impl(qkv, r, scale, grid_hw, heads=1)[:, 0]


def _relpos_kernel_packed(qkv_q, qkv_k, qkv_v, r_ref, e_ref, o_ref, *,
                          scale: float, rh_width: int, block_k: int):
    """Packed-layout variant: the three q/k/v refs are BlockSpec views into
    ONE slot-major (B, 3*heads, N, dh) array (the qkv projection reshaped
    once), so the caller performs NO per-tensor transposes — the measured
    per-block cost of the reshape/moveaxis/transpose glue around the
    unpacked kernel was ~2x the attention kernel itself on v5e. Scale and
    log2(e) fold happen on the tiny q block in-kernel; the ones column for
    the MXU denominator is concatenated onto v in VMEM (O(K) work)."""
    q = qkv_q[0, 0].astype(jnp.float32) * (scale * _LOG2E)  # (BQ, dh)
    k = qkv_k[0, 0].astype(jnp.float32)                     # (K, dh)
    v = _augment_v(qkv_v[0, 0])                             # (K, dh+1)
    r = r_ref[0, 0].astype(jnp.float32)                     # (BQ, Kh+Kw)
    e = e_ref[...].astype(jnp.float32)                      # (Kh+Kw, K)
    d = qkv_v.shape[-1]
    m = _shift_bound(q, k, r, rh_width)                     # (BQ, 1)

    # NOTE: a software-pipelined variant (issuing block i+1's score matmuls
    # before block i's exponentials) measured identical (8.21 vs 8.25 ms) —
    # the kernel is MXU-bound at these shapes and the VPU work already
    # hides, so the simple loop stays.
    k_len = k.shape[0]
    o = jnp.zeros((q.shape[0], d + 1), jnp.float32)
    for kb in range(0, k_len, block_k):
        s = jax.lax.dot_general(
            q, k[kb:kb + block_k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            r, e[:, kb:kb + block_k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp2(s - m).astype(v.dtype)
        o = o + jax.lax.dot_general(
            p, v[kb:kb + block_k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0, 0] = _finish(o, d, o_ref.dtype)


def _relpos_kernel_packed_vpu(qkv_q, qkv_k, qkv_v, r_ref, o_ref, *,
                              scale: float, rh_width: int, kw: int,
                              block_k: int):
    """Packed-layout kernel with the VPU bias loop (no one-hot operand)."""
    q = qkv_q[0, 0].astype(jnp.float32) * (scale * _LOG2E)  # (BQ, dh)
    k = qkv_k[0, 0].astype(jnp.float32)                     # (K, dh)
    v = _augment_v(qkv_v[0, 0])                             # (K, dh+1)
    r = r_ref[0, 0].astype(jnp.float32)                     # (BQ, Kh+Kw)
    d = qkv_v.shape[-1]
    m = _shift_bound(q, k, r, rh_width)                     # (BQ, 1)
    o_ref[0, 0] = _bias_loop_vpu(q, k, v, r, m, rh_width=rh_width, kw=kw,
                                 block_k=block_k, d=d, out_dtype=o_ref.dtype)


def _relpos_kernel_packed_batched(qkv_q, qkv_k, qkv_v, r_ref, e_ref, o_ref, *,
                                  scale: float, rh_width: int,
                                  augment: bool = False):
    """(G, 1, N, ...) short-window blocks of the packed layout. With
    ``augment`` (dh + rr <= 128) the bias rides the score matmul as
    operand-augmentation columns (see _relpos_lanes_batched_kernel);
    e_ref is then the TRANSPOSED (N, rr) one-hot."""
    q = qkv_q[:, 0].astype(jnp.float32) * (scale * _LOG2E)  # (G, N, dh)
    k = qkv_k[:, 0].astype(jnp.float32)
    v = _augment_v(qkv_v[:, 0])
    r = r_ref[:, 0].astype(jnp.float32)                     # (G, N, Kh+Kw)
    e = e_ref[...].astype(jnp.float32)
    d = qkv_v.shape[-1]

    if augment:
        g, n = q.shape[0], q.shape[1]
        qa = jnp.concatenate([q, r], axis=-1)
        ka = jnp.concatenate(
            [k, jnp.broadcast_to(e[None], (g, n, e.shape[-1]))], axis=-1)
        m = _shift_bound(qa, ka)
        s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    else:
        m = _shift_bound(q, k, r, rh_width)                 # (G, N, 1)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            r, e, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - m).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, 0] = _finish(o, d, o_ref.dtype)


def _packed_fwd_impl(qkv: jax.Array, r: jax.Array, scale: float,
                     grid_hw: Tuple[int, int], heads: int) -> jax.Array:
    """Fused rel-pos attention on a slot-major packed qkv tensor.

    Args:
      qkv: (B, 3*heads, N, dh) — the qkv projection output reshaped
        (B, N, 3, heads, dh) -> transposed to slot-major; slot t*heads+h
        holds tensor t (0=q, 1=k, 2=v) of head h.
      r: (B, heads, N, Kh+Kw) — factored rel-pos bias [rel_h | rel_w],
        already multiplied by log2(e).
      scale: attention scale (1/sqrt(dh)); log2(e) is folded in-kernel.
      grid_hw: token grid (Kh, Kw) with Kh*Kw == N.
      heads: number of attention heads.

    Returns:
      (B, heads, N, dh) attention output (head-major; callers transpose
      once back to token-major for the output projection).
    """
    b, slots, n, dh = qkv.shape
    assert slots == 3 * heads, (slots, heads)
    kh, kw = grid_hw
    rr = kh + kw
    e = _onehot_expand(kh, kw, qkv.dtype)

    if n <= _BLOCK_Q and n == kh * kw:
        g = _pick_group(b, n * n)  # per-step scores: (g, n, n) for ONE head
        grid = (b // g, heads)
        augment = dh + rr <= 128
        if augment:
            e = e.T  # (n, rr) augmentation columns
        return pl.pallas_call(
            functools.partial(_relpos_kernel_packed_batched, scale=scale,
                              rh_width=kh, augment=augment),
            out_shape=jax.ShapeDtypeStruct((b, heads, n, dh), qkv.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, 1, n, dh), lambda i, h: (i, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 1, n, dh),
                             lambda i, h: (i, heads + h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 1, n, dh),
                             lambda i, h: (i, 2 * heads + h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 1, n, rr), lambda i, h: (i, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(e.shape, lambda i, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, 1, n, dh), lambda i, h: (i, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(qkv, qkv, qkv, r, e)

    block_q, block_k = _pick_blocks_long(n)
    assert n % block_q == 0, (n, block_q)
    grid = (b, heads, n // block_q)

    qkv_specs = [
        pl.BlockSpec((1, 1, block_q, dh), lambda i, h, j: (i, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n, dh), lambda i, h, j: (i, heads + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n, dh),
                     lambda i, h, j: (i, 2 * heads + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, rr), lambda i, h, j: (i, h, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if vpu_bias_ok(kh, kw, n, block_k):
        # bias applied by VPU broadcast adds — the one-hot operand (and its
        # MXU expansion pass) disappears; see _bias_loop_vpu.
        return pl.pallas_call(
            functools.partial(_relpos_kernel_packed_vpu, scale=scale,
                              rh_width=kh, kw=kw, block_k=block_k),
            out_shape=jax.ShapeDtypeStruct((b, heads, n, dh), qkv.dtype),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=pl.BlockSpec((1, 1, block_q, dh),
                                   lambda i, h, j: (i, h, j, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * heads * n * n * dh,
                bytes_accessed=(qkv.size + r.size) * qkv.dtype.itemsize,
                transcendentals=b * heads * n * n,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(qkv, qkv, qkv, r)

    return pl.pallas_call(
        functools.partial(_relpos_kernel_packed, scale=scale, rh_width=kh,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b, heads, n, dh), qkv.dtype),
        grid=grid,
        in_specs=qkv_specs + [
            pl.BlockSpec((rr, n), lambda i, h, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh),
                               lambda i, h, j: (i, h, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * dh + 2 * b * heads * n * rr * n,
            bytes_accessed=(qkv.size + r.size) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, r, e)


def _relpos_lanes_kernel_vpu(q_ref, k_ref, v_ref, r_ref, o_ref, *,
                             scale: float, rh_width: int, kw: int,
                             block_k: int, int8_scores: bool = False):
    """Lane-sliced kernel with the VPU bias loop (see _bias_loop_vpu):
    identical head-pair BlockSpec layout, no one-hot operand."""
    dh = q_ref.shape[-1] // 2
    rr = r_ref.shape[-1] // 2
    q2 = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)    # (BQ, 2*dh)
    k2 = k_ref[0].astype(jnp.float32)                       # (K, 2*dh)
    v2 = v_ref[0]                                           # (K, 2*dh)
    r2 = r_ref[0].astype(jnp.float32)                       # (BQ, 2*rr)

    outs = []
    for t in (0, 1):
        q = q2[:, t * dh:(t + 1) * dh]
        k = k2[:, t * dh:(t + 1) * dh]
        v = _augment_v(v2[:, t * dh:(t + 1) * dh])
        r = r2[:, t * rr:(t + 1) * rr]
        m = _shift_bound(q, k, r, rh_width)
        outs.append(_bias_loop_vpu(q, k, v, r, m, rh_width=rh_width, kw=kw,
                                   block_k=block_k, d=dh,
                                   out_dtype=o_ref.dtype,
                                   int8_scores=int8_scores))
    o_ref[0] = jnp.concatenate(outs, axis=-1)               # (BQ, 2*dh)


def _relpos_lanes_kernel(q_ref, k_ref, v_ref, r_ref, e_ref, o_ref, *,
                         scale: float, rh_width: int, block_k: int):
    """Head-PAIR grid step on token-major operands (see
    flash_attention_relpos_lanes): q/k/v refs are 128-lane BlockSpec views
    into the natural (B, N, 3C) qkv projection — the pair's two dh=64 head
    slices share one lane tile, so reading them costs ZERO relayout in HBM
    (the packed kernel needs a full (B, N, 36, 64) -> (B, 36, N, 64)
    transpose of the activation stream; this kernel needs none, and the
    output is written token-major so the downstream projection consumes it
    directly)."""
    dh = q_ref.shape[-1] // 2
    rr = e_ref.shape[0]
    q2 = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)    # (BQ, 2*dh)
    k2 = k_ref[0].astype(jnp.float32)                       # (K, 2*dh)
    v2 = v_ref[0]                                           # (K, 2*dh)
    r2 = r_ref[0].astype(jnp.float32)                       # (BQ, 2*rr)
    e = e_ref[...].astype(jnp.float32)                      # (rr, K)

    k_len = k2.shape[0]
    outs = []
    for t in (0, 1):
        q = q2[:, t * dh:(t + 1) * dh]
        k = k2[:, t * dh:(t + 1) * dh]
        v = _augment_v(v2[:, t * dh:(t + 1) * dh])
        r = r2[:, t * rr:(t + 1) * rr]
        m = _shift_bound(q, k, r, rh_width)
        o = jnp.zeros((q.shape[0], dh + 1), jnp.float32)
        for kb in range(0, k_len, block_k):
            s = jax.lax.dot_general(
                q, k[kb:kb + block_k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(
                r, e[:, kb:kb + block_k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp2(s - m).astype(v.dtype)
            o = o + jax.lax.dot_general(
                p, v[kb:kb + block_k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        outs.append(_finish(o, dh, o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)               # (BQ, 2*dh)


def lanes_kernel_ok(heads: int, dh: int, kh: int, kw: int) -> bool:
    """Layout preconditions of the lane-sliced kernel: head pairs must span
    exactly one 128-lane tile (dh == 64, heads even) and the per-pair bias
    block 2*(kh+kw) must tile (rr % 64 == 0). SAM ViT-B/L qualify; ViT-H
    (dh = 80) falls back to the packed kernel."""
    return dh == 64 and heads % 2 == 0 and (kh + kw) % 64 == 0


def _lanes_fwd_impl(qkv: jax.Array, r: jax.Array, scale: float,
                    grid_hw: Tuple[int, int], heads: int) -> jax.Array:
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    kh, kw = grid_hw
    rr = kh + kw
    assert lanes_kernel_ok(heads, dh, kh, kw)
    e = _onehot_expand(kh, kw, qkv.dtype)

    block_q, block_k = _pick_blocks_long(n)
    assert n % block_q == 0, (n, block_q)
    grid = (b, heads // 2, n // block_q)

    qkv_specs = [
        # lane-block index maps: pair hp reads lanes [hp*128, hp*128+128)
        # of the q / k / v regions of the SAME (B, N, 3C) array
        pl.BlockSpec((1, block_q, 2 * dh),
                     lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh),
                     lambda i, hp, j, _h=heads // 2: (i, 0, _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh),
                     lambda i, hp, j, _h=heads // 2: (i, 0, 2 * _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 2 * rr),
                     lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * heads * n * n * dh + 2 * b * heads * n * rr * n,
        bytes_accessed=(qkv.size + r.size + b * n * c)
        * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    if vpu_bias_ok(kh, kw, n, block_k):
        return pl.pallas_call(
            functools.partial(_relpos_lanes_kernel_vpu, scale=scale,
                              rh_width=kh, kw=kw, block_k=block_k,
                              int8_scores=_int8_scores_enabled()),
            out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=pl.BlockSpec((1, block_q, 2 * dh),
                                   lambda i, hp, j: (i, j, hp),
                                   memory_space=pltpu.VMEM),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(qkv, qkv, qkv, r)

    return pl.pallas_call(
        functools.partial(_relpos_lanes_kernel, scale=scale, rh_width=kh,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        grid=grid,
        in_specs=qkv_specs + [
            pl.BlockSpec((rr, n), lambda i, hp, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh),
                               lambda i, hp, j: (i, j, hp),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, r, e)


def _relpos_lanes_batched_kernel(q_ref, k_ref, v_ref, r_ref, e_ref, o_ref, *,
                                 scale: float):
    """Short-sequence (windowed) lane-sliced kernel: one head PAIR, a group
    of g windows per grid step, every operand token-major. The windowed
    path previously relayouted the qkv projection to slot-major
    (B*nW, 3*heads, N, dh) and transposed the head-major output back —
    both pure HBM relayout; here the BlockSpec lane index maps read the
    (G, N, 3C) array in place, exactly like the long-sequence lanes
    kernel, batched over windows."""
    dh = q_ref.shape[-1] // 2
    rr = r_ref.shape[-1] // 2
    q2 = q_ref[...].astype(jnp.float32) * (scale * _LOG2E)  # (g, n, 2*dh)
    k2 = k_ref[...].astype(jnp.float32)
    v2 = v_ref[...]
    r2 = r_ref[0].astype(jnp.float32)                       # (g, n, 2*rr)
    et = e_ref[...].astype(jnp.float32)                     # (n, rr) one-hot
    g, n = q2.shape[0], q2.shape[1]

    # Bias folded into the score matmul by operand augmentation:
    #   [q*scale*log2e | r] . [k | onehot(ky)|onehot(kx)]
    #     = scaled qk + rel_h[q, ky] + rel_w[q, kx]   (both log2e-carrying)
    # At window shapes the reduction 64+28 = 92 still fits ONE 128-wide MXU
    # tile, so the separate one-hot bias matmul (2 full passes per
    # window-head at 28/128 = 22% occupancy) disappears for free. (At
    # GLOBAL shapes rr = 128 pushes the reduction to 2 tiles — that variant
    # measured ~15% slower in round 1 and stays out of the long kernels.)
    eb = jnp.broadcast_to(et[None], (g, n, rr))
    outs = []
    for t in (0, 1):
        q = q2[..., t * dh:(t + 1) * dh]
        k = k2[..., t * dh:(t + 1) * dh]
        v = _augment_v(v2[..., t * dh:(t + 1) * dh])
        r = r2[..., t * rr:(t + 1) * rr]
        qa = jnp.concatenate([q, r], axis=-1)               # (g, n, dh+rr)
        ka = jnp.concatenate([k, eb], axis=-1)
        m = _shift_bound(qa, ka)                            # (g, n, 1)
        s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - m).astype(v.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(_finish(o, dh, o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)             # (g, n, 2*dh)


def _lanes_batched_fwd_impl(qkv: jax.Array, r: jax.Array, scale: float,
                            grid_hw: Tuple[int, int], heads: int) -> jax.Array:
    g_total, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    kh, kw = grid_hw
    rr = kh + kw
    assert n == kh * kw and dh == 64 and heads % 2 == 0
    # transposed one-hot (N, rr): the kernel concatenates it onto k as the
    # bias-augmentation columns (see _relpos_lanes_batched_kernel)
    e = _onehot_expand(kh, kw, qkv.dtype).T
    # (G, N, heads*rr) -> pair-major (heads//2, G, N, 2*rr): Pallas requires
    # the trailing two block dims be full (or 8/128-aligned), and 2*rr = 56
    # for 14x14 windows — so the pair axis moves OUT instead of lane-slicing.
    # The minor dim is unchanged, so this transpose is a cheap outer copy.
    r4 = r.reshape(g_total, n, heads // 2, 2 * rr).transpose(2, 0, 1, 3)

    g = _pick_group(g_total, 2 * n * n)
    grid = (g_total // g, heads // 2)

    return pl.pallas_call(
        functools.partial(_relpos_lanes_batched_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((g_total, n, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, 2 * dh),
                         lambda i, hp, _h=heads // 2: (i, 0, _h + hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, 2 * dh),
                         lambda i, hp, _h=heads // 2: (i, 0, 2 * _h + hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, n, 2 * rr), lambda i, hp: (hp, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rr), lambda i, hp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * g_total * heads * n * n * dh
            + 2 * g_total * heads * n * rr * n,
            bytes_accessed=(qkv.size + r.size + g_total * n * c)
            * qkv.dtype.itemsize,
            transcendentals=g_total * heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, r4, e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_attention_relpos_lanes_batched(qkv, r, scale: float,
                                         grid_hw: Tuple[int, int], heads: int):
    """Token-major rel-pos attention for SHORT sequences (ViTDet windows).

    Args:
      qkv: (G, N, 3C) — windows batch of the qkv Dense output, no relayout;
        channel layout (3, heads, dh) flattened.
      r: (G, N, heads*(Kh+Kw)) factored bias, lane-major per head, already
        multiplied by log2(e).

    Returns (G, N, C) token-major. Requires dh == 64 and even heads (a head
    pair per 128-lane tile); use flash_attention_relpos_packed otherwise."""
    return _lanes_batched_fwd_impl(qkv, r, scale, grid_hw, heads)


def _lanes_batched_fwd(qkv, r, scale, grid_hw, heads):
    out = _lanes_batched_fwd_impl(qkv, r, scale, grid_hw, heads)
    return out, (qkv, r, out)


def _lanes_batched_bwd(scale, grid_hw, heads, res, g):
    qkv, r, out = res
    if not _fused_bwd_disabled() and _fused_bwd_ok(qkv.dtype):
        return _lanes_batched_bwd_impl(qkv, r, out, g, scale, grid_hw, heads)
    _, vjp = jax.vjp(
        lambda a, b: _lanes_xla_ref(a, b, scale, grid_hw, heads), qkv, r)
    return vjp(g)


flash_attention_relpos_lanes_batched.defvjp(_lanes_batched_fwd,
                                            _lanes_batched_bwd)


# Backward-pass memory policy: the XLA recompute refs materialize the full
# (B, H, N, N) scores + bias; at SAM-1024 global shapes (N = 4096) that is
# ~3.2 GB fp32 PER ARRAY per layer — the exact quadratic HBM pressure the
# forward kernels kill (reference trains this path:
# models/image_encoder.py:340-376). Above this token count the backwards
# switch to a q-chunked, per-chunk-rematerialized reference: each chunk's
# scores/softmax are recomputed in the backward and freed before the next,
# bounding live quadratic memory to (B, H, CHUNK, N).
_BWD_CHUNK_THRESHOLD = 2048
_BWD_CHUNK = 256


def _fused_bwd_disabled() -> bool:
    """Kill switch for the fused Pallas backward kernels (A/B forensics).

    Read at TRACE time: set LA_TPU_DISABLE_FUSED_BWD=1 before the first
    compilation to fall back to the XLA recompute-VJP."""
    import os

    return os.environ.get("LA_TPU_DISABLE_FUSED_BWD", "").strip().lower() \
        not in ("", "0", "false")


def _fused_bwd_ok(dtype) -> bool:
    """True when the fused Pallas backward may be used for this dtype.

    History: the round-4 gate was an empirical Mosaic limitation (the fp32
    multi-q-block backward never returned from the compiler). Re-examined
    round 5 with scripts/repro_fp32_mosaic_hang.py: the current toolchain
    COMPILES the fp32 variant fine at every shape (minimal 2-q-block and
    production B=6/N=4096 alike, ~13 s) — the hang is fixed. The gate now
    stays on MEASURED PERFORMANCE grounds: the fused fp32 kernels run at
    458 ms (global) / 496 ms (windowed) vs the q-chunked XLA recompute-VJP's
    161 / 36.5 ms at the same shapes on v5e (fp32 halves MXU throughput and
    VMEM blocking; the kernels' block sizes are tuned for bf16), so fp32
    callers get the FASTER path by falling back. Production training runs
    the bf16 policy (parallel/train_step.py) and gets the fused kernels.
    Interpret mode (CPU tests) allows every dtype."""
    return _INTERPRET or dtype == jnp.bfloat16


def _pick_blocks_bwd(n: int) -> Tuple[int, int]:
    """(block_q, block_k) for the long-sequence backward kernel. Shorter
    q-blocks than forward: the backward holds ~3 quadratic intermediates
    (p, dp, dS) per tile plus two fp32 (N, 128) dk/dv accumulators."""
    bq = 512 if n % 512 == 0 and n > 512 else _pick_block_q(n)
    bk = 256 if n % 256 == 0 else n
    return bq, bk


def _lanes_bwd_kernel(q_ref, k_ref, v_ref, r_ref, o_ref, do_ref, e_ref,
                      dq_ref, dk_ref, dv_ref, dr_ref, dk_acc, dv_acc, *,
                      scale: float, rh_width: int, block_k: int,
                      n_q_blocks: int):
    """Fused backward for the long-sequence lane-sliced rel-pos kernel.

    Flash-style recompute: for each q-block, pass 1 rebuilds the softmax
    denominator (the bounded shift is a pure function of the skinny
    operands, so nothing was saved from the forward), pass 2 rebuilds each
    score tile and forms all five gradient contractions per tile:

        p    = exp2(s2 - m) / denom               (exact softmax)
        dP   = dO @ V^T
        dS   = p * (dP - rowsum(dO * O))          (natural domain)
        dQ  += dS @ K * scale
        dK  += dS^T @ Q_s / log2e                 (Q_s carries scale*log2e)
        dV  += p^T @ dO
        dr  += dS @ E^T / log2e                   (factored bias gradient —
                                                   one skinny matmul per tile;
                                                   nothing quadratic in HBM)

    dk/dv accumulate in fp32 VMEM scratch across the q-block grid dimension
    (the out blocks' index maps ignore it) and flush once at the last
    q-block."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dh = q_ref.shape[-1] // 2
    rr = e_ref.shape[0]
    q2 = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)    # (BQ, 2*dh)
    k2 = k_ref[0].astype(jnp.float32)                       # (K, 2*dh)
    v2 = v_ref[0].astype(jnp.float32)
    r2 = r_ref[0].astype(jnp.float32)                       # (BQ, 2*rr)
    o2 = o_ref[0].astype(jnp.float32)                       # (BQ, 2*dh)
    do2 = do_ref[0].astype(jnp.float32)
    e = e_ref[...].astype(jnp.float32)                      # (rr, K)
    k_len = k2.shape[0]
    bq = q2.shape[0]

    dq_parts, dr_parts = [], []
    for t in (0, 1):
        q = q2[:, t * dh:(t + 1) * dh]
        k = k2[:, t * dh:(t + 1) * dh]
        v = v2[:, t * dh:(t + 1) * dh]
        r = r2[:, t * rr:(t + 1) * rr]
        o = o2[:, t * dh:(t + 1) * dh]
        do = do2[:, t * dh:(t + 1) * dh]
        m = _shift_bound(q, k, r, rh_width)                 # (BQ, 1)

        denom = jnp.zeros((bq, 1), jnp.float32)
        for kb in range(0, k_len, block_k):
            s = jax.lax.dot_general(
                q, k[kb:kb + block_k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(
                r, e[:, kb:kb + block_k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            denom = denom + jnp.sum(jnp.exp2(s - m), axis=-1, keepdims=True)
        inv = 1.0 / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
        dvec = jnp.sum(do * o, axis=-1, keepdims=True)      # (BQ, 1)

        dq_a = jnp.zeros((bq, dh), jnp.float32)
        dr_a = jnp.zeros((bq, rr), jnp.float32)
        for kb in range(0, k_len, block_k):
            kblk = k[kb:kb + block_k]
            eblk = e[:, kb:kb + block_k]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(
                r, eblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp2(s - m) * inv                       # (BQ, BK)
            dp = jax.lax.dot_general(
                do, v[kb:kb + block_k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dvec)
            dq_a = dq_a + jax.lax.dot_general(
                ds, kblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dr_a = dr_a + jax.lax.dot_general(
                ds, eblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_acc[kb:kb + block_k, t * dh:(t + 1) * dh] += \
                jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dv_acc[kb:kb + block_k, t * dh:(t + 1) * dh] += \
                jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dq_parts.append(dq_a * scale)
        dr_parts.append(dr_a * (1.0 / _LOG2E))
    dq_ref[0] = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)
    dr_ref[0] = jnp.concatenate(dr_parts, axis=-1).astype(dr_ref.dtype)

    @pl.when(j == n_q_blocks - 1)
    def _flush():
        dk_ref[0] = (dk_acc[...] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _lanes_bwd_impl(qkv: jax.Array, r: jax.Array, out: jax.Array,
                    dout: jax.Array, scale: float,
                    grid_hw: Tuple[int, int], heads: int):
    """Dispatch the fused long-sequence lanes backward → (dqkv, dr)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    kh, kw = grid_hw
    rr = kh + kw
    e = _onehot_expand(kh, kw, qkv.dtype)

    block_q, block_k = _pick_blocks_bwd(n)
    assert n % block_q == 0, (n, block_q)
    n_q_blocks = n // block_q
    grid = (b, heads // 2, n_q_blocks)

    in_specs = [
        pl.BlockSpec((1, block_q, 2 * dh), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh),
                     lambda i, hp, j, _h=heads // 2: (i, 0, _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh),
                     lambda i, hp, j, _h=heads // 2: (i, 0, 2 * _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 2 * rr), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 2 * dh), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 2 * dh), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rr, n), lambda i, hp, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, 2 * dh), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh), lambda i, hp, j: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 2 * dh), lambda i, hp, j: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 2 * rr), lambda i, hp, j: (i, j, hp),
                     memory_space=pltpu.VMEM),
    ]
    dq, dk, dv, dr = pl.pallas_call(
        functools.partial(_lanes_bwd_kernel, scale=scale, rh_width=kh,
                          block_k=block_k, n_q_blocks=n_q_blocks),
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, heads * rr), r.dtype),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n, 2 * dh), jnp.float32),
            pltpu.VMEM((n, 2 * dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b * heads * n * n * dh
            + 6 * b * heads * n * rr * n,
            bytes_accessed=(3 * qkv.size + 2 * r.size + 2 * b * n * c)
            * qkv.dtype.itemsize,
            transcendentals=2 * b * heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, r, out, dout, e)
    return jnp.concatenate([dq, dk, dv], axis=-1), dr


def _lanes_batched_bwd_kernel(q_ref, k_ref, v_ref, r_ref, o_ref, do_ref,
                              e_ref, dq_ref, dk_ref, dv_ref, dr_ref, *,
                              scale: float, rh_width: int):
    """Fused backward for the short-window lane-sliced kernel: the whole
    (g, N, N) score tile of a window group fits VMEM, so a single pass
    recomputes softmax and forms every gradient contraction (same math as
    :func:`_lanes_bwd_kernel`, un-blocked)."""
    dh = q_ref.shape[-1] // 2
    rr = e_ref.shape[0]
    q2 = q_ref[...].astype(jnp.float32) * (scale * _LOG2E)  # (g, n, 2*dh)
    k2 = k_ref[...].astype(jnp.float32)
    v2 = v_ref[...].astype(jnp.float32)
    r2 = r_ref[0].astype(jnp.float32)                       # (g, n, 2*rr)
    o2 = o_ref[...].astype(jnp.float32)
    do2 = do_ref[...].astype(jnp.float32)
    e = e_ref[...].astype(jnp.float32)                      # (rr, n)

    dq_parts, dk_parts, dv_parts, dr_parts = [], [], [], []
    for t in (0, 1):
        q = q2[..., t * dh:(t + 1) * dh]
        k = k2[..., t * dh:(t + 1) * dh]
        v = v2[..., t * dh:(t + 1) * dh]
        r = r2[..., t * rr:(t + 1) * rr]
        o = o2[..., t * dh:(t + 1) * dh]
        do = do2[..., t * dh:(t + 1) * dh]
        m = _shift_bound(q, k, r, rh_width)                 # (g, n, 1)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(r, e, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        e2 = jnp.exp2(s - m)
        denom = jnp.sum(e2, axis=-1, keepdims=True)
        p = e2 / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dvec = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - dvec)
        dq_parts.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)
        dk_parts.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / _LOG2E))
        dv_parts.append(jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dr_parts.append(jax.lax.dot_general(
            ds, e, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / _LOG2E))
    dq_ref[...] = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dk_parts, axis=-1).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dv_parts, axis=-1).astype(dv_ref.dtype)
    dr_ref[0] = jnp.concatenate(dr_parts, axis=-1).astype(dr_ref.dtype)


def _lanes_batched_bwd_impl(qkv: jax.Array, r: jax.Array, out: jax.Array,
                            dout: jax.Array, scale: float,
                            grid_hw: Tuple[int, int], heads: int):
    """Dispatch the fused windowed lanes backward → (dqkv, dr)."""
    g_total, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    kh, kw = grid_hw
    rr = kh + kw
    e = _onehot_expand(kh, kw, qkv.dtype)
    r4 = r.reshape(g_total, n, heads // 2, 2 * rr).transpose(2, 0, 1, 3)

    # backward holds ~4 (g, n, n) fp32 intermediates per head vs forward's
    # ~2 — halve the group budget
    g = _pick_group(g_total, 2 * n * n, budget=1_000_000)
    grid = (g_total // g, heads // 2)

    in_specs = [
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh),
                     lambda i, hp, _h=heads // 2: (i, 0, _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh),
                     lambda i, hp, _h=heads // 2: (i, 0, 2 * _h + hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, n, 2 * rr), lambda i, hp: (hp, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rr, n), lambda i, hp: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, n, 2 * dh), lambda i, hp: (i, 0, hp),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, n, 2 * rr), lambda i, hp: (hp, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq, dk, dv, dr4 = pl.pallas_call(
        functools.partial(_lanes_batched_bwd_kernel, scale=scale,
                          rh_width=kh),
        out_shape=[
            jax.ShapeDtypeStruct((g_total, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((g_total, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((g_total, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((heads // 2, g_total, n, 2 * rr), r.dtype),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=12 * g_total * heads * n * n * dh
            + 6 * g_total * heads * n * rr * n,
            bytes_accessed=(3 * qkv.size + 2 * r.size + 2 * g_total * n * c)
            * qkv.dtype.itemsize,
            transcendentals=g_total * heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv, r4, out, dout, e)
    dr = dr4.transpose(1, 2, 0, 3).reshape(g_total, n, heads * rr)
    return jnp.concatenate([dq, dk, dv], axis=-1), dr


def _relpos_ref_core(q, k, v, rb, scale, kh, kw):
    """Exact head-major rel-pos attention: q/k/v (B, H, N, dh), rb
    (B, H, N, Kh+Kw) carrying the log2(e) fold."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    bias = rb.astype(jnp.float32) / _LOG2E
    bias = (bias[..., :kh, None] + bias[..., None, kh:]).reshape(s.shape)
    p = jax.nn.softmax(s + bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _relpos_ref_headmajor(q, k, v, rb, scale, kh, kw):
    """Dispatch the exact reference, q-chunked + rematerialized for long
    sequences so its VJP never holds a full N^2 tensor."""
    n = q.shape[2]
    if n <= _BWD_CHUNK_THRESHOLD or n % _BWD_CHUNK != 0:
        return _relpos_ref_core(q, k, v, rb, scale, kh, kw)

    nc = n // _BWD_CHUNK

    @jax.checkpoint
    def one(args):
        qc, rc = args
        return _relpos_ref_core(qc, k, v, rc, scale, kh, kw)

    qs = q.reshape(q.shape[:2] + (nc, _BWD_CHUNK, q.shape[-1])
                   ).transpose(2, 0, 1, 3, 4)
    rs = rb.reshape(rb.shape[:2] + (nc, _BWD_CHUNK, rb.shape[-1])
                    ).transpose(2, 0, 1, 3, 4)
    o = jax.lax.map(one, (qs, rs))          # (nc, B, H, CHUNK, dh)
    return o.transpose(1, 2, 0, 3, 4).reshape(q.shape)


def _lanes_xla_ref(qkv, r, scale, grid_hw, heads):
    """XLA recompute of the lane-layout kernel (backward + CPU fallback)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    kh, kw = grid_hw
    rr = kh + kw
    q = qkv[..., :c].reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    k = qkv[..., c:2 * c].reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * c:].reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    rb = r.reshape(b, n, heads, rr).transpose(0, 2, 1, 3)
    o = _relpos_ref_headmajor(q, k, v, rb, scale, kh, kw)
    return o.transpose(0, 2, 1, 3).reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_attention_relpos_lanes(qkv, r, scale: float,
                                 grid_hw: Tuple[int, int], heads: int):
    """Fused rel-pos attention on the NATURAL token-major qkv projection.

    Args:
      qkv: (B, N, 3C) — the qkv Dense output reshaped only (no transpose);
        channel layout (3, heads, dh) flattened.
      r: (B, N, heads*(Kh+Kw)) factored rel-pos bias, lane-major per head,
        already multiplied by log2(e).
      scale, grid_hw, heads: as in flash_attention_relpos_packed.

    Returns (B, N, C) token-major — feeds the output projection directly.

    vs the packed kernel: identical math and softmax engineering, but both
    the input relayout (qkv -> slot-major) and the output head-major ->
    token-major transpose vanish into BlockSpec lane index maps. Only legal
    when a head pair spans one lane tile (lanes_kernel_ok)."""
    return _lanes_fwd_impl(qkv, r, scale, grid_hw, heads)


def _lanes_fwd(qkv, r, scale, grid_hw, heads):
    out = _lanes_fwd_impl(qkv, r, scale, grid_hw, heads)
    return out, (qkv, r, out)


def _lanes_bwd(scale, grid_hw, heads, res, g):
    qkv, r, out = res
    if not _fused_bwd_disabled() and _fused_bwd_ok(qkv.dtype):
        return _lanes_bwd_impl(qkv, r, out, g, scale, grid_hw, heads)
    _, vjp = jax.vjp(
        lambda a, b: _lanes_xla_ref(a, b, scale, grid_hw, heads), qkv, r)
    return vjp(g)


flash_attention_relpos_lanes.defvjp(_lanes_fwd, _lanes_bwd)


def _packed_xla_ref(qkv, r, scale, grid_hw, heads):
    """XLA recompute of the packed kernel (backward + CPU fallback)."""
    kh, kw = grid_hw
    q = qkv[:, :heads]
    k = qkv[:, heads:2 * heads]
    v = qkv[:, 2 * heads:]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    bias = (r.astype(jnp.float32) / _LOG2E)  # r carries the log2e fold
    bias = (bias[..., :kh, None] + bias[..., None, kh:]
            ).reshape(s.shape[:3] + (kh * kw,))
    p = jax.nn.softmax(s + bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_attention_relpos_packed(qkv, r, scale: float,
                                  grid_hw: Tuple[int, int], heads: int):
    """See :func:`_packed_fwd_impl`; differentiable via XLA recompute."""
    return _packed_fwd_impl(qkv, r, scale, grid_hw, heads)


def _packed_fwd(qkv, r, scale, grid_hw, heads):
    return _packed_fwd_impl(qkv, r, scale, grid_hw, heads), (qkv, r)


def _packed_bwd(scale, grid_hw, heads, res, g):
    qkv, r = res
    _, vjp = jax.vjp(
        lambda a, b: _packed_xla_ref(a, b, scale, grid_hw, heads), qkv, r)
    return vjp(g)


flash_attention_relpos_packed.defvjp(_packed_fwd, _packed_bwd)


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
