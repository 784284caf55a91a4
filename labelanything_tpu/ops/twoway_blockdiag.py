"""Layout-optimal XLA path for the TwoWayTransformer decode hot loop.

The prompt-encoder fusion and the mask decoder both run a SAM-style
TwoWayTransformer (reference: label_anything/models/transformer.py:157-330)
over G instances of S~900 image tokens x NT~6-10 sparse/class tokens at
D=256 with downsample-rate-2 cross attention (internal width I=128,
dh = I/heads = 16). The stage is HBM-bandwidth-bound; the module path's
compiled HLO moves ~2.4 GB per call at decode shapes because of three
layout pathologies (measured on v5e, scripts/microbench_twoway2.py):

  1. split-head transposes materialize (G, H, S, dh=16) arrays whose
     16-wide minor axis pads to the 128-lane tile -> 8x physical traffic;
  2. image->token scores materialize (…, S, NT) with NT~6 minor -> 21x
     padding (and fp32);
  3. layout disagreements between the dots and the LayerNorm/residual
     fusions insert four full copies of the (G, S, D) keys array.

This path removes all three at the XLA level (no Pallas needed):

  * the three image-side projections that read the keys array per layer
    (k/v of token->image, q of image->token) are packed into ONE matmul
    over ``keys + pe`` (v is corrected by the precomputed ``pe @ Wv``);
  * per-head attention is computed via BLOCK-DIAGONAL expansion of the
    tiny token-side operands: a (G, H*NT, I) operand whose row-block h
    occupies column-block h turns all score/PV contractions into plain
    batched dots over the 128-wide internal axis — scores live as
    (G, H*NT, S) with the S axis on lanes, and no (…, dh) or (…, NT)
    minor ever materializes. The H-fold FLOP blowup only touches
    contractions whose logical cost is microscopic (~1 GFLOP vs the
    limiter: bandwidth).

Measured at decode shapes (G=96, S=900, NT=6, bf16): 1.38 ms vs 2.25 ms
for the module path, bit-comparable outputs (max |d| == the packed
re-association drift, ~0.04 on unit-scale bf16 data). The instance-grain
Pallas kernel (ops/fused_twoway.py) measured 0.83x end-to-end and stays
disabled; this formulation beats XLA's default schedule by fixing layouts,
not by fusing harder.

**Shared-keys (rank-1 shift) fast path.** When no mask prompts are present,
the prompt encoder's per-(example, class) image operand is
``keys[g=(bm, c)] = base[bm] + u[g]`` with a *spatially uniform* shift
``u = no_mask_embed + class-bank row`` (reference: the chunked axis of
prompt_encoder.py:677-694 — here exploited by linearity instead of chunked).
Passing ``keys`` as the (BM, S, D) base plus ``key_shift`` (G, D) lets
layer 1 run all image-side work C-fold cheaper, exactly:

  * the packed projection runs over BM instances; the shift contributes
    ``u @ W`` per instance (rank-1);
  * token->image scores: the key correction ``qt . (u @ Wk)`` is constant
    over the S (softmax) axis, so it cancels — omitted entirely;
  * token->image PV: softmax rows sum to 1, so the V correction adds
    ``u @ Wv`` verbatim to each output row;
  * image->token scores: the query correction varies per token row and the
    segment softmax runs over rows, so it is kept (one tiny einsum).

The full (G, S, D) keys array first materializes at layer 1's image-side
residual; layers >= 2 proceed on the normal path.

Enabled by default on TPU; ``_FORCE`` lets CPU tests exercise it.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Toggled by tests to exercise this path on CPU.
_ENABLE = True
_FORCE = False


def _reassoc_enabled() -> bool:
    """Round-4 re-associated streaming: instead of materializing the packed
    (G, S, 3I) image-side projection per layer (44 MB read + 66 MB write +
    66 MB re-read at decode shapes), contract the TINY token-side operands
    with the projection weights first (``qt @ Wk^T`` — microscopic FLOPs)
    and stream the raw (G, S, D) keys array directly through every score/PV
    dot. Exact by associativity; terms constant over the softmax axis
    (``bk``, the t2i key shift) cancel and are dropped.

    Default OFF: at decode shapes the re-associated HLO sent the tunneled
    XLA compile service into a 40+ minute compile (two independent hangs;
    the packed-projection graph compiles in minutes), so the variant stays
    opt-in (``LA_TPU_BLOCKDIAG_REASSOC=1``) until the toolchain handles it.
    CPU tests exercise both paths."""
    return os.environ.get("LA_TPU_BLOCKDIAG_REASSOC", "0") == "1"

# params-tuple layout per Attention: (Wq, bq, Wk, bk, Wv, bv, Wo, bo)
_ATTN_N = 8


def _ln(x, scale, bias, dtype, eps=1e-5):
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    v = jnp.square(xf - u).mean(-1, keepdims=True)
    return ((xf - u) * jax.lax.rsqrt(v + eps) * scale + bias).astype(dtype)


def _bd(x4: jax.Array) -> jax.Array:
    """Block-diag head expansion: (B, T, H, dh) -> (B, H*T, H*dh); row-block
    h holds head h's tokens in column-block h, zeros elsewhere."""
    b, t, h, dh = x4.shape
    eye = jnp.eye(h, dtype=x4.dtype)
    return jnp.einsum("bthd,hg->bhtgd", x4, eye).reshape(b, h * t, h * dh)


def _undiag(x: jax.Array, heads: int, t: int, dh: int) -> jax.Array:
    """(B, H*T, H*dh) -> (B, T, H*dh), keeping the h==g diagonal blocks."""
    b = x.shape[0]
    eye = jnp.eye(heads, dtype=x.dtype)
    x5 = x.reshape(b, heads, t, heads, dh)
    return jnp.einsum("bhtgd,hg->bthd", x5, eye).reshape(b, t, heads * dh)


def _dot(a, b, ca, cb, f32=True):
    """Batched dot. f32=True materializes the result in fp32 (scores, which
    feed softmax); attention outputs stay bf16 — the MXU accumulates in
    fp32 either way, and an fp32 (G, S, I) output would double its HBM
    write + force a cast pass."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32 if f32 else None)


def _segment_softmax(s48: jax.Array, nt: int) -> jax.Array:
    """Softmax over axis-1 groups of ``nt`` contiguous rows of (G, H*NT, S),
    computed with reduce_window + repeat so the array never changes layout
    (a reshape to (G, H, NT, S) regroups sublanes and costs full copies)."""
    # stop_gradient on the shift: softmax is shift-invariant so the max's
    # cotangent cancels exactly — but letting AD compute that zero routes
    # the backward through SelectAndScatter (the max-reduce_window
    # transpose), which scalarizes on TPU. jax.nn.softmax does the same.
    m = jax.lax.stop_gradient(jax.lax.reduce_window(
        s48, -jnp.inf, jax.lax.max, (1, nt, 1), (1, nt, 1), "VALID"))
    e = jnp.exp(s48 - jnp.repeat(m, nt, axis=1))
    z = jax.lax.reduce_window(
        e, 0.0, jax.lax.add, (1, nt, 1), (1, nt, 1), "VALID")
    return e / jnp.repeat(z, nt, axis=1)


def _attn_tok(q, k, v, p, heads, dtype):
    """Token-side (all-small) attention; p = (Wq,bq,Wk,bk,Wv,bv,Wo,bo)."""
    wq, bq, wk, bk, wv, bv, wo, bo = [x.astype(dtype) for x in p]
    i = wq.shape[1]
    dh = i // heads
    b, nt = q.shape[:2]
    qp = (q @ wq + bq).reshape(b, nt, heads, dh)
    kp = (k @ wk + bk).reshape(b, k.shape[1], heads, dh)
    vp = (v @ wv + bv).reshape(b, v.shape[1], heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                   preferred_element_type=jnp.float32) / np.sqrt(dh)
    a = jax.nn.softmax(s, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vp).reshape(b, nt, i)
    return o @ wo + bo


def twoway_blockdiag(
    keys: jax.Array,            # (G, S, D) image tokens — or (BM, S, D) base
    point_embedding: jax.Array,  # (G, NT, D) sparse/class tokens
    key_pe: jax.Array,          # (S, D) shared positional source
    params: Sequence[jax.Array],
    depth: int,
    num_heads: int,
    downsample_rate: int,
    activation: Callable,
    dtype: jnp.dtype,
    key_shift: Optional[jax.Array] = None,  # (G, D) uniform per-instance shift
    key_shift_map: Optional[jax.Array] = None,   # (G, S, Cm) low-rank map
    key_shift_proj: Optional[jax.Array] = None,  # (Cm, D)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (queries, keys), matching TwoWayTransformer.__call__.

    With ``key_shift``, the effective image operand is
    ``keys[g] = keys[g // group] + key_shift[g]`` (group = G // BM) and
    layer 1's image-side computation runs over the BM base instances only
    (see module docstring — exact by linearity/softmax identities).

    With ``key_shift_map`` + ``key_shift_proj`` (the factored mask
    correction, Cm = mask_in_chans = 16) the effective operand adds the
    spatially-varying ``map[g] @ proj``: layer 1's packed projection becomes
    ``repeat(pk_base) + (u @ Wpack) + map @ (proj @ Wpack)`` — the base
    projection still runs per (b, m), and the correction streams the
    16-channel map through a folded (Cm, 3I) weight, 16x fewer bytes/MACs
    than projecting the materialized 256-dim keys. The per-instance keys
    array first materializes alongside (needed from the layer-1 image-side
    residual on); the softmax cancellation tricks of the rank-1 path do not
    apply (the correction varies over S), so the attention math past the
    projection runs the plain per-instance path."""
    g = point_embedding.shape[0]
    shared = key_shift is not None
    if shared:
        bm, s, d = keys.shape
        if g % bm != 0:
            raise ValueError(
                f"shared-keys path needs the token count ({g}) divisible by "
                f"the base-image count ({bm}): point_embedding must carry "
                f"exactly C instances per (batch, example) base map")
        group = g // bm
    else:
        _, s, d = keys.shape
    nt = point_embedding.shape[1]
    i = d // downsample_rate
    dh = i // num_heads
    scale = 1.0 / np.sqrt(dh)
    params = list(params)

    def take(n):
        out = params[:n]
        del params[:n]
        return out

    queries = point_embedding.astype(dtype)
    qpe = point_embedding.astype(dtype)
    keys = keys.astype(dtype)
    kpe = key_pe[None].astype(dtype)  # (1, S, D)

    def t2i(queries, kp, vp, p_attn, p_norm):
        """tokens attend to image; returns LN(queries + attn)."""
        wq, bq = p_attn[0].astype(dtype), p_attn[1].astype(dtype)
        wo, bo = p_attn[6].astype(dtype), p_attn[7].astype(dtype)
        q = queries + qpe
        qt = _bd((q @ wq + bq).reshape(g, nt, num_heads, dh))
        s48 = _dot(qt, kp, 2, 2) * scale            # (G, H*NT, S)
        a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
        o48 = _dot(a48, vp, 2, 1, f32=False)        # (G, H*NT, I) — tiny
        o = _undiag(o48, num_heads, nt, dh)
        return queries + (o @ wo + bo), p_norm

    def _gdot(x, y, cy, f32=True):
        """Grouped batched dot: x (G, T, X) against the SHARED y (BM, ., .)
        by regrouping the C instances of each bm onto the token axis —
        same MACs, but y streams from HBM once per bm instead of C times."""
        t = x.shape[1]
        xr = x.reshape(bm, group * t, x.shape[2])
        out = _dot(xr, y, 2, cy, f32)
        return out.reshape(g, t, out.shape[-1])

    def _pedot(x, pe2):
        """x (G, T, D) against the SHARED pe (S, D): one unbatched matmul
        (reads pe once, ~0.5 MB) -> (G, T, S) fp32."""
        t = x.shape[1]
        out = jnp.dot(x.reshape(-1, x.shape[2]), pe2.T,
                      preferred_element_type=jnp.float32)
        return out.reshape(x.shape[0], t, pe2.shape[0])

    def _wdot(x, w):
        """Token-side re-association: x (G, T, I) @ w^T for w (D, I) ->
        (G, T, D); microscopic FLOPs, lets the score/PV dots stream the raw
        keys array instead of a materialized per-layer projection."""
        return jnp.einsum("gti,di->gtd", x, w)

    reassoc = _reassoc_enabled()

    if shared and key_shift_map is not None and reassoc:
        # the opt-in re-associated variant has no packed projection to fold
        # the map correction into — expand eagerly and run it per-instance
        keys = (jnp.repeat(keys, group, axis=0)
                + key_shift.astype(dtype)[:, None, :]
                + (key_shift_map @ key_shift_proj).astype(dtype))
        shared = False
        key_shift = key_shift_map = key_shift_proj = None

    for layer in range(depth):
        p_self = take(_ATTN_N)
        n1s, n1b = take(2)
        p_t2i = take(_ATTN_N)
        n2s, n2b = take(2)
        w1, b1, w2, b2 = [x.astype(dtype) for x in take(4)]
        n3s, n3b = take(2)
        p_i2t = take(_ATTN_N)
        n4s, n4b = take(2)

        # self attention on tokens (skip_first_layer_pe at layer 0)
        if layer == 0:
            queries = _attn_tok(queries, queries, queries, p_self,
                                num_heads, dtype)
        else:
            q = queries + qpe
            queries = queries + _attn_tok(q, q, queries, p_self,
                                          num_heads, dtype)
        queries = _ln(queries, n1s, n1b, dtype)

        in_shared = shared and layer == 0
        wq_i2t, bq_i2t = p_i2t[0].astype(dtype), p_i2t[1].astype(dtype)
        wk, bk, wv, bv = [p_t2i[j].astype(dtype) for j in (2, 3, 4, 5)]
        if reassoc:
            # no packed projection: token-side operands absorb the image
            # projections (see _reassoc_enabled), the raw keys stream feeds
            # every dot directly. bk is constant over the S softmax axis and
            # cancels; the V bias adds verbatim (softmax rows sum to 1); the
            # kpe contribution is one SHARED skinny matmul per use.
            wq, bq = p_t2i[0].astype(dtype), p_t2i[1].astype(dtype)
            wo, bo = p_t2i[6].astype(dtype), p_t2i[7].astype(dtype)
            q = queries + qpe
            qt = _bd((q @ wq + bq).reshape(g, nt, num_heads, dh))
            qtk = _wdot(qt, wk)                      # (G, H*NT, D)
            pe_term = _pedot(qtk, kpe[0])
            if in_shared:
                shift = key_shift.astype(dtype)
                # qtk.u is constant over S -> cancels in the softmax
                s48 = (_gdot(qtk, keys, 2) + pe_term) * scale
                a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
                # a48 @ (base + u) = grouped dot + u (rows sum to 1)
                aK = _gdot(a48, keys, 1, f32=False) + shift[:, None, :]
            else:
                s48 = (_dot(qtk, keys, 2, 2) + pe_term) * scale
                a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
                aK = _dot(a48, keys, 2, 1, f32=False)  # (G, H*NT, D)
            o48 = jnp.einsum("gtd,di->gti", aK.astype(dtype), wv) + bv
            o = _undiag(o48, num_heads, nt, dh)
            out = queries + (o @ wo + bo)
        else:
            # packed image-side projections: one pass over keys + pe
            wpack = jnp.concatenate([wk, wv, wq_i2t], axis=1)
            bpack = jnp.concatenate([bk, bv, bq_i2t])
            pk = (keys + kpe) @ wpack + bpack  # (G or BM, S, 3I)
            v_corr = kpe @ wv                           # (1, S, I)
            if in_shared and key_shift_map is not None:
                # rank-Cm mask correction: fold the 1x1 conv into the packed
                # projection; the BM-instance base projection above is the
                # only pass over the 256-dim keys, the per-instance
                # correction streams the 16-channel map
                shift = key_shift.astype(dtype)
                m16 = key_shift_map.astype(dtype)
                wmap = key_shift_proj.astype(dtype) @ wpack   # (Cm, 3I)
                pk = (jnp.repeat(pk, group, axis=0)
                      + (shift @ wpack)[:, None, :]
                      + m16 @ wmap)                           # (G, S, 3I)
                # materialize the per-instance keys for the layer-1 i2t
                # residual + layers >= 2 (as the rank-1 path does)
                keys = (jnp.repeat(keys, group, axis=0)
                        + shift[:, None, :]
                        + (m16 @ key_shift_proj.astype(dtype)))
                in_shared = False  # attention math runs per-instance now
            kp = pk[..., :i]
            vp = pk[..., i:2 * i] - v_corr
            qp_img = pk[..., 2 * i:]
            if in_shared:
                shift = key_shift.astype(dtype)
                sp = shift @ wpack                   # (G, 3I), rank-1, no bias
                sv, sq = sp[:, i:2 * i], sp[:, 2 * i:]

            # token->image cross attention
            if in_shared:
                # the key correction qt.(u@Wk) is constant over S -> cancels
                # in the softmax; the V correction adds sv to every output
                # row because softmax rows sum to 1
                wq, bq = p_t2i[0].astype(dtype), p_t2i[1].astype(dtype)
                wo, bo = p_t2i[6].astype(dtype), p_t2i[7].astype(dtype)
                q = queries + qpe
                qt = _bd((q @ wq + bq).reshape(g, nt, num_heads, dh))
                s48 = _gdot(qt, kp, 2) * scale
                a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
                o48 = _gdot(a48, vp, 1, f32=False)
                o = _undiag(o48, num_heads, nt, dh) + sv[:, None, :]
                out = queries + (o @ wo + bo)
            else:
                out, _ = t2i(queries, kp, vp, p_t2i, None)
        queries = _ln(out, n2s, n2b, dtype)

        # mlp on tokens
        queries = _ln(
            queries + (activation(queries @ w1 + b1) @ w2 + b2),
            n3s, n3b, dtype)

        # image->token cross attention: scores (G, H*NT, S) keep S on lanes
        wk2, bk2, wv2, bv2, wo2, bo2 = [x.astype(dtype) for x in p_i2t[2:]]
        q = queries + qpe
        kt = _bd((q @ wk2 + bk2).reshape(g, nt, num_heads, dh))
        vt = _bd((queries @ wv2 + bv2).reshape(g, nt, num_heads, dh))
        if reassoc:
            ktq = _wdot(kt, wq_i2t)                  # (G, H*NT, D)
            # the row softmax does NOT run over S -> the query bias and the
            # per-instance shift survive as per-row constants
            rowb = jnp.einsum("gti,i->gt", kt, bq_i2t,
                              preferred_element_type=jnp.float32)
            pe_term = _pedot(ktq, kpe[0])
            if in_shared:
                rowu = jnp.einsum("gtd,gd->gt", ktq, shift,
                                  preferred_element_type=jnp.float32)
                s48 = (_gdot(ktq, keys, 2) + pe_term
                       + (rowb + rowu)[..., None]) * scale
                # materialize per-instance keys for the residual + layers >= 2
                keys = jnp.repeat(keys, group, axis=0) + shift[:, None, :]
            else:
                s48 = (_dot(ktq, keys, 2, 2) + pe_term
                       + rowb[..., None]) * scale
        elif in_shared:
            # the query correction kt.(u@Wq) varies per token row and the
            # segment softmax runs over rows -> keep it (one tiny einsum)
            row = jnp.einsum("gti,gi->gt", kt, sq,
                             preferred_element_type=jnp.float32)
            s48 = (_gdot(kt, qp_img, 2) + row[..., None]) * scale
            # materialize the per-instance keys for the residual + layers >= 2
            keys = jnp.repeat(keys, group, axis=0) + shift[:, None, :]
        else:
            s48 = _dot(kt, qp_img, 2, 2) * scale
        a = _segment_softmax(s48, nt).astype(dtype)
        o = _dot(a, vt, 1, 1, f32=False)             # (G, S, I) bf16
        keys = _ln(keys + (o @ wo2 + bo2), n4s, n4b, dtype)

    # final token->image attention
    p_f = take(_ATTN_N)
    nfs, nfb = take(2)
    wq, bq, wk, bk, wv, bv, wo, bo = [x.astype(dtype) for x in p_f]
    q = queries + qpe
    qt = _bd((q @ wq + bq).reshape(g, nt, num_heads, dh))
    if reassoc:
        qtk = _wdot(qt, wk)
        s48 = (_dot(qtk, keys, 2, 2) + _pedot(qtk, kpe[0])) * scale
        a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
        aK = _dot(a48, keys, 2, 1, f32=False)
        o48 = jnp.einsum("gtd,di->gti", aK.astype(dtype), wv) + bv
    else:
        wpack = jnp.concatenate([wk, wv], axis=1)
        bpack = jnp.concatenate([bk, bv])
        pk = (keys + kpe) @ wpack + bpack
        v_corr = kpe @ wv
        kp = pk[..., :i]
        vp = pk[..., i:] - v_corr
        s48 = _dot(qt, kp, 2, 2) * scale
        a48 = jax.nn.softmax(s48, axis=-1).astype(dtype)
        o48 = _dot(a48, vp, 2, 1, f32=False)
    o = _undiag(o48, num_heads, nt, dh)
    queries = _ln(queries + (o @ wo + bo), nfs, nfb, dtype)
    return queries, keys
