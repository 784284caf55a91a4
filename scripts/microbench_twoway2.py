"""Prototype: packed-projection XLA path for the decode TwoWayTransformer.

Current module: each Attention does its own q/k/v Dense + explicit
split-head transposes -> ~50 ops and three separate 44 MB reads of the
keys array per layer. Packed variant: ONE matmul computes k_t2i/v_t2i/
q_i2t from (keys+pe) (v corrected by a precomputed pe term), head axes
handled by reshape-only einsums (no materialized (B,H,S,dh) transpose).

Parity (max |diff|) is checked against the module path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from labelanything_tpu.models.transformer import TwoWayTransformer

from _slope_timing import run

G, S, NT, D = 96, 900, 6, 256
HEADS, DS = 8, 2
I = D // DS          # 128 cross-attn internal width
DH = I // HEADS      # 16
DHS = D // HEADS     # 32 self-attn head dim
MLP = 2048


def _softmax(x, axis=-1):
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def _attn_tok(q, k, v, p, heads, dtype):
    """Token-side attention (all operands tiny). p = (Wq,bq,Wk,bk,Wv,bv,Wo,bo)."""
    wq, bq, wk, bk, wv, bv, wo, bo = [x.astype(dtype) for x in p]
    i = wq.shape[1]
    dh = i // heads
    qp = (q @ wq + bq).reshape(*q.shape[:2], heads, dh)
    kp = (k @ wk + bk).reshape(*k.shape[:2], heads, dh)
    vp = (v @ wv + bv).reshape(*v.shape[:2], heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / np.sqrt(dh)
    a = _softmax(s.astype(jnp.float32)).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vp).reshape(*q.shape[:2], i)
    return o @ wo + bo


def packed_twoway(keys, queries, key_pe, params, dtype=jnp.bfloat16):
    """params: flat tuple in _TwoWayLayerP order (depth 2) + final attn + ln."""
    ATTN = 8

    def take(n):
        nonlocal params
        out, params = params[:n], params[n:]
        return out

    def ln(x, p, eps=1e-5):
        scale, bias = p
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        v = jnp.square(xf - u).mean(-1, keepdims=True)
        return ((xf - u) * jax.lax.rsqrt(v + eps) * scale + bias).astype(dtype)

    qpe = queries  # point_embedding
    kpe = key_pe[None]  # (1, S, D)

    for layer in range(2):
        p_self = take(ATTN)
        p_n1 = take(2)
        p_t2i = take(ATTN)
        p_n2 = take(2)
        w1, b1, w2, b2 = [x.astype(dtype) for x in take(4)]
        p_n3 = take(2)
        p_i2t = take(ATTN)
        p_n4 = take(2)

        if layer == 0:
            queries = _attn_tok(queries, queries, queries, p_self, HEADS, dtype)
        else:
            q = queries + qpe
            queries = queries + _attn_tok(q, q, queries, p_self, HEADS, dtype)
        queries = ln(queries, p_n1)

        # ---- packed image-side projections: one matmul over keys+pe
        wk, bk_, wv, bv_, wo_t2i, bo_t2i = (p_t2i[2], p_t2i[3], p_t2i[4],
                                            p_t2i[5], p_t2i[6], p_t2i[7])
        wq_i2t, bq_i2t = p_i2t[0], p_i2t[1]
        wpack = jnp.concatenate(
            [wk.astype(dtype), wv.astype(dtype), wq_i2t.astype(dtype)], axis=1)
        bpack = jnp.concatenate(
            [bk_.astype(dtype), bv_.astype(dtype), bq_i2t.astype(dtype)])
        kp_pe = keys + kpe.astype(dtype)
        pk = kp_pe @ wpack + bpack            # (G, S, 3I)
        v_corr = (kpe.astype(dtype) @ wv.astype(dtype))  # (1, S, I)
        kp = pk[..., :I]
        vp = pk[..., I:2 * I] - v_corr
        qp_img = pk[..., 2 * I:]

        # ---- t2i: tokens attend to image
        wq, bq_, wo, bo = (p_t2i[0].astype(dtype), p_t2i[1].astype(dtype),
                           wo_t2i.astype(dtype), bo_t2i.astype(dtype))
        q = queries + qpe
        qp = (q @ wq + bq_).reshape(G, NT, HEADS, DH)
        kp4 = kp.reshape(G, S, HEADS, DH)
        vp4 = vp.reshape(G, S, HEADS, DH)
        s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp4) / np.sqrt(DH)
        a = _softmax(s.astype(jnp.float32)).astype(dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, vp4).reshape(G, NT, I)
        queries = ln(queries + (o @ wo + bo), p_n2)

        # ---- mlp on tokens
        queries = ln(queries + (jax.nn.relu(queries @ w1 + b1) @ w2 + b2), p_n3)

        # ---- i2t: image attends to tokens. Keep the 6-token axis on
        # SUBLANES: scores laid out (b, h, t=6, s=900) so the image axis
        # fills the 128 lanes; a (..., 900, 6) layout would pad 6 -> 128
        # lanes and cost ~20x its logical HBM traffic.
        wk2, bk2, wv2, bv2, wo2, bo2 = [x.astype(dtype) for x in p_i2t[2:]]
        q = queries + qpe
        ktok = (q @ wk2 + bk2).reshape(G, NT, HEADS, DH)
        vtok = (queries @ wv2 + bv2).reshape(G, NT, HEADS, DH)
        qp4 = qp_img.reshape(G, S, HEADS, DH)
        s = jnp.einsum("bthd,bshd->bhts", ktok, qp4) / np.sqrt(DH)
        a = _softmax(s.astype(jnp.float32), axis=2).astype(dtype)
        o = jnp.einsum("bhts,bthd->bshd", a, vtok).reshape(G, S, I)
        keys = ln(keys + (o @ wo2 + bo2), p_n4)

    # ---- final token->image attention (packed k/v)
    p_f = take(ATTN)
    p_nf = take(2)
    wq, bq_, wk, bk_, wv, bv_, wo, bo = [x.astype(dtype) for x in p_f]
    wpack = jnp.concatenate([wk, wv], axis=1)
    bpack = jnp.concatenate([bk_, bv_])
    pk = (keys + kpe.astype(dtype)) @ wpack + bpack
    v_corr = kpe.astype(dtype) @ wv
    kp4 = pk[..., :I].reshape(G, S, HEADS, DH)
    vp4 = (pk[..., I:] - v_corr).reshape(G, S, HEADS, DH)
    q = queries + qpe
    qp = (q @ wq + bq_).reshape(G, NT, HEADS, DH)
    s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp4) / np.sqrt(DH)
    a = _softmax(s.astype(jnp.float32)).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vp4).reshape(G, NT, I)
    queries = ln(queries + (o @ wo + bo), p_nf)
    return queries, keys


def _bd(x4, heads):
    """Block-diag head expansion: (B, T, H, dh) -> (B, H*T, H*dh) with
    row-block h = tokens of head h placed in column-block h, zero elsewhere.
    Tiny (token-side) arrays only."""
    eye = jnp.eye(heads, dtype=x4.dtype)
    b, t, h, dh = x4.shape
    out = jnp.einsum("bthd,hg->bhtgd", x4, eye)
    return out.reshape(b, h * t, h * dh)


def _undiag(x, heads, t, dh):
    """(B, H*T, H*dh) -> (B, T, H*dh) taking the h==g diagonal blocks."""
    b = x.shape[0]
    eye = jnp.eye(heads, dtype=x.dtype)
    x5 = x.reshape(b, heads, t, heads, dh)
    out = jnp.einsum("bhtgd,hg->bthd", x5, eye)
    return out.reshape(b, t, heads * dh)


def _dot(a, b_, contract_a, contract_b, f32=True):
    return jax.lax.dot_general(
        a, b_, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32 if f32 else None)


def blockdiag_twoway(keys, queries, key_pe, params, dtype=jnp.bfloat16):
    """Head-blockdiag variant: every big contraction keeps (…,128) minors;
    no (B,H,S,dh) transposes, no (…,S,6) padded score layouts."""
    ATTN = 8
    scale = 1.0 / np.sqrt(DH)

    def take(n):
        nonlocal params
        out, params = params[:n], params[n:]
        return out

    def ln(x, p, eps=1e-5):
        s_, b_ = p
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        v = jnp.square(xf - u).mean(-1, keepdims=True)
        return ((xf - u) * jax.lax.rsqrt(v + eps) * s_ + b_).astype(dtype)

    qpe = queries
    kpe = key_pe[None].astype(dtype)  # (1, S, D)

    for layer in range(2):
        p_self = take(ATTN); p_n1 = take(2)
        p_t2i = take(ATTN); p_n2 = take(2)
        w1, b1, w2, b2 = [x.astype(dtype) for x in take(4)]
        p_n3 = take(2)
        p_i2t = take(ATTN); p_n4 = take(2)

        if layer == 0:
            queries = _attn_tok(queries, queries, queries, p_self, HEADS, dtype)
        else:
            q = queries + qpe
            queries = queries + _attn_tok(q, q, queries, p_self, HEADS, dtype)
        queries = ln(queries, p_n1)

        # packed image-side projections (one pass over keys)
        wk, bk_, wv, bv_ = [p_t2i[i].astype(dtype) for i in (2, 3, 4, 5)]
        wo_t2i, bo_t2i = p_t2i[6].astype(dtype), p_t2i[7].astype(dtype)
        wq_i2t, bq_i2t = p_i2t[0].astype(dtype), p_i2t[1].astype(dtype)
        wpack = jnp.concatenate([wk, wv, wq_i2t], axis=1)
        bpack = jnp.concatenate([bk_, bv_, bq_i2t])
        pk = (keys + kpe) @ wpack + bpack      # (G, S, 3I)
        v_corr = kpe @ wv                       # (1, S, I)
        kp = pk[..., :I]
        vp = pk[..., I:2 * I] - v_corr
        qp_img = pk[..., 2 * I:]

        # ---- t2i
        wq, bq_ = p_t2i[0].astype(dtype), p_t2i[1].astype(dtype)
        q = queries + qpe
        qt = _bd(((q @ wq + bq_)).reshape(G, NT, HEADS, DH), HEADS)  # (G,48,128)
        s48 = _dot(qt, kp, 2, 2) * scale       # (G, 48, S) f32
        a48 = _softmax(s48, axis=-1).astype(dtype)
        o48 = _dot(a48, vp, 2, 1)              # (G, 48, I) f32: all (h,g) blocks
        o = _undiag(o48.astype(dtype), HEADS, NT, DH)  # (G, NT, I)
        queries = ln(queries + (o @ wo_t2i + bo_t2i), p_n2)

        # ---- mlp (tokens)
        queries = ln(queries + (jax.nn.relu(queries @ w1 + b1) @ w2 + b2), p_n3)

        # ---- i2t
        wk2, bk2, wv2, bv2, wo2, bo2 = [x.astype(dtype) for x in p_i2t[2:]]
        q = queries + qpe
        kt = _bd((q @ wk2 + bk2).reshape(G, NT, HEADS, DH), HEADS)       # (G,48,128)
        vt = _bd((queries @ wv2 + bv2).reshape(G, NT, HEADS, DH), HEADS)
        s48 = _dot(kt, qp_img, 2, 2) * scale   # (G, 48, S) f32; rows = (h, t)
        a = _softmax(s48.reshape(G, HEADS, NT, S), axis=2).reshape(G, HEADS * NT, S)
        o = _dot(a.astype(dtype), vt, 1, 1)    # contract 48 -> (G, S, I)
        keys = ln(keys + (o.astype(dtype) @ wo2 + bo2), p_n4)

    # ---- final t2i
    p_f = take(ATTN); p_nf = take(2)
    wq, bq_, wk, bk_, wv, bv_, wo, bo = [x.astype(dtype) for x in p_f]
    wpack = jnp.concatenate([wk, wv], axis=1)
    bpack = jnp.concatenate([bk_, bv_])
    pk = (keys + kpe) @ wpack + bpack
    v_corr = kpe @ wv
    kp = pk[..., :I]
    vp = pk[..., I:] - v_corr
    q = queries + qpe
    qt = _bd((q @ wq + bq_).reshape(G, NT, HEADS, DH), HEADS)
    s48 = _dot(qt, kp, 2, 2) * scale
    a48 = _softmax(s48, axis=-1).astype(dtype)
    o48 = _dot(a48, vp, 2, 1)
    o = _undiag(o48.astype(dtype), HEADS, NT, DH)

    def ln_f(x, p, eps=1e-5):
        s_, b_ = p
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        v = jnp.square(xf - u).mean(-1, keepdims=True)
        return ((xf - u) * jax.lax.rsqrt(v + eps) * s_ + b_).astype(dtype)

    queries = ln_f(queries + (o @ wo + bo), p_nf)
    return queries, keys


def flat_params(variables):
    """Flatten the module param tree into _TwoWayLayerP order."""
    p = variables["params"]
    out = []

    def attn(d):
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out.append(d[name]["kernel"])
            out.append(d[name]["bias"])

    def lnp(d):
        out.append(d["scale"])
        out.append(d["bias"])

    for i in range(2):
        l = p[f"layers_{i}"]
        attn(l["self_attn"]); lnp(l["norm1"])
        attn(l["cross_attn_token_to_image"]); lnp(l["norm2"])
        out.append(l["mlp"]["lin1"]["kernel"]); out.append(l["mlp"]["lin1"]["bias"])
        out.append(l["mlp"]["lin2"]["kernel"]); out.append(l["mlp"]["lin2"]["bias"])
        lnp(l["norm3"])
        attn(l["cross_attn_image_to_token"]); lnp(l["norm4"])
    attn(p["final_attn_token_to_image"]); lnp(p["norm_final_attn"])
    return tuple(out)


def main():
    rng = jax.random.key(0)
    tw = TwoWayTransformer(depth=2, embedding_dim=D, num_heads=HEADS,
                           mlp_dim=MLP, dtype=jnp.bfloat16)
    img = jax.random.normal(rng, (G, 30, 30, D), jnp.bfloat16)
    pe = jax.random.normal(jax.random.key(1), (1, 30, 30, D), jnp.bfloat16)
    tok = jax.random.normal(jax.random.key(2), (G, NT, D), jnp.bfloat16)
    variables = jax.jit(tw.init)(rng, img, pe, tok)
    fp = flat_params(variables)

    # numeric agreement
    q_ref, k_ref = jax.jit(tw.apply)(variables, img, pe, tok)
    q_new, k_new = jax.jit(packed_twoway)(
        img.reshape(G, S, D), tok, pe.reshape(S, D), fp)
    dq = float(jnp.max(jnp.abs(q_ref.astype(jnp.float32) - q_new.astype(jnp.float32))))
    dk = float(jnp.max(jnp.abs(k_ref.astype(jnp.float32) - k_new.astype(jnp.float32))))
    print(f"max|dq|={dq:.4f} max|dk|={dk:.4f} "
          f"(scale ~{float(jnp.std(k_ref.astype(jnp.float32))):.2f})")

    def mod_step(c, v, img, pe, tok):
        q, k = tw.apply(v, img + c.astype(img.dtype) * 0, pe, tok)
        return c + jnp.sum(k.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    def packed_step(c, fp, keys, pe, tok):
        q, k = packed_twoway(keys + c.astype(keys.dtype) * 0, tok, pe, fp)
        return c + jnp.sum(k.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    q_bd, k_bd = jax.jit(blockdiag_twoway)(
        img.reshape(G, S, D), tok, pe.reshape(S, D), fp)
    dq = float(jnp.max(jnp.abs(q_ref.astype(jnp.float32) - q_bd.astype(jnp.float32))))
    dk = float(jnp.max(jnp.abs(k_ref.astype(jnp.float32) - k_bd.astype(jnp.float32))))
    print(f"blockdiag: max|dq|={dq:.4f} max|dk|={dk:.4f}")

    def bd_step(c, fp, keys, pe, tok):
        q, k = blockdiag_twoway(keys + c.astype(keys.dtype) * 0, tok, pe, fp)
        return c + jnp.sum(k.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    run("module TwoWayTransformer", mod_step, variables, img, pe, tok)
    run("packed XLA path", packed_step, fp, img.reshape(G, S, D),
        pe.reshape(S, D), tok)
    run("blockdiag XLA path", bd_step, fp, img.reshape(G, S, D),
        pe.reshape(S, D), tok)


if __name__ == "__main__":
    main()
