"""HDMNet few-shot baseline — Hierarchically Decoupled Matching Network
(CVPR 2023).

TPU-native re-design of the reference's vendored torch implementation
(reference: label_anything/models/hdmnet/ — HDMNet.py, transformer.py,
maskmultiheadattention.py, embed.py, __init__.py). Eval path; registry-
commented in the reference (models/__init__.py:25) but exercised by
parameters/validation/COCO/hdmnet_*.yaml.

Structure: the BAM PSPNet backbone (deep-base dilated ResNet-50, shared
vendored copy — HDMNet.py imports `..bam.resnet`) feeds a SegFormer-style
Mix transformer: three down-sampling stages (patch embed + two efficient
self-attention layers with spatial-reduction kv), then reversed hierarchical
matching where query tokens cross-attend to ALL support tokens with the
reference's distinctive correlation attention — L2-normalized q/k, 0.1
temperature, softmax over the QUERY axis, post-softmax mask zeroing
(maskmultiheadattention.py:62-83) — and per-level similarity-conditioned
conv + parse blocks accumulate coarse-to-fine. The BAM base/meta ensemble
(Gram reweighting with HDMNet's idx3 gather quirk, HDMNet.py:233-239)
produces the final 2-way logits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import (resize_bilinear, resize_bilinear_ac,
                          resize_nearest_torch)
from ..typing import BatchKeys, ResultDict
from .bam import BAMResNet, PPM, gram_matrix, weighted_gap
from .ppnet import _BN

_NEG_INF = float("-inf")
_EPS_COS = 1e-7


def get_similarity(q: jax.Array, s: jax.Array, mask: jax.Array) -> jax.Array:
    """Max-over-support-pixels cosine prior (reference: HDMNet.py:18-35).
    q/s (B, h, w, C); mask (B, Hm, Wm) — nearest-resized, NO min-max
    normalisation (unlike BAM). Returns (B, h, w, 1)."""
    b, h, w, c = q.shape
    m = resize_nearest_torch((mask == 1).astype(q.dtype)[..., None], (h, w),
                             spatial_axes=(1, 2))
    s = s * m
    qf = q.reshape(b, h * w, c)
    sf = s.reshape(b, h * w, c)
    qn = jnp.linalg.norm(qf, axis=-1)[:, None, :]
    sn = jnp.linalg.norm(sf, axis=-1)[:, :, None]
    sim = jnp.einsum("bmc,bnc->bmn", sf, qf) / (sn * qn + _EPS_COS)
    return jnp.max(sim, axis=1).reshape(b, h, w, 1)


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 (positional) -> GELU -> fc2
    (reference: transformer.py:46-96). Tokens in, tokens out."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
        b, l, c = x.shape
        h, w = hw
        y = x.reshape(b, h, w, c)
        y = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="pe_conv")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)
        return y.reshape(b, l, c)  # caller adds the (pre-norm) identity


class MaskAttention(nn.Module):
    """MaskMultiHeadAttention (reference: maskmultiheadattention.py):
    bias-free q/k/v/o linears; self mode = softmax over keys with
    1/(sqrt(dk)+1e-9) scale; cross mode = L2-normalized q/k, temperature
    0.1, softmax over the QUERY axis, post-softmax mask zeroing."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, kv: jax.Array,
                 mask: Optional[jax.Array] = None,
                 cross: bool = False) -> jax.Array:
        b, lq, _ = q.shape
        lk = kv.shape[1]
        hd = self.dim // self.num_heads
        qh = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="linear_q")(q)
        kh = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="linear_k")(kv)
        vh = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="linear_v")(kv)
        qh = qh.reshape(b, lq, self.num_heads, hd).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, lk, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, lk, self.num_heads, hd).transpose(0, 2, 1, 3)
        if cross:
            qh = qh / jnp.maximum(
                jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
            kh = kh / jnp.maximum(
                jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / 0.1
            attn = jax.nn.softmax(scores, axis=-2)       # over query axis!
            attn = jnp.where(mask[:, None] == 0, 0.0, attn)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (hd ** 0.5 + 1e-9)
            attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="linear_o")(out)


class HDMEncoderLayer(nn.Module):
    """TransformerEncoderLayer (reference: transformer.py:156-199):
    pre-LN efficient attention (spatial-reduction conv+LN on kv when
    sr_ratio > 1) + MixFFN."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int],
                 source: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 cross: bool = False) -> jax.Array:
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        xq = norm1(x)
        kv = xq if source is None else norm1(source)
        if self.sr_ratio > 1:
            b, l, c = kv.shape
            h, w = hw
            y = kv.reshape(b, h, w, c)
            y = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                        strides=(self.sr_ratio, self.sr_ratio),
                        dtype=self.dtype, name="attn_sr")(y)
            kv = y.reshape(b, -1, c)
            kv = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name="attn_norm")(kv)
        x = x + MaskAttention(self.dim, self.num_heads, dtype=self.dtype,
                              name="attn")(xq, kv, mask=mask, cross=cross)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + MixFFN(self.dim, self.dim * self.mlp_ratio,
                          dtype=self.dtype, name="ffn")(y, hw)


class MixVisionTransformer(nn.Module):
    """(reference: transformer.py:202-356). Three down stages + reversed
    hierarchical matching + parse/cls heads."""

    shot: int = 1
    embed_dims: int = 64
    num_heads: Sequence[int] = (2, 4, 8)
    match_heads: int = 2
    sr_ratios: Sequence[int] = (4, 2, 1)
    patch_cfg: Sequence[Tuple[int, int, int]] = ((1, 1, 0), (3, 2, 1), (3, 2, 1))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_x: jax.Array, s_x: jax.Array, mask: jax.Array,
                 similarity: jax.Array) -> jax.Array:
        """q_x (B, h, w, 64); s_x (B*Sh, h, w, 64); mask (B*Sh, Hm, Wm);
        similarity (B, h, w, 2). Returns logits (B, 2, h, w)."""
        d = self.embed_dims
        n_stages = len(self.num_heads)
        b = q_x.shape[0]

        down_q, down_s, hw_shapes, down_masks, down_sims = [], [], [], [], []
        q_map, s_map = q_x, s_x
        for i in range(n_stages):
            k, s, p = self.patch_cfg[i]
            patch = nn.Conv(d, (k, k), strides=(s, s),
                            padding=[(p, p), (p, p)], dtype=self.dtype,
                            name=f"down_{i}_patch_proj")
            pn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"down_{i}_patch_norm")
            qm = patch(q_map)
            sm = patch(s_map)
            qh, qw = qm.shape[1:3]
            q_t = pn(qm.reshape(b, qh * qw, d))
            s_t = pn(sm.reshape(sm.shape[0], qh * qw, d))
            for j in range(2):
                enc = HDMEncoderLayer(d, self.num_heads[i],
                                      sr_ratio=self.sr_ratios[i],
                                      dtype=self.dtype,
                                      name=f"down_{i}_enc{j}")
                q_t = enc(q_t, (qh, qw))
                s_t = enc(s_t, (qh, qw))
            final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                      name=f"down_{i}_norm")
            q_t, s_t = final_norm(q_t), final_norm(s_t)

            m = resize_nearest_torch(mask[..., None], (qh, qw),
                                     spatial_axes=(1, 2))
            m = m.reshape(b, self.shot * qh * qw)            # (B, n*l)
            m = jnp.broadcast_to(m[:, None, :], (b, qh * qw, m.shape[-1]))
            sim = resize_bilinear_ac(similarity, (qh, qw))

            down_q.append(q_t)
            down_s.append(s_t.reshape(b, self.shot * qh * qw, d))
            hw_shapes.append((qh, qw))
            down_masks.append(m)
            down_sims.append(sim)
            if i != n_stages - 1:
                q_map = q_t.reshape(b, qh, qw, d)
                s_map = s_t.reshape(b * self.shot, qh, qw, d)

        outs = None
        for i in reversed(range(n_stages)):
            h, w = hw_shapes[i]
            out = HDMEncoderLayer(d, self.match_heads, sr_ratio=1,
                                  dtype=self.dtype, name=f"match_{i}_enc")(
                down_q[i], (h, w), source=down_s[i], mask=down_masks[i],
                cross=True)
            out = out.reshape(b, h, w, d)
            out = jnp.concatenate([out, down_sims[i]], axis=-1)
            out = nn.Conv(d, (3, 3), padding="SAME", use_bias=False,
                          dtype=self.dtype, name=f"match_{i}_conv")(out)
            out = nn.relu(_BN(d, name=f"match_{i}_bn")(out))

            def parse(x, idx=i):
                y = nn.Conv(d * 4, (1, 1), dtype=self.dtype,
                            name=f"parse_{idx}_conv0")(x)
                y = _BN(d * 4, name=f"parse_{idx}_bn0")(y)
                y = nn.Conv(d * 4, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"parse_{idx}_conv1")(y)
                y = _BN(d * 4, name=f"parse_{idx}_bn1")(y)
                y = nn.Conv(d, (1, 1), dtype=self.dtype,
                            name=f"parse_{idx}_conv2")(y)
                y = _BN(d, name=f"parse_{idx}_bn2")(y)
                return nn.relu(y)

            if outs is None:
                outs = parse(out)
            else:
                outs = resize_bilinear(outs.transpose(0, 3, 1, 2),
                                       (h, w)).transpose(0, 2, 3, 1)
                outs = outs + parse(out + outs)

        y = nn.Conv(d * 4, (1, 1), dtype=self.dtype, name="cls_conv0")(outs)
        y = _BN(d * 4, name="cls_bn0")(y)
        y = nn.Conv(d * 4, (3, 3), padding="SAME", dtype=self.dtype,
                    name="cls_conv1")(y)
        y = _BN(d * 4, name="cls_bn1")(y)
        y = nn.Conv(2, (1, 1), dtype=self.dtype, name="cls_conv2")(y)
        return y.transpose(0, 3, 1, 2)                        # (B, 2, h, w)


class HDMNet(nn.Module):
    """(reference: hdmnet/HDMNet.py:79-306 OneModel, eval path)."""

    shot: int = 1
    base_classes: int = 60
    kshot_trans_dim: int = 2
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s_x: jax.Array, s_y: jax.Array
                 ) -> jax.Array:
        """x (B, H, W, 3); s_x (B, Sh, H, W, 3); s_y (B, Sh, Hm, Wm)."""
        b, sh_n, hh, ww, _ = s_x.shape
        assert sh_n == self.shot
        mh, mw = s_y.shape[2:]
        backbone = BAMResNet(layers=self.resnet_layers, dtype=self.dtype,
                             name="backbone")
        ppm = PPM(dtype=self.dtype, name="ppm")
        cls_conv = nn.Conv(512, (3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype, name="cls_0")
        cls_bn = _BN(512, name="cls_1")
        base_cls = nn.Conv(self.base_classes + 1, (1, 1), dtype=self.dtype,
                           name="base_learnear_2")

        def feats(imgs):
            f2, f3 = backbone(imgs)
            f4 = backbone.layer4(f3)
            f5 = cls_bn(cls_conv(ppm(f4)))
            return f2, f3, f4, f5

        qf2, qf3, qf4, qf5 = feats(x)
        h3, w3 = qf3.shape[1:3]
        query_feat = nn.relu(nn.Conv(
            256, (1, 1), use_bias=False, dtype=self.dtype,
            name="down_query_0")(jnp.concatenate([qf3, qf2], -1)))

        # supports: the INPUT IMAGE is masked before the backbone
        # (reference: HDMNet.py extract_feats with mask)
        mask_m = (s_y == 1).astype(self.dtype).reshape(b * self.shot, mh, mw, 1)
        mask_img = resize_nearest_torch(mask_m, (hh, ww), spatial_axes=(1, 2))
        flat_s = s_x.reshape(b * self.shot, hh, ww, 3) * mask_img
        sf2, sf3, sf4, sf5 = jax.lax.stop_gradient(feats(flat_s))
        supp_feat = nn.relu(nn.Conv(
            256, (1, 1), use_bias=False, dtype=self.dtype,
            name="down_supp_0")(jnp.concatenate([sf3, sf2], -1)))
        mask3 = resize_bilinear_ac(mask_m, (h3, w3))
        supp_feat_bin = weighted_gap(supp_feat, mask3)        # (B*Sh,1,1,256)
        supp_feat_bin = jnp.broadcast_to(supp_feat_bin, supp_feat.shape)

        # similarity priors from feat4 / feat5, per shot then averaged
        def per_shot_sim(qf, sf):
            sims = []
            for i in range(self.shot):
                sims.append(get_similarity(
                    qf, sf.reshape(b, self.shot, *sf.shape[1:])[:, i],
                    s_y[:, i]))
            return jnp.mean(jnp.stack(sims, 1), axis=1)
        similarity2 = per_shot_sim(qf4, sf4)
        similarity1 = per_shot_sim(qf5, sf5)
        similarity = jnp.concatenate([similarity1, similarity2], -1)

        supp_merged = nn.relu(nn.Conv(
            64, (1, 1), use_bias=False, dtype=self.dtype,
            name="supp_merge_0")(jnp.concatenate(
                [supp_feat, supp_feat_bin], -1)))
        bin_mean = supp_feat_bin.reshape(
            b, self.shot, *supp_feat_bin.shape[1:]).mean(axis=1)
        query_merged = nn.relu(nn.Conv(
            64, (1, 1), use_bias=False, dtype=self.dtype,
            name="query_merge_0")(jnp.concatenate(
                [query_feat, bin_mean, similarity * 10], -1)))

        meta_out = MixVisionTransformer(
            shot=self.shot, dtype=self.dtype, name="transformer")(
            query_merged, supp_merged,
            mask_m.reshape(b * self.shot, mh, mw), similarity)
        base_out = base_cls(nn.relu(qf5)).transpose(0, 3, 1, 2)

        # --- K-shot Gram reweighting (low_fea = layer2; HDMNet's own
        # idx3 = idx1.gather(idx2) quirk, HDMNet.py:233-239)
        que_gram = gram_matrix(qf2)
        norm_max = jnp.sqrt(jnp.asarray(
            que_gram.shape[1] * que_gram.shape[2], self.dtype))
        sup_gram = gram_matrix(sf2)
        diff = que_gram[:, None] - sup_gram.reshape(b, self.shot,
                                                    *sup_gram.shape[1:])
        est_val = jnp.linalg.norm(diff.reshape(b, self.shot, -1), axis=-1)
        est_val = est_val / norm_max
        if self.shot > 1:
            order = jnp.argsort(est_val, axis=1)              # idx1
            val1 = jnp.take_along_axis(est_val, order, axis=1)
            inv = jnp.argsort(order, axis=1)                  # idx2
            idx3 = jnp.take_along_axis(order, inv, axis=1)
            wgt = val1[:, None, None, :]
            wgt = nn.Conv(self.kshot_trans_dim, (1, 1), dtype=self.dtype,
                          name="kshot_rw_0")(wgt)
            wgt = nn.relu(wgt)
            wgt = nn.Conv(self.shot, (1, 1), dtype=self.dtype,
                          name="kshot_rw_2")(wgt)[:, 0, 0]
            wgt = jnp.take_along_axis(wgt, idx3, axis=1)
            weight_soft = jax.nn.softmax(wgt, axis=1)
        else:
            weight_soft = jnp.ones_like(est_val)
        est_val = jnp.sum(weight_soft * est_val, axis=1)

        # --- BAM-style ensemble (reference: HDMNet.py:242-268)
        meta_soft = jax.nn.softmax(meta_out, axis=1)
        base_soft = jax.nn.softmax(base_out, axis=1)
        meta_bg = meta_soft[:, 0:1].transpose(0, 2, 3, 1)
        meta_fg = meta_soft[:, 1:2].transpose(0, 2, 3, 1)
        base_map = jnp.sum(base_soft[:, 1:], axis=1)[..., None]
        est_map = jnp.broadcast_to(est_val[:, None, None, None],
                                   meta_fg.shape)
        gram_merge = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                             kernel_init=nn.initializers.constant(
                                 jnp.asarray([[1.0], [0.0]])[None, None]),
                             name="gram_merge")
        cls_merge = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                            kernel_init=nn.initializers.constant(
                                jnp.asarray([[1.0], [0.0]])[None, None]),
                            name="cls_merge")
        meta_bg = gram_merge(jnp.concatenate([meta_bg, est_map], -1))
        meta_fg = gram_merge(jnp.concatenate([meta_fg, est_map], -1))
        merge_bg = cls_merge(jnp.concatenate([meta_bg, base_map], -1))
        final = jnp.concatenate([merge_bg, meta_fg], axis=-1)
        final = resize_bilinear_ac(final, (hh, ww))
        return final.transpose(0, 3, 1, 2)


class HDMNetMultiClass(nn.Module):
    """LAM-batch adapter (reference: hdmnet/__init__.py:31-112), identical
    protocol to BAM's: flagged supports with repeat-last padding, binary
    outputs merged BinaryLam-style."""

    shot: int = 1
    base_classes: int = 60
    image_size: int = 473
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        model = HDMNet(shot=self.shot, base_classes=self.base_classes,
                       resnet_layers=self.resnet_layers, dtype=self.dtype,
                       name="hdmnet")
        images = batch[BatchKeys.IMAGES]
        b, n_imgs, hh, ww, _ = images.shape
        qry, sup = images[:, 0], images[:, 1:]
        masks = batch[BatchKeys.PROMPT_MASKS]
        flag = batch[BatchKeys.FLAG_EXAMPLES].astype(jnp.float32)
        if masks.shape[1] == n_imgs:
            masks, flag = masks[:, 1:], flag[:, 1:]
        m, c = masks.shape[1:3]

        per_class = []
        for ci in range(1, c):
            fl = flag[:, :, ci]
            order = jnp.argsort(-fl + jnp.arange(m) * 1e-4, axis=1)
            count = jnp.maximum(fl.sum(axis=1).astype(jnp.int32), 1)
            pos = jnp.minimum(jnp.arange(self.shot)[None], count[:, None] - 1)
            sel = jnp.take_along_axis(order, pos, axis=1)
            s_x = jnp.take_along_axis(sup, sel[:, :, None, None, None], axis=1)
            s_y = jnp.take_along_axis(masks[:, :, ci], sel[:, :, None, None],
                                      axis=1)
            per_class.append(model(qry, s_x, s_y))
        logits = jnp.stack(per_class, axis=1)
        fg = logits[:, :, 1]
        bgs = logits[:, :, 0]
        pos = jnp.argmax(fg, axis=1, keepdims=True)
        bg = jnp.take_along_axis(bgs, pos, axis=1)
        seg = jnp.concatenate([bg, fg], axis=1)
        if BatchKeys.FLAG_GTS in batch:
            seg = jnp.where(batch[BatchKeys.FLAG_GTS][:, :, None, None],
                            seg, _NEG_INF)
        return {ResultDict.LOGITS: seg}


def build_hdmnet(dataset: str = "coco", shots: int = 1, val_fold_idx: int = 0,
                 image_size: int = 473, **kwargs) -> HDMNetMultiClass:
    """(reference: hdmnet/__init__.py:114-173 build_hdmnet). Checkpoints
    load via utils.torch_import.convert_hdmnet_state_dict."""
    base_classes = 15 if dataset.lower() == "pascal" else 60
    return HDMNetMultiClass(shot=shots, base_classes=base_classes,
                            image_size=image_size, **kwargs)
