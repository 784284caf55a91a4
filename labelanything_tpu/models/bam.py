"""BAM few-shot baseline — Base and Meta learner ensemble (CVPR 2022).

TPU-native re-design of the reference's vendored torch implementation
(reference: label_anything/models/bam/ — BAM.py, PSPNet.py, PPM.py, ASPP.py,
resnet.py, __init__.py). Eval path; registry-commented in the reference
(models/__init__.py:24) but exercised by parameters/validation/*/bam_*.yaml.

Components:
* ``BAMResNet`` — PSPNet-style deep-base ResNet-50 (3-conv stem to 128ch,
  uniform dilation 2/4 in layers 3/4 after the reference's module surgery,
  output stride 8) exposing layer2/layer3 features and a separately callable
  layer4 (supports run layer4 on MASKED layer3 features, BAM.py:205-211).
* Meta learner — down-projected query/support features, Weighted-GAP
  prototypes, per-shot Gram-difference reweighting (sort -> 1x1 MLP ->
  unsort -> softmax, BAM.py:225-237), cosine prior mask from masked layer4
  support pixels (max over support pixels + min-max normalisation,
  BAM.py:240-263), merge convs + ASPP + residual blocks + 2-way classifier.
* Base learner — frozen PSPNet PPM + cls head over layer4; its non-target
  foreground probability mass fuses with the meta background through the
  learned 2->1 ensemble convs (BAM.py:277-299).

The reference's flag-driven support gathering (boolean indexing with
repeat-last padding, bam/__init__.py:50-60) becomes a static top-k index
selection with clamped repeats, so the whole multi-class forward jits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_bilinear_ac
from ..typing import BatchKeys, ResultDict
from .ppnet import Bottleneck, _BN

_NEG_INF = float("-inf")
_EPS_COS = 1e-7


class BAMResNet(nn.Module):
    """Deep-base dilated ResNet (reference: bam/resnet.py:100-165 +
    PSPNet.py:75-87 surgery). ``__call__`` returns (feat2, feat3);
    ``layer4`` is exposed for masked support invocation."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layer0_0 = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME",
                                use_bias=False, dtype=self.dtype)
        self.layer0_1 = _BN(64)
        self.layer0_3 = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                                dtype=self.dtype)
        self.layer0_4 = _BN(64)
        self.layer0_6 = nn.Conv(128, (3, 3), padding="SAME", use_bias=False,
                                dtype=self.dtype)
        self.layer0_7 = _BN(128)

        def make_stage(name, planes, n_blocks, stride, dilation):
            blocks = []
            for bi in range(n_blocks):
                blocks.append(Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=bi == 0,
                    dtype=self.dtype,
                    name=f"{name}_{bi}",
                ))
            return blocks

        self.l1 = make_stage("layer1", 64, self.layers[0], 1, 1)
        self.l2 = make_stage("layer2", 128, self.layers[1], 2, 1)
        # post-surgery: stride 1 everywhere, uniform dilation 2 / 4
        self.l3 = make_stage("layer3", 256, self.layers[2], 1, 2)
        self.l4 = make_stage("layer4", 512, self.layers[3], 1, 4)

    def stem(self, x: jax.Array) -> jax.Array:
        x = nn.relu(self.layer0_1(self.layer0_0(x)))
        x = nn.relu(self.layer0_4(self.layer0_3(x)))
        x = nn.relu(self.layer0_7(self.layer0_6(x)))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = self.stem(x)
        for blk in self.l1:
            x = blk(x)
        for blk in self.l2:
            x = blk(x)
        f2 = x
        for blk in self.l3:
            x = blk(x)
        return f2, x

    def layer4(self, x: jax.Array) -> jax.Array:
        for blk in self.l4:
            x = blk(x)
        return x


class PPM(nn.Module):
    """Pyramid pooling (reference: bam/PPM.py). features_N names match the
    ModuleList indexes for weight import."""

    reduction_dim: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.resize import adaptive_avg_pool

        h, w = x.shape[1:3]
        out = [x]
        for i, b in enumerate(self.bins):
            p = adaptive_avg_pool(x.transpose(0, 3, 1, 2), (b, b))
            p = p.transpose(0, 2, 3, 1)
            p = nn.Conv(self.reduction_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"features_{i}_conv")(p)
            p = nn.relu(_BN(self.reduction_dim, name=f"features_{i}_bn")(p))
            out.append(resize_bilinear_ac(p, (h, w)))
        return jnp.concatenate(out, axis=-1)


class ASPPMeta(nn.Module):
    """(reference: bam/ASPP.py): global branch + 1x1 + dilated 6/12/18."""

    depth: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1:3]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(nn.Conv(self.depth, (1, 1), dtype=self.dtype,
                            name="layer6_0")(g))
        g = jnp.broadcast_to(g, (x.shape[0], h, w, self.depth))
        outs = [g, nn.relu(nn.Conv(self.depth, (1, 1), dtype=self.dtype,
                                   name="layer6_1")(x))]
        for i, rate in enumerate((6, 12, 18)):
            outs.append(nn.relu(nn.Conv(
                self.depth, (3, 3), kernel_dilation=(rate, rate),
                padding=[(rate, rate)] * 2, dtype=self.dtype,
                name=f"layer6_{i + 2}")(x)))
        return jnp.concatenate(outs, axis=-1)


def weighted_gap(feat: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked global average pooling (reference: BAM.py:19-24).
    feat (N, h, w, C); mask (N, h, w, 1). Returns (N, 1, 1, C)."""
    num = jnp.sum(feat * mask, axis=(1, 2), keepdims=True)
    area = jnp.sum(mask, axis=(1, 2), keepdims=True) + 0.0005
    return num / area


def gram_matrix(feat: jax.Array) -> jax.Array:
    """Normalized Gram matrix (reference: BAM.py:26-33).
    feat (N, h, w, C) -> (N, C, C)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c).transpose(0, 2, 1)     # (N, C, HW)
    norm = jnp.linalg.norm(f, axis=2, keepdims=True)     # (N, C, 1)
    gram = jnp.einsum("ncm,ndm->ncd", f, f)
    return gram / (norm * norm.transpose(0, 2, 1) + _EPS_COS)


class BAM(nn.Module):
    """(reference: bam/BAM.py:37-317 OneModel, eval path)."""

    shot: int = 1
    base_classes: int = 60          # coco; pascal = 15
    kshot_trans_dim: int = 2
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s_x: jax.Array, s_y: jax.Array
                 ) -> jax.Array:
        """x (B, H, W, 3); s_x (B, Sh, H, W, 3); s_y (B, Sh, Hm, Wm) binary
        (any resolution — binarized before any resize, like the reference).
        Returns final_out (B, 2, H, W)."""
        b, sh_n, hh, ww, _ = s_x.shape
        mh, mw = s_y.shape[2:]
        assert sh_n == self.shot
        backbone = BAMResNet(layers=self.resnet_layers, dtype=self.dtype,
                             name="backbone")
        down_query = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                             name="down_query_0")
        down_supp = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                            name="down_supp_0")

        qf2, qf3 = backbone(x)
        qf4 = backbone.layer4(qf3)
        query_feat = nn.relu(down_query(jnp.concatenate([qf3, qf2], -1)))
        h3, w3 = qf3.shape[1:3]
        sp = qf4.shape[1]

        # --- support pass (frozen): layer4 runs on masked layer3 features
        flat_s = s_x.reshape(b * self.shot, hh, ww, 3)
        sf2, sf3 = backbone(flat_s)
        sf2, sf3 = jax.lax.stop_gradient((sf2, sf3))
        mask_img = (s_y == 1).astype(self.dtype).reshape(b * self.shot, mh, mw, 1)
        mask3 = resize_bilinear_ac(mask_img, (h3, w3))
        sf4 = jax.lax.stop_gradient(backbone.layer4(sf3 * mask3))
        supp_feat = nn.relu(down_supp(jnp.concatenate([sf3, sf2], -1)))
        supp_pro = weighted_gap(supp_feat, mask3)         # (B*Sh, 1, 1, 256)
        supp_pro = supp_pro.reshape(b, self.shot, 256)

        # --- K-shot Gram reweighting (low_fea = layer2)
        que_gram = gram_matrix(qf2)                       # (B, C, C)
        norm_max = jnp.sqrt(jnp.asarray(que_gram.shape[1] * que_gram.shape[2],
                                        self.dtype))     # ||ones||_F
        sup_gram = gram_matrix(sf2.reshape(b, self.shot, *sf2.shape[1:])
                               .reshape(b * self.shot, *sf2.shape[1:]))
        diff = que_gram[:, None] - sup_gram.reshape(b, self.shot,
                                                    *sup_gram.shape[1:])
        est_val = jnp.linalg.norm(diff.reshape(b, self.shot, -1), axis=-1)
        est_val = est_val / norm_max                      # (B, Sh)
        if self.shot > 1:
            order = jnp.argsort(est_val, axis=1)
            val1 = jnp.take_along_axis(est_val, order, axis=1)
            inv = jnp.argsort(order, axis=1)
            wgt = val1[:, None, None, :]                  # (B, 1, 1, Sh)
            wgt = nn.Conv(self.kshot_trans_dim, (1, 1), dtype=self.dtype,
                          name="kshot_rw_0")(wgt)
            wgt = nn.relu(wgt)
            wgt = nn.Conv(self.shot, (1, 1), dtype=self.dtype,
                          name="kshot_rw_2")(wgt)[:, 0, 0]
            wgt = jnp.take_along_axis(wgt, inv, axis=1)
            weight_soft = jax.nn.softmax(wgt, axis=1)     # (B, Sh)
        else:
            weight_soft = jnp.ones_like(est_val)
        est_val = jnp.sum(weight_soft * est_val, axis=1)  # (B,)

        # --- prior similarity mask (reference: BAM.py:240-263)
        mask4 = resize_bilinear_ac(mask3, (sp, sp))
        s4m = (sf4 * mask4).reshape(b, self.shot, sp * sp, -1)
        q4 = qf4.reshape(b, sp * sp, -1)
        qn = jnp.linalg.norm(q4, axis=-1)[:, None, :]     # (B, 1, HWq)
        sn = jnp.linalg.norm(s4m, axis=-1)                # (B, Sh, HWs)
        sim = jnp.einsum("bsmc,bnc->bsmn", s4m, q4)
        sim = sim / (sn[..., None] * qn[:, :, None, :] + _EPS_COS)
        sim = jnp.max(sim, axis=2)                        # (B, Sh, HWq)
        smin = jnp.min(sim, axis=2, keepdims=True)
        smax = jnp.max(sim, axis=2, keepdims=True)
        sim = (sim - smin) / (smax - smin + _EPS_COS)
        corr = sim.reshape(b * self.shot, sp, sp, 1)
        corr = resize_bilinear_ac(corr, (h3, w3)).reshape(b, self.shot, h3, w3)
        corr_query_mask = jnp.einsum("bs,bshw->bhw", weight_soft, corr)[..., None]

        supp_pro = jnp.einsum("bs,bsc->bc", weight_soft, supp_pro)
        concat = jnp.broadcast_to(supp_pro[:, None, None, :],
                                  query_feat.shape)
        merge_feat = jnp.concatenate([query_feat, concat, corr_query_mask], -1)
        merge_feat = nn.relu(nn.Conv(256, (1, 1), use_bias=False,
                                     dtype=self.dtype,
                                     name="init_merge_0")(merge_feat))

        # --- base learner (frozen PSPNet head)
        ppm_out = PPM(dtype=self.dtype, name="ppm")(qf4)
        base = nn.Conv(512, (3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, name="base_cls_0")(ppm_out)
        base = nn.relu(_BN(512, name="base_cls_1")(base))
        base_out = nn.Conv(self.base_classes + 1, (1, 1), dtype=self.dtype,
                           name="base_cls_4")(base)

        # --- meta learner head
        meta = ASPPMeta(dtype=self.dtype, name="ASPP_meta")(merge_feat)
        meta = nn.relu(nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                               name="res1_meta_0")(meta))
        r = nn.relu(nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name="res2_meta_0")(meta))
        r = nn.relu(nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name="res2_meta_2")(r))
        meta = r + meta
        mo = nn.relu(nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                             dtype=self.dtype, name="cls_meta_0")(meta))
        meta_out = nn.Conv(2, (1, 1), dtype=self.dtype, name="cls_meta_3")(mo)

        # --- classifier ensemble (reference: BAM.py:277-299)
        meta_soft = jax.nn.softmax(meta_out, axis=-1)
        base_soft = jax.nn.softmax(base_out, axis=-1)
        meta_bg, meta_fg = meta_soft[..., 0:1], meta_soft[..., 1:2]
        base_map = jnp.sum(base_soft[..., 1:], axis=-1, keepdims=True)
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
        return final.transpose(0, 3, 1, 2)                # (B, 2, H, W)


class BAMMultiClass(nn.Module):
    """LAM-batch adapter (reference: bam/__init__.py:40-72): per class,
    the flagged supports are selected (repeat-last padding up to ``shot``)
    and the binary BAM outputs merge BinaryLam-style."""

    shot: int = 1
    base_classes: int = 60
    image_size: int = 473
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        model = BAM(shot=self.shot, base_classes=self.base_classes,
                    resnet_layers=self.resnet_layers, dtype=self.dtype,
                    name="bam")
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
            fl = flag[:, :, ci]                            # (B, M)
            # first `shot` flagged example indexes, repeat-last padded
            order = jnp.argsort(-fl + jnp.arange(m) * 1e-4, axis=1)
            count = jnp.maximum(fl.sum(axis=1).astype(jnp.int32), 1)
            pos = jnp.minimum(jnp.arange(self.shot)[None], count[:, None] - 1)
            sel = jnp.take_along_axis(order, pos, axis=1)  # (B, shot)
            s_x = jnp.take_along_axis(
                sup, sel[:, :, None, None, None], axis=1)
            s_y = jnp.take_along_axis(
                masks[:, :, ci], sel[:, :, None, None], axis=1)
            out = model(qry, s_x, s_y)                     # (B, 2, H, W)
            per_class.append(out)
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


def build_bam(dataset: str = "coco", shots: int = 1, val_fold_idx: int = 0,
              image_size: int = 473, **kwargs) -> BAMMultiClass:
    """(reference: bam/__init__.py:75-147 build_bam). Checkpoints load via
    utils.torch_import.convert_bam_state_dict."""
    base_classes = 15 if dataset.lower() == "pascal" else 60
    return BAMMultiClass(shot=shots, base_classes=base_classes,
                         image_size=image_size, **kwargs)
