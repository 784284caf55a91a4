"""DENet few-shot baseline — Dynamic Extension Nets (ACM MM 2020).

TPU-native re-design of the reference's vendored torch implementation
(reference: label_anything/models/denet/ — head/denet.py, common.py,
backbone/backbones.py, __init__.py). Eval path (the 'training'-mode weight
extension used by the reference's DeNet wrapper, not the stateful 'deploy'
mode).

Structure: a frozen dilated torchvision ResNet-50 (layer3 features, stride
8) feeds a dilated embedding conv + DeepLab head (BN-free ASPP with global
pooling branch); support prototypes (GAM channel gate + masked average
pooling + 1x1 projection) OVERWRITE the corresponding rows of a learned
per-class weight bank; classification is a pixel-feature x class-weight
matmul, reduced to per-way binary logits as [max over other classes, own
class] (reference: utils.py:313-338 get_binary_logits).

The reference's weight-bank row replacement (`weight[l] = p` in a Python
loop, common.py:334-349) becomes a vmapped scatter; the flags-driven
example-to-way grouping in the wrapper (host loop over torch.where,
__init__.py:93-99) is replaced by the validation sampler's static way-major
episode layout (shot-major groups of C-1 classes), matching the reference
PPNet/PANet wrappers' "(k c)" convention.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_nearest_torch
from ..typing import BatchKeys, ResultDict
from .ppnet import ResNetSem, _BN

_NEG_INF = float("-inf")


class RegASPP(nn.Module):
    """BN-free ASPP with dropout (reference: denet/common.py:61-91).
    Module names match the torch Sequential indexes for weight import."""

    out_channels: int = 256
    rates: Tuple[int, int, int] = (6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = [nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="convs_0")(x))]
        for i, rate in enumerate(self.rates):
            res.append(nn.relu(nn.Conv(
                self.out_channels, (3, 3), kernel_dilation=(rate, rate),
                padding=[(rate, rate)] * 2, dtype=self.dtype,
                name=f"convs_{i + 1}")(x)))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                                 name="convs_4")(pooled))
        res.append(jnp.broadcast_to(pooled, res[0].shape))
        out = jnp.concatenate(res, axis=-1)
        return nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="project")(out))


class DeepLabHead(nn.Module):
    """(reference: denet/common.py:131-147)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, relu: bool = True) -> jax.Array:
        x = RegASPP(dtype=self.dtype, name="aspp")(x)
        x = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        if relu:
            x = nn.relu(_BN(256, name="bn")(x))
        return x


class GAM(nn.Module):
    """Guided Attention Module channel gate (reference: common.py:216-249)."""

    depth: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fs: jax.Array, ys: jax.Array) -> jax.Array:
        """fs (N, h, w, C); ys (N, H, W) binary."""
        h, w = fs.shape[1:3]
        mask = resize_nearest_torch(ys[..., None], (h, w),
                                    spatial_axes=(1, 2))
        att = jnp.mean(fs * mask, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.depth, (1, 1), dtype=self.dtype, name="gate_0")(att)
        g = nn.relu(g)
        g = nn.Conv(self.depth, (1, 1), dtype=self.dtype, name="gate_2")(g)
        return fs * nn.sigmoid(g)


class MaskedAveragePooling(nn.Module):
    """(reference: common.py:150-201): nearest mask resize, masked mean with
    eps on the denominator, then a 1x1 projection."""

    depth: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array, mask: jax.Array,
                 eps: float = 1e-3) -> jax.Array:
        h, w = emb.shape[1:3]
        m = resize_nearest_torch(mask[..., None], (h, w), spatial_axes=(1, 2))
        num = jnp.sum(m * emb, axis=(1, 2), keepdims=True)
        den = jnp.sum(m, axis=(1, 2), keepdims=True)
        proto = num / (den + eps)                      # (N, 1, 1, C)
        return nn.Conv(self.depth, (1, 1), dtype=self.dtype,
                       name="linear")(proto)


def get_binary_logits(logits_full: jax.Array, label: jax.Array) -> jax.Array:
    """[max over other class channels, own channel]
    (reference: denet/utils.py:313-338, base=True). logits_full
    (N, num_classes, h, w); label (N,). Returns (N, 2, h, w)."""
    n, k = logits_full.shape[:2]
    own = jnp.take_along_axis(
        logits_full, label[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    is_other = jnp.arange(k)[None, :] != label[:, None]
    others = jnp.where(is_other[:, :, None, None], logits_full, _NEG_INF)
    other = jnp.max(others, axis=1)
    return jnp.stack([other, own], axis=1)


class DENet(nn.Module):
    """(reference: denet/head/denet.py:8-96 + common.py WeightEstimator,
    'training'-mode extension)."""

    maximum_num_classes: int = 21
    depth: int = 256
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    backbone: Optional[nn.Module] = None  # test injection point
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s_imgs: jax.Array, s_masks: jax.Array,
                 q_img: jax.Array, label: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """s_imgs (B, Wa, Sh, H, W, 3); s_masks (B, Wa, Sh, H, W) binary;
        q_img (B, H, W, 3); label (B, Wa) int class-bank rows.
        Returns (logits_full (B, K, h, w), logits_binary (B*Wa, 2, h, w))."""
        b, wa, sh, hh, ww, _ = s_imgs.shape
        backbone = self.backbone or ResNetSem(
            layers=self.resnet_layers, out_layer="layer3",
            quirk_last_relu=False, dtype=self.dtype, name="backbone")
        head = DeepLabHead(dtype=self.dtype, name="deeplab_head")
        gam = GAM(self.depth, dtype=self.dtype, name="gam")
        map_pool = MaskedAveragePooling(self.depth, dtype=self.dtype,
                                        name="map")
        weight_bank = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.maximum_num_classes, self.depth),
        )

        embedding_conv = nn.Conv(self.depth, (3, 3), kernel_dilation=(2, 2),
                                 padding=[(2, 2), (2, 2)], dtype=self.dtype,
                                 name="embedding_0")

        def embed(imgs):
            f = jax.lax.stop_gradient(backbone(imgs))  # frozen backbone
            f = nn.relu(embedding_conv(f))
            return head(f, relu=True)

        fs = embed(s_imgs.reshape(b * wa * sh, hh, ww, 3))
        fq = embed(q_img)
        h, w = fq.shape[1:3]

        # prototypes: GAM gate -> masked average pool -> projection
        ys = s_masks.reshape(b * wa * sh, hh, ww)
        protos = map_pool(gam(fs, ys), ys)[:, 0, 0]      # (B*Wa*Sh, C)
        protos = protos.reshape(b, wa, sh, self.depth).mean(axis=2)  # (B,Wa,C)

        # per-episode weight-bank extension (reference: common.py:334-349)
        bank = jnp.asarray(weight_bank)

        def extend(lbl, p):
            return bank.at[lbl].set(p)

        weights = jax.vmap(extend)(label.astype(jnp.int32), protos)

        logits_full = jnp.einsum("bhwc,bkc->bkhw", fq, weights)
        binary = []
        for way in range(wa):
            binary.append(get_binary_logits(logits_full, label[:, way]))
        logits_binary = jnp.stack(binary, axis=1).reshape(b * wa, 2, h, w)
        return logits_full, logits_binary


class DENetMultiClass(nn.Module):
    """LAM-batch adapter (reference: denet/__init__.py:39-117) with the
    BinaryLam background-gather merge. Supports are way-major "(k c)";
    class-bank rows come from INTENDED_CLASSES when present (global ids),
    else episode-local ids 1..C-1."""

    image_size: int = 417
    maximum_num_classes: int = 21
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        model = DENet(maximum_num_classes=self.maximum_num_classes,
                      resnet_layers=self.resnet_layers, dtype=self.dtype,
                      name="denet")
        images = batch[BatchKeys.IMAGES]
        b, n_imgs, hh, ww, _ = images.shape
        qry, sup = images[:, 0], images[:, 1:]

        masks = batch[BatchKeys.PROMPT_MASKS]
        if masks.shape[1] == n_imgs:
            masks = masks[:, 1:]
        m, c = masks.shape[1:3]
        c_fg = c - 1
        k = m // c_fg

        # way-major regrouping: example e = ki * c_fg + ci
        sup = sup.reshape(b, k, c_fg, hh, ww, 3).transpose(0, 2, 1, 3, 4, 5)
        ys = resize_nearest_torch(
            masks.reshape(b * m * c, *masks.shape[3:], 1), (hh, ww),
            spatial_axes=(1, 2),
        ).reshape(b, k, c_fg, c, hh, ww).transpose(0, 2, 1, 3, 4, 5)
        # each way-example's mask for its own class channel
        ways = jnp.arange(1, c_fg + 1)
        ys = jnp.stack([ys[:, ci - 1, :, ci] for ci in ways], axis=1)

        label = batch.get(BatchKeys.INTENDED_CLASSES)
        if label is None:
            label = jnp.broadcast_to(ways[None], (b, c_fg))
        else:
            label = jnp.asarray(label).reshape(b, -1)[:, :c_fg]

        _, binary = model(sup, ys, qry, label)
        binary = binary.reshape(b, c_fg, 2, *binary.shape[2:])
        fg = binary[:, :, 1]
        bgs = binary[:, :, 0]
        pos = jnp.argmax(fg, axis=1, keepdims=True)
        bg = jnp.take_along_axis(bgs, pos, axis=1)
        seg = jnp.concatenate([bg, fg], axis=1)
        seg = resize_bilinear(seg, (self.image_size, self.image_size))
        if BatchKeys.FLAG_GTS in batch:
            seg = jnp.where(batch[BatchKeys.FLAG_GTS][:, :, None, None],
                            seg, _NEG_INF)
        return {ResultDict.LOGITS: seg}


def build_denet(maximum_num_classes: int = 21, image_size: int = 417,
                **kwargs) -> DENetMultiClass:
    """(reference: denet/__init__.py:119-122). Checkpoints load through
    utils.torch_import.convert_denet_state_dict."""
    return DENetMultiClass(maximum_num_classes=maximum_num_classes,
                           image_size=image_size, **kwargs)
