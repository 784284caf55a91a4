"""PPNet few-shot baseline — Part-aware Prototype Network (ECCV 2020).

TPU-native re-design of the reference's vendored torch implementation
(reference: label_anything/models/ppnet/ — FewShotSegPartResnetSem.py,
ResNetBackbone.py, kmeans.py, __init__.py). Eval path only (the training-time
ASPP semantic head and prototype-alignment loss are not part of the
``parameters/validation/Pascal/ppnet.yaml`` protocol).

Key reformulations for XLA:

* ``masked_kmeans`` — the reference gathers the variable-length set of masked
  feature vectors (``fts[mask > 0]``, kmeans.py:37-67) and loops clusters in
  Python. Here k-means runs over the FULL fixed-size pixel grid with a 0/1
  weight per point: assignments are masked argmins and center updates are
  weighted means, reproducing the gathered computation exactly (invalid
  points carry zero weight everywhere).
* ``masked_mean_upsampled`` — the reference materializes the 2048-channel
  feature map bilinearly upsampled to full image resolution only to take a
  masked mean (getFeaturesArray, FewShotSegPartResnetSem.py:152-178; ~1.4 GB
  at 417px). Bilinear interpolation is linear, so the masked mean equals a
  feature-resolution weighted mean with the ADJOINT-downsampled mask — no
  quadratic buffer ever exists.
* The reference's ``<= 10 masked pixels`` fallback (which switches the
  k-means point set from the 2x-feature grid to the full-resolution grid)
  is intentionally NOT reproduced: prototypes always come from the 2x grid
  (tiny-object episodes deviate; everything else is exact). The empty-mask
  zero-prototype fallback IS reproduced.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_bilinear_ac, resize_nearest_torch
from ..typing import BatchKeys, ResultDict

_NEG_INF = float("-inf")
GLOBAL_CONST = 0.5  # reference: FewShotSegPartResnetSem.py:38


# --------------------------------------------------------------------- #
# dilated ResNet-50 backbone (reference: ppnet/ResNetBackbone.py)
# --------------------------------------------------------------------- #

class _BN(nn.Module):
    """Eval-mode BatchNorm over running statistics (torch semantics)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features)).value
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv + bias


class Bottleneck(nn.Module):
    """(reference: ResNetBackbone.py:66-108). ``last_relu=False`` on the
    final block of layer4 leaves the few-shot features pre-activation."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    last_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width, out_ch = self.planes, self.planes * 4
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_BN(width, name="bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_BN(width, name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _BN(out_ch, name="bn3")(y)
        if self.has_downsample:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = _BN(out_ch, name="downsample_bn")(x)
        y = y + x
        return nn.relu(y) if self.last_relu else y


class ResNetSem(nn.Module):
    """Output-stride-8 dilated ResNet (reference: ResNetBackbone.py:203-268
    ResNetSemShare4): layers 3/4 replace stride with dilation 2/4; the last
    layer4 block skips its final ReLU. Returns the pre-activation few-shot
    feature map (B, H/8, W/8, 2048)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    out_layer: str = "layer4"        # stop early for heads that use layer3
    quirk_last_relu: bool = True     # PPNet's no-ReLU-on-last-layer4-block;
    #                                  False = standard torchvision resnet
    dilated: bool = True             # False = standard strides (8/16/32)
    multi_out: Optional[Sequence[str]] = None  # e.g. ("layer2", "layer3",
    #                                  "layer4") -> dict of stage maps
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BN(64, name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        # (planes, stride, dilations (first, rest))
        if self.dilated:
            stages = [
                ("layer1", 64, 1, (1, 1)),
                ("layer2", 128, 2, (1, 1)),
                ("layer3", 256, 1, (1, 2)),
                ("layer4", 512, 1, (2, 4)),
            ]
        else:  # torchvision standard strides
            stages = [
                ("layer1", 64, 1, (1, 1)),
                ("layer2", 128, 2, (1, 1)),
                ("layer3", 256, 2, (1, 1)),
                ("layer4", 512, 2, (1, 1)),
            ]
        outs = {}
        for si, (name, planes, stride, (dil0, dil)) in enumerate(stages):
            n_blocks = self.layers[si]
            for bi in range(n_blocks):
                # the reference's lastRelu flag only reaches blocks b_id >= 1
                # (ResNetBackbone.py:288-297), so a single-block layer4
                # keeps its ReLU
                last = (self.quirk_last_relu and name == "layer4"
                        and bi == n_blocks - 1 and bi > 0)
                x = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dil0 if bi == 0 else dil,
                    has_downsample=bi == 0,
                    last_relu=not last,
                    dtype=self.dtype,
                    name=f"{name}_{bi}",
                )(x)
            if self.multi_out is not None:
                outs[name] = x
            elif name == self.out_layer:
                return x
        if self.multi_out is not None:
            return {name: outs[name] for name in self.multi_out}
        return x


# --------------------------------------------------------------------- #
# masked k-means & prototype extraction
# --------------------------------------------------------------------- #

def kmeans_first_valid_init(points: jax.Array, weights: jax.Array,
                            k: int) -> jax.Array:
    """Deterministic init: the first ``k`` valid points in order (parity
    tests fake the reference's np.random InitFunc the same way)."""
    n = points.shape[0]
    score = jnp.where(weights > 0, -jnp.arange(n, dtype=jnp.float32), _NEG_INF)
    _, idx = jax.lax.top_k(score, k)
    return points[idx]


def masked_kmeans(points: jax.Array, weights: jax.Array, init: jax.Array,
                  iters: int = 10) -> jax.Array:
    """Weighted-point k-means matching the reference's gathered semantics
    (reference: ppnet/kmeans.py:37-67): ``iters`` assignment/update rounds
    where empty clusters KEEP their center, then a final re-assignment where
    empty clusters get a ZERO center.

    points (N, C); weights (N,) in {0, 1}; init (k, C)."""
    k = init.shape[0]

    def assign(centers):
        d2 = jnp.sum((points[:, None, :] - centers[None]) ** 2, axis=-1)
        cl = jnp.argmin(d2, axis=1)
        member = (cl[:, None] == jnp.arange(k)[None]) * weights[:, None]
        sums = jnp.einsum("nk,nc->kc", member, points)
        counts = member.sum(axis=0)
        return sums, counts

    def body(_, centers):
        sums, counts = assign(centers)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters - 1, body, init)
    sums, counts = assign(centers)
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new, 0.0)  # empty -> zero center


def _interp_matrix_ac(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic 1-D bilinear align_corners=True matrix (n_out, n_in)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w = pos - lo
    m[np.arange(n_out), lo] += 1 - w
    m[np.arange(n_out), hi] += w
    return m


def masked_mean_upsampled(fts: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean of ``bilinear_ac_upsample(fts, mask.shape)`` computed at
    feature resolution via the interpolation adjoint.

    fts (B, h1, w1, C); mask (B, H, W). Returns (B, C) — bit-equal (up to fp
    reassociation) to the reference's sum(up(fts) * mask) / (sum(mask)+1e-5)
    without materializing the upsampled features."""
    b, h1, w1, c = fts.shape
    hh, ww = mask.shape[1:]
    a_h = jnp.asarray(_interp_matrix_ac(h1, hh))   # (H, h1)
    a_w = jnp.asarray(_interp_matrix_ac(w1, ww))   # (W, w1)
    down = jnp.einsum("bHW,Hh,Ww->bhw", mask, a_h, a_w)
    num = jnp.einsum("bhwc,bhw->bc", fts, down)
    return num / (jnp.sum(mask, axis=(1, 2))[:, None] + 1e-5)


def cal_dist(fts: jax.Array, prototypes: jax.Array, scaler: float = 20.0,
             proto_valid: Optional[jax.Array] = None) -> jax.Array:
    """Max-over-centers cosine similarity (reference:
    FewShotSegPartResnetSem.py:115-131). fts (N, h, w, C) channels-last;
    prototypes (k, C). Returns (N, h, w)."""
    eps = 1e-8
    fn = fts / jnp.maximum(jnp.linalg.norm(fts, axis=-1, keepdims=True), eps)
    pn = prototypes / jnp.maximum(
        jnp.linalg.norm(prototypes, axis=-1, keepdims=True), eps)
    sim = jnp.einsum("nhwc,kc->nkhw", fn, pn)
    if proto_valid is not None:
        sim = jnp.where(proto_valid[None, :, None, None] > 0, sim, _NEG_INF)
    return jnp.max(sim, axis=1) * scaler


# --------------------------------------------------------------------- #
# the few-shot segmenter
# --------------------------------------------------------------------- #

class PPNet(nn.Module):
    """Eval-path PPNet (reference: FewShotSegPartResnetSem.py:24-113).

    ``__call__(supp_imgs, fore_mask, back_mask, qry_img)`` with
    supp_imgs (B, Wa, Sh, H, W, 3), masks (B, Wa, Sh, H, W), query
    (B, H, W, 3); returns logits (B, 1+Wa, H, W)."""

    num_centers: int = 5      # cfg['center']
    kmeans_iters: int = 10
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, supp_imgs: jax.Array, fore_mask: jax.Array,
                 back_mask: jax.Array, qry_img: jax.Array) -> jax.Array:
        b, wa, sh, hh, ww, _ = supp_imgs.shape
        encoder = ResNetSem(layers=self.resnet_layers, dtype=self.dtype,
                            name="encoder")
        imgs = jnp.concatenate(
            [supp_imgs.reshape(b * wa * sh, hh, ww, 3),
             qry_img.reshape(b, hh, ww, 3)], axis=0)
        fts = encoder(imgs)
        h1, w1, c = fts.shape[1:]
        supp_fts = fts[: b * wa * sh].reshape(b, wa, sh, h1, w1, c)
        qry_fts = fts[b * wa * sh:]                       # (B, h1, w1, C)

        def episode(sup_f, fg_m, bg_m, qry_f):
            """One batch element: sup_f (Wa, Sh, h1, w1, C); masks
            (Wa, Sh, H, W); qry_f (h1, w1, C) -> (1+Wa, H, W)."""
            # global prototypes: masked mean of fts upsampled to mask res
            flat_f = sup_f.reshape(wa * sh, h1, w1, c)
            fg_glo = masked_mean_upsampled(flat_f, fg_m.reshape(wa * sh, hh, ww))
            bg_glo = masked_mean_upsampled(flat_f, bg_m.reshape(wa * sh, hh, ww))
            fg_glo = fg_glo.reshape(wa, sh, c).mean(axis=1)   # (Wa, C)
            bg_glo = bg_glo.reshape(wa, sh, c).mean(axis=1).mean(axis=0)  # (C,)

            # fg local features on the 2x grid (reference upscale=2,
            # getFeaturesArray); bg stays on the raw feature grid (upscale=1,
            # FewShotSegPartResnetSem.py:91-92)
            fts_s4 = resize_bilinear_ac(flat_f, (h1 * 2, w1 * 2))
            m_fg_s4 = resize_nearest_torch(
                fg_m.reshape(wa * sh, hh, ww, 1), (h1 * 2, w1 * 2),
                spatial_axes=(1, 2))[..., 0]
            m_bg_s1 = resize_nearest_torch(
                bg_m.reshape(wa * sh, hh, ww, 1), (h1, w1),
                spatial_axes=(1, 2))[..., 0]
            n4 = 4 * h1 * w1
            n1 = h1 * w1
            pts = fts_s4.reshape(wa, sh, n4, c)
            wf = m_fg_s4.reshape(wa, sh, n4)
            wb = m_bg_s1.reshape(wa, sh, n1)

            # fg: k-means per way over all shots' points concatenated
            def fg_way(p, w_):
                p = p.reshape(sh * n4, c)
                w_ = w_.reshape(sh * n4)
                init = kmeans_first_valid_init(p, w_, self.num_centers)
                cls_c = masked_kmeans(p, w_, init, self.kmeans_iters)
                return cls_c

            fg_cls = jax.vmap(fg_way)(pts, wf)               # (Wa, k, C)
            # bg: one k-means over every way and shot
            p_all = flat_f.reshape(wa * sh * n1, c)
            w_all = wb.reshape(wa * sh * n1)
            bg_cls = masked_kmeans(
                p_all, w_all,
                kmeans_first_valid_init(p_all, w_all, self.num_centers),
                self.kmeans_iters)                           # (k, C)

            fg_protos = fg_cls + GLOBAL_CONST * fg_glo[:, None, :]
            bg_protos = bg_cls + GLOBAL_CONST * bg_glo[None, :]

            qf = qry_f[None]                                 # (1, h1, w1, C)
            dists = [cal_dist(qf, bg_protos)[0]]
            for way in range(wa):
                dists.append(cal_dist(qf, fg_protos[way])[0])
            return jnp.stack(dists, axis=0)                  # (1+Wa, h1, w1)

        pred = jax.vmap(episode)(supp_fts, fore_mask, back_mask, qry_fts)
        return resize_bilinear_ac(
            pred.transpose(0, 2, 3, 1), (hh, ww)).transpose(0, 3, 1, 2)


class PPNetMultiClass(nn.Module):
    """LAM-batch adapter (reference: ppnet/__init__.py:18-122): the prompt
    masks' argmax labels each support pixel; per way, foreground = that
    class, background = no class; the (1+Wa)-way logits come out directly."""

    image_size: int = 417
    num_centers: int = 5
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        model = PPNet(num_centers=self.num_centers,
                      resnet_layers=self.resnet_layers, dtype=self.dtype,
                      name="ppnet")
        images = batch[BatchKeys.IMAGES]
        b, n_imgs, hh, ww, _ = images.shape
        assert b == 1, "PPNet supports batch size 1 (reference assertion)"
        qry, sup = images[:, 0], images[:, 1:]

        masks = batch[BatchKeys.PROMPT_MASKS]
        if masks.shape[1] == n_imgs:
            masks = masks[:, 1:]
        m, c = masks.shape[1:3]
        c_fg = c - 1
        k = m // c_fg
        labels = jnp.argmax(masks, axis=2)                 # (B, M, hm, wm)
        labels = resize_nearest_torch(labels[..., None], (hh, ww),
                                      spatial_axes=(2, 3))[..., 0]
        # supports are way-major: (k c) -> ways x shots
        labels = labels.reshape(b, k, c_fg, hh, ww).transpose(0, 2, 1, 3, 4)
        sup = sup.reshape(b, k, c_fg, hh, ww, 3).transpose(0, 2, 1, 3, 4, 5)

        ways = jnp.arange(1, c_fg + 1)[None, :, None, None, None]
        fore = (labels == ways).astype(jnp.float32)
        back = (labels == 0).astype(jnp.float32)

        logits = model(sup, fore, back, qry)               # (B, 1+Wa, H, W)
        if BatchKeys.FLAG_GTS in batch:
            logits = jnp.where(batch[BatchKeys.FLAG_GTS][:, :, None, None],
                               logits, _NEG_INF)
        return {ResultDict.LOGITS: logits}


def build_ppnet(fold: int = 0, image_size: int = 417, **kwargs) -> PPNetMultiClass:
    """(reference: ppnet/__init__.py:125-143). Checkpoints load through
    utils.torch_import.convert_ppnet_state_dict."""
    return PPNetMultiClass(image_size=image_size, **kwargs)
