"""DCAMA few-shot baseline (reference: label_anything/models/dcama/ —
Dense Cross-query-and-support Attention weighted MAsk aggregation, the
paper's flagship competitor).

Structure (Swin-B backbone): per-block feature maps at 4 scales; at every
block of stages 2-4 a single-head-averaged attention from query pixels to
support pixels aggregates the *support mask values* into a coarse mask
(reference: dcama/transformer.py:21-39 — value = the mask itself); the stack
of coarse masks passes through multi-scale conv blocks, cascaded additions
and mixer convs with skip connections to 1/4 scale, ending in 2-channel
(bg/fg) logits. ``DCAMAMultiClass`` runs it once per class and merges like
BinaryLam (reference: dcama/__init__.py:42-144).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict
from .swin import SwinTransformer

_NEG_INF = float("-inf")


def _sine_pe(n: int, d_model: int) -> np.ndarray:
    """(reference: dcama/transformer.py:41-60)."""
    pe = np.zeros((n, d_model), np.float32)
    position = np.arange(n)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class MaskAggregationAttention(nn.Module):
    """Query->support attention whose VALUES are the support mask
    (reference: dcama/transformer.py:9-39): returns per-query-pixel mask
    scores averaged over heads."""

    d_model: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array, mask_values: jax.Array,
                 key_valid: Optional[jax.Array] = None):
        """query: (B, Q, D); key: (B, K, D); mask_values: (B, K);
        key_valid: optional (B, K) validity — invalid keys get the
        reference's masked_fill(-1e9) treatment (dcama/transformer.py:70-71),
        used to drop padded shots in n-shot episodes."""
        b, qn, _ = query.shape
        hd = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, dtype=self.dtype, name="q")(query)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="k")(key)
        q = q.reshape(b, qn, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(hd)
        if key_valid is not None:
            attn = jnp.where(key_valid[:, None, None, :] > 0, attn, -1e9)
        p = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bk->bhq", p, mask_values.astype(p.dtype))
        return out.mean(axis=1)  # (B, Q)


def _conv_block(x, out_channels, kernel_sizes, dtype, name_prefix, group=4):
    """(reference: dcama/dcama.py:258-272)."""
    for i, (outch, ksz) in enumerate(zip(out_channels, kernel_sizes)):
        x = nn.Conv(outch, (ksz, ksz), padding="SAME", dtype=dtype,
                    name=f"{name_prefix}_conv{i}")(x)
        x = nn.GroupNorm(num_groups=group, dtype=dtype,
                         name=f"{name_prefix}_gn{i}")(x)
        x = nn.relu(x)
    return x


def _resize_ac(x, size):
    """bilinear align_corners=True resize on channels-last (B, H, W, C)
    (DCAMA uses align_corners=True throughout)."""
    b, h, w, c = x.shape
    nh, nw = size
    ys = jnp.linspace(0.0, h - 1.0, nh)
    xs = jnp.linspace(0.0, w - 1.0, nw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class DCAMAModel(nn.Module):
    """The mask-aggregation + mixer head (reference: dcama/dcama.py:142-256).

    ``stack_ids`` are cumulative block counts per stage (Swin-B:
    (2, 4, 22, 24)); features at indexes >= stack_ids[0] participate.
    """

    in_channels: Sequence[int] = (128, 256, 512, 1024)
    stack_ids: Sequence[int] = (2, 4, 22, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_feats: List[jax.Array],
                 support_feats: List[jax.Array], support_mask: jax.Array,
                 shot_flags: Optional[jax.Array] = None):
        """query_feats: per-block (B, H_s, W_s, C_s); support_feats: per-block
        (B, M, H_s, W_s, C_s) with a shot axis; support_mask (B, M, Hm, Wm)
        binary; shot_flags optional (B, M) validity for padded shots.

        n-shot semantics follow the reference (dcama/dcama.py:190-245):
        support pixels of all shots are CONCATENATED along the attention key
        axis (each shot re-tagged with the same positional encoding), and the
        skip-connection support features are max-pooled over shots —
        attention is nonlinear in its keys, so shot-averaging (round 1's
        shortcut) does not match. 1-shot reduces to the plain formulation.
        """
        s0, s1, s2, s3 = self.stack_ids
        blocks = [
            MaskAggregationAttention(d_model=self.in_channels[level + 1],
                                     dtype=self.dtype,
                                     name=f"dcama_block_{level}")
            for level in range(3)
        ]
        m = support_feats[0].shape[1]
        if shot_flags is None:
            shot_flags = jnp.ones(support_mask.shape[:2], jnp.float32)

        def _masked_shot_max(sf):
            """(B, M, h, w, ch) -> (B, h, w, ch): max over flagged shots
            (reference: dcama/dcama.py:236-243 stack(...).max(dim=0))."""
            fl = shot_flags[:, :, None, None, None] > 0
            mx = jnp.max(jnp.where(fl, sf, _NEG_INF), axis=1)
            return jnp.where(jnp.isfinite(mx), mx, 0.0)

        coarse: List[jax.Array] = []
        for idx in range(s0, s3):
            qf = query_feats[idx]
            sf = support_feats[idx]
            b, ha, wa, ch = qf.shape
            # per-shot mask resize, then concat shots along the key axis
            mask = _resize_ac(
                support_mask.reshape(b * m, *support_mask.shape[2:])[..., None]
                .astype(jnp.float32), (ha, wa),
            )[..., 0].reshape(b, m * ha * wa)
            level = 0 if idx < s1 else (1 if idx < s2 else 2)
            pe = jnp.asarray(_sine_pe(ha * wa, self.in_channels[level + 1]))
            keys = sf.reshape(b, m, ha * wa, ch) + pe[None, None]
            key_valid = jnp.repeat(shot_flags, ha * wa, axis=1)  # (B, M*hw)
            out = blocks[level](qf.reshape(b, -1, ch) + pe[None],
                                keys.reshape(b, m * ha * wa, ch), mask,
                                key_valid)
            coarse.append(out.reshape(b, ha, wa, 1))

        outch1, outch2, outch3 = 16, 64, 128
        cm1 = jnp.concatenate(coarse[s2 - s0:s3 - s0], axis=-1)  # 1/32
        cm2 = jnp.concatenate(coarse[s1 - s0:s2 - s0], axis=-1)  # 1/16
        cm3 = jnp.concatenate(coarse[0:s1 - s0], axis=-1)        # 1/8
        cm1 = _conv_block(cm1, (outch1, outch2, outch3), (3, 3, 3),
                          self.dtype, "conv1")
        cm2 = _conv_block(cm2, (outch1, outch2, outch3), (5, 3, 3),
                          self.dtype, "conv2")
        cm3 = _conv_block(cm3, (outch1, outch2, outch3), (5, 5, 3),
                          self.dtype, "conv3")

        mix = _resize_ac(cm1, cm2.shape[1:3]) + cm2
        mix = _conv_block(mix, (outch3, outch3, outch3), (3, 3, 3),
                          self.dtype, "conv4")
        mix = _resize_ac(mix, cm3.shape[1:3]) + cm3
        mix = _conv_block(mix, (outch3, outch3, outch3), (3, 3, 3),
                          self.dtype, "conv5")

        # skip connections at 1/8 and 1/4 (support side max-pooled over shots)
        mix = jnp.concatenate(
            [mix, query_feats[s1 - 1], _masked_shot_max(support_feats[s1 - 1])],
            axis=-1)
        mix = _resize_ac(mix, (mix.shape[1] * 2, mix.shape[2] * 2))
        mix = jnp.concatenate(
            [mix, query_feats[s0 - 1], _masked_shot_max(support_feats[s0 - 1])],
            axis=-1)

        out = nn.relu(nn.Conv(outch3, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mixer1_0")(mix))
        out = nn.relu(nn.Conv(outch2, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mixer1_1")(out))
        out = _resize_ac(out, (out.shape[1] * 2, out.shape[2] * 2))
        out = nn.relu(nn.Conv(outch2, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mixer2_0")(out))
        out = nn.relu(nn.Conv(outch1, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mixer2_1")(out))
        out = _resize_ac(out, (out.shape[1] * 2, out.shape[2] * 2))
        out = nn.relu(nn.Conv(outch1, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mixer3_0")(out))
        logits = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                         name="mixer3_1")(out)
        return logits  # (B, H/1, W/1, 2) at input/1 scale after 3 upsamples


class DCAMAMultiClass(nn.Module):
    """LAM-batch multi-class adapter (reference: dcama/__init__.py:42-144).

    Runs the binary DCAMA head once per foreground class (support mask =
    that class's mask prompt, n-shot averaged over support images) and merges
    per-class logits with the BinaryLam background-gather rule.
    """

    image_size: int = 384
    backbone: Optional[nn.Module] = None
    stack_ids: Sequence[int] = (2, 4, 22, 24)
    in_channels: Sequence[int] = (128, 256, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True) -> dict:
        backbone = self.backbone or SwinTransformer(
            img_size=self.image_size, dtype=self.dtype, name="feature_extractor")
        head = DCAMAModel(in_channels=self.in_channels,
                          stack_ids=self.stack_ids, dtype=self.dtype,
                          name="model")
        images = batch[BatchKeys.IMAGES]  # (B, N, H, W, 3)
        b, n = images.shape[:2]
        feats = backbone(images.reshape((b * n,) + images.shape[2:]))
        feats = [jax.lax.stop_gradient(f) for f in feats]  # frozen backbone
        query_feats = [f.reshape((b, n) + f.shape[1:])[:, 0] for f in feats]
        support_feats_all = [f.reshape((b, n) + f.shape[1:])[:, 1:]
                             for f in feats]

        prompt_masks = batch[BatchKeys.PROMPT_MASKS]  # (B, M, C, Hm, Wm)
        flag = batch[BatchKeys.FLAG_EXAMPLES].astype(jnp.float32)  # (B, M, C)
        if prompt_masks.shape[1] == n:
            # pre-substitutor full batch: slot 0 is the query's own annotation
            prompt_masks = prompt_masks[:, 1:]
            flag = flag[:, 1:]
        m, c = prompt_masks.shape[1:3]
        assert m == n - 1, (
            f"prompt masks ({m} shots) misaligned with images ({n - 1} supports)")

        per_class = []
        for ci in range(1, c):
            # n-shot: all shots ride the attention key axis; padded shots are
            # dropped via the per-class flags (reference gathers flagged
            # examples before predict_mask_nshot, dcama/__init__.py:88-97)
            sfeats = [sf[:, :m] for sf in support_feats_all]
            logits = head(query_feats, sfeats, prompt_masks[:, :, ci],
                          flag[:, :, ci])  # (B, h, w, 2)
            per_class.append(logits.transpose(0, 3, 1, 2))
        logits = jnp.stack(per_class, axis=1)  # (B, C-1, 2, h, w)
        fg = logits[:, :, 1]
        bgs = logits[:, :, 0]
        pos = jnp.argmax(fg, axis=1, keepdims=True)
        bg = jnp.take_along_axis(bgs, pos, axis=1)
        seg = jnp.concatenate([bg, fg], axis=1)
        seg = resize_bilinear(seg, (self.image_size, self.image_size))
        if BatchKeys.FLAG_GTS in batch:
            seg = jnp.where(batch[BatchKeys.FLAG_GTS][:, :, None, None],
                            seg, _NEG_INF)
        return {ResultDict.LOGITS: seg}


def build_dcama(backbone: str = "swin", image_size: int = 384, **kwargs):
    """(reference: dcama/__init__.py:12-40). Checkpoint loading goes through
    utils.torch_import.convert_dcama_state_dict."""
    if backbone != "swin":
        raise NotImplementedError("only the Swin-B DCAMA backbone is ported")
    return DCAMAMultiClass(image_size=image_size)
