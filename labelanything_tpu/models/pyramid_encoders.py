"""Feature-pyramid backbone encoders for MultiLevelLam
(reference: label_anything/models/build_encoder.py:118-152 — ResNet-50 and
Swin-B via transformers ``AutoBackbone`` with out_features stage2..4).

TPU-native equivalents: the PPNet-parity ResNet (standard strides, eval-mode
BatchNorm) and the DCAMA-parity Swin, wrapped to emit AutoBackbone-style
``{"stageN": (B, h, w, C)}`` channels-last stage maps. Both accept torch
checkpoints through utils.torch_import (torchvision resnet50 state dicts and
official Swin checkpoints respectively)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .ppnet import ResNetSem
from .swin import SwinTransformer

# AutoBackbone stage naming: stage1 = layer1 (stride 4) ... stage4 = layer4
_STAGE_TO_LAYER = {"stage1": "layer1", "stage2": "layer2",
                   "stage3": "layer3", "stage4": "layer4"}

# per-stage channel widths, for sizing MultiLevelLam
RESNET50_STAGE_DIMS = {"stage1": 256, "stage2": 512,
                       "stage3": 1024, "stage4": 2048}
SWIN_B_STAGE_DIMS = {"stage1": 128, "stage2": 256,
                     "stage3": 512, "stage4": 1024}


class ResNet50Backbone(nn.Module):
    """Standard-stride ResNet-50 pyramid extractor
    (reference: build_encoder.py:118-125 AutoBackbone microsoft/resnet-50)."""

    out_features: Sequence[str] = ("stage2", "stage3", "stage4")
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 output_hidden_states: bool = True) -> Dict[str, jax.Array]:
        wanted = tuple(_STAGE_TO_LAYER[s] for s in self.out_features)
        feats = ResNetSem(layers=self.layers, dilated=False,
                          quirk_last_relu=False, multi_out=wanted,
                          dtype=self.dtype, name="resnet")(x)
        return {stage: feats[_STAGE_TO_LAYER[stage]]
                for stage in self.out_features}


class SwinBackbone(nn.Module):
    """Swin-B pyramid extractor (reference: build_encoder.py:128-135
    AutoBackbone microsoft/swin-base-patch4-window12-384): the last block's
    map of each requested stage, per-stage LayerNormed like the HF backbone's
    hidden_states_norms."""

    out_features: Sequence[str] = ("stage2", "stage3", "stage4")
    img_size: int = 384
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 output_hidden_states: bool = True) -> Dict[str, jax.Array]:
        feats = SwinTransformer(
            img_size=self.img_size, embed_dim=self.embed_dim,
            depths=self.depths, num_heads=self.num_heads,
            window_size=self.window_size, dtype=self.dtype,
            name="swin")(x)
        stage_last = np.cumsum(self.depths) - 1   # last block per stage
        out = {}
        for stage_name in self.out_features:
            idx = int(stage_name[len("stage"):]) - 1
            fm = feats[stage_last[idx]]
            fm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"norm_{stage_name}")(fm)
            out[stage_name] = fm
        return out


def build_resnet50(out_features=("stage2", "stage3", "stage4"), **kwargs):
    """(reference: build_encoder.py:118-125)."""
    return ResNet50Backbone(out_features=tuple(out_features), **kwargs)


def build_swin_b(out_features=("stage2", "stage3", "stage4"),
                 image_size: int = 384, **kwargs):
    """(reference: build_encoder.py:128-135)."""
    return SwinBackbone(out_features=tuple(out_features),
                        img_size=image_size, **kwargs)
