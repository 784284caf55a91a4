"""Pyramid backbone encoders (reference: build_encoder.py:118-152)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests._reference import load

from labelanything_tpu.models.pyramid_encoders import (ResNet50Backbone,
                                                       SwinBackbone)
from labelanything_tpu.utils.torch_import import (convert_ppnet_state_dict,
                                                  merge_into_variables)

IMG = 64
LAYERS = (1, 1, 2, 1)


def test_resnet50_backbone_stage_parity():
    """Standard-stride stages vs the reference's (torchvision-fork) ResNet.
    The fork omits the last layer4 ReLU (lastRelu=False); torchvision /
    AutoBackbone semantics keep it, so stage4 compares against
    relu(reference)."""
    ref_rn = load("label_anything.models.ppnet.ResNetBackbone")
    torch.manual_seed(29)
    ref = ref_rn.ResNet(ref_rn.Bottleneck, list(LAYERS),
                        replace_stride_with_dilation=[False, False, False]
                        ).eval()

    x = np.random.default_rng(30).standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        h = ref.relu(ref.bn1(ref.conv1(torch.from_numpy(x))))
        h = ref.maxpool(h)
        f1 = ref.layer1(h)
        f2 = ref.layer2(f1)
        f3 = ref.layer3(f2)
        f4 = ref.layer4(f3)

    ours = ResNet50Backbone(layers=LAYERS)
    example = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.key(0), example)
    sd = {f"resnet.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_ppnet_state_dict(sd)
    variables = merge_into_variables(variables, converted, strict=False)
    out = ours.apply(variables, example)

    assert set(out) == {"stage2", "stage3", "stage4"}
    np.testing.assert_allclose(np.asarray(out["stage2"]).transpose(0, 3, 1, 2),
                               f2.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["stage3"]).transpose(0, 3, 1, 2),
                               f3.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["stage4"]).transpose(0, 3, 1, 2),
                               torch.relu(f4).numpy(), rtol=2e-3, atol=2e-4)


def test_swin_backbone_stages():
    model = SwinBackbone(img_size=IMG, embed_dim=16, depths=(1, 1, 2, 1),
                         num_heads=(1, 2, 2, 4), window_size=4)
    x = jnp.asarray(np.random.default_rng(31)
                    .standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    # patch 4: stage2 at /8 (c=32), stage3 at /16 (c=64), stage4 at /32 (128)
    assert out["stage2"].shape == (2, IMG // 8, IMG // 8, 32)
    assert out["stage3"].shape == (2, IMG // 16, IMG // 16, 64)
    assert out["stage4"].shape == (2, IMG // 32, IMG // 32, 128)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_multilevel_lam_with_pyramid_encoder():
    """generate_feature_pyramids' native backbone feeds MultiLevelLam
    end-to-end from raw images (VERDICT round-1 item 6)."""
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_multilevel_lam
    from labelanything_tpu.typing import BatchKeys, ResultDict

    model = build_multilevel_lam(
        image_size=IMG,
        encoder={"name": "resnet50", "layers": (1, 1, 1, 1)},
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
    )
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=1, num_examples=1, num_classes=3, image_size=IMG,
        with_images=True))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, IMG, IMG)
    assert np.isfinite(logits).any()


def test_mit_b0_segformer_parity():
    """Native MiT vs HuggingFace SegformerModel built from a local config
    (reference: build_encoder.py:137-140 AutoModel fallback for
    nvidia/segformer-b0-*), weights mapped by convert_segformer_state_dict."""
    transformers = pytest.importorskip("transformers")
    from labelanything_tpu.models.segformer import MixVisionTransformer
    from labelanything_tpu.utils.torch_import import (
        convert_segformer_state_dict, merge_into_variables)

    dims, depths = (8, 16, 24, 32), (1, 1, 2, 1)
    heads, srs = (1, 2, 3, 4), (8, 4, 2, 1)
    cfg = transformers.SegformerConfig(
        num_encoder_blocks=4, depths=list(depths), hidden_sizes=list(dims),
        num_attention_heads=list(heads), sr_ratios=list(srs),
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2], mlp_ratios=[4] * 4,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        layer_norm_eps=1e-6, reshape_last_stage=True)
    torch.manual_seed(7)
    ref = transformers.SegformerModel(cfg).eval()

    x = np.random.default_rng(8).standard_normal((2, 3, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        hs = ref(torch.from_numpy(x), output_hidden_states=True).hidden_states

    ours = MixVisionTransformer(embed_dims=dims, depths=depths,
                                num_heads=heads, sr_ratios=srs)
    example = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.key(0), example)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_segformer_state_dict(sd)
    variables = merge_into_variables(variables, {"params": converted})
    out = ours.apply(variables, example)

    assert set(out) == {"stage1", "stage2", "stage3", "stage4"}
    for i, stage in enumerate(["stage1", "stage2", "stage3", "stage4"]):
        np.testing.assert_allclose(
            np.asarray(out[stage]).transpose(0, 3, 1, 2), hs[i].numpy(),
            rtol=2e-3, atol=2e-4, err_msg=stage)
