"""Swin + DCAMA parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

ref_swin_mod = load("label_anything.models.dcama.swin_transformer")
ref_tr_mod = load("label_anything.models.dcama.transformer")

from labelanything_tpu.models.swin import SwinTransformer
from labelanything_tpu.utils.torch_import import (convert_dcama_state_dict,
                                                  merge_into_params)


def tiny_swin_pair(img=64, window=4, embed=16, depths=(1, 2, 2, 1),
                   heads=(1, 2, 2, 4)):
    torch.manual_seed(0)
    ref = ref_swin_mod.SwinTransformer(
        img_size=img, patch_size=4, window_size=window, embed_dim=embed,
        depths=list(depths), num_heads=list(heads), drop_path_rate=0.0,
    ).eval()
    ours = SwinTransformer(img_size=img, patch_size=4, window_size=window,
                           embed_dim=embed, depths=depths, num_heads=heads)
    return ref, ours


def test_swin_feature_parity():
    ref, ours = tiny_swin_pair()
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref.forward_features(torch.from_numpy(x))
    ref_feats = [f.numpy() for f in ref.feat_maps]  # (B, HW, C) each

    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
    params = ours.init(jax.random.key(0), *args)
    sd = {f"feature_extractor.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted = convert_dcama_state_dict(sd)["feature_extractor"]
    params = merge_into_params(params, converted)
    feats = ours.apply(params, *args)

    assert len(feats) == len(ref_feats) == sum((1, 2, 2, 1))
    for i, (f, rf) in enumerate(zip(feats, ref_feats)):
        b, h, w, c = f.shape
        np.testing.assert_allclose(
            np.asarray(f).reshape(b, h * w, c), rf, rtol=2e-3, atol=2e-4,
            err_msg=f"feature map {i}")


def test_mask_aggregation_attention_parity():
    from labelanything_tpu.models.dcama import MaskAggregationAttention

    torch.manual_seed(1)
    d_model = 16
    ref = ref_tr_mod.MultiHeadedAttention(h=8, d_model=d_model, dropout=0.0).eval()
    ours = MaskAggregationAttention(d_model=d_model)

    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 12, d_model)).astype(np.float32)
    k = rng.standard_normal((2, 20, d_model)).astype(np.float32)
    mask = rng.integers(0, 2, (2, 20)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(mask))  # (B, Q, 1)
    params = ours.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(k),
                       jnp.asarray(mask))
    sd = ref.state_dict()
    converted = {
        "q": {"kernel": sd["linears.0.weight"].numpy().T,
              "bias": sd["linears.0.bias"].numpy()},
        "k": {"kernel": sd["linears.1.weight"].numpy().T,
              "bias": sd["linears.1.bias"].numpy()},
    }
    params = merge_into_params(params, converted)
    out = np.asarray(ours.apply(params, jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(mask)))
    np.testing.assert_allclose(out, out_ref.numpy()[..., 0], rtol=1e-4,
                               atol=1e-5)


def test_dcama_multiclass_forward():
    """End-to-end DCAMAMultiClass on a tiny Swin (shape/finiteness)."""
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.dcama import DCAMAMultiClass
    from labelanything_tpu.typing import BatchKeys, ResultDict

    img = 64
    model = DCAMAMultiClass(
        image_size=img,
        backbone=SwinTransformer(img_size=img, patch_size=4, window_size=4,
                                 embed_dim=16, depths=(1, 2, 2, 1),
                                 num_heads=(1, 2, 2, 4)),
        stack_ids=(1, 3, 5, 6),
        in_channels=(16, 32, 64, 128),
    )
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=1, num_classes=3, image_size=img,
        with_images=True, include_points=False, include_boxes=False))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, img, img)
    assert np.isfinite(logits).any()


def test_dcama_head_nshot_parity():
    """2-shot head parity vs the reference DCAMA_model: shots must ride the
    attention KEY axis (not be averaged) and skip features max over shots
    (reference: dcama/dcama.py:190-245). bsz=1 because the reference's
    (nshot*bsz) -> (bsz, nshot*hw) view scrambles shots for bsz>1 and its
    wrapper asserts batch size 1."""
    from labelanything_tpu.models.dcama import DCAMAModel
    from labelanything_tpu.utils.torch_import import convert_dcama_state_dict

    ref_dcama_mod = load("label_anything.models.dcama.dcama")
    in_ch = (16, 32, 64, 128)
    stack_ids = (1, 3, 5, 6)
    torch.manual_seed(2)
    ref = ref_dcama_mod.DCAMA_model(list(in_ch), torch.tensor(stack_ids)).eval()
    ours = DCAMAModel(in_channels=in_ch, stack_ids=stack_ids)

    rng = np.random.default_rng(2)
    b, shots = 1, 2
    # block -> (stage channels, spatial): img 64 -> 1/4..1/32
    shapes = [(16, 16, 16), (32, 8, 8), (32, 8, 8), (64, 4, 4), (64, 4, 4),
              (128, 2, 2)]
    qf_t = [torch.from_numpy(rng.standard_normal((b, c, h, w)).astype(np.float32))
            for c, h, w in shapes]
    sf_t = [[torch.from_numpy(rng.standard_normal((b, c, h, w)).astype(np.float32))
             for c, h, w in shapes] for _ in range(shots)]
    mask_np = rng.integers(0, 2, (b, shots, 64, 64)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(qf_t, sf_t, torch.from_numpy(mask_np), nshot=shots)

    qf_j = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in qf_t]
    sf_j = [jnp.stack([sf_t[k][i].numpy().transpose(0, 2, 3, 1)
                       for k in range(shots)], axis=1)
            for i in range(len(shapes))]
    mask_j = jnp.asarray(mask_np)
    params = ours.init(jax.random.key(0), qf_j, sf_j, mask_j)
    sd = {f"model.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_dcama_state_dict(sd)["model"]
    params = merge_into_params(params, converted)
    out = np.asarray(ours.apply(params, qf_j, sf_j, mask_j))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_ref.numpy(),
                               rtol=2e-3, atol=2e-4)
