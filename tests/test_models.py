"""End-to-end model construction + forward smoke tests on tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.models.registry import model_registry
from labelanything_tpu.typing import BatchKeys, ResultDict

IMAGE_SIZE = 64  # tiny: grid 4x4, prompt masks 16x16


def tiny_batch(**kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("num_examples", 2)
    kw.setdefault("num_classes", 3)
    kw.setdefault("image_size", IMAGE_SIZE)
    kw.setdefault("embed_dim", 32)
    batch = random_batch(**kw)
    return jax.tree.map(jnp.asarray, batch)


def tiny_model(**kw):
    kw.setdefault("image_embed_dim", 32)
    kw.setdefault("embed_dim", 32)
    kw.setdefault("image_size", IMAGE_SIZE)
    kw.setdefault("class_encoder", {"name": "RandomMatrixEncoder", "bank_size": 10})
    return build_lam_no_vit(**kw)


def test_lam_no_vit_forward_shapes():
    batch = tiny_batch()
    model = tiny_model()
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    logits = out[ResultDict.LOGITS]
    assert logits.shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)
    assert out[ResultDict.EXAMPLES_CLASS_EMBS].shape == (2, 2, 3, 32)
    # padding region is -inf for fg and 0 for bg
    logits = np.asarray(logits)
    assert np.isneginf(logits[:, 1:, :, -1]).all()
    assert (logits[:, 0, :, -1] == 0).all()
    # valid region is finite
    assert np.isfinite(logits[:, :, :, : int(IMAGE_SIZE * 0.8)]).all()


@pytest.mark.parametrize(
    "mods",
    [
        dict(include_points=True, include_boxes=False, include_masks=False),
        dict(include_points=False, include_boxes=True, include_masks=False),
        dict(include_points=False, include_boxes=False, include_masks=True),
        dict(include_points=True, include_boxes=True, include_masks=True),
    ],
)
def test_prompt_modality_combinations(mods):
    batch = tiny_batch(**mods)
    model = tiny_model()
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)


@pytest.mark.parametrize("with_points", [True, False])
def test_factored_mask_path_matches_eager(monkeypatch, with_points):
    """With mask prompts the prompt encoder takes the rank-Cm factored
    fusion path (trunk features + folded 1x1, ops/twoway_blockdiag.py);
    LA_TPU_DISABLE_MASK_FACTOR=1 runs the eager dense-map path. Both must
    produce the same logits: the factorization is exact by linearity, the
    only drift is fp rounding (the bilinear resize commutes with the 1x1
    conv exactly in exact arithmetic). Covers NULL mask instances and the
    mask -> embedding-grid resize."""
    import labelanything_tpu.ops.twoway_blockdiag as bd

    batch = tiny_batch(include_points=with_points, include_boxes=False,
                       include_masks=True)
    model = tiny_model()
    params = model.init(jax.random.key(0), batch)

    old_e, old_f = bd._ENABLE, bd._FORCE
    bd._ENABLE = bd._FORCE = True  # exercise the blockdiag path on CPU
    try:
        monkeypatch.delenv("LA_TPU_DISABLE_MASK_FACTOR", raising=False)
        out_f = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
        monkeypatch.setenv("LA_TPU_DISABLE_MASK_FACTOR", "1")
        out_e = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
    finally:
        bd._ENABLE, bd._FORCE = old_e, old_f

    a = np.asarray(out_f[ResultDict.LOGITS])
    b = np.asarray(out_e[ResultDict.LOGITS])
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    m = np.isfinite(a)
    np.testing.assert_allclose(a[m], b[m], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_f[ResultDict.EXAMPLES_CLASS_EMBS]),
        np.asarray(out_e[ResultDict.EXAMPLES_CLASS_EMBS]),
        atol=2e-4, rtol=1e-4)


def test_generate_class_embeddings_and_predict_match_forward():
    """The cached-class-embedding decode path must agree with full forward."""
    batch = tiny_batch()
    model = tiny_model()
    params = model.init(jax.random.key(0), batch)

    # support-only dict: embeddings without the query image
    support = dict(batch)
    support[BatchKeys.EMBEDDINGS] = batch[BatchKeys.EMBEDDINGS][:, 1:]
    pe_result = model.apply(params, support, method="generate_class_embeddings")
    seg_predict = model.apply(params, batch, pe_result, method="predict")

    out = model.apply(params, batch)
    # forward applies flag_gts masking; predict path does not
    full = np.asarray(out[ResultDict.LOGITS])
    np.testing.assert_allclose(
        np.asarray(seg_predict), full, rtol=1e-4, atol=1e-4
    )


def test_variants_forward():
    """segment_example_logits / class_attention / pool encoder variants."""
    batch = tiny_batch()
    for kw in (
        dict(segment_example_logits=True),
        dict(class_attention=True, example_attention=True),
        dict(prompt_encoder="TokenPool"),
        dict(fusion_transformer="OneWayTransformer"),
        dict(fusion_transformer="IdentityTransformer"),
        dict(apply_masks=True),
    ):
        model = tiny_model(**kw)
        params = model.init(jax.random.key(0), batch)
        out = model.apply(params, batch)
        assert out[ResultDict.LOGITS].shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE), kw


def test_binary_lam():
    batch = tiny_batch()
    model = tiny_model(binary=True)
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)


def test_affinity_decoder():
    batch = tiny_batch()
    model = tiny_model(few_type="Affinity")
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)


def test_prototype_affinity_decoder():
    """few_type="PrototypeAffinity", implemented as intended (the reference
    branch is dead code — see tests/test_variants.py::
    test_reference_prototype_affinity_is_broken). embed_dim=64 so the
    affinity channel count (embed_dim/8) splits into the 8 prototype heads."""
    batch = tiny_batch(embed_dim=64)
    model = tiny_model(
        few_type="PrototypeAffinity", image_embed_dim=64, embed_dim=64
    )
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)
    assert not np.isnan(logits).any()
    assert np.isfinite(logits).any()


def test_dummy_model():
    batch = tiny_batch()
    model = model_registry["dummy"](image_size=IMAGE_SIZE)
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, 3, IMAGE_SIZE, IMAGE_SIZE)


def test_sam_vit_encoder_tiny():
    from labelanything_tpu.models.image_encoder import ImageEncoderViT

    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.key(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 4, 4, 16)


def test_standard_vit_tiny():
    from labelanything_tpu.models.vit import StandardViT

    enc = StandardViT(patch_size=16, embed_dim=32, depth=2, num_heads=2,
                      pretrain_grid=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.key(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 4, 4, 32)
