"""Tests for the extended model families: multilevel, pyramids, similarity,
GuidedPooler, SAM, contrastive PE, extra losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.typing import BatchKeys, ResultDict

C = 3
S = 64


def jbatch(**kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("num_examples", 1)
    kw.setdefault("num_classes", C)
    kw.setdefault("image_size", S)
    kw.setdefault("embed_dim", 32)
    return jax.tree.map(jnp.asarray, random_batch(**kw))


def test_multilevel_lam():
    from labelanything_tpu.models.build_lam import build_multilevel_lam

    model = build_multilevel_lam(embed_dims=(16, 32), image_size=S,
                                 vit_patch_sizes=(8, 16))
    batch = jbatch()
    rng = np.random.default_rng(0)
    batch[BatchKeys.EMBEDDINGS] = {
        "stage1": jnp.asarray(rng.standard_normal((2, 2, 8, 8, 16)), jnp.float32),
        "stage2": jnp.asarray(rng.standard_normal((2, 2, 4, 4, 32)), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, C, S, S)


def test_pyramid_neck():
    from labelanything_tpu.models.pyramids import PyramidNeck

    neck = PyramidNeck(intermediate_channel_sizes=(8, 16, 32), d_model=64)
    rng = np.random.default_rng(0)
    pyr = {
        "stage2": jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32),
        "stage3": jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32),
        "stage4": jnp.asarray(rng.standard_normal((2, 4, 4, 32)), jnp.float32),
    }
    params = jax.jit(neck.init)(jax.random.key(0), pyr)
    out = jax.jit(neck.apply)(params, pyr)
    assert out.shape == (2, 16, 16, 64)


def test_similarity_baseline():
    from labelanything_tpu.models.similarity import build_similarity

    model = build_similarity(image_size=S, custom_preprocess=True)
    batch = jbatch(include_points=False, include_boxes=False)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (2, C, S, S)
    assert np.isfinite(logits[:, :, 0, 0]).all()


def test_guided_pooler_variant():
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.train.losses import mask_embedding_loss

    model = build_lam_no_vit(
        image_embed_dim=32, embed_dim=32, image_size=S,
        embedding_extraction="pooler", embeddings_per_example=2,
    )
    batch = jbatch()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, C, S, S)
    assert ResultDict.MASK_EMBEDDINGS in out
    val = mask_embedding_loss(out)
    assert np.isfinite(float(val))


def test_adapted_sam():
    from labelanything_tpu.models.image_encoder import ImageEncoderViT
    from labelanything_tpu.models.sam import AdaptedSam, SamMaskDecoder, SamPromptEncoder
    from labelanything_tpu.models.transformer import TwoWayTransformer

    sam = AdaptedSam(
        image_encoder=ImageEncoderViT(img_size=S, patch_size=16, embed_dim=16,
                                      depth=1, num_heads=2, out_chans=32,
                                      window_size=2, global_attn_indexes=(0,)),
        prompt_encoder=SamPromptEncoder(
            embed_dim=32, image_embedding_size=(4, 4),
            input_image_size=(S, S), mask_in_chans=16),
        mask_decoder=SamMaskDecoder(
            transformer_dim=32,
            transformer=TwoWayTransformer(depth=1, embedding_dim=32,
                                          num_heads=8, mlp_dim=32)),
        image_size=S,
    )
    from labelanything_tpu.data.synthetic import random_full_batch

    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=2, num_examples=1, num_classes=C, image_size=S,
        with_images=True, include_masks=False))
    params = jax.jit(sam.init)(jax.random.key(0), batch)
    out = jax.jit(sam.apply)(params, batch)
    assert out[ResultDict.LOGITS].shape == (2, C, S, S)


def test_contrastive_pe_and_symmetric_loss():
    from labelanything_tpu.models.contrastive_pe import ContrastivePromptEncoder
    from labelanything_tpu.models.prompt_encoder import (IdentityClassEncoder,
                                                         PromptImageEncoder)
    from labelanything_tpu.models.transformer import TwoWayTransformer
    from labelanything_tpu.train.losses import symmetric_loss

    pe = PromptImageEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(S, S),
        mask_in_chans=16,
        transformer=TwoWayTransformer(depth=1, embedding_dim=32, num_heads=8,
                                      mlp_dim=32),
        class_encoder=IdentityClassEncoder(), mlp_dim=32)
    model = ContrastivePromptEncoder(prompt_encoder=pe, hidden_size=16,
                                     pe_in_channels=32, clip_in_channels=24)
    batch = jbatch(batch_size=1)
    batch[BatchKeys.EMBEDDINGS] = batch[BatchKeys.EMBEDDINGS][:, 1:]
    batch[BatchKeys.CLIP_EMBEDDINGS] = jnp.zeros((C, 5, 24))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    class_proj, clip_proj = jax.jit(model.apply)(params, batch)
    assert class_proj.shape == (C, 16) and clip_proj.shape == (C, 16)

    labels = jnp.eye(C)
    loss = symmetric_loss(class_proj, clip_proj, labels)
    assert np.isfinite(float(loss))


def test_sam_registry_entries():
    from labelanything_tpu.models.registry import model_registry

    for name in ("sam_b", "asam_b", "multilevel_lam", "similarity"):
        assert callable(model_registry[name]), name


def test_panet_baseline():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.panet import build_panet

    model = build_panet(image_size=S)
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=1, num_classes=C, image_size=S,
        with_images=True, include_points=False, include_boxes=False))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, C, S, S)
    assert np.isfinite(logits).any()


def test_sam_fewshot_composition():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.image_encoder import ImageEncoderViT
    from labelanything_tpu.models.panet import PANet, SAMFewShotModel, VGG16Features
    from labelanything_tpu.models.sam import AdaptedSam, SamMaskDecoder, SamPromptEncoder
    from labelanything_tpu.models.transformer import TwoWayTransformer

    sam = AdaptedSam(
        image_encoder=ImageEncoderViT(img_size=S, patch_size=16, embed_dim=16,
                                      depth=1, num_heads=2, out_chans=32,
                                      window_size=2, global_attn_indexes=(0,)),
        prompt_encoder=SamPromptEncoder(
            embed_dim=32, image_embedding_size=(4, 4),
            input_image_size=(S, S), mask_in_chans=16),
        mask_decoder=SamMaskDecoder(
            transformer_dim=32,
            transformer=TwoWayTransformer(depth=1, embedding_dim=32,
                                          num_heads=8, mlp_dim=32)),
        image_size=S,
    )
    model = SAMFewShotModel(sam=sam, fewshot=PANet(image_size=S), image_size=S)
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=1, num_classes=C, image_size=S,
        with_images=True))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert out[ResultDict.LOGITS].shape == (1, C, S, S)


def test_reference_prototype_affinity_is_broken():
    """Auditable record of why AffinityDecoder(prototype_merge=True) is
    implemented *as intended* rather than as a port of the reference merge
    (reference: models/mask_decoder.py:511-555, 630-648 — the forward path
    here lives in tests/test_models.py::test_prototype_affinity_decoder):

    1. The prototype branch assigns ``proto_logits`` but the function returns
       ``logits``, which is only bound in the else-branch -> NameError.
    2. prototype_transformer splits the class embeddings with heads=8 but the
       affinity features with heads=32 (mask_decoder.py:536-546): for the
       canonical dims the 8-channel affinity map cannot reshape into 32
       heads, and the batch axes (b*8 vs b*32) disagree even when it could.
    """
    import inspect

    torch = pytest.importorskip("torch")
    from tests._reference import load

    ref_md = load("label_anything.models.mask_decoder")

    src = inspect.getsource(ref_md.AffinityDecoder.forward)
    proto_branch = src.split("if self.class_embedding_mlp is not None:")[1]
    branch_body = proto_branch.split("else:")[0]
    assert "proto_logits = self.prototype_transformer" in branch_body
    import re

    # no bare `logits = ...` binding in the branch -> `return logits` NameErrors
    assert not re.search(r"^\s+logits\s*=", branch_body, re.M)

    pt = inspect.getsource(ref_md.AffinityDecoder.prototype_transformer)
    assert "heads = 32" in pt and 'heads=8' in pt  # inconsistent head split

    # and executing the merge with well-formed inputs indeed fails
    torch.manual_seed(32)
    dec = ref_md.AffinityDecoder(
        transformer_dim=64,
        transformer=torch.nn.Identity(),
        prototype_merge=True,
    ).eval()
    b, c, h, w = 1, 2, 8, 8
    q = torch.randn(b * c, 64, h, w)
    protos = torch.randn(b, c, 64)
    pe = torch.randn(b, 64, h, w)
    batch_mask = torch.ones(b * c, dtype=torch.bool)
    with pytest.raises(Exception):
        dec.prototype_transformer(q, protos, pe, batch_mask)
