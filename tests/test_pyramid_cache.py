"""Pyramid-cache episodes: {"stageN": ...} embeddings flow through collate,
the Substitutor, and the base Lam's is_pyramids neck
(reference: build_lam.py:172-178 PyramidNeck, preprocess.py:309-322 caches,
substitution.py:221-225 dict embeddings)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.data.embeddings import (embedding_from_file,
                                               stack_embeddings)
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.typing import BatchKeys, ResultDict

IMG = 64
B, M, C, N = 2, 2, 3, 2
STAGES = {"stage2": (8, 8, 24), "stage3": (4, 4, 48), "stage4": (2, 2, 96)}


def test_embedding_from_file_pyramid_and_single():
    rng = np.random.default_rng(0)
    single = {"embedding": rng.standard_normal((5, 4, 4)).astype(np.float32)}
    e = embedding_from_file(single)
    assert e.shape == (4, 4, 5)  # channels-last

    pyr = {k: rng.standard_normal((c, h, w)).astype(np.float32)
           for k, (h, w, c) in STAGES.items()}
    d = embedding_from_file(pyr)
    assert set(d) == set(STAGES)
    assert d["stage3"].shape == (4, 4, 48)

    stacked = stack_embeddings([d, d])
    assert stacked["stage2"].shape == (2, 8, 8, 24)

    with pytest.raises(KeyError):
        embedding_from_file({"something_else": single["embedding"]})


def _pyramid_batch(seed=1):
    rng = np.random.default_rng(seed)
    batch = {
        BatchKeys.EMBEDDINGS: {
            k: rng.standard_normal((B, M + 1, h, w, c)).astype(np.float32)
            for k, (h, w, c) in STAGES.items()},
        BatchKeys.PROMPT_POINTS: rng.uniform(0, IMG, (B, M + 1, C, N, 2)).astype(np.float32),
        BatchKeys.FLAG_POINTS: rng.integers(0, 2, (B, M + 1, C, N)).astype(np.int32),
        BatchKeys.PROMPT_BBOXES: rng.uniform(0, IMG / 2, (B, M + 1, C, N, 4)).astype(np.float32),
        BatchKeys.FLAG_BBOXES: rng.integers(0, 2, (B, M + 1, C, N)).astype(np.int32),
        BatchKeys.PROMPT_MASKS: rng.integers(0, 2, (B, M + 1, C, 16, 16)).astype(np.float32),
        BatchKeys.FLAG_MASKS: rng.integers(0, 2, (B, M + 1, C)).astype(np.int32),
        BatchKeys.FLAG_EXAMPLES: np.ones((B, M + 1, C), np.int32),
        BatchKeys.DIMS: np.full((B, M + 1, 2), IMG, np.int64),
        BatchKeys.GROUND_TRUTHS: rng.integers(0, C, (B, M + 1, IMG, IMG)).astype(np.int32),
    }
    return jax.tree.map(jnp.asarray, batch)


def test_substitutor_rotates_pyramid_dict():
    from labelanything_tpu.train.substitutor import Substitutor

    batch = _pyramid_batch()
    sub = Substitutor(substitute=True, num_points=0)
    sub.reset(batch)
    assert sub.num_examples == M + 1
    outs = list(sub)
    assert len(outs) == M + 2  # initial + one rotation per image + closing
    # after the first rotation the stage tensors are permuted consistently
    inp, gt = outs[1]
    orig = np.asarray(batch[BatchKeys.EMBEDDINGS]["stage2"])
    rot = np.asarray(inp[BatchKeys.EMBEDDINGS]["stage2"])
    np.testing.assert_array_equal(rot[:, 0], orig[:, 1])


def test_is_pyramids_lam_forward():
    model = build_lam_no_vit(
        embed_dim=32, image_size=IMG, vit_patch_size=8,
        is_pyramids=True, intermediate_channel_sizes=[24, 48, 96],
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
    )
    from labelanything_tpu.train.substitutor import Substitutor

    sub = Substitutor(substitute=False)
    sub.reset(_pyramid_batch())
    input_dict, gt = next(sub)
    params = jax.jit(model.init)(jax.random.key(0), input_dict)
    out = jax.jit(model.apply)(params, input_dict)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (B, C, IMG, IMG)
    assert np.isfinite(logits).any()
