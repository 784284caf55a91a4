"""Numerics bound for the bf16 postprocess branch (models/lam.py
postprocess_masks_fixed).

Under a bf16 mask decoder the decoder logits are cast to bf16 before the
16x bilinear upsample (halving the postprocess HBM bill — PERF.md); the
reference postprocess is fp32 throughout (reference: lam.py:383-452).
The golden fixtures all run the fp32 config, so this file is the only
coverage of the bf16-gated branch: it bounds the logit drift at bf16
rounding, proves the -inf pad semantics survive the cast bit-exactly, and
measures the episode-level argmax/mIoU delta (recorded in PERF.md per the
round-4 advisor note).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.typing import BatchKeys, ResultDict


def _build_and_run(monkeypatch, fp32_postprocess: bool):
    monkeypatch.setenv("LA_TPU_POSTPROCESS_FP32",
                       "1" if fp32_postprocess else "0")
    model = build_lam_no_vit(
        image_embed_dim=64, embed_dim=32, image_size=96,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
        dtype=jnp.bfloat16,
    )
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=2, num_examples=1, num_classes=3, image_size=96,
        embed_dim=64, seed=3))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    # a fresh lambda per variant: the env guard is read at TRACE time, so
    # each variant needs its own jit cache entry
    out = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
    return np.asarray(out[ResultDict.LOGITS], np.float32), batch


def test_bf16_postprocess_within_bf16_rounding_of_fp32(monkeypatch):
    logits16, batch = _build_and_run(monkeypatch, fp32_postprocess=False)
    logits32, _ = _build_and_run(monkeypatch, fp32_postprocess=True)
    assert logits16.shape == logits32.shape

    finite = np.isfinite(logits32)
    # -inf pad semantics must survive the cast EXACTLY (same mask, and the
    # bg channel's pad region is exactly 0 in both)
    np.testing.assert_array_equal(finite, np.isfinite(logits16))
    pad_bg = ~np.isfinite(logits32[:, 1:]).any(axis=1)  # (B, S, S) pad mask
    assert np.all(logits16[:, 0][pad_bg] == 0.0)

    # the finite logits differ only by bf16 rounding carried through the
    # bilinear upsample (a few ulp of accumulation on top of the 2^-8
    # mantissa step; measured ~0.7 * 2^-7 * scale on TPU, slightly wider on
    # the CPU backend's different fusion order)
    scale = np.abs(logits32[finite]).max()
    d = np.abs(logits16[finite] - logits32[finite]).max()
    assert d <= scale * 2 ** -6 + 1e-3, (d, scale)

    # episode-level decision delta: a pixel's argmax may only flip where
    # the fp32 top-2 margin is within the rounding bound (random-init
    # logits are nearly tied across classes, so an unconditional flip rate
    # is noise — e.g. 6% here — while margin-guarded flips measure the real
    # decision risk, which is zero)
    tol = scale * 2 ** -6 + 1e-3
    pred16 = logits16.argmax(axis=1)
    pred32 = logits32.argmax(axis=1)
    valid = finite.all(axis=1) | pad_bg  # every pixel has a defined argmax
    sorted32 = np.sort(np.where(np.isfinite(logits32), logits32, -np.inf),
                       axis=1)
    margin = sorted32[:, -1] - sorted32[:, -2]           # (B, S, S)
    confident = valid & (margin > 2 * tol)
    flips = (pred16 != pred32) & confident
    assert not flips.any(), float(flips.mean())


def test_fp32_config_ignores_postprocess_flag(monkeypatch):
    """The bf16 cast is gated on the decoder dtype: an fp32 model must emit
    bit-identical logits whatever the env flag says."""
    outs = []
    for flag in ("0", "1"):
        monkeypatch.setenv("LA_TPU_POSTPROCESS_FP32", flag)
        model = build_lam_no_vit(
            image_embed_dim=64, embed_dim=32, image_size=96,
            class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
        )
        batch = jax.tree.map(jnp.asarray, random_batch(
            batch_size=1, num_examples=1, num_classes=3, image_size=96,
            embed_dim=64, seed=5))
        params = jax.jit(model.init)(jax.random.key(0), batch)
        out = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
        outs.append(np.asarray(out[ResultDict.LOGITS], np.float32))
    np.testing.assert_array_equal(outs[0], outs[1])
