"""Unit tests for core ops: resize parity vs torch, attention, pooling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.ops import resize_bilinear
from labelanything_tpu.ops.attention import dot_product_attention, mask_to_bias
from labelanything_tpu.ops.resize import adaptive_avg_pool

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [((13, 17), (29, 31)), ((64, 64), (16, 16)),
                                          ((30, 30), (120, 120))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(0).standard_normal((2, 3) + in_hw).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x), out_hw, mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_attention_matches_reference_math():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 4, 9, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 11, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 11, 16)).astype(np.float32)
    out = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    attn = (tq @ tk.transpose(-2, -1)) / np.sqrt(16)
    ref = (attn.softmax(-1) @ tv).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_bias_masks_keys():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 1, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 6, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 6, 8)).astype(np.float32))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    bias = mask_to_bias(mask[:, None, None, :])
    out_masked = dot_product_attention(q, k, v, bias=bias)
    out_short = dot_product_attention(q, k[:, :, :3], v[:, :, :3])
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_short), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("in_hw,out_hw", [((30, 30), (2, 2)), ((7, 9), (3, 4)),
                                          ((8, 8), (1, 1))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(3).standard_normal((2, 5) + in_hw).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    theirs = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x), out_hw
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
