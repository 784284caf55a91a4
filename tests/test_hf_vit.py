"""Parity of StandardViT vs HuggingFace ViTModel through the weight converter
(the path that loads facebook/vit-mae-base-style checkpoints)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")
transformers = pytest.importorskip("transformers")

from labelanything_tpu.models.vit import StandardViT
from labelanything_tpu.utils.torch_import import (convert_hf_vit_state_dict,
                                                  merge_into_params)


def test_standard_vit_matches_hf():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                    intermediate_size=64, image_size=64, patch_size=16,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()

    ours = StandardViT(patch_size=16, embed_dim=32, depth=2, num_heads=2,
                       mlp_ratio=2.0, pretrain_grid=4)
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state[:, 1:]
    ref = ref.reshape(2, 4, 4, 32).numpy()

    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
    params = ours.init(jax.random.key(0), *args)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = merge_into_params(params, convert_hf_vit_state_dict(sd))
    out = np.asarray(ours.apply(params, *args))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_standard_vit_interpolates_pos_encoding():
    """interpolate_pos_encoding=True equivalent: 480px input on a 224px-grid
    checkpoint (reference: build_encoder.py:84-101)."""
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(1)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, image_size=32, patch_size=16,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    ours = StandardViT(patch_size=16, embed_dim=32, depth=1, num_heads=2,
                       mlp_ratio=2.0, pretrain_grid=2)

    x = np.random.default_rng(1).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x),
                 interpolate_pos_encoding=True).last_hidden_state[:, 1:]
    ref = ref.reshape(1, 4, 4, 32).numpy()

    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
    params = ours.init(jax.random.key(0), *args)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = merge_into_params(params, convert_hf_vit_state_dict(sd))
    out = np.asarray(ours.apply(params, *args))
    # pos-embedding interpolation conventions differ slightly (HF uses
    # bicubic; we use bilinear), so compare loosely
    assert out.shape == ref.shape
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr
