"""Embedding-extraction pipeline: the uint8-upload + device-normalize fast
path must reproduce the host fp32 preprocess (normalize-then-pad: pad region
EXACTLY zero) and write reference-compatible safetensors."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i, (h, w) in enumerate([(37, 61), (64, 64), (50, 23)]):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(d / f"{i + 1}.jpg", quality=95)
    return str(d)


def test_embed_pipeline_matches_host_preprocess(image_dir, tmp_path,
                                                monkeypatch):
    from safetensors.numpy import load_file

    from labelanything_tpu import preprocess as pp
    from labelanything_tpu.data.transforms import preprocess_image
    from labelanything_tpu.models import registry

    S = 32

    # a tiny SAM-style encoder so the test runs in seconds on CPU
    from labelanything_tpu.models.image_encoder import ImageEncoderViT

    def tiny_encoder(**kwargs):
        return ImageEncoderViT(
            img_size=S, patch_size=8, embed_dim=16, depth=1, num_heads=2,
            out_chans=8, use_rel_pos=True, window_size=2,
            global_attn_indexes=(0,), dtype=jnp.float32)

    monkeypatch.setitem(registry.model_registry, "tiny_enc", tiny_encoder)

    out_dir = tmp_path / "embs"
    rate = pp.preprocess_images_to_embeddings(
        "tiny_enc", directory=image_dir, outfolder=str(out_dir),
        batch_size=2, num_workers=2, image_size=S, dtype=jnp.float32)
    assert rate > 0

    files = sorted(os.listdir(out_dir))
    assert files == [f"{str(i).zfill(12)}.safetensors" for i in (1, 2, 3)]

    # reference: host fp32 preprocess -> direct encoder apply
    enc = tiny_encoder()
    probe = jnp.zeros((2, S, S, 3), jnp.float32)
    params = jax.jit(enc.init)(jax.random.key(0), probe)

    for i in (1, 2, 3):
        arr, _ = preprocess_image(
            Image.open(os.path.join(image_dir, f"{i}.jpg")), S, True)
        # normalize-then-pad semantics: the pad region is exactly zero
        ref = np.asarray(jax.jit(enc.apply)(
            params, jnp.asarray(arr)[None]))[0].transpose(2, 0, 1)
        got = load_file(out_dir / f"{str(i).zfill(12)}.safetensors")["embedding"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parity
def test_hf_embed_pipeline_matches_direct_apply(image_dir, tmp_path):
    """HF path: uint8/device-normalize/double-buffer pipeline vs direct
    StandardViT apply on the host fp32 preprocess."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import load_file
    from safetensors.torch import save_file as save_torch

    from labelanything_tpu import preprocess as pp
    from labelanything_tpu.data.transforms import preprocess_image
    from labelanything_tpu.models.vit import StandardViT
    from labelanything_tpu.utils.torch_import import (
        convert_hf_vit_state_dict, merge_into_params)

    torch.manual_seed(0)
    cfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
    ckpt = tmp_path / "hf_ckpt"
    ckpt.mkdir()
    (ckpt / "config.json").write_text(cfg.to_json_string())
    save_torch({k: v.contiguous() for k, v in hf.state_dict().items()},
               str(ckpt / "model.safetensors"))

    S = 32
    out_dir = tmp_path / "hf_embs"
    rate = pp.preprocess_images_to_embeddings_huggingface(
        str(ckpt), image_dir, batch_size=2, num_workers=2,
        outfolder=str(out_dir), image_resolution=S, dtype=jnp.float32)
    assert rate > 0

    ours = StandardViT(patch_size=16, embed_dim=32, depth=1, num_heads=2,
                       mlp_ratio=2.0, pretrain_grid=2, layernorm_eps=1e-12)
    probe = jnp.zeros((2, S, S, 3))
    params = jax.jit(ours.init)(jax.random.key(0), probe)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = merge_into_params(params, convert_hf_vit_state_dict(sd))

    from PIL import Image as PILImage
    for i in (1, 2, 3):
        arr, _ = preprocess_image(
            PILImage.open(os.path.join(image_dir, f"{i}.jpg")), S, True)
        ref = np.asarray(jax.jit(ours.apply)(
            params, jnp.asarray(arr)[None]))[0].transpose(2, 0, 1)
        got = load_file(out_dir / f"{str(i).zfill(12)}.safetensors")["embedding"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
