"""Public API tests: from_pretrained / save_pretrained round trips and the
cross-domain test protocol."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.api import LabelAnything
from labelanything_tpu.typing import BatchKeys, ResultDict

TINY_CONFIG = {
    "use_vit": False,
    "image_embed_dim": 32,
    "embed_dim": 32,
    "image_size": 64,
    "class_encoder": {"name": "RandomMatrixEncoder", "bank_size": 10},
}


def tiny_batch():
    from labelanything_tpu.data.synthetic import random_batch

    return jax.tree.map(jnp.asarray, random_batch(
        batch_size=1, num_examples=1, num_classes=2, image_size=64,
        embed_dim=32))


def test_save_load_roundtrip(tmp_path):
    la = LabelAnything(TINY_CONFIG)
    batch = tiny_batch()
    la.init_params(batch)
    out1 = np.asarray(la(batch)[ResultDict.LOGITS])

    la.save_pretrained(str(tmp_path / "ckpt"))
    la2 = LabelAnything.from_pretrained(str(tmp_path / "ckpt"))
    out2 = np.asarray(la2(batch)[ResultDict.LOGITS])
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)

    # serving split agrees with forward
    support = dict(batch)
    support[BatchKeys.EMBEDDINGS] = batch[BatchKeys.EMBEDDINGS][:, 1:]
    embs = la2.generate_class_embeddings(support)
    seg = np.asarray(la2.predict(batch, embs))
    np.testing.assert_allclose(seg, out1, rtol=1e-4, atol=1e-4)


def test_from_pretrained_torch_checkpoint(tmp_path):
    """A reference-layout torch checkpoint dir loads bit-compatibly."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    from tests._reference import load
    from tests.test_parity import (_our_prompt_encoder, _ref_prompt_encoder,
                                   _prompt_inputs, D, IMG)

    ref_md = load("label_anything.models.mask_decoder")
    ref_tr = load("label_anything.models.transformer")
    ref_lam_mod = load("label_anything.models.lam")
    ref_common = load("label_anything.models.common")

    torch.manual_seed(7)
    neck = torch.nn.Sequential(
        torch.nn.Conv2d(24, D, 1, bias=False), ref_common.LayerNorm2d(D),
        torch.nn.Conv2d(D, D, 3, padding=1, bias=False), ref_common.LayerNorm2d(D),
    )
    ref = ref_lam_mod.Lam(
        image_encoder=None,
        prompt_encoder=_ref_prompt_encoder(),
        mask_decoder=ref_md.MaskDecoderLam(
            transformer_dim=D,
            transformer=ref_tr.TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=8, mlp_dim=64,
                attention_downsample_rate=2)),
        neck=neck, image_size=IMG,
    ).eval()

    ckpt = tmp_path / "hub"
    ckpt.mkdir()
    save_file(ref.state_dict(), str(ckpt / "model.safetensors"))
    config = {
        "use_vit": False, "image_embed_dim": 24, "embed_dim": D,
        "image_size": IMG, "checkpoint": None, "use_sam_checkpoint": False,
        # mirror _our_prompt_encoder/_ref_prompt_encoder (no class encoder)
        "class_encoder": None,
    }
    (ckpt / "config.json").write_text(json.dumps(config))

    # build_lam uses mlp_dim 2048 for the fusion transformers while the tiny
    # twin above uses 64: the width mismatch must be caught loudly at load
    # time, never silently mis-loaded. (Full numerical parity of the
    # converter is covered by test_parity.)
    with pytest.raises(ValueError, match="shape mismatch"):
        LabelAnything.from_pretrained(str(ckpt))


def test_cross_domain_protocol(tmp_path):
    """Kvasir-style folder dataset through Run._test_one."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "masks").mkdir(parents=True)
        n = 2 if split == "train" else 3
        for i in range(n):
            name = f"{split}{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(
                tmp_path / split / "images" / name)
            mask = np.zeros((60, 80), np.uint8)
            mask[20:40, 30:60] = 255
            Image.fromarray(mask).save(tmp_path / split / "masks" / name)

    from labelanything_tpu.data.crossdomain import KvasirTestDataset

    ds = KvasirTestDataset(str(tmp_path), image_size=64,
                           prompt_images=["train0.jpg", "train1.jpg"])
    assert len(ds) == 3
    support = ds.extract_prompts()
    assert support[BatchKeys.PROMPT_MASKS].shape == (1, 2, 2, 256, 256)
    assert support[BatchKeys.FLAG_EXAMPLES].shape == (1, 2, 2)

    from labelanything_tpu.experiment.run import Run

    run = Run()
    run.params = {}
    run.seed = 0
    run.train_params = {}
    run.model_params = {"image_embed_dim": 3, "embed_dim": 32, "image_size": 64}
    run.image_size = 64
    from labelanything_tpu.models.build_lam import build_lam
    from labelanything_tpu.parallel.mesh import create_mesh
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.utils.logging import ExperimentLogger

    # 3-channel images route through the neck as 'embeddings'-style input is
    # not possible here; use a tiny SAM ViT encoder instead
    from labelanything_tpu.models.image_encoder import ImageEncoderViT
    from labelanything_tpu.models.lam import Lam, Neck
    from labelanything_tpu.models.mask_decoder import MaskDecoderLam
    from labelanything_tpu.models.prompt_encoder import (IdentityClassEncoder,
                                                         PromptImageEncoder)
    from labelanything_tpu.models.transformer import TwoWayTransformer

    D = 32
    run.model = Lam(
        image_encoder=ImageEncoderViT(
            img_size=64, patch_size=16, embed_dim=16, depth=1, num_heads=2,
            out_chans=D, window_size=2, global_attn_indexes=(0,)),
        prompt_encoder=PromptImageEncoder(
            embed_dim=D, image_embedding_size=(4, 4), input_image_size=(64, 64),
            mask_in_chans=16,
            transformer=TwoWayTransformer(depth=1, embedding_dim=D,
                                          num_heads=8, mlp_dim=32),
            class_encoder=IdentityClassEncoder(), mlp_dim=32),
        mask_decoder=MaskDecoderLam(
            transformer_dim=D,
            transformer=TwoWayTransformer(depth=1, embedding_dim=D,
                                          num_heads=8, mlp_dim=32)),
        neck=None, image_size=64,
    )
    run.loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    run.mesh = create_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    run.data_sharding = NamedSharding(run.mesh, P("data"))
    run.num_processes = run.mesh.devices.size
    run.tracker = ExperimentLogger(str(tmp_path / "run"))
    run.state = None
    run.tx = None
    from labelanything_tpu.train.checkpoint import CheckpointManager

    run.checkpoints = CheckpointManager(str(tmp_path / "ckpt"))
    metrics = run._test_one(ds, "test_kvasir", batch_size=3)
    assert set(metrics) == {"miou", "fbiou"}
    assert all(np.isfinite(v) for v in metrics.values())


def test_export_state_dict_roundtrip():
    """export_state_dict is the exact inverse of convert_state_dict on the
    LAM (no-ViT) tree: reference torch sd -> flax params -> exported sd with
    identical keys and bit-equal values."""
    import numpy as np
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    from tests.test_parity_canonical import _load_ref_build_lam

    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                      export_state_dict,
                                                      merge_into_params)
    import jax
    import jax.numpy as jnp
    from labelanything_tpu.data.synthetic import random_batch

    ref_bl = _load_ref_build_lam()
    torch.manual_seed(35)
    kw = dict(image_embed_dim=24, embed_dim=32, image_size=64,
              spatial_convs=2, example_class_attention=True,
              class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10,
                             "embed_dim": 32})
    ref = ref_bl.build_lam_no_vit(**kw).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours_kw = dict(kw)
    ours_kw["class_encoder"] = {"name": "RandomMatrixEncoder", "bank_size": 10}
    ours = build_lam_no_vit(**ours_kw)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=1, num_examples=1, num_classes=2, image_size=64,
        embed_dim=24))
    params = ours.init(jax.random.key(0), batch)
    params = merge_into_params(params, convert_state_dict(sd))

    exported = export_state_dict(params)
    assert set(exported) == set(sd), (
        sorted(set(sd) - set(exported))[:8], sorted(set(exported) - set(sd))[:8])
    for k in sd:
        np.testing.assert_array_equal(exported[k], sd[k], err_msg=k)

    # and through disk: safetensors serializes raw buffers, so transposed
    # views must arrive contiguous (regression: scrambled dense kernels)
    import tempfile

    from safetensors.numpy import load_file, save_file

    path = tempfile.mktemp(suffix=".safetensors")
    save_file(exported, path)
    back = load_file(path)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
