"""Tests: Pascal datasets, explainer, optunizer, demo app, PE pretraining."""

import json
import pathlib
import threading

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from labelanything_tpu.typing import BatchKeys, IGNORE_INDEX, PromptType, ResultDict


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        name = f"img{i:03d}"
        names.append(name)
        h, w = 60, 80
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg")
        seg = np.zeros((h, w), np.uint8)
        cat = (i % 4) + 1
        seg[10:40, 10:50] = cat
        seg[45:55, 60:75] = ((i + 1) % 4) + 1
        seg[0:2, :] = 255  # border ignore
        Image.fromarray(seg).save(root / "SegmentationClass" / f"{name}.png")
    txt = "\n".join(f"/JPEGImages/{n}.jpg /SegmentationClass/{n}.png"
                    for n in names)
    for split in ("train", "val"):
        (root / "ImageSets" / "Segmentation" / f"{split}.txt").write_text(txt)
    return root


def test_pascal_dataset(voc_root):
    from labelanything_tpu.data.pascal import PascalDataset
    from labelanything_tpu.typing import BatchMetadataKeys

    ds = PascalDataset(data_dir=str(voc_root), split="train", image_size=64,
                       seed=0)
    meta = {BatchMetadataKeys.PROMPT_TYPES: [PromptType.MASK],
            BatchMetadataKeys.NUM_EXAMPLES: 1,
            BatchMetadataKeys.PROMPT_CHOICE_LEVEL: "batch"}
    item = ds[(0, meta)]
    assert item[BatchKeys.IMAGES].shape[0] == 2  # query + 1 example
    gt = item[BatchKeys.GROUND_TRUTHS]
    assert IGNORE_INDEX in np.unique(gt)  # border ignore propagated


def test_pascal5i_val(voc_root):
    from labelanything_tpu.data.pascal import Pascal5iDataset
    from labelanything_tpu.typing import BatchMetadataKeys

    ds = Pascal5iDataset(data_dir=str(voc_root), split="val", val_fold_idx=0,
                         n_folds=4, n_shots=1, n_ways=1, image_size=64,
                         val_num_samples=4, seed=0)
    assert len(ds) == 4
    meta = {BatchMetadataKeys.PROMPT_TYPES: [PromptType.MASK],
            BatchMetadataKeys.PROMPT_CHOICE_LEVEL: "batch"}
    item = ds[(0, meta)]
    assert item[BatchKeys.PROMPT_MASKS].shape[0] == 2  # n_shots+1 images
    # fold 0 of 20 VOC categories with 4 folds = first 5 categories
    assert set(ds.categories) == {1, 2, 3, 4, 5} & set(ds.categories) | set(ds.categories)


def test_explainer():
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.models.explainer import LamExplainer

    model = build_lam_no_vit(image_embed_dim=32, embed_dim=32, image_size=64)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=1, num_examples=1, num_classes=2, image_size=64,
        embed_dim=32))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    ex = LamExplainer(model, params)
    cam = np.asarray(ex.grad_cam(batch, target_class=1))
    assert cam.shape == (1, 4, 4) and (cam >= 0).all()
    ig = np.asarray(ex.integrated_gradients(batch, target_class=1, steps=4))
    assert ig.shape == (1, 4, 4, 32) and np.isfinite(ig).all()


def test_optunizer_random_fallback():
    from labelanything_tpu.utils.optuna_search import Optunizer

    base = {"train_params": {"lr": [1e-3, 1e-4]}, "model": {"dim": [32, 64]}}
    opt = Optunizer(base, n_trials=4, seed=0)
    for _ in range(4):
        cfg = opt.ask()
        assert cfg["train_params"]["lr"] in (1e-3, 1e-4)
        opt.report_result(cfg["model"]["dim"] / 64.0, cfg)
    assert opt.best["value"] in (0.5, 1.0)


def test_demo_server_predict():
    import base64
    import io
    import urllib.request

    from labelanything_tpu.demo.app import launch

    httpd = launch(port=8799, image_size=64, blocking=False)
    try:
        rng = np.random.default_rng(0)

        def b64_image():
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(
                buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        payload = {
            "support_image": b64_image(),
            "query_image": b64_image(),
            "prompts": {"1": {"points": [[30, 20, 1]], "boxes": [],
                              "polygons": [[10, 10, 40, 10, 40, 40]]}},
            "num_classes": 2,
        }
        req = urllib.request.Request(
            "http://localhost:8799/predict",
            data=json.dumps(payload).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert "overlay" in out, out
        # the page itself is served
        with urllib.request.urlopen("http://localhost:8799/", timeout=30) as resp:
            assert b"LabelAnything" in resp.read()
    finally:
        httpd.shutdown()


def test_pretraining_smoke(tmp_path):
    from labelanything_tpu.models.contrastive_pe import ContrastivePromptEncoder
    from labelanything_tpu.models.prompt_encoder import (IdentityClassEncoder,
                                                         PromptImageEncoder)
    from labelanything_tpu.models.transformer import TwoWayTransformer
    from labelanything_tpu.train.pretraining import pretrain_prompt_encoder

    pe = PromptImageEncoder(
        embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=16,
        transformer=TwoWayTransformer(depth=1, embedding_dim=16, num_heads=8,
                                      mlp_dim=16),
        class_encoder=IdentityClassEncoder(), mlp_dim=16)
    model = ContrastivePromptEncoder(prompt_encoder=pe, hidden_size=8,
                                     pe_in_channels=16, clip_in_channels=12)

    rng = np.random.default_rng(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        c = 3
        return {
            BatchKeys.EMBEDDINGS: jnp.asarray(
                r.standard_normal((1, 2, 4, 4, 16)), jnp.float32),
            BatchKeys.PROMPT_POINTS: jnp.asarray(
                r.uniform(0, 64, (1, 2, c, 2, 2)), jnp.float32),
            BatchKeys.FLAG_POINTS: jnp.asarray(
                r.integers(0, 2, (1, 2, c, 2)), jnp.int32),
            BatchKeys.FLAG_EXAMPLES: jnp.ones((1, 2, c), jnp.int32),
            BatchKeys.CLIP_EMBEDDINGS: jnp.asarray(
                r.standard_normal((c, 4, 12)), jnp.float32),
        }

    batches = lambda: iter([make_batch(i) for i in range(2)])
    params = pretrain_prompt_encoder(
        model, batches, batches, num_epochs=2, patience=2)
    assert params is not None


def test_brain_mri_bootstrap_roundtrip(tmp_path):
    """scripts/prepare_brain_mri.py (reference counterpart:
    data/medicine.py:27-120): split the Kaggle folder layout, generate the
    COCO instances.json with our RLE codec, and consume it with the
    episodic engine."""
    import subprocess
    import sys

    from PIL import Image

    from labelanything_tpu.data.coco import CocoLVISDataset
    from labelanything_tpu.typing import BatchKeys, BatchMetadataKeys

    raw = tmp_path / "raw"
    for case in ("TCGA_A1", "TCGA_B2"):
        d = raw / case
        d.mkdir(parents=True)
        rng = np.random.default_rng(len(case))
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)
                            ).save(d / f"{case}_{i}.tif")
            m = np.zeros((64, 64), np.uint8)
            if i % 2 == 0:
                m[10:30, 15:40] = 255
            Image.fromarray(m).save(d / f"{case}_{i}_mask.tif")

    script = str(pathlib.Path(__file__).resolve().parents[1]
                 / "scripts" / "prepare_brain_mri.py")
    subprocess.run(
        [sys.executable, script, "split", "--data", str(raw),
         "--train", str(tmp_path / "train"), "--test", str(tmp_path / "test"),
         "--copy"], check=True)
    subprocess.run(
        [sys.executable, script, "coco-json", "--data",
         str(tmp_path / "train"),
         "--out", str(tmp_path / "train" / "instances.json")], check=True)

    # tumor-free slices must produce NO annotation (a cat-0 dummy row would
    # become a samplable all-empty foreground way in this engine — the
    # background column is the implicit -1, not a category)
    doc = json.loads((tmp_path / "train" / "instances.json").read_text())
    assert all(a["category_id"] == 1 for a in doc["annotations"])
    assert [c["id"] for c in doc["categories"]] == [1]
    annotated = {a["image_id"] for a in doc["annotations"]}
    assert len(annotated) < len(doc["images"])  # empty slices exist

    ds = CocoLVISDataset(
        instances_path=str(tmp_path / "train" / "instances.json"),
        img_dir=str(tmp_path / "train"), image_size=64, n_shots=1,
        do_subsample=False, add_box_noise=False, load_gts=False, seed=0)
    assert set(ds.cat2img) == {1}  # no background pseudo-class
    item = ds[(0, {BatchMetadataKeys.PROMPT_TYPES: ["mask"],
                   BatchMetadataKeys.NUM_EXAMPLES: 1})]
    assert item[BatchKeys.IMAGES].shape == (2, 64, 64, 3)
    assert item[BatchKeys.PROMPT_MASKS].dtype == np.uint8
    assert item[BatchKeys.GROUND_TRUTHS].shape == (2, 64, 64)
