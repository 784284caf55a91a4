"""Tests: built-in dataset episode browser (demo/builtin.py + /builtin/*
HTTP endpoints), reference: label_anything/demo/builtin.py:169-256."""

import base64
import io
import json
import urllib.request
import zipfile

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocobrowse")
    (root / "images").mkdir()
    rng = np.random.default_rng(7)
    images, annotations, ann_id = [], [], 1
    for i in range(1, 13):
        h, w = 56 + (i % 2) * 8, 64
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "images" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        for cat in [1, 2]:
            x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
            bw, bh = int(rng.integers(8, 20)), int(rng.integers(8, 20))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                                  x0, y0 + bh]],
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    inst = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "cat_a"},
                           {"id": 2, "name": "cat_b"}]}
    (root / "instances.json").write_text(json.dumps(inst))
    return root


def test_retrieve_models_offline_fallback():
    from labelanything_tpu.demo.builtin import DEFAULT_MODELS, retrieve_models

    models = retrieve_models()  # no egress -> hub fallback
    assert models, models
    assert all(isinstance(m, str) for m in models)
    assert set(DEFAULT_MODELS) <= set(models) or models != DEFAULT_MODELS


def test_episode_browser_headless(coco_root):
    from labelanything_tpu.demo.builtin import EpisodeBrowser
    from labelanything_tpu.typing import ResultDict

    browser = EpisodeBrowser(
        {"val_coco": {"instances_path": str(coco_root / "instances.json"),
                      "img_dir": str(coco_root / "images"),
                      "num_samples": 4}},
        {"image_size": 64, "seed": 0},
        n_ways=2, n_shots=1, prompt_types=["point", "bbox", "mask"],
    )
    sample = browser.sample()
    assert sample["dataset"] == "val_coco"
    assert sample["supports"], sample
    # overlays decode back to PNGs of the episode resolution
    img = Image.open(io.BytesIO(base64.b64decode(sample["query"])))
    assert img.size == (64, 64)
    names = set()
    for s in sample["supports"]:
        Image.open(io.BytesIO(base64.b64decode(s["image"])))
        names.update(s["classes"])
    assert names <= {"cat_a", "cat_b"} and names

    def fake_forward(input_dict):
        from labelanything_tpu.typing import BatchKeys

        b = np.asarray(input_dict[BatchKeys.IMAGES]).shape[0]
        n_cls = np.asarray(input_dict["prompt_masks"]).shape[2] + 1
        rng = np.random.default_rng(0)
        return {ResultDict.LOGITS: rng.normal(size=(b, n_cls, 64, 64))}

    result = browser.predict(fake_forward)
    assert set(result["plots"]) == {"pred_overlay", "pred", "gt_overlay", "gt"}
    assert 0.0 <= result["binary_iou"] <= 1.0

    blob = browser.download_zip()
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        entries = zf.namelist()
    assert any(e.startswith("prompt_") for e in entries)
    assert any(e.startswith("result_") for e in entries)


def test_builtin_http_endpoints(coco_root):
    from labelanything_tpu.demo.app import launch

    httpd = launch(port=8798, image_size=64, blocking=False)
    try:
        def post(path, body=None):
            req = urllib.request.Request(
                f"http://localhost:8798{path}",
                data=json.dumps(body or {}).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=600) as resp:
                return json.loads(resp.read())

        out = post("/builtin/load", {
            "instances_path": str(coco_root / "instances.json"),
            "img_dir": str(coco_root / "images"),
            "n_ways": 2, "n_shots": 1, "image_size": 64, "fold": -1,
            "num_samples": 4,
            "prompt_types": ["point", "bbox", "mask"]})
        assert out.get("ok"), out
        out = post("/builtin/sample")
        assert out.get("supports"), out
        out = post("/builtin/predict")
        assert "plots" in out, out
        with urllib.request.urlopen(
                "http://localhost:8798/builtin/download", timeout=60) as resp:
            blob = resp.read()
        assert zipfile.ZipFile(io.BytesIO(blob)).namelist()
        with urllib.request.urlopen(
                "http://localhost:8798/models", timeout=60) as resp:
            assert json.loads(resp.read())["models"]
        with urllib.request.urlopen(
                "http://localhost:8798/builtin", timeout=60) as resp:
            assert b"episode browser" in resp.read()
    finally:
        httpd.shutdown()
