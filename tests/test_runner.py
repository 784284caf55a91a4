"""Integration test: YAML grid -> Experimenter -> Run -> train + validate +
checkpoint on a synthetic on-disk COCO dataset (8-device CPU mesh)."""

import json

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocorun")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations, ann_id = [], [], 1
    for i in range(1, 17):
        h, w = 56 + (i % 2) * 8, 64
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "images" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
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
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    (root / "instances.json").write_text(json.dumps(inst))
    return root


def make_config(root, out):
    return {
        "experiment": {"name": "tiny", "continue_with_errors": False},
        "parameters": {
            "seed": [3],
            "logger": {"log_frequency": [2], "val_image_log_frequency": [1]},
            "train_params": {
                "loss": {"class_weighting": [True],
                         "components": {"focal": {"weight": [1.0]}}},
                "num_points": [1],
                "max_epochs": [1],
                "initial_lr": [0.001],
                "optimizer": ["AdamW"],
                "substitute": [True],
                "accumulate_substitution": [True],
                "watch_metric": ["miou"],
                "check_nan": [1],
            },
            "model": {
                "name": ["lam_no_vit"],
                "image_embed_dim": [3],
                "embed_dim": [32],
                "image_size": [64],
                "class_encoder": {"name": ["RandomMatrixEncoder"],
                                  "bank_size": [10]},
            },
            "dataset": {
                "datasets": {
                    "coco": {
                        "instances_path": [str(root / "instances.json")],
                        "img_dir": [str(root / "images")],
                    },
                    "val_coco": {
                        "instances_path": [str(root / "instances.json")],
                        "img_dir": [str(root / "images")],
                        "n_shots": [1],
                        "do_subsample": [False],
                        "add_box_noise": [False],
                        "num_samples": [4],
                    },
                },
                "common": {"image_size": [64], "seed": [0]},
            },
            "dataloader": {
                "num_workers": [2],
                "possible_batch_example_nums": [[[8, 1]]],
                "val_possible_batch_example_nums": [[[4, 1]]],
                "prompt_types": [["point", "bbox", "mask"]],
            },
        },
    }


class _ImgToEmb:
    """Monkeypatch helper: treat raw images as embeddings via strided pixels."""


def test_experimenter_end_to_end(coco_root, tmp_path, monkeypatch):
    from labelanything_tpu.experiment.experiment import Experimenter
    from labelanything_tpu.experiment import run as run_mod
    from labelanything_tpu.typing import BatchKeys

    cfg = make_config(coco_root, tmp_path)

    # route images through the embeddings path (image_embed_dim=3 neck):
    # strided-pixel "embeddings" keep the test fast without an encoder
    orig = run_mod.Run._device_batch

    def patched(self, batch, **kw):
        device, host = orig(self, batch, **kw)
        if BatchKeys.IMAGES in device:
            device[BatchKeys.EMBEDDINGS] = device.pop(
                BatchKeys.IMAGES)[:, :, ::16, ::16, :]
        return device, host

    monkeypatch.setattr(run_mod.Run, "_device_batch", patched)

    exp = Experimenter(cfg, out_dir=str(tmp_path / "runs"))
    assert len(exp.runs) == 1
    results = exp.execute_runs()
    assert results and "error" not in results[0]

    # checkpoints written
    ckpt_dir = tmp_path / "runs" / "run0" / "checkpoints"
    assert (ckpt_dir / "latest").exists()
    assert (ckpt_dir / "best").exists()
    # metrics logged
    run_dir = tmp_path / "runs" / "run0"
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any("validate" in l for l in lines)
    # per-epoch validation image tables (reference: logger/wandb.py:472-906):
    # overlay PNGs on disk + image records in the metric stream
    val_pngs = list((run_dir / "images").glob("val_*_e0_*.png"))
    assert val_pngs, "val_image_log_frequency produced no overlay grids"
    assert any("image/val_" in l for l in lines)
    run_id = json.loads((run_dir / "run_meta.json").read_text())["run_id"]

    # resume path: a fresh Run restores from the checkpoint
    flat = exp.runs[0]
    run2 = run_mod.Run().init(flat, run_dir=str(run_dir))
    (batch, gts), _ = next(iter(run2.train_loader))
    device_batch, _ = run2._device_batch(batch)
    from labelanything_tpu.train.substitutor import Substitutor

    sub = Substitutor(substitute=False)
    sub.reset(device_batch)
    input_dict, gt = next(sub)
    run2._lazy_init(input_dict, gt)
    assert run2.start_epoch == 1
    # the resumed run reopens the SAME logical run (reference:
    # logger/wandb.py:115-178 run-id resume) and appends to its stream
    assert run2.tracker.resumed and run2.tracker.run_id == run_id
    run2.validate(epoch=1)
    lines2 = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert len(lines2) > len(lines), "resumed run did not append to the stream"
    assert list((run_dir / "images").glob("val_*_e1_*.png")), \
        "resumed validation logged no epoch-indexed images"
