"""Host data-engine throughput: COCO episode assembly (JPEG decode, RLE ->
mask, prompt sampling, bucketed collate) in episodes/sec — the reference's
CPU-worker hot loop (reference: data/coco.py:546-644).

Builds a synthetic on-disk COCO dataset (polygon + RLE annotations), then
times full episodes through LabelAnythingDataset + VariableBatchSampler +
collate with the threaded EpisodeLoader."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
from PIL import Image


def build_dataset(root: pathlib.Path, n_images: int, image_hw=(320, 480)):
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations, ann_id = [], [], 1
    h, w = image_hw
    for i in range(1, n_images + 1):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "images" / f"{i}.jpg", quality=90)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        for cat in (1, 2, 3):
            x0 = int(rng.integers(0, w // 2))
            y0 = int(rng.integers(0, h // 2))
            bw = int(rng.integers(20, 80))
            bh = int(rng.integers(20, 80))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                                  x0, y0 + bh]],
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
    inst = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
    (root / "instances.json").write_text(json.dumps(inst))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--processes", action="store_true")
    ap.add_argument("--device-normalize", action="store_true",
                    help="uint8 ingest: skip host normalization (pixels "
                         "normalize on device inside the jitted step)")
    args = ap.parse_args()

    from labelanything_tpu.data.dataset import (LabelAnythingDataset,
                                                VariableBatchSampler)
    from labelanything_tpu.data.loader import EpisodeLoader

    root = pathlib.Path(tempfile.mkdtemp())
    build_dataset(root, args.images)

    union = LabelAnythingDataset(
        datasets_params={"coco": {
            "instances_path": str(root / "instances.json"),
            "img_dir": str(root / "images"),
        }},
        common_params={"image_size": 480, "add_box_noise": True, "seed": 0,
                       "device_normalize": args.device_normalize},
    )
    sampler = VariableBatchSampler(
        union, possible_batch_example_nums=[[8, 1], [4, 2]],
        shuffle=True, seed=1)
    loader = EpisodeLoader(union, sampler, num_workers=args.workers,
                           use_processes=args.processes)

    # warmup epoch (caches, thread spin-up)
    for _ in loader:
        pass
    t0 = time.perf_counter()
    episodes = 0
    for _ in range(args.epochs):
        for (batch, gts), _names in loader:
            episodes += gts.shape[0]
    dt = time.perf_counter() - t0
    mode = "processes" if args.processes else "threads"
    print(f"episodes/sec (host assembly, 480px, {args.workers} {mode}): "
          f"{episodes / dt:.1f}  ({episodes} episodes in {dt:.1f}s)")


if __name__ == "__main__":
    main()
