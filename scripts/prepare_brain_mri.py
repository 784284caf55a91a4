"""Brain-MRI dataset bootstrap: Kaggle download + COCO-json generation.

Counterpart of the reference's dataset preparation pipeline
(reference: label_anything/data/medicine.py:27-120): fetch the LGG
brain-MRI segmentation set (kaggle mateuszbuda/lgg-mri-segmentation),
split it, and emit a COCO instances.json (RLE segmentations via this
framework's codec, labelanything_tpu/data/rle.py) so the folder can feed
either consumer:

  * the cross-domain TEST protocol reads the raw folder directly
    (labelanything_tpu/data/crossdomain.py BrainMriTestDataset);
  * the episodic TRAIN engine (CocoLVISDataset) consumes the generated
    instances.json + image dir.

Usage:
  python scripts/prepare_brain_mri.py download  --out data/raw
  python scripts/prepare_brain_mri.py split     --data data/raw/lgg-mri-segmentation/kaggle_3m \
                                                --train data/brain_mri/train --test data/brain_mri/test
  python scripts/prepare_brain_mri.py coco-json --data data/brain_mri/train \
                                                --out data/brain_mri/train/instances.json

``download`` uses the kaggle API when installed+authenticated and prints
the manual recipe otherwise (this framework's CI containers have no
network egress — the other verbs work on an already-extracted archive).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
from datetime import datetime

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
from PIL import Image


def list_images(root: str):
    """All image .tifs (mask files excluded), sorted for determinism."""
    files = []
    for dirpath, _dirs, fnames in os.walk(root):
        for f in sorted(fnames):
            if f.endswith(".tif") and "_mask" not in f:
                files.append(os.path.join(dirpath, f))
    return sorted(files)


def mask_path(image_path: str) -> str:
    base, ext = os.path.splitext(image_path)
    return base + "_mask" + ext


def cmd_download(args) -> int:
    out = pathlib.Path(args.out)
    target = out / "lgg-mri-segmentation"
    if target.exists():
        print(f"already extracted: {target}")
        return 0
    try:
        from kaggle.api.kaggle_api_extended import KaggleApi  # optional dep
    except ImportError:
        print("kaggle API not installed — manual recipe:\n"
              "  pip install kaggle; place your API token in "
              "~/.kaggle/kaggle.json, then\n"
              f"  kaggle datasets download -d "
              f"mateuszbuda/lgg-mri-segmentation --unzip -p {out}\n"
              "or download the zip from "
              "https://www.kaggle.com/datasets/mateuszbuda/"
              "lgg-mri-segmentation and extract it there.")
        return 1
    api = KaggleApi()
    api.authenticate()
    out.mkdir(parents=True, exist_ok=True)
    api.dataset_download_files("mateuszbuda/lgg-mri-segmentation",
                               unzip=True, path=str(out))
    print(f"downloaded + extracted into {out}")
    return 0


def cmd_split(args) -> int:
    """Deterministic train/test split of (image, mask) pairs (the
    reference shuffles with an unseeded global rng; here --seed)."""
    rng = np.random.default_rng(args.seed)
    images = list_images(args.data)
    pairs = [(f, mask_path(f)) for f in images]
    pairs = [(i, m) for i, m in pairs if os.path.exists(m)]
    order = rng.permutation(len(pairs))
    n_test = int(len(pairs) * args.test_ratio)
    op = shutil.copy2 if args.copy else shutil.move
    for split, idxs in (("test", order[:n_test]), ("train", order[n_test:])):
        dest = pathlib.Path(args.test if split == "test" else args.train)
        dest.mkdir(parents=True, exist_ok=True)
        for i in idxs:
            for f in pairs[i]:
                op(f, str(dest / os.path.basename(f)))
    print(f"split {len(pairs)} pairs -> {len(pairs) - n_test} train / "
          f"{n_test} test ({'copied' if args.copy else 'moved'})")
    return 0


def cmd_coco_json(args) -> int:
    from labelanything_tpu.data import rle as rle_codec

    images, annotations = [], []
    files = list_images(args.data)
    if not files:
        raise SystemExit(f"no .tif images under {args.data}")
    for idx, f in enumerate(files):
        with Image.open(f) as im:
            w, h = im.size
        rel = os.path.relpath(f, args.data)
        images.append({"file_name": rel, "url": rel,
                       "height": int(h), "width": int(w), "id": idx})
        m = np.asarray(Image.open(mask_path(f)))
        if m.ndim == 3:
            m = m[..., 0]
        m = (m > 127).astype(np.uint8)
        ys, xs = np.nonzero(m)
        if not ys.size:
            # NO annotation for tumor-free slices. (The reference emits a
            # category-0 dummy row here, medicine.py:95-99, but this
            # framework's episodic engine has no category-0 special-casing
            # — background is the implicit -1 column — so a cat-0 row
            # would become a samplable all-empty foreground "way" and
            # num_classes would count it. Images without annotations are
            # simply never episode queries, which is the correct episodic
            # semantics for empty slices; the cross-domain TEST protocol
            # reads the raw folder and still sees them.)
            continue
        bbox = [int(xs.min()), int(ys.min()),
                int(xs.max() - xs.min()), int(ys.max() - ys.min())]
        enc = rle_codec.encode(np.asfortranarray(m))
        enc = {"size": enc["size"],
               "counts": enc["counts"].decode("ascii")
               if isinstance(enc["counts"], bytes) else enc["counts"]}
        annotations.append({
            "segmentation": enc, "area": int(m.sum()), "image_id": idx,
            "bbox": bbox, "category_id": 1, "id": idx, "iscrowd": 0,
        })
    doc = {
        "info": {
            "description": "Brain MRI Dataset Annotations files",
            "version": "1.0", "year": datetime.now().year,
            "date_created": datetime.now().strftime("%Y-%m-%d"),
        },
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "tumor"}],
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(doc))
    n_pos = sum(1 for a in annotations if a["category_id"] == 1)
    print(f"wrote {out}: {len(images)} images, {n_pos} tumor annotations")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--out", default="data/raw")
    s = sub.add_parser("split")
    s.add_argument("--data", required=True)
    s.add_argument("--train", required=True)
    s.add_argument("--test", required=True)
    s.add_argument("--test-ratio", type=float, default=0.2)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--copy", action="store_true",
                   help="copy instead of move (leaves the source intact)")
    c = sub.add_parser("coco-json")
    c.add_argument("--data", required=True)
    c.add_argument("--out", required=True)
    args = ap.parse_args()
    return {"download": cmd_download, "split": cmd_split,
            "coco-json": cmd_coco_json}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
