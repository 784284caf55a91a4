"""Prediction / prompt visualization (reference: label_anything/logger/
wandb.py:472-906 image-sequence tables and demo/visualize.py).

Renders class-colored overlays of predictions, ground truths and visual
prompts into PNG files under the run directory — the offline-JSONL
counterpart of the reference's wandb image tables.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from ..typing import BatchKeys, IGNORE_INDEX

PALETTE = np.asarray([
    (0, 0, 0), (230, 60, 60), (60, 160, 230), (80, 200, 120), (240, 180, 40),
    (180, 90, 220), (90, 220, 210), (250, 120, 190), (140, 140, 60),
    (60, 90, 160), (200, 80, 40), (100, 200, 40),
], np.uint8)

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def colorize(labels: np.ndarray) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8 (IGNORE_INDEX -> black)."""
    lab = np.where(labels == IGNORE_INDEX, 0, labels)
    return PALETTE[np.clip(lab, 0, len(PALETTE) - 1)]


def denormalize(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) normalized float -> uint8 RGB."""
    img = (image * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def overlay(image: np.ndarray, labels: np.ndarray, alpha=0.5) -> np.ndarray:
    color = colorize(labels)
    fg = (labels > 0) & (labels != IGNORE_INDEX)
    out = image.copy()
    out[fg] = ((1 - alpha) * out[fg] + alpha * color[fg]).astype(np.uint8)
    return out


def draw_prompts(image: np.ndarray, batch: Dict[str, np.ndarray],
                 sample: int, example: int) -> np.ndarray:
    """Draw the (valid) point/box prompts of one support image
    (reference: logger/wandb.py:761-906 log_prompts)."""
    img = Image.fromarray(image)
    draw = ImageDraw.Draw(img)
    if BatchKeys.PROMPT_POINTS in batch:
        pts = np.asarray(batch[BatchKeys.PROMPT_POINTS])[sample, example]
        flags = np.asarray(batch[BatchKeys.FLAG_POINTS])[sample, example]
        for c in range(pts.shape[0]):
            color = tuple(int(v) for v in PALETTE[min(c, len(PALETTE) - 1)])
            for n in range(pts.shape[1]):
                if flags[c, n] == 0:
                    continue
                x, y = pts[c, n]
                r = 4
                if flags[c, n] > 0:
                    draw.ellipse([x - r, y - r, x + r, y + r], fill=color)
                else:
                    draw.ellipse([x - r, y - r, x + r, y + r], outline=color,
                                 width=2)
    if BatchKeys.PROMPT_BBOXES in batch:
        boxes = np.asarray(batch[BatchKeys.PROMPT_BBOXES])[sample, example]
        flags = np.asarray(batch[BatchKeys.FLAG_BBOXES])[sample, example]
        for c in range(boxes.shape[0]):
            color = tuple(int(v) for v in PALETTE[min(c, len(PALETTE) - 1)])
            for n in range(boxes.shape[1]):
                if flags[c, n] == 0:
                    continue
                x0, y0, x1, y1 = boxes[c, n]
                if x1 > x0 and y1 > y0:
                    draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
    out = np.asarray(img)
    if BatchKeys.PROMPT_MASKS in batch:
        # blend the flagged class-mask prompts (reference: wandb.py:820-906)
        masks = np.asarray(batch[BatchKeys.PROMPT_MASKS])[sample, example]
        flags = np.asarray(batch.get(BatchKeys.FLAG_MASKS,
                                     np.ones(masks.shape[:1])))[sample, example] \
            if BatchKeys.FLAG_MASKS in batch else np.ones(masks.shape[0])
        h, w = out.shape[:2]
        labels = np.zeros((h, w), np.int64)
        for c in range(masks.shape[0]):
            if flags[c] == 0:
                continue
            m = np.asarray(Image.fromarray(
                (masks[c] > 0.5).astype(np.uint8) * 255).resize(
                (w, h), Image.NEAREST)) > 0
            labels[m] = c
        out = overlay(out, labels, alpha=0.4)
    return out


def log_batch_images(run_dir: str, tag: str, batch: Dict[str, np.ndarray],
                     preds: np.ndarray, gts: np.ndarray,
                     max_samples: int = 2) -> Sequence[str]:
    """Save side-by-side (query | prediction | gt [| support prompts]) PNGs
    (reference: logger/wandb.py:472-641 log_batch). Returns written paths."""
    out_dir = pathlib.Path(run_dir) / "images"
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    b = preds.shape[0]
    for i in range(min(b, max_samples)):
        panels = []
        if BatchKeys.IMAGES in batch:
            imgs = np.asarray(batch[BatchKeys.IMAGES])
            query_img = denormalize(imgs[i, 0])
            s = preds.shape[-1]
            query_img = np.asarray(Image.fromarray(query_img).resize((s, s)))
            panels.append(overlay(query_img, np.asarray(preds[i])))
            # every support image with its prompt overlays (reference
            # renders the full example sequence, wandb.py:761-906)
            for ex in range(imgs.shape[1] - 1):
                sup = denormalize(imgs[i, ex + 1])
                panels.append(draw_prompts(sup, batch, i, ex))
        else:
            panels.append(colorize(np.asarray(preds[i])))
        panels.append(colorize(np.asarray(gts[i])))
        h = min(p.shape[0] for p in panels)
        panels = [np.asarray(Image.fromarray(p).resize((h, h))) for p in panels]
        strip = np.concatenate(panels, axis=1)
        path = out_dir / f"{tag}_{i}.png"
        Image.fromarray(strip).save(path)
        written.append(str(path))
    return written
