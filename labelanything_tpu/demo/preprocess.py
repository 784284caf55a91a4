"""Demo-side episode assembly
(reference: label_anything/demo/preprocess.py:123-211).

Turns user-drawn prompts (points / boxes / polygon masks per class, in
original image coordinates) into one support batch and a query batch in the
model's input frame.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..data import rle as rle_codec
from ..data.schema import flags_merge
from ..data.transforms import PromptsProcessor, preprocess_image
from ..typing import BatchKeys


def preprocess_support_set(
    images: List[Image.Image],
    prompts: List[Dict[int, Dict[str, list]]],
    num_classes: int,
    image_size: int = 480,
    custom_preprocess: bool = True,
) -> Dict[str, np.ndarray]:
    """Build a (B=1, M, ...) support batch.

    ``prompts[m][class_id]`` is a dict with optional keys "points"
    ([(x, y, label)]), "boxes" ([xyxy]) and "polygons" ([[x0, y0, ...]]) in
    original pixel coordinates (reference: demo/preprocess.py:123-198).
    """
    pp = PromptsProcessor(long_side_length=image_size,
                          custom_preprocess=custom_preprocess)
    m = len(images)
    c = num_classes + 1  # background column
    arrays, sizes = [], []
    for img in images:
        arr, size = preprocess_image(img, image_size, custom_preprocess)
        arrays.append(arr)
        sizes.append(size)

    max_pts = max((len(cls.get("points", []))
                   for pr in prompts for cls in pr.values()), default=1) or 1
    max_box = max((len(cls.get("boxes", []))
                   for pr in prompts for cls in pr.values()), default=1) or 1
    msl = pp.masks_side_length

    points = np.zeros((m, c, max_pts, 2), np.float32)
    flag_points = np.zeros((m, c, max_pts), np.int32)
    boxes = np.zeros((m, c, max_box, 4), np.float32)
    flag_boxes = np.zeros((m, c, max_box), np.int32)
    masks = np.zeros((m, c, msl, msl), np.float32)
    flag_masks = np.zeros((m, c), np.int32)

    for i, (pr, size) in enumerate(zip(prompts, sizes)):
        h, w = size
        for class_id, cls in pr.items():
            j = class_id  # class ids are 1..num_classes; 0 = bg
            for k, (x, y, label) in enumerate(cls.get("points", [])[:max_pts]):
                xy = pp.apply_coords(np.asarray([[x, y]], np.float64), size)[0]
                points[i, j, k] = xy
                flag_points[i, j, k] = 1 if label >= 0 else -1
            for k, box in enumerate(cls.get("boxes", [])[:max_box]):
                boxes[i, j, k] = pp.apply_boxes(
                    np.asarray([box], np.float64), size)[0]
                flag_boxes[i, j, k] = 1
            polys = cls.get("polygons", [])
            if polys:
                mask = rle_codec.poly_to_mask(polys, h, w)
                masks[i, j] = pp.apply_masks([mask])
                flag_masks[i, j] = 1

    flag_examples = flags_merge(flag_masks, flag_points, flag_boxes)
    return {
        BatchKeys.IMAGES: np.stack(arrays)[None],
        BatchKeys.PROMPT_POINTS: points[None],
        BatchKeys.FLAG_POINTS: flag_points[None],
        BatchKeys.PROMPT_BBOXES: boxes[None],
        BatchKeys.FLAG_BBOXES: flag_boxes[None],
        BatchKeys.PROMPT_MASKS: masks[None],
        BatchKeys.FLAG_MASKS: flag_masks[None],
        BatchKeys.FLAG_EXAMPLES: flag_examples[None],
        BatchKeys.DIMS: np.asarray(sizes, np.int32)[None],
    }


def preprocess_to_batch(query: Image.Image, image_size: int = 480,
                        custom_preprocess: bool = True) -> Dict[str, np.ndarray]:
    """Query-image batch for ``predict`` (reference: demo/preprocess.py:200-211)."""
    arr, size = preprocess_image(query, image_size, custom_preprocess)
    return {
        BatchKeys.IMAGES: arr[None, None],
        BatchKeys.DIMS: np.asarray([[size]], np.int32)[0][None],
    }
