"""Schema-correct synthetic episode generators
(reference: label_anything/data/utils.py:452-545 random_item/random_batch).

Used by tests, the memory pre-flight, and bench.py. Produces channels-last
NumPy batches ready for the device.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..typing import BatchKeys, IGNORE_INDEX
from .schema import flags_merge


def random_batch(
    batch_size: int = 2,
    num_examples: int = 1,
    num_classes: int = 2,  # foreground + bg => C = num_classes (incl. bg)
    num_points: int = 2,
    image_size: int = 480,
    embed_dim: int = 768,
    patch_size: int = 16,
    include_points: bool = True,
    include_boxes: bool = True,
    include_masks: bool = True,
    with_images: bool = False,
    seed: int = 0,
    gt_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Build a random episode batch.

    Shapes (channels-last):
      embeddings: (B, M+1, S/16, S/16, D)  [index 0 = query]
      prompt_masks: (B, M, C, S/4, S/4)
      prompt_points: (B, M, C, N, 2); flag_points in {0, 1}
      prompt_bboxes: (B, M, C, N, 4); flag_bboxes in {0, 1}
      ground_truths: (B, G, G) int32 with IGNORE_INDEX padding
      dims: (B, M+1, 2)
    """
    rng = np.random.default_rng(seed)
    b, m, c, n = batch_size, num_examples, num_classes, num_points
    s = image_size
    grid = s // patch_size
    batch: Dict[str, np.ndarray] = {}

    if with_images:
        batch[BatchKeys.IMAGES] = rng.standard_normal(
            (b, m + 1, s, s, 3), dtype=np.float32
        )
    else:
        batch[BatchKeys.EMBEDDINGS] = rng.standard_normal(
            (b, m + 1, grid, grid, embed_dim), dtype=np.float32
        )

    flag_masks = flag_points = flag_bboxes = None
    if include_masks:
        batch[BatchKeys.PROMPT_MASKS] = rng.integers(
            0, 2, (b, m, c, s // 4, s // 4)
        ).astype(np.float32)
        flag_masks = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        batch[BatchKeys.FLAG_MASKS] = flag_masks
    if include_points:
        batch[BatchKeys.PROMPT_POINTS] = rng.uniform(
            0, s, (b, m, c, n, 2)
        ).astype(np.float32)
        flag_points = rng.integers(0, 2, (b, m, c, n)).astype(np.int32)
        batch[BatchKeys.FLAG_POINTS] = flag_points
    if include_boxes:
        x0 = rng.uniform(0, s / 2, (b, m, c, n, 2))
        wh = rng.uniform(1, s / 2, (b, m, c, n, 2))
        batch[BatchKeys.PROMPT_BBOXES] = np.concatenate(
            [x0, x0 + wh], axis=-1
        ).astype(np.float32)
        flag_bboxes = rng.integers(0, 2, (b, m, c, n)).astype(np.int32)
        batch[BatchKeys.FLAG_BBOXES] = flag_bboxes

    flat = lambda f: None if f is None else f.reshape((b * m,) + f.shape[2:])
    flags = flags_merge(flat(flag_masks), flat(flag_points), flat(flag_bboxes))
    batch[BatchKeys.FLAG_EXAMPLES] = flags.reshape(b, m, c).astype(np.int32)

    g = gt_size or s
    gt = rng.integers(0, c, (b, g, g)).astype(np.int32)
    # emulate a padded region on the last sample
    gt[:, :, int(g * 0.9):] = IGNORE_INDEX
    batch[BatchKeys.GROUND_TRUTHS] = gt
    batch[BatchKeys.FLAG_GTS] = np.ones((b, c), dtype=bool)

    dims = np.tile(np.asarray([s, int(s * 0.9)], np.int32), (b, m + 1, 1))
    batch[BatchKeys.DIMS] = dims
    return batch


def random_full_batch(**kw) -> Dict[str, np.ndarray]:
    """Training-loop batch variant: prompt tensors and GROUND_TRUTHS carry the
    full N = M+1 image axis (query slot included), as consumed by the
    Substitutor (reference: experiment/substitution.py divide_query_examples).
    """
    kw.setdefault("num_examples", 1)
    m = kw["num_examples"]
    kw["num_examples"] = m + 1
    batch = random_batch(**kw)
    b = batch[BatchKeys.DIMS].shape[0]
    s = kw.get("image_size", 480)
    g = kw.get("gt_size") or s
    c = kw.get("num_classes", 2)
    rng = np.random.default_rng(kw.get("seed", 0) + 1)
    gt = rng.integers(0, c, (b, m + 1, g, g)).astype(np.int32)
    gt[:, :, :, int(g * 0.9):] = IGNORE_INDEX
    batch[BatchKeys.GROUND_TRUTHS] = gt
    # fix the embeddings/dims axis: random_batch made M+2 images; trim to M+1
    if BatchKeys.EMBEDDINGS in batch:
        batch[BatchKeys.EMBEDDINGS] = batch[BatchKeys.EMBEDDINGS][:, : m + 1]
    if BatchKeys.IMAGES in batch:
        batch[BatchKeys.IMAGES] = batch[BatchKeys.IMAGES][:, : m + 1]
    batch[BatchKeys.DIMS] = batch[BatchKeys.DIMS][:, : m + 1]
    return batch
