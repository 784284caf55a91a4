"""Episodes for CLIP-contrastive prompt-encoder pretraining
(reference: label_anything/data/prompt_encoder_dataset.py).

Each item samples ``num_examples`` images of one category with its prompts
plus the images' CLIP embeddings. The collate unrolls the sampled classes
onto the class axis diagonally (class i of the batch occupies class column i,
reference: data/utils.py:404-439 collate_class_*), producing one B=1 episode
whose C equals the number of sampled classes.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..typing import BatchKeys, PromptType
from .coco import CocoLVISDataset, annotations_to_tensor
from .schema import flags_merge


class PromptEncoderDataset(CocoLVISDataset):
    def __init__(self, name="coco", instances_path=None, clip_emb_dir=None,
                 num_examples: int = 2, **kwargs):
        super().__init__(name=name, instances_path=instances_path, **kwargs)
        self.clip_emb_dir = clip_emb_dir
        self.n_images = num_examples

    def set_num_examples(self, n: int):
        self.n_images = n

    def _load_clip_embeddings(self, img_id):
        from safetensors.numpy import load_file

        f = load_file(
            f"{self.clip_emb_dir}/{str(img_id).zfill(12)}.safetensors")
        return f["clip_embedding"]

    def __getitem__(self, class_idx: int) -> dict:
        cat_id = list(self.categories.keys())[class_idx]
        pool = sorted(self.cat2img[cat_id])
        img_ids = [pool[int(self.rng.integers(len(pool)))]
                   for _ in range(self.n_images)]
        images, image_key, _ = self._get_images_or_embeddings(img_ids)
        bboxes, masks, points, classes, img_sizes = self._get_prompts(
            img_ids, [cat_id],
            [PromptType.MASK, PromptType.BBOX, PromptType.POINT])
        bboxes, flag_bboxes = annotations_to_tensor(
            self.prompts_processor, bboxes, img_sizes, PromptType.BBOX)
        masks, flag_masks = annotations_to_tensor(
            self.prompts_processor, masks, img_sizes, PromptType.MASK)
        points, flag_points = annotations_to_tensor(
            self.prompts_processor, points, img_sizes, PromptType.POINT)
        flag_examples = flags_merge(flag_masks, flag_points, flag_bboxes)
        clip = (np.stack([self._load_clip_embeddings(i) for i in img_ids])
                if self.clip_emb_dir else
                np.zeros((self.n_images, 1, 512), np.float32))
        return {
            image_key: images,
            BatchKeys.FLAG_EXAMPLES: flag_examples,
            BatchKeys.PROMPT_MASKS: masks,
            BatchKeys.FLAG_MASKS: flag_masks,
            BatchKeys.PROMPT_POINTS: points,
            BatchKeys.FLAG_POINTS: flag_points,
            BatchKeys.PROMPT_BBOXES: bboxes,
            BatchKeys.FLAG_BBOXES: flag_bboxes,
            BatchKeys.CLIP_EMBEDDINGS: clip,
        }

    def __len__(self):
        return len(self.categories)


def collate_fn(items: List[dict]) -> dict:
    """Diagonal class unrolling (reference: prompt_encoder_dataset.py:95-140)."""
    n_classes = len(items)
    image_key = (BatchKeys.IMAGES if BatchKeys.IMAGES in items[0]
                 else BatchKeys.EMBEDDINGS)
    images = np.concatenate([x[image_key] for x in items], axis=0)
    m = items[0][BatchKeys.FLAG_EXAMPLES].shape[0]
    msl = items[0][BatchKeys.PROMPT_MASKS].shape[-1]
    max_nb = max(x[BatchKeys.PROMPT_BBOXES].shape[2] for x in items)
    max_np = max(x[BatchKeys.PROMPT_POINTS].shape[2] for x in items)

    total = m * n_classes
    out = {
        BatchKeys.FLAG_EXAMPLES: np.zeros((total, n_classes), np.int32),
        BatchKeys.PROMPT_MASKS: np.zeros((total, n_classes, msl, msl), np.float32),
        BatchKeys.FLAG_MASKS: np.zeros((total, n_classes), np.int32),
        BatchKeys.PROMPT_BBOXES: np.zeros((total, n_classes, max_nb, 4), np.float32),
        BatchKeys.FLAG_BBOXES: np.zeros((total, n_classes, max_nb), np.int32),
        BatchKeys.PROMPT_POINTS: np.zeros((total, n_classes, max_np, 2), np.float32),
        BatchKeys.FLAG_POINTS: np.zeros((total, n_classes, max_np), np.int32),
    }
    for i, x in enumerate(items):
        sl = slice(i * m, (i + 1) * m)
        out[BatchKeys.FLAG_EXAMPLES][sl, i] = x[BatchKeys.FLAG_EXAMPLES][:, 0]
        out[BatchKeys.PROMPT_MASKS][sl, i] = x[BatchKeys.PROMPT_MASKS][:, 0]
        out[BatchKeys.FLAG_MASKS][sl, i] = x[BatchKeys.FLAG_MASKS][:, 0]
        nb = x[BatchKeys.PROMPT_BBOXES].shape[2]
        out[BatchKeys.PROMPT_BBOXES][sl, i, :nb] = x[BatchKeys.PROMPT_BBOXES][:, 0]
        out[BatchKeys.FLAG_BBOXES][sl, i, :nb] = x[BatchKeys.FLAG_BBOXES][:, 0]
        np_ = x[BatchKeys.PROMPT_POINTS].shape[2]
        out[BatchKeys.PROMPT_POINTS][sl, i, :np_] = x[BatchKeys.PROMPT_POINTS][:, 0]
        out[BatchKeys.FLAG_POINTS][sl, i, :np_] = x[BatchKeys.FLAG_POINTS][:, 0]

    clip = np.stack([x[BatchKeys.CLIP_EMBEDDINGS] for x in items])
    return {
        image_key: images[None],
        **{k: v[None] for k, v in out.items()},
        BatchKeys.CLIP_EMBEDDINGS: clip.mean(axis=1),
    }
