"""Core enums and result-dict keys shared across the framework.

Mirrors the behavioural contract of the reference implementation's episode
schema (reference: label_anything/data/utils.py:15-65 and
label_anything/utils/utils.py ResultDict) while remaining framework-agnostic:
every key is a plain string so batches are pytrees of jnp arrays keyed by str.
"""

from __future__ import annotations

import enum


class StrEnum(str, enum.Enum):
    def __str__(self) -> str:  # pragma: no cover - trivial
        return str(self.value)


class PromptType(StrEnum):
    """Visual prompt modalities (reference: data/utils.py:19-22)."""

    BBOX = "bbox"
    MASK = "mask"
    POINT = "point"


class Label(enum.IntEnum):
    """Prompt validity / polarity labels (reference: data/utils.py:25-28).

    POSITIVE marks a real positive prompt, NEGATIVE a real negative point,
    NULL padding. Flag tensors for points use this tri-state; flags for
    boxes/masks use {NULL, POSITIVE}.
    """

    POSITIVE = 1
    NULL = 0
    NEGATIVE = -1


class BatchKeys(StrEnum):
    """Episode batch dict keys (reference: data/utils.py:43-58).

    Layout note: this framework is channels-last on device. ``IMAGES`` is
    (B, N, H, W, 3) and ``EMBEDDINGS`` is (B, N, H, W, D); the reference uses
    NCHW. Host-side import helpers transpose.
    """

    IMAGES = "images"
    EMBEDDINGS = "embeddings"
    PROMPT_MASKS = "prompt_masks"          # (B, M, C, Hm, Wm) float
    FLAG_MASKS = "flag_masks"              # (B, M, C) int
    PROMPT_POINTS = "prompt_points"        # (B, M, C, N, 2) float, xy in input frame
    FLAG_POINTS = "flag_points"            # (B, M, C, N) int in {-1, 0, 1}
    PROMPT_BBOXES = "prompt_bboxes"        # (B, M, C, N, 4) float xyxy
    FLAG_BBOXES = "flag_bboxes"            # (B, M, C, N) int in {0, 1}
    FLAG_EXAMPLES = "flag_examples"        # (B, M, C) int in {0, 1}
    DIMS = "dims"                          # (B, N, 2) int (H, W) original sizes
    RESIZED_DIMS = "resized_dims"          # (B, N, 2) int (h, w) post-resize
    #   content extent inside the padded square frame — shipped by the uint8
    #   ingest loader so device normalization masks EXACTLY the rows/cols the
    #   host resize produced instead of re-deriving them (ops/image_norm.py)
    CLASSES = "classes"                    # host-side metadata (list of lists)
    INTENDED_CLASSES = "intended_classes"
    IMAGE_IDS = "image_ids"
    GROUND_TRUTHS = "ground_truths"        # (B, H, W) int, -100 = pad
    FLAG_GTS = "flag_gts"                  # (B, C) bool - classes present in episode
    CLIP_EMBEDDINGS = "clip_embeddings"


class BatchMetadataKeys(StrEnum):
    """Keys of the sampler→dataset metadata dict (reference: data/utils.py:61-65)."""

    PROMPT_TYPES = "prompt_types"
    NUM_EXAMPLES = "num_examples"
    NUM_CLASSES = "num_classes"
    PROMPT_CHOICE_LEVEL = "prompt_choice_level"


class AnnFileKeys(StrEnum):
    """COCO-style annotation file keys (reference: data/utils.py:31-40)."""

    IMAGES = "images"
    ANNOTATIONS = "annotations"
    CATEGORIES = "categories"
    ID = "id"
    IMAGE_ID = "image_id"
    CATEGORY_ID = "category_id"
    IMAGE = "image"
    ISCROWD = "iscrowd"
    SEGMENTATION = "segmentation"


class ResultDict(StrEnum):
    """Model forward-result keys (reference: label_anything/utils/utils.py)."""

    LOGITS = "logits"
    CLASS_EMBS = "class_embeddings"
    EXAMPLES_CLASS_EMBS = "examples_class_embeddings"
    EXAMPLES_CLASS_SRC = "examples_class_src"
    MASK_EMBEDDINGS = "mask_embeddings"


class LossDict(StrEnum):
    VALUE = "value"
    COMPONENTS = "components"


#: Default SAM-style transformer embedding width (reference: models/common.py:16).
SAM_EMBED_DIM = 256

#: Ignore index used by ground-truth padding (reference: data/utils.py collate_gts).
IGNORE_INDEX = -100
