"""Host-side image / prompt preprocessing (NumPy + PIL)
(reference: label_anything/data/transforms.py).

Produces channels-last float32 arrays ready for the device. The reference's
torch/torchvision ops are replaced with PIL (image resize) and NumPy; the
geometric conventions (long-side resize, bottom-right padding, half-open bbox
conversion, clipped Gaussian bbox noise) are preserved.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from . import rle as rle_codec

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def get_preprocess_shape(oldh: int, oldw: int, long_side_length: int) -> Tuple[int, int]:
    """(reference: data/utils.py:441-449)."""
    scale = long_side_length * 1.0 / max(oldh, oldw)
    return int(oldh * scale + 0.5), int(oldw * scale + 0.5)


class CustomResize:
    """Long-side resize preserving aspect ratio (reference: transforms.py:14-24)."""

    def __init__(self, long_side_length: int = 1024):
        self.long_side_length = long_side_length

    def __call__(self, image: Image.Image) -> Image.Image:
        w, h = image.size
        nh, nw = get_preprocess_shape(h, w, self.long_side_length)
        return image.resize((nw, nh), Image.BILINEAR)


class CustomNormalize:
    """ImageNet normalize + bottom-right pad to square
    (reference: transforms.py:27-46). Input PIL or (H, W, 3) uint8/float;
    output float32 (S, S, 3) channels-last."""

    def __init__(self, long_side_length: int = 1024,
                 mean: Sequence[float] = IMAGENET_MEAN,
                 std: Sequence[float] = IMAGENET_STD):
        self.long_side_length = long_side_length
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, image) -> np.ndarray:
        if isinstance(image, Image.Image):
            image = np.asarray(image, np.float32) / 255.0
        image = (image - self.mean) / self.std
        h, w = image.shape[:2]
        s = self.long_side_length
        out = np.zeros((s, s, 3), np.float32)
        out[:h, :w] = image
        return out


def preprocess_image(image: Image.Image, long_side_length: int,
                     custom: bool = True,
                     normalize: bool = True) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Full pipeline: long-side resize -> normalize -> pad. Returns the
    padded (S, S, 3) array and the original (H, W).

    ``normalize=False`` is the uint8 ingest path: resize + bottom-right pad
    only, returning (S, S, 3) uint8 — 4x fewer host->device bytes and no
    fp32 passes on the loader workers; the model then normalizes on device
    (ops/image_norm.py), bit-matching CustomNormalize incl. the zero pad in
    the normalized frame (reference: data/transforms.py:27-46)."""
    w, h = image.size
    if image.mode != "RGB":
        image = image.convert("RGB")
    if custom:
        image = CustomResize(long_side_length)(image)
    else:
        image = image.resize((long_side_length, long_side_length), Image.BILINEAR)
    if not normalize:
        arr = np.asarray(image, np.uint8)
        s = long_side_length
        out = np.zeros((s, s, 3), np.uint8)
        out[:arr.shape[0], :arr.shape[1]] = arr
        return out, (h, w)
    return CustomNormalize(long_side_length)(image), (h, w)


class PromptsProcessor:
    """Annotation -> prompt conversion (reference: transforms.py:68-224)."""

    def __init__(self, long_side_length: int = 1024, masks_side_length: int = 256,
                 custom_preprocess: bool = True,
                 rng: Optional[np.random.Generator] = None):
        self.long_side_length = long_side_length
        self.masks_side_length = masks_side_length
        self.custom_preprocess = custom_preprocess
        self.rng = rng or np.random.default_rng()

    # -- annotation conversion ------------------------------------------ #

    def convert_mask(self, segm, h: int, w: int) -> np.ndarray:
        """Polygons / RLE -> binary mask with degenerate single-pixel fallback
        (reference: transforms.py:123-149)."""
        return rle_codec.ann_to_mask(segm, h, w)

    def _add_bbox_noise(self, bbox, hb, wb, h, w):
        x1, y1, x2, y2 = bbox
        n = lambda s: float(np.clip(self.rng.normal(0, s), -20, 20))
        return [
            float(np.clip(x1 + n(0.1 * wb), 0, w)),
            float(np.clip(y1 + n(0.1 * hb), 0, h)),
            float(np.clip(x2 + n(0.1 * wb), 0, w)),
            float(np.clip(y2 + n(0.1 * hb), 0, h)),
        ]

    def convert_bbox(self, bbox, h: int, w: int, noise: bool = False):
        """xywh -> xyxy with optional clipped Gaussian noise
        (reference: transforms.py:96-122)."""
        x, y, wb, hb = bbox
        box = [x, y, x + wb, y + hb]
        return self._add_bbox_noise(box, hb, wb, h, w) if noise else box

    def sample_point(self, mask: np.ndarray) -> Tuple[int, int]:
        """Uniform positive-pixel sample -> (x, y) (reference: transforms.py:152-157)."""
        return self.sample_points(mask, 1)[0]

    def sample_points(self, mask: np.ndarray, k: int) -> List[Tuple[int, int]]:
        """k uniform positive-pixel samples -> [(x, y), ...], ONE pass.

        The per-point argwhere scan was 16% of the episode-assembly profile
        (each point re-scanned the full-resolution mask); flatnonzero scans
        once per annotation and all k draws index into it."""
        flat = np.flatnonzero(mask)
        idx = flat[self.rng.integers(len(flat), size=k)]
        w = mask.shape[1]
        return [(int(i % w), int(i // w)) for i in idx]

    # -- coordinate frames ---------------------------------------------- #

    def apply_coords(self, coords: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        """Rescale xy coords from the original frame to the input frame
        (reference: transforms.py:159-177)."""
        old_h, old_w = original_size
        if self.custom_preprocess:
            new_h, new_w = get_preprocess_shape(old_h, old_w, self.long_side_length)
        else:
            new_h, new_w = self.long_side_length, self.long_side_length
        coords = np.asarray(coords, np.float64).copy()
        coords[..., 0] *= new_w / old_w
        coords[..., 1] *= new_h / old_h
        return coords

    def apply_boxes(self, boxes: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        boxes = self.apply_coords(np.asarray(boxes).reshape(-1, 2, 2), original_size)
        return boxes.reshape(-1, 4)

    def apply_masks(self, masks: List[np.ndarray]) -> np.ndarray:
        """OR-reduce instance masks, resize (nearest) into the padded input
        frame, then downsample to masks_side_length
        (reference: transforms.py:203-224)."""
        msl = self.masks_side_length
        if len(masks) == 0:
            return np.zeros((msl, msl), np.uint8)
        mask = np.logical_or.reduce(masks).astype(np.uint8)
        img = Image.fromarray(mask)
        if self.custom_preprocess:
            nh, nw = get_preprocess_shape(mask.shape[0], mask.shape[1],
                                          self.long_side_length)
            img = img.resize((nw, nh), Image.NEAREST)
            padded = np.zeros((self.long_side_length, self.long_side_length), np.uint8)
            padded[:nh, :nw] = np.asarray(img)
            img = Image.fromarray(padded)
        img = img.resize((msl, msl), Image.NEAREST)
        return np.asarray(img, np.uint8)
