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


def gt_to_input_frame(gt: np.ndarray, long_side: int,
                      custom: bool = True) -> np.ndarray:
    """Nearest-resize an int GT map into the padded input frame with
    IGNORE_INDEX fill — one NumPy gather using PIL's own index maps
    (bit-exact with the mode-"I" PIL round-trip it replaces). Shared by the
    COCO, Pascal and cross-domain datasets."""
    from ..typing import IGNORE_INDEX

    h, w = gt.shape
    s = long_side
    nh, nw = get_preprocess_shape(h, w, s) if custom else (s, s)
    out = np.full((s, s), IGNORE_INDEX, np.int32)
    if (nh, nw) == (h, w):  # identity resize: the maps are arange
        out[:nh, :nw] = gt
    else:
        out[:nh, :nw] = gt[np.ix_(nearest_index_map(h, nh),
                                  nearest_index_map(w, nw))]
    return out


_NEAREST_MAP_CACHE: dict = {}


def nearest_index_map(n_src: int, n_dst: int) -> np.ndarray:
    """The source index PIL's NEAREST resize samples for each destination
    position along one axis, obtained by resizing an index ramp through PIL
    itself — bit-exact with ``Image.resize(..., Image.NEAREST)`` by
    construction (nearest is separable, verified in
    tests/test_data.py::test_nearest_gather_matches_pil). Cached per
    (n_src, n_dst); lets the mask/GT hot loop replace PIL round-trips with
    one NumPy gather."""
    key = (n_src, n_dst)
    m = _NEAREST_MAP_CACHE.get(key)
    if m is None:
        ramp = np.arange(n_src, dtype=np.int32)[None, :]
        img = Image.fromarray(ramp, mode="I").resize((n_dst, 1), Image.NEAREST)
        m = np.asarray(img, np.int64)[0]
        _NEAREST_MAP_CACHE[key] = m
    return m


class CustomResize:
    """Long-side resize preserving aspect ratio (reference: transforms.py:14-24)."""

    def __init__(self, long_side_length: int = 1024):
        self.long_side_length = long_side_length

    def __call__(self, image: Image.Image) -> Image.Image:
        w, h = image.size
        nh, nw = get_preprocess_shape(h, w, self.long_side_length)
        if (nw, nh) == (w, h):
            # identity resize: PIL's bilinear at scale 1 is a single-tap
            # filter with weight 1.0, i.e. bit-lossless — skip the resample
            # (images whose long side already equals the target hit this)
            return image
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
                     normalize: bool = True,
                     out: Optional[np.ndarray] = None,
                     ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Full pipeline: long-side resize -> normalize -> pad. Returns the
    padded (S, S, 3) array and the original (H, W).

    ``normalize=False`` is the uint8 ingest path: resize + bottom-right pad
    only, returning (S, S, 3) uint8 — 4x fewer host->device bytes and no
    fp32 passes on the loader workers; the model then normalizes on device
    (ops/image_norm.py), bit-matching CustomNormalize incl. the zero pad in
    the normalized frame (reference: data/transforms.py:27-46).

    ``out`` (uint8 path only): a zeroed (S, S, 3) uint8 view to write into
    — lets the episode assembler fill a preallocated (N, S, S, 3) batch
    buffer directly instead of stacking per-image copies."""
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
        if out is None:
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
        (reference: transforms.py:203-224).

        The two nearest resizes + the long_side**2 intermediate pad are
        composed into ONE msl**2 NumPy gather: nearest resize is a pure
        per-axis index gather, so resize(pad(resize(m))) == m[rows][:, cols]
        with the index maps composed through PIL's own mapping
        (nearest_index_map) and pad positions masked to 0. Bit-exact with
        the old PIL chain (tests/test_data.py::test_apply_masks_gather
        _matches_pil); removed two full-frame allocations + three PIL
        round-trips per (image, class) from the episode hot loop."""
        msl = self.masks_side_length
        if len(masks) == 0:
            return np.zeros((msl, msl), np.uint8)
        first = np.asarray(masks[0])
        h, w = first.shape
        s = self.long_side_length
        if self.custom_preprocess:
            nh, nw = get_preprocess_shape(h, w, s)
            r2 = nearest_index_map(s, msl)
            c2 = r2  # the padded frame is square
            valid = (r2 < nh)[:, None] & (c2 < nw)[None, :]
            rows = nearest_index_map(h, nh)[np.minimum(r2, nh - 1)]
            cols = nearest_index_map(w, nw)[np.minimum(c2, nw - 1)]
        else:
            # the PIL chain resizes full-res -> msl directly in this mode
            valid = None
            rows = nearest_index_map(h, msl)
            cols = nearest_index_map(w, msl)
        # gather each instance at msl**2 BEFORE the OR (pointwise OR
        # commutes with the gather): the OR never touches full resolution,
        # so the (n, H, W) logical_or.reduce stack disappears too
        ix = np.ix_(rows, cols)
        acc = first[ix] != 0
        for m in masks[1:]:
            acc |= np.asarray(m)[ix] != 0
        out = acc.astype(np.uint8)
        if valid is not None:
            out[~valid] = 0
        return out

    def apply_masks_pil(self, masks: List[np.ndarray]) -> np.ndarray:
        """The original PIL chain — kept as the behavioural contract the
        gather fast path is parity-tested against."""
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
