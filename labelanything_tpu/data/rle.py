"""Pure-NumPy COCO mask codec (pycocotools is not a dependency).

Implements the COCO compressed-RLE format (LEB128-style with sign-interleaved
deltas) and polygon rasterization, i.e. the subset of ``pycocotools.mask``
the reference relies on (frPyObjects / merge / decode — reference:
data/transforms.py:76-100). Column-major (Fortran) order per the COCO spec.

``decode`` routes through the native C decoder (csrc/larle.c, loaded via
ctypes in data/native.py) when a C compiler built it; this module defines
the behavioural contract and the fallback (parity-tested in
tests/test_data.py::test_native_rle_matches_numpy_codec).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw

RLEObj = Dict[str, Union[str, bytes, List[int], Sequence[int]]]


def _counts_to_array(counts: Union[str, bytes, Sequence[int]]) -> np.ndarray:
    if isinstance(counts, (list, tuple, np.ndarray)):
        return np.asarray(counts, dtype=np.int64)
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    # COCO compressed RLE: 6-bit chunks, LSB-first, bit 5 = continuation,
    # values are zigzag-free but delta-coded against counts[i-2] for i >= 2.
    out: List[int] = []
    pos = 0
    n = len(counts)
    while pos < n:
        x = 0
        k = 0
        more = True
        while more:
            c = counts[pos] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            pos += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(out) > 2:
            x += out[-2]
        out.append(x)
    return np.asarray(out, dtype=np.int64)


def _array_to_counts(arr: Sequence[int]) -> str:
    out = bytearray()
    arr = list(arr)
    for i, x in enumerate(arr):
        if i > 2:
            x -= arr[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return out.decode("ascii")


def decode(rle: RLEObj) -> np.ndarray:
    """Decode an RLE object to a (H, W) uint8 mask."""
    h, w = rle["size"]
    if isinstance(rle["counts"], (str, bytes)):
        from . import native

        fast = native.rle_decode(rle["counts"], int(h), int(w))
        if fast is not None:
            return fast
    counts = _counts_to_array(rle["counts"])
    total = int(counts.sum())
    if total != h * w:
        raise ValueError(f"RLE counts sum {total} != {h}*{w}")
    vals = np.zeros(len(counts), dtype=np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape(w, h).T  # column-major


def encode(mask: np.ndarray) -> RLEObj:
    """Encode a (H, W) binary mask to compressed RLE."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1)
    # run lengths, starting with a zero-run
    changes = np.flatnonzero(np.diff(flat)) + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    if not runs:
        runs = [h * w]
    return {"size": [h, w], "counts": _array_to_counts(runs)}


def merge(rles: List[RLEObj]) -> RLEObj:
    """OR-merge RLEs (reference uses mask_utils.merge for multi-part polygons)."""
    if len(rles) == 1:
        return rles[0]
    mask = np.zeros(tuple(rles[0]["size"]), dtype=np.uint8)
    for r in rles:
        mask |= decode(r)
    return encode(mask)


def poly_to_mask(polygons: List[Sequence[float]], h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygon(s) [x0, y0, x1, y1, ...] to a (H, W) uint8 mask.

    Uses PIL's polygon fill. Boundary pixels can differ by <=1px from
    pycocotools' integer-crossing rasterizer; the reference pipeline is
    insensitive to this (masks are downsampled 4x before use).
    """
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = [(float(poly[i]), float(poly[i + 1])) for i in range(0, len(poly), 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.array(img, dtype=np.uint8)


def ann_to_mask(segm, h: int, w: int) -> np.ndarray:
    """Annotation (polygons / uncompressed RLE / RLE) -> binary mask
    (reference: data/transforms.py:76-100 + 123-149 degenerate fallback)."""
    if isinstance(segm, list):
        mask = poly_to_mask(segm, h, w)
        if not mask.any() and segm and len(segm[0]) >= 2:
            fp_x = min(max(int(segm[0][0]), 0), w - 1)
            fp_y = min(max(int(segm[0][1]), 0), h - 1)
            mask[fp_y, fp_x] = 1
        return mask
    if isinstance(segm.get("counts"), list):
        counts = np.asarray(segm["counts"], dtype=np.int64)
        vals = np.zeros(len(counts), dtype=np.uint8)
        vals[1::2] = 1
        flat = np.repeat(vals, counts)
        mask = flat.reshape(w, h).T
    else:
        mask = decode(segm)
    if not mask.any():
        mask = mask.copy()
        mask[0, 0] = 1
    return mask
