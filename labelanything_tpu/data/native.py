"""ctypes loader for the native RLE/polygon kernels (csrc/larle.c).

Compiles the shared object on first use with the system C compiler and falls
back silently to the pure-NumPy implementations in :mod:`.rle` when no
compiler is available. ``data/rle.py`` stays the behavioural contract; this
is the fast path for the episode-assembly hot loop.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = pathlib.Path(__file__).resolve().parent.parent / "csrc" / "larle.c"


def _build() -> Optional[ctypes.CDLL]:
    cache_dir = pathlib.Path(
        os.environ.get("LABELANYTHING_CACHE",
                       os.path.join(tempfile.gettempdir(), "labelanything_tpu")))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / "larle.so"
    if not so_path.exists() or so_path.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = ["cc", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(str(so_path))
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                               ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)]
    lib.poly_fill.restype = None
    lib.poly_fill.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                              ctypes.c_long, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_uint8)]
    lib.or_reduce.restype = None
    lib.or_reduce.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                              ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)]
    lib.label_fill.restype = None
    lib.label_fill.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                               ctypes.c_int32,
                               ctypes.POINTER(ctypes.c_int32)]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def rle_decode(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    raw = counts.encode("ascii") if isinstance(counts, str) else counts
    rc = lib.rle_decode(
        raw, len(raw), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def label_fill(mask: np.ndarray, out: np.ndarray, value: int) -> bool:
    """out[mask != 0] = value in one native pass; both arrays must be
    C-contiguous with matching shapes ((H, W) uint8 mask, int32 out).
    Returns False when the native lib is unavailable (caller falls back
    to the numpy fancy-index write)."""
    lib = get_lib()
    if (lib is None or mask.shape != out.shape
            or not mask.flags.c_contiguous
            or not out.flags.c_contiguous or mask.dtype != np.uint8
            or out.dtype != np.int32):
        return False
    lib.label_fill(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   mask.size, value,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return True


def or_reduce(masks: Sequence[np.ndarray]) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or not len(masks):
        return None
    stack = np.ascontiguousarray(np.stack(masks).astype(np.uint8))
    n, h, w = stack.shape
    out = np.zeros((h, w), np.uint8)
    lib.or_reduce(stack.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  n, h * w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
