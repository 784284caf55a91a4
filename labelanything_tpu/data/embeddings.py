"""Embedding-cache helpers shared by the episodic datasets.

A cache file holds either a single ``{"embedding": CxHxW}`` tensor
(reference: preprocess.py:70-73) or a feature pyramid ``{"stageN": CxHxW}``
(reference: preprocess.py:309-322). Pyramid caches flow through the whole
episode pipeline as dicts keyed by stage — collate, sharding, and the
Substitutor treat the embedding leaf as a pytree — and are fused on device
by the model's ``is_pyramids`` neck (models/pyramids.py PyramidLamNeck).
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np

Embedding = Union[np.ndarray, Dict[str, np.ndarray]]


def _channels_last(e: np.ndarray) -> np.ndarray:
    return e.transpose(1, 2, 0) if e.ndim == 3 else e


def embedding_from_file(tensors: Dict[str, np.ndarray]) -> Embedding:
    """Channels-last embedding (or stage dict) from a loaded safetensors
    mapping."""
    if "embedding" in tensors:
        return _channels_last(tensors["embedding"])
    stages = {k: _channels_last(v) for k, v in tensors.items()
              if k.startswith("stage")}
    if not stages:
        raise KeyError(
            "embedding cache has neither 'embedding' nor 'stageN' keys: "
            f"{sorted(tensors)}")
    return stages


def stack_embeddings(embs: List[Embedding]) -> Embedding:
    """Stack per-image embeddings along a new leading axis; pyramid dicts
    stack per stage."""
    if isinstance(embs[0], dict):
        return {k: np.stack([e[k] for e in embs]) for k in embs[0]}
    return np.stack(embs)
