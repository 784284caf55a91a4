"""Tensor-parallel sharding specs (Megatron pattern) over the mesh's
``model`` axis.

The reference has no tensor parallelism (DDP only — reference:
experiment/run.py:122-131); on TPU the ``model`` axis buys headroom for the
large encoders (ViT-L/H MLP weights, 2/3 of the FLOPs) and the 2048-wide
fusion-transformer MLPs. The pattern is the standard Megatron MLP split:

  * column-parallel (output dim sharded):   MLP ``lin1`` (+ its bias)
  * row-parallel (input dim sharded):       MLP ``lin2``

An activation entering the column-parallel matmul is replicated, leaves
sharded on its feature dim, passes through the elementwise nonlinearity
locally, and the row-parallel matmul produces partial sums that XLA reduces
with an all-reduce it inserts from sharding propagation — no explicit
collectives here.

ViT attention is head-sharded separately via shard_map (pass ``tp_mesh``
to the encoder — ViTAttention._tp_attention): the stored qkv kernel keeps
its (3, heads, head_dim)-merged torch-checkpoint layout and is reordered
head-major inside the traced step (GSPMD lowers the reorder to a local
slice of the replicated source), each device runs the fused Pallas
attention kernel on its heads, and the output projection is row-parallel
with one psum. So the STORED attention weights stay replicated here (this
module only assigns specs to stored leaves), while attention compute and
activations are fully model-sharded. Norms, embeddings, rel-pos tables,
and the small per-head prompt/decoder attention projections remain
replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = {"lin1"}   # kernel (in, out): shard out; bias: shard
_ROW = {"lin2"}      # kernel (in, out): shard in; bias replicated


def _path_names(path) -> list:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if key is None and hasattr(entry, "idx"):
            key = str(entry.idx)
        if key is not None:
            names.append(str(key))
    return names


def spec_for_path(path, leaf) -> P:
    """PartitionSpec for one state leaf, keyed by its trailing path names.

    Works uniformly for params, gradient accumulators, and optimizer moment
    trees (optax ``mu``/``nu`` nest the same param subpaths)."""
    names = _path_names(path)
    if len(names) >= 2 and getattr(leaf, "ndim", 0) >= 1:
        mod, name = names[-2], names[-1]
        if mod in _COLUMN:
            if name == "kernel" and leaf.ndim == 2:
                return P(None, "model")
            if name == "bias" and leaf.ndim == 1:
                return P("model")
        if mod in _ROW and name == "kernel" and leaf.ndim == 2:
            return P("model", None)
    return P()


def state_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree mirroring ``tree`` (a TrainState, params tree,
    or optimizer state)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_path(path, leaf)),
        tree,
    )


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """Place ``tree`` on the mesh according to :func:`state_shardings`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for_path(path, leaf))),
        tree,
    )
