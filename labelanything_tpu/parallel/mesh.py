"""Device mesh and sharding helpers.

The reference scales with Accelerate DDP over NCCL (reference:
experiment/run.py:122-131, slurm/launch_run_multinode_exe:11-20). The TPU
equivalent is a jax.sharding.Mesh whose ``data`` axis spans ICI (and DCN
across slices); gradients are reduced by XLA-inserted collectives during the
jit-compiled train step — no explicit allreduce calls anywhere.

A ``model`` axis is provisioned for tensor-parallel sharding of the ViT-H
encoder; LAM decoders are small (256-dim) and stay replicated.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree on the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
