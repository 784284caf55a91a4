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
    num_slices: Optional[int] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    DCN-aware (multi-slice pods): devices are grouped by ``slice_index``
    (slices talk over DCN, not ICI) and laid out SLICE-MAJOR along the data
    axis, each slice internally ordered by ``mesh_utils.create_device_mesh``
    for ICI-torus contiguity. Consequences: the model axis never crosses a
    slice boundary (tensor-parallel collectives ride ICI only), and the
    data-axis gradient reduction decomposes into per-slice ICI phases plus
    one DCN exchange — the "data outer over DCN" recipe (SURVEY.md §6;
    scaling-book). Single-slice topologies get the same ICI-aware ordering;
    axis names and every caller's shardings are unchanged either way.

    ``num_slices`` forces a simulated slice decomposition when the backend
    reports none (virtual CPU devices in the dryrun/tests): the device list
    is split sequentially into that many equal "slices".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")

    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", None) or 0, []).append(d)
    slices = [groups[k] for k in sorted(groups)]
    if num_slices is not None and len(slices) == 1 and num_slices > 1:
        if n % num_slices:
            raise ValueError(f"{n} devices across {num_slices} slices")
        per = n // num_slices
        slices = [devices[i * per:(i + 1) * per] for i in range(num_slices)]
    elif num_slices is not None and num_slices != len(slices):
        # a forced decomposition that disagrees with the backend's real
        # slice topology would silently produce a DIFFERENT layout than the
        # caller asked for (advisor r4) — refuse instead
        raise ValueError(
            f"num_slices={num_slices} but the backend reports "
            f"{len(slices)} slice(s); forcing a simulated decomposition is "
            f"only valid when the backend reports exactly one slice")
    per = len(slices[0])
    if any(len(s) != per for s in slices):
        raise ValueError("unequal slice sizes: " +
                         str([len(s) for s in slices]))
    if per % model or data % len(slices):
        raise ValueError(
            f"mesh {data}x{model} cannot nest in {len(slices)} slices of "
            f"{per} devices: model must divide the slice, data the slice "
            f"count")

    def order(group):
        try:  # ICI-topology-aware ordering within one slice
            from jax.experimental import mesh_utils

            return mesh_utils.create_device_mesh(
                (per // model, model), devices=group,
                allow_split_physical_axes=True)
        except Exception:  # virtual/CPU devices: plain reshape
            return np.asarray(group).reshape(per // model, model)

    arr = np.concatenate([order(s) for s in slices], axis=0)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree on the mesh, batch-axis sharded.

    Single process: a plain sharded ``device_put`` (a no-op for leaves
    already placed with this sharding, e.g. the bench's device-resident
    stream). Multi-host (``jax.process_count() > 1``): each process holds
    only ITS shard of the global batch (the loader slices the sampler's
    rank-replicated schedule by process — data/loader.py), so the global
    array is assembled with ``jax.make_array_from_process_local_data`` —
    the TPU-pod counterpart of the reference feeding each DDP rank its own
    DataLoader shard (reference: slurm/launch_run_multinode_exe:11-20)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        # ONE device_put over the whole tree: leaf-by-leaf puts each pay a
        # host round trip (~2.7 ms over a tunneled link; ~25 leaves/batch),
        # the batched form issues a single transfer for all host leaves and
        # no-ops the already-placed ones
        return jax.device_put(batch, sh)

    def place(x):
        if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
            return jax.device_put(x, sh)  # already global
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(place, batch)


def local_shard(aux: Any) -> Any:
    """Host view of this process's addressable rows of a batch-sharded
    device array (metric fetch under multi-host: each process LUT-folds its
    own rows, then ``allreduce_host`` sums the folded matrices)."""
    def fetch(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_addressable or x.sharding.is_fully_replicated:
            # single-process, or a replicated result (any replica is global)
            return np.asarray(x)
        shards = {}
        for s in x.addressable_shards:  # dedupe row-replicas by start index
            shards[s.index[0].start or 0] = s
        return np.concatenate(
            [np.asarray(shards[k].data) for k in sorted(shards)], axis=0)

    return jax.tree.map(fetch, aux)


def allreduce_host(x: "np.ndarray") -> "np.ndarray":
    """Sum a small host array across processes (epoch-end metric reduction;
    the reference's accelerator.gather, experiment/run.py:387). No-op in a
    single-process world.

    Integer inputs (confusion matrices — int64 pixel counts that overflow
    fp32's 2^24 exact-integer range) cross the device collective as two
    fp32 halves (hi = x >> 24, lo = x & (2^24-1)), each exactly
    representable, and are recombined in int64 on the host — TPUs have no
    x64, so a direct int64/f64 allgather would silently truncate."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.integer):
        hi, lo = np.divmod(x.astype(np.int64), np.int64(1 << 24))
        parts = multihost_utils.process_allgather(
            np.stack([hi, lo]).astype(np.float32))
        s = np.asarray(parts).astype(np.int64).sum(axis=0)  # over processes
        return (s[0] << 24) + s[1]
    return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)
