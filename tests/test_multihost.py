"""Multi-HOST execution tests.

Two layers:

1. In-process unit tests of the loader's process slicing — every host runs
   the same sampler schedule, each assembles only its local devices' rank
   slots (data/loader.py), and the union reconstructs the global batch.

2. A REAL 2-process ``jax.distributed`` integration test: two spawned CPU
   processes (2 virtual devices each -> a 4-device global mesh) each feed
   their own per-host shard through ``shard_batch``
   (``jax.make_array_from_process_local_data``), train steps with XLA
   cross-process gradient reduction, LUT-fold their local confmat rows,
   ``allreduce_host`` the folded matrices, and orbax-save/restore the train
   state through the process-safe CheckpointManager. The reference's
   counterpart is Accelerate multi-node DDP with c10d rendezvous
   (reference: slurm/launch_run_multinode_exe:11-20).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest


# --------------------------------------------------------------------- #
# 1. loader process slicing (in-process)
# --------------------------------------------------------------------- #

class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _make_sampler(n=64, num_processes=4, seed=0):
    from labelanything_tpu.data.dataset import VariableBatchSampler

    return VariableBatchSampler(
        _RangeDataset(n), possible_batch_example_nums=[[2, 2, 1], [4, 2, 2]],
        num_processes=num_processes, seed=seed)


def test_loader_process_slices_partition_the_group():
    from labelanything_tpu.data.loader import EpisodeLoader

    full = [g for g in EpisodeLoader(
        _RangeDataset(64), _make_sampler(), num_workers=1,
        group_size=4)._groups()]
    shards = [[g for g in EpisodeLoader(
        _RangeDataset(64), _make_sampler(), num_workers=1, group_size=4,
        process_index=p, process_count=2)._groups()] for p in (0, 1)]
    assert len(shards[0]) == len(shards[1]) == len(full)
    for g_full, g0, g1 in zip(full, *shards):
        assert g0 + g1 == g_full          # ordered partition
        assert len(g0) == len(g1)         # even rank split


def test_loader_process_count_must_divide_group():
    from labelanything_tpu.data.loader import EpisodeLoader

    with pytest.raises(ValueError):
        EpisodeLoader(_RangeDataset(8), _make_sampler(num_processes=3),
                      num_workers=1, group_size=3, process_count=2)


def test_create_mesh_hybrid_slice_major():
    """DCN-aware layout (parallel/mesh.py): with a (simulated) 2-slice
    topology the data axis is SLICE-MAJOR and the model axis never crosses
    a slice boundary — the 'data outer over DCN' recipe (SURVEY.md §6)."""
    import jax

    from labelanything_tpu.parallel.mesh import create_mesh

    devs = jax.devices()[:8]
    halves = [set(devs[:4]), set(devs[4:])]

    mesh = create_mesh(data=4, model=2, devices=devs, num_slices=2)
    assert mesh.devices.shape == (4, 2)
    for row in range(4):
        half = halves[row // 2]           # slice-major along data
        assert set(mesh.devices[row]) <= half  # model row within one slice

    # pure-dp: first half of the data axis is slice 0
    mesh = create_mesh(data=8, model=1, devices=devs, num_slices=2)
    assert set(mesh.devices[:4].ravel()) == halves[0]
    assert set(mesh.devices[4:].ravel()) == halves[1]


def test_create_mesh_hybrid_rejects_bad_nesting():
    import jax
    import pytest as _pytest

    from labelanything_tpu.parallel.mesh import create_mesh

    devs = jax.devices()[:8]
    with _pytest.raises(ValueError):
        create_mesh(data=8, model=1, devices=devs, num_slices=3)
    with _pytest.raises(ValueError):  # model=8 cannot fit a 4-device slice
        create_mesh(data=1, model=8, devices=devs, num_slices=2)


def test_updates_per_epoch_counts_substitution_passes():
    from labelanything_tpu.data.loader import EpisodeLoader
    from labelanything_tpu.typing import BatchMetadataKeys as K

    loader = EpisodeLoader(_RangeDataset(64), _make_sampler(), num_workers=1,
                           group_size=4)
    n_groups = len(loader)
    examples = loader.batch_sampler.batch_metadata[K.NUM_EXAMPLES]
    expected = sum((m or 1) + 1 for m in examples[::4][:n_groups])
    assert loader.updates_per_epoch(substitute=True) == expected
    assert loader.updates_per_epoch(substitute=False) == n_groups
    assert loader.updates_per_epoch(substitute=True,
                                    accumulate=True) == n_groups


# --------------------------------------------------------------------- #
# 2. two real jax.distributed processes
# --------------------------------------------------------------------- #

_WORKER = r"""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax
import jax._src.xla_bridge as _xb

if jax.config.jax_platforms != "cpu":
    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")

pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import jax.numpy as jnp
import numpy as np

from labelanything_tpu.data.synthetic import random_full_batch
from labelanything_tpu.experiment.run import fold_global_confusion, to_global_lut
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.parallel.mesh import (allreduce_host, create_mesh,
                                             local_shard, shard_batch)
from labelanything_tpu.parallel.train_step import (init_train_state,
                                                   make_train_step)
from labelanything_tpu.train.checkpoint import CheckpointManager
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.train.substitutor import Substitutor
from labelanything_tpu.typing import BatchKeys, ResultDict

C, S, D = 3, 32, 16
mesh = create_mesh()                      # (4, 1) over both processes
assert mesh.devices.size == 4

# per-HOST feeding: each process builds only ITS two rows of the global
# 4-row batch (distinct seeds -> distinct data per host)
local = random_full_batch(batch_size=2, num_examples=1, num_classes=C,
                          image_size=S, embed_dim=D, seed=100 + pid)
device_batch = shard_batch(local, mesh)   # make_array_from_process_local_data
for k, v in device_batch.items():
    assert v.shape[0] == 4, (k, v.shape)  # global leading axis

sub = Substitutor(substitute=False)
sub.reset(device_batch)
batch, gt = next(sub)

model = build_lam_no_vit(image_embed_dim=D, embed_dim=16, image_size=S,
                         class_encoder={"name": "RandomMatrixEncoder",
                                        "bank_size": 8})
loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
params = {
    "model": jax.jit(model.init)(jax.random.key(0), batch),
    "loss": loss.init(jax.random.key(1), {
        ResultDict.LOGITS: jnp.zeros((4, C, S, S)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((4, 1, C, 16)),
        BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
    }, gt),
}
tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)
state = init_train_state(params, tx)
step = make_train_step(model, loss, tx, mesh=mesh, with_confmat=True)

for i in range(2):
    state, aux = step(state, batch, gt, jax.random.key(i), 1.0,
                      apply_update=True, use_accum=False)
loss_val = float(aux["loss"])             # replicated scalar: fetchable
assert np.isfinite(loss_val), loss_val

# local metric rows -> LUT fold -> host allreduce
cm_local = local_shard(aux["confmat_ps"])
assert cm_local.shape == (2, C, C), cm_local.shape
classes = [[[1, 2]] * 2] * 2
categories = {1: {}, 2: {}}
lut = to_global_lut(classes, categories, C)
cm = fold_global_confusion(np.zeros((3, 3), np.int64), cm_local, lut, 3)
cm_global = allreduce_host(cm)
# both processes must agree on the reduced matrix and it must cover the
# full 4-sample global batch (every non-ignored pixel counted once)
valid_pixels = 4 * S * int(S * 0.9)
assert cm_global.sum() == valid_pixels, (cm_global.sum(), valid_pixels)

# process-safe orbax save / restore
ckpt = CheckpointManager(os.path.join(workdir, "ckpt"))
ckpt.save_latest(state, epoch=3)
restored, meta = ckpt.restore(state)
assert restored is not None and int(meta["epoch"]) == 3
np.testing.assert_array_equal(np.asarray(restored.step),
                              np.asarray(jax.device_get(state.step)))

print(f"WORKER_{pid}_OK", flush=True)
"""


def test_two_process_distributed_training(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    # children must select the CPU platform themselves (the script does);
    # scrub any pytest-level platform forcing so they start clean
    env.pop("JAX_PLATFORMS", None)
    # make the repo importable from the /tmp script; APPEND to PYTHONPATH —
    # clobbering it would drop the image's sitecustomize path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH"), repo_root) if p)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for p in (0, 1)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    assert "WORKER_0_OK" in outs[0] and "WORKER_1_OK" in outs[1]
