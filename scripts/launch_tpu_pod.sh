#!/usr/bin/env bash
# Multi-host TPU pod launcher — the TPU-native counterpart of the reference's
# SLURM templates (reference: slurm/launch_run_multinode:1-30 and
# launch_run_multinode_exe:11-20, which rendezvous accelerate/NCCL via c10d).
#
# On Cloud TPU pods there is no rendezvous to configure: jax.distributed
# discovers the slice topology from the TPU metadata; every host runs the
# SAME command and pjit shards the global batch over all chips (ICI within a
# slice, DCN across slices). Usage:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all -- \
#       "cd labelanything-tpu && bash scripts/launch_tpu_pod.sh \
#            parameters/trainval/coco20i/mae.yaml runs/pod0"
set -euo pipefail

PARAMS="${1:?usage: launch_tpu_pod.sh <parameters.yaml> [out_dir]}"
OUT_DIR="${2:-runs/pod}"

# jax.distributed.initialize() is called by the runtime when these are set;
# on Cloud TPU VMs they are auto-populated by the libtpu runtime.
export JAX_PLATFORMS=tpu

python - <<PY
import jax

# Multi-host init: a no-op on single-host; on pods this wires all hosts into
# one jax.distributed world so jax.devices() spans the whole slice.
try:
    jax.distributed.initialize()
except Exception as exc:  # single-host dev box
    print(f"jax.distributed.initialize skipped: {exc}")
print(f"process {jax.process_index()}/{jax.process_count()}: "
      f"{jax.local_device_count()} local / {jax.device_count()} global chips")

from labelanything_tpu.experiment import experiment

experiment("${PARAMS}", out_dir="${OUT_DIR}")
PY
