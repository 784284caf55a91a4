#!/usr/bin/env bash
# Pod-scale embedding extraction (reference: slurm/launch_run_multinode +
# slurm embedding-extraction jobs). Shards the image list across TPU-VM
# workers; each worker runs the generate_embeddings CLI over its shard and
# writes safetensors into a shared (GCS-fused or NFS) output directory.
#
# Usage:
#   TPU_NAME=my-pod ZONE=us-central2-b ./launch_embeddings_pod.sh \
#     --encoder vit_b --checkpoint gs://bucket/sam_vit_b.pth \
#     --instances data/coco/annotations/instances_train2014.json \
#     --directory data/coco/train_val_2017 --outfolder /mnt/shared/embeddings
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
ARGS="$*"

N_WORKERS=$(gcloud compute tpus tpu-vm describe "$TPU_NAME" --zone "$ZONE" \
  --format='value(networkEndpoints.length())')

# Each worker processes images where (index % N_WORKERS) == WORKER_ID; the
# CLI reads LA_SHARD_INDEX/LA_SHARD_COUNT to slice its file list.
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/labelanything_tpu && \
    LA_SHARD_INDEX=\$(curl -s -H 'Metadata-Flavor: Google' \
      http://metadata/computeMetadata/v1/instance/attributes/agent-worker-number) \
    LA_SHARD_COUNT=${N_WORKERS} \
    python -m labelanything_tpu.cli generate_embeddings ${ARGS}"
