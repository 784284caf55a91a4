"""Benchmark entry point (driver-facing). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Implementations live in labelanything_tpu.benchmarks (shared with the
``label-anything-tpu benchmark`` CLI verb); see that module for the timing
methodology. ``--update-baseline`` records the result into
BENCH_BASELINE.json (kept as fixed round anchors — see its _methodology).
"""

from __future__ import annotations

import argparse
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BENCH_BASELINE.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["vit", "decode", "train", "finetune",
                                       "pipeline"],
                    default="vit")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--encoder", choices=["vit_b", "vit_l", "vit_h"],
                    default=None, help="vit mode only")
    ap.add_argument("--device-loop", action="store_true",
                    help="decode mode: all steps in one jitted fori_loop "
                         "(pure device throughput, no per-step dispatch)")
    ap.add_argument("--no-masks", action="store_true",
                    help="decode/train modes: points/boxes-only episodes "
                         "(the demo/serving common case and the mask-less "
                         "training buckets; engages the rank-1 shared-keys "
                         "fusion fast path)")
    ap.add_argument("--tp", action="store_true",
                    help="vit mode: head-sharded shard_map attention path")
    ap.add_argument("--pipeline", action="store_true",
                    help="train mode: drive the ACTUAL Run.train_epoch over "
                         "a device-resident synthetic stream (proves the "
                         "train loop adds no host sync stalls vs "
                         "--device-loop)")
    ap.add_argument("--images-path", action="store_true",
                    help="train mode: alias for --mode pipeline (host loader"
                         " -> device step, reports device_busy/loader_wait)")
    ap.add_argument("--probe-chunk", action="store_true",
                    help="with --mode train --pipeline: time the on-device "
                         "chunk program ALONE (same dispatch + per-step "
                         "metric folds, no orchestration) — decomposes the "
                         "pipeline-vs-device-loop residual")
    ap.add_argument("--probe-host", nargs="?", const=1, default=0, type=int,
                    help="with --mode train --pipeline: no-op the chunk "
                         "dispatch and time the pure host orchestration loop;"
                         " level 2 also no-ops the device stack (pure Python"
                         " bookkeeping)")
    ap.add_argument("--workers", type=int, default=None,
                    help="pipeline mode: host loader workers")
    ap.add_argument("--thread-loader", action="store_true",
                    help="pipeline mode: thread loader instead of processes")
    ap.add_argument("--remat", choices=["full", "attn", "dots", "none"],
                    default=None,
                    help="finetune mode: encoder rematerialization policy "
                         "(default full; see models/image_encoder.py)")
    ap.add_argument("--no-remat", action="store_true",
                    help="finetune mode: alias for --remat none")
    ap.add_argument("--gradcheck", action="store_true",
                    help="finetune mode: instead of timing, compare the "
                         "compiled fused Pallas attention backward against "
                         "the XLA recompute-VJP at production shapes on this "
                         "chip and report the max abs diff per gradient leaf")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    from labelanything_tpu.benchmarks import (bench_decode, bench_finetune,
                                              bench_gradcheck, bench_pipeline,
                                              bench_train,
                                              bench_train_pipeline, bench_vit)

    if args.gradcheck:
        result = bench_gradcheck()
        result["vs_baseline"] = 1.0
        print(json.dumps(result))
        return

    if args.images_path and args.mode == "train":
        args.mode = "pipeline"
    if args.pipeline and args.mode == "train":
        args.mode = "train_pipeline"
    kw = {} if args.mode == "pipeline" else {"reps": args.reps}
    if args.batch:
        kw["batch_size"] = args.batch
    if args.steps:
        kw["steps"] = args.steps
    if args.encoder and args.mode == "vit":
        kw["encoder"] = args.encoder
    if args.tp and args.mode == "vit":
        kw["tp"] = True
    if args.device_loop and args.mode in ("decode", "train"):
        kw["device_loop"] = True
    if args.no_masks and args.mode in ("decode", "train", "train_pipeline",
                                       "finetune"):
        kw["include_masks"] = False
    if args.mode == "finetune":
        if args.no_remat:
            kw["encoder_remat"] = "none"
        elif args.remat:
            kw["encoder_remat"] = args.remat
    if args.probe_chunk and args.mode == "train_pipeline":
        kw["probe_chunk"] = True
    if args.probe_host and args.mode == "train_pipeline":
        kw["probe_host"] = args.probe_host
    if args.mode == "pipeline":
        if args.workers:
            kw["num_workers"] = args.workers
        if args.thread_loader:
            kw["use_processes"] = False
    fns = {"vit": bench_vit, "decode": bench_decode, "train": bench_train,
           "finetune": bench_finetune, "pipeline": bench_pipeline,
           "train_pipeline": bench_train_pipeline}
    result = fns[args.mode](**kw)

    baselines = {}
    if BASELINE_FILE.exists():
        baselines = json.loads(BASELINE_FILE.read_text())
    base = baselines.get(result["metric"])
    result["vs_baseline"] = round(result["value"] / base, 3) if base else 1.0

    if args.update_baseline:
        baselines[result["metric"]] = result["value"]
        BASELINE_FILE.write_text(json.dumps(baselines, indent=2))

    print(json.dumps(result))


if __name__ == "__main__":
    main()
