#!/usr/bin/env python3
"""TPU job monitor — the TPU-native counterpart of the reference's SLURM
Streamlit monitor (reference: slurm/slurm.py:10-56 sacct polling).

Subcommands (all thin wrappers over gcloud; printed as dry-run commands when
gcloud is unavailable so the templates stay usable offline):

  list     enumerate TPU VMs / queued resources in a zone with state + health
  describe show one pod's workers, accelerator type and network endpoints
  logs     tail a worker's training log over ssh
  watch    poll `list` on an interval (the sacct-loop equivalent)
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import time


def _run(cmd: list[str]) -> int:
    if shutil.which("gcloud") is None:
        print("[dry-run — gcloud not installed here]\n  " + " ".join(cmd))
        return 0
    return subprocess.call(cmd)


def cmd_list(args) -> int:
    rc = _run(["gcloud", "compute", "tpus", "tpu-vm", "list",
               "--zone", args.zone,
               "--format=table(name,acceleratorType,state,health)"])
    rc |= _run(["gcloud", "compute", "tpus", "queued-resources", "list",
                "--zone", args.zone,
                "--format=table(name,state.state,tpu.nodeSpec[0].node.acceleratorType)"])
    return rc


def cmd_describe(args) -> int:
    return _run(["gcloud", "compute", "tpus", "tpu-vm", "describe", args.name,
                 "--zone", args.zone])


def cmd_logs(args) -> int:
    return _run(["gcloud", "compute", "tpus", "tpu-vm", "ssh", args.name,
                 "--zone", args.zone, f"--worker={args.worker}",
                 "--command", f"tail -n {args.lines} -f {args.path}"])


def cmd_watch(args) -> int:
    while True:
        print(f"--- {time.strftime('%H:%M:%S')} ---")
        cmd_list(args)
        time.sleep(args.interval)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--zone", default="us-central2-b")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    d = sub.add_parser("describe")
    d.add_argument("name")
    lg = sub.add_parser("logs")
    lg.add_argument("name")
    lg.add_argument("--worker", default="0")
    lg.add_argument("--path", default="~/labelanything_tpu/runs/run0/metrics.jsonl")
    lg.add_argument("--lines", type=int, default=50)
    w = sub.add_parser("watch")
    w.add_argument("--interval", type=int, default=30)
    args = ap.parse_args()
    return {"list": cmd_list, "describe": cmd_describe,
            "logs": cmd_logs, "watch": cmd_watch}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
