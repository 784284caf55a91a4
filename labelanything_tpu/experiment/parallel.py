"""Grid fan-out: render per-run YAMLs and dispatch each grid point as an
independent job (reference: label_anything/experiment/run.py:851-891
``ParallelRun`` — per-run uuid YAML + sbatch submission with shared
out-folder).

The TPU-native redesign replaces SLURM with two backends:

* ``LocalProcessBackend`` — each run is a ``python -m labelanything_tpu.cli
  run`` subprocess; a bounded pool keeps at most ``max_parallel`` alive
  (sensible on a multi-chip host where each job pins one chip via
  ``JAX_VISIBLE_DEVICES``/``TPU_VISIBLE_CHIPS``).
* ``TpuPodBackend`` — each run becomes a ``gcloud compute tpus tpu-vm ssh``
  command against a pod slice from a round-robin pool (the counterpart of
  the reference's sbatch nodes); printed as dry-run templates when gcloud
  is absent, mirroring ``scripts/tpu_jobs.py``.

``only_create`` renders the YAMLs and a ``commands.sh`` without launching —
the reference's ``launch(only_create=True)``.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import time
import uuid
from typing import Any, Dict, List, Optional

import yaml

from ..utils.config import expand_experiment
from ..utils.logging import get_logger

logger = get_logger(__name__)


def listify_leaves(config: Dict[str, Any]) -> Dict[str, Any]:
    """Re-grid-ify a flat run config: wrap every scalar/list leaf in a
    one-element list so the rendered YAML is a valid 1-point grid for the
    ``experiment``/``run`` verbs (``linearize`` requires list leaves)."""
    out: Dict[str, Any] = {}
    for k, v in config.items():
        if isinstance(v, dict):
            out[k] = listify_leaves(v)
        elif v is None:
            out[k] = None
        else:
            out[k] = [v]
    return out


class LocalProcessBackend:
    """Dispatch runs as local subprocesses of this interpreter."""

    def __init__(self, env: Optional[Dict[str, str]] = None):
        self.env = env

    def command(self, param_file: str, out_dir: str, index: int) -> List[str]:
        return [sys.executable, "-m", "labelanything_tpu.cli", "run",
                "--parameters", str(param_file), "--out-dir", str(out_dir)]

    def popen(self, cmd: List[str], out_file: pathlib.Path):
        env = dict(os.environ, **self.env) if self.env else None
        with open(out_file, "wb") as f:
            return subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                                    env=env)


class TpuPodBackend(LocalProcessBackend):
    """Dispatch each run onto a TPU VM from a round-robin pool via gcloud
    ssh (the sbatch-node counterpart). Falls back to printing the command
    when gcloud is unavailable (same dry-run convention as
    ``scripts/tpu_jobs.py``)."""

    def __init__(self, tpu_names: List[str], zone: str = "us-central2-b",
                 workdir: str = "~/labelanything_tpu", **kw):
        super().__init__(**kw)
        if not tpu_names:
            raise ValueError("TpuPodBackend needs at least one TPU VM name")
        self.tpu_names = tpu_names
        self.zone = zone
        self.workdir = workdir

    def command(self, param_file: str, out_dir: str, index: int) -> List[str]:
        name = self.tpu_names[index % len(self.tpu_names)]
        remote = (f"cd {self.workdir} && python -m labelanything_tpu.cli run "
                  f"--parameters {param_file} --out-dir {out_dir}")
        import shutil

        if shutil.which("gcloud") is None:
            return [sys.executable, "-c",
                    "print('[dry-run — gcloud not installed here]\\n  ' + "
                    f"{('gcloud compute tpus tpu-vm ssh ' + name + ' --zone ' + self.zone + ' --worker=all --command ' + remote)!r})"]
        return ["gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
                "--zone", self.zone, "--worker=all", "--command", remote]


class ParallelExperimenter:
    """Render + launch a grid in parallel (reference ``ParallelRun``).

    ``render()`` writes ``<out_dir>/jobs/<uuid>.yaml`` per grid point (flat
    run config re-listified into a 1-point grid) plus ``commands.sh``;
    ``launch()`` submits them through the backend with at most
    ``max_parallel`` concurrent jobs, streaming each job's output to
    ``<uuid>.out`` alongside its YAML.
    """

    def __init__(self, config: Dict[str, Any], out_dir: str = "runs",
                 backend: Optional[LocalProcessBackend] = None,
                 max_parallel: int = 2):
        self.config = config
        self.out_dir = pathlib.Path(out_dir)
        self.backend = backend or LocalProcessBackend()
        self.max_parallel = max(1, max_parallel)
        self.runs: List[dict] = expand_experiment(config)
        self.jobs_dir = self.out_dir / "jobs"

    def render(self) -> List[dict]:
        self.jobs_dir.mkdir(parents=True, exist_ok=True)
        jobs = []
        for i, run_params in enumerate(self.runs):
            run_uuid = uuid.uuid4().hex[:8]
            param_file = self.jobs_dir / f"{run_uuid}.yaml"
            with open(param_file, "w") as f:
                yaml.safe_dump({"parameters": listify_leaves(run_params)}, f)
            run_dir = self.out_dir / f"run{i}_{run_uuid}"
            cmd = self.backend.command(str(param_file), str(run_dir), i)
            jobs.append({"index": i, "uuid": run_uuid,
                         "param_file": param_file, "run_dir": run_dir,
                         "out_file": self.jobs_dir / f"{run_uuid}.out",
                         "command": cmd})
        script = self.jobs_dir / "commands.sh"
        with open(script, "w") as f:
            f.write("#!/bin/sh\n# one line per grid point — rendered by "
                    "ParallelExperimenter\n")
            for j in jobs:
                f.write(" ".join(map(_sh_quote, j["command"])) + "\n")
        script.chmod(0o755)
        logger.info("rendered %d job(s) under %s", len(jobs), self.jobs_dir)
        return jobs

    def launch(self, only_create: bool = False,
               poll_interval: float = 0.2) -> List[dict]:
        jobs = self.render()
        if only_create:
            for j in jobs:
                logger.info("created: %s", " ".join(map(str, j["command"])))
            return jobs
        pending = list(jobs)
        running: List[tuple] = []
        results = []
        while pending or running:
            while pending and len(running) < self.max_parallel:
                job = pending.pop(0)
                logger.info("launching run %d -> %s", job["index"],
                            job["out_file"])
                proc = self.backend.popen(job["command"], job["out_file"])
                running.append((job, proc))
            still = []
            for job, proc in running:
                rc = proc.poll()
                if rc is None:
                    still.append((job, proc))
                else:
                    job["returncode"] = rc
                    results.append(job)
                    (logger.info if rc == 0 else logger.error)(
                        "run %d finished rc=%d", job["index"], rc)
            running = still
            if running:
                time.sleep(poll_interval)
        results.sort(key=lambda j: j["index"])
        return results


def _sh_quote(tok: str) -> str:
    import shlex

    return shlex.quote(str(tok))
