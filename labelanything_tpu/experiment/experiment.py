"""Grid-search experiment orchestration
(reference: label_anything/experiment/experiment.py).

A parameter YAML expands (via ``expand_experiment``) into run configs; the
``Experimenter`` executes them sequentially with crash-continue semantics
(reference: experiment.py:247-279 ``continue_with_errors``).
"""

from __future__ import annotations

import pathlib
import traceback
from typing import Any, Dict, Iterable, List, Optional

from ..utils.config import expand_experiment, load_yaml
from ..utils.logging import get_logger
from .run import Run

logger = get_logger(__name__)


class Experimenter:
    def __init__(self, config: Dict[str, Any], out_dir: str = "runs"):
        self.settings = config.get("experiment", {})
        self.config = config
        self.out_dir = pathlib.Path(out_dir)
        self.runs: List[dict] = self.calculate_runs()

    def calculate_runs(self) -> List[dict]:
        return expand_experiment(self.config)

    def execute_runs(self, start_from_run: int = 0):
        continue_with_errors = self.settings.get("continue_with_errors", False)
        start = max(start_from_run, self.settings.get("start_from_run", 0))
        results = []
        for i, run_params in enumerate(self.runs):
            if i < start:
                continue
            run_dir = self.out_dir / f"run{i}"
            logger.info("=== run %d/%d -> %s", i, len(self.runs) - 1, run_dir)
            try:
                run = Run().init(run_params, run_dir=str(run_dir))
                best = run.launch()
                results.append({"run": i, "best": best})
            except Exception as exc:  # noqa: BLE001 - crash-continue semantics
                logger.error("run %d failed: %s", i, exc)
                traceback.print_exc()
                if not continue_with_errors:
                    raise
                results.append({"run": i, "error": str(exc)})
        return results


def experiment(param_path: str, out_dir: str = "runs"):
    """(reference: experiment.py:343-377)."""
    config = load_yaml(param_path)
    return Experimenter(config, out_dir=out_dir).execute_runs()


def run(param_path: str, out_dir: str = "runs"):
    """Execute a single (already flat) run config
    (reference: experiment.py:380-386)."""
    config = load_yaml(param_path)
    params = config.get("parameters", config)
    flat = expand_experiment({"parameters": params})[0]
    return Run().init(flat, run_dir=out_dir).launch()
