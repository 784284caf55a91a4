"""Hyperparameter search adapter (reference: label_anything/utils/optuna.py:6-74).

``Optunizer`` turns a grid-config dict into a search space. When the optuna
package is available it drives a TPE study; otherwise it falls back to
random sampling over the same space — the interface (``ask``/``report_result``)
is identical either way.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .config import delinearize, linearize
from .logging import get_logger

logger = get_logger(__name__)

try:
    import optuna  # noqa: F401

    HAS_OPTUNA = True
except ImportError:
    HAS_OPTUNA = False


class Optunizer:
    def __init__(self, base_config: Dict[str, Any], n_trials: int = 20,
                 direction: str = "maximize", seed: int = 0,
                 study_name: str = "labelanything"):
        self.base = base_config
        self.space = linearize(base_config)
        self.n_trials = n_trials
        self.direction = direction
        self.trial_idx = 0
        self.history: List[Dict[str, Any]] = []
        if HAS_OPTUNA:
            self.study = optuna.create_study(direction=direction,
                                             study_name=study_name)
            self._trial = None
        else:
            logger.warning("optuna unavailable: falling back to random search")
            self.rng = np.random.default_rng(seed)

    def ask(self) -> Dict[str, Any]:
        """Sample one configuration from the space."""
        chosen = {}
        if HAS_OPTUNA:
            self._trial = self.study.ask()
            for key, values in self.space:
                name = str(key)
                chosen[key] = (self._trial.suggest_categorical(
                    name, list(range(len(values)))))
                chosen[key] = values[chosen[key]]
        else:
            for key, values in self.space:
                chosen[key] = values[int(self.rng.integers(len(values)))]
        self.trial_idx += 1
        return delinearize(chosen)

    def report_result(self, value: float, config: Optional[dict] = None):
        """(reference: utils/optuna.py report_result)."""
        self.history.append({"trial": self.trial_idx, "value": float(value),
                             "config": config})
        if HAS_OPTUNA and self._trial is not None:
            self.study.tell(self._trial, value)
            self._trial = None

    @property
    def best(self):
        if not self.history:
            return None
        key = (max if self.direction == "maximize" else min)
        return key(self.history, key=lambda h: h["value"])
