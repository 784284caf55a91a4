"""Checkpoint save/restore via orbax (reference: Accelerate ``save_state``
into ``files/best`` / ``files/latest``, experiment/run.py:299-309 and
logger/wandb.py:935-944).

Layout:
  <dir>/latest/   — rolling checkpoint of the full TrainState
  <dir>/best/     — best checkpoint keyed by the watch metric
Both carry {params, opt_state, step} plus a JSON metadata blob (epoch,
metric value, config hash) for resume.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..parallel.train_step import TrainState


def _barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class CheckpointManager:
    def __init__(self, directory: str, watch_metric: str = "mIoU",
                 higher_is_better: bool = True):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.watch_metric = watch_metric
        self.higher_is_better = higher_is_better
        self._ckpt = ocp.StandardCheckpointer()
        self.best_value: Optional[float] = self._read_meta("best").get("value")

    def _meta_path(self, tag: str) -> pathlib.Path:
        return self.dir / f"{tag}.meta.json"

    def _read_meta(self, tag: str) -> Dict[str, Any]:
        p = self._meta_path(tag)
        return json.loads(p.read_text()) if p.exists() else {}

    def _save(self, tag: str, state: TrainState, meta: Dict[str, Any]):
        """Crash-safe save: write to a temp sibling, then swap in. The old
        checkpoint survives until the new one is fully on disk (a crash
        mid-save must not destroy the only resume point).

        Multi-host: EVERY process must call this with the same state/path —
        orbax writes each process's addressable shards (ZeRO-sharded
        optimizer moments, process-spanning data meshes) into one
        checkpoint on the shared filesystem; the directory swap is then
        performed by process 0 alone behind barriers."""
        import os
        import shutil

        is_main = jax.process_index() == 0
        path = (self.dir / tag).resolve()
        tmp = (self.dir / f"{tag}.tmp").resolve()
        if is_main and tmp.exists():
            shutil.rmtree(tmp)
        _barrier(f"ckpt_pre_{tag}")
        self._ckpt.save(tmp, dict(state._asdict()))
        self._ckpt.wait_until_finished()
        _barrier(f"ckpt_post_{tag}")
        if is_main:
            tmp_meta = self.dir / f"{tag}.meta.json.tmp"
            tmp_meta.write_text(json.dumps(meta))
            if path.exists():
                shutil.rmtree(path)
            os.rename(tmp, path)
            os.replace(tmp_meta, self._meta_path(tag))
        _barrier(f"ckpt_swap_{tag}")

    def save_latest(self, state: TrainState, epoch: int, **meta):
        self._save("latest", state, {"epoch": epoch, **meta})

    def maybe_save_best(self, state: TrainState, epoch: int, value: float, **meta):
        better = (
            self.best_value is None
            or (value > self.best_value) == self.higher_is_better
        )
        if better and value != self.best_value:
            self.best_value = float(value)
            self._save("best", state,
                       {"epoch": epoch, "value": float(value),
                        "metric": self.watch_metric, **meta})
            return True
        return False

    def restore(self, state_template: TrainState, tag: str = "latest"):
        """Restore a TrainState (returns (state, meta) or (None, {}))."""
        import os

        path = (self.dir / tag).resolve()
        tmp = (self.dir / f"{tag}.tmp").resolve()
        if not path.exists() and tmp.exists():
            # crashed between swap steps in _save: the temp save is complete
            if jax.process_index() == 0:
                os.rename(tmp, path)
                tmp_meta = self.dir / f"{tag}.meta.json.tmp"
                if tmp_meta.exists():
                    os.replace(tmp_meta, self._meta_path(tag))
            _barrier(f"ckpt_recover_{tag}")
        if not path.exists():
            return None, {}
        restored = self._ckpt.restore(path, dict(state_template._asdict()))
        return TrainState(**restored), self._read_meta(tag)


def save_params(path: str, params: Any):
    """Save bare model params (for from_pretrained-style distribution)."""
    p = pathlib.Path(path).resolve()
    if p.exists():
        import shutil

        shutil.rmtree(p)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(p, params)
    ckpt.wait_until_finished()


def load_params(path: str, params_template: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(pathlib.Path(path).resolve(), params_template)
