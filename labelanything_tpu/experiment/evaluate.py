"""Checkpoint-eval harness: the one-command behavioral anchor.

``label-anything-tpu validate --parameters parameters/validation/COCO/mae.yaml
--checkpoint <dir>`` runs the full published protocol — 4 folds (the YAML's
``other_grids``) x the configured ``val_params.reruns`` seed-averaged
evaluations x 1000 episodes per val set — with the checkpoint's weights, and
emits a per-fold mIoU/FB-IoU table plus fold means, optionally diffed against
a reference results JSON (the paper table). Reference counterparts:
released checkpoints + eval configs (reference: README.md:64-71,
parameters/validation/COCO/mae.yaml, experiment/run.py:603-742).

The environment here has no network, so the real anchor number requires a
cached HF snapshot + COCO annotations on disk; the harness itself is
exercised end-to-end on synthetic data (tests/test_evaluate.py) and accepts:

* a ``save_pretrained`` / HF-snapshot directory (config.json + jax params or
  torch ``model.safetensors``/``.bin`` — name-mapped import),
* a training-run checkpoint directory (``<run>/checkpoints`` with
  ``latest``/``best`` orbax states),
* a bare torch weights file (``.pth``/``.bin``/``.safetensors``).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


def _load_model_params(checkpoint: str, run) -> Any:
    """Resolve ``checkpoint`` into a model-param pytree matching
    ``run.model`` (run.state must already be lazy-initialized)."""
    p = pathlib.Path(checkpoint)
    template = run.state.params["model"]

    if p.is_dir() and (p / "config.json").exists():
        from ..api import LabelAnything

        la = LabelAnything.from_pretrained(str(p))
        return la.params
    tag_dirs = [t for t in ("latest", "best") if (p / t).exists()]
    if p.is_dir() and tag_dirs:
        from ..train.checkpoint import CheckpointManager

        restored, _meta = CheckpointManager(str(p)).restore(
            run.state, tag_dirs[0])
        if restored is None:
            raise FileNotFoundError(f"no restorable state under {p}")
        return restored.params["model"]
    if p.is_file():
        from ..utils.torch_import import (convert_state_dict,
                                          load_torch_file, merge_into_params)

        sd = load_torch_file(str(p))
        # template IS the model's full flax variables ({"params": ...});
        # wrapping it in another {"params": ...} double-nested the tree and
        # made every key "missing" (latent until the torch-file branch was
        # first exercised, tests/test_evaluate.py torch-layout test)
        return merge_into_params(template, convert_state_dict(sd))
    if p.is_dir():
        from ..train.checkpoint import load_params

        return load_params(str(p), template)
    raise FileNotFoundError(f"cannot interpret checkpoint {checkpoint!r}")


def _check_tree_match(template, loaded) -> None:
    import jax

    t_paths = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_leaves_with_path(template)}
    l_paths = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_leaves_with_path(loaded)}
    if t_paths != l_paths:
        missing = sorted(t_paths - l_paths)[:5]
        extra = sorted(l_paths - t_paths)[:5]
        raise ValueError(
            f"checkpoint does not match the configured architecture: "
            f"{len(t_paths - l_paths)} missing (e.g. {missing}), "
            f"{len(l_paths - t_paths)} unexpected (e.g. {extra})")


def evaluate_checkpoint(
    parameters: str,
    checkpoint: str,
    out_dir: str = "runs/evaluate",
    folds: Optional[List[int]] = None,
    reruns: Optional[int] = None,
    compare: Optional[str] = None,
) -> Dict[str, Any]:
    """Run the full fold x rerun validation protocol with fixed weights.

    ``folds`` selects grid indexes (the validation YAMLs encode one fold per
    grid via other_grids); ``reruns`` overrides ``val_params.reruns``;
    ``compare`` is a JSON file mapping metric keys (e.g.
    ``"fold0/val_coco20i_N1K1_miou"`` or aggregate ``"mean/miou"``) to
    reference values — deltas are reported per key."""
    import jax

    from ..train.substitutor import Substitutor
    from ..utils.config import expand_experiment, load_yaml
    from .run import Run

    config = load_yaml(parameters)
    flats = expand_experiment(config)
    if folds is not None:
        flats = [flats[i] for i in folds]
    else:
        folds = list(range(len(flats)))

    results: Dict[str, Any] = {}
    per_fold_miou, per_fold_fbiou = [], []
    for fold, flat in zip(folds, flats):
        flat = dict(flat)
        if reruns is not None:
            flat.setdefault("val_params", {})
            flat["val_params"] = dict(flat["val_params"], reruns=reruns)
        run = Run().init(flat, run_dir=f"{out_dir}/fold{fold}")
        try:
            # lazy-init the parameter tree from the first val batch, then
            # substitute the checkpoint weights
            loader = next(iter(run.val_loaders.values()))
            (batch, _gts), _ = next(iter(loader))
            device_batch, _ = run._device_batch(
                batch, example_rows=slice(1, None))
            sub = Substitutor(substitute=False)
            sub.reset(device_batch)
            input_dict, gt = next(sub)
            run._lazy_init(input_dict, gt)
            loaded = _load_model_params(checkpoint, run)
            _check_tree_match(run.state.params["model"], loaded)
            new_params = dict(run.state.params)
            new_params["model"] = jax.tree.map(
                lambda t, l: np.asarray(l, dtype=t.dtype).reshape(t.shape),
                run.state.params["model"], loaded)
            run.state = run.state._replace(params=new_params)
            run._eval_fn = None  # force re-jit against the new params
            metrics = run.validate(epoch=0)
        finally:
            run.close()
        results.update({f"fold{fold}/{k}": v for k, v in metrics.items()})
        if "miou" in metrics:
            per_fold_miou.append(metrics["miou"])
        fb = [v for k, v in metrics.items() if k.endswith("_fbiou")]
        if fb:
            per_fold_fbiou.append(float(np.mean(fb)))
        logger.info("fold %d: %s", fold,
                    {k: round(v, 4) for k, v in metrics.items()})

    if per_fold_miou:
        results["mean/miou"] = float(np.mean(per_fold_miou))
    if per_fold_fbiou:
        results["mean/fbiou"] = float(np.mean(per_fold_fbiou))

    if compare:
        ref = json.loads(pathlib.Path(compare).read_text())
        deltas = {k: results[k] - ref[k] for k in ref if k in results}
        results["deltas_vs_reference"] = deltas
        worst = max((abs(v) for v in deltas.values()), default=0.0)
        results["max_abs_delta"] = worst
        logger.info("max |delta| vs reference table: %.4f", worst)

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(json.dumps(results, indent=2))

    # human-readable fold table
    lines = ["fold  " + "miou".rjust(8) + "fbiou".rjust(9)]
    for fold in folds:
        miou = results.get(f"fold{fold}/miou", float("nan"))
        fb = [v for k, v in results.items()
              if k.startswith(f"fold{fold}/") and k.endswith("_fbiou")]
        lines.append(f"{fold:>4}  {miou:8.4f}{float(np.mean(fb)) if fb else float('nan'):9.4f}")
    if per_fold_miou:
        lines.append(f"mean  {results['mean/miou']:8.4f}"
                     + (f"{results['mean/fbiou']:9.4f}" if per_fold_fbiou
                        else ""))
    logger.info("checkpoint eval table:\n%s", "\n".join(lines))
    return results
