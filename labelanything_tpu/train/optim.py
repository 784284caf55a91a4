"""Optimizer / scheduler construction (reference: experiment/utils.py:53-100
and models/lam.py:321-347 backbone lr groups).

optax-based. Non-trainable buffers (the random-Fourier PE Gaussian matrix)
live in ``params`` for uniform checkpointing and are frozen with a mask here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax

FROZEN_PARAM_NAMES = ("positional_encoding_gaussian_matrix",)


def _path_contains(path, names) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return any(n in keys for n in names)


def frozen_mask(params) -> Any:
    """True where the parameter must NOT be updated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_contains(path, FROZEN_PARAM_NAMES), params
    )


def backbone_mask(params) -> Any:
    """True for image-encoder parameters (reference: lam.py:321-347)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_contains(path, ("image_encoder",)), params
    )


def build_scheduler(
    name: str = "constant_with_warmup",
    learning_rate: float = 5e-5,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    **kwargs,
) -> optax.Schedule:
    """HF-style schedules (reference: experiment/utils.py:77-100 uses
    transformers.get_scheduler)."""
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(num_warmup_steps, 1)),
                optax.constant_schedule(learning_rate),
            ],
            [max(num_warmup_steps, 1)],
        )
    if name == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(num_warmup_steps, 1)),
                optax.linear_schedule(
                    learning_rate, 0.0,
                    max((num_training_steps or 1) - num_warmup_steps, 1),
                ),
            ],
            [max(num_warmup_steps, 1)],
        )
    if name == "cosine":
        # optax takes TOTAL steps; keep decay_steps (total - warmup) positive
        # even when the step count is not yet known (dry builds)
        warmup = max(num_warmup_steps, 1)
        total = max(num_training_steps or 0, warmup + 1)
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, total)
    raise ValueError(f"Unknown scheduler {name!r}")


def build_optimizer(
    params,
    name: str = "AdamW",
    learning_rate: float = 5e-5,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    backbone_lr: Optional[float] = None,
    scheduler: Optional[Dict[str, Any]] = None,
    freeze_backbone: bool = False,
    schedule_div: int = 1,
) -> optax.GradientTransformation:
    """(reference: experiment/utils.py:53-74).

    ``schedule_div`` implements the reference's scheduler ``step_moment``:
    'epoch' configs advance the schedule once per epoch (the reference calls
    scheduler.step() per epoch, experiment/utils.py:77-100) — pass
    steps_per_epoch here so the optax schedule sees ``step // div``."""
    sched_cfg = dict(scheduler or {"name": "constant"})
    sched_cfg.setdefault("learning_rate", learning_rate)
    base_schedule = build_scheduler(**sched_cfg)
    if schedule_div > 1:
        schedule = lambda step: base_schedule(step // schedule_div)
    else:
        schedule = base_schedule

    def make(lr_scale: float):
        if name.lower() == "adamw":
            core = optax.adamw(
                lambda step: schedule(step) * lr_scale, weight_decay=weight_decay
            )
        elif name.lower() == "sgd":
            # torch-SGD L2 semantics: decay enters the (momentum) update
            # BEFORE the lr scale — d_p = grad + wd*p (torch sgd docs) — so
            # the effective decay tracks the schedule, unlike decoupled
            # decay appended after the transform.
            core = optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.sgd(lambda step: schedule(step) * lr_scale, momentum=momentum),
            )
        else:
            raise ValueError(f"Unknown optimizer {name!r}")
        return core

    labels = {}

    def label_fn(params):
        fmask = frozen_mask(params)
        bmask = backbone_mask(params)

        def pick(frozen, backbone):
            if frozen:
                return "frozen"
            if backbone and (freeze_backbone or backbone_lr is not None):
                return "frozen" if freeze_backbone else "backbone"
            return "main"

        return jax.tree.map(pick, fmask, bmask)

    transforms = {
        "main": make(1.0),
        "frozen": optax.set_to_zero(),
        "backbone": make((backbone_lr or learning_rate) / learning_rate),
    }
    return optax.multi_transform(transforms, label_fn)
