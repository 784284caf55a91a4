"""pjit-compiled training / evaluation steps.

One jitted function per (shape-bucket, prompt-modality combo) carries the
whole pass: forward, loss, backward, gradient accumulation and the optimizer
update. The batch is sharded over the mesh's ``data`` axis; parameters are
replicated; XLA inserts the gradient all-reduce over ICI automatically from
the sharding propagation (the TPU-native equivalent of DDP's NCCL allreduce,
reference: experiment/run.py:361 accelerator.backward).

Gradient accumulation over substitution passes reproduces the reference's
``nosync_accumulation`` (experiment/utils.py:252-259): grads accumulate in
the (sharded-consistent) state and the update applies on the final pass.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.losses import LabelAnythingLoss
from ..train.metrics import (binary_confusion_matrix, confusion_matrix,
                             confusion_matrix_per_sample)
from ..typing import BatchKeys, LossDict, ResultDict


class TrainState(NamedTuple):
    params: Any          # {"model": ..., "loss": ...}
    opt_state: Any
    accum: Any           # accumulated grads pytree (zeros when idle)
    step: jax.Array      # optimizer step counter


def init_train_state(params: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        accum=zeros,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model,
    loss_module: LabelAnythingLoss,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    num_classes: Optional[int] = None,
    state_shardings: Optional[Any] = None,
    with_confmat: bool = False,
) -> Callable:
    """Build the jitted train step.

    Returned signature:
      ``train_step(state, batch, gt, rng, loss_scale, apply_update) ->
      (state, aux)`` where ``apply_update`` is static; ``loss_scale`` is the
      reference's 1/loss_normalizer for substitution accumulation.
    """

    def loss_fn(params, batch, gt, rng):
        rngs = {
            "class_rows": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
        }
        result = model.apply(
            params["model"], batch, deterministic=False, rngs=rngs
        )
        loss_out = loss_module.apply(params["loss"], result, gt)
        return loss_out[LossDict.VALUE], (loss_out[LossDict.COMPONENTS], result)

    def step_fn(state: TrainState, batch, gt, rng, loss_scale, *,
                apply_update: bool, use_accum: bool = True):
        # loss_scale and use_accum are STATIC: the scale multiply is elided
        # when 1.0 and the single-pass (no-substitution) step skips the
        # accum-tree read/add/zero entirely — the donated accum buffer
        # passes through untouched (it is already zeros).
        # CAVEAT: every distinct loss_scale float is a separate compile,
        # cached forever. The substitution loop yields one value per
        # n_passes bucket (1/(gts.shape[1]+1) — bounded by the batch
        # schedule's shot counts); do NOT feed a continuously-varying
        # scale (e.g. dynamic loss scaling) through this argument.
        (loss, (components, result)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, gt, rng)
        if loss_scale != 1.0:
            grads = jax.tree.map(lambda g: g * loss_scale, grads)

        if apply_update:
            total = (jax.tree.map(jnp.add, state.accum, grads)
                     if use_accum else grads)
            updates, opt_state = tx.update(total, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params,
                opt_state=opt_state,
                accum=(jax.tree.map(jnp.zeros_like, total)
                       if use_accum else state.accum),
                step=state.step + 1,
            )
        else:
            new_state = state._replace(
                accum=jax.tree.map(jnp.add, state.accum, grads))

        logits = result[ResultDict.LOGITS]
        preds = jnp.argmax(logits, axis=1)
        aux = {
            "loss": loss,
            "components": components,
            "preds": preds,
        }
        if num_classes is not None:
            aux["confmat"] = confusion_matrix(preds, gt, num_classes)
            aux["confmat2"] = binary_confusion_matrix(preds, gt)
        if with_confmat:
            # per-sample episode confmats (C from the logits shape, so each
            # shape bucket compiles its own C — no build-time class count);
            # the host LUT-folds them into the global matrix asynchronously
            aux["confmat_ps"] = confusion_matrix_per_sample(
                preds, gt, logits.shape[1])
            aux.setdefault("confmat2", binary_confusion_matrix(preds, gt))
        return new_state, aux

    if mesh is None:
        jitted = jax.jit(step_fn,
                         static_argnames=("loss_scale", "apply_update",
                                          "use_accum"),
                         donate_argnums=(0,))

        def train_step_local(state, batch, gt, rng, loss_scale, *,
                             apply_update: bool = True,
                             use_accum: bool = True):
            return jitted(state, batch, gt, rng,
                          loss_scale=float(loss_scale),
                          apply_update=apply_update, use_accum=use_accum)

        # raw (unjitted) step for callers that embed it in a larger jitted
        # program (e.g. the bench's single-dispatch fori_loop mode); the
        # jitted handle stays reachable for lower()/cost analysis
        train_step_local.raw = step_fn
        train_step_local.jitted = jitted
        return train_step_local

    # pjit rejects kwargs when in_shardings is given -> one compiled callable
    # per static (apply_update, use_accum, loss_scale) combo, dispatched by
    # a thin wrapper (loss_scale values are few: 1.0 and 1/n_passes).
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # state_shardings (a TrainState-shaped pytree of NamedShardings, see
    # parallel/tp.py) tensor-parallel-shards params/accum/optimizer moments
    # over the mesh's "model" axis; default = fully replicated (pure DP).
    state_sh = state_shardings if state_shardings is not None else repl

    @functools.lru_cache(maxsize=None)
    def make(apply_update: bool, use_accum: bool, loss_scale: float):
        # aux shardings stay UNCONSTRAINED: forcing repl would all-gather the
        # full-resolution preds to every device each step and replicate the
        # per-sample confmats (the host folds LOCAL rows — run.py); XLA keeps
        # preds/confmat_ps data-sharded and scalar reductions replicated.
        return jax.jit(
            functools.partial(step_fn, loss_scale=loss_scale,
                              apply_update=apply_update,
                              use_accum=use_accum),
            donate_argnums=(0,),
            in_shardings=(state_sh, data, data, repl),
            out_shardings=(state_sh, None),
        )

    def train_step(state, batch, gt, rng, loss_scale, *,
                   apply_update: bool = True, use_accum: bool = True):
        fn = make(apply_update, use_accum, float(loss_scale))
        return fn(state, batch, gt, rng)

    return train_step


def make_eval_step(model, num_classes: int, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted eval step returning confusion-matrix contributions."""

    def step_fn(params, batch, gt):
        result = model.apply(params["model"], batch, deterministic=True)
        logits = result[ResultDict.LOGITS]
        preds = jnp.argmax(logits, axis=1)
        return {
            "confmat": confusion_matrix(preds, gt, num_classes),
            "confmat2": binary_confusion_matrix(preds, gt),
            "preds": preds,
        }

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step_fn, in_shardings=(repl, data, data), out_shardings=None)
