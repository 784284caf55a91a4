"""Prompt-encoder CLIP-contrastive pretraining
(reference: label_anything/experiment/pretraining.py:26-145 and
utils/early_stopping.py:57-92).

One jitted train step optimizes the ContrastivePromptEncoder with the
symmetric CLIP loss; validation loss drives ReduceLROnPlateau-style decay and
parallel early stopping with best-state checkpointing.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.contrastive_pe import ContrastivePromptEncoder
from ..typing import BatchKeys
from ..utils.logging import get_logger
from .losses import symmetric_loss

logger = get_logger(__name__)


class EarlyStopping:
    """(reference: utils/early_stopping.py:57-92)."""

    def __init__(self, patience: int = 7, delta: float = 0.0,
                 verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.verbose = verbose
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.best_params = None

    def __call__(self, val_loss: float, params) -> None:
        score = -val_loss
        if self.best_score is None or score >= self.best_score + self.delta:
            self.best_score = score
            self.best_params = jax.tree.map(jnp.copy, params)
            self.counter = 0
        else:
            self.counter += 1
            if self.verbose:
                logger.info("EarlyStopping %d/%d", self.counter, self.patience)
            if self.counter >= self.patience:
                self.early_stop = True


def pretrain_prompt_encoder(
    model: ContrastivePromptEncoder,
    train_batches: Callable[[], "iter"],
    val_batches: Callable[[], "iter"],
    num_epochs: int = 100,
    learning_rate: float = 1e-4,
    patience: int = 7,
    plateau_factor: float = 0.5,
    plateau_patience: int = 3,
    seed: int = 0,
    temperature: float = 1.0,
):
    """Train loop; ``train_batches``/``val_batches`` are callables returning
    fresh iterators of device-ready batch dicts per epoch."""
    first = next(iter(train_batches()))
    params = jax.jit(model.init)(jax.random.key(seed), first)
    # inject_hyperparams makes the learning rate part of opt_state so the
    # plateau decay below takes effect inside the compiled step
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=learning_rate)
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        class_proj, clip_proj = model.apply(params, batch)
        labels = jnp.eye(class_proj.shape[0])
        return symmetric_loss(class_proj, clip_proj, labels, t=temperature)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_step = jax.jit(loss_fn)
    early = EarlyStopping(patience=patience, verbose=True)
    plateau_counter, best_val = 0, np.inf

    for epoch in range(1, num_epochs + 1):
        train_losses = []
        for batch in train_batches():
            params, opt_state, loss = train_step(params, opt_state, batch)
            train_losses.append(float(loss))
        val_losses = [float(eval_step(params, batch))
                      for batch in val_batches()]
        val_loss = float(np.mean(val_losses))
        logger.info("epoch %d: train %.4f val %.4f", epoch,
                    float(np.mean(train_losses)), val_loss)
        early(val_loss, params)
        if val_loss < best_val - 1e-6:
            best_val = val_loss
            plateau_counter = 0
        else:
            plateau_counter += 1
            if plateau_counter >= plateau_patience:
                opt_state.hyperparams["learning_rate"] = (
                    opt_state.hyperparams["learning_rate"] * plateau_factor)
                plateau_counter = 0
                logger.info("plateau: lr -> %.4g",
                            float(opt_state.hyperparams["learning_rate"]))
        if early.early_stop:
            logger.info("early stopping at epoch %d", epoch)
            break
    return early.best_params if early.best_params is not None else params
