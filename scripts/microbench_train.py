"""Dissect the train step: forward+loss vs backward vs optimizer update."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=12, reps=3):
    jfn = jax.jit(fn)
    out = None
    for _ in range(2):
        out = jfn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = jfn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.train.optim import build_optimizer
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import BatchKeys, LossDict, ResultDict

    B, ways, S = 8, 5, 480
    c = ways + 1
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=S,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16)
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=B, num_examples=1, num_classes=c, image_size=S,
        embed_dim=768))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, gt = next(sub)
    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros((B, c, S, S)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((B, 1, c, 256)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }

    def fwd_only(params, batch):
        out = model.apply(params["model"], batch, deterministic=True)
        return jnp.sum(out[ResultDict.LOGITS].astype(jnp.float32) *
                       jnp.isfinite(out[ResultDict.LOGITS]))

    t = timed(fwd_only, (params, batch))
    print(f"fwd only (deterministic):    {t * 1e3:8.2f} ms", flush=True)

    def fwd_rng(params, batch, rng):
        rngs = {"class_rows": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(params["model"], batch, deterministic=False,
                          rngs=rngs)
        return jnp.sum(out[ResultDict.LOGITS].astype(jnp.float32) *
                       jnp.isfinite(out[ResultDict.LOGITS]))

    t = timed(fwd_rng, (params, batch, jax.random.key(2)))
    print(f"fwd only (train rngs):       {t * 1e3:8.2f} ms", flush=True)

    def fwd_loss(params, batch, gt, rng):
        rngs = {"class_rows": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(params["model"], batch, deterministic=False,
                          rngs=rngs)
        lo = loss.apply(params["loss"], out, gt)
        return lo[LossDict.VALUE]

    t = timed(fwd_loss, (params, batch, gt, jax.random.key(2)))
    print(f"fwd + loss:                  {t * 1e3:8.2f} ms", flush=True)

    def grad_step(params, batch, gt, rng):
        l, g = jax.value_and_grad(fwd_loss)(params, batch, gt, rng)
        return l + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                       for x in jax.tree.leaves(g)[:1])

    t = timed(grad_step, (params, batch, gt, jax.random.key(2)))
    print(f"fwd + loss + backward:       {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
