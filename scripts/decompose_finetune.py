"""Per-stage decomposition of the SAM-1024 fine-tune step (PERF.md round-5).

The round-4 judge asked where the step's time goes (fwd / bwd / recompute /
optimizer) so the next optimization lever is aimed, not guessed. This
script times, on the attached chip, at the exact bench_finetune
configuration (batch 2, 1-way 2-shot, embed 512, bf16, remat policy
selectable):

  (a) forward + loss only                      -> fwd
  (b) value_and_grad of the same loss          -> (b) - (a) = backward
      (+ recompute under remat policies)
  (c) the full production train step (AdamW)   -> (c) - (b) = optimizer +
      update plumbing

Timing: chained carries, one scalar fetch per rep (bench.py methodology).

Run: python scripts/decompose_finetune.py [--remat none|full|attn|dots]
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", choices=["none", "full", "attn", "dots"],
                    default="none")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.build_lam import build_lam_vit_b
    from labelanything_tpu.parallel.train_step import (init_train_state,
                                                       make_train_step)
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.train.optim import build_optimizer
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import BatchKeys, ResultDict

    ways, image_size = 1, 1024
    c = ways + 1
    model = build_lam_vit_b(
        embed_dim=512, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
        remat_encoder=False if args.remat == "none" else args.remat,
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=args.batch, num_examples=args.shots, num_classes=c,
        image_size=image_size, with_images=True, include_masks=True,
    ))
    full.pop(BatchKeys.EMBEDDINGS, None)
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, gt = next(sub)

    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros(
                (args.batch, c, image_size, image_size)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros(
                (args.batch, args.shots, c, 512)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
    state = init_train_state(params, tx)
    train_step = make_train_step(model, loss, tx)

    from labelanything_tpu.typing import LossDict

    def loss_fn(p, carry):
        rng = jax.random.key(0)
        rngs = {"class_rows": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(p["model"], batch, deterministic=False, rngs=rngs)
        loss_out = loss.apply(p["loss"], out, gt)
        return loss_out[LossDict.VALUE] + carry * 0

    fwd = jax.jit(lambda p, carry: carry + loss_fn(p, carry))

    def _vg(p, carry):
        val, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, carry))(p)
        # consume EVERY grad leaf — an unused vjp output is dead code and
        # XLA elides the whole backward (measured: vg == fwd without this)
        gsum = sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                   for l in jax.tree.leaves(grads))
        return carry + val + gsum * 1e-30

    vg = jax.jit(_vg)

    def timed(fn, *fargs):
        carry = jnp.float32(0)
        for _ in range(2):
            carry = fn(*fargs, carry)
        assert np.isfinite(float(carry))
        times = []
        for _ in range(args.reps):
            carry = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                carry = fn(*fargs, carry)
            _ = float(carry)
            times.append((time.perf_counter() - t0) / args.steps)
        return statistics.median(times)

    t_fwd = timed(fwd, params)
    t_vg = timed(vg, params)

    # full production step (chained donated state)
    def run_full():
        nonlocal state
        state, aux = train_step(state, batch, gt, jax.random.key(0), 1.0,
                                apply_update=True, use_accum=False)
        return aux

    for _ in range(2):
        aux = run_full()
    assert np.isfinite(float(aux["loss"]))
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            aux = run_full()
        _ = float(aux["loss"])
        times.append((time.perf_counter() - t0) / args.steps)
    t_full = statistics.median(times)

    imgs = args.batch * (args.shots + 1)
    print(f"remat={args.remat} batch={args.batch} ({imgs} images/step)")
    print(f"  forward + loss        : {t_fwd * 1e3:7.1f} ms")
    print(f"  + backward (vjp)      : {t_vg * 1e3:7.1f} ms "
          f"(bwd{'+recompute' if args.remat != 'none' else ''} = "
          f"{(t_vg - t_fwd) * 1e3:.1f} ms)")
    print(f"  full step (AdamW)     : {t_full * 1e3:7.1f} ms "
          f"(optimizer+plumbing = {(t_full - t_vg) * 1e3:.1f} ms)")
    print(f"  throughput            : {imgs / t_full:7.2f} img/s")


if __name__ == "__main__":
    main()
