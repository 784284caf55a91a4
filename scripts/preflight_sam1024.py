"""SAM-1024 full-ViT fine-tune memory preflight + one-step bench.

The reference trains the full SAM ViT encoder at 1024px (its released
SAM checkpoint: emb 512 @1024px, reference: README.md:64-71; the trained
rel-pos path: models/image_encoder.py:340-376). On TPU the hazard is the
BACKWARD pass: a naive rel-pos attention VJP materializes (B, H, N, N)
scores + bias per global layer (~3.2 GB fp32 each at N=4096). The
production kernels avoid this with a q-chunked rematerialized backward
(ops/flash_attention.py, _BWD_CHUNK) plus optional encoder remat.

This script AOT-compiles the production training step (forward + focal
loss + backward + AdamW, donated TrainState) for the images-path LAM with
the SAM ViT-B encoder at 1024px / embed 512 on the 1-way 2-shot bucket via
the same `estimate_step_memory` helper the Run preflight uses
(donate_argnums-aware), asserts the total fits a 16 GB v5e, and — when a
TPU is attached — times the step.

The budget is asserted on the ACCUMULATING program (use_accum=True),
matching Run._lazy_init's worst-case convention (experiment/run.py): the
accumulating final substitution pass peaks strictly higher than the
no-accum fast path, so a passing preflight covers both. Pass --no-accum to
also print the fast-path number. The --bench timing runs the no-accum fast
path (the steady-state step when substitution is off).

Run: python scripts/preflight_sam1024.py [--bench] [--batch 2] [--shots 2]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from labelanything_tpu.data.synthetic import random_full_batch
from labelanything_tpu.models.build_lam import build_lam_vit_b
from labelanything_tpu.parallel.train_step import (init_train_state,
                                                   make_train_step)
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.train.substitutor import Substitutor
from labelanything_tpu.typing import BatchKeys, ResultDict
from labelanything_tpu.utils.profiling import estimate_step_memory


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ways", type=int, default=1)
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--bench", action="store_true",
                    help="also time the step on the attached device")
    ap.add_argument("--remat", choices=["none", "full", "attn", "dots"],
                    default="none",
                    help="encoder remat policy (default none, the measured-"
                         "best config that fits — PERF.md round-5 remat tax;"
                         " full is the fallback for bigger batches)")
    ap.add_argument("--no-remat", action="store_true",
                    help="deprecated alias for --remat none")
    ap.add_argument("--no-accum", action="store_true",
                    help="analyze the no-accumulation fast path instead of "
                         "the worst-case accumulating program")
    ap.add_argument("--budget-gb", type=float, default=16.0)
    args = ap.parse_args()

    c = args.ways + 1
    remat = "none" if args.no_remat else args.remat
    model = build_lam_vit_b(
        embed_dim=512, image_size=1024,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,            # mixed precision: fp32 params
        remat_encoder=False if remat == "none" else remat,
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=args.batch, num_examples=args.shots, num_classes=c,
        image_size=1024, with_images=True, include_masks=True,
    ))
    full.pop(BatchKeys.EMBEDDINGS, None)
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, gt = next(sub)

    params = {
        "model": jax.eval_shape(
            lambda k: model.init(k, batch), jax.random.key(0)),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros((args.batch, c, 1024, 1024)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros(
                (args.batch, args.shots, c, 512)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    n_params = sum(x.size for x in jax.tree.leaves(params["model"]))
    print(f"params: {n_params/1e6:.1f} M "
          f"(SAM ViT-B encoder + LAM, embed 512 @1024px)")

    tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
    step = make_train_step(model, loss, tx)

    # AOT-lower the step with the TrainState DONATED, exactly as the
    # production step runs it (make_train_step jits with donate_argnums=(0,));
    # without donation the analysis double-counts params + Adam moments.
    # use_accum defaults True: the accumulating pass is the worst case the
    # Run preflight asserts (run.py convention).
    state_shapes = jax.eval_shape(lambda p: init_train_state(p, tx), params)
    use_accum = not args.no_accum

    def aot_step(state, batch, gt, rng):
        return step(state, batch, gt, rng, 1.0, apply_update=True,
                    use_accum=use_accum)

    stats = estimate_step_memory(aot_step, state_shapes, batch, gt,
                                 jax.random.key(2), donate_argnums=(0,))
    if not stats:
        raise SystemExit("memory analysis unavailable on this backend")
    total = sum(stats.values())
    # alias_bytes present -> donation reflected, total is exact; absent ->
    # the sum double-counts the donated TrainState (~params+moments) and a
    # hard budget assert would fire spuriously (advisor finding, round 3)
    exact = "alias_bytes" in stats
    print({k: f"{v/2**30:.3f} GB" for k, v in stats.items()})
    print(f"TOTAL {total/2**30:.2f} GB vs {args.budget_gb:.0f} GB budget "
          f"(batch {args.batch}, {args.ways}-way {args.shots}-shot, "
          f"remat={remat}, "
          f"use_accum={use_accum})")
    if total > args.budget_gb * 2**30:
        if exact:
            raise SystemExit("OVER BUDGET")
        print("WARNING: over budget, but donation is not reflected in this "
              "backend's analysis — the total over-counts the donated "
              "TrainState; treat as advisory")
    else:
        print("fits: OK")

    if args.bench:
        params = {
            "model": jax.jit(model.init)(jax.random.key(0), batch),
            "loss": params["loss"],
        }
        state = init_train_state(params, tx)

        def one(state, rng):
            # make_train_step's returned callable jits internally
            # (donated state, static apply_update/use_accum)
            return step(state, batch, gt, rng, 1.0,
                        apply_update=True, use_accum=False)

        state, aux = one(state, jax.random.key(2))
        float(aux["loss"])  # sync after compile
        reps, steps = 3, 8
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(steps):
                state, aux = one(state, jax.random.key(3 + i))
            float(aux["loss"])
            times.append((time.perf_counter() - t0) / steps)
        t = sorted(times)[len(times) // 2]
        imgs = args.batch * (args.shots + 1)
        print(f"train step: {t*1e3:.1f} ms  "
              f"({args.batch/t:.2f} eps/s, {imgs/t:.2f} img/s fwd+bwd, "
              f"loss {float(aux['loss']):.4f})")


if __name__ == "__main__":
    main()
