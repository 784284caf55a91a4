"""Slope-timed dissection of the train step at bench_train's exact config
(B=8, 5-way 1-shot, 480px, lam_no_vit bf16): forward / +loss / +backward /
full step, each with the carry nudging the embeddings input (keeping every
stage inside the loop) and full-output consumption."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from _slope_timing import timed_loop

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.parallel.train_step import init_train_state
from labelanything_tpu.parallel.train_step import make_train_step
from labelanything_tpu.typing import BatchKeys, LossDict, ResultDict

B, ways, shots, S = 8, 5, 1, 480
C = ways + 1


def consume(tree):
    return sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float32))
               for x in jax.tree.leaves(tree)
               if jnp.issubdtype(x.dtype, jnp.floating))


def main():
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=S,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16)
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=B, num_examples=shots, num_classes=C,
        image_size=S, embed_dim=768))
    gt = jnp.asarray(
        np.random.default_rng(0).integers(0, C, (B, S, S)), jnp.int32)
    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros((B, C, S, S)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((B, shots, C, 256)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
    state = init_train_state(params, tx)
    rng = jax.random.key(0)

    def nudged(c):
        b = dict(batch)
        emb = b[BatchKeys.EMBEDDINGS]
        b[BatchKeys.EMBEDDINGS] = emb + (c * 0).astype(emb.dtype)
        return b

    def fwd_det(c):
        out = model.apply(params["model"], nudged(c), deterministic=True)
        return c + consume(out[ResultDict.LOGITS])

    def fwd_train(c):
        rngs = {"class_rows": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(params["model"], nudged(c), deterministic=False,
                          rngs=rngs)
        return c + consume(out[ResultDict.LOGITS])

    def loss_fn(p, b):
        rngs = {"class_rows": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        result = model.apply(p["model"], b, deterministic=False, rngs=rngs)
        out = loss.apply(p["loss"], result, gt)
        return out[LossDict.VALUE]

    def fwd_loss(c):
        return c + loss_fn(params, nudged(c))

    def fwd_bwd(c):
        l, grads = jax.value_and_grad(loss_fn)(params, nudged(c))
        return c + l + consume(grads) * 0

    for name, fn in [("fwd deterministic", fwd_det),
                     ("fwd train-rngs", fwd_train),
                     ("fwd + loss", fwd_loss),
                     ("fwd + loss + bwd", fwd_bwd)]:
        print(f"{name:26s} {timed_loop(lambda c, f=fn: f(c)) * 1e3:7.3f} ms",
              flush=True)

    # full train step incl. AdamW: dispatch-slope timing with donated state
    train_step = make_train_step(model, loss, tx)

    def timed_state_loop(steps):
        st, aux = state, None
        for _ in range(2):
            st, aux = train_step(st, batch, gt, rng, 1.0, apply_update=True)
        float(aux["loss"])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                st, aux = train_step(st, batch, gt, rng, 1.0,
                                     apply_update=True)
            float(aux["loss"])
            ts.append((time.perf_counter() - t0) / steps)
        return min(ts)

    state0 = jax.tree.map(lambda x: x + 0, state)
    lo = timed_state_loop(8)
    state = state0
    hi = timed_state_loop(40)
    print(f"{'full step (dispatch slope)':26s} "
          f"{(40 * hi - 8 * lo) / 32 * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
