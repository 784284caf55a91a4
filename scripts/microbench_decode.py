"""Dissect the lam_no_vit decode forward: neck / prompt-encoder / decoder /
postprocess.

Measurement traps this script avoids (learned the hard way, see PERF.md):
chain a carry through steps (XLA CSE merges identical calls), consume the
FULL output (slicing lets XLA sink the slice and skip work), and subtract
the noop dispatch cost (~1.5-3 ms through the tunnel)."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=12, reps=3):
    @jax.jit
    def chained(carry, *a):
        out = fn(*a, carry)
        return carry + jnp.sum(out.astype(jnp.float32))

    carry = jnp.float32(0)
    for _ in range(2):
        carry = chained(carry, *args)
    float(carry)
    times = []
    for _ in range(reps):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = chained(carry, *args)
        float(carry)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2]


def main():
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.typing import BatchKeys, ResultDict

    B, ways, S = 8, 5, 480
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=S,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=B, num_examples=1, num_classes=ways + 1,
        image_size=S, embed_dim=768))
    params = jax.jit(model.init)(jax.random.key(0), batch)

    noop = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)
    print(f"noop {noop * 1e3:6.2f} ms", flush=True)

    def full(params, batch, c):
        b = dict(batch)
        emb = b[BatchKeys.EMBEDDINGS]
        b[BatchKeys.EMBEDDINGS] = emb + c.astype(emb.dtype) * 0
        return model.apply(params, b)[ResultDict.LOGITS]

    t = timed(full, (params, batch))
    print(f"full forward      {(t - noop) * 1e3:8.2f} ms", flush=True)

    # class embeddings only (neck + prompt encoder) — the serving split
    # takes a SUPPORT-only batch: (B, M, ...) embeddings, no query slot
    def class_embs(params, batch, c):
        b = dict(batch)
        emb = b[BatchKeys.EMBEDDINGS][:, 1:]  # drop the query image
        b[BatchKeys.EMBEDDINGS] = emb + c.astype(emb.dtype) * 0
        out = model.apply(params, b, method="generate_class_embeddings")
        return jax.tree.leaves(out)[0]

    try:
        t = timed(class_embs, (params, batch))
        print(f"neck+prompt_enc   {(t - noop) * 1e3:8.2f} ms", flush=True)
    except Exception as exc:
        print("class_embs path:", type(exc).__name__, str(exc)[:120], flush=True)


if __name__ == "__main__":
    main()
