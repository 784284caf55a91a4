"""Locate the backward-pass excess: fwd vs grad for the full model, the
blockdiag vs module TwoWay paths, and the isolated PE-fusion stage."""
import jax
import jax.numpy as jnp
import numpy as np

from _slope_timing import timed_loop

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.typing import BatchKeys, ResultDict
from labelanything_tpu.ops import twoway_blockdiag as bd

B, ways, shots, S = 8, 5, 1, 480
C = ways + 1


def main():
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=S,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=B, num_examples=shots, num_classes=C,
        image_size=S, embed_dim=768))
    params = jax.jit(model.init)(jax.random.key(0), batch)

    def nudged(c):
        b = dict(batch)
        emb = b[BatchKeys.EMBEDDINGS]
        b[BatchKeys.EMBEDDINGS] = emb + (c * 0).astype(emb.dtype)
        return b

    def fwd_sum(p, b):
        out = model.apply(p, b, deterministic=True)
        lg = out[ResultDict.LOGITS]
        return jnp.sum(jnp.where(jnp.isfinite(lg), lg, 0.0))

    def fwd(c):
        return c + fwd_sum(params, nudged(c))

    def bwd(c):
        l, g = jax.value_and_grad(fwd_sum)(params, nudged(c))
        return c + l + sum(jnp.sum(x.astype(jnp.float32)) * 0
                           for x in jax.tree.leaves(g))

    for enable in (True, False):
        bd._ENABLE = enable
        tag = "blockdiag" if enable else "module   "
        print(f"[{tag}] fwd  {timed_loop(lambda c: fwd(c)) * 1e3:7.3f} ms",
              flush=True)
        print(f"[{tag}] grad {timed_loop(lambda c: bwd(c)) * 1e3:7.3f} ms",
              flush=True)
    bd._ENABLE = True


if __name__ == "__main__":
    main()
