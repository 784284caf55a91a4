"""Isolated fwd vs fwd+bwd timing of the rel-pos attention kernels at SAM
ViT-B fine-tune shapes (batch 2 episodes x 3 images @1024px), fused Pallas
backward vs the XLA recompute-VJP (kill-switch path).

Shapes: global layer (B=6, heads=12, N=4096, dh=64, grid 64x64); windowed
layer (G=6*25 padded windows, N=196, grid 14x14).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _slope_timing import timed_loop

from labelanything_tpu.ops import flash_attention as fa

B, HEADS, DH = 6, 12, 64
C = HEADS * DH


def bench(name, fn, *args, steps=(8, 40), reps=3):
    def total(n):
        @jax.jit
        def loop(c, *a):
            return jax.lax.fori_loop(0, n, lambda i, c: fn(c, *a), c)

        float(loop(jnp.float32(0), *args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(jnp.float32(0), *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    lo, hi = steps
    t = (total(hi) - total(lo)) / (hi - lo)
    print(f"{name:42s} {t*1e3:8.3f} ms", flush=True)
    return t


def make_case(kh, kw, g_total, fn):
    n = kh * kw
    rr = kh + kw
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((g_total, n, 3 * C)),
                      jnp.bfloat16)
    r = jnp.asarray(rng.standard_normal((g_total, n, HEADS * rr)),
                    jnp.bfloat16)

    def fwd(c, qkv, r):
        o = fn(qkv + (c * 0).astype(qkv.dtype), r, DH ** -0.5, (kh, kw),
               HEADS)
        return c + jnp.sum(o.astype(jnp.float32)) * 0 + 1.0

    def fwdbwd(c, qkv, r):
        def loss(a, b):
            o = fn(a, b, DH ** -0.5, (kh, kw), HEADS)
            return jnp.sum(o.astype(jnp.float32))

        l, (da, db) = jax.value_and_grad(loss, argnums=(0, 1))(
            qkv + (c * 0).astype(qkv.dtype), r)
        return (c + l * 0 + jnp.sum(da.astype(jnp.float32)) * 0
                + jnp.sum(db.astype(jnp.float32)) * 0 + 1.0)

    return fwd, fwdbwd, qkv, r


def main():
    import os

    cases = [
        ("global 64x64 N=4096", 64, 64, B, fa.flash_attention_relpos_lanes),
        ("window 14x14 G=150", 14, 14, B * 25,
         fa.flash_attention_relpos_lanes_batched),
    ]
    for name, kh, kw, g, fn in cases:
        fwd, fwdbwd, qkv, r = make_case(kh, kw, g, fn)
        bench(f"{name} fwd", fwd, qkv, r, steps=(16, 80))
        bench(f"{name} fwd+bwd FUSED", fwdbwd, qkv, r)
        os.environ["LA_TPU_DISABLE_FUSED_BWD"] = "1"
        try:
            bench(f"{name} fwd+bwd XLA-recompute", fwdbwd, qkv, r,
                  steps=(4, 16))
        finally:
            os.environ["LA_TPU_DISABLE_FUSED_BWD"] = ""


if __name__ == "__main__":
    main()
