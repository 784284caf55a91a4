"""Isolated fused-vs-unfused TwoWayTransformer microbench at decode shapes.

Decode bench shapes: B*M*C = 96 instances, S = 900 image tokens (480px/16),
D = 256, N sparse tokens as in the prompt encoder. Run on the real chip.
"""
import argparse, time
import numpy as np
import jax, jax.numpy as jnp
import labelanything_tpu.ops.fused_twoway as ft
from labelanything_tpu.models.transformer import TwoWayTransformer


def timed(f, *a, reps=5, inner=8):
    out = f(*a)
    float(jnp.sum(jnp.where(jnp.isfinite(out[1]), out[1], 0)))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f(*a)
        float(jnp.sum(jnp.where(jnp.isfinite(out[1]), out[1], 0)))
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inst", type=int, default=96)
    ap.add_argument("--s", type=int, default=900)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    h = w = int(round(args.s ** 0.5))
    img = jnp.asarray(0.5 * rng.standard_normal((args.inst, h, w, args.d)), dt)
    pe = jnp.asarray(0.5 * rng.standard_normal((1, h, w, args.d)), dt)
    tok = jnp.asarray(0.5 * rng.standard_normal((args.inst, args.n, args.d)), dt)
    tr = TwoWayTransformer(depth=2, embedding_dim=args.d, num_heads=8,
                           mlp_dim=2048, dtype=dt)
    ft._ENABLE = False
    params = jax.jit(tr.init)(jax.random.key(0), img, pe, tok)

    for enable in (False, True):
        ft._ENABLE = enable
        f = jax.jit(lambda p, a, b, c: tr.apply(p, a, b, c))
        t = timed(f, params, img, pe, tok)
        print(f"fused={enable}: {t*1e3:.3f} ms  "
              f"({args.inst} inst x S={args.s} N={args.n} D={args.d} {dt})",
              flush=True)


if __name__ == "__main__":
    main()
