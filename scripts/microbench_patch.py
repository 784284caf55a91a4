"""Dissect the patch-embed + neck cost: transpose vs matmul vs neck convs."""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=10, reps=3):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from flax import linen as nn

    B = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((768, 768)) * 0.02, jnp.bfloat16)
    tok = jnp.asarray(rng.standard_normal((B, 64, 64, 768)), jnp.bfloat16)

    results = {}
    results["noop"] = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)

    # space-to-depth, 6D formulation (current PatchEmbed)
    def s2d6(x, c):
        x = x + c.astype(x.dtype) * 0
        b = x.shape[0]
        y = x.reshape(b, 64, 16, 64, 16, 3).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 64, 64, 768)

    results["s2d_6d"] = timed(s2d6, (img,))

    # space-to-depth, 5D formulation (inner 48 contiguous)
    def s2d5(x, c):
        x = x + c.astype(x.dtype) * 0
        b = x.shape[0]
        y = x.reshape(b, 64, 16, 64, 48).transpose(0, 1, 3, 2, 4)
        return y.reshape(b, 64, 64, 768)

    results["s2d_5d"] = timed(s2d5, (img,))

    # the 768x768 matmul alone
    def mm(x, k, c):
        return jnp.dot(x + c.astype(x.dtype) * 0, k)

    results["matmul_768"] = timed(mm, (tok, kern))

    # s2d + matmul fused
    def full(x, k, c):
        b = x.shape[0]
        y = (x + c.astype(x.dtype) * 0).reshape(b, 64, 16, 64, 48)
        y = y.transpose(0, 1, 3, 2, 4).reshape(b, 64, 64, 768)
        return jnp.dot(y, k)

    results["s2d5+matmul"] = timed(full, (img, kern))

    # neck convs alone
    class Neck(nn.Module):
        @nn.compact
        def __call__(self, y):
            z = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16)(y)
            z = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(z)
            return z

    neck = Neck()
    npar = jax.jit(neck.init)(jax.random.key(0), tok)
    results["neck_convs"] = timed(
        lambda p, y, c: neck.apply(p, y + c.astype(y.dtype) * 0), (npar, tok))

    over = results["noop"]
    for k, v in results.items():
        print(f"{k:16s} {v * 1e3:8.2f} ms   ({(v - over) * 1e3:7.2f} net)")


if __name__ == "__main__":
    main()
