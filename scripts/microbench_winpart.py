"""Size the window partition/unpartition transposes and the windowed-block
residual glue: partition+unpartition alone, the batched-lanes attention op
alone (token-major windows in/out), and LN+residual stream ops."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=6, reps=3):
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
    from labelanything_tpu.models.image_encoder import (window_partition,
                                                        window_unpartition)
    from labelanything_tpu.ops import flash_attention as fa

    B, GRID, C, W, HEADS, HD = 8, 64, 768, 14, 12, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, GRID, GRID, C)), jnp.bfloat16)

    noop = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)
    print(f"noop {noop * 1e3:.3f} ms", flush=True)

    # 8x partition+unpartition round trips
    def part8(x, c):
        x = x + c.astype(x.dtype) * 0
        for _ in range(8):
            w, pad_hw = window_partition(x, W)
            x = window_unpartition(w, W, pad_hw, (GRID, GRID)) * 1.0000001
        return x

    t = timed(part8, (x,))
    print(f"partition+unpartition: {(t - noop) / 8 * 1e3:.3f} ms/block",
          flush=True)

    # 8x batched-lanes attention op alone (token-major windows in/out)
    G, N = B * 25, W * W
    qkv = jnp.asarray(0.3 * rng.standard_normal((G, N, 3 * C)), jnp.bfloat16)
    r = jnp.asarray(0.3 * rng.standard_normal((G, N, HEADS * 2 * W)),
                    jnp.bfloat16)

    def attn8(qkv, c):
        out = jnp.float32(0)
        for _ in range(8):
            o = fa.flash_attention_relpos_lanes_batched(
                qkv + (c + out * 0).astype(qkv.dtype) * 0, r,
                HD ** -0.5, (W, W), HEADS)
            out = out + jnp.sum(o[0, 0].astype(jnp.float32))
        return out

    t = timed(attn8, (qkv,))
    print(f"lanes_batched op: {(t - noop) / 8 * 1e3:.3f} ms/block",
          flush=True)

    # 8x LN+residual stream ops (the per-block elementwise floor)
    from flax import linen as nn

    class LNres(nn.Module):
        n: int = 8

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                 name=f"ln{i}")(x)
                x = x + y * 0.5
            return x

    mod = LNres()
    p = jax.jit(mod.init)(jax.random.key(0), x)
    t = timed(lambda p, x, c: mod.apply(p, x + c.astype(x.dtype) * 0),
              (p, x))
    print(f"LN+residual: {(t - noop) / 8 * 1e3:.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
