"""block_k / group-budget ablation for the packed kernels."""

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
    from labelanything_tpu.ops import flash_attention as fa

    B, HEADS, HD = 8, 12, 64
    rng = np.random.default_rng(0)

    noop = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)
    print(f"noop {noop * 1e3:.2f}", flush=True)

    qkvg = jnp.asarray(rng.standard_normal((B, 36, 4096, HD)), jnp.bfloat16)
    rg = jnp.asarray(rng.standard_normal((B, 12, 4096, 128)), jnp.bfloat16)

    def glob4(qkv, c):
        out = jnp.float32(0)
        for _ in range(4):
            o = fa.flash_attention_relpos_packed(
                qkv + (c + out * 0).astype(qkv.dtype) * 0, rg,
                HD ** -0.5, (64, 64), 12)
            out = out + jnp.sum(o[0, 0, 0].astype(jnp.float32))
        return out

    for bq, bk in ((1024, 256), (1024, 512), (1024, 1024), (512, 256)):
        fa._BLOCK_Q, fa._BLOCK_K = bq, bk
        t = timed(glob4, (qkvg,))
        print(f"glob bq={bq} bk={bk}: {(t - noop) / 4 * 1e3:8.3f} ms/op",
              flush=True)
    fa._BLOCK_Q, fa._BLOCK_K = 512, 512

    qkvw = jnp.asarray(rng.standard_normal((200, 36, 196, HD)), jnp.bfloat16)
    rw = jnp.asarray(rng.standard_normal((200, 12, 196, 28)), jnp.bfloat16)

    def win8(qkv, c):
        out = jnp.float32(0)
        for _ in range(8):
            o = fa.flash_attention_relpos_packed(
                qkv + (c + out * 0).astype(qkv.dtype) * 0, rw,
                HD ** -0.5, (14, 14), 12)
            out = out + jnp.sum(o[0, 0, 0].astype(jnp.float32))
        return out

    orig = fa._pick_group
    for budget in (1_000_000, 2_000_000, 4_000_000):
        fa._pick_group = lambda bh, tile, b=budget: orig(bh, tile, b)
        try:
            g = orig(200, 196 * 196, budget)
            t = timed(win8, (qkvw,))
            print(f"win G={g}: {(t - noop) / 8 * 1e3:8.3f} ms/op", flush=True)
        finally:
            fa._pick_group = orig


if __name__ == "__main__":
    main()
