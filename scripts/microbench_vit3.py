"""Post-packing block breakdown: windowed/global block stacks + attention
ops + block_q ablation for the long kernel."""

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
    from flax import linen as nn

    from labelanything_tpu.models.image_encoder import ViTBlock
    from labelanything_tpu.ops import flash_attention as fa

    B, D, HEADS, GRID = 8, 768, 12, 64
    HD = D // HEADS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, GRID, GRID, D)), jnp.bfloat16)

    results = {}

    def rec(key, val):
        results[key] = val
        over = results.get(("noop", 1), 0.0)
        print(f"{key[0]:22s} {val * 1e3:9.2f} {(val - over) / key[1] * 1e3:12.3f}",
              flush=True)

    rec(("noop", 1), timed(lambda t, c: t + c, (jnp.float32(1),), steps=20))

    class BlockStack(nn.Module):
        window: int = 14
        n: int = 4

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x = ViTBlock(dim=768, num_heads=12, use_rel_pos=True,
                             window_size=self.window, input_size=(GRID, GRID),
                             dtype=jnp.bfloat16, name=f"b{i}")(x)
            return x



    # packed attention ops alone (4x global / 8x windowed in one jit)
    qkvg = jnp.asarray(rng.standard_normal((B, 36, 4096, HD)), jnp.bfloat16)
    rg = jnp.asarray(rng.standard_normal((B, 12, 4096, 128)), jnp.bfloat16)

    def glob4(qkv, c):
        # chain a scalar through iterations so XLA cannot CSE the calls
        out = jnp.float32(0)
        for _ in range(4):
            o = fa.flash_attention_relpos_packed(
                qkv + (c + out * 0).astype(qkv.dtype) * 0, rg,
                HD ** -0.5, (64, 64), 12)
            out = out + jnp.sum(o[0, 0, 0].astype(jnp.float32))
        return out

    rec(("glob_packed_op", 4), timed(glob4, (qkvg,)))

    # block_q ablation for the long kernel
    for bq in (256, 1024):
        old = fa._BLOCK_Q
        fa._BLOCK_Q = bq
        try:
            rec((f"glob_packed_bq{bq}", 4), timed(glob4, (qkvg,)))
        finally:
            fa._BLOCK_Q = old

    qkvw = jnp.asarray(rng.standard_normal((B * 25, 36, 196, HD)), jnp.bfloat16)
    rw = jnp.asarray(rng.standard_normal((B * 25, 12, 196, 28)), jnp.bfloat16)

    def win8(qkv, c):
        out = jnp.float32(0)
        for _ in range(8):
            o = fa.flash_attention_relpos_packed(
                qkv + (c + out * 0).astype(qkv.dtype) * 0, rw,
                HD ** -0.5, (14, 14), 12)
            out = out + jnp.sum(o[0, 0, 0].astype(jnp.float32))
        return out

    rec(("win_packed_op", 8), timed(win8, (qkvw,)))




if __name__ == "__main__":
    main()
