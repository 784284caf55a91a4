"""Compare our flash kernels against jax.experimental.pallas.ops.tpu
flash_attention on the SAM global-attention shape, plus window-kernel
ablations (group size)."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=8, reps=3):
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

    rng = np.random.default_rng(0)
    B, H, S, D = 8, 12, 4096, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    noop = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)
    print(f"noop {noop * 1e3:.2f} ms", flush=True)

    # ours (plain, no bias)
    t = timed(lambda q, c: fa.flash_attention(
        q + c.astype(q.dtype) * 0, q, q, D ** -0.5), (q,))
    print(f"ours plain (8,12,4096,64)     {(t - noop) * 1e3:8.2f} ms", flush=True)

    # stock pallas ops flash attention
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as ref_flash)

        bs = BlockSizes(block_q=512, block_k_major=512, block_k=512,
                        block_b=1)
        t = timed(lambda q, c: ref_flash(
            q + c.astype(q.dtype) * 0, q, q, None,
            sm_scale=D ** -0.5, block_sizes=bs), (q,))
        print(f"stock pallas flash            {(t - noop) * 1e3:8.2f} ms", flush=True)
    except Exception as exc:  # pragma: no cover
        print(f"stock pallas flash unavailable: {type(exc).__name__}: {exc}", flush=True)

    # ours relpos on the global shape
    qg = q.reshape(B * H, S, D)
    rh = jnp.asarray(rng.standard_normal((B * H, S, 64)), jnp.bfloat16)
    t = timed(lambda qg, c: fa.flash_attention_relpos(
        qg + c.astype(qg.dtype) * 0, qg, qg, rh, rh, D ** -0.5, (64, 64)),
        (qg,))
    print(f"ours relpos global            {(t - noop) * 1e3:8.2f} ms", flush=True)

    # window-shape ablation over group budget
    NW = 25
    qw = jnp.asarray(rng.standard_normal((B * NW * H, 196, D)), jnp.bfloat16)
    rw = jnp.asarray(rng.standard_normal((B * NW * H, 196, 14)), jnp.bfloat16)
    for budget in (500_000, 1_000_000, 2_000_000):
        orig = fa._pick_group

        def patched(bh, tile, budget=budget):
            return orig(bh, tile, budget)

        fa._pick_group = patched
        try:
            g = patched(B * NW * H, 196 * 196)
            t = timed(lambda qw, c: fa.flash_attention_relpos(
                qw + c.astype(qw.dtype) * 0, qw, qw, rw, rw, D ** -0.5,
                (14, 14)), (qw,))
            print(f"ours relpos window G={g:<4d}      {(t - noop) * 1e3:8.2f} ms", flush=True)
        finally:
            fa._pick_group = orig


if __name__ == "__main__":
    main()
