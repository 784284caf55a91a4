"""Component-level timing of the SAM ViT-B @1024 embed path on a real TPU.

Times each encoder component in isolation (patch-embed, windowed block,
global block, MLP-only, neck) so kernel work targets the真 bottleneck.
Every jitted fn takes (params, x) as arguments — no closure constants
(tunnel payload limit, see bench.py).

Usage: python scripts/microbench_vit.py [--batch 8] [--steps 10]
"""

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
    """Median seconds per step; chains a scalar carry for honest sync."""
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
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from flax import linen as nn

    from labelanything_tpu.models.image_encoder import ViTBlock
    from labelanything_tpu.ops.flash_attention import (flash_attention,
                                                       flash_attention_relpos)

    B, D, HEADS, GRID = args.batch, 768, 12, 64
    HD = D // HEADS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, GRID, GRID, D)), jnp.bfloat16)

    results = {}

    # ---- full windowed block (window 14) ----
    blk = ViTBlock(dim=D, num_heads=HEADS, use_rel_pos=True, window_size=14,
                   input_size=(GRID, GRID), dtype=jnp.bfloat16)
    p = jax.jit(blk.init)(jax.random.key(0), x)
    results["windowed_block"] = timed(
        lambda p, x, c: blk.apply(p, x + c.astype(x.dtype) * 0), (p, x),
        args.steps)

    # ---- full global block ----
    gblk = ViTBlock(dim=D, num_heads=HEADS, use_rel_pos=True, window_size=0,
                    input_size=(GRID, GRID), dtype=jnp.bfloat16)
    gp = jax.jit(gblk.init)(jax.random.key(0), x)
    results["global_block"] = timed(
        lambda p, x, c: gblk.apply(p, x + c.astype(x.dtype) * 0), (gp, x),
        args.steps)

    # ---- MLP-free pieces: bare windowed attention op ----
    NW = 25  # ceil(64/14)^2
    BHW = B * NW * HEADS
    qw = jnp.asarray(rng.standard_normal((BHW, 196, HD)), jnp.bfloat16)
    rh = jnp.asarray(rng.standard_normal((BHW, 196, 14)), jnp.bfloat16)
    rw = jnp.asarray(rng.standard_normal((BHW, 196, 14)), jnp.bfloat16)
    results["win_attn_op(relpos)"] = timed(
        lambda q, c: flash_attention_relpos(
            q + c.astype(q.dtype) * 0, q, q, rh, rw, HD ** -0.5, (14, 14)),
        (qw,), args.steps)

    # ---- bare global attention op ----
    BH = B * HEADS
    qg = jnp.asarray(rng.standard_normal((BH, GRID * GRID, HD)), jnp.bfloat16)
    rhg = jnp.asarray(rng.standard_normal((BH, GRID * GRID, GRID)), jnp.bfloat16)
    results["glob_attn_op(relpos)"] = timed(
        lambda q, c: flash_attention_relpos(
            q + c.astype(q.dtype) * 0, q, q, rhg, rhg, HD ** -0.5, (GRID, GRID)),
        (qg,), args.steps)

    # ---- dense-only: one MLP (ln + 768->3072->768) ----
    class MLPOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(x)
            y = nn.Dense(3072, dtype=jnp.bfloat16)(y)
            y = nn.gelu(y)
            return x + nn.Dense(768, dtype=jnp.bfloat16)(y)

    mlp = MLPOnly()
    mp = jax.jit(mlp.init)(jax.random.key(0), x)
    results["mlp_only"] = timed(
        lambda p, x, c: mlp.apply(p, x + c.astype(x.dtype) * 0), (mp, x),
        args.steps)

    # ---- qkv+proj dense only ----
    class QKVProj(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Dense(3 * 768, dtype=jnp.bfloat16)(x)
            return nn.Dense(768, dtype=jnp.bfloat16)(y[..., :768])

    qkv = QKVProj()
    qp = jax.jit(qkv.init)(jax.random.key(0), x)
    results["qkv_proj_only"] = timed(
        lambda p, x, c: qkv.apply(p, x + c.astype(x.dtype) * 0), (qp, x),
        args.steps)

    # ---- patch embed + neck ----
    class PatchNeck(nn.Module):
        @nn.compact
        def __call__(self, img):
            y = nn.Conv(768, (16, 16), strides=(16, 16), dtype=jnp.bfloat16)(img)
            z = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16)(y)
            z = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(z)
            return z

    img = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)
    pn = PatchNeck()
    pnp = jax.jit(pn.init)(jax.random.key(0), img)
    results["patch+neck"] = timed(
        lambda p, i, c: pn.apply(p, i + c.astype(i.dtype) * 0), (pnp, img),
        args.steps)

    total = 8 * results["windowed_block"] + 4 * results["global_block"] + \
        results["patch+neck"]
    for k, v in results.items():
        print(f"{k:28s} {v * 1e3:8.2f} ms")
    print(f"{'reconstructed_total':28s} {total * 1e3:8.2f} ms "
          f"(8*win + 4*glob + patch/neck)")
    print(f"{'implied img/s':28s} {args.batch / total:8.2f}")


if __name__ == "__main__":
    main()
