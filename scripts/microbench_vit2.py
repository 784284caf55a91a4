"""Dispatch-overhead-corrected ViT component timings.

Each component is timed as a STACK (n copies inside one jit) so the
per-dispatch tunnel latency (remote 'axon' TPU) is amortized; a no-op
dispatch is timed separately to quantify that overhead.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    from flax import linen as nn

    from labelanything_tpu.ops.flash_attention import flash_attention_relpos

    B, D, HEADS, GRID = args.batch, 768, 12, 64
    HD = D // HEADS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, GRID, GRID, D)), jnp.bfloat16)

    results = {}

    # ---- pure dispatch overhead ----
    tiny = jnp.float32(1.0)
    results[("noop_dispatch", 1)] = timed(lambda t, c: t + c, (tiny,),
                                          steps=20, reps=3)

    # ---- 12x MLP stack in one jit ----
    class MLPStack(nn.Module):
        n: int = 12

        @nn.compact
        def __call__(self, x):
            for _ in range(self.n):
                y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(x)
                y = nn.Dense(3072, dtype=jnp.bfloat16)(y)
                y = nn.gelu(y)
                x = x + nn.Dense(768, dtype=jnp.bfloat16)(y)
            return x

    mlp = MLPStack()
    mp = jax.jit(mlp.init)(jax.random.key(0), x)
    results[("mlp_ln_stack", 12)] = timed(
        lambda p, x, c: mlp.apply(p, x + c.astype(x.dtype) * 0), (mp, x),
        args.steps)

    # ---- 12x qkv+proj stack ----
    class QKVStack(nn.Module):
        n: int = 12

        @nn.compact
        def __call__(self, x):
            for _ in range(self.n):
                y = nn.Dense(3 * 768, dtype=jnp.bfloat16)(x)
                x = x + nn.Dense(768, dtype=jnp.bfloat16)(y[..., :768])
            return x

    qkv = QKVStack()
    qp = jax.jit(qkv.init)(jax.random.key(0), x)
    results[("qkv_proj_stack", 12)] = timed(
        lambda p, x, c: qkv.apply(p, x + c.astype(x.dtype) * 0), (qp, x),
        args.steps)

    # ---- 8x windowed attention ops in one jit ----
    NW, WTOK = 25, 196
    BHW = B * NW * HEADS
    qw = jnp.asarray(rng.standard_normal((BHW, WTOK, HD)), jnp.bfloat16)
    rh = jnp.asarray(rng.standard_normal((BHW, WTOK, 14)), jnp.bfloat16)

    def win8(q, c):
        q = q + c.astype(q.dtype) * 0
        for _ in range(8):
            q = flash_attention_relpos(q, q, q, rh, rh, HD ** -0.5, (14, 14))
        return q

    results[("win_attn_op", 8)] = timed(win8, (qw,), args.steps)

    # ---- 4x global attention ops in one jit ----
    BH = B * HEADS
    qg = jnp.asarray(rng.standard_normal((BH, GRID * GRID, HD)), jnp.bfloat16)
    rhg = jnp.asarray(rng.standard_normal((BH, GRID * GRID, GRID)), jnp.bfloat16)

    def glob4(q, c):
        q = q + c.astype(q.dtype) * 0
        for _ in range(4):
            q = flash_attention_relpos(q, q, q, rhg, rhg, HD ** -0.5,
                                       (GRID, GRID))
        return q

    results[("glob_attn_op", 4)] = timed(glob4, (qg,), args.steps)

    # ---- rel_h/rel_w einsum construction, 12x ----
    rh_table = jnp.asarray(rng.standard_normal((GRID, GRID, HD)), jnp.bfloat16)

    def relh12(q, c):
        q = q + c.astype(q.dtype) * 0
        acc = 0.0
        r_q = q.reshape(BH, GRID, GRID, HD)
        for _ in range(12):
            acc = acc + jnp.einsum("bhwc,hkc->bhwk", r_q, rh_table)
        return acc

    results[("rel_h_einsum", 12)] = timed(relh12, (qg,), args.steps)

    # ---- patch embed + neck (once) ----
    from labelanything_tpu.models.image_encoder import PatchEmbed

    class PatchNeck(nn.Module):
        @nn.compact
        def __call__(self, img):
            y = PatchEmbed(embed_dim=768, dtype=jnp.bfloat16)(img)
            z = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16)(y)
            z = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(z)
            return z

    img = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)
    pn = PatchNeck()
    pnp = jax.jit(pn.init)(jax.random.key(0), img)
    results[("patch+neck", 1)] = timed(
        lambda p, i, c: pn.apply(p, i + c.astype(i.dtype) * 0), (pnp, img),
        args.steps)

    # ---- full block stacks (4x windowed, 2x global) in one jit ----
    from labelanything_tpu.models.image_encoder import ViTBlock

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

    wstack = BlockStack(window=14, n=4)
    wp = jax.jit(wstack.init)(jax.random.key(0), x)
    results[("windowed_block", 4)] = timed(
        lambda p, x, c: wstack.apply(p, x + c.astype(x.dtype) * 0), (wp, x),
        args.steps)

    gstack = BlockStack(window=0, n=2)
    gp2 = jax.jit(gstack.init)(jax.random.key(0), x)
    results[("global_block", 2)] = timed(
        lambda p, x, c: gstack.apply(p, x + c.astype(x.dtype) * 0), (gp2, x),
        args.steps)

    over = results[("noop_dispatch", 1)]
    print(f"{'component':22s} {'total ms':>9s} {'per-copy ms':>12s} (overhead-corrected)")
    for (k, n), v in results.items():
        per = (v - over) / n
        print(f"{k:22s} {v * 1e3:9.2f} {per * 1e3:12.3f}")


if __name__ == "__main__":
    main()
