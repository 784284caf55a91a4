"""Decompose the patch+neck 4.3 ms: patch embed alone (current
reshape/transpose+matmul vs one einsum), the 1x1+LN+3x3+LN neck alone,
and LayerNorm2d cost."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


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
    from labelanything_tpu.models.common import LayerNorm2d
    from labelanything_tpu.models.image_encoder import PatchEmbed

    B = 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)

    noop = timed(lambda t, c: t + c, (jnp.float32(1),), steps=20)
    print(f"noop {noop * 1e3:.3f} ms", flush=True)

    pe = PatchEmbed(embed_dim=768, dtype=jnp.bfloat16)
    pp = jax.jit(pe.init)(jax.random.key(0), img)

    def pe_now(p, i, c):
        return pe.apply(p, i + c.astype(i.dtype) * 0)

    print(f"patch_embed current: {(timed(pe_now, (pp, img)) - noop) * 1e3:.3f}",
          flush=True)

    kern = pp["params"]["kernel"]  # (16, 16, 3, 768)
    bias = pp["params"]["bias"]

    def pe_einsum(k_, b_, i, c):
        i = i + c.astype(i.dtype) * 0
        x6 = i.reshape(B, 64, 16, 64, 16, 3)
        y = jnp.einsum("bipjqc,pqcd->bijd", x6, k_.astype(jnp.bfloat16))
        return y + b_.astype(jnp.bfloat16)

    print(f"patch_embed einsum:  "
          f"{(timed(pe_einsum, (kern, bias, img)) - noop) * 1e3:.3f}",
          flush=True)

    # neck alone on (B, 64, 64, 768)
    y = jnp.asarray(rng.standard_normal((B, 64, 64, 768)), jnp.bfloat16)

    class Neck(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16)(x)
            x = LayerNorm2d(256, dtype=jnp.bfloat16)(x)
            x = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(x)
            x = LayerNorm2d(256, dtype=jnp.bfloat16)(x)
            return x

    neck = Neck()
    npar = jax.jit(neck.init)(jax.random.key(0), y)
    print(f"neck (1x1+LN+3x3+LN): "
          f"{(timed(lambda p, x, c: neck.apply(p, x + c.astype(x.dtype) * 0), (npar, y)) - noop) * 1e3:.3f}",
          flush=True)

    ln = LayerNorm2d(256, dtype=jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((B, 64, 64, 256)), jnp.bfloat16)
    lp = jax.jit(ln.init)(jax.random.key(0), z)
    print(f"LayerNorm2d 256ch:   "
          f"{(timed(lambda p, x, c: ln.apply(p, x + c.astype(x.dtype) * 0), (lp, z)) - noop) * 1e3:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
