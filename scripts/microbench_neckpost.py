"""Drill into the decode step's neck (~1.0 ms) and postprocess (~0.9 ms).

Both are far above their FLOP/bandwidth floors; this probe times op-level
variants to find the lost time. Run on the real chip.
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from labelanything_tpu.models.lam import Neck, get_preprocess_shape
from labelanything_tpu.models.common import LayerNorm2d
from labelanything_tpu.ops.resize import resize_bilinear

STEPS = 64
REPS = 3
_NEG_INF = -1e4


def timed_loop(fn, *args):
    @jax.jit
    def loop(c, *args):
        return jax.lax.fori_loop(0, STEPS, lambda i, c: fn(c, *args), c)

    float(loop(jnp.float32(0), *args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(loop(jnp.float32(0), *args))
        ts.append((time.perf_counter() - t0) / STEPS)
    return min(ts)


def run(name, fn, *args):
    t = timed_loop(fn, *args)
    print(f"{name:42s} {t*1e3:7.3f} ms")
    return t


def main():
    rng = jax.random.key(0)

    # ---- neck: (32, 30, 30, 768) fp32 -> conv1x1 768->256, LN, conv3x3, LN
    x32 = jax.random.normal(rng, (32, 30, 30, 768), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    neck = Neck(embed_dim=256, dtype=jnp.bfloat16)
    nparams = jax.jit(neck.init)(rng, x16)

    def full_neck(c, p, x):
        out = neck.apply(p, x + c.astype(x.dtype) * 0)
        return c + jnp.sum(out.astype(jnp.float32))

    run("neck full (fp32 in)", full_neck, nparams, x32)
    run("neck full (bf16 in)", full_neck, nparams, x16)

    w1 = jax.random.normal(rng, (768, 256), jnp.bfloat16)
    w2 = jax.random.normal(rng, (3, 3, 256, 256), jnp.bfloat16)

    def conv1_only(c, x, w):
        y = jnp.einsum("bhwd,dc->bhwc", x + c.astype(x.dtype) * 0, w)
        return c + jnp.sum(y.astype(jnp.float32))

    run("conv1x1 einsum (fp32 in)", conv1_only, x32, w1)
    run("conv1x1 einsum (bf16 in)", conv1_only, x16, w1)

    y16 = jax.random.normal(rng, (32, 30, 30, 256), jnp.bfloat16)

    def conv3_xla(c, x, w):
        y = jax.lax.conv_general_dilated(
            x + c.astype(x.dtype) * 0, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.sum(y.astype(jnp.float32))

    run("conv3x3 XLA conv", conv3_xla, y16, w2)

    def conv3_mm(c, x, w):
        xx = x + c.astype(x.dtype) * 0
        xx = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xx[:, i:i + 30, j:j + 30] for i in range(3) for j in range(3)]
        xx = jnp.concatenate(cols, axis=-1)  # (32,30,30,2304)
        y = jnp.einsum("bhwk,kc->bhwc", xx, w.reshape(-1, 256))
        return c + jnp.sum(y.astype(jnp.float32))

    run("conv3x3 as im2col matmul", conv3_mm, y16, w2)

    ln = LayerNorm2d(256, dtype=jnp.bfloat16)
    lparams = jax.jit(ln.init)(rng, y16)

    def ln_only(c, p, x):
        y = ln.apply(p, x + c.astype(x.dtype) * 0)
        return c + jnp.sum(y.astype(jnp.float32))

    run("LayerNorm2d", ln_only, lparams, y16)

    # ---- postprocess: (16, 6, 120, 120) bf16 -> resize 480 -> mask
    seg = jax.random.normal(rng, (16, 6, 120, 120), jnp.bfloat16)
    dims = jnp.tile(jnp.asarray([[480.0, 360.0]], jnp.float32), (16, 2, 1)).reshape(16, 2, 2)

    def post_full(c, s, d):
        s = s + c.astype(s.dtype) * 0
        s = resize_bilinear(s, (480, 480))
        qd = d.reshape(d.shape[0], -1, 2)[:, 0, :]
        ih, iw = get_preprocess_shape(qd[:, 0], qd[:, 1], 480)
        rows = jnp.arange(480)[None, :] < ih[:, None]
        cols = jnp.arange(480)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]
        s = jnp.where(valid[:, None], s, _NEG_INF)
        bg = jnp.where(valid, s[:, 0], 0.0)
        out = jnp.concatenate([bg[:, None], s[:, 1:]], axis=1)
        return c + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0).astype(jnp.float32))

    run("postprocess full", post_full, seg, dims)

    def post_resize_only(c, s, d):
        s = s + c.astype(s.dtype) * 0
        s = resize_bilinear(s, (480, 480))
        return c + jnp.sum(s.astype(jnp.float32))

    run("resize_bilinear only", post_resize_only, seg, dims)

    def post_resize_mm(c, s, d):
        # separable resize as two explicit matmuls on lane-friendly layouts
        s = s + c.astype(s.dtype) * 0
        h, w = s.shape[-2:]
        def weights(n_in, n_out):
            # align_corners=False half-pixel centers
            pos = (jnp.arange(n_out) + 0.5) * n_in / n_out - 0.5
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
            hi = jnp.clip(lo + 1, 0, n_in - 1)
            frac = jnp.clip(pos - lo, 0.0, 1.0)
            m = jnp.zeros((n_out, n_in))
            m = m.at[jnp.arange(n_out), lo].add(1 - frac)
            m = m.at[jnp.arange(n_out), hi].add(frac)
            return m.astype(s.dtype)
        wh = weights(h, 480)
        ww = weights(w, 480)
        s = jnp.einsum("bchw,Hh->bcHw", s, wh)
        s = jnp.einsum("bcHw,Ww->bcHW", s, ww)
        return c + jnp.sum(s.astype(jnp.float32))

    run("resize as two einsums", post_resize_mm, seg, dims)


if __name__ == "__main__":
    main()
