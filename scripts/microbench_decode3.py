"""A/B variants for the remaining decode stages (neck, postprocess,
bench consumption) at bench shapes, slope-timed on the real chip.

Findings feed PERF.md; winners get implemented in the model/bench code.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from _slope_timing import timed_loop

B, M1, H, W, CIN, C = 16, 2, 30, 30, 768, 256
NCLS, S = 6, 480


def nudge(c, x):
    return x + (c * 0).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * M1, H, W, CIN)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, CIN, C)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    g1 = jnp.ones((C,), jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)

    def ln(y):
        m = y.mean(-1, keepdims=True)
        v = ((y - m) ** 2).mean(-1, keepdims=True)
        return ((y - m) * jax.lax.rsqrt(v + 1e-6) * g1 + b1).astype(y.dtype)

    # --- neck variants -------------------------------------------------- #
    def neck_conv(c, x):
        y = jax.lax.conv_general_dilated(
            nudge(c, x), w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = ln(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = ln(y)
        return c + jnp.sum(y.astype(jnp.float32))

    def neck_shiftmm(c, x):
        y = nudge(c, x).reshape(B * M1 * H * W, CIN) @ w1.reshape(CIN, C)
        y = ln(y).reshape(B * M1, H, W, C)
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        o = jnp.zeros((B * M1, H, W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                o = o + jnp.einsum(
                    "bhwc,cd->bhwd", yp[:, dy:dy + H, dx:dx + W, :],
                    w2[dy, dx], preferred_element_type=jnp.float32)
        y = ln(o.astype(x.dtype))
        return c + jnp.sum(y.astype(jnp.float32))

    def neck_im2col(c, x):
        y = nudge(c, x).reshape(B * M1 * H * W, CIN) @ w1.reshape(CIN, C)
        y = ln(y).reshape(B * M1, H, W, C)
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [yp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
             for dx in range(3)], axis=-1)
        y = cols.reshape(B * M1 * H * W, 9 * C) @ w2.reshape(9 * C, C)
        y = ln(y.reshape(B * M1, H, W, C))
        return c + jnp.sum(y.astype(jnp.float32))

    for name, fn in [("neck conv (current)", neck_conv),
                     ("neck shift-matmul", neck_shiftmm),
                     ("neck im2col", neck_im2col)]:
        print(f"{name:26s} {timed_loop(fn, x) * 1e3:7.3f} ms")

    # --- postprocess variants ------------------------------------------ #
    seg = jnp.asarray(rng.standard_normal((B, NCLS, 120, 120)), jnp.float32)
    dims = jnp.tile(jnp.asarray([[448, 480]], jnp.float32), (B, 1))
    ih = jnp.full((B,), 448)
    iw = jnp.full((B,), 480)
    neg = jnp.float32(-1e30)

    def post_current(c, seg):
        y = jax.image.resize(nudge(c, seg), (B, NCLS, S, S), "bilinear",
                             antialias=False)
        rows = jnp.arange(S)[None, :] < ih[:, None]
        cols = jnp.arange(S)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]
        y = jnp.where(valid[:, None], y, neg)
        bg = jnp.where(valid, y[:, 0], 0.0)
        y = jnp.concatenate([bg[:, None], y[:, 1:]], axis=1)
        return c + jnp.sum(jnp.where(jnp.isfinite(y), y, 0.0))

    def _interp_matrix(n_in, n_out, dtype):
        # align_corners=False bilinear weights as a dense (n_out, n_in)
        pos = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo = jnp.clip(jnp.floor(pos), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w_hi = jnp.clip(pos - lo, 0.0, 1.0)
        i = jnp.arange(n_in)[None, :]
        m = ((i == lo[:, None]) * (1 - w_hi[:, None])
             + (i == hi[:, None]) * w_hi[:, None])
        return m.astype(dtype)

    def post_matmul_fused(c, seg):
        mat = _interp_matrix(120, S, jnp.float32)
        y = jnp.einsum("bchw,Hh->bcHw", nudge(c, seg), mat)
        y = jnp.einsum("bchw,Ww->bchW", y, mat)
        rows = jnp.arange(S)[None, :] < ih[:, None]
        cols = jnp.arange(S)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]
        fill = jnp.concatenate([jnp.zeros((1,)), jnp.full((NCLS - 1,), neg)])
        y = jnp.where(valid[:, None], y, fill[None, :, None, None])
        return c + jnp.sum(jnp.where(jnp.isfinite(y), y, 0.0))

    def post_bf16(c, seg):
        mat = _interp_matrix(120, S, jnp.bfloat16)
        y = jnp.einsum("bchw,Hh->bcHw", nudge(c, seg).astype(jnp.bfloat16),
                       mat)
        y = jnp.einsum("bchw,Ww->bchW", y, mat).astype(jnp.float32)
        rows = jnp.arange(S)[None, :] < ih[:, None]
        cols = jnp.arange(S)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]
        fill = jnp.concatenate([jnp.zeros((1,)), jnp.full((NCLS - 1,), neg)])
        y = jnp.where(valid[:, None], y, fill[None, :, None, None])
        return c + jnp.sum(jnp.where(jnp.isfinite(y), y, 0.0))

    for name, fn in [("post current+consume", post_current),
                     ("post matmul fused-fill", post_matmul_fused),
                     ("post bf16 matmul", post_bf16)]:
        print(f"{name:26s} {timed_loop(fn, seg) * 1e3:7.3f} ms")

    # --- consumption-only variants (bench harness overhead) ------------- #
    logits = jnp.where(
        jnp.asarray(rng.standard_normal((B, NCLS, S, S)), jnp.float32) > 2.5,
        -jnp.inf, 1.0)

    def consume_isfinite(c, y):
        y = nudge(c, y)
        return c + jnp.sum(jnp.where(jnp.isfinite(y), y, 0.0))

    def consume_max(c, y):
        y = nudge(c, y)
        return c + jnp.sum(jnp.maximum(y, -1e30))

    for name, fn in [("consume isfinite-where", consume_isfinite),
                     ("consume max-sum", consume_max)]:
        print(f"{name:26s} {timed_loop(fn, logits) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
