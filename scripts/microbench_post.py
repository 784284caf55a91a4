"""Postprocess-stage variants at decode shapes: dtype and fusion probes.

Times ``postprocess_masks_fixed`` semantics (matmul bilinear 120->480 +
pad-mask where) for fp32 vs bf16 logits, where fused vs skipped, on the
real chip. Carry-nudged fori_loop timing (see _slope_timing)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from labelanything_tpu.ops.resize import resize_bilinear
from _slope_timing import timed_loop

B, C, H, S = 16, 6, 120, 480
NEG = -1e9


def make_post(with_where, out_dtype=None):
    def post(c, seg, dims):
        seg = seg + c.astype(seg.dtype) * 0
        out = resize_bilinear(seg, (S, S))
        if out_dtype is not None:
            out = out.astype(out_dtype)
        if with_where:
            ih, iw = dims[:, 0], dims[:, 1]
            rows = jnp.arange(S)[None, :] < ih[:, None]
            cols = jnp.arange(S)[None, :] < iw[:, None]
            valid = rows[:, :, None] & cols[:, None, :]
            fill = jnp.full((C,), NEG, out.dtype).at[0].set(0.0)
            out = jnp.where(valid[:, None], out, fill[None, :, None, None])
        return c + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)
                           .astype(jnp.float32))
    return post


def main():
    key = jax.random.key(0)
    dims = jnp.stack([jnp.full((B,), 400), jnp.full((B,), 440)], -1)
    for dtype in (jnp.float32, jnp.bfloat16):
        seg = jax.random.normal(key, (B, C, H, H), dtype)
        for with_where in (True, False):
            ms = timed_loop(make_post(with_where), seg, dims) * 1e3
            print(f"dtype={dtype.__name__:9s} where={int(with_where)}: "
                  f"{ms:7.3f} ms", flush=True)
    # fp32 logits, bf16 interpolation+output (reads fp32 once, writes bf16)
    seg = jax.random.normal(key, (B, C, H, H), jnp.float32)

    def post_mixed(c, seg, dims):
        seg = (seg + c.astype(seg.dtype) * 0).astype(jnp.bfloat16)
        out = resize_bilinear(seg, (S, S))
        ih, iw = dims[:, 0], dims[:, 1]
        rows = jnp.arange(S)[None, :] < ih[:, None]
        cols = jnp.arange(S)[None, :] < iw[:, None]
        valid = rows[:, :, None] & cols[:, None, :]
        fill = jnp.full((C,), NEG, out.dtype).at[0].set(0.0)
        out = jnp.where(valid[:, None], out, fill[None, :, None, None])
        return c + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)
                           .astype(jnp.float32))

    ms = timed_loop(post_mixed, seg, dims) * 1e3
    print(f"fp32-in, bf16 interp+where:  {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
