"""Calibrate raw XLA matmul/VPU throughput at the SAM attention shapes, to
establish the floor the Pallas kernels should be judged against."""

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
        # full-sum consumption: slicing (out[0,0]) would let XLA sink the
        # slice through the einsum and skip most of the work
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
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    cases = {
        # global attention QK: (BH, HW, D) x (BH, HW, D) -> scores
        "QK k=64 (96,4096,64)": (arr(96, 4096, 64), arr(96, 4096, 64),
                                 lambda a, b: jnp.einsum("bqd,bkd->bqk", a, b)),
        # bias expand: (BH, HW, 128) x (128, HW)
        "bias (96,4096,128)@(128,4096)": (
            arr(96, 4096, 128), arr(128, 4096),
            lambda a, b: jnp.einsum("bqr,rk->bqk", a, b)),
        # merged: K=192
        "QKaug k=192 (96,4096,192)": (arr(96, 4096, 192), arr(96, 4096, 192),
                                      lambda a, b: jnp.einsum("bqd,bkd->bqk", a, b)),
        # PV at 1/4 scale to bound HBM traffic (scale x4 to compare)
        "PV (24,4096,4096)@(...,64)": (
            arr(24, 4096, 4096), arr(24, 4096, 64),
            lambda a, b: jnp.einsum("bqk,bkd->bqd", a, b)),
        # windowed QK
        "winQK (2400,196,64)": (arr(2400, 196, 64), arr(2400, 196, 64),
                                lambda a, b: jnp.einsum("bqd,bkd->bqk", a, b)),
        # windowed PV
        "winPV (2400,196,196)@(..,64)": (
            arr(2400, 196, 196), arr(2400, 196, 64),
            lambda a, b: jnp.einsum("bqk,bkd->bqd", a, b)),
        # VPU: exp2 over a big fp32 tile
        "exp2 (96,4096,512)fp32": (
            jnp.asarray(rng.standard_normal((96, 4096, 512)), jnp.float32),
            jnp.float32(1),
            lambda a, b: jnp.exp2(a * b)),
        # VPU: exp2 + cast bf16
        "exp2+cast (96,4096,512)": (
            jnp.asarray(rng.standard_normal((96, 4096, 512)), jnp.float32),
            jnp.float32(1),
            lambda a, b: jnp.exp2(a * b).astype(jnp.bfloat16)),
    }

    noop = timed(lambda t, c: (t + c).reshape(1, 1), (jnp.float32(1),), steps=20)
    print(f"{'case':34s} {'ms':>8s} {'net ms':>8s} {'TFLOP/s':>9s}")
    for name, (a, b, f) in cases.items():
        def fn(x, y, c, f=f):
            return f(x + c.astype(x.dtype) * 0, y)

        t = timed(fn, (a, b))
        net = t - noop
        if "exp2" in name:
            fl = 0.0
        elif a.ndim == 3 and b.ndim == 2:
            fl = 2 * a.shape[0] * a.shape[1] * a.shape[2] * b.shape[1]
        elif "PV" in name:
            fl = 2 * a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2]
        else:
            fl = 2 * a.shape[0] * a.shape[1] * a.shape[2] * b.shape[1]
        print(f"{name:34s} {t * 1e3:8.2f} {net * 1e3:8.2f} "
              f"{fl / max(net, 1e-9) / 1e12:9.1f}")


if __name__ == "__main__":
    main()
