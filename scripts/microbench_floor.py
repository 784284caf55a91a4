"""Calibrate the fori_loop microbench harness floor on the tunneled chip.

If a trivial body costs ~0.4 ms/iter, every op-level number measured with
this harness carries that additive overhead and must be read relative.
"""
import time

import jax
import jax.numpy as jnp

REPS = 3


def timed_loop(fn, steps, *args):
    @jax.jit
    def loop(c, *args):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn(c, *args), c)

    float(loop(jnp.float32(0), *args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(loop(jnp.float32(0), *args))
        ts.append((time.perf_counter() - t0) / steps)
    return min(ts)


def main():
    rng = jax.random.key(0)
    tiny = jax.random.normal(rng, (8, 128), jnp.float32)

    def body_tiny(c, x):
        return c + jnp.sum(x * (c + 1.0))

    for steps in (16, 64, 256):
        t = timed_loop(body_tiny, steps, tiny)
        print(f"tiny body, steps={steps:4d}: {t*1e6:8.1f} us/iter")

    big = jax.random.normal(rng, (32, 30, 30, 256), jnp.bfloat16)

    def body_copy(c, x):
        y = x + c.astype(x.dtype) * 0
        return c + jnp.sum(y.astype(jnp.float32))

    t = timed_loop(body_copy, 64, big)
    print(f"copy+reduce 15MB bf16:   {t*1e6:8.1f} us/iter")

    def body_reduce(c, x):
        return c + jnp.sum(x.astype(jnp.float32)) * (c * 0 + 1)

    t = timed_loop(body_reduce, 64, big)
    print(f"reduce-only 15MB bf16:   {t*1e6:8.1f} us/iter")

    w = jax.random.normal(rng, (256, 256), jnp.bfloat16)

    def body_mm(c, x, w):
        y = jnp.einsum("bhwd,dc->bhwc", x + c.astype(x.dtype) * 0, w)
        return c + jnp.sum(y.astype(jnp.float32))

    t = timed_loop(body_mm, 64, big, w)
    print(f"copy+256x256 mm+reduce:  {t*1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
