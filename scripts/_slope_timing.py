"""Slope-based fori_loop timing for the tunneled TPU.

A single jitted call's round-trip (dispatch + scalar fetch) costs tens of ms
through the axon tunnel and is CONSTANT in the iteration count, so absolute
per-iter numbers from one loop are biased by overhead/steps. Timing the same
body at two step counts and taking the difference quotient cancels the
constant exactly:

    per_iter = (T(steps_hi) - T(steps_lo)) / (steps_hi - steps_lo)
"""
import time

import jax
import jax.numpy as jnp

STEPS_LO = 32
STEPS_HI = 288
REPS = 3


def _total(fn, steps, *args):
    @jax.jit
    def loop(c, *args):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn(c, *args), c)

    float(loop(jnp.float32(0), *args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(loop(jnp.float32(0), *args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_loop(fn, *args):
    """Seconds per body execution, tunnel round-trip cancelled."""
    t_lo = _total(fn, STEPS_LO, *args)
    t_hi = _total(fn, STEPS_HI, *args)
    return (t_hi - t_lo) / (STEPS_HI - STEPS_LO)


def run(name, fn, *args):
    t = timed_loop(fn, *args)
    print(f"{name:46s} {t*1e3:7.3f} ms")
    return t
