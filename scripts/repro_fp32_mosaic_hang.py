"""Repro probe for the fp32 Mosaic compile hang that originally gated the
fused attention backward to bf16 (ops/flash_attention.py:_fused_bwd_ok).

Round-4 recorded pathology (jax 0.6.x, TPU v5e): `_lanes_bwd_impl`'s
multi-q-block backward grid — a 3-D grid whose last dimension is a
reduction over q-blocks with dk/dv accumulated in fp32 VMEM scratch across
grid steps — compiled in seconds for bf16 operands, but the fp32 variant
of the SAME shape never returned from the Mosaic compiler.

Round-5 re-examination ON THIS TOOLCHAIN (2026-08-20): the hang is FIXED —
fp32 compiles in ~4 s at the minimal 2-q-block shape and ~13 s at the
production B=6/N=4096 shape. The dtype gate nevertheless STAYS, now on
measured performance: the fused fp32 kernels run 458 ms (global) / 496 ms
(windowed) vs the q-chunked XLA recompute-VJP's 161 / 36.5 ms at the same
shapes (fp32 halves MXU throughput and VMEM blocking; block sizes are
bf16-tuned), so falling back IS the fast path for fp32.

Usage:

    python scripts/repro_fp32_mosaic_hang.py            # orchestrates both
    python scripts/repro_fp32_mosaic_hang.py --run bf16 # one compile, inline

The orchestrator compiles the bf16 variant inline, then launches the fp32
variant in a SUBPROCESS with a --timeout (default 180 s). Exit codes:
0 = fp32 hung (the round-4 pathology is back; the gate is load-bearing
as a compile guard again); 2 = fp32 compiled fine (current expected state
— before retiring the gate, re-measure the fused-vs-fallback fp32 timings
above; retire only if the fused path wins).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def compile_one(dtype_name: str, n: int = 1024) -> float:
    """Compile (not run) the fused lanes backward at a minimal multi-q-block
    shape; returns compile seconds. n=1024 -> block_q=512 -> 2 q-blocks,
    the smallest grid that exercises the cross-q-block scratch
    accumulation."""
    import jax
    import jax.numpy as jnp

    from labelanything_tpu.ops import flash_attention as fa

    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[dtype_name]
    heads, dh = 2, 64
    c = heads * dh
    kh, kw = 32, 32
    assert kh * kw == n
    qkv = jnp.zeros((1, n, 3 * c), dtype)
    r = jnp.zeros((1, n, heads * (kh + kw)), dtype)
    out = jnp.zeros((1, n, c), dtype)
    g = jnp.zeros((1, n, c), dtype)

    fn = jax.jit(lambda a, b, o, ct: fa._lanes_bwd_impl(
        a, b, o, ct, dh ** -0.5, (kh, kw), heads))
    t0 = time.perf_counter()
    fn.lower(qkv, r, out, g).compile()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", choices=["bf16", "fp32"], default=None,
                    help="compile one variant inline (used by the "
                         "orchestrator's subprocess)")
    ap.add_argument("--timeout", type=float, default=180.0)
    args = ap.parse_args()

    if args.run:
        sec = compile_one(args.run)
        print(f"{args.run}: compiled in {sec:.1f}s")
        return 0

    sec = compile_one("bf16")
    print(f"bf16 multi-q-block backward: compiled in {sec:.1f}s (expected)")

    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--run", "fp32"],
            timeout=args.timeout, capture_output=True, text=True)
        print(proc.stdout.strip())
        print(f"fp32 variant RETURNED in {time.perf_counter() - t0:.1f}s — "
              f"the Mosaic hang is fixed in this toolchain (current "
              f"expected state). The bf16 gate in _fused_bwd_ok remains on "
              f"PERFORMANCE grounds (fused fp32 measured ~3-14x slower "
              f"than the chunked XLA fallback; see module docstring) — "
              f"re-measure before retiring it.")
        return 2
    except subprocess.TimeoutExpired:
        print(f"fp32 variant HANG (killed after {args.timeout:.0f}s) — "
              f"the round-4 Mosaic pathology is BACK in this toolchain; "
              f"the bf16 gate in _fused_bwd_ok is load-bearing as a "
              f"compile guard.")
        return 0


if __name__ == "__main__":
    sys.exit(main())
