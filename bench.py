"""Benchmark entry point. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default mode benchmarks SAM ViT-B @1024 embedding extraction (the
generate_embeddings north star) in bf16 with the fused rel-pos Pallas
attention kernel. ``--mode decode`` benchmarks prompt-conditioned episode
decoding (prompt encoder + mask decoder) on the flagship lam_no_vit config.

Timing methodology: each timed step folds a step counter into the input and
reduces the output to a scalar fetched to the host — ``block_until_ready``
does not reliably block on the tunneled TPU backend, so scalar materialization
is the only honest sync.

``vs_baseline`` compares against ``BENCH_BASELINE.json`` (written with
``--update-baseline``); 1.0 when no baseline is recorded.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BENCH_BASELINE.json"


def _timed_scan(step_fn, steps: int, warmup: bool = True):
    """Time ``steps`` iterations of ``step_fn(i) -> scalar`` by chaining
    async dispatches through a carry and fetching ONE final scalar: the
    per-call host<->device round-trip (~30ms over the tunneled TPU) is paid
    once instead of per step, measuring pure device throughput. (A lax.scan
    wrapper would amortize equally but recompiles pathologically slowly on
    the remote-compile backend.)"""

    @jax.jit
    def chained(carry, i):
        return carry + step_fn(i)

    assert np.isfinite(float(chained(jnp.float32(0), jnp.int32(0))))
    if warmup:
        carry = jnp.float32(0)
        for i in range(2):
            carry = chained(carry, jnp.int32(i))
        float(carry)
    carry = jnp.float32(0)
    t0 = time.perf_counter()
    for i in range(steps):
        carry = chained(carry, jnp.int32(i + 10))
    total = float(carry)  # single sync
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return dt / steps


def bench_vit(batch_size=8, image_size=1024, steps=8):
    from labelanything_tpu.models.build_encoder import build_vit_b

    enc = build_vit_b(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch_size, image_size, image_size, 3)),
                    jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.key(0), x)

    def step(i):
        out = enc.apply(params, x + i.astype(x.dtype) * 0)
        return jnp.sum(out.astype(jnp.float32))

    sec = _timed_scan(step, steps)
    return {
        "metric": f"images/sec/chip (SAM ViT-B {image_size}px embed, bf16, fused rel-pos attention)",
        "value": round(batch_size / sec, 2),
        "unit": "images/sec",
    }


def bench_decode(batch_size=16, ways=5, shots=1, image_size=480, steps=16):
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.typing import BatchKeys, ResultDict

    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
    )
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=batch_size, num_examples=shots, num_classes=ways + 1,
        image_size=image_size, embed_dim=768,
    ))
    params = jax.jit(model.init)(jax.random.key(0), batch)

    def step(i):
        b = dict(batch)
        b[BatchKeys.EMBEDDINGS] = b[BatchKeys.EMBEDDINGS] + i.astype(
            b[BatchKeys.EMBEDDINGS].dtype) * 0
        out = model.apply(params, b)
        logits = out[ResultDict.LOGITS]
        return jnp.sum(jnp.where(jnp.isfinite(logits), logits, 0.0))

    sec = _timed_scan(step, steps)
    return {
        "metric": f"episodes/sec ({ways}-way {shots}-shot decode, {image_size}px, bf16)",
        "value": round(batch_size / sec, 2),
        "unit": "episodes/sec",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["vit", "decode"], default="vit")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    result = bench_vit() if args.mode == "vit" else bench_decode()

    baselines = {}
    if BASELINE_FILE.exists():
        baselines = json.loads(BASELINE_FILE.read_text())
    base = baselines.get(result["metric"])
    result["vs_baseline"] = round(result["value"] / base, 3) if base else 1.0

    if args.update_baseline:
        baselines[result["metric"]] = result["value"]
        BASELINE_FILE.write_text(json.dumps(baselines, indent=2))

    print(json.dumps(result))


if __name__ == "__main__":
    main()
