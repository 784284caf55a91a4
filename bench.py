"""Benchmark entry point. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default mode benchmarks prompt-conditioned episode decoding (prompt encoder +
mask decoder, the LAM hot path at inference/training time) on the canonical
flagship config: lam_no_vit @480px/256-dim, 5-way 1-shot episodes, bf16
compute. ``--mode vit`` benchmarks SAM ViT-B @1024 embedding extraction
(the generate_embeddings north star).

``vs_baseline`` compares against ``BENCH_BASELINE.json`` (written with
``--update-baseline``), enabling round-over-round tracking; 1.0 when no
baseline is recorded.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BENCH_BASELINE.json"


def bench_decode(batch_size=16, ways=5, shots=1, image_size=480, steps=30):
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit

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
    fwd = jax.jit(model.apply)

    jax.block_until_ready(fwd(params, batch))  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    eps = batch_size * steps / dt
    return {
        "metric": f"episodes/sec ({ways}-way {shots}-shot decode, {image_size}px, bf16)",
        "value": round(eps, 2),
        "unit": "episodes/sec",
    }


def bench_vit(batch_size=8, image_size=1024, steps=10):
    from labelanything_tpu.models.build_encoder import build_vit_b

    enc = build_vit_b(dtype=jnp.bfloat16)
    x = jnp.zeros((batch_size, image_size, image_size, 3), jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.key(0), x)
    fwd = jax.jit(enc.apply)

    jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = batch_size * steps / dt
    return {
        "metric": f"images/sec/chip (SAM ViT-B {image_size}px embed, bf16)",
        "value": round(ips, 2),
        "unit": "images/sec",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["decode", "vit"], default="decode")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    result = bench_decode() if args.mode == "decode" else bench_vit()

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
