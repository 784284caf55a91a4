"""Model throughput benchmarks (the driver-facing ``bench.py`` at the repo
root and the ``benchmark`` CLI verb both call these).

Reference's only perf surface is a toy MLP timer (reference: cli.py:287-327);
here the benchmarks cover the two production-critical paths: SAM ViT-B
embedding extraction (the generate_embeddings north star) and episode
decoding on the flagship lam_no_vit config.

Timing methodology:
- The jitted step takes (params, x, carry) as ARGUMENTS — no closure
  constants — so the compile payload stays small (closure constants embed
  the full weights + input into the jaxpr, which overflowed the tunneled
  remote-compile endpoint with HTTP 413 in round 1).
- Each timed step chains its output into the next step's carry and the run
  is synced ONCE by fetching the final scalar: ``block_until_ready`` does
  not reliably block on the tunneled TPU backend, so scalar materialization
  is the only honest sync.
- We report the MEDIAN of ``reps`` timed runs, plus the run-to-run spread
  and an analytic MFU estimate when the chip's peak bf16 FLOPs are known.
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# Peak dense bf16 TFLOPs per chip, by PJRT device_kind substring.
_PEAK_BF16_TFLOPS = {
    "v6e": 918.0, "v6 lite": 918.0,
    "v5p": 459.0,
    "v5e": 197.0, "v5 lite": 197.0,
    "v4": 275.0,
    "v3": 123.0,
    "v2": 45.0,
}


def _peak_tflops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in _PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return None


def _timed_chain(chained, params, x, steps: int, reps: int):
    """Time ``steps`` chained dispatches of ``chained(params, x, carry)``,
    ``reps`` times; return (median sec/step, spread fraction).

    The carry threads through every step so XLA cannot elide or reorder
    steps; one final float() fetch is the only host sync per rep.
    """
    # Warmup: compile + 2 steps.
    carry = jnp.float32(0)
    for _ in range(2):
        carry = chained(params, x, carry)
    assert np.isfinite(float(carry)), "non-finite warmup output"

    times = []
    for _ in range(reps):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = chained(params, x, carry)
        total = float(carry)  # single sync
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return med / steps, spread


# (embed_dim, depth, n_global_layers) per SAM encoder size
# (reference: label_anything/models/build_encoder.py:14-60)
_VIT_DIMS = {"vit_b": (768, 12, 4), "vit_l": (1024, 24, 4),
             "vit_h": (1280, 32, 4)}


def _vit_flops_per_image(image_size: int, encoder: str = "vit_b") -> float:
    """Analytic matmul FLOPs for one SAM ViT forward at ``image_size``.

    ViTDet: patch 16, MLP ratio 4, window 14 with global attention at 4
    layers (reference: label_anything/models/build_encoder.py:14-60).
    Counts 2*M*N*K per matmul for qkv/proj/mlp, plus the two attention
    matmuls (windowed layers attend within padded 14x14 windows; global
    layers over the full grid), plus patch-embed and the neck convs.
    """
    d, layers, glob = _VIT_DIMS[encoder]
    mlp, win, patch = 4 * d, 14, 16
    g = image_size // patch            # token grid side (64 @ 1024px)
    s = g * g                          # tokens per image
    pad = -(-g // win) * win           # grid padded to window multiple
    n_windows = (pad // win) ** 2
    f_linear = 2 * s * d * (3 * d) + 2 * s * d * d + 2 * (2 * s * d * mlp)
    f_attn_global = 2 * 2 * s * s * d
    f_attn_window = 2 * 2 * n_windows * (win * win) ** 2 * d
    f_blocks = layers * f_linear + glob * f_attn_global + (layers - glob) * f_attn_window
    f_patch = 2 * s * (3 * patch * patch) * d
    f_neck = 2 * s * d * 256 + 2 * s * (256 * 9) * 256
    return float(f_blocks + f_patch + f_neck)


def bench_vit(batch_size=8, image_size=1024, steps=8, reps=3,
              encoder="vit_b", tp=False):
    """``tp=True`` builds the encoder with a tp_mesh over the local
    device(s), exercising the head-sharded shard_map attention path
    (ViTAttention._tp_attention) with the Pallas kernels alive — on one
    chip this is a (1, 1) mesh, so the number is directly comparable to
    the non-TP mode (it measures the TP code path's overhead)."""
    from labelanything_tpu.models.build_encoder import (build_vit_b,
                                                        build_vit_h,
                                                        build_vit_l)

    builders = {"vit_b": build_vit_b, "vit_l": build_vit_l,
                "vit_h": build_vit_h}
    kw = {}
    if tp:
        from labelanything_tpu.parallel.mesh import create_mesh
        n = len(jax.devices())
        tp_size = 2 if n % 2 == 0 and n > 1 else 1
        kw["tp_mesh"] = create_mesh(data=n // tp_size, model=tp_size)
    enc = builders[encoder](dtype=jnp.bfloat16, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch_size, image_size, image_size, 3)),
                    jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.key(0), x)

    @jax.jit
    def chained(params, x, carry):
        # Fold the carry into the input so the chain is a true dependency.
        out = enc.apply(params, x + carry.astype(x.dtype) * 0)
        return carry + jnp.sum(out.astype(jnp.float32))

    sec, spread = _timed_chain(chained, params, x, steps, reps)
    name = {"vit_b": "ViT-B", "vit_l": "ViT-L", "vit_h": "ViT-H"}[encoder]
    result = {
        "metric": f"images/sec/chip (SAM {name} {image_size}px embed, bf16, fused rel-pos attention)",
        "value": round(batch_size / sec, 2),
        "unit": "images/sec",
        "spread": round(spread, 3),
    }
    if tp:
        result["metric"] += " [tp-mode attention]"
    peak = _peak_tflops()
    if peak:
        achieved = _vit_flops_per_image(image_size, encoder) * batch_size / sec / 1e12
        result["mfu"] = round(achieved / peak, 3)
        result["device_kind"] = jax.devices()[0].device_kind
    return result


def bench_decode(batch_size=16, ways=5, shots=1, image_size=480, steps=48,
                 reps=3, device_loop=False):
    """Episode decoding throughput.

    Default mode dispatches one step per call (includes the host dispatch
    overhead — on the tunneled dev setup that is ~2-3 ms/step and dominates;
    production serving has none). ``device_loop=True`` runs every step
    inside ONE jitted fori_loop — a single dispatch per rep — measuring
    pure on-device throughput, representative of a pipelined server."""
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

    def one_step(params, batch, carry):
        b = dict(batch)
        emb = b[BatchKeys.EMBEDDINGS]
        b[BatchKeys.EMBEDDINGS] = emb + carry.astype(emb.dtype) * 0
        out = model.apply(params, b)
        logits = out[ResultDict.LOGITS]
        return carry + jnp.sum(jnp.where(jnp.isfinite(logits), logits, 0.0))

    if device_loop:
        @jax.jit
        def run_all(params, batch, carry):
            return jax.lax.fori_loop(
                0, steps, lambda i, c: one_step(params, batch, c), carry)

        # one dispatch covers `steps` chained episodes
        sec, spread = _timed_chain(run_all, params, batch, 1, reps)
        sec = sec / steps
        suffix = ", device loop"
    else:
        sec, spread = _timed_chain(jax.jit(one_step), params, batch, steps,
                                   reps)
        suffix = ""
    return {
        "metric": (f"episodes/sec ({ways}-way {shots}-shot decode, "
                   f"{image_size}px, bf16{suffix})"),
        "value": round(batch_size / sec, 2),
        "unit": "episodes/sec",
        "spread": round(spread, 3),
    }


def bench_train(batch_size=8, ways=5, shots=1, image_size=480, steps=24,
                reps=3):
    """Full training step throughput on the flagship lam_no_vit config:
    forward + focal loss + backward + AdamW update (the reference's hot loop,
    reference: experiment/run.py:425-590). The chained TrainState (donated)
    is the cross-step dependency; one scalar fetch per rep syncs."""
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.parallel.train_step import (init_train_state,
                                                       make_train_step)
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.train.optim import build_optimizer
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import BatchKeys, ResultDict

    c = ways + 1
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=batch_size, num_examples=shots, num_classes=c,
        image_size=image_size, embed_dim=768,
    ))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, gt = next(sub)

    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros(
                (batch_size, c, image_size, image_size)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros(
                (batch_size, shots, c, 256)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
    state = init_train_state(params, tx)
    train_step = make_train_step(model, loss, tx)

    def run(state, i):
        return train_step(state, batch, gt, jax.random.key(0), 1.0,
                          apply_update=True)

    # warmup: compile + 2 steps
    for i in range(2):
        state, aux = run(state, i)
    assert np.isfinite(float(aux["loss"])), "non-finite warmup loss"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(steps):
            state, aux = run(state, i)
        _ = float(aux["loss"])  # single sync per rep (states chain)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return {
        "metric": (f"train episodes/sec ({ways}-way {shots}-shot, "
                   f"{image_size}px, bf16, fwd+bwd+AdamW)"),
        "value": round(batch_size * steps / med, 2),
        "unit": "episodes/sec",
        "spread": round(spread, 3),
    }


