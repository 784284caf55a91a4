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

import functools
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


def _compiled_flops(jitted, *args, **kwargs) -> float | None:
    """FLOPs of one call of ``jitted(*args, **kwargs)`` from XLA's compiled
    cost analysis (exact for matmul-dominated graphs; the vit mode
    cross-checks it against the hand-derived count to within a few %).
    Compiling here warms jax's jit cache, so the subsequent timed calls do
    not re-trace."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def _attach_mfu(result: dict, flops_per_call, sec: float) -> dict:
    peak = _peak_tflops()
    if peak and flops_per_call:
        result["mfu"] = round(flops_per_call / sec / 1e12 / peak, 3)
        result["device_kind"] = jax.devices()[0].device_kind
    return result


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
                 reps=3, device_loop=False, include_masks=True):
    """Episode decoding throughput.

    Default mode dispatches one step per call (includes the host dispatch
    overhead — on the tunneled dev setup that is ~2-3 ms/step and dominates;
    production serving has none). ``device_loop=True`` runs every step
    inside ONE jitted fori_loop — a single dispatch per rep — measuring
    pure on-device throughput, representative of a pipelined server.

    ``include_masks=False`` benches points/boxes-only episodes (the
    interactive-serving common case), which engage the rank-1 shared-keys
    fusion fast path (ops/twoway_blockdiag.py)."""
    from labelanything_tpu.data.synthetic import random_batch
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.typing import BatchKeys, ResultDict

    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
    )
    # TWO distinct episode batches, stacked leaf-wise; each step reads slot
    # i % 2 via dynamic_slice. Inputs vary per step like a real serving
    # stream, so XLA cannot hoist input-only work (neck, prompt embedding)
    # out of the loop — a carry-nudge on one input leaf lets every stage
    # that does not consume that leaf become loop-invariant and measures a
    # fantasy number.
    batches = [jax.tree.map(jnp.asarray, random_batch(
        batch_size=batch_size, num_examples=shots, num_classes=ways + 1,
        image_size=image_size, embed_dim=768, seed=s,
        include_masks=include_masks,
    )) for s in (0, 1)]
    stream = jax.tree.map(lambda a, b: jnp.stack([a, b]), *batches)
    params = jax.jit(model.init)(jax.random.key(0), batches[0])

    def one_step(params, stream, carry, idx):
        cnt, acc = carry
        # the stream slot is derived from the LOOP INDEX, not the carried
        # counter: the next step's input slice then has no data dependence
        # on this step's output, so XLA overlaps the episode-stream copy
        # with the current step's compute (with a carried cnt the copy
        # serialized behind the whole step: ~12% of decode, PERF.md)
        b = jax.tree.map(
            lambda s: jax.lax.dynamic_index_in_dim(s, idx % 2, 0,
                                                   keepdims=False), stream)
        out = model.apply(params, b)
        logits = out[ResultDict.LOGITS]
        return (cnt + 1,
                acc + jnp.sum(jnp.where(jnp.isfinite(logits), logits, 0.0)))

    carry0 = (jnp.int32(0), jnp.float32(0))
    step_flops = _compiled_flops(jax.jit(one_step), params, stream, carry0,
                                 jnp.int32(0))
    jitted = jax.jit(one_step)
    if device_loop:
        @jax.jit
        def run_all(params, stream, carry):
            return jax.lax.fori_loop(
                0, steps, lambda i, c: one_step(params, stream, c, i), carry)

        def run_rep():  # one dispatch covers `steps` chained episodes
            return run_all(params, stream, carry0)

        suffix = ", device loop"
    else:
        idx_dev = (jnp.int32(0), jnp.int32(1))  # pre-staged, no per-step put

        def run_rep():
            carry = carry0
            for i in range(steps):
                carry = jitted(params, stream, carry, idx_dev[i % 2])
            return carry

        suffix = ""
    if not include_masks:
        suffix = ", no-masks" + suffix

    assert np.isfinite(float(run_rep()[1])), "non-finite warmup output"
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        total = float(run_rep()[1])  # single sync per rep
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    sec = med / steps
    return _attach_mfu({
        "metric": (f"episodes/sec ({ways}-way {shots}-shot decode, "
                   f"{image_size}px, bf16{suffix})"),
        "value": round(batch_size / sec, 2),
        "unit": "episodes/sec",
        "spread": round(spread, 3),
    }, step_flops, sec)


def bench_train(batch_size=8, ways=5, shots=1, image_size=480, steps=24,
                reps=3, device_loop=False, include_masks=True):
    """Full training step throughput on the flagship lam_no_vit config:
    forward + focal loss + backward + AdamW update (the reference's hot loop,
    reference: experiment/run.py:425-590). The chained TrainState (donated)
    is the cross-step dependency; one scalar fetch per rep syncs.

    ``device_loop=True`` runs every step inside ONE jitted fori_loop over a
    2-slot episode stream (inputs vary per step, so nothing hoists) — a
    single dispatch per rep, measuring pure on-device training throughput;
    the default dispatch-per-step mode pays the tunneled dev setup's
    ~2-4 ms host round-trip on every ~7 ms step."""
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
        image_size=image_size, embed_dim=768, include_masks=include_masks,
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
                          apply_update=True, use_accum=False)

    step_flops = _compiled_flops(
        getattr(train_step, "jitted", train_step), state, batch, gt,
        jax.random.key(0), loss_scale=1.0, apply_update=True,
        use_accum=False)
    if device_loop:
        # second, distinct episode batch for the 2-slot input stream
        full2 = jax.tree.map(jnp.asarray, random_full_batch(
            batch_size=batch_size, num_examples=shots, num_classes=c,
            image_size=image_size, embed_dim=768, seed=1,
            include_masks=include_masks,
        ))
        sub2 = Substitutor(num_points=1, substitute=False)
        sub2.reset(full2)
        batch2, gt2 = next(sub2)
        stream = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                              (batch, gt), (batch2, gt2))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_all(state, stream):
            def body(i, st):
                b, g = jax.tree.map(
                    lambda s: jax.lax.dynamic_index_in_dim(
                        s, i % 2, 0, keepdims=False), stream)
                st, _ = train_step.raw(st, b, g, jax.random.key(0), 1.0,
                                       apply_update=True, use_accum=False)
                return st
            return jax.lax.fori_loop(0, steps, body, state)

        state = run_all(state, stream)  # warmup compile
        assert int(state.step) == steps  # sync + sanity
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state = run_all(state, stream)
            _ = int(state.step)  # single sync per rep
            times.append(time.perf_counter() - t0)
    else:
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
    return _attach_mfu({
        "metric": (f"train episodes/sec ({ways}-way {shots}-shot, "
                   f"{image_size}px, bf16, fwd+bwd+AdamW"
                   + ("" if include_masks else ", no-masks")
                   + (", device loop)" if device_loop else ")")),
        "value": round(batch_size * steps / med, 2),
        "unit": "episodes/sec",
        "spread": round(spread, 3),
    }, step_flops, med / steps)


def bench_finetune(batch_size=2, ways=1, shots=2, image_size=1024, steps=6,
                   reps=3, include_masks=True, encoder_remat="none"):
    """Images-path fine-tune step throughput: SAM ViT-B @1024px / embed 512
    trained END TO END (forward + focal loss + backward through the full
    encoder + AdamW), the configuration of the reference's released SAM
    checkpoint (reference: README.md:64-71; trained rel-pos path:
    models/image_encoder.py:340-376; recipe anchor:
    parameters/trainval/coco20i/mae.yaml with the SAM encoder swap).

    This is the regression instrument for the trained path — the fused
    Pallas attention BACKWARD kernels (ops/flash_attention.py) only show up
    here, not in the forward-only vit mode. Reports img/s (fwd+bwd) and MFU
    against 3x the forward FLOPs estimate (fwd + 2x bwd for the dense path;
    XLA's own cost analysis does not see inside custom_vjp kernels).

    ``encoder_remat`` selects the rematerialization policy ("none", "full",
    "attn", "dots" — models/image_encoder.py). Default "none": the round-5
    remat-tax measurement (PERF.md) found no-remat fits this batch with
    headroom (9.62/16 GB AOT) and runs 228.7 ms/step (MFU 0.374) vs full
    remat's 282 ms (0.304); the partial policies recovered almost nothing
    (attn 279.1, dots 275.2) because the recompute saved is dominated by
    the dense glue, not the attention kernels. "full" remains the fallback
    for bigger batches/models where activations don't fit."""
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.models.build_lam import build_lam_vit_b
    from labelanything_tpu.parallel.train_step import (init_train_state,
                                                       make_train_step)
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.train.optim import build_optimizer
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import BatchKeys, ResultDict

    c = ways + 1
    remat = False if encoder_remat in ("none", False, None) else encoder_remat
    model = build_lam_vit_b(
        embed_dim=512, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16, remat_encoder=remat,
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=batch_size, num_examples=shots, num_classes=c,
        image_size=image_size, with_images=True,
        include_masks=include_masks,
    ))
    full.pop(BatchKeys.EMBEDDINGS, None)
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, gt = next(sub)

    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros(
                (batch_size, c, image_size, image_size)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros(
                (batch_size, shots, c, 512)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
    state = init_train_state(params, tx)
    train_step = make_train_step(model, loss, tx)

    def run(state):
        return train_step(state, batch, gt, jax.random.key(0), 1.0,
                          apply_update=True, use_accum=False)

    # warmup: compile + 2 steps
    for _ in range(2):
        state, aux = run(state)
    assert np.isfinite(float(aux["loss"])), "non-finite warmup loss"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = run(state)
        _ = float(aux["loss"])  # single sync per rep (states chain)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    sec = med / steps
    imgs = batch_size * (shots + 1)
    # fwd + backward ~= 3x forward matmul FLOPs for the encoder-dominated
    # step (each matmul's VJP is two matmuls of the same size)
    train_flops = 3.0 * _vit_flops_per_image(image_size, "vit_b") * imgs
    remat_tag = "" if encoder_remat == "none" else f", remat={encoder_remat}"
    return _attach_mfu({
        "metric": (f"train images/sec (SAM ViT-B {image_size}px fine-tune, "
                   f"{ways}-way {shots}-shot batch {batch_size}, bf16, "
                   f"fwd+bwd+AdamW{remat_tag})"),
        "value": round(imgs / sec, 2),
        "unit": "images/sec",
        "spread": round(spread, 3),
        "ms_per_step": round(sec * 1e3, 1),
    }, train_flops, sec)


def bench_gradcheck():
    """On-hardware gradient check for the fused Pallas attention backward
    kernels (``bench.py --gradcheck``).

    The interpret-mode parity tests (tests/test_ops.py) run the kernels on
    CPU without Mosaic involvement; a compiled-kernel numerics bug on the
    real chip would pass them. This check runs the PRODUCTION path on the
    current device: for both lane-layout kernels at SAM-1024 fine-tune
    shapes (global: B=6 images, N=4096 tokens; windowed: G=150 windows,
    N=196), it takes ``jax.vjp`` through the public custom_vjp function
    (forward kernel -> fused backward kernel, bf16 — the trained policy)
    and compares dqkv/dr against the q-chunked XLA recompute-VJP reference
    on the SAME bf16 operands.

    Tolerance is principled, not a magic constant: the same reference is
    also evaluated on fp32 upcasts of the operands, and the fused-vs-ref
    diff must stay within 4x the ref's own bf16-vs-fp32 rounding floor
    (plus 1e-6 absolute). Reports the worst per-leaf ratio."""
    from labelanything_tpu.ops import flash_attention as fa

    assert not fa._fused_bwd_disabled(), \
        "LA_TPU_DISABLE_FUSED_BWD is set; gradcheck must run the fused path"
    assert fa._fused_bwd_ok(jnp.bfloat16)

    cases = [
        # (label, kernel, (rows, tokens), grid_hw, heads)
        ("global_B6_N4096", fa.flash_attention_relpos_lanes,
         (6, 4096), (64, 64), 12),
        ("windowed_G150_N196", fa.flash_attention_relpos_lanes_batched,
         (150, 196), (14, 14), 12),
    ]
    out_cases = {}
    worst = 0.0
    for label, kernel, (b, n), grid_hw, heads in cases:
        dh = 64
        c = heads * dh
        scale = dh ** -0.5
        rng = np.random.default_rng(17)
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)), jnp.bfloat16)
        r = jnp.asarray(
            0.25 * rng.standard_normal((b, n, heads * sum(grid_hw))),
            jnp.bfloat16)
        ct = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)

        def grads(fn, a, rr, cot):
            _, vjp = jax.vjp(lambda x, y: fn(x, y, scale, grid_hw, heads),
                             a, rr)
            return vjp(cot)

        d_fused = jax.jit(functools.partial(grads, kernel))(qkv, r, ct)
        d_ref = jax.jit(functools.partial(grads, fa._lanes_xla_ref))(
            qkv, r, ct)
        d_ref32 = jax.jit(functools.partial(grads, fa._lanes_xla_ref))(
            qkv.astype(jnp.float32), r.astype(jnp.float32),
            ct.astype(jnp.float32))

        leaves = {}
        for leaf_name, f, x, x32 in (("dqkv", *map(np.asarray,
                                                   (d_fused[0], d_ref[0],
                                                    d_ref32[0]))),
                                     ("dr", *map(np.asarray,
                                                 (d_fused[1], d_ref[1],
                                                  d_ref32[1])))):
            f = f.astype(np.float32)
            x = x.astype(np.float32)
            diff = float(np.max(np.abs(f - x)))
            floor = float(np.max(np.abs(x - x32.astype(np.float32))))
            ratio = diff / (4.0 * floor + 1e-6)
            leaves[leaf_name] = {
                "max_abs_diff": round(diff, 6),
                "bf16_rounding_floor": round(floor, 6),
                "grad_scale": round(float(np.max(np.abs(x32))), 3),
                "ratio_vs_4x_floor": round(ratio, 3),
            }
            worst = max(worst, ratio)
        out_cases[label] = leaves
    return {
        "metric": ("gradcheck: fused Pallas attention bwd vs XLA "
                   "recompute-VJP, compiled on-chip, bf16 "
                   "(worst diff / 4x bf16 rounding floor; <1 passes)"),
        "value": round(worst, 4),
        "unit": "ratio",
        "pass": bool(worst < 1.0),
        "device_kind": jax.devices()[0].device_kind,
        "cases": out_cases,
    }


class _DeviceStreamLoader:
    """EpisodeLoader stand-in yielding pre-staged episode batches.

    Leaves are already device-resident with the Run's data sharding, so
    ``Run._device_batch``'s ``jnp.asarray``/``device_put`` are no-ops: what
    remains measurable is exactly the train loop's own host orchestration
    (substitutor scheduling, async metric flush, LUT folds, logging).

    Every yield hands out a FRESH on-device copy of the staged leaves: the
    fused pass program donates its batch argument (parallel/train_step.py
    make_pass_step), so replaying the same buffers would feed deleted
    arrays back to the device. A real loader always produces fresh arrays;
    the copy (an async device op, ~0.1 ms per ~60 MB batch) keeps the
    stand-in faithful to that contract."""

    def __init__(self, batches, num_steps: int):
        self.batches = batches
        self.num_steps = num_steps
        # ONE jitted dispatch per step for the whole-leaf copy: per-leaf
        # eager jnp.copy calls each pay the tunneled dispatch cost and
        # measured ~100 ms/step of host serialization
        self._copy = jax.jit(lambda d: jax.tree.map(jnp.copy, d))

    def __len__(self):
        return self.num_steps

    def set_epoch(self, epoch: int):
        pass

    def close(self):
        pass

    def __iter__(self):
        for i in range(self.num_steps):
            (device, gts), names = self.batches[i % len(self.batches)]
            arrs = {k: v for k, v in device.items()
                    if isinstance(v, jax.Array)}
            fresh = dict(device)
            fresh.update(self._copy(arrs))
            yield (fresh, gts), names


def bench_train_pipeline(batch_size=8, ways=5, shots=1, image_size=480,
                         steps=48, reps=3, include_masks=True,
                         probe_chunk=False, probe_host=False,
                         chunk_steps=8):
    """The ACTUAL ``Run.train_epoch`` driven over a device-resident synthetic
    episode stream, comparable head-to-head with ``--mode train
    --device-loop`` (same model/shapes/precision): the loop is de-synced when
    this lands within ~15% of the pure device-loop number.

    Pre-staging excludes host collate + host->device transfer by design —
    those belong to the loader benches (``--mode pipeline``); over the
    tunneled dev link a single episode batch's embeddings (~44 MB) would
    otherwise swamp the measurement. The reference's counterpart loop is
    experiment/run.py:425-590 (gathers every log_frequency)."""
    import tempfile
    from types import SimpleNamespace

    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.experiment.run import Run
    from labelanything_tpu.models.build_lam import build_lam_no_vit
    from labelanything_tpu.parallel.mesh import create_mesh, shard_batch
    from labelanything_tpu.train.checkpoint import CheckpointManager
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.typing import BatchKeys
    from labelanything_tpu.utils.logging import ExperimentLogger

    c = ways + 1
    tmp = tempfile.TemporaryDirectory(prefix="labench_pipe_")
    run = Run()
    run.params = {}
    run.seed = 0
    run.train_params = {"substitute": False, "check_nan": 0,
                        "memory_preflight": False,
                        "chunk_steps": chunk_steps}
    run.model_params = {"embed_dim": 256, "image_size": image_size}
    run.dataset_params = {}
    run.dataloader_params = {}
    run.mesh = create_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    run.data_sharding = NamedSharding(run.mesh, P("data"))
    run.num_processes = int(run.mesh.devices.size)
    run.tracker = ExperimentLogger(tmp.name, name="bench_pipeline")
    run.checkpoints = CheckpointManager(f"{tmp.name}/checkpoints")
    run.log_frequency = 10
    run.image_log_frequency = 0
    run.val_image_log_frequency = 0
    run.run_dir = tmp.name
    run.model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
    )
    run.loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                                 class_weighting=True)
    run.tx = None
    run.train_step = None
    run.eval_step = None
    run.image_size = image_size
    run.val_loaders = {}

    categories = {i: {"name": f"cat{i}"} for i in range(1, ways + 1)}
    run.train_dataset = SimpleNamespace(
        datasets={"syn": SimpleNamespace(categories=categories)})

    # two distinct pre-staged episode batches (a 2-slot stream, like the
    # device-loop bench) with the CLASSES host metadata the LUT fold needs
    host_classes = [[list(range(1, ways + 1))] * (shots + 1)] * batch_size
    staged = []
    for s in (0, 1):
        full = random_full_batch(
            batch_size=batch_size, num_examples=shots, num_classes=c,
            image_size=image_size, embed_dim=768, seed=s,
            include_masks=include_masks)
        gts = full[BatchKeys.GROUND_TRUTHS]
        device = shard_batch(jax.tree.map(jnp.asarray, full), run.mesh)
        # flag leaves stay HOST numpy: drop_absent_modalities reads them with
        # np.asarray, and a device-resident flag would cost a synchronous
        # tunnel fetch per step — in the real loader path these arrive as
        # numpy for free, so host flags is the faithful staging
        for key in (BatchKeys.FLAG_POINTS, BatchKeys.FLAG_BBOXES,
                    BatchKeys.FLAG_MASKS):
            if key in full:
                device[key] = np.asarray(full[key])
        device[BatchKeys.CLASSES] = host_classes
        staged.append(((device, gts), ("syn",)))
    run.train_loader = _DeviceStreamLoader(staged, steps)

    if probe_chunk:
        # capture the EXACT stacked chunk operand train_epoch dispatches
        # (chunk_step itself only exists after the lazy init inside the
        # warmup epoch; the stack output is NOT donated, so it stays valid)
        captured = {}
        orig_stack = run._stack_chunk

        def _capture(batches, luts):
            out = orig_stack(batches, luts)
            captured.setdefault("stacked", out)
            return out

        run._stack_chunk = _capture

    run.train_epoch(0)  # warmup: lazy init + compile both stream slots

    if probe_chunk:
        # the on-device chunk program ALONE (same lax.scan dispatch, same
        # per-step metric folds), no orchestration: the gap between this and
        # the Run.train_epoch number is host/orchestration cost; the gap
        # between this and --device-loop (bare step, NO metric folds) is the
        # real per-step metric work the loop adds.
        run._stack_chunk = orig_stack
        orig_chunk = run.chunk_step
        stacked_b, stacked_l = captured["stacked"]
        base_rng = jax.random.key(run.seed * 100003)  # epoch 0, as warmed
        reset = run._reset_flag(False)
        loss_scale = 1.0
        kwargs = dict(accumulate=False, substitute=False, gen_points=False)
        k_depth = int(stacked_l.shape[0])
        n_chunks = max(1, steps // k_depth)
        state, metrics = run.state, run._metrics_dev

        def chunk_once(state, metrics):
            return orig_chunk(state, metrics, stacked_b, stacked_l,
                              base_rng, reset, loss_scale, **kwargs)

        state, metrics, _ = chunk_once(state, metrics)  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state, metrics, _ = chunk_once(state, metrics)
            _ = float(metrics["loss_sum"])  # single sync per rep
            times.append(time.perf_counter() - t0)
        tmp.cleanup()
        med = statistics.median(times)
        spread = (max(times) - min(times)) / med if med else 0.0
        return {
            "metric": (f"train episodes/sec (chunk program alone, K="
                       f"{k_depth}, {ways}-way {shots}-shot {image_size}px, "
                       f"bf16, per-step device metric folds)"),
            "value": round(batch_size * k_depth * n_chunks / med, 2),
            "unit": "episodes/sec",
            "spread": round(spread, 3),
        }

    if probe_host:
        # host-only loop cost: the chunk dispatch becomes a no-op, so the
        # epoch time is pure orchestration Python (+ the _stack_chunk
        # dispatch). Run.train_epoch's wall time is ~max(host, device) under
        # async dispatch; this isolates the host term, which scales with
        # single-core CPU speed, not with the model. probe_host >= 2 also
        # no-ops the device stack, leaving pure Python bookkeeping.
        run.chunk_step = lambda state, metrics, b, l, rng, reset, ls, **k: (
            state, metrics, None)
        if int(probe_host) >= 2:
            run._stack_chunk = lambda batches, luts: (batches[0], luts[0])

    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        run.train_epoch(rep + 1)
        times.append(time.perf_counter() - t0)
    tmp.cleanup()
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return {
        "metric": (f"train episodes/sec (Run.train_epoch, device-resident "
                   f"stream, {ways}-way {shots}-shot {image_size}px, bf16"
                   + (", HOST-ONLY no-op dispatch" if probe_host else "")
                   + ("" if include_masks else ", no-masks") + ")"),
        "value": round(batch_size * steps / med, 2),
        "unit": "episodes/sec",
        "spread": round(spread, 3),
    }


def _write_synthetic_coco(root, n_images: int, image_size: int,
                          n_categories: int = 4, seed: int = 0) -> None:
    """Synthetic on-disk COCO (images + instances.json) for the images-path
    pipeline bench: real JPEG decode, resize, normalization, prompt
    tensorization — the host work the thread loader could not parallelize."""
    import json

    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations, ann_id = [], [], 1
    for i in range(1, n_images + 1):
        h = int(image_size * (0.8 + 0.4 * rng.random()))
        w = int(image_size * (0.8 + 0.4 * rng.random()))
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "images" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        for cat in range(1, n_categories + 1):
            x0 = int(rng.integers(0, w // 2))
            y0 = int(rng.integers(0, h // 2))
            bw = int(rng.integers(w // 8, w // 3))
            bh = int(rng.integers(h // 8, h // 3))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                                  x0, y0 + bh]],
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    inst = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": f"cat{c}"}
                           for c in range(1, n_categories + 1)]}
    (root / "instances.json").write_text(json.dumps(inst))


def bench_pipeline(batch_size=8, ways=2, shots=1, image_size=480, steps=8,
                   num_workers=4, use_processes=True, n_images=48,
                   root=None):
    """Images-path end-to-end training bench (the mae_noembs configuration:
    no precomputed embeddings, the ViT encoder runs in the train step —
    reference: parameters/trainval/coco20i/mae_noembs.yaml).

    Host pipeline: synthetic on-disk COCO -> EpisodeLoader (process workers
    by default, like dataloader.use_processes) -> Substitutor -> device
    train step (fwd + focal + bwd + AdamW on lam_mae_b). Reports
    episodes/sec plus the two utilization figures that decide whether a
    real pod run is host-bound: ``device_busy`` (fraction of wall time the
    chip is executing steps) and ``loader_wait`` (fraction spent blocked on
    the host loader). On this 1-core dev box loader_wait dominates by
    construction; on a pod host the same numbers localize the bottleneck.
    """
    import tempfile
    from pathlib import Path

    from labelanything_tpu.data.dataset import (LabelAnythingDataset,
                                                VariableBatchSampler)
    from labelanything_tpu.data.loader import EpisodeLoader
    from labelanything_tpu.experiment.run import (_HOST_KEYS,
                                                  drop_absent_modalities,
                                                  with_all_modalities)
    from labelanything_tpu.models.build_lam import build_lam_vit_mae_b
    from labelanything_tpu.parallel.train_step import (init_train_state,
                                                       make_train_step)
    from labelanything_tpu.train.losses import LabelAnythingLoss
    from labelanything_tpu.train.optim import build_optimizer
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import BatchKeys, ResultDict

    tmp = None
    if root is None:
        tmp = tempfile.TemporaryDirectory(prefix="labench_coco_")
        root = Path(tmp.name)
    else:
        root = Path(root)
    if not (root / "instances.json").exists():
        _write_synthetic_coco(root, n_images, image_size)

    dataset = LabelAnythingDataset(
        {"coco": {"instances_path": str(root / "instances.json"),
                  "img_dir": str(root / "images")}},
        {"image_size": image_size, "seed": 0, "load_gts": False,
         "custom_preprocess": False, "do_subsample": False,
         "add_box_noise": True},
    )
    sampler = VariableBatchSampler(
        dataset,
        possible_batch_example_nums=[[batch_size, shots, ways]],
        prompt_types=["point", "bbox", "mask"],
        shuffle=True, num_steps=steps + 2, seed=0,
    )
    loader = EpisodeLoader(dataset, sampler, num_workers,
                           use_processes=use_processes, seed=0)

    c = ways + 1
    model = build_lam_vit_mae_b(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        spatial_convs=3, class_encoder={"name": "RandomMatrixEncoder",
                                        "bank_size": 100},
        dtype=jnp.bfloat16,
        # MUST match the dataset's custom_preprocess above: with plain
        # square-resize data the whole frame is valid — an aspect-preserving
        # model would -inf-mask real foreground pixels (infinite focal CE)
        custom_preprocess=False,
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    sub = Substitutor(num_points=1, substitute=False)

    def to_device(raw):
        batch = drop_absent_modalities(raw)
        return {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()
                if k not in _HOST_KEYS and v is not None}

    state = None
    train_step = None
    n_steps = 0
    t_wait = t_dev = 0.0
    t_start = time.perf_counter()
    it = iter(loader)
    try:
        while n_steps < steps:
            t0 = time.perf_counter()
            try:
                raw = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            t_wait += time.perf_counter() - t0
            (data, _gts), _names = raw
            sub.reset(to_device(data))
            batch, gt = next(sub)
            if state is None:
                params = {
                    "model": jax.jit(model.init)(
                        jax.random.key(0), with_all_modalities(batch)),
                    "loss": loss.init(jax.random.key(1), {
                        ResultDict.LOGITS: jnp.zeros(
                            (batch_size, c, image_size, image_size)),
                        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros(
                            (batch_size, shots, c, 256)),
                        BatchKeys.FLAG_EXAMPLES:
                            batch[BatchKeys.FLAG_EXAMPLES],
                    }, gt),
                }
                tx = build_optimizer(params, name="AdamW",
                                     learning_rate=5e-5)
                state = init_train_state(params, tx)
                train_step = make_train_step(model, loss, tx)
                # compile outside the timed region (a real run compiles once)
                state, aux = train_step(state, batch, gt, jax.random.key(1),
                                        1.0, apply_update=True,
                                        use_accum=False)
                assert np.isfinite(float(aux["loss"]))
                t_start = time.perf_counter()
                t_wait = 0.0
                continue
            t0 = time.perf_counter()
            state, aux = train_step(state, batch, gt,
                                    jax.random.key(n_steps), 1.0,
                                    apply_update=True, use_accum=False)
            ok = np.isfinite(float(aux["loss"]))  # per-step sync
            t_dev += time.perf_counter() - t0
            assert ok, "non-finite loss in pipeline bench"
            n_steps += 1
    finally:
        loader.close()
        if tmp is not None:
            tmp.cleanup()

    total = time.perf_counter() - t_start
    mode = "process" if use_processes else "thread"
    return {
        "metric": (f"train episodes/sec (images path, {ways}-way {shots}-shot"
                   f" {image_size}px, lam_mae_b bf16, {mode} loader x"
                   f"{num_workers})"),
        "value": round(batch_size * n_steps / total, 2),
        "unit": "episodes/sec",
        "device_busy": round(t_dev / total, 3),
        "loader_wait": round(t_wait / total, 3),
    }


