"""Training-step tests on an 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from labelanything_tpu.data.synthetic import random_batch, random_full_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.parallel.mesh import create_mesh, shard_batch
from labelanything_tpu.parallel.train_step import (
    init_train_state,
    make_eval_step,
    make_train_step,
)
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.train.substitutor import Substitutor
from labelanything_tpu.typing import BatchKeys, IGNORE_INDEX, ResultDict

IMAGE_SIZE = 64
C = 3


def tiny_model(dtype="float32"):
    return build_lam_no_vit(
        image_embed_dim=32, embed_dim=32, image_size=IMAGE_SIZE,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
        dtype=dtype,
    )


def test_losses_finite():
    from labelanything_tpu.train.losses import (
        dice_loss, false_positive_loss, focal_loss, get_weight_matrix_from_labels,
    )
    from labelanything_tpu.train.rmi import rmi_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, C, 32, 32)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, (2, 32, 32)).astype(np.int32))
    target = target.at[:, :, 28:].set(IGNORE_INDEX)
    # -inf class masking must be handled; GT never selects a masked class
    # (flag_gts guarantees this in the real pipeline — a GT pixel of a
    # -inf-masked class is infinite CE in the torch reference as well)
    logits = logits.at[:, 2, :16].set(-np.inf)
    target = jnp.where((target == 2) & (jnp.arange(32)[None, :, None] < 16),
                       0, target)

    wm, cw = get_weight_matrix_from_labels(target, C)
    assert np.isfinite(np.asarray(wm)).all() and np.isfinite(np.asarray(cw)).all()
    for fn in (focal_loss, dice_loss, false_positive_loss, rmi_loss):
        val = np.asarray(jax.jit(fn)(logits, target))
        assert np.isfinite(val), fn.__name__


def test_loss_gradients_finite():
    """-inf logits must not poison gradients."""
    from labelanything_tpu.train.losses import dice_loss, focal_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, C, 16, 16)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, (1, 16, 16)).astype(np.int32))
    target = target.at[:, :, 12:].set(IGNORE_INDEX)
    mask = jnp.ones_like(x).at[:, 2].set(0)

    for fn in (focal_loss, dice_loss):
        def f(logits):
            masked = jnp.where(mask > 0, logits, -jnp.inf)
            return fn(masked, target)

        g = np.asarray(jax.jit(jax.grad(f))(x))
        assert np.isfinite(g).all(), fn.__name__


def test_train_step_with_substitution_on_mesh():
    mesh = create_mesh()
    assert mesh.devices.size == 8

    model = tiny_model()
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})

    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=2, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32,
    ))

    sub = Substitutor(num_points=1, substitute=True)
    sub.reset(full)
    first_input, first_gt = next(sub)

    params_model = jax.jit(model.init)(jax.random.key(0), first_input)
    dummy_result = {
        ResultDict.LOGITS: jnp.zeros((8, C, IMAGE_SIZE, IMAGE_SIZE)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, 2, C, 32)),
        BatchKeys.FLAG_EXAMPLES: first_input[BatchKeys.FLAG_EXAMPLES],
    }
    params_loss = loss.init(jax.random.key(1), dummy_result, first_gt)
    params = {"model": params_model, "loss": params_loss}

    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)
    state = init_train_state(params, tx)
    train_step = make_train_step(model, loss, tx, mesh=mesh, num_classes=C)

    pe_before = np.asarray(params_model["params"]["prompt_encoder"]["pe_layer"][
        "positional_encoding_gaussian_matrix"
    ])
    decoder_before = np.asarray(
        params_model["params"]["mask_decoder"]["class_mlp"]["layers_0"]["kernel"]
    )

    # N+1 substitution passes for N=3 images: initial + each example as
    # query + rotate back to the original query with accumulated error
    # points (reference: run.py:506-509 loss_normalizer = gt.shape[1] + 1)
    n_passes = 4
    sub.reset(full)
    losses = []
    data_sh = NamedSharding(mesh, P("data"))
    for i, (input_dict, gt) in enumerate(sub):
        input_dict = shard_batch(input_dict, mesh)
        gt = jax.device_put(gt, data_sh)
        state, aux = train_step(
            state, input_dict, gt, jax.random.key(i), 1.0 / n_passes,
            apply_update=(i == n_passes - 1),
        )
        losses.append(float(aux["loss"]))
        assert aux["confmat"].shape == (C, C)
        sub.generate_new_points(aux["preds"], gt, jax.random.key(100 + i),
                                num_classes=C)
    assert i == n_passes - 1
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 1

    after = np.asarray(
        state.params["model"]["params"]["mask_decoder"]["class_mlp"]["layers_0"]["kernel"]
    )
    assert not np.allclose(after, decoder_before)
    pe_after = np.asarray(state.params["model"]["params"]["prompt_encoder"][
        "pe_layer"]["positional_encoding_gaussian_matrix"])
    np.testing.assert_array_equal(pe_before, pe_after)


def test_eval_step():
    mesh = create_mesh()
    model = tiny_model()
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=8, num_examples=1, num_classes=C, image_size=IMAGE_SIZE,
        embed_dim=32,
    ))
    params = {"model": jax.jit(model.init)(jax.random.key(0), batch)}
    eval_step = make_eval_step(model, num_classes=C, mesh=mesh)
    gt = batch[BatchKeys.GROUND_TRUTHS]
    out = eval_step(params, shard_batch(batch, mesh),
                    jax.device_put(gt, NamedSharding(mesh, P("data"))))
    assert out["confmat"].shape == (C, C)
    total = int(np.asarray(out["confmat"]).sum())
    valid = int((np.asarray(gt) != IGNORE_INDEX).sum())
    assert total == valid


def test_substitutor_rotation_roundtrip():
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=2, num_examples=2, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32,
    ))
    sub = Substitutor(num_points=0, substitute=True)
    sub.reset(full)
    passes = list(sub)
    assert len(passes) == 4  # N+1 for N=3 (original query returns at the end)
    np.testing.assert_array_equal(
        np.asarray(passes[0][1]), np.asarray(full[BatchKeys.GROUND_TRUTHS][:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(passes[-1][1]), np.asarray(full[BatchKeys.GROUND_TRUTHS][:, 0])
    )
    # each image served as query at least once
    gts = [np.asarray(g) for _, g in passes]
    origs = np.asarray(full[BatchKeys.GROUND_TRUTHS])
    matched = set()
    for g in gts:
        for n in range(3):
            if (g == origs[:, n]).all():
                matched.add(n)
    assert matched == {0, 1, 2}


def test_metrics_math():
    from labelanything_tpu.train.metrics import (
        binary_confusion_matrix, confusion_matrix, fb_iou,
        mean_iou, strict_mean_iou,
    )

    preds = jnp.asarray([[[0, 1], [2, 1]]])
    target = jnp.asarray([[[0, 1], [2, 2]]])
    cm = confusion_matrix(preds, target, 3)
    np.testing.assert_array_equal(
        np.asarray(cm), [[1, 0, 0], [0, 1, 0], [0, 1, 1]]
    )
    assert np.isclose(float(mean_iou(cm)), 2 / 3)
    assert np.isclose(float(strict_mean_iou(cm)), 0.5)
    # binary view: pred fg == target fg everywhere (class confusion within
    # fg does not matter for FB-IoU) -> IoU 1.0
    cm2 = binary_confusion_matrix(preds, target)
    assert np.isclose(float(fb_iou(cm2)), 1.0)
    preds2 = jnp.asarray([[[0, 0], [2, 1]]])
    cm3 = binary_confusion_matrix(preds2, target)
    assert np.isclose(float(fb_iou(cm3)), 2 / 3)


def test_tensor_parallel_train_step_matches_replicated():
    """Megatron MLP tensor parallelism over the mesh "model" axis: a (4, 2)
    (data, model) TP step must produce the same loss and updated params as
    the fully-replicated (8, 1) step (parallel/tp.py)."""
    from labelanything_tpu.parallel import tp

    model = tiny_model()
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=1, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32,
    ))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    input_dict, gt = next(sub)

    params_model = jax.jit(model.init)(jax.random.key(0), input_dict)
    dummy_result = {
        ResultDict.LOGITS: jnp.zeros((8, C, IMAGE_SIZE, IMAGE_SIZE)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, 1, C, 32)),
        BatchKeys.FLAG_EXAMPLES: input_dict[BatchKeys.FLAG_EXAMPLES],
    }
    params = {"model": params_model,
              "loss": loss.init(jax.random.key(1), dummy_result, gt)}
    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)

    results = {}
    for name, (dp, mp) in {"replicated": (8, 1), "tp": (4, 2)}.items():
        mesh = create_mesh(data=dp, model=mp)
        # the step donates the state, so give each run its own param buffers
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        if mp > 1:
            shardings = tp.state_shardings(state, mesh)
            # the spec tree must actually shard something over "model"
            specs = [s.spec for s in jax.tree.leaves(shardings)]
            assert any("model" in (ax for axes in s if axes for ax in
                       ((axes,) if isinstance(axes, str) else axes))
                       for s in specs if s), "no TP-sharded leaves matched"
            state = tp.shard_tree(state, mesh)
            step = make_train_step(model, loss, tx, mesh=mesh, num_classes=C,
                                   state_shardings=shardings)
        else:
            step = make_train_step(model, loss, tx, mesh=mesh, num_classes=C)
        new_state, aux = step(
            state, shard_batch(input_dict, mesh),
            jax.device_put(gt, NamedSharding(mesh, P("data"))),
            jax.random.key(2), 1.0, apply_update=True)
        results[name] = (
            float(aux["loss"]),
            np.asarray(jax.device_get(
                new_state.params["model"]["params"]["mask_decoder"]
                ["transformer"]["layers_0"]["mlp"]["lin1"]["kernel"])),
        )

    np.testing.assert_allclose(results["tp"][0], results["replicated"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results["tp"][1], results["replicated"][1],
                               rtol=1e-4, atol=1e-6)


def test_zero1_train_step_matches_replicated():
    """ZeRO-1 optimizer-state sharding (parallel/zero.py): sharding the
    AdamW moments + grad accumulator over the data axis must reproduce the
    replicated step's loss and updated params bit-for-bit (the collectives
    XLA inserts are exact rearrangements), including a 2-pass substitution
    accumulation so the sharded accumulator path is exercised."""
    from labelanything_tpu.parallel.zero import (place_state,
                                                 zero1_state_shardings)

    model = tiny_model()
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=1, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32,
    ))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    input_dict, gt = next(sub)

    params_model = jax.jit(model.init)(jax.random.key(0), input_dict)
    dummy_result = {
        ResultDict.LOGITS: jnp.zeros((8, C, IMAGE_SIZE, IMAGE_SIZE)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, 1, C, 32)),
        BatchKeys.FLAG_EXAMPLES: input_dict[BatchKeys.FLAG_EXAMPLES],
    }
    params = {"model": params_model,
              "loss": loss.init(jax.random.key(1), dummy_result, gt)}
    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)
    mesh = create_mesh()

    results = {}
    for name in ("replicated", "zero1"):
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        if name == "zero1":
            shardings = zero1_state_shardings(state, mesh)
            specs = [s.spec for s in jax.tree.leaves(shardings.opt_state)]
            assert any(s != P() for s in specs), "no ZeRO-sharded leaves"
            state = place_state(state, shardings)
            step = make_train_step(model, loss, tx, mesh=mesh,
                                   state_shardings=shardings)
        else:
            step = make_train_step(model, loss, tx, mesh=mesh)
        batch_sh = shard_batch(input_dict, mesh)
        gt_sh = jax.device_put(gt, NamedSharding(mesh, P("data")))
        # pass 1 accumulates, pass 2 applies with the sharded accumulator
        state, _ = step(state, batch_sh, gt_sh, jax.random.key(2), 0.5,
                        apply_update=False)
        state, aux = step(state, batch_sh, gt_sh, jax.random.key(3), 0.5,
                          apply_update=True, use_accum=True)
        results[name] = (
            float(aux["loss"]),
            np.asarray(jax.device_get(
                state.params["model"]["params"]["mask_decoder"]
                ["transformer"]["layers_0"]["mlp"]["lin1"]["kernel"])),
        )

    np.testing.assert_allclose(results["zero1"][0],
                               results["replicated"][0], rtol=1e-6)
    np.testing.assert_allclose(results["zero1"][1],
                               results["replicated"][1], rtol=1e-6,
                               atol=1e-7)


def test_zero1_compose_with_tp_specs():
    """compose() overlays ZeRO data-axis specs with Megatron model-axis
    specs: TP-sharded leaves keep P over "model", everything else gets the
    ZeRO spec."""
    from labelanything_tpu.parallel import tp
    from labelanything_tpu.parallel.zero import (compose,
                                                 zero1_state_shardings)

    model = tiny_model()
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=1, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32,
    ))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    input_dict, gt = next(sub)
    params_model = jax.jit(model.init)(jax.random.key(0), input_dict)
    dummy_result = {
        ResultDict.LOGITS: jnp.zeros((8, C, IMAGE_SIZE, IMAGE_SIZE)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, 1, C, 32)),
        BatchKeys.FLAG_EXAMPLES: input_dict[BatchKeys.FLAG_EXAMPLES],
    }
    params = {"model": params_model,
              "loss": loss.init(jax.random.key(1), dummy_result, gt)}
    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)
    mesh = create_mesh(data=4, model=2)
    state = init_train_state(params, tx)

    tp_sh = tp.state_shardings(state, mesh)
    zero_sh = zero1_state_shardings(state, mesh)
    combined = compose(zero_sh, tp_sh)

    def axes(sharding):
        return {ax for part in sharding.spec if part
                for ax in ((part,) if isinstance(part, str) else part)}

    tp_leaves = jax.tree.leaves(tp_sh)
    combined_leaves = jax.tree.leaves(combined)
    zero_leaves = jax.tree.leaves(zero_sh)
    n_model = n_data = 0
    for t, z, comb in zip(tp_leaves, zero_leaves, combined_leaves):
        if t.spec != P():
            assert comb.spec == t.spec  # TP wins
            n_model += 1
        else:
            assert comb.spec == z.spec  # ZeRO fills the rest
            if "data" in axes(z):
                n_data += 1
    assert n_model > 0 and n_data > 0


def test_tensor_parallel_vit_matches_replicated():
    """TP numerics on the images path: a (4, 2) dp x tp train step of a
    lam with a tiny SAM ViT (use_kernel=False — Pallas custom calls are not
    GSPMD-partitionable) reproduces the (8, 1) replicated loss."""
    from labelanything_tpu.models.build_lam import build_lam
    from labelanything_tpu.models.image_encoder import ImageEncoderViT
    from labelanything_tpu.parallel import tp

    S, d = 32, 16

    def tiny_vit(**kw):
        kw.setdefault("project_last_hidden", True)
        kw.pop("remat", None)
        return ImageEncoderViT(
            img_size=S, patch_size=8, embed_dim=d, depth=1, num_heads=2,
            out_chans=d, use_rel_pos=True, window_size=2,
            global_attn_indexes=(0,), use_kernel=False, **kw)

    model = build_lam(
        build_vit=tiny_vit, image_embed_dim=d, embed_dim=d, image_size=S,
        vit_patch_size=8,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 8},
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=1, num_classes=C, image_size=S,
        embed_dim=d, with_images=True,
    ))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    input_dict, gt = next(sub)

    params = {
        "model": jax.jit(model.init)(jax.random.key(0), input_dict),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros((8, C, S, S)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, 1, C, d)),
            BatchKeys.FLAG_EXAMPLES: input_dict[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)

    losses = {}
    for name, (dp, mp) in {"replicated": (8, 1), "tp": (4, 2)}.items():
        mesh = create_mesh(data=dp, model=mp)
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        if mp > 1:
            shardings = tp.state_shardings(state, mesh)
            state = tp.shard_tree(state, mesh)
            step = make_train_step(model, loss, tx, mesh=mesh, num_classes=C,
                                   state_shardings=shardings)
        else:
            step = make_train_step(model, loss, tx, mesh=mesh, num_classes=C)
        _, aux = step(
            state, shard_batch(input_dict, mesh),
            jax.device_put(gt, NamedSharding(mesh, P("data"))),
            jax.random.key(2), 1.0, apply_update=True)
        losses[name] = float(aux["loss"])

    np.testing.assert_allclose(losses["tp"], losses["replicated"], rtol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_training_fits_learnable_synthetic_task(dtype):
    """Training-dynamics regression: loss must DROP substantially on a task
    that is actually expressible. random_full_batch GTs are IID per-pixel
    noise — provably unfittable through the 16x-upsampling decoder (loss
    floors at the residual entropy, which once masqueraded as 'training is
    broken'). Here the GT is derived from the query embeddings (argmax over
    the first C channels, upsampled), so the mapping embedding -> mask is
    learnable and a healthy optimizer memorizes one batch quickly.

    Run in BOTH fp32 and the configured mixed-precision policy (bf16
    compute, fp32 params + fp32 loss — the trainval YAMLs' model.dtype):
    training dynamics must hold under the policy the benchmarks record."""
    from labelanything_tpu.ops import resize_bilinear

    S, D = 64, 32
    model = tiny_model(dtype=dtype)
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=2, num_examples=1, num_classes=C, image_size=S,
        embed_dim=D, seed=0))
    sub = Substitutor(num_points=1, substitute=False)
    sub.reset(full)
    batch, _ = next(sub)

    # learnable target: class = argmax over the first C embedding channels
    # of the QUERY embedding, upsampled to full resolution
    q_emb = batch[BatchKeys.EMBEDDINGS][:, 0]            # (B, g, g, D)
    chan = resize_bilinear(q_emb[..., :C], (S, S), spatial_axes=(1, 2))
    gt = jnp.argmax(chan, axis=-1).astype(jnp.int32)      # (B, S, S)
    # the model emits -inf outside the valid dims (synthetic dims = 0.9*S);
    # GT must ignore that region exactly like the dataset GTs do
    gt = gt.at[:, :, int(S * 0.9):].set(IGNORE_INDEX)

    params = {
        "model": jax.jit(model.init)(jax.random.key(0), batch),
        "loss": loss.init(jax.random.key(1), {
            ResultDict.LOGITS: jnp.zeros((2, C, S, S)),
            ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((2, 1, C, 32)),
            BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
        }, gt),
    }
    tx = build_optimizer(params, name="AdamW", learning_rate=2e-3)
    state = init_train_state(params, tx)
    step = make_train_step(model, loss, tx)

    losses = []
    for i in range(150):
        state, aux = step(state, batch, gt, jax.random.key(7), 1.0,
                          apply_update=True)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # assert on the MINIMUM, not the final step: at this deliberately hot
    # lr (2e-3) the memorization run converges and then OSCILLATES
    # (measured bf16 trajectory: 0.031 @150 then swings 0.25-0.40), and
    # backend rounding differences shift the oscillation phase — a
    # fixed-step assertion flakes across toolchains while the reached
    # minimum proves learnability just as strictly
    assert min(losses) < 0.35 * losses[0], (losses[0], min(losses))


def test_permutation_rotates_resized_dims_with_images():
    """RESIZED_DIMS must rotate together with IMAGES/DIMS in substitution
    passes — the uint8 ingest path masks each image with ITS OWN post-resize
    extent on device; a stale extent would zero valid rows / normalize pad
    (code-review r5 finding)."""
    from labelanything_tpu.train.substitutor import (apply_permutation,
                                                     rotation_permutation)

    b, n = 2, 3
    batch = {
        BatchKeys.IMAGES: jnp.arange(b * n, dtype=jnp.uint8).reshape(
            b, n, 1, 1, 1) * jnp.ones((b, n, 4, 4, 3), jnp.uint8),
        BatchKeys.DIMS: jnp.arange(b * n * 2, dtype=jnp.int32).reshape(b, n, 2),
        BatchKeys.RESIZED_DIMS: 100 + jnp.arange(
            b * n * 2, dtype=jnp.int32).reshape(b, n, 2),
    }
    perm = rotation_permutation(1, n)
    out = apply_permutation(batch, perm)
    idx = np.asarray(perm)
    for key in (BatchKeys.IMAGES, BatchKeys.DIMS, BatchKeys.RESIZED_DIMS):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(batch[key])[:, idx])
