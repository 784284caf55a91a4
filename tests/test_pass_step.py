"""Fused substitution-pass / chunk programs (make_pass_step /
make_chunk_step) vs the unfused composition they replace.

The fused programs carry rotation + query split + rng + fwd/bwd/update +
window metrics + error-point write-back in ONE dispatch (and, chunked, K
batches per dispatch via lax.scan). These tests pin them against the
primitive composition (Substitutor rotation / make_train_step /
generate_points_from_errors / write_query_points / host LUT fold) run with
IDENTICAL rng folding — any drift in the permutation compounding, point-slot
arithmetic, metric-window accumulation, or donation bookkeeping shows up as
a mismatch.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from labelanything_tpu.data.synthetic import random_full_batch
from labelanything_tpu.experiment.run import fold_global_confusion
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.parallel.mesh import create_mesh, shard_batch
from labelanything_tpu.parallel.train_step import (
    init_metrics_carry,
    init_train_state,
    make_chunk_step,
    make_pass_step,
    make_train_step,
)
from labelanything_tpu.train.losses import LabelAnythingLoss
from labelanything_tpu.train.optim import build_optimizer
from labelanything_tpu.train.substitutor import (
    apply_permutation,
    divide_query_examples,
    generate_points_from_errors,
    preallocate_point_slots,
    rotation_permutation,
    rotation_permutation_traced,
    write_query_points,
)
from labelanything_tpu.typing import BatchKeys, ResultDict

IMAGE_SIZE = 64
C = 3
G = 5  # global classes incl. background


def test_rotation_permutation_traced_matches_concrete():
    for n in (2, 3, 4, 5):
        for it in range(n + 1):
            expected = np.asarray(rotation_permutation(it, n)
                                  if it > 0 else tuple(range(n)))
            got = np.asarray(rotation_permutation_traced(jnp.int32(it), n))
            np.testing.assert_array_equal(got, expected, err_msg=f"n={n} it={it}")


def _setup(num_points=1, seed=0):
    model = build_lam_no_vit(
        image_embed_dim=32, embed_dim=32, image_size=IMAGE_SIZE,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
    )
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}})
    full = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=8, num_examples=2, num_classes=C,
        image_size=IMAGE_SIZE, embed_dim=32, seed=seed,
    ))
    n = full[BatchKeys.EMBEDDINGS].shape[1]
    n_passes = n + 1
    full = preallocate_point_slots(full, num_points * n_passes)
    input_dict, gt = divide_query_examples(full)
    params_model = jax.jit(model.init)(jax.random.key(0), input_dict)
    dummy_result = {
        ResultDict.LOGITS: jnp.zeros((8, C, IMAGE_SIZE, IMAGE_SIZE)),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.zeros((8, n, C, 32)),
        BatchKeys.FLAG_EXAMPLES: input_dict[BatchKeys.FLAG_EXAMPLES],
    }
    params_loss = loss.init(jax.random.key(1), dummy_result, gt)
    params = {"model": params_model, "loss": params_loss}
    tx = build_optimizer(params, name="AdamW", learning_rate=1e-3)
    return model, loss, tx, params, full, n, n_passes


def _lut(batch_size=8):
    """Per-sample episode->global LUT: sample i maps episode class c to
    (i + c) % G with background pinned to 0."""
    lut = np.zeros((batch_size, C), np.int32)
    for i in range(batch_size):
        lut[i, 1:] = [(i + c) % (G - 1) + 1 for c in range(1, C)]
    return lut


def _run_unfused(model, loss, tx, params, full, n, n_passes, num_points,
                 mesh, base_rng, lut):
    """Reference composition: concrete permutations, static slots,
    host-tracked step counter, host LUT fold of per-pass confmats."""
    data_sh = NamedSharding(mesh, P("data"))
    loss_scale = 1.0 / n_passes

    train_step = make_train_step(model, loss, tx, mesh=mesh,
                                 with_confmat=True)
    state = jax.device_put(init_train_state(
        jax.tree.map(jnp.copy, params), tx), NamedSharding(mesh, P()))
    batch = shard_batch(jax.tree.map(jnp.copy, full), mesh)
    slot0 = full[BatchKeys.PROMPT_POINTS].shape[3] - num_points * n_passes
    losses, step_val = [], 0
    cm = np.zeros((G, G), np.int64)
    cm2 = np.zeros((2, 2), np.int64)
    for it in range(n_passes):
        if it > 0:
            batch = apply_permutation(batch, rotation_permutation(it, n))
        input_dict, gt = divide_query_examples(batch)
        rng = jax.random.fold_in(base_rng, step_val * n_passes + it)
        state, aux = train_step(
            state, input_dict, jax.device_put(gt, data_sh), rng,
            loss_scale, apply_update=(it == n_passes - 1), use_accum=True)
        if it == n_passes - 1:
            step_val += 1
        losses.append(np.asarray(aux["loss"]))
        cm = fold_global_confusion(cm, np.asarray(aux["confmat_ps"]),
                                   lut, G)
        cm2 += np.asarray(aux["confmat2"])
        points, labels = generate_points_from_errors(
            aux["preds"], gt, jax.random.fold_in(rng, 2),
            num_classes=C, num_points=num_points)
        batch = write_query_points(batch, points, labels,
                                   slot0 + it * num_points)
    return state, batch, losses, cm, cm2


def test_fused_pass_matches_unfused_composition():
    num_points = 1
    model, loss, tx, params, full, n, n_passes = _setup(num_points)
    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    base_rng = jax.random.key(7)
    loss_scale = 1.0 / n_passes
    lut = _lut()

    state_u, batch_u, losses_u, cm_u, cm2_u = _run_unfused(
        model, loss, tx, params, full, n, n_passes, num_points, mesh,
        base_rng, lut)

    # ---- fused per-pass program with the device metric window ----
    pass_step = make_pass_step(model, loss, tx, mesh=mesh,
                               num_points=num_points, num_global=G)
    state_f = jax.device_put(init_train_state(
        jax.tree.map(jnp.copy, params), tx), repl)
    metrics = jax.device_put(init_metrics_carry(G), repl)
    batch_f = shard_batch(jax.tree.map(jnp.copy, full), mesh)
    lut_dev = shard_batch({"lut": lut}, mesh)["lut"]
    losses_f = []
    for it in range(n_passes):
        state_f, metrics, batch_f, aux = pass_step(
            state_f, metrics, batch_f, lut_dev,
            jax.device_put(np.int32(it), repl), base_rng,
            jax.device_put(np.int32(it == 0), repl),  # reset on first pass
            loss_scale,
            apply_update=(it == n_passes - 1), use_accum=True,
            substitute=True, gen_points=True)
        losses_f.append(np.asarray(metrics["loss_last"]))
        assert aux["preds"].shape == (8, IMAGE_SIZE, IMAGE_SIZE)

    m = jax.device_get(metrics)
    np.testing.assert_allclose(losses_f, losses_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m["loss_sum"]), np.sum(losses_u),
                               rtol=1e-5)
    assert int(m["count"]) == n_passes
    assert int(m["first_bad"]) == -1
    np.testing.assert_array_equal(np.asarray(m["cm"], np.int64), cm_u)
    np.testing.assert_array_equal(np.asarray(m["cm2"], np.int64), cm2_u)
    # final batch state: identical permutation compounding + point writes
    for key in (BatchKeys.PROMPT_POINTS, BatchKeys.FLAG_POINTS,
                BatchKeys.GROUND_TRUTHS):
        np.testing.assert_allclose(
            np.asarray(batch_f[key]), np.asarray(batch_u[key]),
            err_msg=key)
    # final params identical (one optimizer update from the same accum)
    uf = jax.tree.flatten(state_u.params)[0]
    ff = jax.tree.flatten(state_f.params)[0]
    for a, b in zip(uf, ff):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(state_f.step) == int(state_u.step) == 1


def test_chunk_step_matches_sequential_passes():
    """K batches through ONE chunk dispatch == K batches through the fused
    per-pass program (losses, metric window, params, step count)."""
    num_points = 1
    model, loss, tx, params, full0, n, n_passes = _setup(num_points, seed=0)
    _, _, _, _, full1, _, _ = _setup(num_points, seed=1)
    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    base_rng = jax.random.key(11)
    loss_scale = 1.0 / n_passes
    lut = _lut()
    lut_dev = shard_batch({"lut": lut}, mesh)["lut"]

    # ---- sequential fused passes over both batches ----
    pass_step = make_pass_step(model, loss, tx, mesh=mesh,
                               num_points=num_points, num_global=G)
    state_s = jax.device_put(init_train_state(
        jax.tree.map(jnp.copy, params), tx), repl)
    metrics_s = jax.device_put(init_metrics_carry(G), repl)
    for full in (full0, full1):
        batch = shard_batch(jax.tree.map(jnp.copy, full), mesh)
        for it in range(n_passes):
            state_s, metrics_s, batch, _ = pass_step(
                state_s, metrics_s, batch, lut_dev,
                jax.device_put(np.int32(it), repl), base_rng,
                jax.device_put(np.int32(0), repl), loss_scale,
                apply_update=(it == n_passes - 1), use_accum=True,
                substitute=True, gen_points=True)
    ms = jax.device_get(metrics_s)

    # ---- one chunk dispatch over the stacked pair ----
    chunk_step = make_chunk_step(model, loss, tx, mesh=mesh,
                                 num_points=num_points, num_global=G)
    state_c = jax.device_put(init_train_state(
        jax.tree.map(jnp.copy, params), tx), repl)
    metrics_c = jax.device_put(init_metrics_carry(G), repl)
    b0 = shard_batch(jax.tree.map(jnp.copy, full0), mesh)
    b1 = shard_batch(jax.tree.map(jnp.copy, full1), mesh)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)
    luts = jnp.stack([lut_dev, lut_dev])
    state_c, metrics_c, aux = chunk_step(
        state_c, metrics_c, stacked, luts, base_rng,
        jax.device_put(np.int32(0), repl), loss_scale,
        accumulate=True, substitute=True, gen_points=True)
    mc = jax.device_get(metrics_c)

    assert int(state_c.step) == int(state_s.step) == 2
    np.testing.assert_allclose(float(mc["loss_sum"]), float(ms["loss_sum"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mc["loss_last"]), float(ms["loss_last"]),
                               rtol=1e-5)
    assert int(mc["count"]) == int(ms["count"]) == 2 * n_passes
    # the scan body compiles to (slightly) different fusions than the
    # standalone pass program, so logits differ in the last ulps and a
    # handful of near-tie argmax pixels flip — totals must agree exactly,
    # per-cell counts within a few pixels of ~100k counted
    for key in ("cm", "cm2"):
        a, b = np.asarray(mc[key], np.int64), np.asarray(ms[key], np.int64)
        assert a.sum() == b.sum(), key
        assert np.abs(a - b).sum() <= 64, (key, np.abs(a - b).sum())
    # aux carries the LAST batch's final-pass preds
    assert aux["preds"].shape == (8, IMAGE_SIZE, IMAGE_SIZE)
    # a flipped near-tie pixel also flips its sampled error point (a
    # discrete input change), so params drift by a few ulps of the update —
    # wrong rng folding / permutation compounding would diverge by orders
    # of magnitude more
    sf = jax.tree.flatten(state_s.params)[0]
    cf = jax.tree.flatten(state_c.params)[0]
    for a, b in zip(sf, cf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


def test_metric_window_reset():
    """The traced reset flag zeroes the window at dispatch entry."""
    model, loss, tx, params, full, n, n_passes = _setup(num_points=0)
    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    pass_step = make_pass_step(model, loss, tx, mesh=mesh, num_points=0,
                               num_global=G)
    state = jax.device_put(init_train_state(params, tx), repl)
    metrics = jax.device_put(init_metrics_carry(G), repl)
    lut_dev = shard_batch({"lut": _lut()}, mesh)["lut"]
    batch = shard_batch(dict(full), mesh)
    kw = dict(apply_update=True, use_accum=False, substitute=False,
              gen_points=False)
    it0 = jax.device_put(np.int32(0), repl)
    state, metrics, batch, _ = pass_step(
        state, metrics, batch, lut_dev, it0, jax.random.key(3),
        jax.device_put(np.int32(0), repl), 1.0, **kw)
    assert int(jax.device_get(metrics["count"])) == 1
    first = jax.device_get(metrics)
    state, metrics, batch, _ = pass_step(
        state, metrics, batch, lut_dev, it0, jax.random.key(3),
        jax.device_put(np.int32(1), repl), 1.0, **kw)  # reset
    m = jax.device_get(metrics)
    assert int(m["count"]) == 1
    assert int(m["first_bad"]) == -1
    # the window restarted: cm counts one pass, not two
    np.testing.assert_array_equal(np.asarray(m["cm"]).sum(),
                                  np.asarray(first["cm"]).sum())


def test_fused_pass_no_substitution_single_pass():
    """substitute=False: identity permutation, one pass, immediate update."""
    model, loss, tx, params, full, n, n_passes = _setup(num_points=0)
    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    pass_step = make_pass_step(model, loss, tx, mesh=mesh, num_points=0,
                               num_global=G)
    state = jax.device_put(init_train_state(params, tx), repl)
    metrics = jax.device_put(init_metrics_carry(G), repl)
    lut_dev = shard_batch({"lut": _lut()}, mesh)["lut"]
    batch = shard_batch(dict(full), mesh)
    state, metrics, batch, aux = pass_step(
        state, metrics, batch, lut_dev, jax.device_put(np.int32(0), repl),
        jax.random.key(3), jax.device_put(np.int32(1), repl), 1.0,
        apply_update=True, use_accum=False, substitute=False,
        gen_points=False)
    m = jax.device_get(metrics)
    assert np.isfinite(float(m["loss_last"]))
    assert int(state.step) == 1
    np.testing.assert_array_equal(
        np.asarray(aux["gt"]),
        np.asarray(full[BatchKeys.GROUND_TRUTHS][:, 0]))
