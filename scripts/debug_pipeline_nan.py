"""Reproduce and localize the pipeline-bench non-finite loss: run the same
host-loader + train-step loop; on the first non-finite loss, report which
loss components / logits / grads / params are non-finite and whether the
batch is toxic under the PREVIOUS params."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import pathlib
import tempfile

from labelanything_tpu.benchmarks import _write_synthetic_coco
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

def tree_nonfinite(tree, prefix=""):
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                bad.append((jax.tree_util.keystr(path), n, leaf.size))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def main():
    batch_size, ways, shots, image_size, steps = 8, 2, 1, 480, 40
    tmp = tempfile.TemporaryDirectory(prefix="ladbg_coco_")
    root = pathlib.Path(tmp.name)
    _write_synthetic_coco(root, 48, image_size)
    dataset = LabelAnythingDataset(
        {"coco": {"instances_path": str(root / "instances.json"),
                  "img_dir": str(root / "images")}},
        {"image_size": image_size, "seed": 0, "load_gts": False,
         "custom_preprocess": False, "do_subsample": False,
         "add_box_noise": True},
    )
    sampler = VariableBatchSampler(
        dataset, possible_batch_example_nums=[[batch_size, shots, ways]],
        prompt_types=["point", "bbox", "mask"], shuffle=True,
        num_steps=steps + 2, seed=0)
    loader = EpisodeLoader(dataset, sampler, 2, use_processes=False, seed=0)

    c = ways + 1
    model = build_lam_vit_mae_b(
        image_embed_dim=768, embed_dim=256, image_size=image_size,
        spatial_convs=3, class_encoder={"name": "RandomMatrixEncoder",
                                        "bank_size": 100},
        dtype=jnp.bfloat16)
    loss = LabelAnythingLoss(components={"focal": {"weight": 1.0}},
                             class_weighting=True)
    sub = Substitutor(num_points=1, substitute=False)

    def to_device(raw):
        batch = drop_absent_modalities(raw)
        return {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()
                if k not in _HOST_KEYS and v is not None}

    state = None
    prev_state = None
    n = 0
    for raw in loader:
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
                    BatchKeys.FLAG_EXAMPLES: batch[BatchKeys.FLAG_EXAMPLES],
                }, gt),
            }
            tx = build_optimizer(params, name="AdamW", learning_rate=5e-5)
            state = init_train_state(params, tx)
            train_step = make_train_step(model, loss, tx)
        prev_params = jax.tree.map(jnp.array, state.params)
        state, aux = train_step(state, batch, gt, jax.random.key(n), 1.0,
                                apply_update=True, use_accum=False)
        lv = float(aux["loss"])
        comps = {k: float(v) for k, v in aux["components"].items()}
        print(f"step {n}: loss={lv:.4f} comps={comps}", flush=True)
        if not np.isfinite(lv):
            print("--- NON-FINITE at step", n, flush=True)
            print("prev params nonfinite:", tree_nonfinite(prev_params)[:10])
            print("new params nonfinite:", tree_nonfinite(state.params)[:10])
            out = jax.jit(lambda p, b: model.apply(p, b, deterministic=True)
                          )(prev_params["model"], batch)
            lg = np.asarray(out[ResultDict.LOGITS]).astype(np.float32)
            fin = np.isfinite(lg)
            print("fwd(prev params) logits nonfinite:",
                  int((~fin).sum()), "/", lg.size,
                  " max|logit|=", np.abs(lg[fin]).max() if fin.any() else "-")
            print("gt range:", int(np.asarray(gt).min()),
                  int(np.asarray(gt).max()))
            fg = np.asarray(batch.get(BatchKeys.FLAG_GTS))
            gtn = np.asarray(gt)
            for bi in range(gtn.shape[0]):
                u = np.unique(gtn[bi]).tolist()
                bad_cls = [ci for ci in u if fg is not None and ci < fg.shape[1]
                           and not fg[bi, ci]]
                inf_cols = np.unique(np.where(~np.isfinite(
                    lg[bi].reshape(lg.shape[1], -1)).any(axis=-1))[0])                     if False else None
                print(f"  b={bi} gt classes={u} flag_gts={fg[bi].tolist() if fg is not None else None} gt-on-masked={bad_cls}")
            fe = np.asarray(batch[BatchKeys.FLAG_EXAMPLES])
            print("flag_examples:", fe.tolist())
            for k in (BatchKeys.PROMPT_POINTS, BatchKeys.PROMPT_BBOXES,
                      BatchKeys.PROMPT_MASKS, BatchKeys.IMAGES):
                if k in batch:
                    a = np.asarray(batch[k])
                    print(k, a.shape, "nonfinite:",
                          int((~np.isfinite(a.astype(np.float32))).sum()))
            break
        n += 1
        if n >= steps:
            print("no NaN in", steps, "steps")
            break
    loader.close()


if __name__ == "__main__":
    main()
