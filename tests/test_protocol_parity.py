"""Protocol-level validation equivalence vs the torch reference
(VERDICT round-1 task 1 — the last untested seam).

Three layers:

1. ``test_metric_protocol_equivalence_randomized`` — the metric/aggregation
   protocol in isolation: randomized ragged episodes (1-3 ways, ignore
   padding, cascade-triggering class draws) through (a) this repo's
   ``to_global_lut`` + ``global_confusion`` + ``strict_mean_iou``/
   ``mean_iou``/``fb_iou`` and (b) the reference's ``to_global_multiclass``
   + its OWN ``StrictMeanIoU``/``MeanIoU``/``DistributedBinaryJaccardIndex``
   classes (reference: utils/metrics.py:28-51) running on a faithful
   torchmetrics-1.7.1 base (tests/torchmetrics_faithful.py; the reference
   pins torchmetrics==1.7.1). Confusion matrices must agree EXACTLY.

2. ``test_full_validation_protocol_equivalence`` — the full loop at the
   canonical scale (256-dim, 480px, bank-100, 1-way/2-way x 1-shot, >=200
   episodes with ragged class counts): identical episodes and identical
   imported weights through (a) this repo's ``Run._validate_one`` and
   (b) the reference ``validate_run`` semantics (its Substitutor, its Lam
   forward, its to_global_multiclass, its metric classes — reference:
   experiment/run.py:603-742). Both protocols are cross-fed each model's
   predictions: on IDENTICAL predictions the two protocols must agree to
   <=1e-6 (fp32 evaluation of the same integer confusion matrix). The
   torch-vs-JAX forwards themselves agree at >=99.5% of pixels; with
   seeded RANDOM weights class margins sit at the fp32 noise floor, so a
   residual pred-level delta remains and is asserted separately (the
   logits-level bound lives in tests/test_parity_canonical.py; released
   checkpoints are unreachable in this zero-egress environment).

3. ``test_validate_reruns_seed_protocol`` — the reruns protocol: rerun r
   evaluates with seed = base + r (reference: run.py:618-641), reruns see
   different episode draws, identical seeds reproduce identical draws, and
   ``Run.validate`` averages the per-run metrics.
"""

import json
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier

from tests._reference import load
from tests.torchmetrics_faithful import install

from labelanything_tpu.experiment.run import (binary_confusion_np,
                                              global_confusion, to_global_lut)
from labelanything_tpu.train.metrics import fb_iou, mean_iou, strict_mean_iou
from labelanything_tpu.typing import BatchKeys, IGNORE_INDEX

IMG, EMBED, IMG_EMBED, BANK = 480, 256, 768, 100
GRID = IMG // 16


# --------------------------------------------------------------------- #
# 1. metric/aggregation protocol in isolation
# --------------------------------------------------------------------- #

def test_metric_protocol_equivalence_randomized():
    ref_m = install()
    ref_du = load("label_anything.data.utils")

    rng = np.random.default_rng(7)
    cat_ids = list(rng.permutation(np.arange(100, 160))[:12])
    categories = {int(c): {"name": str(c)} for c in cat_ids}
    num_global = len(categories) + 1

    strict = ref_m.StrictMeanIoU(num_classes=num_global, average="macro",
                                 ignore_index=IGNORE_INDEX)
    bm = ref_m.MeanIoU(num_classes=num_global, average="macro",
                       ignore_index=IGNORE_INDEX)
    fb = ref_m.DistributedBinaryJaccardIndex(ignore_index=IGNORE_INDEX)

    cm = np.zeros((num_global, num_global), np.int64)
    cm2 = np.zeros((2, 2), np.int64)

    n_episodes = 0
    for _ in range(100):
        b = int(rng.integers(1, 5))
        ways = int(rng.integers(1, 4))
        c_ep = ways + 1
        classes = []
        for i in range(b):
            k = int(rng.integers(1, ways + 1))
            sample_cats = list(map(int, rng.choice(cat_ids, size=k,
                                                   replace=False)))
            classes.append([sample_cats
                            for _ in range(int(rng.integers(1, 3)))])
        h = w = 17
        gts = rng.integers(0, c_ep, (b, h, w))
        preds = rng.integers(0, c_ep, (b, h, w))
        for i in range(b):
            n_valid = len(sorted(set(sum(classes[i], []))))
            gts[i] = np.minimum(gts[i], n_valid)
            preds[i] = np.minimum(preds[i], n_valid)
        gts[:, -3:, :] = IGNORE_INDEX  # collate padding band
        n_episodes += b

        gp, gg = ref_du.to_global_multiclass(
            classes, categories,
            torch.from_numpy(preds.copy()), torch.from_numpy(gts.copy()))
        strict.update(gp, gg)
        bm.update(gp, gg)
        fb.update(gp.clone(), gg.clone())

        lut = to_global_lut(classes, categories, c_ep)
        cm += global_confusion(preds, gts, lut, num_global)
        cm2 += binary_confusion_np(preds, gts)

    assert n_episodes >= 200
    # the accumulated GLOBAL confusion matrix is bit-identical — mapping
    # (cascade included), ignore handling, and counting all agree
    np.testing.assert_array_equal(cm, strict.confmat.numpy())
    assert abs(float(strict_mean_iou(jnp.asarray(cm)))
               - float(strict.compute())) < 1e-6
    assert abs(float(mean_iou(jnp.asarray(cm))) - float(bm.compute())) < 1e-6
    assert abs(float(fb_iou(jnp.asarray(cm2))) - float(fb.compute())) < 1e-6


# --------------------------------------------------------------------- #
# 2. full canonical-scale validation run
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def canonical_coco_root(tmp_path_factory):
    """Synthetic COCO with 12 categories + per-image 768x30x30 safetensors
    embedding caches (the canonical lam_no_vit + emb_dir configuration)."""
    from safetensors.numpy import save_file

    root = tmp_path_factory.mktemp("protocol_coco")
    (root / "emb").mkdir()
    rng = np.random.default_rng(0)
    images, annotations, ann_id = [], [], 1
    for i in range(1, 25):
        h, w = (480, 480) if i % 2 else (360, 480)  # ragged original dims
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        cats = rng.choice(np.arange(1, 13), size=rng.integers(2, 4),
                          replace=False)
        for cat in cats:
            x0 = int(rng.integers(0, w // 2))
            y0 = int(rng.integers(0, h // 2))
            bw, bh = int(rng.integers(40, 160)), int(rng.integers(40, 160))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": int(cat),
                "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                                  x0, y0 + bh]],
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
        save_file(
            {"embedding": (0.5 * rng.standard_normal(
                (IMG_EMBED, GRID, GRID))).astype(np.float32)},
            str(root / "emb" / f"{str(i).zfill(12)}.safetensors"))
    inst = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": str(c)} for c in range(1, 13)]}
    (root / "instances.json").write_text(json.dumps(inst))
    return root


def _run_config(root, num_samples):
    return {
        "seed": 42,
        "val_params": {"reruns": 1},
        "train_params": {"memory_preflight": False,
                         "loss": {"components": {"focal": {"weight": 1.0}}}},
        "model": {"name": "lam_no_vit", "image_embed_dim": IMG_EMBED,
                  "embed_dim": EMBED, "image_size": IMG, "spatial_convs": 3,
                  "example_class_attention": True,
                  "class_encoder": {"name": "RandomMatrixEncoder",
                                    "bank_size": BANK}},
        "dataset": {"datasets": {
            "val_coco": {"instances_path": str(root / "instances.json"),
                         "emb_dir": str(root / "emb"), "n_shots": 1,
                         "do_subsample": False, "add_box_noise": False,
                         # episodes drawn by class, so num_samples can
                         # exceed the image count (reference: coco.py:564)
                         "class_based_sampling": num_samples > 24,
                         "num_samples": num_samples}},
            "common": {"image_size": IMG, "seed": 0}},
        "dataloader": {"num_workers": 2,
                       # 1-way and 2-way x 1-shot at batch 4 (canonical val
                       # buckets; ragged per-episode class counts come from
                       # all_example_categories)
                       "possible_batch_example_nums": [[4, 1, 1], [4, 2, 1]],
                       "prompt_types": ["point", "bbox", "mask"]},
    }


class _ListLoader:
    """Materialized-batch shim satisfying Run._validate_one's loader
    contract (iteration + .dataset), so BOTH frameworks consume the exact
    same episode tensors."""

    def __init__(self, batches, dataset):
        self._batches, self.dataset = batches, dataset

    def __iter__(self):
        return iter(self._batches)


def _to_torch_batch(batch):
    out = {}
    for k, v in batch.items():
        if k == BatchKeys.EMBEDDINGS:
            # ours is channels-last (B, N, H, W, C); reference wants NCHW
            out[k] = torch.from_numpy(np.ascontiguousarray(
                np.asarray(v).transpose(0, 1, 4, 2, 3)))
        elif k == BatchKeys.PROMPT_MASKS:
            # our loader ships binary prompt masks as uint8 (4x fewer
            # collate/H2D bytes; our model casts on device) — the torch
            # reference's conv wants the fp32 its own dataloader shipped
            out[k] = torch.from_numpy(
                np.asarray(v).astype(np.float32, copy=True))
        elif hasattr(v, "shape"):
            out[k] = torch.from_numpy(np.asarray(v).copy())
        else:
            out[k] = v
    return out


def test_full_validation_protocol_equivalence(canonical_coco_root,
                                              monkeypatch):
    from labelanything_tpu.experiment import run as run_mod
    from labelanything_tpu.parallel.mesh import create_mesh
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                      merge_into_params)
    from tests.test_parity_canonical import _load_ref_build_lam

    monkeypatch.setattr(
        run_mod, "create_mesh",
        lambda **kw: create_mesh(devices=jax.devices()[:1]))

    run = run_mod.Run().init(_run_config(canonical_coco_root, 208),
                             run_dir=str(canonical_coco_root / "run"))
    loader = run.val_loaders["val_coco"]
    batches = list(loader)
    n_episodes = sum(b[BatchKeys.FLAG_EXAMPLES].shape[0]
                     for (b, _), _ in batches)
    assert n_episodes >= 200

    # identical weights on both sides: reference model's state dict imported
    # into our params (same converter the checkpoint loader uses)
    ref_bl = _load_ref_build_lam()
    torch.manual_seed(33)
    ref = ref_bl.build_lam_no_vit(
        image_embed_dim=IMG_EMBED, embed_dim=EMBED, image_size=IMG,
        spatial_convs=3, example_class_attention=True,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": BANK,
                       "embed_dim": EMBED}).eval()
    ref.prompt_encoder.class_encoder.sample_rows = (
        lambda C, device: torch.arange(C, device=device))

    (batch0, _), _ = batches[0]
    device_batch, _ = run._device_batch(batch0)
    sub = Substitutor(substitute=False)
    sub.reset(device_batch)
    input_dict, gt = next(sub)
    run._lazy_init(input_dict, gt)
    conv = convert_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    params = merge_into_params(run.state.params["model"], conv)
    run.state = run.state._replace(
        params={**run.state.params, "model": params})

    # ---- leg A: the production path ----------------------------------- #
    ours = run._validate_one(_ListLoader(batches, loader.dataset), "val")

    # ---- reference protocol machinery ---------------------------------- #
    ref_m = install()
    ref_du = load("label_anything.data.utils")
    RefSub = load("label_anything.experiment.substitution").Substitutor

    categories = next(iter(loader.dataset.datasets.values())).categories
    num_global = len(categories) + 1

    def make_ref_metrics():
        return (ref_m.StrictMeanIoU(num_classes=num_global, average="macro",
                                    ignore_index=IGNORE_INDEX),
                ref_m.MeanIoU(num_classes=num_global, average="macro",
                              ignore_index=IGNORE_INDEX),
                ref_m.DistributedBinaryJaccardIndex(
                    ignore_index=IGNORE_INDEX))

    # leg B: reference forward + reference protocol
    # leg C: OUR predictions + reference protocol (protocol seam isolated)
    # leg D: reference predictions + OUR protocol
    strict_b, bm_b, fb_b = make_ref_metrics()
    strict_c, bm_c, fb_c = make_ref_metrics()
    cm_d = np.zeros((num_global, num_global), np.int64)
    cm2_d = np.zeros((2, 2), np.int64)

    agree, total = 0, 0
    sub_ref = RefSub(substitute=False)
    for (batch, gts), _ in batches:
        tb = _to_torch_batch(batch)
        gt_t = torch.from_numpy(np.asarray(gts)).long()
        sub_ref.reset(batch=(tb, gt_t))
        image_dict, gt_q = next(iter(sub_ref))
        with torch.no_grad():
            result = ref(image_dict)
        ref_preds = result["logits"].argmax(dim=1)

        device_batch, host = run._device_batch(batch)
        sub = Substitutor(substitute=False)
        sub.reset(device_batch)
        our_input, our_gt = next(sub)
        our_preds = np.asarray(run._eval_forward(our_input, our_gt)["preds"])

        classes = host[BatchKeys.CLASSES]
        c_ep = int(our_input[BatchKeys.FLAG_EXAMPLES].shape[2])
        gt_np = np.asarray(our_gt)
        np.testing.assert_array_equal(gt_np, gt_q.numpy())  # same episodes

        # leg B
        gp, gg = ref_du.to_global_multiclass(
            classes, categories, ref_preds.clone(), gt_q.clone().long())
        strict_b.update(gp, gg)
        bm_b.update(gp, gg)
        fb_b.update(gp.clone(), gg.clone())

        # leg C: our preds, reference protocol
        gp, gg = ref_du.to_global_multiclass(
            classes, categories, torch.from_numpy(our_preds.copy()),
            gt_q.clone().long())
        strict_c.update(gp, gg)
        bm_c.update(gp, gg)
        fb_c.update(gp.clone(), gg.clone())

        # leg D: reference preds, our protocol
        lut = to_global_lut(classes, categories, c_ep)
        cm_d += global_confusion(ref_preds.numpy(), gt_np, lut, num_global)
        cm2_d += binary_confusion_np(ref_preds.numpy(), gt_np)

        valid = gt_np != IGNORE_INDEX
        agree += int((our_preds[valid] == ref_preds.numpy()[valid]).sum())
        total += int(valid.sum())

    # ---- protocol equivalence on IDENTICAL predictions ----------------- #
    assert abs(ours["miou"] - float(strict_c.compute())) < 1e-6
    assert abs(ours["bmiou"] - float(bm_c.compute())) < 1e-6
    assert abs(ours["fbiou"] - float(fb_c.compute())) < 1e-6
    assert abs(float(strict_mean_iou(jnp.asarray(cm_d)))
               - float(strict_b.compute())) < 1e-6
    assert abs(float(mean_iou(jnp.asarray(cm_d)))
               - float(bm_b.compute())) < 1e-6
    assert abs(float(fb_iou(jnp.asarray(cm2_d)))
               - float(fb_b.compute())) < 1e-6

    # ---- forward agreement (random weights = fp32 noise-floor margins;
    # trained checkpoints have O(1) relative margins and agree ~100%) ----- #
    assert agree / total > 0.995, agree / total


# --------------------------------------------------------------------- #
# 3. reruns seed protocol
# --------------------------------------------------------------------- #

def test_run_forwards_custom_preprocess_to_model(canonical_coco_root,
                                                 monkeypatch):
    """The model's postprocess unpad semantics must match the dataset
    preprocessing (reference forwards the flag: experiment/run.py:147-151).
    A square-resize dataset (custom_preprocess False — the canonical
    mae.yaml) paired with an aspect-preserving model -inf-masks REAL
    foreground pixels, which is an infinite focal CE on non-square
    images (the pipeline-bench NaN this guards against)."""
    from labelanything_tpu.experiment import run as run_mod
    from labelanything_tpu.parallel.mesh import create_mesh

    monkeypatch.setattr(
        run_mod, "create_mesh",
        lambda **kw: create_mesh(devices=jax.devices()[:1]))

    cfg = _run_config(canonical_coco_root, 8)
    cfg["dataset"]["common"]["custom_preprocess"] = False
    run = run_mod.Run().init(cfg, run_dir=str(canonical_coco_root / "run3"))
    assert run.model.custom_preprocess is False
    run.close()

    cfg = _run_config(canonical_coco_root, 8)
    cfg["dataset"]["common"]["custom_preprocess"] = True
    run = run_mod.Run().init(cfg, run_dir=str(canonical_coco_root / "run4"))
    assert run.model.custom_preprocess is True
    run.close()


def test_validate_reruns_seed_protocol(canonical_coco_root, monkeypatch):
    from labelanything_tpu.experiment import run as run_mod
    from labelanything_tpu.parallel.mesh import create_mesh

    monkeypatch.setattr(
        run_mod, "create_mesh",
        lambda **kw: create_mesh(devices=jax.devices()[:1]))

    cfg = _run_config(canonical_coco_root, 8)
    cfg["val_params"]["reruns"] = 3
    run = run_mod.Run().init(cfg, run_dir=str(canonical_coco_root / "run2"))
    loader = run.val_loaders["val_coco"]

    # reseed determinism on the REAL loader: same seed -> identical episode
    # draws; different seed -> different draws
    def episode_ids(seed):
        loader.batch_sampler.reseed(seed)
        loader.reseed(seed)
        return [tuple(map(tuple, b[BatchKeys.IMAGE_IDS]))
                for (b, _), _ in loader]

    ids_42a, ids_43, ids_42b = (episode_ids(42), episode_ids(43),
                                episode_ids(42))
    assert ids_42a == ids_42b
    assert ids_42a != ids_43

    # Run.validate reseeds each rerun with seed = base + run_idx
    # (reference: run.py:618-641) and averages the per-run metrics
    seen_seeds = []
    orig_sampler_reseed = loader.batch_sampler.reseed

    def record_reseed(seed):
        seen_seeds.append(seed)
        orig_sampler_reseed(seed)

    monkeypatch.setattr(loader.batch_sampler, "reseed", record_reseed)
    per_run_values = iter([0.2, 0.4, 0.9])
    monkeypatch.setattr(
        run_mod.Run, "_validate_one",
        lambda self, ldr, name, epoch=None: {"miou": next(per_run_values)})
    results = run.validate(epoch=0)
    assert seen_seeds == [42, 43, 44]
    assert abs(results["val_coco_miou"] - 0.5) < 1e-9
    run.close()
