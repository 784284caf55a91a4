"""Metric-fidelity fixtures vs the reference implementations
(reference: label_anything/utils/metrics.py, data/utils.py:568-589)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

from labelanything_tpu.train.metrics import (ImIoU, PmIoU, StreamingBinaryAUC,
                                             confusion_matrix, dm_iou,
                                             macro_f1)
from labelanything_tpu.typing import IGNORE_INDEX


def _episode(n_cls=4, hw=24, seed=25, with_ignore=True):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, n_cls, (3, hw, hw))
    target = rng.integers(0, n_cls, (3, hw, hw))
    if with_ignore:
        target[:, :, -3:] = IGNORE_INDEX
    return pred, target


def test_pmiou_matches_reference():
    ref_m = load("label_anything.utils.metrics")
    pred, target = _episode()
    # the reference uses 255 as its implicit ignore value in pred counting
    target_ref = np.where(target == IGNORE_INDEX, 255, target)

    ref = ref_m.PmIoU(max_label=3)
    ours = PmIoU(max_label=3)
    for i in range(pred.shape[0]):
        ref.update(torch.from_numpy(pred[i]), torch.from_numpy(target_ref[i]))
        ours.update(pred[i], np.where(target[i] == IGNORE_INDEX,
                                      IGNORE_INDEX, target[i]))
    assert abs(ours.compute() - float(ref.compute())) < 1e-9


def test_dmiou_matches_reference():
    ref_m = load("label_anything.utils.metrics")
    pred, target = _episode(with_ignore=False)
    ref = ref_m.DmIoU(num_classes=3)
    ref.update(torch.from_numpy(pred), torch.from_numpy(target))
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 4)
    assert abs(float(dm_iou(cm)) - float(ref.compute())) < 1e-7


def test_imiou_matches_reference():
    ref_m = load("label_anything.utils.metrics")
    rng = np.random.default_rng(26)
    way = 2
    class_map = np.array([0, 7, 12])          # local 1 -> global 7, 2 -> 12
    ref = ref_m.ImIoU(class_ids=list(range(1, 21)), n_ways=way,
                      benchmark="pascal")
    ours = ImIoU(class_ids=list(range(1, 21)), nclass=20)
    for i in range(3):
        pred_local = rng.integers(0, way + 1, (20, 20))
        gt_local = rng.integers(0, way + 1, (20, 20))
        # the reference takes GLOBAL-id masks and rebuilds the local mapping
        pred_g = class_map[pred_local]
        gt_g = class_map[gt_local]
        ref.update(torch.from_numpy(pred_g[None]), torch.from_numpy(gt_g[None]))
        ours.update(pred_local, gt_local, class_map)
    assert abs(ours.compute() - float(ref.compute())) < 1e-7


def test_to_global_lut_matches_reference():
    """to_global_lut + global mapping == reference to_global_multiclass on a
    recorded batch (VERDICT round-1 weak #7). Episode classes here have
    global ranks > n_ways, the non-degenerate regime (see the cascade test
    below for why that matters)."""
    ref_du = load("label_anything.data.utils")
    from labelanything_tpu.experiment.run import to_global_lut

    rng = np.random.default_rng(27)
    categories = {17: {"name": "a"}, 3: {"name": "b"}, 42: {"name": "c"},
                  8: {"name": "d"}}  # non-sorted insertion order on purpose
    classes = [
        [[42, 8], [8]],        # sample 0: episode classes {8, 42} -> ranks 4, 3
        [[42], [8, 42]],       # sample 1: same
    ]
    gts = rng.integers(0, 3, (2, 16, 16))  # episode-local ids (bg + 2 ways)

    (ref_mapped,) = ref_du.to_global_multiclass(
        classes, categories, torch.from_numpy(gts.copy()))

    lut = to_global_lut(classes, categories, num_episode_classes=3)
    ours_mapped = np.stack([lut[i][gts[i]] for i in range(2)])
    np.testing.assert_array_equal(ours_mapped, ref_mapped.numpy())


def test_to_global_multiclass_reference_cascade():
    """Pin the reference's sequential IN-PLACE substitution semantics
    (data/utils.py:583-589): when an episode class's global value equals a
    LATER episode index, already-substituted pixels are substituted again
    and distinct ways collapse. Episode classes with global ranks (2, 5):
    the reference maps local 1 -> 2 -> then every 2 (including those) -> 5.
    The default LUT folds this cascade (published numbers were measured with
    it — protocol parity requires the same ruler); cascade=False keeps the
    intended independent mapping."""
    ref_du = load("label_anything.data.utils")
    from labelanything_tpu.experiment.run import to_global_lut

    categories = {c: {"name": str(c)} for c in range(1, 11)}  # ranks = ids
    classes = [[[2, 5], [2]]]
    gts = np.array([[[0, 1, 2]]])

    (ref_mapped,) = ref_du.to_global_multiclass(
        classes, categories, torch.from_numpy(gts.copy()))
    assert ref_mapped.numpy().tolist() == [[[0, 5, 5]]]  # ways collapsed!

    lut = to_global_lut(classes, categories, num_episode_classes=3)
    assert lut[0][gts[0]].tolist() == [[0, 5, 5]]  # cascade-faithful default

    lut_fixed = to_global_lut(classes, categories, num_episode_classes=3,
                              cascade=False)
    assert lut_fixed[0][gts[0]].tolist() == [[0, 2, 5]]  # intended mapping


def test_macro_f1_and_auc_consistency():
    rng = np.random.default_rng(28)
    pred = rng.integers(0, 3, (2, 32, 32))
    target = rng.integers(0, 3, (2, 32, 32))
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 3)
    # handwritten macro F1
    cm_np = np.asarray(cm)
    f1s = []
    for c in range(3):
        tp = cm_np[c, c]
        fp = cm_np[:, c].sum() - tp
        fn = cm_np[c, :].sum() - tp
        f1s.append(2 * tp / (2 * tp + fp + fn))
    assert abs(float(macro_f1(cm)) - float(np.mean(f1s))) < 1e-7

    # streaming AUC == exact Mann-Whitney AUC on pre-quantized scores
    bins = 512
    scores = rng.integers(0, bins, 4000) / bins
    labels = rng.integers(0, 2, 4000)
    auc = StreamingBinaryAUC(bins=bins)
    auc.update(scores, labels)
    pos, neg = scores[labels == 1], scores[labels == 0]
    greater = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    exact = (greater + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(auc.compute() - exact) < 1e-9


def test_fold_global_confusion_matches_pixel_path():
    """Device-confmat + LUT fold == host pixel-level global_confusion."""
    import jax

    from labelanything_tpu.experiment.run import (binary_confusion_np,
                                                  fold_global_confusion,
                                                  global_confusion,
                                                  to_global_lut)
    from labelanything_tpu.train.metrics import (
        binary_confusion_matrix, confusion_matrix_per_sample)

    rng = np.random.default_rng(0)
    b, c_ep, h, w, num_global = 3, 4, 17, 19, 9
    preds = rng.integers(0, c_ep, (b, h, w))
    gts = rng.integers(0, c_ep, (b, h, w))
    gts[rng.random((b, h, w)) < 0.2] = IGNORE_INDEX
    classes = [[[2, 5], [5, 7]], [[1], [3, 6]], [[4], [2]]]
    categories = {k: {"name": str(k)} for k in range(1, 9)}
    lut = to_global_lut(classes, categories, c_ep)

    expected = global_confusion(preds, gts, lut, num_global)
    cm_ps = np.asarray(confusion_matrix_per_sample(
        jnp.asarray(preds), jnp.asarray(gts), c_ep))
    got = fold_global_confusion(np.zeros((num_global, num_global), np.int64),
                                cm_ps, lut, num_global)
    np.testing.assert_array_equal(got, expected)

    expected2 = binary_confusion_np(preds, gts)
    got2 = np.asarray(binary_confusion_matrix(jnp.asarray(preds),
                                              jnp.asarray(gts)))
    np.testing.assert_array_equal(got2, expected2)
