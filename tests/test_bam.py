"""BAM parity vs the reference torch implementation."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

from labelanything_tpu.models.bam import (BAM, BAMMultiClass, gram_matrix,
                                          weighted_gap)
from labelanything_tpu.utils.torch_import import (convert_bam_state_dict,
                                                  merge_into_variables)

IMG = 65  # (65-1)/8*8+1 = 65, zoom-factor friendly


def _args(shot):
    return SimpleNamespace(
        layers=50, vgg=False, aux_weight1=1.0, aux_weight2=1.0,
        low_fea="layer2", kshot_trans_dim=2, merge="final", merge_tau=0.9,
        zoom_factor=8, shot=shot, data_set="coco", ignore_label=255,
        print_freq=10, split=0, momentum=0.9, weight_decay=1e-4,
    )


def build_ref(shot, tmp_path):
    ref_resnet = load("label_anything.models.bam.resnet")
    ref_psp = load("label_anything.models.bam.PSPNet")
    ref_bam = load("label_anything.models.bam.BAM")

    def local_resnet50(pretrained=True, **kw):
        return ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3],
                                 deep_base=True)

    orig_psp_rn = ref_psp.models.resnet50
    ref_psp.models.resnet50 = local_resnet50
    cwd = os.getcwd()
    try:
        torch.manual_seed(17)
        psp = ref_psp.OneModel(_args(shot))
        ckpt_dir = tmp_path / "checkpoints/bam/PSPNet/coco/split0/resnet50"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        torch.save({"state_dict": psp.state_dict()}, ckpt_dir / "best.pth")
        os.chdir(tmp_path)
        torch.manual_seed(18)
        ref = ref_bam.OneModel(_args(shot), cls_type="Base").eval()
    finally:
        os.chdir(cwd)
        ref_psp.models.resnet50 = orig_psp_rn
    return ref


def test_weighted_gap_and_gram_parity():
    ref_bam = load("label_anything.models.bam.BAM")
    rng = np.random.default_rng(19)
    feat = rng.standard_normal((2, 9, 9, 16)).astype(np.float32)
    mask = rng.integers(0, 2, (2, 9, 9, 1)).astype(np.float32)
    ref_gap = ref_bam.Weighted_GAP(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask.transpose(0, 3, 1, 2))).numpy()
    ours_gap = np.asarray(weighted_gap(jnp.asarray(feat), jnp.asarray(mask)))
    np.testing.assert_allclose(ours_gap.transpose(0, 3, 1, 2), ref_gap,
                               rtol=1e-5, atol=1e-6)

    ref_gram = ref_bam.get_gram_matrix(
        torch.from_numpy(feat.transpose(0, 3, 1, 2))).numpy()
    ours_gram = np.asarray(gram_matrix(jnp.asarray(feat)))
    np.testing.assert_allclose(ours_gram, ref_gram, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shot", [1, 2])
def test_bam_forward_parity(shot, tmp_path):
    ref = build_ref(shot, tmp_path)
    rng = np.random.default_rng(20)
    b = 1
    x = rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32)
    s_x = rng.standard_normal((b, shot, 3, IMG, IMG)).astype(np.float32)
    s_y = rng.integers(0, 2, (b, shot, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(s_x),
                      torch.from_numpy(s_y), None, None, None).numpy()

    ours = BAM(shot=shot, base_classes=60)
    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(s_x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(s_y))
    variables = ours.init(jax.random.key(0), *args)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_bam_state_dict(sd, scope="")
    variables = merge_into_variables(variables, converted)
    out = np.asarray(ours.apply(variables, *args))
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)


def test_bam_multiclass_forward():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.typing import ResultDict

    model = BAMMultiClass(shot=1, base_classes=9, image_size=IMG,
                          resnet_layers=(1, 1, 1, 1))
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=2, num_classes=3, image_size=IMG,
        with_images=True, include_points=False, include_boxes=False))
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, IMG, IMG)
    assert np.isfinite(logits).any()
