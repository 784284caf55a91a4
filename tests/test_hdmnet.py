"""HDMNet parity vs the reference torch implementation."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

from labelanything_tpu.models.hdmnet import (HDMNet, HDMNetMultiClass,
                                             get_similarity)
from labelanything_tpu.utils.torch_import import (convert_hdmnet_state_dict,
                                                  merge_into_variables)

IMG = 65


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
    ref_hdm = load("label_anything.models.hdmnet.HDMNet")

    def local_resnet50(pretrained=True, **kw):
        return ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3],
                                 deep_base=True)

    orig_psp_rn = ref_psp.models.resnet50
    ref_psp.models.resnet50 = local_resnet50
    cwd = os.getcwd()
    try:
        torch.manual_seed(21)
        psp = ref_psp.OneModel(_args(shot))
        ckpt_dir = tmp_path / "checkpoints/bam/PSPNet/coco/split0/resnet50"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        torch.save({"state_dict": psp.state_dict()}, ckpt_dir / "best.pth")
        os.chdir(tmp_path)
        torch.manual_seed(22)
        ref = ref_hdm.OneModel(_args(shot), cls_type="Base").eval()
    finally:
        os.chdir(cwd)
        ref_psp.models.resnet50 = orig_psp_rn
    return ref


def test_get_similarity_parity():
    ref_hdm = load("label_anything.models.hdmnet.HDMNet")
    rng = np.random.default_rng(23)
    q = rng.standard_normal((2, 9, 9, 16)).astype(np.float32)
    s = rng.standard_normal((2, 9, 9, 16)).astype(np.float32)
    mask = rng.integers(0, 2, (2, IMG, IMG)).astype(np.float32)
    ref = ref_hdm.get_similarity(
        torch.from_numpy(q.transpose(0, 3, 1, 2)),
        torch.from_numpy(s.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask)).numpy()
    ours = np.asarray(get_similarity(jnp.asarray(q), jnp.asarray(s),
                                     jnp.asarray(mask)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shot", [1, 2])
def test_hdmnet_forward_parity(shot, tmp_path):
    ref = build_ref(shot, tmp_path)
    rng = np.random.default_rng(24)
    b = 1
    x = rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32)
    s_x = rng.standard_normal((b, shot, 3, IMG, IMG)).astype(np.float32)
    s_y = rng.integers(0, 2, (b, shot, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), s_x=torch.from_numpy(s_x),
                      s_y=torch.from_numpy(s_y)).numpy()

    ours = HDMNet(shot=shot, base_classes=60)
    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(s_x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(s_y))
    variables = ours.init(jax.random.key(0), *args)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_hdmnet_state_dict(sd, scope="")
    variables = merge_into_variables(variables, converted)
    out = np.asarray(ours.apply(variables, *args))
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)


def test_hdmnet_multiclass_forward():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.typing import ResultDict

    model = HDMNetMultiClass(shot=1, base_classes=9, image_size=IMG,
                             resnet_layers=(1, 1, 1, 1))
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=2, num_classes=3, image_size=IMG,
        with_images=True, include_points=False, include_boxes=False))
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, IMG, IMG)
    assert np.isfinite(logits).any()
