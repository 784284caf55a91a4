"""DENet parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

from labelanything_tpu.models.denet import (DENet, DENetMultiClass,
                                            get_binary_logits)
from labelanything_tpu.utils.torch_import import (convert_denet_state_dict,
                                                  merge_into_variables)

IMG, NUM_CLASSES = 64, 9


class _TorchTinyBackbone(torch.nn.Module):
    """Stride-8 stand-in producing the 1024-channel layer3 map."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 1024, kernel_size=8, stride=8)

    def forward(self, x):
        return {"layer3": self.conv(x)}


class _JaxTinyBackbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(1024, (8, 8), strides=(8, 8), name="conv")(x)


def test_get_binary_logits_parity():
    ref_utils = load("label_anything.models.denet.utils")
    rng = np.random.default_rng(12)
    full = rng.standard_normal((3, NUM_CLASSES, 5, 5)).astype(np.float32)
    label = np.array([2, 0, 7])
    ref = ref_utils.get_binary_logits(torch.from_numpy(full),
                                      torch.from_numpy(label)).numpy()
    ours = np.asarray(get_binary_logits(jnp.asarray(full), jnp.asarray(label)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=0)


@pytest.mark.parametrize("way,shot", [(1, 1), (2, 2)])
def test_denet_forward_parity(way, shot):
    ref_dn = load("label_anything.models.denet.head.denet")

    orig_backbone = ref_dn.get_backbone
    ref_dn.get_backbone = lambda name: _TorchTinyBackbone
    try:
        torch.manual_seed(13)
        ref = ref_dn.DENet(maximum_num_classes=NUM_CLASSES,
                           visualize=False).eval()
    finally:
        ref_dn.get_backbone = orig_backbone

    rng = np.random.default_rng(14)
    b = 2
    s_imgs = rng.standard_normal((b, way, shot, 3, IMG, IMG)).astype(np.float32)
    s_masks = rng.integers(0, 2, (b, way, shot, IMG, IMG)).astype(np.float32)
    q_img = rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32)
    label = rng.integers(1, NUM_CLASSES, (b, way)).astype(np.int64)

    with torch.no_grad():
        lbl = torch.from_numpy(label)
        if way == 1:
            lbl = lbl[:, 0]  # the wrapper squeezes 1-way labels
        full_ref, bin_ref = ref(torch.from_numpy(s_imgs),
                                torch.from_numpy(s_masks),
                                torch.from_numpy(q_img), lbl)

    ours = DENet(maximum_num_classes=NUM_CLASSES,
                 backbone=_JaxTinyBackbone())
    args = (jnp.asarray(s_imgs.transpose(0, 1, 2, 4, 5, 3)),
            jnp.asarray(s_masks),
            jnp.asarray(q_img.transpose(0, 2, 3, 1)),
            jnp.asarray(label))
    variables = ours.init(jax.random.key(0), *args)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_denet_state_dict(sd, scope="")
    variables = merge_into_variables(variables, converted)
    full, binary = ours.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(full), full_ref.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(binary), bin_ref.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_denet_multiclass_forward():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.typing import ResultDict

    model = DENetMultiClass(image_size=IMG, maximum_num_classes=NUM_CLASSES,
                            resnet_layers=(1, 1, 1, 1))
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=2, num_classes=3, image_size=IMG,
        with_images=True, include_points=False, include_boxes=False))
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, IMG, IMG)
    assert np.isfinite(logits).any()
