"""FPTrans parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

from labelanything_tpu.models.fptrans import (FPTrans, FPTransMultiClass,
                                              compute_multiple_prototypes,
                                              pairwise_loss)
from labelanything_tpu.utils.torch_import import (convert_fptrans_state_dict,
                                                  merge_into_params)

IMG, EMBED, DEPTH, HEADS = 64, 32, 2, 2
BG_NUM, NCLS, NUM_PROMPT = 2, 5, 12  # divider = 3, G = 4


class _FakeSampler:
    """Deterministic stand-ins for the reference's np.RandomState calls:
    choice(n) -> 0 (first valid FPS point); choice(n, size, replace=False)
    -> arange(size) (prompt bank rows in order)."""

    def choice(self, n, size=None, replace=True):
        if size is None:
            return 0
        return np.arange(size) % n


class _DotDict(dict):
    __getattr__ = dict.get
    __setattr__ = dict.__setitem__


def build_ref(shot=1):
    ref_vit = load("label_anything.models.fptrans.vit")
    ref_fpt = load("label_anything.models.fptrans.FPTrans")
    ref_vit.vit_factory["ViT-Test/16"] = {
        "patch_size": 16, "embed_dim": EMBED, "depth": DEPTH,
        "num_heads": HEADS, "distilled": False,
    }
    opt = _DotDict({
        "shot": shot, "drop_dim": 1, "drop_rate": 0.0, "block_size": 4,
        "backbone": "ViT-Test/16", "tqdm": False, "height": IMG,
        "bg_num": BG_NUM, "num_prompt": NUM_PROMPT, "vit_stride": None,
        "dataset": "COCO", "coco2pascal": False, "pt_std": 0.02,
        "vit_depth": DEPTH,
    })
    import logging
    torch.manual_seed(3)
    ref = ref_fpt.FPTrans(opt, logging.getLogger("t"), "").eval()
    ref.bg_sampler = _FakeSampler()
    ref.encoder.backbone.sampler = _FakeSampler()
    # ncls for COCO is 60; shrink the bank to NCLS for the test by slicing
    divider = 1 + BG_NUM * shot
    g = NUM_PROMPT // divider
    ref.encoder.backbone.prompt_tokens = torch.nn.Parameter(
        ref.encoder.backbone.prompt_tokens[: NCLS * divider].clone())
    return ref


def build_ours(shot=1):
    return FPTrans(image_size=IMG, embed_dim=EMBED, depth=DEPTH,
                   num_heads=HEADS, bg_num=BG_NUM, num_prompt=NUM_PROMPT,
                   ncls=NCLS, shot=shot, drop_rate=0.0, fps_first="first_valid")


def _episode(shot=1, b=2, seed=4):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, IMG, IMG, 3)).astype(np.float32)
    sx = rng.standard_normal((b, shot, IMG, IMG, 3)).astype(np.float32)
    sy = rng.integers(0, 2, (b, shot, IMG, IMG)).astype(np.float32)
    return q, sx, sy


def _load_ours(ours, ref, example_args):
    params = ours.init(jax.random.key(0), *example_args)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_fptrans_state_dict(sd)
    return merge_into_params(params, converted)


@pytest.mark.parametrize("shot", [1, 2])
def test_fptrans_forward_parity(shot):
    ref = build_ref(shot)
    ours = build_ours(shot)
    q, sx, sy = _episode(shot)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(q.transpose(0, 3, 1, 2)),
            torch.from_numpy(sx.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(sy),
        )["out"].numpy()

    args = (jnp.asarray(q), jnp.asarray(sx), jnp.asarray(sy))
    params = _load_ours(ours, ref, args)
    out = np.asarray(ours.apply(params, *args)["out"])
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)


def test_fps_prototypes_parity():
    """compute_multiple_prototypes vs the reference static method, with the
    deterministic first point."""
    ref_fpt = load("label_anything.models.fptrans.FPTrans")
    rng = np.random.default_rng(5)
    b, s, h, w, c = 2, 2, 7, 9, 6
    fts = rng.standard_normal((b, s, h, w, c)).astype(np.float32)
    bg = rng.integers(0, 2, (b, s, h, w)).astype(bool)

    fts_t = torch.from_numpy(fts.transpose(0, 1, 4, 2, 3))
    bg_t = torch.from_numpy(bg.reshape(b * s, 1, h, w))
    ref = ref_fpt.FPTrans.compute_multiple_prototypes(
        BG_NUM, fts_t, bg_t, _FakeSampler()).numpy()  # (B, c, k)

    ours = np.asarray(compute_multiple_prototypes(
        BG_NUM, jnp.asarray(fts), jnp.asarray(bg), first="first_valid"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pairwise_loss_parity():
    ref_losses = load("label_anything.models.fptrans.losses")
    rng = np.random.default_rng(6)
    b, s, c, n = 2, 2, 8, 30
    x1 = rng.standard_normal((b, s, c, n)).astype(np.float32)
    x2 = rng.standard_normal((b, 1, c, n)).astype(np.float32)
    y1 = rng.choice([0, 1, 255], (b, s, n)).astype(np.int64)
    y2 = rng.choice([0, 1, 255], (b, 1, n)).astype(np.int64)
    ref = ref_losses.PairwiseLoss()(
        torch.from_numpy(x1), torch.from_numpy(y1),
        torch.from_numpy(x2), torch.from_numpy(y2)).item()
    ours = float(pairwise_loss(jnp.asarray(x1), jnp.asarray(y1),
                               jnp.asarray(x2), jnp.asarray(y2)))
    assert abs(ours - ref) < 1e-5


def test_fptrans_multiclass_forward():
    from labelanything_tpu.data.synthetic import random_full_batch
    from labelanything_tpu.typing import ResultDict

    model = FPTransMultiClass(image_size=IMG, embed_dim=EMBED, depth=DEPTH,
                              num_heads=HEADS, bg_num=BG_NUM,
                              num_prompt=NUM_PROMPT, ncls=NCLS,
                              fps_first="first_valid")
    batch = jax.tree.map(jnp.asarray, random_full_batch(
        batch_size=1, num_examples=1, num_classes=3, image_size=IMG,
        with_images=True, include_points=False, include_boxes=False))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    logits = np.asarray(out[ResultDict.LOGITS])
    assert logits.shape == (1, 3, IMG, IMG)
    assert np.isfinite(logits).any()
