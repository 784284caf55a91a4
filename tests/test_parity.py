"""Numerical parity tests against the PyTorch reference implementation.

Builds tiny twin modules (reference torch vs this framework), transfers the
reference's randomly initialized weights through the torch_import converter,
and compares forward outputs within fp32 tolerance. This is the behavioural
contract that makes released checkpoints loadable bit-compatibly.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (deselect with -m "not parity")

from tests._reference import load

ref_common = load("label_anything.models.common")
ref_transformer = load("label_anything.models.transformer")
ref_pe = load("label_anything.models.prompt_encoder")
ref_md = load("label_anything.models.mask_decoder")
ref_ie = load("label_anything.models.image_encoder")

from labelanything_tpu.models.image_encoder import ImageEncoderViT
from labelanything_tpu.models.mask_decoder import MaskDecoderLam
from labelanything_tpu.models.prompt_encoder import (
    IdentityClassEncoder, PromptImageEncoder,
)
from labelanything_tpu.models.transformer import TwoWayTransformer
from labelanything_tpu.typing import BatchKeys, ResultDict
from labelanything_tpu.utils.torch_import import convert_state_dict, merge_into_params

D = 32
HEADS = 8
MLP = 64
GRID = 4
IMG = 64
RNG = np.random.default_rng(0)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def transfer(module, example_args, state_dict, method=None, kind="lam"):
    params = module.init(jax.random.key(0), *example_args, **({} if method is None else {"method": method}))
    converted = convert_state_dict(to_np(state_dict), kind=kind)
    return merge_into_params(params, converted)


def make_two_way(seed=0):
    torch.manual_seed(seed)
    ref = ref_transformer.TwoWayTransformer(
        depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
        attention_downsample_rate=2,
    ).eval()
    ours = TwoWayTransformer(depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                             attention_downsample_rate=2)
    return ref, ours


def test_two_way_transformer_parity():
    ref, ours = make_two_way()
    img = RNG.standard_normal((2, D, GRID, GRID)).astype(np.float32)
    pe = RNG.standard_normal((2, D, GRID, GRID)).astype(np.float32)
    tokens = RNG.standard_normal((2, 5, D)).astype(np.float32)

    with torch.no_grad():
        q_ref, k_ref = ref(torch.from_numpy(img), torch.from_numpy(pe),
                           torch.from_numpy(tokens))

    args = (jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(pe.transpose(0, 2, 3, 1)), jnp.asarray(tokens))
    params = transfer(ours, args, ref.state_dict())
    q, k = ours.apply(params, *args)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k), k_ref.numpy(), rtol=2e-4, atol=2e-5)


def _ref_prompt_encoder(**kw):
    torch.manual_seed(1)
    return ref_pe.PromptImageEncoder(
        embed_dim=D,
        image_embedding_size=(GRID, GRID),
        input_image_size=(IMG, IMG),
        mask_in_chans=16,
        transformer=ref_transformer.TwoWayTransformer(
            depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
            attention_downsample_rate=2),
        class_encoder=lambda x, y: (x, y),
        **kw,
    ).eval()


def _our_prompt_encoder(**kw):
    return PromptImageEncoder(
        embed_dim=D,
        image_embedding_size=(GRID, GRID),
        input_image_size=(IMG, IMG),
        mask_in_chans=16,
        transformer=TwoWayTransformer(depth=2, embedding_dim=D, num_heads=HEADS,
                                      mlp_dim=MLP, attention_downsample_rate=2),
        class_encoder=IdentityClassEncoder(),
        mlp_dim=2048,
        **kw,
    )


def _prompt_inputs(b=2, m=2, c=3, n=2):
    coords = RNG.uniform(0, IMG, (b, m, c, n, 2)).astype(np.float32)
    labels = RNG.integers(-1, 2, (b, m, c, n)).astype(np.int32)
    x0 = RNG.uniform(0, IMG / 2, (b, m, c, n, 2)).astype(np.float32)
    boxes = np.concatenate([x0, x0 + RNG.uniform(1, IMG / 2, (b, m, c, n, 2))],
                           axis=-1).astype(np.float32)
    bflags = RNG.integers(0, 2, (b, m, c, n)).astype(np.int32)
    masks = RNG.integers(0, 2, (b, m, c, 16, 16)).astype(np.float32)
    mflags = RNG.integers(0, 2, (b, m, c)).astype(np.int32)
    flag_examples = RNG.integers(0, 2, (b, m, c)).astype(np.int32)
    flag_examples[:, :, 0] = 1
    embeddings = RNG.standard_normal((b, m, D, GRID, GRID)).astype(np.float32)
    return coords, labels, boxes, bflags, masks, mflags, flag_examples, embeddings


@pytest.mark.parametrize("use", ["all", "points", "boxes", "masks"])
def test_prompt_image_encoder_parity(use):
    ref = _ref_prompt_encoder()
    ours = _our_prompt_encoder()
    coords, labels, boxes, bflags, masks, mflags, flag_examples, emb = _prompt_inputs()

    t = torch.from_numpy
    ref_points = (t(coords), t(labels)) if use in ("all", "points") else None
    ref_boxes = (t(boxes), t(bflags)) if use in ("all", "boxes") else None
    ref_masks = (t(masks), t(mflags)) if use in ("all", "masks") else None
    with torch.no_grad():
        out_ref = ref(
            image_embeddings=t(emb), points=ref_points, boxes=ref_boxes,
            masks=ref_masks, flag_examples=t(flag_examples),
        )

    j = jnp.asarray
    our_points = (j(coords), j(labels)) if use in ("all", "points") else None
    our_boxes = (j(boxes), j(bflags)) if use in ("all", "boxes") else None
    our_masks = (j(masks), j(mflags)) if use in ("all", "masks") else None
    args = (j(emb.transpose(0, 1, 3, 4, 2)), our_points, our_boxes, our_masks,
            j(flag_examples))
    params = transfer(ours, args, ref.state_dict())
    out = ours.apply(params, *args)

    np.testing.assert_allclose(
        np.asarray(out[ResultDict.CLASS_EMBS]),
        out_ref[ref_pe.ResultDict.CLASS_EMBS].numpy(), rtol=1e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out[ResultDict.EXAMPLES_CLASS_EMBS]),
        out_ref[ref_pe.ResultDict.EXAMPLES_CLASS_EMBS].numpy(),
        rtol=1e-3, atol=5e-4,
    )
    src_ref = out_ref[ref_pe.ResultDict.EXAMPLES_CLASS_SRC].numpy()
    np.testing.assert_allclose(
        np.asarray(out[ResultDict.EXAMPLES_CLASS_SRC]).transpose(0, 3, 1, 2),
        src_ref, rtol=1e-3, atol=5e-4,
    )


def test_mask_decoder_parity():
    torch.manual_seed(2)
    ref = ref_md.MaskDecoderLam(
        transformer_dim=D,
        transformer=ref_transformer.TwoWayTransformer(
            depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
            attention_downsample_rate=2),
        classification_layer_downsample_rate=8,
    ).eval()
    ours = MaskDecoderLam(
        transformer_dim=D,
        transformer=TwoWayTransformer(depth=2, embedding_dim=D, num_heads=HEADS,
                                      mlp_dim=MLP, attention_downsample_rate=2),
        classification_layer_downsample_rate=8,
    )

    b, c, m = 2, 3, 2
    query = RNG.standard_normal((b, D, GRID, GRID)).astype(np.float32)
    image_pe = RNG.standard_normal((1, D, GRID, GRID)).astype(np.float32)
    class_embs = RNG.standard_normal((b, c, D)).astype(np.float32)
    ex_class_embs = RNG.standard_normal((b, m, c, D)).astype(np.float32)
    flag_examples = RNG.integers(0, 2, (b, m, c)).astype(np.int32)
    flag_examples[:, :, 0] = 1

    pe_result_ref = {
        ref_pe.ResultDict.CLASS_EMBS: torch.from_numpy(class_embs),
        ref_pe.ResultDict.EXAMPLES_CLASS_EMBS: torch.from_numpy(ex_class_embs),
    }
    with torch.no_grad():
        seg_ref = ref(
            query_embeddings=torch.from_numpy(query),
            support_embeddings=None,
            image_pe=torch.from_numpy(image_pe),
            pe_result=pe_result_ref,
            flag_examples=torch.from_numpy(flag_examples),
        )

    pe_result = {
        ResultDict.CLASS_EMBS: jnp.asarray(class_embs),
        ResultDict.EXAMPLES_CLASS_EMBS: jnp.asarray(ex_class_embs),
    }
    args = (jnp.asarray(query.transpose(0, 2, 3, 1)), None,
            jnp.asarray(image_pe.transpose(0, 2, 3, 1)), pe_result,
            jnp.asarray(flag_examples))
    params = transfer(ours, args, ref.state_dict())
    seg = ours.apply(params, *args)
    np.testing.assert_allclose(np.asarray(seg), seg_ref.numpy(),
                               rtol=1e-3, atol=5e-4)


def test_sam_vit_parity():
    torch.manual_seed(3)
    ref = ref_ie.ImageEncoderViT(
        img_size=IMG, patch_size=16, embed_dim=D, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    ).eval()
    # non-zero rel-pos to make the test meaningful
    with torch.no_grad():
        for blk in ref.blocks:
            blk.attn.rel_pos_h.normal_()
            blk.attn.rel_pos_w.normal_()
        ref.pos_embed.normal_()
    ours = ImageEncoderViT(
        img_size=IMG, patch_size=16, embed_dim=D, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    )
    x = RNG.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()  # (1, 16, 4, 4)
    args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
    params = transfer(ours, args, ref.state_dict(), kind="sam_encoder")
    y = np.asarray(ours.apply(params, *args)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=5e-4)


def test_full_lam_parity():
    """Assemble the reference Lam (no ViT, with neck) and compare pre-
    postprocess seg logits plus our fixed-frame postprocess at full dims."""
    ref_lam_mod = pytest.importorskip("label_anything.models.lam")
    torch.manual_seed(4)
    image_embed_dim = 24

    neck = torch.nn.Sequential(
        torch.nn.Conv2d(image_embed_dim, D, 1, bias=False),
        ref_common.LayerNorm2d(D),
        torch.nn.Conv2d(D, D, 3, padding=1, bias=False),
        ref_common.LayerNorm2d(D),
    )
    ref = ref_lam_mod.Lam(
        image_encoder=None,
        prompt_encoder=_ref_prompt_encoder(),
        mask_decoder=ref_md.MaskDecoderLam(
            transformer_dim=D,
            transformer=ref_transformer.TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                attention_downsample_rate=2),
        ),
        neck=neck,
        image_size=IMG,
    ).eval()

    from labelanything_tpu.models.lam import Lam, Neck
    ours = Lam(
        image_encoder=None,
        prompt_encoder=_our_prompt_encoder(),
        mask_decoder=MaskDecoderLam(
            transformer_dim=D,
            transformer=TwoWayTransformer(depth=2, embedding_dim=D,
                                          num_heads=HEADS, mlp_dim=MLP,
                                          attention_downsample_rate=2)),
        neck=Neck(D),
        image_size=IMG,
    )

    coords, labels, boxes, bflags, masks, mflags, flag_examples, _ = _prompt_inputs()
    b, m = 2, 2
    emb = RNG.standard_normal((b, m + 1, image_embed_dim, GRID, GRID)).astype(np.float32)
    dims = np.tile([[IMG, IMG]], (b, m + 1, 1)).astype(np.int64)

    t = torch.from_numpy
    batch_ref = {
        "embeddings": t(emb),
        "prompt_points": t(coords), "flag_points": t(labels),
        "prompt_bboxes": t(boxes), "flag_bboxes": t(bflags),
        "prompt_masks": t(masks), "flag_masks": t(mflags),
        "flag_examples": t(flag_examples),
        "dims": t(dims),
    }
    with torch.no_grad():
        seg_ref, _ = ref._forward(batch_ref)
        post_ref = ref.postprocess_masks(seg_ref, t(dims))

    j = jnp.asarray
    batch = {
        BatchKeys.EMBEDDINGS: j(emb.transpose(0, 1, 3, 4, 2)),
        BatchKeys.PROMPT_POINTS: j(coords), BatchKeys.FLAG_POINTS: j(labels),
        BatchKeys.PROMPT_BBOXES: j(boxes), BatchKeys.FLAG_BBOXES: j(bflags),
        BatchKeys.PROMPT_MASKS: j(masks), BatchKeys.FLAG_MASKS: j(mflags),
        BatchKeys.FLAG_EXAMPLES: j(flag_examples),
        BatchKeys.DIMS: j(dims),
    }
    params = ours.init(jax.random.key(0), batch)
    converted = convert_state_dict(to_np(ref.state_dict()))
    params = merge_into_params(params, converted)
    out = ours.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out[ResultDict.LOGITS]), post_ref.numpy(),
        rtol=1e-3, atol=5e-4,
    )
