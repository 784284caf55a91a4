"""Golden-fixture parity harness: torch-free replay of reference forwards.

The live parity tier (tests/test_parity*.py) needs the torch reference at
/root/reference importable at test time. This harness makes the same
behavioural contract portable and drift-proof:

  * weights are NOT stored — both sides regenerate them from a seeded
    ``np.random.default_rng`` filled into the reference state-dict SHAPES
    (shapes are stored in the fixture, a few KB of JSON). The jax side maps
    the same values through the pure-numpy ``convert_state_dict`` family
    (utils/torch_import.py), exactly the path released checkpoints take.
  * inputs are regenerated from per-case seeds (pure numpy).
  * only the reference OUTPUTS are stored (small .npz, committed).

Capture (requires torch + /root/reference):   python -m tests.capture_golden
Replay  (no torch needed):                    pytest tests/test_parity_golden.py

Reference parity surface: label_anything/models/{transformer,prompt_encoder,
mask_decoder,image_encoder,lam}.py and build_lam.py:96-235 (canonical config
parameters/trainval/coco20i/mae.yaml).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")

# toy dims shared with tests/test_parity.py
D = 32
HEADS = 8
MLP = 64
GRID = 4
IMG = 64

# canonical dims shared with tests/test_parity_canonical.py
C_IMG, C_EMBED, C_IMG_EMBED, C_BANK = 480, 256, 768, 100
C_B, C_M, C_C, C_N = 2, 2, 3, 4
C_GRID = C_IMG // 16


# ---------------------------------------------------------------------------
# deterministic weight synthesis from state-dict shapes

# Structural buffers the module derives from its own geometry (Swin window
# attention masks / relative-position index tables, DCAMA's sinusoidal pe).
# The converters skip them (each side computes its own), so synthesizing
# random values would scramble ONLY the torch side — keep module-native
# values there and omit them from the synthesized dict entirely.
_STRUCTURAL_LEAVES = {"attn_mask", "relative_position_index", "pe"}


def _is_structural(key: str) -> bool:
    return key.rsplit(".", 1)[-1] in _STRUCTURAL_LEAVES


def fill_state_dict(shapes: Dict[str, Tuple[int, ...]], seed: int
                    ) -> Dict[str, np.ndarray]:
    """Deterministic values for every state-dict entry, keyed ONLY by
    (sorted key order, shape, seed) — identical with or without torch.

    Scaling keeps activations O(1) through arbitrary depth: matmul/conv
    weights get 1/sqrt(fan_in) normals (torch convention: fan_in is the
    trailing axes for conv (O, I, kh, kw) and axis 1 for linear (O, I));
    1-D vectors are treated as norm scales (1 + small noise) vs biases
    (small noise) by name.
    """
    rng = np.random.default_rng(seed)
    out = {}
    for key in sorted(shapes):
        if _is_structural(key):
            continue
        shape = tuple(shapes[key])
        n = np.asarray(rng.standard_normal(shape), np.float32)
        if key.endswith("num_batches_tracked"):
            # torch BN bookkeeping buffer — integer, value irrelevant in eval
            out[key] = np.asarray(np.zeros(shape), np.int64)
        elif key.endswith(".bias"):
            out[key] = np.asarray(0.02 * n, np.float32)
        elif len(shape) <= 1:
            # LayerNorm/LayerNorm2d weight rows — keep near identity
            out[key] = np.asarray(1.0 + 0.05 * n, np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            out[key] = np.asarray(n / np.sqrt(max(1, fan_in)), np.float32)
    return out


def state_shapes(state_dict) -> Dict[str, Tuple[int, ...]]:
    return {k: tuple(v.shape) for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# fixture IO

def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.npz")


def save_fixture(name: str, shapes: Dict[str, Tuple[int, ...]],
                 outputs: Dict[str, np.ndarray]) -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    payload = {f"out.{k}": np.asarray(v) for k, v in outputs.items()}
    payload["state_shapes_json"] = np.frombuffer(
        json.dumps(shapes).encode(), dtype=np.uint8)
    path = fixture_path(name)
    np.savez_compressed(path, **payload)
    return path


def load_fixture(name: str) -> Optional[Tuple[Dict[str, Tuple[int, ...]],
                                              Dict[str, np.ndarray]]]:
    path = fixture_path(name)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        shapes = json.loads(bytes(z["state_shapes_json"]).decode())
        outputs = {k[len("out."):]: z[k] for k in z.files
                   if k.startswith("out.")}
    return {k: tuple(v) for k, v in shapes.items()}, outputs


# ---------------------------------------------------------------------------
# case registry

class Case:
    """One golden parity case.

    ``ref_forward(weights_sd)`` builds the torch reference, loads the
    synthesized weights, runs the reference forward on the case inputs and
    returns {name: np.ndarray} (imports torch lazily — live capture only).

    ``our_forward(weights_sd)`` runs this framework's twin on the SAME
    synthesized state dict (pure numpy + jax) and returns matching keys.

    ``compare(ours, ref)`` asserts parity at the case's tolerances.
    """

    name: str = ""
    weight_seed: int = 0
    # Damping factor on synthesized MATRIX weights (ndim > 1). Deep refs
    # with discontinuous reorderings (HDMNet's argsort priors) are chaotic
    # at unit scale — torch-vs-jax fp32 noise flips a rank and the outputs
    # diverge wholesale. Damping pulls the net into a contractive regime
    # where both sides agree to ~1e-4 (probe: damp 1.0 -> max|d| 9.5e-2,
    # damp 0.5 -> 1.1e-4 at the chosen seed).
    weight_damp: float = 1.0

    def ref_shapes(self) -> Dict[str, Tuple[int, ...]]:
        raise NotImplementedError

    def ref_forward(self, weights) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def our_forward(self, weights) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def compare(self, ours: Dict[str, np.ndarray],
                ref: Dict[str, np.ndarray]) -> None:
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], rtol=1e-3, atol=5e-4,
                                       err_msg=f"{self.name}:{k}")


CASES: Dict[str, Case] = {}


def register(cls):
    case = cls()
    CASES[case.name] = case
    return cls


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def _load_torch(module, weights):
    import torch

    # merge over the module's own state so structural buffers (see
    # _STRUCTURAL_LEAVES) keep their module-derived values
    sd = dict(module.state_dict())
    sd.update({k: torch.from_numpy(v) for k, v in weights.items()})
    module.load_state_dict(sd)
    return module.eval()


def _merge(module, example_args, weights, kind="lam", method=None):
    import jax

    from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                      merge_into_params)

    kw = {} if method is None else {"method": method}
    params = module.init(jax.random.key(0), *example_args, **kw)
    return merge_into_params(params, convert_state_dict(weights, kind=kind))


# -- TwoWayTransformer ------------------------------------------------------

@register
class TwoWayCase(Case):
    name = "two_way_transformer"
    weight_seed = 101

    def _inputs(self):
        rng = np.random.default_rng(1001)
        img = rng.standard_normal((2, D, GRID, GRID)).astype(np.float32)
        pe = rng.standard_normal((2, D, GRID, GRID)).astype(np.float32)
        tokens = rng.standard_normal((2, 5, D)).astype(np.float32)
        return img, pe, tokens

    def _ref_module(self):
        from tests._reference import load

        return load("label_anything.models.transformer").TwoWayTransformer(
            depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
            attention_downsample_rate=2)

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        ref = _load_torch(self._ref_module(), weights)
        img, pe, tokens = self._inputs()
        with torch.no_grad():
            q, k = ref(_t(img), _t(pe), _t(tokens))
        return {"q": q.numpy(), "k": k.numpy()}

    def our_forward(self, weights):
        import jax.numpy as jnp

        from labelanything_tpu.models.transformer import TwoWayTransformer

        img, pe, tokens = self._inputs()
        ours = TwoWayTransformer(depth=2, embedding_dim=D, num_heads=HEADS,
                                 mlp_dim=MLP, attention_downsample_rate=2)
        args = (jnp.asarray(img.transpose(0, 2, 3, 1)),
                jnp.asarray(pe.transpose(0, 2, 3, 1)), jnp.asarray(tokens))
        params = _merge(ours, args, weights)
        q, k = ours.apply(params, *args)
        return {"q": np.asarray(q), "k": np.asarray(k)}

    def compare(self, ours, ref):
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], rtol=5e-4, atol=5e-5,
                                       err_msg=f"{self.name}:{k}")


# -- PromptImageEncoder (one case per modality combination) -----------------

class _PromptEncoderCase(Case):
    use = "all"
    weight_seed = 102

    def _inputs(self):
        rng = np.random.default_rng(1002)
        b, m, c, n = 2, 2, 3, 2
        coords = rng.uniform(0, IMG, (b, m, c, n, 2)).astype(np.float32)
        labels = rng.integers(-1, 2, (b, m, c, n)).astype(np.int32)
        x0 = rng.uniform(0, IMG / 2, (b, m, c, n, 2)).astype(np.float32)
        boxes = np.concatenate(
            [x0, x0 + rng.uniform(1, IMG / 2, (b, m, c, n, 2))],
            axis=-1).astype(np.float32)
        bflags = rng.integers(0, 2, (b, m, c, n)).astype(np.int32)
        masks = rng.integers(0, 2, (b, m, c, 16, 16)).astype(np.float32)
        mflags = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        flag_examples = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        flag_examples[:, :, 0] = 1
        emb = rng.standard_normal((b, m, D, GRID, GRID)).astype(np.float32)
        return coords, labels, boxes, bflags, masks, mflags, flag_examples, emb

    def _ref_module(self):
        from tests._reference import load

        ref_pe = load("label_anything.models.prompt_encoder")
        ref_tr = load("label_anything.models.transformer")
        return ref_pe.PromptImageEncoder(
            embed_dim=D, image_embedding_size=(GRID, GRID),
            input_image_size=(IMG, IMG), mask_in_chans=16,
            transformer=ref_tr.TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                attention_downsample_rate=2),
            class_encoder=lambda x, y: (x, y))

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests._reference import load

        ref_pe = load("label_anything.models.prompt_encoder")
        ref = _load_torch(self._ref_module(), weights)
        (coords, labels, boxes, bflags, masks, mflags, flag_examples,
         emb) = self._inputs()
        use = self.use
        pts = (_t(coords), _t(labels)) if use in ("all", "points") else None
        bxs = (_t(boxes), _t(bflags)) if use in ("all", "boxes") else None
        msk = (_t(masks), _t(mflags)) if use in ("all", "masks") else None
        with torch.no_grad():
            out = ref(image_embeddings=_t(emb), points=pts, boxes=bxs,
                      masks=msk, flag_examples=_t(flag_examples))
        return {
            "class_embs": out[ref_pe.ResultDict.CLASS_EMBS].numpy(),
            "examples_class_embs":
                out[ref_pe.ResultDict.EXAMPLES_CLASS_EMBS].numpy(),
            "examples_class_src":
                out[ref_pe.ResultDict.EXAMPLES_CLASS_SRC].numpy(),
        }

    def our_forward(self, weights):
        import jax.numpy as jnp

        from labelanything_tpu.models.prompt_encoder import (
            IdentityClassEncoder, PromptImageEncoder)
        from labelanything_tpu.models.transformer import TwoWayTransformer
        from labelanything_tpu.typing import ResultDict

        (coords, labels, boxes, bflags, masks, mflags, flag_examples,
         emb) = self._inputs()
        ours = PromptImageEncoder(
            embed_dim=D, image_embedding_size=(GRID, GRID),
            input_image_size=(IMG, IMG), mask_in_chans=16,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                attention_downsample_rate=2),
            class_encoder=IdentityClassEncoder(), mlp_dim=2048)
        j = jnp.asarray
        use = self.use
        pts = (j(coords), j(labels)) if use in ("all", "points") else None
        bxs = (j(boxes), j(bflags)) if use in ("all", "boxes") else None
        msk = (j(masks), j(mflags)) if use in ("all", "masks") else None
        args = (j(emb.transpose(0, 1, 3, 4, 2)), pts, bxs, msk,
                j(flag_examples))
        params = _merge(ours, args, weights)
        out = ours.apply(params, *args)
        return {
            "class_embs": np.asarray(out[ResultDict.CLASS_EMBS]),
            "examples_class_embs":
                np.asarray(out[ResultDict.EXAMPLES_CLASS_EMBS]),
            "examples_class_src":
                np.asarray(out[ResultDict.EXAMPLES_CLASS_SRC]
                           ).transpose(0, 3, 1, 2),
        }


for _use in ("all", "points", "boxes", "masks"):
    cls = type(f"PromptEncoder_{_use}", (_PromptEncoderCase,),
               {"name": f"prompt_image_encoder_{_use}", "use": _use})
    register(cls)


# -- MaskDecoderLam ---------------------------------------------------------

@register
class MaskDecoderCase(Case):
    name = "mask_decoder"
    weight_seed = 103

    def _inputs(self):
        rng = np.random.default_rng(1003)
        b, c, m = 2, 3, 2
        query = rng.standard_normal((b, D, GRID, GRID)).astype(np.float32)
        image_pe = rng.standard_normal((1, D, GRID, GRID)).astype(np.float32)
        class_embs = rng.standard_normal((b, c, D)).astype(np.float32)
        ex = rng.standard_normal((b, m, c, D)).astype(np.float32)
        flag_examples = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        flag_examples[:, :, 0] = 1
        return query, image_pe, class_embs, ex, flag_examples

    def _ref_module(self):
        from tests._reference import load

        ref_md = load("label_anything.models.mask_decoder")
        ref_tr = load("label_anything.models.transformer")
        return ref_md.MaskDecoderLam(
            transformer_dim=D,
            transformer=ref_tr.TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                attention_downsample_rate=2),
            classification_layer_downsample_rate=8)

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests._reference import load

        ref_pe = load("label_anything.models.prompt_encoder")
        ref = _load_torch(self._ref_module(), weights)
        query, image_pe, class_embs, ex, flag_examples = self._inputs()
        pe_result = {ref_pe.ResultDict.CLASS_EMBS: _t(class_embs),
                     ref_pe.ResultDict.EXAMPLES_CLASS_EMBS: _t(ex)}
        with torch.no_grad():
            seg = ref(query_embeddings=_t(query), support_embeddings=None,
                      image_pe=_t(image_pe), pe_result=pe_result,
                      flag_examples=_t(flag_examples))
        return {"seg": seg.numpy()}

    def our_forward(self, weights):
        import jax.numpy as jnp

        from labelanything_tpu.models.mask_decoder import MaskDecoderLam
        from labelanything_tpu.models.transformer import TwoWayTransformer
        from labelanything_tpu.typing import ResultDict

        query, image_pe, class_embs, ex, flag_examples = self._inputs()
        ours = MaskDecoderLam(
            transformer_dim=D,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                attention_downsample_rate=2),
            classification_layer_downsample_rate=8)
        j = jnp.asarray
        pe_result = {ResultDict.CLASS_EMBS: j(class_embs),
                     ResultDict.EXAMPLES_CLASS_EMBS: j(ex)}
        args = (j(query.transpose(0, 2, 3, 1)), None,
                j(image_pe.transpose(0, 2, 3, 1)), pe_result,
                j(flag_examples))
        params = _merge(ours, args, weights)
        return {"seg": np.asarray(ours.apply(params, *args))}


# -- SAM ImageEncoderViT (rel-pos, window + global) -------------------------

@register
class SamVitCase(Case):
    name = "sam_vit"
    weight_seed = 104

    def _inputs(self):
        rng = np.random.default_rng(1004)
        return rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)

    def _ref_module(self):
        import torch

        from tests._reference import load

        return load("label_anything.models.image_encoder").ImageEncoderViT(
            img_size=IMG, patch_size=16, embed_dim=D, depth=2, num_heads=2,
            out_chans=16, use_rel_pos=True, window_size=2,
            global_attn_indexes=(1,),
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        ref = _load_torch(self._ref_module(), weights)
        x = self._inputs()
        with torch.no_grad():
            y = ref(_t(x))
        return {"y": y.numpy()}

    def our_forward(self, weights):
        import jax.numpy as jnp

        from labelanything_tpu.models.image_encoder import ImageEncoderViT

        x = self._inputs()
        ours = ImageEncoderViT(
            img_size=IMG, patch_size=16, embed_dim=D, depth=2, num_heads=2,
            out_chans=16, use_rel_pos=True, window_size=2,
            global_attn_indexes=(1,))
        args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
        params = _merge(ours, args, weights, kind="sam_encoder")
        y = np.asarray(ours.apply(params, *args)).transpose(0, 3, 1, 2)
        return {"y": y}


# -- full Lam (no ViT) at toy dims ------------------------------------------

@register
class LamFullCase(Case):
    name = "lam_full"
    weight_seed = 105
    image_embed_dim = 24

    def _inputs(self):
        rng = np.random.default_rng(1005)
        b, m, c, n = 2, 2, 3, 2
        coords = rng.uniform(0, IMG, (b, m, c, n, 2)).astype(np.float32)
        labels = rng.integers(-1, 2, (b, m, c, n)).astype(np.int32)
        x0 = rng.uniform(0, IMG / 2, (b, m, c, n, 2)).astype(np.float32)
        boxes = np.concatenate(
            [x0, x0 + rng.uniform(1, IMG / 2, (b, m, c, n, 2))],
            axis=-1).astype(np.float32)
        bflags = rng.integers(0, 2, (b, m, c, n)).astype(np.int32)
        masks = rng.integers(0, 2, (b, m, c, 16, 16)).astype(np.float32)
        mflags = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        flag_examples = rng.integers(0, 2, (b, m, c)).astype(np.int32)
        flag_examples[:, :, 0] = 1
        emb = rng.standard_normal(
            (b, m + 1, self.image_embed_dim, GRID, GRID)).astype(np.float32)
        dims = np.tile([[IMG, IMG]], (b, m + 1, 1)).astype(np.int64)
        return (coords, labels, boxes, bflags, masks, mflags, flag_examples,
                emb, dims)

    def _ref_module(self):
        import torch

        from tests._reference import load

        ref_common = load("label_anything.models.common")
        ref_tr = load("label_anything.models.transformer")
        ref_pe = load("label_anything.models.prompt_encoder")
        ref_md = load("label_anything.models.mask_decoder")
        ref_lam = load("label_anything.models.lam")
        neck = torch.nn.Sequential(
            torch.nn.Conv2d(self.image_embed_dim, D, 1, bias=False),
            ref_common.LayerNorm2d(D),
            torch.nn.Conv2d(D, D, 3, padding=1, bias=False),
            ref_common.LayerNorm2d(D))
        return ref_lam.Lam(
            image_encoder=None,
            prompt_encoder=ref_pe.PromptImageEncoder(
                embed_dim=D, image_embedding_size=(GRID, GRID),
                input_image_size=(IMG, IMG), mask_in_chans=16,
                transformer=ref_tr.TwoWayTransformer(
                    depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                    attention_downsample_rate=2),
                class_encoder=lambda x, y: (x, y)),
            mask_decoder=ref_md.MaskDecoderLam(
                transformer_dim=D,
                transformer=ref_tr.TwoWayTransformer(
                    depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                    attention_downsample_rate=2)),
            neck=neck, image_size=IMG)

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        ref = _load_torch(self._ref_module(), weights)
        (coords, labels, boxes, bflags, masks, mflags, flag_examples, emb,
         dims) = self._inputs()
        batch = {
            "embeddings": _t(emb),
            "prompt_points": _t(coords), "flag_points": _t(labels),
            "prompt_bboxes": _t(boxes), "flag_bboxes": _t(bflags),
            "prompt_masks": _t(masks), "flag_masks": _t(mflags),
            "flag_examples": _t(flag_examples), "dims": _t(dims),
        }
        with torch.no_grad():
            seg, _ = ref._forward(batch)
            post = ref.postprocess_masks(seg, _t(dims))
        return {"logits": post.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.lam import Lam, Neck
        from labelanything_tpu.models.mask_decoder import MaskDecoderLam
        from labelanything_tpu.models.prompt_encoder import (
            IdentityClassEncoder, PromptImageEncoder)
        from labelanything_tpu.models.transformer import TwoWayTransformer
        from labelanything_tpu.typing import BatchKeys, ResultDict
        from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                          merge_into_params)

        (coords, labels, boxes, bflags, masks, mflags, flag_examples, emb,
         dims) = self._inputs()
        ours = Lam(
            image_encoder=None,
            prompt_encoder=PromptImageEncoder(
                embed_dim=D, image_embedding_size=(GRID, GRID),
                input_image_size=(IMG, IMG), mask_in_chans=16,
                transformer=TwoWayTransformer(
                    depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                    attention_downsample_rate=2),
                class_encoder=IdentityClassEncoder(), mlp_dim=2048),
            mask_decoder=MaskDecoderLam(
                transformer_dim=D,
                transformer=TwoWayTransformer(
                    depth=2, embedding_dim=D, num_heads=HEADS, mlp_dim=MLP,
                    attention_downsample_rate=2)),
            neck=Neck(D), image_size=IMG)
        j = jnp.asarray
        batch = {
            BatchKeys.EMBEDDINGS: j(emb.transpose(0, 1, 3, 4, 2)),
            BatchKeys.PROMPT_POINTS: j(coords),
            BatchKeys.FLAG_POINTS: j(labels),
            BatchKeys.PROMPT_BBOXES: j(boxes),
            BatchKeys.FLAG_BBOXES: j(bflags),
            BatchKeys.PROMPT_MASKS: j(masks),
            BatchKeys.FLAG_MASKS: j(mflags),
            BatchKeys.FLAG_EXAMPLES: j(flag_examples),
            BatchKeys.DIMS: j(dims),
        }
        params = ours.init(jax.random.key(0), batch)
        params = merge_into_params(params, convert_state_dict(weights))
        out = ours.apply(params, batch)
        return {"logits": np.asarray(out[ResultDict.LOGITS])}


# -- canonical 256-dim / 480px full forward ---------------------------------

@register
class CanonicalCase(Case):
    """Full ``build_lam_no_vit`` forward at the production config
    (parameters/trainval/coco20i/mae.yaml). Outputs are stored SUBSAMPLED
    for repo size: strided logits (::4 spatially), the full argmax decision
    map (uint8), and the packed -inf/finite pattern."""

    name = "canonical_full_forward"
    weight_seed = 106

    def _inputs(self):
        rng = np.random.default_rng(1006)
        B, M, C, N = C_B, C_M, C_C, C_N
        emb = rng.standard_normal(
            (B, M + 1, C_IMG_EMBED, C_GRID, C_GRID)).astype(np.float32)
        coords = rng.uniform(0, C_IMG, (B, M, C, N, 2)).astype(np.float32)
        labels = rng.integers(-1, 2, (B, M, C, N)).astype(np.int32)
        x0 = rng.uniform(0, C_IMG / 2, (B, M, C, N, 2)).astype(np.float32)
        boxes = np.concatenate(
            [x0, x0 + rng.uniform(8, C_IMG / 2, x0.shape)],
            -1).astype(np.float32)
        bflags = rng.integers(0, 2, (B, M, C, N)).astype(np.int32)
        masks = rng.integers(0, 2, (B, M, C, 256, 256)).astype(np.float32)
        mflags = rng.integers(0, 2, (B, M, C)).astype(np.int32)
        flag_examples = np.ones((B, M, C), np.int32)
        flag_examples[1, 1, 2] = 0
        dims = np.asarray([[[480, 480]] * (M + 1), [[360, 480]] * (M + 1)],
                          np.int64)
        return (emb, coords, labels, boxes, bflags, masks, mflags,
                flag_examples, dims)

    @staticmethod
    def _summarize(logits: np.ndarray) -> Dict[str, np.ndarray]:
        finite = np.isfinite(logits)
        safe = np.where(finite, logits, -1e30)
        return {
            "strided": logits[:, :, ::4, ::4].astype(np.float32),
            "argmax": safe.argmax(1).astype(np.uint8),
            "finite_packed": np.packbits(finite),
            "shape": np.asarray(logits.shape, np.int64),
        }

    def _ref_module(self):
        import sys

        from tests._reference import load

        exports = {
            "image_encoder": ["ImageEncoderViT"],
            "mask_decoder": ["MaskDecoderLam"],
            "prompt_encoder": ["PromptImageEncoder", "RandomMatrixEncoder"],
            "lam": ["Lam", "BinaryLam"],
            "transformer": ["IdentityTransformer", "OneWayTransformer",
                            "TwoWayTransformer"],
        }
        for mod_name, names in exports.items():
            mod = load(f"label_anything.models.{mod_name}")
            pkg = sys.modules["label_anything.models"]
            for n in names:
                setattr(pkg, n, getattr(mod, n))
        ref_bl = load("label_anything.models.build_lam")
        ref = ref_bl.build_lam_no_vit(
            image_embed_dim=C_IMG_EMBED, embed_dim=C_EMBED, image_size=C_IMG,
            spatial_convs=3, example_class_attention=True,
            class_encoder={"name": "RandomMatrixEncoder",
                           "bank_size": C_BANK, "embed_dim": C_EMBED})
        return ref

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        ref = _load_torch(self._ref_module(), weights)
        # deterministic class rows on both sides (ours uses arange at eval)
        ref.prompt_encoder.class_encoder.sample_rows = (
            lambda C, device: torch.arange(C, device=device))
        (emb, coords, labels, boxes, bflags, masks, mflags, flag_examples,
         dims) = self._inputs()
        batch = {
            "embeddings": _t(emb),
            "prompt_points": _t(coords), "flag_points": _t(labels),
            "prompt_bboxes": _t(boxes), "flag_bboxes": _t(bflags),
            "prompt_masks": _t(masks), "flag_masks": _t(mflags),
            "flag_examples": _t(flag_examples), "dims": _t(dims),
        }
        with torch.no_grad():
            seg, _ = ref._forward(batch)
            post = ref.postprocess_masks(seg, _t(dims))
        return self._summarize(post.numpy())

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.build_lam import build_lam_no_vit
        from labelanything_tpu.typing import BatchKeys, ResultDict
        from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                          merge_into_params)

        ours = build_lam_no_vit(
            image_embed_dim=C_IMG_EMBED, embed_dim=C_EMBED, image_size=C_IMG,
            spatial_convs=3, example_class_attention=True,
            class_encoder={"name": "RandomMatrixEncoder",
                           "bank_size": C_BANK})
        (emb, coords, labels, boxes, bflags, masks, mflags, flag_examples,
         dims) = self._inputs()
        j = jnp.asarray
        batch = {
            BatchKeys.EMBEDDINGS: j(emb.transpose(0, 1, 3, 4, 2)),
            BatchKeys.PROMPT_POINTS: j(coords),
            BatchKeys.FLAG_POINTS: j(labels),
            BatchKeys.PROMPT_BBOXES: j(boxes),
            BatchKeys.FLAG_BBOXES: j(bflags),
            BatchKeys.PROMPT_MASKS: j(masks),
            BatchKeys.FLAG_MASKS: j(mflags),
            BatchKeys.FLAG_EXAMPLES: j(flag_examples),
            BatchKeys.DIMS: j(dims),
        }
        params = jax.jit(ours.init)(jax.random.key(0), batch)
        params = merge_into_params(params, convert_state_dict(weights))
        out = jax.jit(ours.apply)(params, batch)
        return self._summarize(np.asarray(out[ResultDict.LOGITS]))

    def compare(self, ours, ref):
        np.testing.assert_array_equal(ours["shape"], ref["shape"])
        np.testing.assert_array_equal(ours["finite_packed"],
                                      ref["finite_packed"])
        s_ref, s_our = ref["strided"], ours["strided"]
        finite = np.isfinite(s_ref)
        np.testing.assert_allclose(s_our[finite], s_ref[finite],
                                   rtol=2e-3, atol=2e-3)
        # decisions are what eval consumes: argmax agreement on the strided
        # frame is implied; the stored full-resolution map guards the rest
        agree = (ours["argmax"] == ref["argmax"]).mean()
        assert agree > 0.999, agree


# -- released-SAM configuration: ViT-B encoder, embed 512, 1024px ----------

@register
class SamReleasedCase(Case):
    """Full ``build_lam_vit_b`` forward at the RELEASED SAM-checkpoint
    configuration — SAM ViT-B encoder, embed 512, 1024px (reference:
    README.md:64-71, built by build_lam.py:96-235): the exact config the
    fine-tune bench trains, which previously had no full-forward numeric
    anchor (the sam_vit fixture is a toy-shape kernel check). Images path:
    pixels -> windowed/global rel-pos ViT -> SAM neck (256) -> LAM neck
    256->512 -> fusion at S=4096 -> decode -> postprocess with a non-square
    query (768x1024) exercising the -inf unpad. 1-way 1-shot at batch 1
    keeps the torch capture tractable; weights damped 0.5 (12 rel-pos
    blocks at unit scale amplify fp32 torch-vs-jax drift; damping pulls
    the net contractive like the HDMNet fixture)."""

    name = "sam_released_full_forward"
    weight_seed = 107
    weight_damp = 0.5

    B, M, C, N, S = 1, 1, 2, 2, 1024

    def _inputs(self):
        rng = np.random.default_rng(1007)
        B, M, C, N, S = self.B, self.M, self.C, self.N, self.S
        imgs = rng.standard_normal((B, M + 1, 3, S, S)).astype(np.float32)
        coords = rng.uniform(0, S, (B, M, C, N, 2)).astype(np.float32)
        labels = rng.integers(-1, 2, (B, M, C, N)).astype(np.int32)
        x0 = rng.uniform(0, S / 2, (B, M, C, N, 2)).astype(np.float32)
        boxes = np.concatenate(
            [x0, x0 + rng.uniform(8, S / 2, x0.shape)], -1).astype(np.float32)
        bflags = rng.integers(0, 2, (B, M, C, N)).astype(np.int32)
        masks = rng.integers(0, 2, (B, M, C, 256, 256)).astype(np.float32)
        mflags = rng.integers(0, 2, (B, M, C)).astype(np.int32)
        flag_examples = np.ones((B, M, C), np.int32)
        dims = np.asarray([[[768, 1024]] * (M + 1)], np.int64)
        return (imgs, coords, labels, boxes, bflags, masks, mflags,
                flag_examples, dims)

    @staticmethod
    def _summarize(logits: np.ndarray) -> Dict[str, np.ndarray]:
        finite = np.isfinite(logits)
        safe = np.where(finite, logits, -1e30)
        return {
            "strided": logits[:, :, ::8, ::8].astype(np.float32),
            "argmax": safe.argmax(1).astype(np.uint8),
            "finite_packed": np.packbits(finite),
            "shape": np.asarray(logits.shape, np.int64),
        }

    def _ref_module(self):
        import sys

        from tests._reference import load

        exports = {
            "image_encoder": ["ImageEncoderViT"],
            "mask_decoder": ["MaskDecoderLam"],
            "prompt_encoder": ["PromptImageEncoder", "RandomMatrixEncoder"],
            "lam": ["Lam", "BinaryLam"],
            "transformer": ["IdentityTransformer", "OneWayTransformer",
                            "TwoWayTransformer"],
        }
        for mod_name, names in exports.items():
            mod = load(f"label_anything.models.{mod_name}")
            pkg = sys.modules["label_anything.models"]
            for n in names:
                setattr(pkg, n, getattr(mod, n))
        ref_bl = load("label_anything.models.build_lam")
        return ref_bl.build_lam_vit_b(
            embed_dim=512, image_size=self.S,
            class_encoder={"name": "RandomMatrixEncoder",
                           "bank_size": C_BANK, "embed_dim": 512})

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        ref = _load_torch(self._ref_module(), weights)
        ref.prompt_encoder.class_encoder.sample_rows = (
            lambda C, device: torch.arange(C, device=device))
        (imgs, coords, labels, boxes, bflags, masks, mflags, flag_examples,
         dims) = self._inputs()
        batch = {
            "images": _t(imgs),
            "prompt_points": _t(coords), "flag_points": _t(labels),
            "prompt_bboxes": _t(boxes), "flag_bboxes": _t(bflags),
            "prompt_masks": _t(masks), "flag_masks": _t(mflags),
            "flag_examples": _t(flag_examples), "dims": _t(dims),
        }
        with torch.no_grad():
            seg, _ = ref._forward(batch)
            post = ref.postprocess_masks(seg, _t(dims))
        return self._summarize(post.numpy())

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.build_lam import build_lam_vit_b
        from labelanything_tpu.typing import BatchKeys, ResultDict
        from labelanything_tpu.utils.torch_import import (convert_state_dict,
                                                          merge_into_params)

        ours = build_lam_vit_b(
            embed_dim=512, image_size=self.S,
            class_encoder={"name": "RandomMatrixEncoder",
                           "bank_size": C_BANK})
        (imgs, coords, labels, boxes, bflags, masks, mflags, flag_examples,
         dims) = self._inputs()
        j = jnp.asarray
        batch = {
            BatchKeys.IMAGES: j(imgs.transpose(0, 1, 3, 4, 2)),
            BatchKeys.PROMPT_POINTS: j(coords),
            BatchKeys.FLAG_POINTS: j(labels),
            BatchKeys.PROMPT_BBOXES: j(boxes),
            BatchKeys.FLAG_BBOXES: j(bflags),
            BatchKeys.PROMPT_MASKS: j(masks),
            BatchKeys.FLAG_MASKS: j(mflags),
            BatchKeys.FLAG_EXAMPLES: j(flag_examples),
            BatchKeys.DIMS: j(dims),
        }
        params = jax.jit(ours.init)(jax.random.key(0), batch)
        params = merge_into_params(params, convert_state_dict(weights))
        out = jax.jit(ours.apply)(params, batch)
        logits = np.asarray(out[ResultDict.LOGITS])
        # the reference postprocess emits ORIGINAL-dims logits; our
        # jit-compiled forward emits the fixed 1024-frame with the region
        # past the content extent set to -inf/0. The dims are chosen so the
        # content extent EQUALS the original size (768x1024 long-side-1024),
        # making the reference's final resize an identity — our frame
        # cropped to (768, 1024) is the same tensor (the fixed-frame unpad
        # parity itself is covered by canonical_full_forward's ragged batch)
        h, w = 768, 1024
        return self._summarize(logits[:, :, :h, :w])

    def compare(self, ours, ref):
        np.testing.assert_array_equal(ours["shape"], ref["shape"])
        np.testing.assert_array_equal(ours["finite_packed"],
                                      ref["finite_packed"])
        s_ref, s_our = ref["strided"], ours["strided"]
        finite = np.isfinite(s_ref)
        np.testing.assert_allclose(s_our[finite], s_ref[finite],
                                   rtol=2e-3, atol=2e-3)
        agree = (ours["argmax"] == ref["argmax"]).mean()
        assert agree > 0.999, agree


def make_weights(case: Case,
                 shapes: Optional[Dict[str, Tuple[int, ...]]] = None
                 ) -> Dict[str, np.ndarray]:
    if shapes is None:
        shapes = case.ref_shapes()
    w = fill_state_dict(shapes, case.weight_seed)
    if case.weight_damp != 1.0:
        w = {k: (np.asarray(v * case.weight_damp, v.dtype) if v.ndim > 1
                 else v) for k, v in w.items()}
    return w


# competitor-baseline cases register themselves into CASES on import
from tests import golden_baselines  # noqa: E402,F401  (registration)
