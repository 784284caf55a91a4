"""Multi-level (feature-pyramid) LAM variant
(reference: label_anything/models/prompt_encoder.py:919-967,
mask_decoder.py:651-771, lam.py:531-582).

One prompt encoder / mask decoder per backbone stage; per-level upscaled
feature maps and class embeddings are projected to a common width, summed,
and classified once.

Note: the reference's ``MultiLevelMaskDecoder.forward`` calls
``mask_decoder._get_pe_result(lv_class_embeddings)`` with one argument while
the method requires ``(pe_result, flag_examples)`` (mask_decoder.py:735-737)
— a latent TypeError; here flags are threaded through properly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict
from .lam import Lam
from .mask_decoder import MaskDecoderLam

_NEG_INF = float("-inf")


class MultiLevelPromptEncoder(nn.Module):
    """(reference: prompt_encoder.py:919-967)."""

    prompt_encoders: Sequence[nn.Module]

    def __call__(self, image_embeddings: List[jax.Array], points, boxes, masks,
                 flag_examples, *, deterministic: bool = True) -> Dict[str, list]:
        result = {
            ResultDict.CLASS_EMBS: [],
            ResultDict.EXAMPLES_CLASS_SRC: [],
            ResultDict.EXAMPLES_CLASS_EMBS: [],
        }
        for encoder, level_embeddings in zip(self.prompt_encoders,
                                             image_embeddings):
            out = encoder(level_embeddings, points, boxes, masks, flag_examples,
                          deterministic=deterministic)
            for key in result:
                result[key].append(out[key])
        return result

    def get_dense_pe(self) -> List[jax.Array]:
        return [enc.get_dense_pe() for enc in self.prompt_encoders]


class MultiLevelMaskDecoder(nn.Module):
    """(reference: mask_decoder.py:651-771)."""

    mask_decoders: Sequence[MaskDecoderLam]
    embed_dims: Sequence[int]
    segment_example_logits: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_embeddings: List[jax.Array],
                 support_embeddings, image_pe: List[jax.Array],
                 pe_result: Dict[str, list], flag_examples,
                 *, deterministic: bool = True) -> jax.Array:
        max_dim = max(self.embed_dims)
        per_level = [
            {k: v[i] for k, v in pe_result.items()}
            for i in range(len(query_embeddings))
        ]
        decoder_results: List[Tuple[jax.Array, jax.Array]] = []
        for i, (q, pe, lv_result, decoder) in enumerate(zip(
                query_embeddings, image_pe, per_level, self.mask_decoders)):
            b, h, w, d = q.shape
            class_embs, _, _ = decoder._get_pe_result(lv_result, flag_examples)
            class_embs, q_tokens = decoder.transformer(
                q, pe, class_embs, deterministic=deterministic)
            q_map = q_tokens.reshape(b, h, w, d)
            upscaled, class_embs = decoder._upscale(
                q_map, class_embs, deterministic=deterministic)
            upscaled = decoder._apply_spatial_convs(upscaled)
            decoder_results.append((upscaled, class_embs))

        target_hw = decoder_results[0][0].shape[1:3]
        fused_fm = 0.0
        fused_ce = 0.0
        for i, (fm, ce) in enumerate(decoder_results):
            fm = resize_bilinear(fm, target_hw, spatial_axes=(1, 2))
            fm = nn.Conv(max_dim, (1, 1), dtype=self.dtype,
                         name=f"fm_projector_{i}")(fm)
            ce = nn.Dense(max_dim, dtype=self.dtype,
                          name=f"ce_projector_{i}")(ce)
            fused_fm = fused_fm + fm
            fused_ce = fused_ce + ce

        seg = jnp.einsum("bnd,bhwd->bnhw", fused_ce, fused_fm,
                         preferred_element_type=jnp.float32)
        if self.segment_example_logits:
            b, n_emb = seg.shape[:2]
            c = flag_examples.shape[2]
            seg = seg.reshape(b, n_emb // c, c, *seg.shape[2:])
            seg = jnp.where(flag_examples[..., None, None].astype(bool),
                            seg, _NEG_INF).max(axis=1)
        return seg


class MultiLevelLam(Lam):
    """(reference: lam.py:531-582). Embeddings arrive as a dict of stages."""

    def prepare_query_example_embeddings(self, batched_input):
        if BatchKeys.EMBEDDINGS in batched_input:
            embeddings = batched_input[BatchKeys.EMBEDDINGS]
        elif BatchKeys.IMAGES in batched_input:
            images = batched_input[BatchKeys.IMAGES]
            b, n = images.shape[:2]
            flat = images.reshape((b * n,) + images.shape[2:])
            stages = self.image_encoder(flat, output_hidden_states=True)
            embeddings = {
                k: v.reshape((b, n) + v.shape[1:]) for k, v in stages.items()
            }
        else:
            raise ValueError("Either 'images' or 'embeddings' must be provided.")
        levels = [embeddings[k] for k in sorted(embeddings)]
        return [lv[:, 0] for lv in levels], [lv[:, 1:] for lv in levels]

    def _forward(self, batched_input, *, deterministic=True):
        query_levels, prompt_levels = self.prepare_query_example_embeddings(
            batched_input)
        points, boxes, masks, flag_examples = self.prepare_prompts(batched_input)
        pe_result = self.prompt_encoder(
            image_embeddings=prompt_levels, points=points, boxes=boxes,
            masks=masks, flag_examples=flag_examples,
            deterministic=deterministic)
        seg = self.mask_decoder(
            query_embeddings=query_levels,
            support_embeddings=prompt_levels,
            image_pe=self.prompt_encoder.get_dense_pe(),
            pe_result=pe_result,
            flag_examples=flag_examples,
            deterministic=deterministic)
        # expose last level's embeddings for the loss contract
        pe_out = {
            ResultDict.EXAMPLES_CLASS_EMBS: pe_result[
                ResultDict.EXAMPLES_CLASS_EMBS][-1],
        }
        return seg, pe_out
