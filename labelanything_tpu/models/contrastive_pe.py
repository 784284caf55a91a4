"""CLIP-contrastive prompt-encoder pretraining head
(reference: label_anything/models/contrastive_pe.py:7-69).

Projects LAM class embeddings and CLIP text/image embeddings into a shared
space for the SigLIP/CLIP-style symmetric pretraining objective
(loss/symmetric.py, experiment/pretraining.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..typing import BatchKeys, ResultDict
from .lam import Lam
from .prompt_encoder import PromptImageEncoder


class ContrastivePromptEncoder(nn.Module):
    prompt_encoder: PromptImageEncoder
    hidden_size: int
    pe_in_channels: int
    clip_in_channels: int

    @nn.compact
    def __call__(self, batch: dict, *, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        clip_embeddings = batch[BatchKeys.CLIP_EMBEDDINGS]
        data = {k: v for k, v in batch.items()
                if k != BatchKeys.CLIP_EMBEDDINGS}
        points, boxes, masks, flag_examples = Lam.prepare_prompts(data)
        result = self.prompt_encoder(
            image_embeddings=data[BatchKeys.EMBEDDINGS],
            points=points, boxes=boxes, masks=masks,
            flag_examples=flag_examples, deterministic=deterministic)
        class_embeddings = result[ResultDict.CLASS_EMBS][0]  # (C, D)

        class_proj = nn.Dense(self.hidden_size, name="prompt_proj_dense")(
            class_embeddings)
        class_proj = nn.tanh(nn.LayerNorm(epsilon=1e-5,
                                          name="prompt_proj_ln")(class_proj))

        clip_proj = nn.Dense(self.hidden_size, name="clip_proj_dense")(
            clip_embeddings)
        clip_proj = nn.tanh(nn.LayerNorm(epsilon=1e-5,
                                         name="clip_proj_ln")(clip_proj))
        return class_proj, clip_proj.mean(axis=1)
