"""Tiny stand-in model with the full LAM I/O contract
(reference: label_anything/models/dummy.py:17-195).

Consumes an episode batch (embeddings or images + prompts + flags) and emits
schema-correct LOGITS / EXAMPLES_CLASS_EMBS, so the entire training stack can
be exercised without a real model — the de-facto integration-test double.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..typing import BatchKeys, ResultDict


class DummyLam(nn.Module):
    embed_dim: int = 32
    image_size: int = 480

    @nn.compact
    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True):
        flag_examples = batch[BatchKeys.FLAG_EXAMPLES]
        b, m, c = flag_examples.shape
        if BatchKeys.EMBEDDINGS in batch:
            x = batch[BatchKeys.EMBEDDINGS][:, 0]  # (B, H, W, D)
        else:
            x = batch[BatchKeys.IMAGES][:, 0]
        x = nn.Conv(self.embed_dim, (3, 3), padding="SAME", name="conv")(x)
        x = nn.relu(x)
        class_proto = self.param(
            "class_proto", nn.initializers.normal(0.02), (1, c, self.embed_dim)
        )
        seg = jnp.einsum("bhwd,bcd->bchw", x, jnp.broadcast_to(class_proto, (b, c, self.embed_dim)))
        seg = resize_bilinear(seg, (self.image_size, self.image_size))
        if BatchKeys.FLAG_GTS in batch:
            seg = jnp.where(
                batch[BatchKeys.FLAG_GTS][:, :, None, None], seg, float("-inf")
            )
        example_class_embs = jnp.zeros((b, m, c, self.embed_dim))
        return {
            ResultDict.LOGITS: seg,
            ResultDict.EXAMPLES_CLASS_EMBS: example_class_embs,
            ResultDict.CLASS_EMBS: example_class_embs[:, 0],
        }


def build_dummy(image_size: int = 480, **kwargs) -> DummyLam:
    return DummyLam(image_size=image_size)
