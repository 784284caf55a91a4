"""Attribution explainer (reference: label_anything/models/explainer.py:38-145).

The reference wraps captum's LayerGradCam / IntegratedGradients; captum does
not exist for JAX, so both attributions are implemented natively with
``jax.grad`` — functionally equivalent and jit-compiled:

* ``grad_cam``: channel-weighted activation map at the query feature layer
  (the embeddings entering the decoder) for a target class.
* ``integrated_gradients``: Riemann-sum IG over the query image/embeddings.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..typing import BatchKeys, ResultDict


class LamExplainer:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._input_key = None

    def _key(self, batch):
        return (BatchKeys.EMBEDDINGS if BatchKeys.EMBEDDINGS in batch
                else BatchKeys.IMAGES)

    def _class_score(self, x, batch, key, target_class: int):
        b = dict(batch)
        b[key] = x
        out = self.model.apply(self.params, b)
        logits = out[ResultDict.LOGITS][:, target_class]
        return jnp.where(jnp.isfinite(logits), logits, 0.0).sum()

    def grad_cam(self, batch: Dict[str, Any], target_class: int) -> jax.Array:
        """Grad-CAM over the query feature map. Returns (B, h, w) heatmaps."""
        key = self._key(batch)
        x = batch[key]
        grads = jax.jit(jax.grad(self._class_score), static_argnums=(2, 3))(
            x, batch, key, target_class)
        acts = x[:, 0]          # query slot (B, h, w, D)
        g = grads[:, 0]
        weights = g.mean(axis=(1, 2), keepdims=True)   # (B, 1, 1, D)
        cam = jax.nn.relu((weights * acts).sum(axis=-1))
        return cam

    def integrated_gradients(self, batch: Dict[str, Any], target_class: int,
                             steps: int = 16) -> jax.Array:
        """IG attribution of the query input. Returns an array shaped like
        the query slot of the input."""
        key = self._key(batch)
        x = batch[key]
        baseline = jnp.zeros_like(x)
        grad_fn = jax.jit(jax.grad(self._class_score), static_argnums=(2, 3))
        total = jnp.zeros_like(x)
        for i in range(1, steps + 1):
            alpha = i / steps
            total = total + grad_fn(baseline + alpha * (x - baseline),
                                    batch, key, target_class)
        ig = (x - baseline) * total / steps
        return ig[:, 0]
