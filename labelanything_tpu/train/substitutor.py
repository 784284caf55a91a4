"""Query<->example substitution and error-driven point prompting
(reference: label_anything/experiment/substitution.py).

TPU-first reformulations:
  * The rotation is a static index permutation applied to the N (image) axis
    of the batch pytree by one jitted gather per permutation
    (reference: substitution.py:237-252).
  * ``generate_points_from_errors`` uses data-dependent ``nonzero`` +
    multinomial in the reference (substitution.py:17-96); here it is a
    fixed-size Gumbel-top-k over the masked error map — fully jittable.
    (Reference samples error pixels uniformly WITH replacement; Gumbel-top-k
    samples without replacement, an equivalent-or-better prompt choice.)
  * Ground truths live in the fixed model frame, so new points need no
    original-size coordinate rescale.

The raw training batch carries prompts and GT for all N images (the query
slot included); ``divide_query_examples`` strips the query's prompts before
the forward pass.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..typing import BatchKeys, IGNORE_INDEX, Label

_KEYS_TO_EXCHANGE = (
    BatchKeys.PROMPT_POINTS,
    BatchKeys.PROMPT_MASKS,
    BatchKeys.PROMPT_BBOXES,
    BatchKeys.FLAG_MASKS,
    BatchKeys.FLAG_BBOXES,
    BatchKeys.FLAG_POINTS,
    BatchKeys.FLAG_EXAMPLES,
    BatchKeys.DIMS,
    # uint8 ingest ships the per-image post-resize extent; it must rotate
    # with IMAGES/DIMS or device normalization masks image i with image
    # perm(i)'s extent after the first substitution pass
    BatchKeys.RESIZED_DIMS,
    BatchKeys.IMAGES,
    BatchKeys.EMBEDDINGS,
    BatchKeys.GROUND_TRUTHS,
)

_KEYS_TO_SEPARATE = (
    BatchKeys.PROMPT_POINTS,
    BatchKeys.PROMPT_MASKS,
    BatchKeys.PROMPT_BBOXES,
    BatchKeys.FLAG_MASKS,
    BatchKeys.FLAG_BBOXES,
    BatchKeys.FLAG_POINTS,
    BatchKeys.FLAG_EXAMPLES,
)


def rotation_permutation(it: int, num_examples: int) -> Tuple[int, ...]:
    """The reference's index_tensor (substitution.py:237-252)."""
    if it == num_examples:
        return (num_examples - 1,) + tuple(range(1, num_examples - 1)) + (0,)
    return (it,) + tuple(range(0, it)) + tuple(range(it + 1, num_examples))


@functools.partial(jax.jit, static_argnames=("perm",))
def apply_permutation(batch: Dict[str, jax.Array], perm: Tuple[int, ...]):
    idx = jnp.asarray(perm)
    out = dict(batch)
    for key in _KEYS_TO_EXCHANGE:
        if key in out:
            # embeddings may be a pyramid-cache stage dict (reference
            # handles the same case, substitution.py:221-225)
            out[key] = jax.tree.map(lambda x: jnp.take(x, idx, axis=1),
                                    out[key])
    return out


def divide_query_examples(batch: Dict[str, jax.Array]):
    """Strip the query slot's prompts; gt = query gt."""
    out = {}
    for key, value in batch.items():
        if key in _KEYS_TO_SEPARATE:
            out[key] = value[:, 1:]
        elif key == BatchKeys.GROUND_TRUTHS:
            continue
        else:
            out[key] = value
    gt = batch[BatchKeys.GROUND_TRUTHS][:, 0]
    return out, gt


@functools.partial(jax.jit, static_argnames=("num_classes", "num_points"))
def generate_points_from_errors(
    preds: jax.Array,         # (B, H, W) argmax predictions
    ground_truth: jax.Array,  # (B, H, W) with IGNORE_INDEX
    key: jax.Array,
    num_classes: int,
    num_points: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Sample per-(b, c) correction points from prediction errors.

    Returns (points (B, C, n, 2) xy, labels (B, C, n) in {-1, 0, 1}):
    +1 where the model missed the class (false negative), -1 where it
    hallucinated it (false positive), 0 when that class had no errors.
    """
    b, h, w = preds.shape
    c = num_classes
    valid = ground_truth != IGNORE_INDEX
    gt = jnp.where(valid, ground_truth, 0)
    gt_onehot = jax.nn.one_hot(gt, c, dtype=jnp.int32) * valid[..., None]
    pred_onehot = jax.nn.one_hot(preds, c, dtype=jnp.int32) * valid[..., None]
    errors = (gt_onehot - pred_onehot).transpose(0, 3, 1, 2)  # (B, C, H, W)

    err_flat = errors.reshape(b, c, h * w)
    has_error = jnp.abs(err_flat) > 0
    # Gumbel-top-k over error pixels
    gumbel = jax.random.gumbel(key, err_flat.shape)
    scores = jnp.where(has_error, gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, num_points)           # (B, C, n)
    n_errors = has_error.sum(axis=-1)                     # (B, C)
    any_error = (n_errors > 0)[..., None]                 # (B, C, 1)

    labels = jnp.take_along_axis(err_flat, idx, axis=-1)  # (B, C, n)
    labels = jnp.where(any_error, labels, 0)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    points = jnp.stack([xs, ys], axis=-1)
    points = jnp.where(any_error[..., None], points, 0.0)
    # background row never receives points (reference: substitution.py:94-95)
    labels = labels.at[:, 0].set(Label.NULL)
    return points, labels.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("extra",))
def preallocate_point_slots(batch: Dict[str, jax.Array], extra: int):
    """Extend the point axis once with ``extra`` zero (NULL) slots so later
    error-point writes keep every tensor shape constant — one compiled train
    step for all substitution passes (the reference concatenates per pass,
    substitution.py:185-197, which on TPU would recompile each pass)."""
    out = dict(batch)
    pts = out[BatchKeys.PROMPT_POINTS]
    b, n_imgs, c, n, _ = pts.shape
    out[BatchKeys.PROMPT_POINTS] = jnp.concatenate(
        [pts, jnp.zeros((b, n_imgs, c, extra, 2), pts.dtype)], axis=3
    )
    flags = out[BatchKeys.FLAG_POINTS]
    out[BatchKeys.FLAG_POINTS] = jnp.concatenate(
        [flags, jnp.zeros((b, n_imgs, c, extra), flags.dtype)], axis=3
    )
    return out


def _write_query_points(batch: Dict[str, jax.Array], points: jax.Array,
                        labels: jax.Array, slot) -> Dict[str, jax.Array]:
    """Core of ``write_query_points``; ``slot`` may be a traced scalar
    (``dynamic_update_slice`` takes traced starts), which lets the fused
    pass program (parallel/train_step.py make_pass_step) compute the slot
    from the pass index on device."""
    out = dict(batch)
    out[BatchKeys.PROMPT_POINTS] = jax.lax.dynamic_update_slice(
        out[BatchKeys.PROMPT_POINTS],
        points[:, None].astype(out[BatchKeys.PROMPT_POINTS].dtype),
        (0, 0, 0, slot, 0),
    )
    out[BatchKeys.FLAG_POINTS] = jax.lax.dynamic_update_slice(
        out[BatchKeys.FLAG_POINTS],
        labels[:, None].astype(out[BatchKeys.FLAG_POINTS].dtype),
        (0, 0, 0, slot),
    )
    return out


@functools.partial(jax.jit, static_argnames=("slot",))
def write_query_points(
    batch: Dict[str, jax.Array], points: jax.Array, labels: jax.Array, slot: int
):
    """Write error points into the query slot's preallocated point slots
    (shape-stable equivalent of the reference's concatenation,
    substitution.py:161-197)."""
    return _write_query_points(batch, points, labels, slot)


def rotation_permutation_traced(it: jax.Array, n: int) -> jax.Array:
    """``rotation_permutation`` as device arithmetic on a TRACED pass index
    ``it`` (0 = identity), so a single compiled pass program serves every
    substitution pass — the host never builds per-pass executables or
    transfers an index tuple (reference: substitution.py:237-252)."""
    j = jnp.arange(n, dtype=jnp.int32)
    it = jnp.asarray(it, jnp.int32)
    lt = jnp.where(j == 0, it, jnp.where(j <= it, j - 1, j))
    eq = jnp.where(j == 0, n - 1, jnp.where(j == n - 1, 0, j))
    return jnp.where(it == n, eq, lt)


def permute_batch(batch: Dict[str, jax.Array], perm: jax.Array
                  ) -> Dict[str, jax.Array]:
    """Apply an image-axis permutation (traced or concrete) to every
    exchangeable key; non-exchange keys pass through untouched."""
    out = dict(batch)
    for key in _KEYS_TO_EXCHANGE:
        if key in out:
            out[key] = jax.tree.map(lambda x: jnp.take(x, perm, axis=1),
                                    out[key])
    return out


class Substitutor:
    """Iterator over substitution passes of one episode batch
    (reference: substitution.py:99-275).

    The batch handed to ``reset`` must carry the full N-image axis on prompt
    tensors and GROUND_TRUTHS. Yields (input_dict, gt) pairs ready for the
    model; call ``generate_new_points(logits, gt, key)`` between passes.
    """

    def __init__(self, num_points: int = 1, substitute: bool = True,
                 threshold: float = None):
        self.num_points = num_points
        self.threshold = threshold
        self.substitute = substitute
        self.batch = None
        self.it = 0
        self._slot = 0

    @staticmethod
    def mean_pairwise_jaccard(example_classes) -> float:
        """Mean pairwise Jaccard similarity of the episode's per-example
        class sets. The reference gates substitution on an (undefined!)
        ``mean_pairwise_j_index`` (substitution.py:148-156 — a latent
        NameError whenever ``threshold`` is set); this is the sane
        implementation of that intent."""
        sets = [set(c) for c in example_classes]
        if len(sets) < 2:
            return 1.0
        vals = []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                union = sets[i] | sets[j]
                vals.append(len(sets[i] & sets[j]) / len(union) if union else 1.0)
        return sum(vals) / len(vals)

    def calculate_if_substitute(self, classes=None) -> bool:
        """(reference: substitution.py:148-156)."""
        if self.threshold is None or not classes:
            return True
        import numpy as np

        return float(np.mean([self.mean_pairwise_jaccard(c)
                              for c in classes])) > self.threshold

    def reset(self, batch: Dict[str, jax.Array]):
        self.batch = dict(batch)
        self.it = 0
        if self.substitute and self.num_points > 0 and BatchKeys.PROMPT_POINTS in self.batch:
            # one write per pass (N+1 passes); last write is never consumed
            # but keeps the bookkeeping uniform
            extra = self.num_points * (self.num_examples + 1)
            self.batch = preallocate_point_slots(self.batch, extra)
            self._slot = self.batch[BatchKeys.PROMPT_POINTS].shape[3] - extra

    @property
    def num_examples(self) -> int:
        key = BatchKeys.IMAGES if BatchKeys.IMAGES in self.batch else BatchKeys.EMBEDDINGS
        value = self.batch[key]
        if isinstance(value, dict):  # pyramid-cache stage dict
            value = next(iter(value.values()))
        return value.shape[1]

    def __iter__(self):
        return self

    def __next__(self):
        n = self.num_examples
        if self.it == 0:
            self.it = 1
            return divide_query_examples(self.batch)
        if not self.substitute or self.it == n + 1:
            raise StopIteration
        perm = rotation_permutation(self.it, n)
        self.batch = apply_permutation(self.batch, perm)
        self.it += 1
        return divide_query_examples(self.batch)

    def generate_new_points(self, preds: jax.Array, gt: jax.Array, key: jax.Array,
                            num_classes: int):
        """``preds`` are argmax predictions (B, H, W)."""
        if not self.substitute or self.num_points <= 0:
            return
        if BatchKeys.PROMPT_POINTS not in self.batch:
            return
        points, labels = generate_points_from_errors(
            preds, gt, key, num_classes=num_classes, num_points=self.num_points
        )
        self.batch = write_query_points(self.batch, points, labels, self._slot)
        self._slot += self.num_points
