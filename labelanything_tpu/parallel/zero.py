"""ZeRO-1 optimizer-state sharding over the mesh ``data`` axis.

The reference trains DDP-style with the full fp32 AdamW moments replicated
on every GPU (reference: experiment/run.py:122-131 — Accelerate DDP has no
optimizer-state sharding). On TPU the same training step can shard the
moments (and the substitution gradient accumulator) across the data axis
with NOTHING but sharding annotations: gradients are already all-reduced by
XLA's sharding propagation, the optax update then runs on each device's
moment shard, and the parameter update is all-gathered back to the
replicated params — GSPMD inserts the reduce-scatter/all-gather pair from
the in/out shardings alone (the scaling-book recipe: annotate, let XLA
place collectives over ICI).

Memory: AdamW keeps 2 fp32 moment trees + the fp32 accumulator = 3x params
of state; sharding them across N chips cuts that to 3/N — the difference
between fitting and OOMing ViT-H + decoder training on a 16 GB v5e chip.

Leaves shard on their FIRST axis divisible by the mesh axis size (moments
are param-shaped, so kernels shard on the input dim, biases on features);
indivisible leaves and scalars (optax step counts) stay replicated.

Usage: pass ``state_shardings=zero1_state_shardings(state, mesh)`` to
:func:`labelanything_tpu.parallel.train_step.make_train_step` (config knob:
``train_params.zero1``). Composes with the Megatron specs in
``parallel/tp.py`` via :func:`compose` — TP-sharded leaves keep their
model-axis spec; everything else gets the ZeRO data-axis spec.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .train_step import TrainState


def _first_divisible_spec(leaf, n: int, axis: str) -> P:
    shape = getattr(leaf, "shape", ())
    for i, d in enumerate(shape):
        if d >= n and d % n == 0:
            return P(*([None] * i + [axis]))
    return P()


def zero1_state_shardings(state: TrainState, mesh: Mesh,
                          axis: str = "data") -> TrainState:
    """TrainState-shaped pytree of NamedShardings: params replicated,
    optimizer state + gradient accumulator sharded over ``axis``."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def sharded(tree):
        return jax.tree.map(
            lambda l: NamedSharding(mesh, _first_divisible_spec(l, n, axis)),
            tree)

    return TrainState(
        params=jax.tree.map(lambda l: repl, state.params),
        opt_state=sharded(state.opt_state),
        accum=sharded(state.accum),
        step=repl,
    )


def compose(zero_sh: TrainState, tp_sh: Optional[TrainState]) -> TrainState:
    """Overlay ZeRO specs with tensor-parallel specs: any leaf the TP table
    shards (non-empty spec) keeps its model-axis sharding; the rest take
    the ZeRO data-axis spec."""
    if tp_sh is None:
        return zero_sh
    return jax.tree.map(
        lambda z, t: t if t.spec != P() else z, zero_sh, tp_sh)


def place_state(state: TrainState, shardings: TrainState) -> TrainState:
    """Materialize ``state`` on devices per ``shardings`` (one device_put
    per leaf; sharded leaves are sliced, replicated leaves broadcast)."""
    return jax.tree.map(jax.device_put, state, shardings)


__all__ = ["zero1_state_shardings", "compose", "place_state"]
