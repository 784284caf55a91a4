"""Fused TwoWayTransformer kernel (ops/fused_twoway.py) vs the module.

The kernel runs the whole 2-layer fusion transformer in one pallas_call
per (example, class) instance; forward and VJP (XLA recompute) must match
the unfused module path, and the fused init must produce the identical
parameter tree (checkpoint compatibility of the _*P shims).
"""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

import labelanything_tpu.ops.fused_twoway as ft
from labelanything_tpu.models.transformer import TwoWayTransformer

B, H, W, D, N = 3, 10, 10, 64, 12


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    img = jnp.asarray(0.5 * rng.standard_normal((B, H, W, D)), jnp.float32)
    pe = jnp.asarray(0.5 * rng.standard_normal((1, H, W, D)), jnp.float32)
    tok = jnp.asarray(0.5 * rng.standard_normal((B, N, D)), jnp.float32)
    tr = TwoWayTransformer(depth=2, embedding_dim=D, num_heads=4,
                           mlp_dim=256)
    old = ft._ENABLE
    ft._ENABLE = False
    try:
        params = tr.init(jax.random.key(0), img, pe, tok)
    finally:
        ft._ENABLE = old
    flat = flax.traverse_util.flatten_dict(params["params"])
    r2 = np.random.default_rng(1)
    flat = {k: jnp.asarray(0.2 * r2.standard_normal(v.shape), v.dtype)
            for k, v in flat.items()}
    return tr, img, pe, tok, {
        "params": flax.traverse_util.unflatten_dict(flat)}


def _fused(fn):
    old_e, old_i = ft._ENABLE, ft._INTERPRET
    ft._ENABLE = ft._INTERPRET = True
    try:
        return fn()
    finally:
        ft._ENABLE, ft._INTERPRET = old_e, old_i


def _unfused(fn):
    old = ft._ENABLE
    ft._ENABLE = False
    try:
        return fn()
    finally:
        ft._ENABLE = old


def test_fused_forward_matches_module(setup):
    tr, img, pe, tok, params = setup
    q_ref, k_ref = _unfused(lambda: tr.apply(params, img, pe, tok))
    q_f, k_f = _fused(lambda: tr.apply(params, img, pe, tok))
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_ref), atol=3e-5)


def test_fused_init_identical_tree(setup):
    tr, img, pe, tok, params = setup
    p2 = _fused(lambda: tr.init(jax.random.key(0), img, pe, tok))
    t1 = {k: v.shape for k, v in
          flax.traverse_util.flatten_dict(params["params"]).items()}
    t2 = {k: v.shape for k, v in
          flax.traverse_util.flatten_dict(p2["params"]).items()}
    assert t1 == t2


def test_fused_gradients_match(setup):
    tr, img, pe, tok, params = setup

    def loss(pp):
        q, k = tr.apply(pp, img, pe, tok)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    g_f = _fused(lambda: jax.grad(loss)(params))
    g_r = _unfused(lambda: jax.grad(loss)(params))
    f1 = flax.traverse_util.flatten_dict(g_f["params"])
    f0 = flax.traverse_util.flatten_dict(g_r["params"])
    for k in f0:
        d = np.abs(np.asarray(f1[k]) - np.asarray(f0[k])).max()
        scale = np.abs(np.asarray(f0[k])).max()
        # absolute floor: k_proj biases have true gradient EXACTLY zero
        # (softmax shift invariance), both paths emit ~1e-7 roundoff
        assert d < max(1e-3 * scale, 1e-5), (k, d, scale)


def test_fused_gate_respects_masks(setup):
    """A query_mask forces the unfused path (the kernel has no masking)."""
    tr, img, pe, tok, params = setup
    mask = jnp.ones((B, N), jnp.int32)
    q_m, k_m = _fused(lambda: tr.apply(params, img, pe, tok,
                                       query_mask=mask))
    q_ref, k_ref = _unfused(lambda: tr.apply(params, img, pe, tok,
                                             query_mask=mask))
    np.testing.assert_allclose(np.asarray(q_m), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_m), np.asarray(k_ref), atol=3e-5)
