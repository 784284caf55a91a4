"""Blockdiag TwoWayTransformer path (ops/twoway_blockdiag.py) vs the module.

The layout-optimal XLA path packs the per-layer image-side projections and
computes per-head attention by block-diagonal expansion; forward and
gradients must match the plain module path, and it must leave the
parameter tree untouched (checkpoint compatibility).
"""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

import labelanything_tpu.ops.twoway_blockdiag as bd
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
    params = _plain(lambda: tr.init(jax.random.key(0), img, pe, tok))
    flat = flax.traverse_util.flatten_dict(params["params"])
    r2 = np.random.default_rng(1)
    flat = {k: jnp.asarray(0.2 * r2.standard_normal(v.shape), v.dtype)
            for k, v in flat.items()}
    return tr, img, pe, tok, {
        "params": flax.traverse_util.unflatten_dict(flat)}


def _blockdiag(fn):
    old_e, old_f = bd._ENABLE, bd._FORCE
    bd._ENABLE = bd._FORCE = True
    try:
        return fn()
    finally:
        bd._ENABLE, bd._FORCE = old_e, old_f


def _plain(fn):
    old_b, old_f = bd._ENABLE, ft._ENABLE
    bd._ENABLE = ft._ENABLE = False
    try:
        return fn()
    finally:
        bd._ENABLE, ft._ENABLE = old_b, old_f


def test_blockdiag_forward_matches_module(setup):
    tr, img, pe, tok, params = setup
    q_ref, k_ref = _plain(lambda: tr.apply(params, img, pe, tok))
    q_f, k_f = _blockdiag(lambda: tr.apply(params, img, pe, tok))
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_ref), atol=3e-5)


def test_blockdiag_init_identical_tree(setup):
    tr, img, pe, tok, params = setup
    p2 = _blockdiag(lambda: tr.init(jax.random.key(0), img, pe, tok))
    t1 = {k: v.shape for k, v in
          flax.traverse_util.flatten_dict(params["params"]).items()}
    t2 = {k: v.shape for k, v in
          flax.traverse_util.flatten_dict(p2["params"]).items()}
    assert t1 == t2


def test_blockdiag_gradients_match(setup):
    tr, img, pe, tok, params = setup

    def loss(pp):
        q, k = tr.apply(pp, img, pe, tok)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    g_f = _blockdiag(lambda: jax.grad(loss)(params))
    g_r = _plain(lambda: jax.grad(loss)(params))
    f1 = flax.traverse_util.flatten_dict(g_f["params"])
    f0 = flax.traverse_util.flatten_dict(g_r["params"])
    for k in f0:
        d = np.abs(np.asarray(f1[k]) - np.asarray(f0[k])).max()
        scale = np.abs(np.asarray(f0[k])).max()
        assert d < max(1e-3 * scale, 1e-5), (k, d, scale)


def test_blockdiag_covers_noop_mask(setup):
    """With apply_masks=False (reference parity default) a provided
    query_mask is a documented no-op, so the blockdiag path still engages
    and must agree with the plain path."""
    tr, img, pe, tok, params = setup
    mask = jnp.ones((B, N), jnp.int32)
    q_m, k_m = _blockdiag(lambda: tr.apply(params, img, pe, tok,
                                           query_mask=mask))
    q_ref, k_ref = _plain(lambda: tr.apply(params, img, pe, tok,
                                           query_mask=mask))
    np.testing.assert_allclose(np.asarray(q_m), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_m), np.asarray(k_ref), atol=3e-5)


def test_shared_keys_rank1_matches_expanded(setup):
    """image_shift: a (BM, S, D) base + spatially uniform per-instance shift
    must reproduce the plain module path run on the eagerly expanded
    per-instance keys — the rank-1 layer-1 sharing is exact by linearity."""
    tr, img, pe, tok, params = setup
    group = 4
    rng = np.random.default_rng(5)
    g = B * group
    shift = jnp.asarray(0.3 * rng.standard_normal((g, D)), jnp.float32)
    tok_g = jnp.asarray(0.5 * rng.standard_normal((g, N, D)), jnp.float32)
    img_full = jnp.repeat(img, group, axis=0) + shift[:, None, None, :]
    q_ref, k_ref = _plain(lambda: tr.apply(params, img_full, pe, tok_g))

    q_s, k_s = _blockdiag(
        lambda: tr.apply(params, img, pe, tok_g, image_shift=shift))
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_ref), atol=3e-5)

    # the eager-expand fallback (blockdiag unavailable) must also agree
    q_e, k_e = _plain(lambda: tr.apply(params, img, pe, tok_g,
                                       image_shift=shift))
    np.testing.assert_allclose(np.asarray(q_e), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_e), np.asarray(k_ref), atol=3e-5)


def test_shared_keys_rank16_map_matches_expanded(setup):
    """image_shift_map + image_shift_proj (the factored mask correction):
    base + uniform shift + map @ proj must reproduce the plain module path
    run on the eagerly expanded per-instance keys — the rank-Cm layer-1
    folding is exact by linearity of the packed projection."""
    tr, img, pe, tok, params = setup
    group, cm = 4, 16
    rng = np.random.default_rng(9)
    g = B * group
    shift = jnp.asarray(0.3 * rng.standard_normal((g, D)), jnp.float32)
    smap = jnp.asarray(0.3 * rng.standard_normal((g, H, W, cm)), jnp.float32)
    proj = jnp.asarray(0.3 * rng.standard_normal((cm, D)), jnp.float32)
    tok_g = jnp.asarray(0.5 * rng.standard_normal((g, N, D)), jnp.float32)
    img_full = (jnp.repeat(img, group, axis=0) + shift[:, None, None, :]
                + smap @ proj)
    q_ref, k_ref = _plain(lambda: tr.apply(params, img_full, pe, tok_g))

    q_s, k_s = _blockdiag(
        lambda: tr.apply(params, img, pe, tok_g, image_shift=shift,
                         image_shift_map=smap, image_shift_proj=proj))
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_ref), atol=3e-5)

    # the eager-expand fallback (blockdiag unavailable) must also agree
    q_e, k_e = _plain(lambda: tr.apply(params, img, pe, tok_g,
                                       image_shift=shift,
                                       image_shift_map=smap,
                                       image_shift_proj=proj))
    np.testing.assert_allclose(np.asarray(q_e), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_e), np.asarray(k_ref), atol=3e-5)


def test_shared_keys_rank16_gradients_match(setup):
    """Gradients through the rank-Cm factored path equal the expanded
    path's."""
    tr, img, pe, tok, params = setup
    group, cm = 2, 16
    rng = np.random.default_rng(11)
    g = B * group
    shift = jnp.asarray(0.3 * rng.standard_normal((g, D)), jnp.float32)
    smap = jnp.asarray(0.3 * rng.standard_normal((g, H, W, cm)), jnp.float32)
    proj = jnp.asarray(0.3 * rng.standard_normal((cm, D)), jnp.float32)
    tok_g = jnp.asarray(0.5 * rng.standard_normal((g, N, D)), jnp.float32)

    def loss_shared(pp):
        q, k = tr.apply(pp, img, pe, tok_g, image_shift=shift,
                        image_shift_map=smap, image_shift_proj=proj)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    def loss_full(pp):
        img_full = (jnp.repeat(img, group, axis=0) + shift[:, None, None, :]
                    + smap @ proj)
        q, k = tr.apply(pp, img_full, pe, tok_g)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    g_s = _blockdiag(lambda: jax.grad(loss_shared)(params))
    g_r = _plain(lambda: jax.grad(loss_full)(params))
    f1 = flax.traverse_util.flatten_dict(g_s["params"])
    f0 = flax.traverse_util.flatten_dict(g_r["params"])
    for k in f0:
        d = np.abs(np.asarray(f1[k]) - np.asarray(f0[k])).max()
        scale = np.abs(np.asarray(f0[k])).max()
        assert d < max(1e-3 * scale, 1e-5), (k, d, scale)


def test_shared_keys_gradients_match(setup):
    """Gradients through the shared rank-1 path equal the expanded path's."""
    tr, img, pe, tok, params = setup
    group = 2
    rng = np.random.default_rng(7)
    g = B * group
    shift = jnp.asarray(0.3 * rng.standard_normal((g, D)), jnp.float32)
    tok_g = jnp.asarray(0.5 * rng.standard_normal((g, N, D)), jnp.float32)

    def loss_shared(pp):
        q, k = tr.apply(pp, img, pe, tok_g, image_shift=shift)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    def loss_full(pp):
        img_full = jnp.repeat(img, group, axis=0) + shift[:, None, None, :]
        q, k = tr.apply(pp, img_full, pe, tok_g)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    g_s = _blockdiag(lambda: jax.grad(loss_shared)(params))
    g_r = _plain(lambda: jax.grad(loss_full)(params))
    f1 = flax.traverse_util.flatten_dict(g_s["params"])
    f0 = flax.traverse_util.flatten_dict(g_r["params"])
    for k in f0:
        d = np.abs(np.asarray(f1[k]) - np.asarray(f0[k])).max()
        scale = np.abs(np.asarray(f0[k])).max()
        assert d < max(1e-3 * scale, 1e-5), (k, d, scale)


def test_blockdiag_yields_to_real_masking(setup):
    """apply_masks=True with a query_mask must take the module path (the
    blockdiag path implements no masking) — masked vs unmasked results
    then genuinely differ."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(0.5 * rng.standard_normal((B, H, W, D)), jnp.float32)
    pe = jnp.asarray(0.5 * rng.standard_normal((1, H, W, D)), jnp.float32)
    tok = jnp.asarray(0.5 * rng.standard_normal((B, N, D)), jnp.float32)
    tr = TwoWayTransformer(depth=2, embedding_dim=D, num_heads=4,
                           mlp_dim=256, apply_masks=True)
    params = _plain(lambda: tr.init(jax.random.key(0), img, pe, tok))
    mask = jnp.ones((B, N), jnp.int32)
    mask = mask.at[:, N // 2:].set(0)
    q_m, k_m = _blockdiag(lambda: tr.apply(params, img, pe, tok,
                                           query_mask=mask))
    q_ref, k_ref = _plain(lambda: tr.apply(params, img, pe, tok,
                                           query_mask=mask))
    np.testing.assert_allclose(np.asarray(q_m), np.asarray(q_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(k_m), np.asarray(k_ref), atol=3e-5)


def test_reassoc_forward_and_shared_match_module(setup, monkeypatch):
    """The opt-in re-associated streaming variant (projection-free: token
    operands absorb the image projections, raw keys feed every dot) must
    match the module path for both the plain and shared-keys entries, and
    its gradients must match too. Opt-in because the tunneled XLA service
    choked compiling it at decode shapes (see _reassoc_enabled)."""
    monkeypatch.setenv("LA_TPU_BLOCKDIAG_REASSOC", "1")
    tr, img, pe, tok, params = setup
    q_ref, k_ref = _plain(lambda: tr.apply(params, img, pe, tok))
    q_f, k_f = _blockdiag(lambda: tr.apply(params, img, pe, tok))
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_ref), atol=5e-5)

    group = 4
    rng = np.random.default_rng(5)
    g = B * group
    shift = jnp.asarray(0.3 * rng.standard_normal((g, D)), jnp.float32)
    tok_g = jnp.asarray(0.5 * rng.standard_normal((g, N, D)), jnp.float32)
    img_full = jnp.repeat(img, group, axis=0) + shift[:, None, None, :]
    q_r, k_r = _plain(lambda: tr.apply(params, img_full, pe, tok_g))
    q_s, k_s = _blockdiag(
        lambda: tr.apply(params, img, pe, tok_g, image_shift=shift))
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_r), atol=5e-5)

    def loss(pp):
        q, k = tr.apply(pp, img, pe, tok)
        return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(k))

    g_f = _blockdiag(lambda: jax.grad(loss)(params))
    g_r = _plain(lambda: jax.grad(loss)(params))
    f1 = flax.traverse_util.flatten_dict(g_f["params"])
    f0 = flax.traverse_util.flatten_dict(g_r["params"])
    for k in f0:
        d = np.abs(np.asarray(f1[k]) - np.asarray(f0[k])).max()
        scale = np.abs(np.asarray(f0[k])).max()
        assert d < max(1e-3 * scale, 1e-5), (k, d, scale)
