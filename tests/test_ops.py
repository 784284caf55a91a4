"""Unit tests for core ops: resize parity vs torch, attention, pooling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from labelanything_tpu.ops import resize_bilinear
from labelanything_tpu.ops.attention import dot_product_attention, mask_to_bias
from labelanything_tpu.ops.resize import adaptive_avg_pool

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [((13, 17), (29, 31)), ((64, 64), (16, 16)),
                                          ((30, 30), (120, 120))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(0).standard_normal((2, 3) + in_hw).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x), out_hw, mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_attention_matches_reference_math():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 4, 9, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 11, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 11, 16)).astype(np.float32)
    out = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    attn = (tq @ tk.transpose(-2, -1)) / np.sqrt(16)
    ref = (attn.softmax(-1) @ tv).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_bias_masks_keys():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 1, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 6, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 6, 8)).astype(np.float32))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    bias = mask_to_bias(mask[:, None, None, :])
    out_masked = dot_product_attention(q, k, v, bias=bias)
    out_short = dot_product_attention(q, k[:, :, :3], v[:, :, :3])
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_short), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("in_hw,out_hw", [((30, 30), (2, 2)), ((7, 9), (3, 4)),
                                          ((8, 8), (1, 1))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(3).standard_normal((2, 5) + in_hw).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    theirs = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x), out_hw
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("custom", [True, False])
def test_device_normalize_bitmatches_host(custom):
    """uint8 ingest path: device normalization (ops/image_norm.py) must
    bit-match the host CustomNormalize pipeline (same fp32 op order, zero
    pad in the NORMALIZED frame, exact round-half-up valid extents)."""
    from PIL import Image as PILImage

    from labelanything_tpu.data.transforms import preprocess_image
    from labelanything_tpu.ops.image_norm import normalize_images

    rng = np.random.default_rng(21)
    s = 64
    sizes = [(37, 61), (64, 64), (100, 43), (64, 63)]
    u8s, f32s, dims = [], [], []
    for h, w in sizes:
        img = PILImage.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        u8, d = preprocess_image(img, s, custom, normalize=False)
        f32, d2 = preprocess_image(img, s, custom, normalize=True)
        assert u8.dtype == np.uint8 and d == d2
        u8s.append(u8)
        f32s.append(f32)
        dims.append(d)
    out = normalize_images(jnp.asarray(np.stack(u8s)),
                           jnp.asarray(np.asarray(dims, np.int32)),
                           s, custom_preprocess=custom)
    np.testing.assert_allclose(np.asarray(out), np.stack(f32s),
                               rtol=0, atol=1e-6)


def test_device_normalize_shipped_extents_used_verbatim():
    """The loader ships RESIZED_DIMS (the exact host resize extent) and the
    device mask must follow it VERBATIM, never re-deriving from the original
    dims (advisor r4: re-derivation could in principle drift from the host's
    float rounding; a brute-force search of all near-tie (h, m) up to
    m=100000 at S=1024 found the exact-integer fallback and host f64 always
    agree, but shipped extents make the match exact BY CONSTRUCTION and
    immune to any future host-side arithmetic change)."""
    from labelanything_tpu.data.transforms import get_preprocess_shape
    from labelanything_tpu.ops.image_norm import (normalize_images,
                                                  preprocess_shape_traced)

    s = 64
    h, w = 30, 90
    host_nh, host_nw = get_preprocess_shape(h, w, s)
    tr_nh, _ = preprocess_shape_traced(jnp.asarray([h, w], jnp.int32), s)
    assert int(tr_nh) == host_nh  # fallback agrees on realistic sizes

    u8 = np.full((1, s, s, 3), 255, np.uint8)
    dims = jnp.asarray([[h, w]], jnp.int32)
    # ship a DELIBERATELY different extent: the mask must follow it, proving
    # the shipped value is authoritative (not the derivation)
    rdims = jnp.asarray([[host_nh - 3, host_nw]], jnp.int32)
    out = np.asarray(normalize_images(jnp.asarray(u8), dims, s,
                                      resized_dims=rdims))
    assert np.all(out[:, host_nh - 3:, :, :] == 0.0)
    assert np.all(out[:, :host_nh - 3, :, :] != 0.0)
    # without resized_dims the fallback derivation masks at host_nh
    out_fb = np.asarray(normalize_images(jnp.asarray(u8), dims, s))
    assert np.all(out_fb[:, host_nh:, :, :] == 0.0)
    assert np.all(out_fb[:, :host_nh, :, :] != 0.0)


def test_int8_scores_flag_approximates_default(monkeypatch):
    """LA_TPU_INT8_SCORES=1 (the measured-negative round-5 experiment,
    kept opt-in) must stay within the score-quantization error of the
    default path — interpret mode exercises the int8 dot + dequant on
    CPU."""
    from labelanything_tpu.ops import flash_attention as fa

    kh, kw = 32, 32  # rr = 64: lanes_kernel_ok + the vpu-bias path
    b, heads, dh = 1, 2, 64
    n, c = kh * kw, 2 * 64
    rng = np.random.default_rng(13)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        0.25 * rng.standard_normal((b, n, heads * (kh + kw))).astype(
            np.float32))
    old_i = fa._INTERPRET
    fa._INTERPRET = True
    try:
        monkeypatch.setenv("LA_TPU_INT8_SCORES", "0")
        ref = np.asarray(fa._lanes_fwd_impl(qkv, r, dh ** -0.5, (kh, kw),
                                            heads))
        monkeypatch.setenv("LA_TPU_INT8_SCORES", "1")
        out = np.asarray(fa._lanes_fwd_impl(qkv, r, dh ** -0.5, (kh, kw),
                                            heads))
    finally:
        fa._INTERPRET = old_i
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.05 * scale  # 1/127-grained scores


def test_uint8_episode_ships_resized_dims(tmp_path):
    """device_normalize episodes carry BatchKeys.RESIZED_DIMS computed by
    the same host function the resize used, and the collate stacks it."""
    from labelanything_tpu.benchmarks import _write_synthetic_coco
    from labelanything_tpu.data.dataset import (LabelAnythingDataset,
                                                VariableBatchSampler)
    from labelanything_tpu.data.transforms import get_preprocess_shape
    from labelanything_tpu.typing import BatchKeys

    _write_synthetic_coco(tmp_path, n_images=6, image_size=64)
    dataset = LabelAnythingDataset(
        {"coco": {"instances_path": str(tmp_path / "instances.json"),
                  "img_dir": str(tmp_path / "images")}},
        {"image_size": 64, "seed": 0, "load_gts": False,
         "do_subsample": False, "add_box_noise": False,
         "device_normalize": True},
    )
    sampler = VariableBatchSampler(
        dataset, possible_batch_example_nums=[[2, 1, 2]],
        prompt_types=["point", "bbox", "mask"], shuffle=False, num_steps=1,
        seed=0)
    indices = next(iter(sampler))
    (batch, _gts), _names = dataset.collate_fn(
        [dataset[i] for i in indices])
    assert batch[BatchKeys.IMAGES].dtype == np.uint8
    rd = batch[BatchKeys.RESIZED_DIMS]
    dims = batch[BatchKeys.DIMS]
    assert rd.shape == dims.shape
    for b in range(dims.shape[0]):
        for n in range(dims.shape[1]):
            assert tuple(rd[b, n]) == get_preprocess_shape(
                int(dims[b, n, 0]), int(dims[b, n, 1]), 64)


@pytest.mark.parametrize("q_len", [64, 1152, 512])
def test_flash_attention_interpret_matches_xla(q_len):
    """Kernel grid/block logic incl. the q_len % 256 != 0 tail (e.g. 1152),
    run in Pallas interpret mode on CPU."""
    from labelanything_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(5)
    shape = (1, 2, q_len, 32)
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))
    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        out = fa.flash_attention(q, k, v, 32 ** -0.5)
    finally:
        fa._INTERPRET = old
    ref = fa._xla_ref(q, k, v, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grid_hw", [(8, 8), (24, 16)])
def test_flash_relpos_interpret_matches_xla(grid_hw):
    from labelanything_tpu.ops import flash_attention as fa

    kh, kw = grid_hw
    hw, d, bh = kh * kw, 32, 2
    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.standard_normal((bh, hw, d)).astype(np.float32))
               for _ in range(3))
    rel_h = jnp.asarray(rng.standard_normal((bh, hw, kh)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((bh, hw, kw)).astype(np.float32))
    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        out = fa.flash_attention_relpos(q, k, v, rel_h, rel_w, d ** -0.5, grid_hw)
    finally:
        fa._INTERPRET = old
    ref = fa._relpos_xla_ref(q, k, v, rel_h, rel_w, d ** -0.5, grid_hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", ["window", "global"])
def test_flash_relpos_packed_interpret_matches_xla(case):
    """Packed slot-major qkv kernel (both the batched window branch and the
    blocked long-sequence branch) vs the XLA reference."""
    from labelanything_tpu.ops import flash_attention as fa

    if case == "window":
        b, heads, kh, kw, d = 4, 2, 14, 14, 32
    else:
        b, heads, kh, kw, d = 1, 2, 24, 24, 32  # 576 tokens > _BLOCK_Q
    n = kh * kw
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(
        rng.standard_normal((b, 3 * heads, n, d)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((b, heads, n, kh + kw)).astype(np.float32))
    old_i, old_bq = fa._INTERPRET, fa._BLOCK_Q
    fa._INTERPRET = True
    if case == "global":
        fa._BLOCK_Q = 288  # force the blocked branch (576 = 2 q-blocks)
    try:
        out = fa.flash_attention_relpos_packed(qkv, r, d ** -0.5, (kh, kw),
                                               heads)
    finally:
        fa._INTERPRET, fa._BLOCK_Q = old_i, old_bq
    ref = fa._packed_xla_ref(qkv, r, d ** -0.5, (kh, kw), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grid_hw", [(48, 16), (16, 48)])
def test_flash_relpos_lanes_interpret_matches_xla(grid_hw):
    """Lane-sliced head-pair kernel vs the XLA reference, covering BOTH
    bias paths: (48, 16) satisfies vpu_bias_ok (block_k % kw == 0 -> VPU
    broadcast-add bias), (16, 48) does not (one-hot matmul bias)."""
    from labelanything_tpu.ops import flash_attention as fa

    kh, kw = grid_hw
    b, heads, dh = 2, 2, 64
    n, c = kh * kw, 2 * dh
    rng = np.random.default_rng(9)
    qkv = jnp.asarray(
        rng.standard_normal((b, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((b, n, heads * (kh + kw))).astype(np.float32))
    assert fa.lanes_kernel_ok(heads, dh, kh, kw)
    old_i, old_bq, old_bk = fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K
    fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K = True, 256, 256
    try:
        assert fa.vpu_bias_ok(kh, kw, n, 256) == (kw == 16)
        out = fa.flash_attention_relpos_lanes(qkv, r, dh ** -0.5, (kh, kw),
                                              heads)
    finally:
        fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K = old_i, old_bq, old_bk
    ref = fa._lanes_xla_ref(qkv, r, dh ** -0.5, (kh, kw), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_relpos_lanes_batched_interpret_matches_xla():
    """Token-major short-sequence (window) lane-sliced kernel vs XLA ref."""
    from labelanything_tpu.ops import flash_attention as fa

    kh = kw = 14
    g_total, heads, dh = 4, 2, 64
    n, c = kh * kw, 2 * 64
    rng = np.random.default_rng(10)
    qkv = jnp.asarray(
        rng.standard_normal((g_total, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((g_total, n, heads * (kh + kw))).astype(
            np.float32))
    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        out = fa.flash_attention_relpos_lanes_batched(
            qkv, r, dh ** -0.5, (kh, kw), heads)
    finally:
        fa._INTERPRET = old
    ref = fa._lanes_xla_ref(qkv, r, dh ** -0.5, (kh, kw), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_relpos_packed_grad():
    """The packed kernel is differentiable (XLA-recompute VJP)."""
    from labelanything_tpu.ops import flash_attention as fa

    b, heads, kh, kw, d = 2, 2, 4, 4, 8
    n = kh * kw
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(
        rng.standard_normal((b, 3 * heads, n, d)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((b, heads, n, kh + kw)).astype(np.float32))

    def loss_kernel(qkv, r):
        old = fa._INTERPRET
        fa._INTERPRET = True
        try:
            return jnp.sum(fa.flash_attention_relpos_packed(
                qkv, r, d ** -0.5, (kh, kw), heads) ** 2)
        finally:
            fa._INTERPRET = old

    def loss_ref(qkv, r):
        return jnp.sum(fa._packed_xla_ref(qkv, r, d ** -0.5, (kh, kw),
                                          heads) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(qkv, r)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(qkv, r)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grid_hw", [(48, 16), (16, 48)])
def test_flash_relpos_lanes_fused_bwd_matches_xla(grid_hw):
    """Fused Pallas backward of the long-sequence lanes kernel (interpret
    mode) vs the XLA recompute-VJP reference: dqkv and dr must match."""
    from labelanything_tpu.ops import flash_attention as fa

    kh, kw = grid_hw
    b, heads, dh = 2, 2, 64
    n, c = kh * kw, 2 * 64
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((b, n, heads * (kh + kw))).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))

    old_i, old_bq, old_bk = fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K
    fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K = True, 256, 256
    try:
        _, vjp = jax.vjp(
            lambda a, rr: fa.flash_attention_relpos_lanes(
                a, rr, dh ** -0.5, (kh, kw), heads), qkv, r)
        dqkv, dr = vjp(ct)
    finally:
        fa._INTERPRET, fa._BLOCK_Q, fa._BLOCK_K = old_i, old_bq, old_bk
    _, vjp_ref = jax.vjp(
        lambda a, rr: fa._lanes_xla_ref(a, rr, dh ** -0.5, (kh, kw), heads),
        qkv, r)
    dqkv_ref, dr_ref = vjp_ref(ct)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_relpos_lanes_batched_fused_bwd_matches_xla():
    """Fused Pallas backward of the windowed lanes kernel vs the XLA
    recompute-VJP reference."""
    from labelanything_tpu.ops import flash_attention as fa

    kh = kw = 14
    g_total, heads, dh = 4, 2, 64
    n, c = kh * kw, 2 * 64
    rng = np.random.default_rng(12)
    qkv = jnp.asarray(
        rng.standard_normal((g_total, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((g_total, n, heads * (kh + kw))).astype(
            np.float32))
    ct = jnp.asarray(rng.standard_normal((g_total, n, c)).astype(np.float32))

    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        _, vjp = jax.vjp(
            lambda a, rr: fa.flash_attention_relpos_lanes_batched(
                a, rr, dh ** -0.5, (kh, kw), heads), qkv, r)
        dqkv, dr = vjp(ct)
    finally:
        fa._INTERPRET = old
    _, vjp_ref = jax.vjp(
        lambda a, rr: fa._lanes_xla_ref(a, rr, dh ** -0.5, (kh, kw), heads),
        qkv, r)
    dqkv_ref, dr_ref = vjp_ref(ct)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_bwd_kill_switch(monkeypatch):
    """LA_TPU_DISABLE_FUSED_BWD=1 routes the lanes VJP back through the XLA
    recompute path (A/B forensics contract)."""
    from labelanything_tpu.ops import flash_attention as fa

    monkeypatch.setenv("LA_TPU_DISABLE_FUSED_BWD", "1")
    assert fa._fused_bwd_disabled()
    kh = kw = 14
    g_total, heads, dh = 2, 2, 64
    n, c = kh * kw, 2 * 64
    rng = np.random.default_rng(13)
    qkv = jnp.asarray(
        rng.standard_normal((g_total, n, 3 * c)).astype(np.float32))
    r = jnp.asarray(
        rng.standard_normal((g_total, n, heads * (kh + kw))).astype(
            np.float32))
    ct = jnp.ones((g_total, n, c), jnp.float32)
    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        _, vjp = jax.vjp(
            lambda a, rr: fa.flash_attention_relpos_lanes_batched(
                a, rr, dh ** -0.5, (kh, kw), heads), qkv, r)
        dqkv, dr = vjp(ct)
    finally:
        fa._INTERPRET = old
    _, vjp_ref = jax.vjp(
        lambda a, rr: fa._lanes_xla_ref(a, rr, dh ** -0.5, (kh, kw), heads),
        qkv, r)
    dqkv_ref, dr_ref = vjp_ref(ct)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr_ref),
                               rtol=2e-5, atol=2e-5)


def test_relpos_chunked_backward_matches_unchunked(monkeypatch):
    """The q-chunked rematerialized backward (the SAM-1024 training memory
    fix: live quadratic memory bounded to (B, H, CHUNK, N)) must produce the
    SAME gradients as the full-materialization reference."""
    from labelanything_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    b, heads, dh, kh, kw = 2, 2, 8, 8, 8
    n, c = kh * kw, 2 * 8
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, n, heads * (kh + kw))),
                    jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    def grads():
        out, vjp = jax.vjp(
            lambda a, rr: fa._lanes_xla_ref(a, rr, 0.3, (kh, kw), heads),
            qkv, r)
        return out, vjp(g)

    out_full, (dq_full, dr_full) = grads()
    monkeypatch.setattr(fa, "_BWD_CHUNK_THRESHOLD", 16)
    monkeypatch.setattr(fa, "_BWD_CHUNK", 16)
    out_c, (dq_c, dr_c) = grads()

    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_full),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq_c), np.asarray(dq_full),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dr_c), np.asarray(dr_full),
                               rtol=2e-5, atol=2e-5)
