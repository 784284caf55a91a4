"""SAM / ViTDet-style image encoder (reference: label_anything/models/image_encoder.py).

TPU-first notes:
  * Channels-last throughout; patch embedding is space-to-depth + one matmul
    (see PatchEmbed — the strided conv wastes ~40x MXU work to 3-channel
    lane padding).
  * Window partitioning is a static reshape/transpose (img_size and
    window_size are fixed per build), so the whole encoder is one compiled
    graph with zero dynamic shapes.
  * Decomposed relative-position attention runs through the fused Pallas
    kernels (ops/flash_attention.py): global layers use the lane-sliced
    kernel that reads q/k/v straight from the TOKEN-MAJOR qkv projection
    (no relayout transpose on either side); windowed layers use the
    slot-major packed kernel; the factored bias is reconstructed per VMEM
    tile, and the softmax uses a bounded shift with an MXU-computed
    denominator.
  * Tensor parallelism: pass ``tp_mesh`` (a Mesh with a "model" axis) to
    head-shard attention via shard_map with the kernels ALIVE
    (ViTAttention._tp_attention). ``use_kernel=False`` remains available
    as a pure-XLA fallback (e.g. for GSPMD-only sharding experiments).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention
from .common import LayerNorm2d, MLPBlock


def _prepart_disabled() -> bool:
    """Kill switch for the pre-partition windowed path (A/B forensics).

    Read at TRACE time: set LA_TPU_DISABLE_PREPART=1 before the first
    compilation; '', '0' and 'false' leave the fast path on."""
    import os

    return os.environ.get("LA_TPU_DISABLE_PREPART", "").strip().lower() \
        not in ("", "0", "false")


def window_partition(x: jax.Array, window_size: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nW, ws, ws, C) with bottom/right zero padding
    (reference: image_encoder.py:258-280)."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(
    windows: jax.Array, window_size: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (and if needed linearly resize) relative-position rows
    (reference: image_encoder.py:311-337)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear", antialias=False
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative_coords.astype(jnp.int32)]


class PatchEmbed(nn.Module):
    """Patch embedding as space-to-depth + matmul (reference:
    image_encoder.py:379-409 uses a strided conv).

    XLA lowers a stride-16 conv over a 3-channel image by padding the input
    channel dim up to the vector lane width, wasting ~40x MXU work (measured
    9.4 ms vs the 0.4 ms matmul floor for ViT-B @1024 batch 8 on v5e). The
    reshape/transpose to (B, H/p, W/p, p*p*3) followed by a (768, 768)
    matmul is mathematically identical and keeps the conv's HWIO parameter
    layout, so torch checkpoint import is unchanged."""

    embed_dim: int
    patch_size: int = 16
    in_chans: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p, c = self.patch_size, self.in_chans
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, c, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        b, h, w, _ = x.shape
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)
        y = jnp.dot(x.astype(self.dtype),
                    kernel.reshape(p * p * c, self.embed_dim).astype(self.dtype))
        return y + bias.astype(self.dtype)


class ViTAttention(nn.Module):
    """ViT attention with optional decomposed rel-pos
    (reference: image_encoder.py:200-255)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32
    # False selects the pure-XLA attention path (GSPMD-partitionable); with
    # a tp_mesh the Pallas kernels run head-sharded via shard_map instead,
    # so TP no longer requires turning them off.
    use_kernel: bool = True
    # > 0 enables the fused windowed-block path when called with residual=
    # (see ops/fused_window.py); input_size is then the window size.
    window_size: int = 0
    # Tensor parallelism: a Mesh with a "model" axis head-shards the whole
    # attention op via shard_map (see _tp_attention) — the Pallas kernels
    # stay ALIVE under TP because each device runs them on its local heads.
    tp_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 residual: Optional[jax.Array] = None,
                 full_map: bool = False) -> jax.Array:
        if residual is not None:
            return self._fused_window(x, residual)
        if full_map:
            return self._window_attention(x)
        if self.tp_mesh is not None and self.use_rel_pos:
            return self._tp_attention(x)
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        hw = h * w
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)                  # (b, h, w, 3*dim)
        qkv = qkv.reshape(b, hw, 3 * self.dim)

        if not self.use_rel_pos:
            qkv5 = qkv.reshape(b, hw, 3, self.num_heads, head_dim)
            q, k, v = jnp.moveaxis(qkv5, 2, 0)  # each (b, hw, heads, hd)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            out = dot_product_attention(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros,
            (2 * self.input_size[0] - 1, head_dim),
        )
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros,
            (2 * self.input_size[1] - 1, head_dim),
        )
        # factored rel-pos terms: tiny (.., HW, H) / (.., HW, W) tensors.
        # Cast the fp32 tables at use so the einsums (and the factored bias
        # tensors fed to the kernel) stay in the compute dtype.
        rh_table = get_rel_pos(h, h, rel_pos_h).astype(self.dtype)  # (H, H, hd)
        rw_table = get_rel_pos(w, w, rel_pos_w).astype(self.dtype)  # (W, W, hd)
        scale = head_dim ** -0.5

        from ..ops.attention import _on_tpu
        from ..ops.flash_attention import (_BLOCK_Q, _LOG2E,
                                           flash_attention_relpos_lanes,
                                           flash_attention_relpos_lanes_batched,
                                           flash_attention_relpos_packed,
                                           lanes_kernel_ok)

        # _pick_block_q handles any hw divisible by 128 (or a single block)
        kernel_ok = hw % 128 == 0 or hw <= _BLOCK_Q
        lanes_ok = (hw % 128 == 0 and hw > _BLOCK_Q
                    and lanes_kernel_ok(self.num_heads, head_dim, h, w))
        lanes_short_ok = (hw <= _BLOCK_Q and head_dim == 64
                          and self.num_heads % 2 == 0)
        if _on_tpu() and (lanes_short_ok or lanes_ok) and self.use_kernel:
            # token-major lane-sliced kernels: q/k/v read straight out of
            # the qkv projection via 128-lane head-pair BlockSpec index
            # maps, output written token-major — the slot-major relayout
            # (~150 MB for ViT-B @1024 batch 8) and the head-major output
            # transpose both disappear. Short (windowed) sequences use the
            # window-batched variant, long (global) ones the blocked one.
            q4 = qkv[..., :self.dim].reshape(b, h, w, self.num_heads,
                                             head_dim)
            rel_h = jnp.einsum("byxnc,ykc->byxnk", q4, rh_table)
            rel_w = jnp.einsum("byxnc,xkc->byxnk", q4, rw_table)
            r = (jnp.concatenate([rel_h, rel_w], axis=-1)
                 * jnp.asarray(_LOG2E, self.dtype))
            lanes_fn = (flash_attention_relpos_lanes_batched
                        if lanes_short_ok else flash_attention_relpos_lanes)
            out = lanes_fn(
                qkv, r.reshape(b, hw, self.num_heads * (h + w)),
                scale, (h, w), self.num_heads)
            out = out.reshape(b, h, w, self.dim)
        elif _on_tpu() and kernel_ok and self.use_kernel:
            # slot-major packed layout: ONE relayout copy replaces the
            # reshape/moveaxis + per-tensor transposes of the unpacked path
            # (measured ~2x the attention-kernel cost in HBM glue traffic);
            # the Pallas kernel reads q/k/v blocks straight out of it.
            # Fallback for head geometries the lane kernel cannot tile
            # (ViT-H's dh=80) and for short windowed sequences.
            packed = qkv.reshape(b, hw, 3 * self.num_heads, head_dim)
            packed = packed.transpose(0, 2, 1, 3)  # (B, 3*heads, HW, hd)
            q5 = packed[:, :self.num_heads].reshape(
                b, self.num_heads, h, w, head_dim)
            rel_h = jnp.einsum("bnyxc,ykc->bnyxk", q5, rh_table)
            rel_w = jnp.einsum("bnyxc,xkc->bnyxk", q5, rw_table)
            r = jnp.concatenate([
                rel_h.reshape(b, self.num_heads, hw, h),
                rel_w.reshape(b, self.num_heads, hw, w),
            ], axis=-1) * jnp.asarray(_LOG2E, self.dtype)
            out4 = flash_attention_relpos_packed(
                packed, r, scale, (h, w), self.num_heads)
            out = out4.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        else:
            qkv5 = qkv.reshape(b, hw, 3, self.num_heads, head_dim)
            q, k, v = jnp.moveaxis(qkv5, 2, 0)       # (b, hw, heads, hd)
            bh = b * self.num_heads
            q3 = q.transpose(0, 2, 1, 3).reshape(bh, hw, head_dim)
            k3 = k.transpose(0, 2, 1, 3).reshape(bh, hw, head_dim)
            v3 = v.transpose(0, 2, 1, 3).reshape(bh, hw, head_dim)
            r_q = q3.reshape(bh, h, w, head_dim)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh_table).reshape(bh, hw, h)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw_table).reshape(bh, hw, w)
            s = jnp.einsum("bqd,bkd->bqk", q3, k3,
                           preferred_element_type=jnp.float32) * scale
            s = s.reshape(bh, hw, h, w)
            s = s + rel_h.reshape(bh, hw, h)[..., None]
            s = s + rel_w.reshape(bh, hw, w)[:, :, None, :]
            p = jax.nn.softmax(s.reshape(bh, hw, hw), axis=-1).astype(v3.dtype)
            out3 = jnp.einsum("bqk,bkd->bqd", p, v3)
            out = out3.reshape(b, self.num_heads, hw, head_dim)
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

    def _tp_attention(self, x: jax.Array) -> jax.Array:
        """Megatron-style head-sharded attention over the mesh "model" axis.

        Round 1 excluded attention from tensor parallelism because the
        stored qkv kernel's output layout is (3, heads, dh)-flattened
        (torch-checkpoint contract): a flat model-axis tile crosses the
        3-boundary, and the Pallas kernels are not GSPMD-partitionable.
        Both problems dissolve inside shard_map:

          * The kernel is reordered head-major ((heads, 3, dh)-flattened) in
            the traced function — a parameter-sized reshuffle GSPMD lowers
            to a local slice of the replicated source — so each device's
            shard holds COMPLETE q/k/v for heads//ntp heads (column-
            parallel qkv: FLOPs and activation memory divided by ntp).
          * Inside shard_map every array is local, so each device builds
            its own slot-major packed layout and calls the SAME fused
            Pallas kernel on its local heads — attention no longer falls
            back to XLA under TP.
          * The output projection is row-parallel: its (C, C) kernel rows
            are already head-major, shard axis 0, one psum over "model"
            after the local matmul.

        Numerically identical to the single-device path (same kernel, same
        math; the psum is the only collective)."""
        from ..ops.attention import _on_tpu
        from ..ops import flash_attention as fa

        mesh = self.tp_mesh
        ntp = int(mesh.shape["model"])
        heads, c = self.num_heads, self.dim
        dh = c // heads
        assert heads % ntp == 0, (
            f"tensor-parallel attention needs heads % tp == 0 "
            f"(heads={heads}, tp={ntp})")
        lh = heads // ntp
        b, h, w, _ = x.shape
        hw = h * w
        scale = dh ** -0.5

        wqkv, bqkv = _DenseParams(3 * c, name="qkv")(c)
        wproj, bproj = _DenseParams(c, name="proj")(c)
        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, dh))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, dh))
        rh_table = get_rel_pos(h, h, rel_pos_h).astype(self.dtype)
        rw_table = get_rel_pos(w, w, rel_pos_w).astype(self.dtype)

        # head-major reorder of the stored (3, heads, dh) layout; GSPMD
        # materializes only each device's slice of the replicated source
        w_h = (wqkv.reshape(c, 3, heads, dh).transpose(0, 2, 1, 3)
               .reshape(c, 3 * c)).astype(self.dtype)
        b_h = (bqkv.reshape(3, heads, dh).transpose(1, 0, 2)
               .reshape(3 * c)).astype(self.dtype)
        wp = wproj.astype(self.dtype)
        use_kernel = (self.use_kernel and (_on_tpu() or fa._INTERPRET)
                      and (hw % 128 == 0 or hw <= fa._BLOCK_Q))

        # token-major lanes kernels on the LOCAL heads (mirrors the non-TP
        # branch selection): short windowed sequences use the batched
        # variant, long global ones the blocked one; geometries the lane
        # layout cannot tile (odd local heads, dh != 64) keep the packed
        # path. The (lh, 3, dh) -> (3, lh, dh) channel reorder happens on
        # the WEIGHT, so the qkv activation is produced token-major and
        # never relayouts.
        lc = lh * dh
        lanes_short_ok = (hw <= fa._BLOCK_Q and dh == 64 and lh % 2 == 0)
        lanes_long_ok = (hw % 128 == 0 and hw > fa._BLOCK_Q
                         and fa.lanes_kernel_ok(lh, dh, h, w))
        use_lanes = use_kernel and (lanes_short_ok or lanes_long_ok)

        def local_attn(xl, w_l, b_l, wp_l, rh, rw):
            bl = xl.shape[0]
            if use_lanes:
                w_tm = (w_l.reshape(c, lh, 3, dh).transpose(0, 2, 1, 3)
                        .reshape(c, 3 * lc))
                b_tm = (b_l.reshape(lh, 3, dh).transpose(1, 0, 2)
                        .reshape(3 * lc))
                qkv_tm = (jnp.dot(xl.reshape(bl * hw, c), w_tm) + b_tm
                          ).reshape(bl, hw, 3 * lc)
                q4 = qkv_tm[..., :lc].reshape(bl, h, w, lh, dh)
                rel_h = jnp.einsum("byxnc,ykc->byxnk", q4, rh)
                rel_w = jnp.einsum("byxnc,xkc->byxnk", q4, rw)
                r = (jnp.concatenate([rel_h, rel_w], axis=-1)
                     * jnp.asarray(fa._LOG2E, self.dtype))
                lanes_fn = (fa.flash_attention_relpos_lanes_batched
                            if lanes_short_ok
                            else fa.flash_attention_relpos_lanes)
                att = lanes_fn(
                    qkv_tm, r.reshape(bl, hw, lh * (h + w)), scale,
                    (h, w), lh).reshape(bl * hw, lc)
            else:
                qkv = jnp.dot(xl.reshape(bl * hw, c), w_l) + b_l
                qkv5 = qkv.reshape(bl, hw, lh, 3, dh)
                packed = qkv5.transpose(0, 3, 2, 1, 4).reshape(
                    bl, 3 * lh, hw, dh)              # local slot-major
                q5 = packed[:, :lh].reshape(bl, lh, h, w, dh)
                rel_h = jnp.einsum("bnyxc,ykc->bnyxk", q5, rh)
                rel_w = jnp.einsum("bnyxc,xkc->bnyxk", q5, rw)
                r = jnp.concatenate([
                    rel_h.reshape(bl, lh, hw, h),
                    rel_w.reshape(bl, lh, hw, w),
                ], axis=-1) * jnp.asarray(fa._LOG2E, self.dtype)
                if use_kernel:
                    out4 = fa.flash_attention_relpos_packed(
                        packed, r, scale, (h, w), lh)
                else:
                    out4 = fa._packed_xla_ref(packed, r, scale, (h, w), lh)
                att = out4.transpose(0, 2, 1, 3).reshape(bl * hw, lh * dh)
            partial = jnp.dot(att, wp_l)             # row-parallel partial
            return jax.lax.psum(partial, "model").reshape(bl, h, w, c)

        try:
            from jax import shard_map as _shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map as _shard_map

        P = jax.sharding.PartitionSpec
        data_axis = "data" if "data" in mesh.shape else None
        out = _shard_map(
            local_attn, mesh=mesh,
            in_specs=(P(data_axis), P(None, "model"), P("model"),
                      P("model", None), P(), P()),
            out_specs=P(data_axis),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )(x.astype(self.dtype), w_h, b_h, wp, rh_table, rw_table)
        return out + bproj.astype(self.dtype)

    def _window_attention(self, xn: jax.Array) -> jax.Array:
        """Windowed attention over the FULL-RES normed map with the window
        axis FLATTENED before the projections (the reference projects on
        (nW, ws, ws, C) windows, image_encoder.py:174-180 + 200-232).

        Round-3 profiling (xplane, ViT-B@1024 batch 8) showed the
        windows-as-2D order costing ~0.8 ms/block of pure HBM relayout: the
        qkv convolution on (nW, ws, ws, C) emits a (ws, ws)-subtiled layout
        the lanes kernel cannot read (ws=14 rows pad to 16 sublanes, so the
        (14, 14) -> 196 merge is a real copy — 0.57 ms/block), plus an
        unpartition copy-train around the proj. Flattening windows to
        (G, ws*ws, C) tokens FIRST makes qkv a plain matmul born in the
        token-major row-major layout the kernel's BlockSpecs read, and proj
        consumes the kernel output the same way — the only relayouts left
        are one window partition of the 768-wide x and one unpartition of
        the 768-wide output. (An intermediate attempt projected qkv on the
        unpartitioned (B, H, W, 3C) map and partitioned the 3C stream: XLA
        materialized pad + transpose + sublane-merge as THREE full passes
        over the 180 MB stream — 6 ms/step SLOWER, kept here as the
        negative result.) Zero-padding happens before qkv, exactly like
        window_partition, so pad tokens see qkv = bias like the reference."""
        assert self.use_rel_pos and self.window_size > 0
        ws = self.window_size
        b, h, w, _ = xn.shape
        c = self.dim
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        from ..ops.flash_attention import (
            _LOG2E, flash_attention_relpos_lanes_batched)

        qkv_dense = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                             name="qkv")
        proj_dense = nn.Dense(c, dtype=self.dtype, name="proj")
        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
        rh_table = get_rel_pos(ws, ws, rel_pos_h).astype(self.dtype)
        rw_table = get_rel_pos(ws, ws, rel_pos_w).astype(self.dtype)

        # zero-pad BEFORE qkv, exactly like window_partition (pad tokens
        # then see qkv = bias, matching the reference bit-for-bit)
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            xn = jnp.pad(xn, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp_ = h + pad_h, w + pad_w
        nh, nw = hp // ws, wp_ // ws
        g, n = b * nh * nw, ws * ws
        xw = (xn.reshape(b, nh, ws, nw, ws, c)
              .transpose(0, 1, 3, 2, 4, 5).reshape(g, n, c))
        qkvw = qkv_dense(xw)                              # (G, N, 3C)

        q4 = qkvw[..., :c].reshape(g, ws, ws, self.num_heads, head_dim)
        rel_h = jnp.einsum("gyxnc,ykc->gyxnk", q4, rh_table)
        rel_w = jnp.einsum("gyxnc,xkc->gyxnk", q4, rw_table)
        r = (jnp.concatenate([rel_h, rel_w], axis=-1)
             * jnp.asarray(_LOG2E, self.dtype))
        out = flash_attention_relpos_lanes_batched(
            qkvw, r.reshape(g, n, self.num_heads * 2 * ws),
            scale, (ws, ws), self.num_heads)              # (g, n, C)
        # proj on flat window tokens (row-major in, row-major out — no
        # relayout), THEN one unpartition copy back to the residual layout
        out = proj_dense(out)
        x = (out.reshape(b, nh, nw, ws, ws, c)
             .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp_, c))
        if pad_h or pad_w:
            x = x[:, :h, :w]
        return x

    def _fused_window(self, xn: jax.Array, residual: jax.Array) -> jax.Array:
        """Fused windowed path (ops/fused_window.py): ``xn`` is the FULL-RES
        normed map; padding, window partition, qkv, rel-pos attention, proj,
        and the residual add all happen here, returning the full-res
        ``residual + attn`` (the reference's partition/attention/unpartition
        sequence, image_encoder.py:174-180, collapsed into one pallas_call).
        Called from inside the compact ``__call__`` so parameter names match
        the unfused path exactly."""
        from ..ops.fused_window import fused_window_attention

        assert self.use_rel_pos and self.window_size > 0
        ws = self.window_size
        b, h, w, _ = xn.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            # pad AFTER norm1, exactly like window_partition's zero pad
            xn = jnp.pad(xn, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            residual = jnp.pad(residual,
                               ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp_ = xn.shape[1:3]

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(xn)                    # (B, Hp, Wp, 3C)

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
        rh_table = get_rel_pos(ws, ws, rel_pos_h).astype(self.dtype)
        rw_table = get_rel_pos(ws, ws, rel_pos_w).astype(self.dtype)

        nh, nw = hp // ws, wp_ // ws
        q6 = qkv[..., :self.dim].reshape(
            b, nh, ws, nw, ws, self.num_heads, head_dim)
        rel_h = jnp.einsum("bAyBxnc,ykc->bAyBxnk", q6, rh_table)
        rel_w = jnp.einsum("bAyBxnc,xkc->bAyBxnk", q6, rw_table)
        from ..ops.flash_attention import _LOG2E

        r = (jnp.concatenate([rel_h, rel_w], axis=-1)
             * jnp.asarray(_LOG2E, self.dtype))
        r = r.transpose(0, 5, 1, 2, 3, 4, 6).reshape(
            b, self.num_heads, hp, wp_, 2 * ws)

        w_proj, b_proj = _DenseParams(self.dim, name="proj")(self.dim)

        out = fused_window_attention(residual, qkv, r, w_proj, b_proj,
                                     scale, self.num_heads, ws)
        return out[:, :h, :w]


class _DenseParams(nn.Module):
    """Declares Dense-compatible parameters ({kernel, bias}, same names and
    initializers as flax ``nn.Dense``) WITHOUT applying the layer, so fused
    kernels can consume the raw arrays while the parameter tree stays
    identical to the unfused path (checkpoint/import compatibility)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ViTBlock(nn.Module):
    """Windowed/global transformer block (reference: image_encoder.py:134-197)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: Optional[Tuple[int, int]] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: bool = True
    tp_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.attention import _on_tpu
        from ..ops import fused_window as _fw

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn = ViTAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=(
                self.input_size if self.window_size == 0
                else (self.window_size, self.window_size)
            ),
            dtype=self.dtype,
            use_kernel=self.use_kernel,
            window_size=self.window_size,
            tp_mesh=self.tp_mesh,
            name="attn",
        )
        fused = (self.window_size > 0 and self.use_rel_pos and self.use_kernel
                 and self.tp_mesh is None
                 and _fw._ENABLE and (_on_tpu() or _fw._INTERPRET))
        from ..ops.flash_attention import _BLOCK_Q
        # pre-partition path: qkv/proj on the full-res map, ONE relayout
        # each way (see ViTAttention._window_attention) — eligibility
        # mirrors the batched lanes kernel's
        prepart = (self.window_size > 0 and self.use_rel_pos
                   and self.use_kernel and self.tp_mesh is None
                   and not fused and _on_tpu()
                   and self.window_size ** 2 <= _BLOCK_Q
                   and self.dim // self.num_heads == 64
                   and self.num_heads % 2 == 0
                   and not _prepart_disabled())
        if fused:
            # partition/attention/unpartition/residual in one pallas_call
            x = attn(x, residual=shortcut)
        elif prepart:
            x = shortcut + attn(x, full_map=True)
        else:
            if self.window_size > 0:
                h, w = x.shape[1], x.shape[2]
                x, pad_hw = window_partition(x, self.window_size)
            x = attn(x)
            if self.window_size > 0:
                x = window_unpartition(x, self.window_size, pad_hw, (h, w))
            x = shortcut + x
        # named checkpoint for the "attn" remat policy: saving this one
        # tensor per block lets the rematerialized backward recompute only
        # the dense glue, never the attention forward kernels
        x = checkpoint_name(x, "vit_attn_out")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(self.dim, int(self.dim * self.mlp_ratio), act=self.act,
                     dtype=self.dtype, name="mlp")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder (reference: image_encoder.py:19-131).

    Input (B, H, W, 3) channels-last; output (B, H/16, W/16, out_chans)
    (or the pre-neck 768-dim state when ``project_last_hidden=False``).
    """

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    global_attn_indexes: Tuple[int, ...] = ()
    project_last_hidden: bool = True
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    # False/None = no remat; True/"full" = rerun each block in backward;
    # "attn" = save only attention-stage outputs; "dots" = save matmul
    # outputs (see __call__ for the trade-offs)
    remat: Any = False
    use_kernel: bool = True
    # head-sharded tensor-parallel attention (ViTAttention._tp_attention);
    # keeps use_kernel=True alive under TP
    tp_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, return_last_block_state: bool = False):
        grid = self.img_size // self.patch_size
        x = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            in_chans=self.in_chans, dtype=self.dtype, name="patch_embed",
        )(x)
        if self.use_abs_pos:
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
            )
            # cast the fp32 param at use: adding it raw would promote the
            # whole residual stream (and every downstream op) to fp32
            x = x + pos_embed.astype(x.dtype)

        block_cls = ViTBlock
        if self.remat:
            # remat policies for the fine-tune path (PERF.md round-5 remat
            # tax): "full"/True reruns the whole block forward in backward
            # (max memory savings, ~1 extra forward of recompute); "attn"
            # saves ONLY each block's attention-stage output (the named
            # checkpoint in ViTBlock) so the backward recomputes just the
            # dense glue (LN/qkv/proj/MLP) and never re-runs the attention
            # forward kernels; "dots" saves all matmul outputs (recompute =
            # elementwise + the attention kernels, which a dots policy
            # cannot see inside pallas_call).
            kw = {}
            if self.remat == "attn":
                kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "vit_attn_out")
            elif self.remat == "dots":
                kw["policy"] = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            elif self.remat not in (True, "full"):
                raise ValueError(f"unknown remat policy: {self.remat!r}")
            block_cls = nn.remat(ViTBlock, static_argnums=(), **kw)
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=self.window_size if i not in self.global_attn_indexes else 0,
                input_size=(grid, grid),
                act=self.act,
                dtype=self.dtype,
                use_kernel=self.use_kernel,
                tp_mesh=self.tp_mesh,
                name=f"blocks_{i}",
            )(x)

        last_block = x
        if not self.project_last_hidden:
            return x

        # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (no biases)
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        y = LayerNorm2d(self.out_chans, dtype=self.dtype, name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(y)
        y = LayerNorm2d(self.out_chans, dtype=self.dtype, name="neck_ln2")(y)

        if return_last_block_state:
            return {"last_hidden_state": y, "last_block_state": last_block}
        return y
