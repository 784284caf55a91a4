"""SAM / ViTDet-style image encoder (reference: label_anything/models/image_encoder.py).

TPU-first notes:
  * Channels-last throughout; patch embedding is space-to-depth + one matmul
    (see PatchEmbed — the strided conv wastes ~40x MXU work to 3-channel
    lane padding).
  * Window partitioning is a static reshape/transpose (img_size and
    window_size are fixed per build), so the whole encoder is one compiled
    graph with zero dynamic shapes.
  * Decomposed relative-position attention runs through the packed-layout
    fused Pallas kernels (ops/flash_attention.py): q/k/v are read straight
    out of the qkv projection (slot-major), the factored bias is
    reconstructed per VMEM tile, and the softmax uses a bounded shift with
    an MXU-computed denominator. Set ``use_kernel=False`` for
    tensor-parallel runs (Pallas custom calls are not GSPMD-partitionable);
    the XLA fallback partitions cleanly and is numerically equivalent.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .common import LayerNorm2d, MLPBlock


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
    # Pallas custom calls are not GSPMD-partitionable: tensor-parallel runs
    # (parallel/tp.py) must set use_kernel=False so attention takes the XLA
    # path, which GSPMD partitions. Pure data-parallel runs keep the kernel.
    use_kernel: bool = True
    # > 0 enables the fused windowed-block path when called with residual=
    # (see ops/fused_window.py); input_size is then the window size.
    window_size: int = 0

    @nn.compact
    def __call__(self, x: jax.Array,
                 residual: Optional[jax.Array] = None) -> jax.Array:
        if residual is not None:
            return self._fused_window(x, residual)
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
                                           flash_attention_relpos_packed)

        # _pick_block_q handles any hw divisible by 128 (or a single block)
        kernel_ok = hw % 128 == 0 or hw <= _BLOCK_Q
        if _on_tpu() and kernel_ok and self.use_kernel:
            # slot-major packed layout: ONE relayout copy replaces the
            # reshape/moveaxis + per-tensor transposes of the unpacked path
            # (measured ~2x the attention-kernel cost in HBM glue traffic);
            # the Pallas kernel reads q/k/v blocks straight out of it.
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
            name="attn",
        )
        fused = (self.window_size > 0 and self.use_rel_pos and self.use_kernel
                 and _fw._ENABLE and (_on_tpu() or _fw._INTERPRET))
        if fused:
            # partition/attention/unpartition/residual in one pallas_call
            x = attn(x, residual=shortcut)
        else:
            if self.window_size > 0:
                h, w = x.shape[1], x.shape[2]
                x, pad_hw = window_partition(x, self.window_size)
            x = attn(x)
            if self.window_size > 0:
                x = window_unpartition(x, self.window_size, pad_hw, (h, w))
            x = shortcut + x
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
    remat: bool = False
    use_kernel: bool = True  # False for tensor-parallel runs (see ViTAttention)

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
            block_cls = nn.remat(ViTBlock, static_argnums=())
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
