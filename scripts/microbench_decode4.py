"""Decode residuals: PE sub-stages beyond the fusion transformer, and neck
variants (XLA conv vs 9-shift matmul 3x3). Device-loop slope timing."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from _slope_timing import timed_loop

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.models.common import LayerNorm2d
from labelanything_tpu.typing import BatchKeys

B, ways, shots, S = 16, 5, 1, 480
C = ways + 1


def main():
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=S,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16)
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=B, num_examples=shots, num_classes=C, image_size=S,
        embed_dim=768))
    params = jax.jit(model.init)(jax.random.key(0), batch)

    pe = model.bind(params).prompt_encoder
    g = B * shots * C
    hw = S // 16
    rng = np.random.default_rng(0)
    src = jnp.asarray(0.3 * rng.standard_normal((g, hw, hw, 256)),
                      jnp.bfloat16)
    pos = jnp.asarray(0.3 * rng.standard_normal((1, hw, hw, 256)),
                      jnp.bfloat16)
    flags = batch[BatchKeys.FLAG_EXAMPLES]

    def f_obtain(c):
        s2 = src + (c * 0).astype(src.dtype)
        out = pe._obtain_embeddings(s2, pos, flags)
        import labelanything_tpu.typing as T
        return c + jnp.sum(out[T.ResultDict.CLASS_EMBS].astype(jnp.float32))

    print(f"obtain_embeddings (pool+merge+mean): "
          f"{timed_loop(f_obtain) * 1e3:7.3f} ms", flush=True)

    # neck variants on (B*(M+1), 30, 30, 768)
    n_img = B * (shots + 1)
    x = jnp.asarray(0.3 * rng.standard_normal((n_img, hw, hw, 768)),
                    jnp.bfloat16)

    class NeckConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16)(x)
            x = LayerNorm2d(256, dtype=jnp.bfloat16)(x)
            x = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(x)
            x = LayerNorm2d(256, dtype=jnp.bfloat16)(x)
            return x

    class NeckShift(nn.Module):
        """3x3 conv as 9 shifted matmuls (no conv lowering)."""

        @nn.compact
        def __call__(self, x):
            x = nn.Dense(256, use_bias=False, dtype=jnp.bfloat16)(x)
            x = LayerNorm2d(256, dtype=jnp.bfloat16)(x)
            w = self.param("w3", nn.initializers.lecun_normal(),
                           (3, 3, 256, 256))
            n, h, wd, c = x.shape
            out = jnp.zeros_like(x)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    xs = jnp.roll(x, (-dy, -dx), axis=(1, 2))
                    # zero the wrapped border
                    if dy == 1:
                        xs = xs.at[:, -1:].set(0)
                    elif dy == -1:
                        xs = xs.at[:, :1].set(0)
                    if dx == 1:
                        xs = xs.at[:, :, -1:].set(0)
                    elif dx == -1:
                        xs = xs.at[:, :, :1].set(0)
                    out = out + jnp.dot(xs, w[dy + 1, dx + 1].astype(
                        jnp.bfloat16))
            return LayerNorm2d(256, dtype=jnp.bfloat16)(out)

    for name, mod in (("neck conv", NeckConv()), ("neck 9shift", NeckShift())):
        p = jax.jit(mod.init)(jax.random.key(1), x)

        def f(c, mod=mod, p=p):
            y = mod.apply(p, x + (c * 0).astype(x.dtype))
            return c + jnp.sum(y.astype(jnp.float32))

        print(f"{name}: {timed_loop(f) * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
