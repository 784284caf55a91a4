"""Per-stage device-loop timing of the decode step at bench shapes.

Stages of ``Lam.__call__`` on the precomputed-embeddings path
(neck -> prompt encoder -> mask decoder -> postprocess), each timed in its
own jitted fori_loop with a chained carry and one scalar fetch per rep.
Run on the real chip.
"""
import jax
import jax.numpy as jnp

from labelanything_tpu.data.synthetic import random_batch
from labelanything_tpu.models.build_lam import build_lam_no_vit
from labelanything_tpu.typing import BatchKeys, ResultDict

from _slope_timing import timed_loop


def main():
    model = build_lam_no_vit(
        image_embed_dim=768, embed_dim=256, image_size=480,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 100},
        dtype=jnp.bfloat16,
    )
    batch = jax.tree.map(jnp.asarray, random_batch(
        batch_size=16, num_examples=1, num_classes=6, image_size=480,
        embed_dim=768,
    ))
    params = jax.jit(model.init)(jax.random.key(0), batch)

    def m_embeds(mdl, b):
        return mdl.prepare_query_example_embeddings(b)

    def m_pe(mdl, b, prompt_embeddings):
        points, boxes, masks, flag_examples = mdl.prepare_prompts(b)
        return mdl.prompt_encoder(
            image_embeddings=prompt_embeddings, points=points, boxes=boxes,
            masks=masks, flag_examples=flag_examples)

    def m_embed_points_masks(mdl, b):
        points, boxes, masks, _ = mdl.prepare_prompts(b)
        return mdl.prompt_encoder.embed_points_masks(points, boxes, masks)

    def m_decoder(mdl, b, query_embeddings, pe_result):
        return mdl.mask_decoder(
            query_embeddings=query_embeddings, support_embeddings=None,
            image_pe=mdl.get_dense_pe(), pe_result=pe_result,
            flag_examples=pe_result[BatchKeys.FLAG_EXAMPLES])

    def m_post(mdl, b, seg):
        return mdl.postprocess_masks_fixed(seg, b[BatchKeys.DIMS])

    # materialize stage inputs once
    q, pr = jax.jit(lambda p, b: model.apply(p, b, method=m_embeds))(params, batch)
    pe_result = jax.jit(lambda p, b, e: model.apply(p, b, e, method=m_pe))(
        params, batch, pr)
    seg = jax.jit(lambda p, b, qq, r: model.apply(p, b, qq, r, method=m_decoder))(
        params, batch, q, pe_result)

    def full(c, p, b):
        bb = dict(b)
        emb = bb[BatchKeys.EMBEDDINGS]
        bb[BatchKeys.EMBEDDINGS] = emb + c.astype(emb.dtype) * 0
        out = model.apply(p, bb)
        lg = out[ResultDict.LOGITS]
        return c + jnp.sum(jnp.where(jnp.isfinite(lg), lg, 0.0))

    def s_embeds(c, p, b):
        bb = dict(b)
        emb = bb[BatchKeys.EMBEDDINGS]
        bb[BatchKeys.EMBEDDINGS] = emb + c.astype(emb.dtype) * 0
        qq, prr = model.apply(p, bb, method=m_embeds)
        return c + jnp.sum(qq.astype(jnp.float32))

    def s_pe(c, p, b, e):
        out = model.apply(p, b, e + c.astype(e.dtype) * 0, method=m_pe)
        return c + jnp.sum(out[ResultDict.CLASS_EMBS].astype(jnp.float32))

    def s_epm(c, p, b):
        sp, dn = model.apply(p, b, method=m_embed_points_masks)
        return c + jnp.sum(sp.astype(jnp.float32)) + c * jnp.sum(
            dn.astype(jnp.float32)) * 0

    def s_dec(c, p, b, qq, r):
        seg = model.apply(p, b, qq + c.astype(qq.dtype) * 0, r,
                          method=m_decoder)
        return c + jnp.sum(seg.astype(jnp.float32))

    def s_post(c, p, b, sg):
        out = model.apply(p, b, sg + c.astype(sg.dtype) * 0, method=m_post)
        return c + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    t_full = timed_loop(full, params, batch)
    t_emb = timed_loop(s_embeds, params, batch)
    t_pe = timed_loop(s_pe, params, batch, pr)
    t_epm = timed_loop(s_epm, params, batch)
    t_dec = timed_loop(s_dec, params, batch, q, pe_result)
    t_post = timed_loop(s_post, params, batch, seg)
    print(f"full step:            {t_full*1e3:7.3f} ms")
    print(f"neck/embeds:          {t_emb*1e3:7.3f} ms")
    print(f"prompt encoder:       {t_pe*1e3:7.3f} ms")
    print(f"  embed_points_masks: {t_epm*1e3:7.3f} ms")
    print(f"mask decoder:         {t_dec*1e3:7.3f} ms")
    print(f"postprocess:          {t_post*1e3:7.3f} ms")
    print(f"stage sum:            {(t_emb+t_pe+t_dec+t_post)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
