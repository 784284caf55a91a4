"""LAM model factory (reference: label_anything/models/build_lam.py:96-300).

Builders return un-initialized flax modules; parameter initialization /
checkpoint loading is handled by :mod:`labelanything_tpu.api` so that the
factory stays a pure description of architecture.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .build_encoder import ENCODERS, build_vit_b, build_vit_b_mae, build_vit_b_imagenet_i21k, build_vit_dino_b8, build_vit_h, build_vit_l
from .common import SAM_EMBED_DIM
from .lam import BinaryLam, Lam, Neck
from .mask_decoder import MaskDecoderLam
from .affinity_decoder import AffinityDecoder
from .prompt_encoder import (
    IdentityClassEncoder,
    PromptImageEncoder,
    PromptImagePoolEncoder,
    RandomMatrixEncoder,
)
from .transformer import (
    AffinityTransformer,
    IdentityTransformer,
    OneWayTransformer,
    TwoWayTransformer,
)

_CLASS_ENCODERS = {
    "RandomMatrixEncoder": RandomMatrixEncoder,
}

_DTYPE_ALIASES = {"bf16": "bfloat16", "fp32": "float32", "fp16": "float16",
                  "half": "bfloat16", "float": "float32"}


def norm_dtype(dtype):
    """Accept YAML-friendly dtype strings (the config schema's
    ``model.dtype: bfloat16`` mixed-precision policy — compute in ``dtype``,
    flax params stay fp32). Reference counterpart: Accelerate's precision
    flag (reference: experiment/run.py:122-131)."""
    if dtype is None or not isinstance(dtype, str):
        return dtype
    return jnp.dtype(_DTYPE_ALIASES.get(dtype.lower(), dtype.lower()))

_FUSION_TRANSFORMERS = {
    "TwoWayTransformer": TwoWayTransformer,
    "OneWayTransformer": OneWayTransformer,
    "IdentityTransformer": IdentityTransformer,
}


def build_mask_decoder(
    embed_dim,
    decoder_attention_downsample_rate,
    few_type="Prototype",
    fusion_transformer="TwoWayTransformer",
    segment_example_logits=False,
    spatial_convs=None,
    classification_layer_downsample_rate=8,
    conv_upsample_stride=2,
    transformer_feature_size=None,
    dropout=0.0,
    class_fusion="sum",
    classification_levels=1,
    conv_classification=False,
    transformer_keys_are_images=True,
    apply_masks=False,
    dtype=jnp.float32,
):
    """(reference: build_lam.py:238-298)."""
    if few_type == "Prototype":
        transformer = _FUSION_TRANSFORMERS[fusion_transformer](
            depth=2,
            embedding_dim=embed_dim,
            mlp_dim=2048,
            num_heads=8,
            attention_downsample_rate=decoder_attention_downsample_rate,
            dropout=dropout,
            apply_masks=apply_masks,
            dtype=dtype,
        ) if fusion_transformer != "IdentityTransformer" else IdentityTransformer()
        return MaskDecoderLam(
            transformer_dim=embed_dim,
            spatial_convs=spatial_convs,
            transformer=transformer,
            segment_example_logits=segment_example_logits,
            classification_layer_downsample_rate=classification_layer_downsample_rate,
            conv_upsample_stride=conv_upsample_stride,
            classification_levels=classification_levels,
            dropout=dropout,
            conv_classification=conv_classification,
            dtype=dtype,
        )
    if few_type in ("Affinity", "PrototypeAffinity"):
        transformer = AffinityTransformer(
            depth=2,
            embedding_dim=embed_dim,
            mlp_dim=2048,
            num_heads=8,
            attention_downsample_rate=decoder_attention_downsample_rate,
            dropout=dropout,
            apply_masks=apply_masks,
            dtype=dtype,
        )
        return AffinityDecoder(
            transformer_dim=embed_dim,
            spatial_convs=spatial_convs,
            transformer=transformer,
            classification_layer_downsample_rate=classification_layer_downsample_rate,
            transformer_feature_size=transformer_feature_size,
            class_fusion=class_fusion,
            prototype_merge=few_type == "PrototypeAffinity",
            transformer_keys_are_images=transformer_keys_are_images,
            dtype=dtype,
        )
    raise NotImplementedError(f"few_type {few_type} not implemented")


def _build_lam(
    build_vit=None,
    checkpoint=None,
    use_sam_checkpoint=False,
    use_vit_sam_neck=True,
    ignore_encoder_checkpoint=False,
    use_vit=True,
    image_embed_dim=SAM_EMBED_DIM,
    embed_dim=SAM_EMBED_DIM,
    image_size=1024,
    vit_patch_size=16,
    class_attention=False,
    example_attention=False,
    example_class_attention=True,
    class_embedding_dim=None,
    spatial_convs=None,
    encoder_attention_downsample_rate: int = 2,
    decoder_attention_downsample_rate: int = 2,
    classification_layer_downsample_rate: int = 8,
    conv_classification=False,
    use_support_features_in_prompt_encoder: bool = True,
    fusion_transformer="TwoWayTransformer",
    classification_levels=1,
    few_type="Prototype",
    class_fusion="sum",
    prompt_encoder=None,  # None or "TokenPool"
    transformer_keys_are_images=True,
    transformer_feature_size=None,
    class_encoder=None,
    segment_example_logits=False,
    embeddings_per_example=None,
    embedding_extraction=None,
    dropout: float = 0.0,
    binary=False,
    custom_preprocess=True,
    is_pyramids=False,
    intermediate_channel_sizes=None,
    apply_masks=False,
    dtype=jnp.float32,
    encoder_dtype=None,
    remat_encoder=False,
) -> Lam:
    """Architecture factory (reference: build_lam.py:96-235)."""
    dtype = norm_dtype(dtype)
    encoder_dtype = norm_dtype(encoder_dtype)
    image_embedding_size = image_size // vit_patch_size

    vit = None
    if use_vit and build_vit is not None:
        vit = build_vit(
            project_last_hidden=use_vit_sam_neck,
            dtype=encoder_dtype or dtype,
            remat=remat_encoder,
        ) if build_vit in (build_vit_b, build_vit_l, build_vit_h) else build_vit(
            project_last_hidden=use_vit_sam_neck, dtype=encoder_dtype or dtype
        )

    if class_encoder is not None:
        params = {k: v for k, v in class_encoder.items() if k != "name"}
        params.setdefault("embed_dim", embed_dim)
        class_encoder_mod = _CLASS_ENCODERS[class_encoder["name"]](**params)
    else:
        class_encoder_mod = IdentityClassEncoder()

    if segment_example_logits and embeddings_per_example is None:
        embeddings_per_example = 1
    if embeddings_per_example and not segment_example_logits:
        segment_example_logits = True

    if is_pyramids:
        # pyramid-cache path: embeddings arrive as {"stageN": ...} dicts and
        # fuse to one map at the finest stride (reference: build_lam.py:172-178)
        from .pyramids import PyramidLamNeck

        neck = PyramidLamNeck(
            intermediate_channel_sizes=tuple(intermediate_channel_sizes),
            d_model=embed_dim, dtype=dtype)
    else:
        neck = None if image_embed_dim == embed_dim else Neck(embed_dim,
                                                              dtype=dtype)

    pe_cls = PromptImagePoolEncoder if prompt_encoder == "TokenPool" else PromptImageEncoder
    prompt_encoder_mod = pe_cls(
        embed_dim=embed_dim,
        image_embedding_size=(image_embedding_size, image_embedding_size),
        input_image_size=(image_size, image_size),
        mask_in_chans=16,
        class_attention=class_attention,
        example_attention=example_attention,
        example_class_attention=example_class_attention,
        class_embedding_dim=class_embedding_dim,
        dropout=dropout,
        use_support_features=use_support_features_in_prompt_encoder,
        transformer=TwoWayTransformer(
            depth=2,
            embedding_dim=embed_dim,
            mlp_dim=2048,
            attention_downsample_rate=encoder_attention_downsample_rate,
            num_heads=8,
            dropout=dropout,
            apply_masks=apply_masks,
            dtype=dtype,
        ),
        class_encoder=class_encoder_mod,
        embeddings_per_example=embeddings_per_example or 1,
        embedding_extraction=embedding_extraction,
        apply_masks=apply_masks,
        dtype=dtype,
    )

    mask_decoder = build_mask_decoder(
        embed_dim=embed_dim,
        spatial_convs=spatial_convs,
        segment_example_logits=segment_example_logits,
        fusion_transformer=fusion_transformer,
        decoder_attention_downsample_rate=decoder_attention_downsample_rate,
        classification_layer_downsample_rate=classification_layer_downsample_rate,
        transformer_feature_size=transformer_feature_size,
        dropout=dropout,
        few_type=few_type,
        class_fusion=class_fusion,
        classification_levels=classification_levels,
        conv_classification=conv_classification,
        transformer_keys_are_images=transformer_keys_are_images,
        apply_masks=apply_masks,
        dtype=dtype,
    )

    lam_cls = BinaryLam if binary else Lam
    return lam_cls(
        image_size=image_size,
        image_encoder=vit,
        neck=neck,
        prompt_encoder=prompt_encoder_mod,
        mask_decoder=mask_decoder,
        custom_preprocess=custom_preprocess,
    )


build_lam = _build_lam


def build_lam_vit_b(**kwargs):
    return _build_lam(build_vit_b, **kwargs)


def build_lam_vit_l(**kwargs):
    return _build_lam(build_vit_l, **kwargs)


def build_lam_vit_h(**kwargs):
    return _build_lam(build_vit_h, **kwargs)


def build_lam_vit_mae_b(**kwargs):
    return _build_lam(build_vit_b_mae, **kwargs)


def build_lam_vit_b_imagenet_i21k(**kwargs):
    return _build_lam(build_vit_b_imagenet_i21k, **kwargs)


def build_lam_dino_b8(**kwargs):
    return _build_lam(build_vit_dino_b8, **kwargs)


def build_lam_no_vit(**kwargs):
    return _build_lam(build_vit=None, use_vit=False, **kwargs)


def build_multilevel_lam(
    embed_dims=(256, 512, 1024),
    image_size=384,
    class_attention=False,
    example_attention=False,
    example_class_attention=True,
    encoder_attention_downsample_rate: int = 2,
    decoder_attention_downsample_rate: int = 2,
    classification_layer_downsample_rate: int = 8,
    class_encoder=None,
    segment_example_logits=False,
    dropout: float = 0.0,
    apply_masks=False,
    dtype=jnp.float32,
    vit_patch_sizes=(8, 16, 32),
    encoder=None,
    **kwargs,
):
    """Multi-scale variant (reference: build_lam.py:303-399). Consumes
    precomputed pyramid embeddings {'stageN': (B, N, H, W, C)} or, when
    ``encoder`` names a pyramid backbone ({"name": "resnet50"|"swin_b"}),
    raw images run through it (reference: build_encoder.py:118-152).
    Per-level encoders/decoders sized by ``embed_dims``."""
    from .multilevel import (MultiLevelLam, MultiLevelMaskDecoder,
                             MultiLevelPromptEncoder)

    dtype = norm_dtype(dtype)
    image_encoder = None
    if encoder is not None:
        from .pyramid_encoders import (RESNET50_STAGE_DIMS, SWIN_B_STAGE_DIMS,
                                       build_resnet50, build_swin_b)

        enc_cfg = dict(encoder) if isinstance(encoder, dict) else {"name": encoder}
        enc_name = enc_cfg.pop("name")
        out_features = tuple(enc_cfg.get("out_features",
                                         ("stage2", "stage3", "stage4")))
        if enc_name == "resnet50":
            image_encoder = build_resnet50(**enc_cfg)
            embed_dims = tuple(RESNET50_STAGE_DIMS[s] for s in out_features)
        elif enc_name == "swin_b":
            enc_cfg.setdefault("image_size", image_size)
            image_encoder = build_swin_b(**enc_cfg)
            embed_dims = tuple(SWIN_B_STAGE_DIMS[s] for s in out_features)
        elif enc_name == "mit_b0" or "segformer-b0" in enc_name:
            # the reference resolves HF names via AutoModel and sizes levels
            # from config.hidden_sizes (reference: build_encoder.py:137-140,
            # build_lam.py:326-330) — all four MiT stages
            from .segformer import MIT_B0_STAGE_DIMS, MIT_STAGE_STRIDES, \
                build_mit_b0

            out_features = tuple(enc_cfg.get(
                "out_features", ("stage1", "stage2", "stage3", "stage4")))
            enc_cfg["out_features"] = out_features
            image_encoder = build_mit_b0(**enc_cfg)
            embed_dims = tuple(MIT_B0_STAGE_DIMS[s] for s in out_features)
            vit_patch_sizes = tuple(MIT_STAGE_STRIDES[s] for s in out_features)
        else:
            raise ValueError(f"unknown pyramid encoder {enc_name!r}")
        if enc_name != "mit_b0" and "segformer-b0" not in enc_name:
            # resnet/swin stage strides 8/16/32 regardless of backbone family
            vit_patch_sizes = (8, 16, 32)[: len(out_features)]

    encoders = []
    decoders = []
    for dim, patch in zip(embed_dims, vit_patch_sizes):
        grid = image_size // patch
        if class_encoder is not None:
            params = {k: v for k, v in class_encoder.items() if k != "name"}
            params["embed_dim"] = dim
            ce = _CLASS_ENCODERS[class_encoder["name"]](**params)
        else:
            ce = IdentityClassEncoder()
        encoders.append(PromptImageEncoder(
            embed_dim=dim,
            image_embedding_size=(grid, grid),
            input_image_size=(image_size, image_size),
            mask_in_chans=16,
            class_attention=class_attention,
            example_attention=example_attention,
            example_class_attention=example_class_attention,
            dropout=dropout,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=dim, mlp_dim=2048,
                attention_downsample_rate=encoder_attention_downsample_rate,
                num_heads=8, dropout=dropout, apply_masks=apply_masks,
                dtype=dtype),
            class_encoder=ce,
            apply_masks=apply_masks,
            dtype=dtype,
        ))
        decoders.append(MaskDecoderLam(
            transformer_dim=dim,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=dim, mlp_dim=2048,
                attention_downsample_rate=decoder_attention_downsample_rate,
                num_heads=8, dropout=dropout, apply_masks=apply_masks,
                dtype=dtype),
            segment_example_logits=segment_example_logits,
            classification_layer_downsample_rate=classification_layer_downsample_rate,
            dropout=dropout,
            dtype=dtype,
        ))
    return MultiLevelLam(
        image_encoder=image_encoder,
        neck=None,
        prompt_encoder=MultiLevelPromptEncoder(prompt_encoders=tuple(encoders)),
        mask_decoder=MultiLevelMaskDecoder(
            mask_decoders=tuple(decoders), embed_dims=tuple(embed_dims),
            segment_example_logits=segment_example_logits, dtype=dtype),
        image_size=image_size,
    )
