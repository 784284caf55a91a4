"""Image-encoder builders (reference: label_anything/models/build_encoder.py).

SAM ViTDet variants use :class:`ImageEncoderViT`; HF-pretrained plain ViTs
(MAE / ImageNet-21k / DINO) use the native :class:`StandardViT`, whose weights
are name-mapped from the published HF checkpoints by
:mod:`labelanything_tpu.utils.torch_import`.
"""

from __future__ import annotations

from .image_encoder import ImageEncoderViT
from .vit import StandardViT

vit_configs = dict(
    vit_h=dict(embed_dim=1280, depth=32, num_heads=16,
               global_attn_indexes=(7, 15, 23, 31)),
    vit_l=dict(embed_dim=1024, depth=24, num_heads=16,
               global_attn_indexes=(5, 11, 17, 23)),
    vit_b=dict(embed_dim=768, depth=12, num_heads=12,
               global_attn_indexes=(2, 5, 8, 11)),
)

SAM_IMAGE_SIZE = 1024
SAM_PATCH_SIZE = 16
PROMPT_EMBED_DIM = 256


def _build_vit(config_name: str, project_last_hidden: bool = True,
               image_size: int = SAM_IMAGE_SIZE, dtype=None, remat: bool = False,
               tp_mesh=None, **kwargs) -> ImageEncoderViT:
    cfg = vit_configs[config_name]
    extra = {} if dtype is None else {"dtype": dtype}
    if tp_mesh is not None:
        extra["tp_mesh"] = tp_mesh
    return ImageEncoderViT(
        img_size=image_size,
        patch_size=SAM_PATCH_SIZE,
        embed_dim=cfg["embed_dim"],
        depth=cfg["depth"],
        num_heads=cfg["num_heads"],
        mlp_ratio=4,
        out_chans=PROMPT_EMBED_DIM,
        qkv_bias=True,
        use_rel_pos=True,
        window_size=14,
        global_attn_indexes=cfg["global_attn_indexes"],
        project_last_hidden=project_last_hidden,
        remat=remat,
        **extra,
    )


def build_vit_h(**kwargs):
    return _build_vit("vit_h", **kwargs)


def build_vit_l(**kwargs):
    return _build_vit("vit_l", **kwargs)


def build_vit_b(**kwargs):
    return _build_vit("vit_b", **kwargs)


def build_vit_b_mae(project_last_hidden: bool = False, **kwargs):
    """facebook/vit-mae-base equivalent (reference: build_encoder.py:103-106)."""
    return StandardViT(patch_size=16, embed_dim=768, depth=12, num_heads=12, **kwargs)


def build_vit_b_imagenet_i21k(project_last_hidden: bool = False, **kwargs):
    """google/vit-base-patch16-224-in21k equivalent."""
    return StandardViT(patch_size=16, embed_dim=768, depth=12, num_heads=12, **kwargs)


def build_vit_dino_b8(project_last_hidden: bool = False, **kwargs):
    """facebook/dino-vitb8 equivalent (patch size 8)."""
    return StandardViT(patch_size=8, embed_dim=768, depth=12, num_heads=12,
                       pretrain_grid=28, **kwargs)


def _build_resnet50(**kwargs):
    from .pyramid_encoders import build_resnet50

    return build_resnet50(**kwargs)


def _build_swin_b(**kwargs):
    from .pyramid_encoders import build_swin_b

    return build_swin_b(**kwargs)


def _build_mit_b0(**kwargs):
    from .segformer import build_mit_b0

    return build_mit_b0(**kwargs)


ENCODERS = {
    "vit_h": build_vit_h,
    "vit_l": build_vit_l,
    "vit_b": build_vit_b,
    "vit_b_mae": build_vit_b_mae,
    "vit_b_imagenet_i21k": build_vit_b_imagenet_i21k,
    "vit_dino_b8": build_vit_dino_b8,
    # pyramid backbones (reference: build_encoder.py:118-152)
    "resnet50": _build_resnet50,
    "swin_b": _build_swin_b,
    # HF AutoModel fallback equivalent (reference: build_encoder.py:137-140)
    "mit_b0": _build_mit_b0,
    "nvidia/segformer-b0-finetuned-ade-512-512": _build_mit_b0,
}


def build_encoder(params):
    name = params["name"] if isinstance(params, dict) else params
    kwargs = {k: v for k, v in params.items() if k != "name"} if isinstance(params, dict) else {}
    if name in ENCODERS:
        return ENCODERS[name](**kwargs)
    raise ValueError(f"Unknown encoder {name!r}; available: {sorted(ENCODERS)}")
