"""Bit-compatible import of reference PyTorch checkpoints into flax pytrees.

Maps the reference LabelAnything state-dict names (reference:
label_anything/models/*) onto this framework's parameter tree and transposes
tensors between torch and flax layout conventions:

  * Linear:            (O, I)        -> kernel (I, O)
  * Conv2d:            (O, I, kh, kw)-> kernel (kh, kw, I, O)
  * ConvTranspose2d:   (I, O, kh, kw)-> kernel (kh, kw, O, I)
                       (our ConvTranspose modules use transpose_kernel=True)
  * LayerNorm:         weight -> scale
  * LayerNorm2d:       weight -> weight (custom module, same layout)
  * nn.Embedding rows and buffers: copied as-is

Works on NumPy arrays so no torch import is required when reading
``.safetensors`` checkpoints; ``.pth``/``.bin`` loading uses torch-cpu.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# modules whose `weight` is a LayerNorm2d weight (kept as 'weight', no rename)
_LN2D_NAMES = {
    "ln1", "ln2", "mask_down_ln1", "mask_down_ln2", "up_ln",
    "neck_ln1", "neck_ln2", "up_ln0", "up_ln1", "up_ln2",
}
_LN2D_PREFIXES = ("spatial_ln_",)

# direct-copy parameter leaves (embeddings rows / buffers / tables)
_DIRECT_LEAVES = {
    "not_a_point_embed", "no_mask_embed", "not_a_mask_embed",
    "no_sparse_embedding", "pos_embedding", "positional_encoding_gaussian_matrix",
    "rel_pos_h", "rel_pos_w", "pos_embed", "cls_token", "embeddings",
}

_RENAMES: List[Tuple[str, str]] = [
    # neck (reference: build_lam.py:150-171)
    (r"^neck\.0\.", "neck.conv1."),
    (r"^neck\.1\.", "neck.ln1."),
    (r"^neck\.2\.", "neck.conv2."),
    (r"^neck\.3\.", "neck.ln2."),
    # prompt encoder mask downscaling (reference: prompt_encoder.py:61-69)
    (r"(^|\.)mask_downscaling\.0\.", r"\1mask_down_conv1."),
    (r"(^|\.)mask_downscaling\.1\.", r"\1mask_down_ln1."),
    (r"(^|\.)mask_downscaling\.3\.", r"\1mask_down_conv2."),
    (r"(^|\.)mask_downscaling\.4\.", r"\1mask_down_ln2."),
    (r"(^|\.)mask_downscaling\.6\.", r"\1mask_down_conv3."),
    # prompt-encoder merge blocks (attribute renames in this framework)
    (r"(^|\.)class_attention\.", r"\1class_attention_block."),
    (r"(^|\.)example_attention\.", r"\1example_attention_block."),
    (r"(^|\.)class_example_attention\.", r"\1class_example_attention_block."),
    # mask decoder upscaling (reference: mask_decoder.py:206-221)
    (r"(^|\.)output_upscaling\.0\.", r"\1up_conv1."),
    (r"(^|\.)output_upscaling\.1\.", r"\1up_ln."),
    (r"(^|\.)output_upscaling\.3\.", r"\1up_conv2."),
    # spatial convs: conv at 3i, LN at 3i+1 (reference: mask_decoder.py:236-253)
    (r"(^|\.)spatial_convs\.0\.", r"\1spatial_conv_0."),
    (r"(^|\.)spatial_convs\.1\.", r"\1spatial_ln_0."),
    (r"(^|\.)spatial_convs\.3\.", r"\1spatial_conv_1."),
    (r"(^|\.)spatial_convs\.4\.", r"\1spatial_ln_1."),
    (r"(^|\.)spatial_convs\.6\.", r"\1spatial_conv_2."),
    (r"(^|\.)spatial_convs\.7\.", r"\1spatial_ln_2."),
    (r"(^|\.)prototype_tconv\.(\d+)\.", r"\1prototype_tconv_\2."),
    # SAM ViT (reference: image_encoder.py)
    (r"(^|\.)patch_embed\.proj\.", r"\1patch_embed."),
    (r"\.neck\.0\.", ".neck_conv1."),
    (r"\.neck\.1\.", ".neck_ln1."),
    (r"\.neck\.2\.", ".neck_conv2."),
    (r"\.neck\.3\.", ".neck_ln2."),
    # indexed module lists -> flax name pattern
    (r"(^|\.)layers\.(\d+)\.", r"\1layers_\2."),
    (r"(^|\.)blocks\.(\d+)\.", r"\1blocks_\2."),
]


def _apply_renames(key: str, renames: List[Tuple[str, str]]) -> str:
    for pat, rep in renames:
        key = re.sub(pat, rep, key)
    return key


def _rename(key: str) -> str:
    return _apply_renames(key, _RENAMES)


def _is_ln2d(parts: List[str]) -> bool:
    mod = parts[-2] if len(parts) >= 2 else ""
    return mod in _LN2D_NAMES or any(mod.startswith(p) for p in _LN2D_PREFIXES)


def _is_conv_transpose(parts: List[str]) -> bool:
    mod = parts[-2] if len(parts) >= 2 else ""
    return mod.startswith(("up_conv", "prototype_tconv"))


_ENCODER_RENAMES: List[Tuple[str, str]] = [
    # standalone ImageEncoderViT state dict (no "image_encoder." prefix)
    (r"^neck\.0\.", "neck_conv1."),
    (r"^neck\.1\.", "neck_ln1."),
    (r"^neck\.2\.", "neck_conv2."),
    (r"^neck\.3\.", "neck_ln2."),
]


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       kind: str = "lam") -> Dict[str, Any]:
    """Convert a reference torch state dict (numpy values) to a flax
    ``{'params': ...}`` tree fragment keyed by this framework's module names.

    ``kind``: "lam" for full-model state dicts, "sam_encoder" for a
    standalone ImageEncoderViT state dict (different top-level neck naming).
    """
    if kind == "sam_encoder":
        state_dict = {
            _apply_renames(k, _ENCODER_RENAMES): v for k, v in state_dict.items()
        }
    tree: Dict[str, Any] = {}
    point_embeddings: Dict[str, List] = {}

    def insert(parts: List[str], value: np.ndarray):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        value = np.asarray(value)
        key = _rename(key)
        parts = key.split(".")

        # stacked point embeddings: point_embeddings.{i}.weight -> (4, D)
        m = re.search(r"point_embeddings\.(\d)\.weight$", key)
        if m:
            prefix = key[: key.index("point_embeddings")]
            point_embeddings.setdefault(prefix, [None] * 4)[int(m.group(1))] = value[0]
            continue

        if parts[-1] == "weight" and len(parts) >= 2 and parts[-2] in _DIRECT_LEAVES:
            # nn.Embedding row: "not_a_point_embed.weight" -> leaf param
            insert(parts[:-1], value)
            continue
        if parts[-1] in _DIRECT_LEAVES:
            insert(parts, value)
            continue

        if parts[-1] == "weight":
            if value.ndim == 4:
                # conv & convT share the same axes permutation given our
                # transpose_kernel=True convention
                insert(parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(parts[:-1] + ["kernel"], value.T)
            elif _is_ln2d(parts):
                insert(parts[:-1] + ["weight"], value)
            else:  # LayerNorm scale
                insert(parts[:-1] + ["scale"], value)
        elif parts[-1] == "bias":
            insert(parts, value)
        else:
            insert(parts, value)

    for prefix, rows in point_embeddings.items():
        assert all(r is not None for r in rows), "missing point embedding rows"
        parts = [p for p in prefix.split(".") if p] + ["point_embeddings"]
        insert(parts, np.stack(rows))

    return tree


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge_into_params(params: Dict[str, Any], converted: Dict[str, Any],
                      strict: bool = True) -> Dict[str, Any]:
    """Place converted leaves into an initialized flax params tree
    (``{'params': {...}}``), verifying full coverage and shape agreement."""
    import jax

    target = _flatten(params["params"])
    source = _flatten(converted)
    missing = set(target) - set(source)
    unexpected = set(source) - set(target)
    fmt = lambda s: sorted("/".join(p) for p in s)[:12]
    # Unexpected source keys are normal: flax materializes parameters only
    # for modules the traced config actually calls, while torch state dicts
    # always carry every registered module. Missing targets are an error
    # unless strict=False, which keeps the initialized values for them
    # (partial loads, e.g. an encoder-only checkpoint into a full model).
    if missing and strict:
        raise ValueError(f"state dict missing parameters: {fmt(missing)}")
    if strict and unexpected:
        import warnings

        warnings.warn(f"unused checkpoint tensors: {fmt(unexpected)}")
    new = dict(target)
    for k, v in source.items():
        if k not in target:
            continue
        if tuple(target[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                             f"{target[k].shape} vs {v.shape}")
        new[k] = np.asarray(v, dtype=np.asarray(target[k]).dtype)

    def unflatten(flat):
        tree: Dict[str, Any] = {}
        for path, v in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = v
        return tree

    return {"params": unflatten(new)}


_DCAMA_RENAMES: List[Tuple[str, str]] = [
    # Swin backbone (reference: models/dcama/swin_transformer.py)
    (r"^feature_extractor\.patch_embed\.proj\.", "feature_extractor.patch_embed."),
    (r"^feature_extractor\.patch_embed\.norm\.", "feature_extractor.patch_norm."),
    (r"^feature_extractor\.layers\.(\d+)\.blocks\.(\d+)\.",
     r"feature_extractor.layers_\1_blocks_\2."),
    (r"^feature_extractor\.layers\.(\d+)\.downsample\.",
     r"feature_extractor.layers_\1_downsample."),
    (r"\.mlp\.fc1\.", ".mlp_fc1."),
    (r"\.mlp\.fc2\.", ".mlp_fc2."),
    # DCAMA head (reference: models/dcama/dcama.py:142-256)
    (r"^model\.DCAMA_blocks\.(\d+)\.linears\.0\.", r"model.dcama_block_\1.q."),
    (r"^model\.DCAMA_blocks\.(\d+)\.linears\.1\.", r"model.dcama_block_\1.k."),
    (r"^model\.conv(\d)\.0\.", r"model.conv\1_conv0."),
    (r"^model\.conv(\d)\.1\.", r"model.conv\1_gn0."),
    (r"^model\.conv(\d)\.3\.", r"model.conv\1_conv1."),
    (r"^model\.conv(\d)\.4\.", r"model.conv\1_gn1."),
    (r"^model\.conv(\d)\.6\.", r"model.conv\1_conv2."),
    (r"^model\.conv(\d)\.7\.", r"model.conv\1_gn2."),
    (r"^model\.mixer(\d)\.0\.", r"model.mixer\1_0."),
    (r"^model\.mixer(\d)\.2\.", r"model.mixer\1_1."),
]

_DCAMA_SKIP = ("attn_mask", "relative_position_index", "feature_extractor.norm.",
               "feature_extractor.head", "model.pe.")

_DCAMA_LN2D = ()  # DCAMA has no LayerNorm2d; GroupNorm weight -> scale


def convert_dcama_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference DCAMA (or bare Swin prefixed with
    ``feature_extractor.``) state dict into our flax params fragment."""
    tree: Dict[str, Any] = {}

    def insert(parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if any(s in key for s in _DCAMA_SKIP):
            continue
        value = np.asarray(value)
        key = _apply_renames(key, _DCAMA_RENAMES)
        parts = key.split(".")
        if parts[-1] == "relative_position_bias_table":
            insert(parts, value)
        elif parts[-1] == "weight":
            if value.ndim == 4:
                insert(parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(parts[:-1] + ["kernel"], value.T)
            else:  # LayerNorm / GroupNorm -> flax 'scale'
                insert(parts[:-1] + ["scale"], value)
        else:
            insert(parts, value)
    return tree


_FPTRANS_RENAMES: List[Tuple[str, str]] = [
    # FPTrans (reference: models/fptrans/FPTrans.py, vit.py). The trainable
    # encoder is wrapped in nn.Sequential(OrderedDict([('backbone', vit)])).
    (r"^encoder\.backbone\.", "encoder."),
    (r"(^|\.)patch_embed\.proj\.", r"\1patch_embed."),
    (r"(^|\.)blocks\.(\d+)\.", r"\1blocks_\2."),
    (r"(^|\.)purifier\.layers\.(\d+)\.", r"\1purifier.layers_\2."),
]

_FPTRANS_LEAVES = ("cls_token", "pos_embed", "prompt_tokens")


def convert_fptrans_state_dict(state_dict: Dict[str, np.ndarray],
                               prefix: str = "") -> Dict[str, Any]:
    """Convert a reference FPTrans checkpoint (timm-ViT encoder + frozen
    original_encoder + purifier + prompt bank) into our flax params fragment.
    ``prefix`` (e.g. "fptrans.") is prepended to target keys for the
    FPTransMultiClass wrapper's submodule scope."""
    tree: Dict[str, Any] = {}

    def insert(parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if "head." in key or ".pre_logits." in key:
            continue
        value = np.asarray(value)
        key = prefix + _apply_renames(key, _FPTRANS_RENAMES)
        parts = key.split(".")
        if parts[-1] in _FPTRANS_LEAVES:
            insert(parts, value)
        elif parts[-1] == "weight":
            if value.ndim == 4:
                # conv & convT share the permutation (transpose_kernel=True)
                insert(parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(parts[:-1] + ["kernel"], value.T)
            else:  # LayerNorm
                insert(parts[:-1] + ["scale"], value)
        else:
            insert(parts, value)
    return tree


_PPNET_RENAMES: List[Tuple[str, str]] = [
    # PPNet dilated ResNet-50 (reference: models/ppnet/ResNetBackbone.py)
    (r"^module\.", ""),
    (r"(^|\.)layer(\d)\.(\d+)\.", r"\1layer\2_\3."),
    (r"\.downsample\.0\.", ".downsample_conv."),
    (r"\.downsample\.1\.", ".downsample_bn."),
]

_PPNET_SKIP = ("num_batches_tracked", "aspp.", ".sem")


def convert_ppnet_state_dict(state_dict: Dict[str, np.ndarray],
                             prefix: str = "") -> Dict[str, Any]:
    """Convert a reference PPNet checkpoint (dilated ResNet-50 + BatchNorm
    running stats) into flax variable collections
    ``{"params": ..., "batch_stats": ...}``. ``prefix`` (e.g. "ppnet.")
    scopes target keys under the PPNetMultiClass wrapper."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if any(s in key for s in _PPNET_SKIP):
            continue
        value = np.asarray(value)
        key = prefix + _apply_renames(key, _PPNET_RENAMES)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "running_mean":
            insert(stats, parts[:-1] + ["mean"], value)
        elif leaf == "running_var":
            insert(stats, parts[:-1] + ["var"], value)
        elif leaf == "weight":
            if value.ndim == 4:
                insert(params, parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(params, parts[:-1] + ["kernel"], value.T)
            else:  # BatchNorm affine weight
                insert(params, parts[:-1] + ["scale"], value)
        else:
            insert(params, parts, value)
    return {"params": params, "batch_stats": stats}


def merge_into_variables(variables: Dict[str, Any],
                         converted: Dict[str, Any],
                         strict: bool = True) -> Dict[str, Any]:
    """merge_into_params across multiple flax collections (params,
    batch_stats, ...). ``converted`` maps collection name -> tree fragment."""
    out = dict(variables)
    for coll, frag in converted.items():
        if not frag:
            continue
        merged = merge_into_params({"params": variables[coll]}, frag,
                                   strict=strict)
        out[coll] = merged["params"]
    return out


_DENET_RENAMES: List[Tuple[str, str]] = [
    # DENet (reference: models/denet/ — head/denet.py, common.py)
    (r"^module\.", ""),
    (r"^estimator\.gam\.gate\.0\.", "denet#gam.gate_0."),
    (r"^estimator\.gam\.gate\.2\.", "denet#gam.gate_2."),
    (r"^estimator\.map\.linear\.", "denet#map.linear."),
    (r"^estimator\.weight$", "denet#weight"),
    (r"^embedding\.0\.", "denet#embedding_0."),
    (r"^deeplab_head\.aspp\.convs\.4\.1\.", "denet#deeplab_head.aspp.convs_4."),
    (r"^deeplab_head\.aspp\.convs\.(\d)\.0\.", r"denet#deeplab_head.aspp.convs_\1."),
    (r"^deeplab_head\.aspp\.project\.0\.", "denet#deeplab_head.aspp.project."),
    (r"^deeplab_head\.", "denet#deeplab_head."),
    (r"^backbone\.", "denet#backbone."),
    (r"(^|\.)layer(\d)\.(\d+)\.", r"\1layer\2_\3."),
    (r"\.downsample\.0\.", ".downsample_conv."),
    (r"\.downsample\.1\.", ".downsample_bn."),
]


def convert_denet_state_dict(state_dict: Dict[str, np.ndarray],
                             scope: str = "denet.") -> Dict[str, Any]:
    """Convert a reference DENet checkpoint into flax variable collections
    ``{"params": ..., "batch_stats": ...}``. ``scope`` replaces the marker
    prefix (default places everything under the DENetMultiClass wrapper's
    "denet" submodule; pass "" for a bare DENet module)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(value)
        key = _apply_renames(key, _DENET_RENAMES).replace("denet#", scope)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "running_mean":
            insert(stats, parts[:-1] + ["mean"], value)
        elif leaf == "running_var":
            insert(stats, parts[:-1] + ["var"], value)
        elif leaf == "weight" and len(parts) >= 2 and parts[-2] != "weight":
            if value.ndim == 4:
                insert(params, parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2 and not key.endswith(scope + "weight"):
                insert(params, parts[:-1] + ["kernel"], value.T)
            else:  # BatchNorm affine or the class weight bank leaf
                if value.ndim == 1:
                    insert(params, parts[:-1] + ["scale"], value)
                else:
                    insert(params, parts, value)
        else:
            insert(params, parts, value)
    return {"params": params, "batch_stats": stats}


_BAM_RENAMES: List[Tuple[str, str]] = [
    # BAM (reference: models/bam/ — BAM.py OneModel + PSPNet pieces)
    (r"^module\.", ""),
    (r"^layer0\.(\d)\.", r"bam#backbone.layer0_\1."),
    (r"^layer([1-4])\.(\d+)\.", r"bam#backbone.layer\1_\2."),
    (r"\.downsample\.0\.", ".downsample_conv."),
    (r"\.downsample\.1\.", ".downsample_bn."),
    (r"^learner_base\.0\.features\.(\d)\.1\.", r"bam#ppm.features_\1_conv."),
    (r"^learner_base\.0\.features\.(\d)\.2\.", r"bam#ppm.features_\1_bn."),
    (r"^learner_base\.1\.0\.", "bam#base_cls_0."),
    (r"^learner_base\.1\.1\.", "bam#base_cls_1."),
    (r"^learner_base\.1\.4\.", "bam#base_cls_4."),
    (r"^down_query\.0\.", "bam#down_query_0."),
    (r"^down_supp\.0\.", "bam#down_supp_0."),
    (r"^init_merge\.0\.", "bam#init_merge_0."),
    (r"^ASPP_meta\.layer6_(\d)\.0\.", r"bam#ASPP_meta.layer6_\1."),
    (r"^res1_meta\.0\.", "bam#res1_meta_0."),
    (r"^res2_meta\.(\d)\.", r"bam#res2_meta_\1."),
    (r"^cls_meta\.(\d)\.", r"bam#cls_meta_\1."),
    (r"^gram_merge\.", "bam#gram_merge."),
    (r"^cls_merge\.", "bam#cls_merge."),
    (r"^kshot_rw\.(\d)\.", r"bam#kshot_rw_\1."),
]


def convert_bam_state_dict(state_dict: Dict[str, np.ndarray],
                           scope: str = "bam.") -> Dict[str, Any]:
    """Convert a reference BAM checkpoint (incl. the PSPNet base learner and
    BatchNorm running stats) into flax variable collections. ``scope``
    replaces the marker prefix (default: the BAMMultiClass wrapper's "bam"
    submodule; pass "" for a bare BAM module)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if "num_batches_tracked" in key or key.startswith("criterion"):
            continue
        value = np.asarray(value)
        key = _apply_renames(key, _BAM_RENAMES).replace("bam#", scope)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "running_mean":
            insert(stats, parts[:-1] + ["mean"], value)
        elif leaf == "running_var":
            insert(stats, parts[:-1] + ["var"], value)
        elif leaf == "weight":
            if value.ndim == 4:
                insert(params, parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(params, parts[:-1] + ["kernel"], value.T)
            else:  # BatchNorm affine
                insert(params, parts[:-1] + ["scale"], value)
        else:
            insert(params, parts, value)
    return {"params": params, "batch_stats": stats}


_HDMNET_ENC = [
    # TransformerEncoderLayer internals (reference: hdmnet/transformer.py)
    (r"\.attn\.attn\.linear_([qkvo])\.", r".attn.linear_\1."),
    (r"\.attn\.sr\.", ".attn_sr."),
    (r"\.attn\.norm\.", ".attn_norm."),
    (r"\.ffn\.layers\.0\.", ".ffn.fc1."),
    (r"\.ffn\.layers\.1\.", ".ffn.pe_conv."),
    (r"\.ffn\.layers\.4\.", ".ffn.fc2."),
]

_HDMNET_RENAMES: List[Tuple[str, str]] = [
    # HDMNet (reference: models/hdmnet/ — HDMNet.py + transformer.py)
    (r"^module\.", ""),
    (r"^layer0\.(\d)\.", r"hdm#backbone.layer0_\1."),
    (r"^layer([1-4])\.(\d+)\.", r"hdm#backbone.layer\1_\2."),
    (r"\.downsample\.0\.", ".downsample_conv."),
    (r"\.downsample\.1\.", ".downsample_bn."),
    (r"^ppm\.features\.(\d)\.1\.", r"hdm#ppm.features_\1_conv."),
    (r"^ppm\.features\.(\d)\.2\.", r"hdm#ppm.features_\1_bn."),
    (r"^cls\.0\.", "hdm#cls_0."),
    (r"^cls\.1\.", "hdm#cls_1."),
    (r"^base_learnear\.2\.", "hdm#base_learnear_2."),
    (r"^down_supp\.0\.", "hdm#down_supp_0."),
    (r"^down_query\.0\.", "hdm#down_query_0."),
    (r"^query_merge\.0\.", "hdm#query_merge_0."),
    (r"^supp_merge\.0\.", "hdm#supp_merge_0."),
    (r"^gram_merge\.", "hdm#gram_merge."),
    (r"^cls_merge\.", "hdm#cls_merge."),
    (r"^kshot_rw\.(\d)\.", r"hdm#kshot_rw_\1."),
    (r"^transformer\.mix_transformer\.down_sample_layers\.(\d)\.0\.projection\.",
     r"hdm#transformer.down_\1_patch_proj."),
    (r"^transformer\.mix_transformer\.down_sample_layers\.(\d)\.0\.norm\.",
     r"hdm#transformer.down_\1_patch_norm."),
    (r"^transformer\.mix_transformer\.down_sample_layers\.(\d)\.([12])(?=\.)",
     lambda m: f"hdm#transformer.down_{m.group(1)}_enc{int(m.group(2)) - 1}"),
    (r"^transformer\.mix_transformer\.down_sample_layers\.(\d)\.3\.",
     r"hdm#transformer.down_\1_norm."),
    (r"^transformer\.mix_transformer\.match_layers\.(\d)\.0(?=\.)",
     r"hdm#transformer.match_\1_enc"),
    (r"^transformer\.mix_transformer\.match_layers\.(\d)\.1\.conv\.",
     r"hdm#transformer.match_\1_conv."),
    (r"^transformer\.mix_transformer\.match_layers\.(\d)\.1\.bn\.",
     r"hdm#transformer.match_\1_bn."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.0\.",
     r"hdm#transformer.parse_\1_conv0."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.1\.",
     r"hdm#transformer.parse_\1_bn0."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.2\.",
     r"hdm#transformer.parse_\1_conv1."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.3\.",
     r"hdm#transformer.parse_\1_bn1."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.4\.",
     r"hdm#transformer.parse_\1_conv2."),
    (r"^transformer\.mix_transformer\.parse_layers\.(\d)\.5\.",
     r"hdm#transformer.parse_\1_bn2."),
    (r"^transformer\.mix_transformer\.cls\.0\.", "hdm#transformer.cls_conv0."),
    (r"^transformer\.mix_transformer\.cls\.1\.", "hdm#transformer.cls_bn0."),
    (r"^transformer\.mix_transformer\.cls\.2\.", "hdm#transformer.cls_conv1."),
    (r"^transformer\.mix_transformer\.cls\.3\.", "hdm#transformer.cls_bn1."),
    (r"^transformer\.mix_transformer\.cls\.4\.", "hdm#transformer.cls_conv2."),
] + _HDMNET_ENC


def convert_hdmnet_state_dict(state_dict: Dict[str, np.ndarray],
                              scope: str = "hdmnet.") -> Dict[str, Any]:
    """Convert a reference HDMNet checkpoint into flax variable collections
    ``{"params": ..., "batch_stats": ...}``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        if "num_batches_tracked" in key or key.startswith("criterion"):
            continue
        value = np.asarray(value)
        key = _apply_renames(key, _HDMNET_RENAMES).replace("hdm#", scope)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "running_mean":
            insert(stats, parts[:-1] + ["mean"], value)
        elif leaf == "running_var":
            insert(stats, parts[:-1] + ["var"], value)
        elif leaf == "weight":
            if value.ndim == 4:
                insert(params, parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(params, parts[:-1] + ["kernel"], value.T)
            elif _is_hdmnet_ln(parts):
                insert(params, parts[:-1] + ["scale"], value)
            else:  # BatchNorm affine (also 1-D) — same flax leaf name
                insert(params, parts[:-1] + ["scale"], value)
        else:
            insert(params, parts, value)
    return {"params": params, "batch_stats": stats}


def _is_hdmnet_ln(parts: List[str]) -> bool:
    mod = parts[-2] if len(parts) >= 2 else ""
    return "norm" in mod


_HF_VIT_RENAMES: List[Tuple[str, str]] = [
    # HuggingFace ViTModel (MAE / in21k / DINO) -> StandardViT
    (r"^vit\.", ""),
    (r"^embeddings\.cls_token$", "cls_token"),
    (r"^embeddings\.position_embeddings$", "pos_embed"),
    (r"^embeddings\.patch_embeddings\.projection\.", "patch_embed."),
    (r"^encoder\.layer\.(\d+)\.attention\.attention\.query\.", r"blocks_\1.q."),
    (r"^encoder\.layer\.(\d+)\.attention\.attention\.key\.", r"blocks_\1.k."),
    (r"^encoder\.layer\.(\d+)\.attention\.attention\.value\.", r"blocks_\1.v."),
    (r"^encoder\.layer\.(\d+)\.attention\.output\.dense\.", r"blocks_\1.proj."),
    (r"^encoder\.layer\.(\d+)\.intermediate\.dense\.", r"blocks_\1.mlp.lin1."),
    (r"^encoder\.layer\.(\d+)\.output\.dense\.", r"blocks_\1.mlp.lin2."),
    (r"^encoder\.layer\.(\d+)\.layernorm_before\.", r"blocks_\1.norm1."),
    (r"^encoder\.layer\.(\d+)\.layernorm_after\.", r"blocks_\1.norm2."),
    (r"^layernorm\.", "norm."),
]


def convert_segformer_state_dict(
        state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a HuggingFace ``SegformerModel`` state dict (e.g.
    nvidia/segformer-b0-finetuned-ade-512-512) into a
    :class:`labelanything_tpu.models.segformer.MixVisionTransformer` params
    tree. HF keeps separate q/k/v projections; ours fuses k and v into one
    ``kv`` dense whose output axis is laid out as (2, heads, dh) — k first."""
    tree: Dict[str, Any] = {}

    def insert(path: str, leaf: str, value: np.ndarray):
        node = tree
        for p in path.split("."):
            node = node.setdefault(p, {})
        node[leaf] = value

    pending_kv: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        key = re.sub(r"^(segformer\.)?encoder\.", "", key)
        if key.startswith("pooler") or key.startswith("decode_head"):
            continue
        m = re.match(r"patch_embeddings\.(\d+)\.(proj|layer_norm)\.(weight|bias)",
                     key)
        if m:
            i, mod, leaf = int(m.group(1)), m.group(2), m.group(3)
            if mod == "proj":
                insert(f"patch_embed{i + 1}.proj",
                       "kernel" if leaf == "weight" else "bias",
                       value.transpose(2, 3, 1, 0) if leaf == "weight" else value)
            else:
                insert(f"patch_embed{i + 1}.norm",
                       "scale" if leaf == "weight" else "bias", value)
            continue
        m = re.match(r"layer_norm\.(\d+)\.(weight|bias)", key)
        if m:
            insert(f"norm{int(m.group(1)) + 1}",
                   "scale" if m.group(2) == "weight" else "bias", value)
            continue
        m = re.match(r"block\.(\d+)\.(\d+)\.(.*)", key)
        if not m:
            continue
        blk = f"block{int(m.group(1)) + 1}_{m.group(2)}"
        rest = m.group(3)
        ln = {"weight": "scale", "bias": "bias"}
        for torch_name, ours in (("layer_norm_1", "norm1"),
                                 ("layer_norm_2", "norm2"),
                                 ("attention.self.layer_norm", "attn.sr_norm")):
            mm = re.match(rf"{re.escape(torch_name)}\.(weight|bias)", rest)
            if mm:
                insert(f"{blk}.{ours}", ln[mm.group(1)], value)
                rest = None
                break
        if rest is None:
            continue
        mm = re.match(r"attention\.self\.(query|key|value)\.(weight|bias)", rest)
        if mm:
            which, leaf = mm.group(1), mm.group(2)
            if which == "query":
                insert(f"{blk}.attn.q", "kernel" if leaf == "weight" else "bias",
                       value.T if leaf == "weight" else value)
            else:
                slot = pending_kv.setdefault(blk, {})
                slot[f"{which}.{leaf}"] = value
            continue
        mm = re.match(r"attention\.self\.sr\.(weight|bias)", rest)
        if mm:
            insert(f"{blk}.attn.sr",
                   "kernel" if mm.group(1) == "weight" else "bias",
                   value.transpose(2, 3, 1, 0) if mm.group(1) == "weight"
                   else value)
            continue
        mm = re.match(r"attention\.output\.dense\.(weight|bias)", rest)
        if mm:
            insert(f"{blk}.attn.proj",
                   "kernel" if mm.group(1) == "weight" else "bias",
                   value.T if mm.group(1) == "weight" else value)
            continue
        mm = re.match(r"mlp\.(dense1|dense2)\.(weight|bias)", rest)
        if mm:
            name = "fc1" if mm.group(1) == "dense1" else "fc2"
            insert(f"{blk}.mlp.{name}",
                   "kernel" if mm.group(2) == "weight" else "bias",
                   value.T if mm.group(2) == "weight" else value)
            continue
        mm = re.match(r"mlp\.dwconv\.dwconv\.(weight|bias)", rest)
        if mm:
            insert(f"{blk}.mlp.dwconv",
                   "kernel" if mm.group(1) == "weight" else "bias",
                   value.transpose(2, 3, 1, 0) if mm.group(1) == "weight"
                   else value)
            continue

    for blk, slot in pending_kv.items():
        kernel = np.concatenate([slot["key.weight"].T, slot["value.weight"].T],
                                axis=1)
        bias = np.concatenate([slot["key.bias"], slot["value.bias"]])
        insert(f"{blk}.attn.kv", "kernel", kernel)
        insert(f"{blk}.attn.kv", "bias", bias)
    return tree


def convert_hf_vit_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a HuggingFace ViTModel state dict (e.g. facebook/vit-mae-base,
    google/vit-base-patch16-224-in21k, facebook/dino-vitb8) into a
    :class:`labelanything_tpu.models.vit.StandardViT` params tree."""
    tree: Dict[str, Any] = {}

    def insert(parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        value = np.asarray(value)
        if "pooler" in key:
            continue
        key = _apply_renames(key, _HF_VIT_RENAMES)
        parts = key.split(".")
        if parts[-1] == "weight":
            if value.ndim == 4:  # patch conv (O, I, kh, kw) -> (kh, kw, I, O)
                insert(parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                insert(parts[:-1] + ["kernel"], value.T)
            else:  # LayerNorm
                insert(parts[:-1] + ["scale"], value)
        elif parts[-1] in ("cls_token", "pos_embed"):
            insert(parts, value)
        else:
            insert(parts, value)
    return tree


_EXPORT_RENAMES: List[Tuple[str, str]] = [
    # inverse of _RENAMES for the LAM (no-ViT) tree — reference layout out
    (r"(^|\.)neck\.conv1\.", r"\1neck.0."),
    (r"(^|\.)neck\.ln1\.", r"\1neck.1."),
    (r"(^|\.)neck\.conv2\.", r"\1neck.2."),
    (r"(^|\.)neck\.ln2\.", r"\1neck.3."),
    (r"(^|\.)mask_down_conv1\.", r"\1mask_downscaling.0."),
    (r"(^|\.)mask_down_ln1\.", r"\1mask_downscaling.1."),
    (r"(^|\.)mask_down_conv2\.", r"\1mask_downscaling.3."),
    (r"(^|\.)mask_down_ln2\.", r"\1mask_downscaling.4."),
    (r"(^|\.)mask_down_conv3\.", r"\1mask_downscaling.6."),
    (r"(^|\.)class_attention_block\.", r"\1class_attention."),
    (r"(^|\.)example_attention_block\.", r"\1example_attention."),
    (r"(^|\.)class_example_attention_block\.", r"\1class_example_attention."),
    (r"(^|\.)up_conv1\.", r"\1output_upscaling.0."),
    (r"(^|\.)up_ln\.", r"\1output_upscaling.1."),
    (r"(^|\.)up_conv2\.", r"\1output_upscaling.3."),
    (r"(^|\.)spatial_conv_0\.", r"\1spatial_convs.0."),
    (r"(^|\.)spatial_ln_0\.", r"\1spatial_convs.1."),
    (r"(^|\.)spatial_conv_1\.", r"\1spatial_convs.3."),
    (r"(^|\.)spatial_ln_1\.", r"\1spatial_convs.4."),
    (r"(^|\.)spatial_conv_2\.", r"\1spatial_convs.6."),
    (r"(^|\.)spatial_ln_2\.", r"\1spatial_convs.7."),
    (r"(^|\.)prototype_tconv_(\d+)\.", r"\1prototype_tconv.\2."),
    (r"(^|\.)layers_(\d+)\.", r"\1layers.\2."),
    (r"(^|\.)blocks_(\d+)\.", r"\1blocks.\2."),
]

_EXPORT_LN2D = tuple(_LN2D_NAMES) + _LN2D_PREFIXES


def export_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict` for the LAM (no-ViT) tree:
    produce a reference-layout torch-style state dict from flax params, so
    checkpoints trained here load in the reference (and round-trip through
    convert_state_dict bit-exactly — tested in tests/test_api.py)."""
    flat = _flatten(params["params"] if "params" in params else params)
    out: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        value = np.asarray(value)
        key = ".".join(path)
        mod = path[-2] if len(path) >= 2 else ""
        leaf = path[-1]
        if leaf == "point_embeddings":
            # (4, D) stacked rows -> point_embeddings.{i}.weight
            base = ".".join(path[:-1])
            prefix = base + "." if base else ""
            for i in range(value.shape[0]):
                out[_apply_renames(
                    f"{prefix}point_embeddings.{i}.weight",
                    _EXPORT_RENAMES)] = value[i][None]
            continue
        if leaf in ("not_a_point_embed", "no_mask_embed", "not_a_mask_embed",
                    "no_sparse_embedding"):
            # imported as the full nn.Embedding weight (1, D) — name only
            key = key + ".weight"
        elif leaf == "kernel":
            base = ".".join(path[:-1])
            if value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)
            else:
                value = value.T
            key = base + ".weight"
        elif leaf == "scale":
            key = ".".join(path[:-1]) + ".weight"
        elif leaf == "weight" and (mod in _LN2D_NAMES or
                                   any(mod.startswith(pfx)
                                       for pfx in _LN2D_PREFIXES)):
            pass  # LayerNorm2d weight keeps its name
        # safetensors serializes raw buffers: transposed VIEWS must be made
        # contiguous or they save scrambled
        out[_apply_renames(key, _EXPORT_RENAMES)] = np.ascontiguousarray(value)
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.bin/.safetensors checkpoint into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}
