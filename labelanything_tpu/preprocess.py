"""Offline feature-extraction pipeline (reference: label_anything/preprocess.py).

``preprocess_images_to_embeddings`` streams images from disk through a
jit-compiled encoder on the TPU and writes one safetensors file per image,
``{"embedding": (C, H, W)}`` named ``<id>.zfill(12).safetensors`` — the same
cache format the reference produces (preprocess.py:70-73), so caches are
interchangeable between frameworks (this loader transposes CHW->HWC on read).

Host IO (decode + preprocess, write-back) runs on thread pools double-buffered
against the device step — the generate_embeddings throughput north star.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .data.transforms import PromptsProcessor, preprocess_image
from .models.registry import model_registry
from .utils.logging import get_logger


def save_st(tensors: dict, path: str) -> None:
    """safetensors save with contiguity enforcement.

    ``safetensors.numpy.save_file`` serializes the RAW UNDERLYING buffer of
    each array: a non-contiguous view (e.g. the HWC->CHW ``transpose(2,0,1)``
    used for reference-compatible embeddings) saves SCRAMBLED data with the
    transposed shape — silently. Every write in this module goes through
    here. Regression-tested in tests/test_preprocess_pipeline.py."""
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)


logger = get_logger(__name__)


def _image_files(instances_path: Optional[str], directory: str):
    if instances_path:
        with open(instances_path) as f:
            instances = json.load(f)
        files = [(img["id"], os.path.join(directory, img["file_name"]))
                 for img in instances["images"]]
    else:
        paths = sorted(pathlib.Path(directory).glob("*.jpg")) + sorted(
            pathlib.Path(directory).glob("*.png"))
        files = [(p.stem.lstrip("0") or "0", str(p)) for p in paths]
    # multi-worker sharding for pod-scale extraction
    # (scripts/launch_embeddings_pod.sh sets these per TPU-VM worker)
    shard = int(os.environ.get("LA_SHARD_INDEX", 0))
    count = int(os.environ.get("LA_SHARD_COUNT", 1))
    if count > 1:
        files = files[shard::count]
        logger.info("worker shard %d/%d: %d images", shard, count, len(files))
    return files



def _stream_encode(files, *, image_size, custom_preprocess, batch_size,
                   num_workers, params, apply_fn, write_fn,
                   log_label="images"):
    """Shared streaming loop for embedding extraction.

    Host->device traffic runs uint8 (4x less than fp32 pixels — this is the
    bottleneck on tunneled/remote devices); normalization happens on device
    inside the jit, with the bottom-right pad region forced to EXACTLY zero
    to match CustomNormalize (pad-after-normalize) semantics (reference:
    transforms.py:27-46). The device step is double-buffered: batch n+1 is
    dispatched BEFORE batch n's outputs are fetched, so device compute
    overlaps the host fetch + threaded safetensors writes.

    ``apply_fn(params, x)`` runs the encoder on normalized fp32 pixels and
    may return any pytree; ``write_fn(image_id, per_image_outputs)`` gets
    the same pytree sliced per image (host numpy)."""
    from .data.transforms import IMAGENET_MEAN, IMAGENET_STD, CustomResize

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def encode(params, x_u8, hw):
        x = x_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        yy = jnp.arange(image_size)[None, :, None, None]
        xx = jnp.arange(image_size)[None, None, :, None]
        valid = (yy < hw[:, 0, None, None, None]) & (xx < hw[:, 1, None, None, None])
        return apply_fn(params, jnp.where(valid, x, 0.0))

    def load_one(item):
        """Decode + resize + pad on host, uint8; normalize runs on device."""
        image_id, path = item
        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")
        if custom_preprocess:
            img = CustomResize(image_size)(img)
        else:
            img = img.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
        h, w = arr.shape[:2]
        out = np.zeros((image_size, image_size, 3), np.uint8)
        out[:h, :w] = arr
        return image_id, out, (h, w)

    def fetch_and_queue(ids, out, pending, write_pool):
        host = jax.tree.map(np.asarray, out)
        for i, image_id in enumerate(ids):
            per_image = jax.tree.map(lambda a: a[i], host)
            pending.append(write_pool.submit(write_fn, image_id, per_image))

    t0 = time.time()
    done = 0
    batches = [files[i:i + batch_size] for i in range(0, len(files), batch_size)]
    with ThreadPoolExecutor(num_workers) as io_pool, \
            ThreadPoolExecutor(4) as write_pool:
        loaded_iter = iter(io_pool.map(
            lambda chunk: [load_one(it) for it in chunk], batches))
        pending = []
        in_flight = None
        for chunk in loaded_iter:
            ids = [c[0] for c in chunk]
            arrs = np.stack([c[1] for c in chunk])
            hws = np.asarray([c[2] for c in chunk], np.int32)
            pad = batch_size - len(ids)
            if pad:
                arrs = np.concatenate([arrs, np.zeros((pad,) + arrs.shape[1:],
                                                      arrs.dtype)])
                hws = np.concatenate([hws, np.zeros((pad, 2), np.int32)])
            out = encode(params, jnp.asarray(arrs), jnp.asarray(hws))
            if in_flight is not None:
                fetch_and_queue(*in_flight, pending, write_pool)
            in_flight = (ids, out)
            done += len(ids)
            if done % (batch_size * 10) < batch_size:
                rate = done / (time.time() - t0)
                logger.info("%d/%d %s (%.1f img/s)", done, len(files),
                            log_label, rate)
        if in_flight is not None:
            fetch_and_queue(*in_flight, pending, write_pool)
        for f in pending:
            f.result()
    rate = done / (time.time() - t0)
    logger.info("finished: %d %s at %.2f images/sec", done, log_label, rate)
    return rate


def preprocess_images_to_embeddings(
    encoder_name: str,
    checkpoint: Optional[str] = None,
    use_sam_checkpoint: bool = False,
    directory: str = "data/images",
    instances_path: Optional[str] = None,
    batch_size: int = 8,
    num_workers: int = 16,
    outfolder: str = "data/processed/embeddings",
    last_block_dir: Optional[str] = None,
    image_size: int = 1024,
    custom_preprocess: bool = True,
    dtype=jnp.bfloat16,
    limit: Optional[int] = None,
):
    """(reference: preprocess.py:78-141,143-175)."""
    os.makedirs(outfolder, exist_ok=True)
    if last_block_dir:
        os.makedirs(last_block_dir, exist_ok=True)

    encoder = model_registry[encoder_name](
        project_last_hidden=not last_block_dir or True, dtype=dtype,
        image_size=image_size,
    ) if encoder_name in ("vit_b", "vit_l", "vit_h") else model_registry[
        encoder_name](dtype=dtype)

    probe = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    params = jax.jit(encoder.init)(jax.random.key(0), probe)
    if checkpoint:
        from .utils.torch_import import (convert_state_dict, load_torch_file,
                                         merge_into_params)

        sd = load_torch_file(checkpoint)
        if use_sam_checkpoint:
            sd = {k[len("image_encoder."):]: v for k, v in sd.items()
                  if k.startswith("image_encoder.")}
        params = merge_into_params(
            params, convert_state_dict(sd, kind="sam_encoder"))

    want_last_block = last_block_dir is not None

    def apply_fn(params, x):
        if want_last_block:
            out = encoder.apply(params, x, return_last_block_state=True)
            return out["last_hidden_state"], out["last_block_state"]
        return encoder.apply(params, x)

    def write_fn(image_id, out):
        hidden, last_block = out if want_last_block else (out, None)
        name = f"{str(image_id).zfill(12)}.safetensors"
        save_st({"embedding": np.asarray(hidden, np.float32).transpose(2, 0, 1)},
                os.path.join(outfolder, name))
        if last_block is not None:
            save_st({"embedding": np.asarray(last_block, np.float32)
                    .transpose(2, 0, 1)},
                    os.path.join(last_block_dir, name))

    files = _image_files(instances_path, directory)
    if limit:
        files = files[:limit]
    logger.info("encoding %d images", len(files))
    return _stream_encode(
        files, image_size=image_size, custom_preprocess=custom_preprocess,
        batch_size=batch_size, num_workers=num_workers, params=params,
        apply_fn=apply_fn, write_fn=write_fn)


def preprocess_images_to_embeddings_huggingface(
    model_name: str,
    directory: str,
    instances_path: Optional[str] = None,
    batch_size: int = 8,
    num_workers: int = 16,
    outfolder: str = "data/processed/embeddings",
    image_resolution: int = 480,
    custom_preprocess: bool = True,
    dtype=jnp.bfloat16,
    limit: Optional[int] = None,
):
    """HF-ViT embedding extraction (reference: preprocess.py:210-258), run
    natively: the HF checkpoint (a LOCAL directory with config.json +
    model.safetensors / pytorch_model.bin — no network egress here) is
    name-mapped into StandardViT and jit-compiled on the TPU."""
    import json as _json

    from .models.vit import StandardViT
    from .utils.torch_import import (convert_hf_vit_state_dict,
                                     load_torch_file, merge_into_params)

    ckpt = pathlib.Path(model_name)
    with open(ckpt / "config.json") as f:
        cfg = _json.load(f)
    patch = cfg.get("patch_size", 16)
    encoder = StandardViT(
        patch_size=patch,
        embed_dim=cfg.get("hidden_size", 768),
        depth=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        mlp_ratio=cfg.get("intermediate_size", 3072) / cfg.get("hidden_size", 768),
        pretrain_grid=cfg.get("image_size", 224) // patch,
        layernorm_eps=cfg.get("layer_norm_eps", 1e-12),
        dtype=dtype,
    )
    probe = jnp.zeros((batch_size, image_resolution, image_resolution, 3))
    params = jax.jit(encoder.init)(jax.random.key(0), probe)
    weights = None
    for fname in ("model.safetensors", "pytorch_model.bin"):
        if (ckpt / fname).exists():
            weights = load_torch_file(str(ckpt / fname))
            break
    if weights is None:
        raise FileNotFoundError(f"no weights under {ckpt}")
    params = merge_into_params(params, convert_hf_vit_state_dict(weights))

    def write_fn(image_id, emb):
        save_st({"embedding": np.asarray(emb, np.float32).transpose(2, 0, 1)},
                os.path.join(outfolder,
                             f"{str(image_id).zfill(12)}.safetensors"))

    os.makedirs(outfolder, exist_ok=True)
    files = _image_files(instances_path, directory)
    if limit:
        files = files[:limit]
    return _stream_encode(
        files, image_size=image_resolution,
        custom_preprocess=custom_preprocess, batch_size=batch_size,
        num_workers=num_workers, params=params, apply_fn=encoder.apply,
        write_fn=write_fn, log_label="hf images")


def preprocess_clip(clip_model_path: str, directory: str,
                    instances_path: Optional[str] = None,
                    outfolder: str = "data/processed/clip",
                    batch_size: int = 16, limit: Optional[int] = None):
    """CLIP image-embedding extraction for prompt-encoder pretraining
    (reference: label_anything/preprocess_clip.py). Runs the CLIP vision
    tower via transformers on the host CPU — an offline, one-time tool."""
    import torch
    from transformers import CLIPImageProcessor, CLIPVisionModel


    model = CLIPVisionModel.from_pretrained(clip_model_path).eval()
    processor = CLIPImageProcessor.from_pretrained(clip_model_path)
    os.makedirs(outfolder, exist_ok=True)
    files = _image_files(instances_path, directory)
    if limit:
        files = files[:limit]
    with torch.no_grad():
        for start in range(0, len(files), batch_size):
            chunk = files[start:start + batch_size]
            images = [Image.open(p).convert("RGB") for _, p in chunk]
            inputs = processor(images=images, return_tensors="pt")
            out = model(**inputs).last_hidden_state.numpy()
            for (image_id, _), emb in zip(chunk, out):
                save_st({"clip_embedding": emb},
                          os.path.join(outfolder,
                                       f"{str(image_id).zfill(12)}.safetensors"))
    logger.info("clip embeddings written for %d images", len(files))


def generate_ground_truths(dataset_name: str, anns_path: str, outfolder: str,
                           custom_preprocess: bool = True):
    """Inject per-image GT maps into existing safetensors caches
    (reference: preprocess.py:28-50)."""
    from safetensors.numpy import load_file

    with open(anns_path) as f:
        anns = json.load(f)
    pp = PromptsProcessor(custom_preprocess=custom_preprocess)
    by_image = {}
    for ann in anns["annotations"]:
        by_image.setdefault(ann["image_id"], []).append(ann)
    for image in anns["images"]:
        h, w = image["height"], image["width"]
        gt = np.zeros((h, w), np.int64)
        for ann in by_image.get(image["id"], []):
            mask = pp.convert_mask(ann["segmentation"], h, w).astype(np.int64)
            mask[mask == 1] = ann["category_id"]
            gt = np.maximum(gt, mask)
        path = os.path.join(outfolder,
                            f"{str(image['id']).zfill(12)}.safetensors")
        loaded = dict(load_file(path))
        loaded[f"{dataset_name}_gt"] = gt
        save_st(loaded, path)


def preprocess_images_to_feature_pyramids(
    encoder_name: str,
    directory: str,
    instances_path: Optional[str] = None,
    batch_size: int = 4,
    outfolder: str = "data/processed/pyramids",
    image_resolution: int = 384,
    custom_preprocess: bool = True,
    out_features=("stage2", "stage3", "stage4"),
    limit: Optional[int] = None,
    checkpoint: Optional[str] = None,
):
    """Multi-scale feature-pyramid caches for MultiLevelLam
    (reference: preprocess.py:262-322).

    ``encoder_name`` "resnet50"/"swin_b" selects the NATIVE jitted pyramid
    backbones (models/pyramid_encoders.py) running on the accelerator, with
    an optional torch ``checkpoint`` imported via utils.torch_import; any
    other name falls back to a transformers AutoBackbone on host torch-cpu.
    Outputs are reference-compatible per-image safetensors {"stageN": CHW}.
    """
    import jax
    import jax.numpy as jnp


    from .models.build_encoder import ENCODERS

    os.makedirs(outfolder, exist_ok=True)
    files = _image_files(instances_path, directory)
    if limit:
        files = files[:limit]

    if encoder_name in ("resnet50", "swin_b"):
        kwargs = {"out_features": tuple(out_features)}
        if encoder_name == "swin_b":
            kwargs["image_size"] = image_resolution
        backbone = ENCODERS[encoder_name](**kwargs)
        example = jnp.zeros((1, image_resolution, image_resolution, 3),
                            jnp.float32)
        variables = jax.jit(backbone.init)(jax.random.key(0), example)
        if checkpoint:
            from .utils.torch_import import (convert_dcama_state_dict,
                                             convert_ppnet_state_dict,
                                             load_torch_file,
                                             merge_into_variables)

            sd = load_torch_file(checkpoint)
            if encoder_name == "resnet50":
                converted = convert_ppnet_state_dict(
                    {f"resnet.{k}": v for k, v in sd.items()})
            else:
                converted = {"params": convert_dcama_state_dict(
                    {f"feature_extractor.{k}": v for k, v in sd.items()}
                ).get("feature_extractor", {})}
                converted = {"params": {"swin": converted["params"]}}
            variables = merge_into_variables(variables, converted,
                                             strict=False)
        apply = jax.jit(lambda v, x: backbone.apply(v, x))

        def run(arrs):
            out = apply(variables, jnp.asarray(np.stack(arrs)))
            # channels-last -> reference CHW layout
            return {k: np.asarray(v).transpose(0, 3, 1, 2)
                    for k, v in out.items()}
    else:
        import torch
        from transformers import AutoBackbone

        tb = AutoBackbone.from_pretrained(
            encoder_name, out_features=list(out_features)).eval()

        def run(arrs):
            with torch.no_grad():
                out = tb(torch.from_numpy(
                    np.stack([a.transpose(2, 0, 1) for a in arrs])))
            return {name: fm.numpy() for name, fm in
                    zip(out_features, out.feature_maps)}

    for start in range(0, len(files), batch_size):
        chunk = files[start:start + batch_size]
        arrs = []
        for _, path in chunk:
            arr, _ = preprocess_image(Image.open(path), image_resolution,
                                      custom_preprocess)
            arrs.append(arr)
        # pad the tail chunk so the jitted apply sees one static batch shape
        n_real = len(arrs)
        while len(arrs) < batch_size:
            arrs.append(arrs[-1])
        stages = run(arrs)
        for i, (image_id, _) in enumerate(chunk[:n_real]):
            save_st({name: fm[i] for name, fm in stages.items()},
                      os.path.join(outfolder,
                                   f"{str(image_id).zfill(12)}.safetensors"))
    logger.info("pyramids written for %d images", len(files))


def preprocess_voc(input_folder: str):
    """Convert VOC palette masks to class-id PNGs
    (reference: data/voc12.py preprocess_voc)."""
    folder = pathlib.Path(input_folder)
    out_dir = folder.parent / (folder.name + "Processed")
    out_dir.mkdir(exist_ok=True)
    for path in sorted(folder.glob("*.png")):
        img = Image.open(path)
        arr = np.asarray(img.convert("P") if img.mode != "P" else img)
        Image.fromarray(arr.astype(np.uint8)).save(out_dir / path.name)
    logger.info("VOC masks processed into %s", out_dir)


def rename_coco20i_json(instances_path: str):
    """(reference: preprocess.py:325-336)."""
    with open(instances_path) as f:
        anns = json.load(f)
    for image in anns["images"]:
        image["file_name"] = image["file_name"].split("_")[-1]
    with open(instances_path, "w") as f:
        json.dump(anns, f)
