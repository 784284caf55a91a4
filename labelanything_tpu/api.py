"""Public model API (reference: label_anything/models/build_lam.py:402-508
``LabelAnythingConfig`` / ``LabelAnything`` with PyTorchModelHubMixin).

``LabelAnything`` bundles an architecture config with parameters and exposes
the serving surface:

    la = LabelAnything.from_pretrained("path/to/checkpoint_dir")
    embeddings = la.generate_class_embeddings(support_batch)
    masks = la.predict(query_batch, embeddings)

Checkpoint directories contain ``config.json`` plus either
``model.safetensors`` (a torch state dict of the reference layout — loaded
through the bit-compatible converter) or an orbax ``params/`` tree saved by
``save_pretrained``. Hugging Face hub ids resolve through a local
``HF_HOME``/``LABELANYTHING_CACHE`` snapshot when present (this environment
has no network egress).
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.synthetic import random_batch
from .models.build_lam import build_lam
from .typing import BatchKeys, ResultDict

CONFIG_NAME = "config.json"
TORCH_WEIGHTS = ("model.safetensors", "pytorch_model.bin", "model.pth")
JAX_PARAMS_DIR = "params"


class LabelAnythingConfig(dict):
    """Plain-dict config (reference: build_lam.py:402-464)."""

    @classmethod
    def from_file(cls, path: str) -> "LabelAnythingConfig":
        with open(path) as f:
            return cls(json.load(f))

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(dict(self), f, indent=2)


def _resolve_checkpoint_dir(name_or_path: str) -> pathlib.Path:
    p = pathlib.Path(name_or_path)
    if p.is_dir():
        return p
    # HF-style repo id -> local snapshot cache
    for root in (os.environ.get("LABELANYTHING_CACHE"),
                 os.environ.get("HF_HOME"),
                 os.path.expanduser("~/.cache/huggingface")):
        if not root:
            continue
        repo_dir = pathlib.Path(root) / "hub" / (
            "models--" + name_or_path.replace("/", "--")) / "snapshots"
        if repo_dir.exists():
            snaps = sorted(repo_dir.iterdir())
            if snaps:
                return snaps[-1]
        flat = pathlib.Path(root) / name_or_path.replace("/", "--")
        if flat.is_dir():
            return flat
    # fall back to a hub download (reference: models/hfhub.py:27-66
    # PyTorchModelHubMixin.from_pretrained); no-ops cleanly without network
    try:
        from huggingface_hub import snapshot_download

        return pathlib.Path(snapshot_download(repo_id=name_or_path))
    except Exception as exc:
        raise FileNotFoundError(
            f"Checkpoint {name_or_path!r} not found locally and hub download "
            f"failed ({exc}); download the snapshot into LABELANYTHING_CACHE."
        ) from exc


class LabelAnything:
    """Model + params bundle with the reference's serving surface."""

    def __init__(self, config: Dict[str, Any], params: Optional[Any] = None,
                 seed: int = 0):
        self.config = LabelAnythingConfig(config)
        build_args = {k: v for k, v in self.config.items()
                      if k not in ("model_type",)}
        self.model = build_lam(**build_args)
        self.params = params
        self._seed = seed
        self._jitted: Dict[str, Any] = {}

    # ------------------------------------------------------------------ #
    # construction / persistence
    # ------------------------------------------------------------------ #

    def init_params(self, example_batch=None):
        if example_batch is None:
            example_batch = jax.tree.map(jnp.asarray, random_batch(
                batch_size=1, num_examples=1, num_classes=2,
                image_size=self.config.get("image_size", 1024),
                embed_dim=self.config.get("image_embed_dim", 256),
                with_images=self.config.get("use_vit", False),
            ))
        self.params = jax.jit(self.model.init)(
            jax.random.key(self._seed), example_batch)
        return self.params

    @classmethod
    def from_pretrained(cls, name_or_path: str, **config_overrides) -> "LabelAnything":
        ckpt_dir = _resolve_checkpoint_dir(name_or_path)
        config = LabelAnythingConfig.from_file(str(ckpt_dir / CONFIG_NAME))
        config.update(config_overrides)
        # the reference config may carry torch-only keys; drop them
        for key in ("checkpoint", "use_sam_checkpoint", "torch_dtype",
                    "transformers_version", "architectures"):
            config.pop(key, None)
        la = cls(config)

        jax_dir = ckpt_dir / JAX_PARAMS_DIR
        if jax_dir.exists():
            from .train.checkpoint import load_params

            la.init_params()
            la.params = load_params(str(jax_dir), la.params)
            return la

        for fname in TORCH_WEIGHTS:
            fpath = ckpt_dir / fname
            if fpath.exists():
                from .utils.torch_import import (convert_state_dict,
                                                 load_torch_file,
                                                 merge_into_params)

                la.init_params()
                sd = load_torch_file(str(fpath))
                la.params = merge_into_params(la.params, convert_state_dict(sd))
                return la
        raise FileNotFoundError(f"No weights found under {ckpt_dir}")

    def save_pretrained(self, out_dir: str):
        out = pathlib.Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.config.save(str(out / CONFIG_NAME))
        from .train.checkpoint import save_params

        save_params(str(out / JAX_PARAMS_DIR), self.params)

    def save_torch_compatible(self, out_dir: str):
        """Export params as a reference-layout torch-style safetensors file
        (``model.safetensors``) so checkpoints round-trip between frameworks
        (the inverse of utils.torch_import.convert_state_dict)."""
        from safetensors.numpy import save_file

        from .utils.torch_import import export_state_dict

        out = pathlib.Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.config.save(str(out / CONFIG_NAME))
        save_file(export_state_dict(self.params), str(out / "model.safetensors"))

    def push_to_hub(self, repo_id: str, out_dir: Optional[str] = None,
                    private: bool = True, torch_compatible: bool = True):
        """Upload the checkpoint to the Hugging Face hub (reference:
        models/hfhub.py:50-66 PyTorchModelHubMixin.push_to_hub). Requires
        network access + an HF token; the local save always happens first so
        a failed upload never loses the artifact."""
        import tempfile

        from huggingface_hub import HfApi

        out = out_dir or tempfile.mkdtemp(prefix="labelanything_push_")
        if torch_compatible:
            self.save_torch_compatible(out)
        else:
            self.save_pretrained(out)
        api = HfApi()
        api.create_repo(repo_id=repo_id, private=private, exist_ok=True)
        api.upload_folder(repo_id=repo_id, folder_path=out)
        return out

    # ------------------------------------------------------------------ #
    # serving surface
    # ------------------------------------------------------------------ #

    def __call__(self, batch: Dict[str, Any]):
        fn = self._jitted.setdefault(
            "forward", jax.jit(lambda p, b: self.model.apply(p, b)))
        return fn(self.params, batch)

    def generate_class_embeddings(self, example_batch: Dict[str, Any]):
        """(reference: lam.py:349-361 / demo flow nicegui.py:276)."""
        fn = self._jitted.setdefault(
            "gen_class_embs",
            jax.jit(lambda p, b: self.model.apply(
                p, b, method="generate_class_embeddings")))
        return fn(self.params, example_batch)

    def predict(self, batch: Dict[str, Any], class_embeddings=None):
        """(reference: lam.py:362-382)."""
        if class_embeddings is None:
            return self(batch)[ResultDict.LOGITS]
        fn = self._jitted.setdefault(
            "predict",
            jax.jit(lambda p, b, c: self.model.apply(p, b, c, method="predict")))
        return fn(self.params, batch, class_embeddings)
