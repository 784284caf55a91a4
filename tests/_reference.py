"""Import helper for the read-only PyTorch reference at /root/reference.

The reference package __init__ pulls in heavy, partly-uninstallable deps
(torchvision backbones, timm via vendored baselines, ruamel.yaml, wandb).
We (a) stub the missing third-party modules with minimal shims and (b)
pre-register namespace-only package modules so importing
``label_anything.models.X`` never executes the real package __init__.
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # capability probing) doesn't choke on the stub
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    return mod


def setup() -> None:
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # ruamel.yaml shim (used only by config IO paths we never call)
    ruamel = _stub("ruamel")
    ry = _stub("ruamel.yaml")
    ry.YAML = object
    ry.comments = _stub("ruamel.yaml.comments")
    ruamel.yaml = ry

    # torchvision shim: the reference only needs functional.resize and the
    # Normalize/Resize transform classes at import time
    import torch
    import torch.nn.functional as F

    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tvf = _stub("torchvision.transforms.functional")

    def resize(img, size, interpolation=None, **kw):
        if isinstance(size, int):
            size = (size, size)
        antialias = interpolation is None
        mode = "nearest" if getattr(interpolation, "name", "") == "NEAREST" else "bilinear"
        x = img
        squeeze = x.dim() == 3
        if squeeze:
            x = x[None]
        x = F.interpolate(x.float(), size=tuple(size), mode=mode,
                          align_corners=False if mode == "bilinear" else None)
        return x[0] if squeeze else x

    tvf.resize = resize

    class _Normalize(torch.nn.Module):
        def __init__(self, mean, std, inplace=False):
            super().__init__()
            self.mean, self.std = mean, std

        def forward(self, x):
            mean = torch.tensor(self.mean).view(-1, 1, 1)
            std = torch.tensor(self.std).view(-1, 1, 1)
            return (x - mean) / std

    class _Resize:
        def __init__(self, *a, **k):
            pass

    class _ToTensor:
        def __call__(self, pic):
            import numpy as np
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            return torch.from_numpy(arr).permute(2, 0, 1)

    tvt.Normalize = _Normalize
    tvt.Resize = _Resize
    tvt.ToTensor = _ToTensor
    tvt.functional = tvf
    tv.transforms = tvt

    # timm shim (Swin backbone imports DropPath/to_2tuple/trunc_normal_)
    timm = _stub("timm")
    timm_models = _stub("timm.models")
    timm_layers = _stub("timm.models.layers")

    class _DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std)
        return tensor

    timm_layers.DropPath = _DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models

    # torchvision.models namespaces: the vendored baselines import model
    # constructors at module load; the constructors themselves are only
    # called for pretrained downloads, which tests monkeypatch away.
    def _no_download(*a, **k):
        raise RuntimeError("torchvision model zoo is stubbed in tests")

    tvm = _stub("torchvision.models")
    tvm_resnet = _stub("torchvision.models.resnet")
    tvm_resnet.resnet50 = tvm_resnet.resnet101 = _no_download
    tvm_vgg = _stub("torchvision.models.vgg")
    tvm_vgg.vgg16 = tvm_vgg.vgg16_bn = _no_download
    tvm_densenet = _stub("torchvision.models.densenet")
    tvm_densenet.densenet121 = _no_download
    tvm.resnet = tvm_resnet
    tvm.vgg = tvm_vgg
    tvm.densenet = tvm_densenet
    sys.modules["torchvision"].models = tvm

    # dropblock shim (FPTrans imports DropBlock2D; drop_dim=1 never uses it)
    dropblock = _stub("dropblock")
    if not hasattr(dropblock, "DropBlock2D"):
        class _DropBlock2D(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        dropblock.DropBlock2D = _DropBlock2D

    # namespace-only packages: skip the heavy real __init__ modules
    for pkg, path in [
        ("label_anything", f"{REF}/label_anything"),
        ("label_anything.models", f"{REF}/label_anything/models"),
        ("label_anything.data", f"{REF}/label_anything/data"),
        ("label_anything.utils", f"{REF}/label_anything/utils"),
        ("label_anything.loss", f"{REF}/label_anything/loss"),
        ("label_anything.models.dcama", f"{REF}/label_anything/models/dcama"),
        ("label_anything.models.fptrans", f"{REF}/label_anything/models/fptrans"),
        ("label_anything.models.fptrans.utils_",
         f"{REF}/label_anything/models/fptrans/utils_"),
        ("label_anything.models.ppnet", f"{REF}/label_anything/models/ppnet"),
        ("label_anything.models.denet", f"{REF}/label_anything/models/denet"),
        ("label_anything.models.denet.head",
         f"{REF}/label_anything/models/denet/head"),
        # NOTE: denet.backbone is NOT namespace-stubbed — its real __init__
        # defines get_backbone and imports only the stubbed torchvision names
        ("label_anything.models.bam", f"{REF}/label_anything/models/bam"),
        ("label_anything.models.hdmnet", f"{REF}/label_anything/models/hdmnet"),
    ]:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [path]
            mod.__package__ = pkg
            sys.modules[pkg] = mod


def load(name: str):
    setup()
    return importlib.import_module(name)
