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

    # pycocotools shim backed by the repo's own codec (data/rle.py), so the
    # reference's transforms/substitution modules import and their RLE paths
    # are functional (decode/encode/merge/frPyObjects over single or list)
    if not hasattr(_stub("pycocotools"), "mask"):
        import numpy as _np

        from labelanything_tpu.data import rle as _rle

        pc = _stub("pycocotools")
        pcm = _stub("pycocotools.mask")

        def _decode(r):
            if isinstance(r, list):
                return _np.stack([_rle.decode(x) for x in r], axis=-1)
            return _rle.decode(r)

        def _fr_py_objects(objs, h, w):
            if isinstance(objs, list) and objs and isinstance(objs[0], list):
                return [_rle.encode(_rle.poly_to_mask([p], h, w)) for p in objs]
            if isinstance(objs, dict):
                return _rle.encode(_rle.decode(objs))
            return _rle.encode(_rle.poly_to_mask(objs, h, w))

        pcm.decode = _decode
        pcm.encode = lambda m: _rle.encode(_np.asarray(m))
        pcm.merge = _rle.merge
        pcm.frPyObjects = _fr_py_objects
        pc.mask = pcm

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

    # torchmetrics shim: the reference's PmIoU/DmIoU/ImIoU only need the
    # Metric base class; the torchmetrics-backed wrappers are not under test
    class _Metric(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    # don't clobber on repeat calls: tests.torchmetrics_faithful.install()
    # replaces the Jaccard classes with update/compute-faithful versions
    tm = _stub("torchmetrics")
    for name in ("Metric", "JaccardIndex", "AUROC", "F1Score",
                 "ConfusionMatrix", "Precision", "Recall"):
        if not hasattr(tm, name):
            setattr(tm, name, _Metric)
    tmc = _stub("torchmetrics.classification")
    for name in ("BinaryJaccardIndex", "JaccardIndex",
                 "MulticlassJaccardIndex"):
        if not hasattr(tmc, name):
            setattr(tmc, name, _Metric)
    tm.classification = tmc
    tmf = _stub("torchmetrics.functional")
    tmfc = _stub("torchmetrics.functional.classification")
    tmfc.binary_jaccard_index = lambda *a, **k: None
    tmfj = _stub("torchmetrics.functional.classification.jaccard")
    tmfj._jaccard_index_reduce = None
    tmfr = _stub("torchmetrics.functional.classification.roc")
    tmfr.roc = None
    tmfc.jaccard = tmfj
    tmfc.roc = tmfr
    tmf.classification = tmfc
    tm.functional = tmf

    # mmcv/mmengine shims (HDMNet's transformer imports them; parameter
    # names .conv/.bn/.projection/.norm match the real mmcv modules so
    # state-dict keys line up with real checkpoints)
    mmcv = _stub("mmcv")
    mmcv_cnn = _stub("mmcv.cnn")
    mmcv_bricks = _stub("mmcv.cnn.bricks")
    mmcv_drop = _stub("mmcv.cnn.bricks.drop")
    mmcv_tr = _stub("mmcv.cnn.bricks.transformer")
    mmengine = _stub("mmengine")
    mmengine_utils = _stub("mmengine.utils")

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def _build_activation_layer(cfg):
        return torch.nn.GELU()

    def _build_norm_layer(cfg, dims):
        if cfg.get("type", "LN") == "LN":
            return ("ln", torch.nn.LayerNorm(dims, eps=cfg.get("eps", 1e-5)))
        return ("bn", torch.nn.BatchNorm2d(dims))

    def _build_conv_layer(cfg, *a, **k):
        return torch.nn.Conv2d(*a, **k)

    def _build_dropout(cfg):
        return torch.nn.Identity()  # DropPath: inert at eval

    class _ConvModule(torch.nn.Module):
        def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                     norm_cfg=None, **kw):
            super().__init__()
            self.conv = torch.nn.Conv2d(in_ch, out_ch, kernel_size, stride,
                                        padding, bias=norm_cfg is None)
            self.bn = torch.nn.BatchNorm2d(out_ch)
            self.activate = torch.nn.ReLU()

        def forward(self, x):
            return self.activate(self.bn(self.conv(x)))

    class _MMMultiheadAttention(torch.nn.Module):
        def __init__(self, embed_dims, num_heads, attn_drop=0., proj_drop=0.,
                     dropout_layer=None, init_cfg=None, batch_first=True,
                     bias=False, **kw):
            super().__init__()
            self.embed_dims, self.num_heads = embed_dims, num_heads
            self.attn = torch.nn.Identity()  # replaced by the subclass
            self.proj_drop = torch.nn.Dropout(proj_drop)
            self.dropout_layer = _build_dropout(dropout_layer)

    mmcv_cnn.Conv2d = torch.nn.Conv2d
    mmcv_cnn.build_activation_layer = _build_activation_layer
    mmcv_cnn.build_norm_layer = _build_norm_layer
    mmcv_cnn.build_conv_layer = _build_conv_layer
    mmcv_cnn.ConvModule = _ConvModule
    mmcv_drop.build_dropout = _build_dropout
    mmcv_tr.MultiheadAttention = _MMMultiheadAttention
    mmcv_bricks.drop = mmcv_drop
    mmcv_bricks.transformer = mmcv_tr
    mmcv_cnn.bricks = mmcv_bricks
    mmcv.cnn = mmcv_cnn
    mmengine_utils.to_2tuple = _to_2tuple
    mmengine.utils = mmengine_utils

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
