"""Model registry (reference: label_anything/models/__init__.py:33-60).

Maps config names to architecture builders: the LAM family, SAM, the
similarity/dummy test models, the HF-encoder builders, and all seven
competitor baselines (DCAMA, FPTrans, PANet, PPNet, DENet, BAM, HDMNet) —
each a TPU-native eval-only port with a torch forward-parity test
(tests/test_{dcama,fptrans,ppnet,denet,bam,hdmnet}.py).
"""

from __future__ import annotations

from .build_encoder import ENCODERS
from .build_lam import (
    build_lam,
    build_lam_dino_b8,
    build_lam_no_vit,
    build_lam_vit_b,
    build_lam_vit_b_imagenet_i21k,
    build_lam_vit_h,
    build_lam_vit_l,
    build_lam_vit_mae_b,
    build_multilevel_lam,
)
from .dummy import build_dummy
from .similarity import build_similarity


model_registry = {
    "lam": build_lam,
    "lam_no_vit": build_lam_no_vit,
    "lam_h": build_lam_vit_h,
    "lam_l": build_lam_vit_l,
    "lam_b": build_lam_vit_b,
    "lam_mae_b": build_lam_vit_mae_b,
    "lam_dino_b8": build_lam_dino_b8,
    "lam_b_imagenet_i21k": build_lam_vit_b_imagenet_i21k,
    "multilevel_lam": build_multilevel_lam,
    "similarity": build_similarity,
    "sam": None,  # populated below (lazy import keeps registry import light)
    "dummy": build_dummy,
    "sam_h": None,
    "sam_l": None,
    "sam_b": None,
    "asam_b": None,
    "fptrans": None,  # populated below
    "ppnet": None,
    "denet": None,
    "bam": None,
    "hdmnet": None,
    **ENCODERS,
}


def _register_sam():
    from .sam import (build_asam_vit_b, build_sam_vit_b, build_sam_vit_h,
                      build_sam_vit_l)

    from .dcama import build_dcama
    from .fptrans import build_fptrans
    from .panet import build_panet
    from .bam import build_bam
    from .hdmnet import build_hdmnet
    from .denet import build_denet
    from .ppnet import build_ppnet

    model_registry.update({
        "dcama": build_dcama,
        "fptrans": build_fptrans,
        "ppnet": build_ppnet,
        "denet": build_denet,
        "bam": build_bam,
        "hdmnet": build_hdmnet,
        "sam": build_sam_vit_h,
        "sam_h": build_sam_vit_h,
        "sam_l": build_sam_vit_l,
        "sam_b": build_sam_vit_b,
        "asam_b": build_asam_vit_b,
        "panet": build_panet,
    })


_register_sam()
