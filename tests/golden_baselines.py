"""Golden parity cases for the seven competitor-baseline families.

Same contract as tests/golden.py: the live side (torch + /root/reference)
synthesizes deterministic weights into the reference's state-dict shapes,
runs the torch forward, and stores only the outputs; replay regenerates the
weights from the fixture's shapes, maps them through the pure-numpy
converter family (utils/torch_import.py), and compares this framework's
forward — no torch needed.

The live builders reuse the existing per-baseline parity tests' reference
construction (tests/test_{dcama,fptrans,ppnet,denet,bam,hdmnet}.py), which
import torch at module load — so they are imported lazily inside ref_*
methods only. The replay side re-states each "ours" construction
self-contained.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from tests.golden import Case, register, state_shapes


# -- Swin feature extractor (DCAMA backbone) --------------------------------

@register
class SwinFeaturesCase(Case):
    name = "swin_features"
    weight_seed = 201

    def _inputs(self):
        rng = np.random.default_rng(2001)
        return rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    def _ref_module(self):
        from tests.test_dcama import tiny_swin_pair

        return tiny_swin_pair()[0]

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._ref_module(), weights)
        with torch.no_grad():
            ref.forward_features(torch.from_numpy(self._inputs()))
        return {f"feat{i}": f.numpy() for i, f in enumerate(ref.feat_maps)}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.swin import SwinTransformer
        from labelanything_tpu.utils.torch_import import (
            convert_dcama_state_dict, merge_into_params)

        ours = SwinTransformer(img_size=64, patch_size=4, window_size=4,
                               embed_dim=16, depths=(1, 2, 2, 1),
                               num_heads=(1, 2, 2, 4))
        x = self._inputs()
        args = (jnp.asarray(x.transpose(0, 2, 3, 1)),)
        params = ours.init(jax.random.key(0), *args)
        sd = {f"feature_extractor.{k}": v for k, v in weights.items()}
        converted = convert_dcama_state_dict(sd)["feature_extractor"]
        params = merge_into_params(params, converted)
        feats = ours.apply(params, *args)
        out = {}
        for i, f in enumerate(feats):
            b, h, w, c = f.shape
            out[f"feat{i}"] = np.asarray(f).reshape(b, h * w, c)
        return out

    def compare(self, ours, ref):
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], rtol=2e-3, atol=2e-4,
                                       err_msg=f"{self.name}:{k}")


# -- DCAMA head (2-shot) ----------------------------------------------------

@register
class DcamaHeadCase(Case):
    name = "dcama_head_2shot"
    weight_seed = 202
    in_ch = (16, 32, 64, 128)
    stack_ids = (1, 3, 5, 6)
    shapes6 = ((16, 16, 16), (32, 8, 8), (32, 8, 8), (64, 4, 4), (64, 4, 4),
               (128, 2, 2))

    def _inputs(self):
        rng = np.random.default_rng(2002)
        b, shots = 1, 2
        qf = [rng.standard_normal((b, c, h, w)).astype(np.float32)
              for c, h, w in self.shapes6]
        sf = [[rng.standard_normal((b, c, h, w)).astype(np.float32)
               for c, h, w in self.shapes6] for _ in range(shots)]
        mask = rng.integers(0, 2, (b, shots, 64, 64)).astype(np.float32)
        return qf, sf, mask

    def _ref_module(self):
        import torch

        from tests._reference import load

        ref_dcama_mod = load("label_anything.models.dcama.dcama")
        return ref_dcama_mod.DCAMA_model(list(self.in_ch),
                                         torch.tensor(self.stack_ids))

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._ref_module(), weights)
        qf, sf, mask = self._inputs()
        qf_t = [torch.from_numpy(t) for t in qf]
        sf_t = [[torch.from_numpy(t) for t in row] for row in sf]
        with torch.no_grad():
            out = ref(qf_t, sf_t, torch.from_numpy(mask), nshot=2)
        return {"out": out.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.dcama import DCAMAModel
        from labelanything_tpu.utils.torch_import import (
            convert_dcama_state_dict, merge_into_params)

        ours = DCAMAModel(in_channels=self.in_ch, stack_ids=self.stack_ids)
        qf, sf, mask = self._inputs()
        shots = len(sf)
        qf_j = [jnp.asarray(t.transpose(0, 2, 3, 1)) for t in qf]
        sf_j = [jnp.stack([sf[k][i].transpose(0, 2, 3, 1)
                           for k in range(shots)], axis=1)
                for i in range(len(self.shapes6))]
        mask_j = jnp.asarray(mask)
        params = ours.init(jax.random.key(0), qf_j, sf_j, mask_j)
        sd = {f"model.{k}": v for k, v in weights.items()}
        converted = convert_dcama_state_dict(sd)["model"]
        params = merge_into_params(params, converted)
        out = np.asarray(ours.apply(params, qf_j, sf_j, mask_j))
        return {"out": out.transpose(0, 3, 1, 2)}

    def compare(self, ours, ref):
        np.testing.assert_allclose(ours["out"], ref["out"],
                                   rtol=2e-3, atol=2e-4)


# -- FPTrans ----------------------------------------------------------------

@register
class FPTransCase(Case):
    name = "fptrans_1shot"
    weight_seed = 203
    shot = 1

    def _inputs(self):
        rng = np.random.default_rng(2003)
        b, img = 2, 64
        q = rng.standard_normal((b, img, img, 3)).astype(np.float32)
        sx = rng.standard_normal((b, self.shot, img, img, 3)).astype(np.float32)
        sy = rng.integers(0, 2, (b, self.shot, img, img)).astype(np.float32)
        return q, sx, sy

    def _ref_module(self):
        from tests.test_fptrans import build_ref

        return build_ref(self.shot)

    def ref_shapes(self):
        return state_shapes(self._ref_module().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch
        from tests.test_fptrans import _FakeSampler

        ref = _load_torch(self._ref_module(), weights)
        # deterministic samplers survive the weight reload
        ref.bg_sampler = _FakeSampler()
        ref.encoder.backbone.sampler = _FakeSampler()
        q, sx, sy = self._inputs()
        with torch.no_grad():
            out = ref(torch.from_numpy(q.transpose(0, 3, 1, 2)),
                      torch.from_numpy(sx.transpose(0, 1, 4, 2, 3)),
                      torch.from_numpy(sy))["out"]
        return {"out": out.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.fptrans import FPTrans
        from labelanything_tpu.utils.torch_import import (
            convert_fptrans_state_dict, merge_into_params)

        ours = FPTrans(image_size=64, embed_dim=32, depth=2, num_heads=2,
                       bg_num=2, num_prompt=12, ncls=5, shot=self.shot,
                       drop_rate=0.0, fps_first="first_valid")
        q, sx, sy = self._inputs()
        args = (jnp.asarray(q), jnp.asarray(sx), jnp.asarray(sy))
        params = ours.init(jax.random.key(0), *args)
        params = merge_into_params(params, convert_fptrans_state_dict(weights))
        return {"out": np.asarray(ours.apply(params, *args)["out"])}

    def compare(self, ours, ref):
        np.testing.assert_allclose(ours["out"], ref["out"],
                                   rtol=2e-3, atol=2e-3)


# -- PPNet ------------------------------------------------------------------

@register
class PPNetCase(Case):
    name = "ppnet_full"
    weight_seed = 204
    IMG = 65
    LAYERS = (1, 1, 1, 2)
    CENTERS = 3

    def _inputs(self):
        rng = np.random.default_rng(2004)
        wa, sh = 2, 1
        sup = rng.standard_normal((wa, sh, 1, 3, self.IMG, self.IMG)
                                  ).astype(np.float32)
        qry = rng.standard_normal((1, 3, self.IMG, self.IMG)).astype(np.float32)
        fore = rng.integers(0, 2, (wa, sh, 1, self.IMG, self.IMG)
                            ).astype(np.float32)
        return sup, qry, fore

    def _build_ref(self):
        import torch

        from tests._reference import load
        from tests.test_ppnet import tiny_ref_resnet

        ref_fss = load("label_anything.models.ppnet.FewShotSegPartResnetSem")
        cfg = {"center": self.CENTERS, "resnet": 50}
        orig_device = torch.device
        orig_resnet = ref_fss.resnet50Sem
        torch.device = lambda *a, **k: orig_device("cpu")
        ref_fss.resnet50Sem = lambda cfg=None, **kw: tiny_ref_resnet()
        try:
            ref = ref_fss.FewShotSegPart(cfg=cfg).eval()
        finally:
            torch.device = orig_device
            ref_fss.resnet50Sem = orig_resnet
        ref.kmeans.InitFunc = lambda x: x[: self.CENTERS]
        ref.kmeans.iters = 1
        return ref

    def ref_shapes(self):
        return state_shapes(self._build_ref().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._build_ref(), weights)
        ref.kmeans.InitFunc = lambda x: x[: self.CENTERS]
        ref.kmeans.iters = 1
        sup, qry, fore = self._inputs()
        back = 1.0 - fore
        wa, sh = sup.shape[:2]
        supp_imgs = [[torch.from_numpy(sup[w, s]) for s in range(sh)]
                     for w in range(wa)]
        fore_t = [[torch.from_numpy(fore[w, s]) for s in range(sh)]
                  for w in range(wa)]
        back_t = [[torch.from_numpy(back[w, s]) for s in range(sh)]
                  for w in range(wa)]
        # the reference forward hardcodes torch.device('cuda')
        orig_device = torch.device
        torch.device = lambda *a, **k: orig_device("cpu")
        try:
            with torch.no_grad():
                out, _, _ = ref(supp_imgs, fore_t, back_t,
                                [torch.from_numpy(qry)])
        finally:
            torch.device = orig_device
        return {"out": out.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.ppnet import PPNet
        from labelanything_tpu.utils.torch_import import (
            convert_ppnet_state_dict, merge_into_variables)

        ours = PPNet(num_centers=self.CENTERS, resnet_layers=self.LAYERS,
                     kmeans_iters=1)
        sup, qry, fore = self._inputs()
        back = 1.0 - fore
        args = (
            jnp.asarray(sup.transpose(2, 0, 1, 4, 5, 3)),
            jnp.asarray(fore.transpose(2, 0, 1, 3, 4)),
            jnp.asarray(back.transpose(2, 0, 1, 3, 4)),
            jnp.asarray(qry.transpose(0, 2, 3, 1)),
        )
        variables = ours.init(jax.random.key(0), *args)
        variables = merge_into_variables(variables,
                                         convert_ppnet_state_dict(weights))
        return {"out": np.asarray(ours.apply(variables, *args))}

    def compare(self, ours, ref):
        np.testing.assert_allclose(ours["out"], ref["out"],
                                   rtol=2e-3, atol=2e-3)


# -- DENet ------------------------------------------------------------------

@register
class DENetCase(Case):
    name = "denet_2way_2shot"
    weight_seed = 205
    IMG, NUM_CLASSES = 64, 9
    way, shot = 2, 2

    def _inputs(self):
        rng = np.random.default_rng(2005)
        b = 2
        s_imgs = rng.standard_normal(
            (b, self.way, self.shot, 3, self.IMG, self.IMG)).astype(np.float32)
        s_masks = rng.integers(
            0, 2, (b, self.way, self.shot, self.IMG, self.IMG)).astype(np.float32)
        q_img = rng.standard_normal((b, 3, self.IMG, self.IMG)).astype(np.float32)
        label = rng.integers(1, self.NUM_CLASSES, (b, self.way)).astype(np.int64)
        return s_imgs, s_masks, q_img, label

    def _build_ref(self):
        import torch

        from tests._reference import load
        from tests.test_denet import _TorchTinyBackbone

        ref_dn = load("label_anything.models.denet.head.denet")
        orig_backbone = ref_dn.get_backbone
        ref_dn.get_backbone = lambda name: _TorchTinyBackbone
        try:
            ref = ref_dn.DENet(maximum_num_classes=self.NUM_CLASSES,
                               visualize=False).eval()
        finally:
            ref_dn.get_backbone = orig_backbone
        return ref

    def ref_shapes(self):
        return state_shapes(self._build_ref().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._build_ref(), weights)
        s_imgs, s_masks, q_img, label = self._inputs()
        with torch.no_grad():
            full, binary = ref(torch.from_numpy(s_imgs),
                               torch.from_numpy(s_masks),
                               torch.from_numpy(q_img),
                               torch.from_numpy(label))
        return {"full": full.numpy(), "binary": binary.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from labelanything_tpu.models.denet import DENet
        from labelanything_tpu.utils.torch_import import (
            convert_denet_state_dict, merge_into_variables)

        class _JaxTinyBackbone(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(1024, (8, 8), strides=(8, 8), name="conv")(x)

        ours = DENet(maximum_num_classes=self.NUM_CLASSES,
                     backbone=_JaxTinyBackbone())
        s_imgs, s_masks, q_img, label = self._inputs()
        args = (jnp.asarray(s_imgs.transpose(0, 1, 2, 4, 5, 3)),
                jnp.asarray(s_masks),
                jnp.asarray(q_img.transpose(0, 2, 3, 1)),
                jnp.asarray(label))
        variables = ours.init(jax.random.key(0), *args)
        variables = merge_into_variables(
            variables, convert_denet_state_dict(weights, scope=""))
        full, binary = ours.apply(variables, *args)
        return {"full": np.asarray(full), "binary": np.asarray(binary)}

    def compare(self, ours, ref):
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], rtol=2e-3, atol=2e-4,
                                       err_msg=f"{self.name}:{k}")


# -- BAM --------------------------------------------------------------------

@register
class BAMCase(Case):
    name = "bam_1shot"
    weight_seed = 206
    IMG = 65
    shot = 1

    def _inputs(self):
        rng = np.random.default_rng(2006)
        b = 1
        x = rng.standard_normal((b, 3, self.IMG, self.IMG)).astype(np.float32)
        s_x = rng.standard_normal(
            (b, self.shot, 3, self.IMG, self.IMG)).astype(np.float32)
        s_y = rng.integers(0, 2, (b, self.shot, self.IMG, self.IMG)
                           ).astype(np.float32)
        return x, s_x, s_y

    def _build_ref(self):
        from tests.test_bam import build_ref

        with tempfile.TemporaryDirectory() as td:
            return build_ref(self.shot, Path(td))

    def ref_shapes(self):
        return state_shapes(self._build_ref().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._build_ref(), weights)
        x, s_x, s_y = self._inputs()
        with torch.no_grad():
            out = ref(torch.from_numpy(x), torch.from_numpy(s_x),
                      torch.from_numpy(s_y), None, None, None)
        return {"out": out.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.bam import BAM
        from labelanything_tpu.utils.torch_import import (
            convert_bam_state_dict, merge_into_variables)

        ours = BAM(shot=self.shot, base_classes=60)
        x, s_x, s_y = self._inputs()
        args = (jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(s_x.transpose(0, 1, 3, 4, 2)),
                jnp.asarray(s_y))
        variables = ours.init(jax.random.key(0), *args)
        variables = merge_into_variables(
            variables, convert_bam_state_dict(weights, scope=""))
        return {"out": np.asarray(ours.apply(variables, *args))}

    def compare(self, ours, ref):
        np.testing.assert_allclose(ours["out"], ref["out"],
                                   rtol=2e-3, atol=2e-3)


# -- HDMNet -----------------------------------------------------------------

@register
class HDMNetCase(Case):
    name = "hdmnet_1shot"
    weight_seed = 307
    # argsort-reordered priors make HDMNet chaotic at unit weight scale
    # (see Case.weight_damp) — damped, torch-vs-jax agree to ~1e-4
    weight_damp = 0.5
    IMG = 65
    shot = 1

    def _inputs(self):
        rng = np.random.default_rng(2007)
        b = 1
        x = rng.standard_normal((b, 3, self.IMG, self.IMG)).astype(np.float32)
        s_x = rng.standard_normal(
            (b, self.shot, 3, self.IMG, self.IMG)).astype(np.float32)
        s_y = rng.integers(0, 2, (b, self.shot, self.IMG, self.IMG)
                           ).astype(np.float32)
        return x, s_x, s_y

    def _build_ref(self):
        from tests.test_hdmnet import build_ref

        with tempfile.TemporaryDirectory() as td:
            return build_ref(self.shot, Path(td))

    def ref_shapes(self):
        return state_shapes(self._build_ref().state_dict())

    def ref_forward(self, weights):
        import torch

        from tests.golden import _load_torch

        ref = _load_torch(self._build_ref(), weights)
        x, s_x, s_y = self._inputs()
        with torch.no_grad():
            out = ref(torch.from_numpy(x), s_x=torch.from_numpy(s_x),
                      s_y=torch.from_numpy(s_y))
        return {"out": out.numpy()}

    def our_forward(self, weights):
        import jax
        import jax.numpy as jnp

        from labelanything_tpu.models.hdmnet import HDMNet
        from labelanything_tpu.utils.torch_import import (
            convert_hdmnet_state_dict, merge_into_variables)

        ours = HDMNet(shot=self.shot, base_classes=60)
        x, s_x, s_y = self._inputs()
        args = (jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(s_x.transpose(0, 1, 3, 4, 2)),
                jnp.asarray(s_y))
        variables = ours.init(jax.random.key(0), *args)
        variables = merge_into_variables(
            variables, convert_hdmnet_state_dict(weights, scope=""))
        return {"out": np.asarray(ours.apply(variables, *args))}

    def compare(self, ours, ref):
        np.testing.assert_allclose(ours["out"], ref["out"],
                                   rtol=2e-3, atol=2e-3)
