"""Built-in dataset episode browser for the demo
(reference: label_anything/demo/builtin.py:169-256 ``built_in_dataset`` and
demo/utils.py:131-146 ``retrieve_models``).

The reference mounts a Streamlit page that builds a COCO-20i validation
dataloader from UI knobs (ways/shots/fold/prompt types), steps through
episodes, renders the support images with their prompt overlays, runs the
model on the episode, and offers the prompt + prediction plots as a zip
download. Streamlit is not in the TPU image, so the equivalent here is a
headless, testable core (``EpisodeBrowser``) that the stdlib HTTP demo
(``demo/app.py``) exposes under ``/builtin/*`` JSON endpoints: every
reference interaction (Load dataset -> Get sample -> Predict -> Download
Results) maps to one endpoint.
"""

from __future__ import annotations

import base64
import io
import itertools
import zipfile
from typing import Any, Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from ..data.dataset import LabelAnythingDataset, VariableBatchSampler
from ..data.loader import EpisodeLoader
from ..train.substitutor import Substitutor
from ..typing import BatchKeys, ResultDict
from ..utils.visualize import colorize, denormalize, draw_prompts, overlay

# Hub ids the reference demo falls back to when the hub listing is
# unreachable (reference: demo/utils.py:131-135).
DEFAULT_MODELS = [
    "pasqualedem/label_anything_sam_1024_coco",
    "pasqualedem/label_anything_256_sam_1024_coco",
]


def retrieve_models() -> List[str]:
    """List the author's label_anything checkpoints on the HF hub, falling
    back to the known ids offline (reference: demo/utils.py:138-146)."""
    try:
        from huggingface_hub import list_models

        ids = [m.id for m in list_models(author="pasqualedem")
               if m.id.startswith("pasqualedem/label_anything")]
        return ids or DEFAULT_MODELS
    except Exception:
        return DEFAULT_MODELS


def _png_b64(arr: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class EpisodeBrowser:
    """Step through built-in dataset episodes and run a model on them.

    ``forward`` is any callable mapping an input dict to a ResultDict (the
    demo wires ``api.LabelAnything.__call__``); the browser itself is
    model-agnostic so tests drive it with a stub.
    """

    def __init__(
        self,
        datasets_params: Dict[str, dict],
        common_params: Dict[str, Any],
        n_ways: int = 1,
        n_shots: int = 1,
        prompt_types: Optional[List[str]] = None,
        seed: int = 42,
    ):
        # reference builtin.py:198-201: the UI knobs become dataset params
        for p in datasets_params.values():
            p.setdefault("n_ways", n_ways)
            p.setdefault("n_shots", n_shots)
            p.setdefault("do_subsample", False)
            p.setdefault("add_box_noise", False)
        self.dataset = LabelAnythingDataset(datasets_params, common_params)
        sampler = VariableBatchSampler(
            self.dataset,
            possible_batch_example_nums=[[1, n_shots]],
            prompt_types=prompt_types,
            seed=seed,
        )
        self.loader = EpisodeLoader(self.dataset, sampler, num_workers=0)
        self._it = iter(self.loader)
        self.batch: Optional[Dict[str, Any]] = None
        self.gt: Optional[np.ndarray] = None
        self.dataset_name: Optional[str] = None
        self._prompt_pngs: List[np.ndarray] = []
        self._result_pngs: List[np.ndarray] = []
        self._result_titles: List[str] = []

    # -- Get sample (reference builtin.py:206-222) ---------------------- #

    def sample(self) -> Dict[str, Any]:
        """Advance to the next episode; return support images with prompt
        overlays and their category names."""
        try:
            (batch, gt), names = next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            (batch, gt), names = next(self._it)
        self.batch, self.gt, self.dataset_name = batch, gt, names[0]
        cats = self.dataset.categories[self.dataset_name]
        class_ids = batch[BatchKeys.CLASSES][0]
        images = np.asarray(batch[BatchKeys.IMAGES])[0]  # (N, H, W, 3)
        out = []
        self._prompt_pngs = []
        # images[0] is the query; 1.. are the support examples; raw-batch
        # prompt rows align with image indices (reference builtin.py:47-69)
        for ex in range(1, images.shape[0]):
            drawn = draw_prompts(denormalize(images[ex]), batch,
                                 sample=0, example=ex)
            self._prompt_pngs.append(drawn)
            ids_ex = class_ids[ex] if ex < len(class_ids) else []
            names_ex = [cats[c]["name"] for c in ids_ex if c in cats]
            out.append({"image": _png_b64(drawn), "classes": names_ex})
        query = denormalize(images[0])
        return {
            "dataset": self.dataset_name,
            "query": _png_b64(query),
            "supports": out,
        }

    # -- Predict (reference builtin.py:73-88, 143-166) ------------------ #

    def predict(self, forward: Callable[[Dict[str, Any]], Dict[str, Any]]
                ) -> Dict[str, Any]:
        """Run one no-substitution pass of the current episode through
        ``forward`` and return query/GT/prediction overlays."""
        if self.batch is None:
            raise RuntimeError("call sample() first")
        sub = Substitutor(substitute=False)
        sub.reset(dict(self.batch))
        input_dict, one_gt = next(iter(sub))
        result = forward(input_dict)
        logits = np.asarray(result[ResultDict.LOGITS])
        seg = logits.argmax(axis=1)[0]
        gt = np.asarray(one_gt)[0]

        images = np.asarray(self.batch[BatchKeys.IMAGES])[0]
        query = denormalize(images[0])
        h, w = query.shape[:2]

        def up(lab):
            return np.asarray(Image.fromarray(lab.astype(np.int32), "I")
                              .resize((w, h), Image.NEAREST))

        self._result_pngs = [
            overlay(query, up(seg)),
            colorize(up(seg)),
            overlay(query, up(gt)),
            colorize(up(gt)),
        ]
        self._result_titles = ["pred_overlay", "pred", "gt_overlay", "gt"]
        iou = _quick_iou(seg, gt)
        return {
            "plots": {t: _png_b64(p) for t, p in
                      zip(self._result_titles, self._result_pngs)},
            "binary_iou": iou,
        }

    # -- Download Results (reference builtin.py:229-256) ---------------- #

    def download_zip(self) -> bytes:
        """Zip of the prompt overlays + result plots, like the reference's
        Download Results button."""
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for i, img in enumerate(self._prompt_pngs):
                zf.writestr(f"prompt_{i + 1}.png",
                            base64.b64decode(_png_b64(img)))
            for title, img in zip(self._result_titles, self._result_pngs):
                zf.writestr(f"result_{title}.png",
                            base64.b64decode(_png_b64(img)))
        return buf.getvalue()


def _quick_iou(seg: np.ndarray, gt: np.ndarray) -> float:
    """Foreground-vs-background IoU of one episode (UI feedback only; the
    real metrics live in train/metrics.py)."""
    if seg.shape != gt.shape:
        seg = np.asarray(Image.fromarray(seg.astype(np.int32), "I").resize(
            (gt.shape[1], gt.shape[0]), Image.NEAREST))
    valid = gt >= 0
    inter = float(((seg > 0) & (gt > 0) & valid).sum())
    union = float((((seg > 0) | (gt > 0)) & valid).sum())
    return inter / union if union else 1.0
