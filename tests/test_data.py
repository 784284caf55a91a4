"""Data-engine tests: RLE codec, transforms, episodic COCO dataset, sampler,
collate — ending in a real end-to-end forward through the model."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from labelanything_tpu.data import rle
from labelanything_tpu.data.coco import CocoLVISDataset
from labelanything_tpu.data.dataset import LabelAnythingDataset, VariableBatchSampler
from labelanything_tpu.data.transforms import (
    CustomNormalize, CustomResize, PromptsProcessor, get_preprocess_shape,
)
from labelanything_tpu.typing import BatchKeys, IGNORE_INDEX, PromptType


# --------------------------------------------------------------------- #
# RLE codec
# --------------------------------------------------------------------- #

def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = (rng.random((37, 53)) > 0.7).astype(np.uint8)
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(mask, dec)


def test_rle_empty_and_full():
    for mask in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)


def test_uncompressed_rle():
    # column-major runs: 3 zeros, 2 ones, 7 zeros in a 3x4 image
    ann = {"size": [3, 4], "counts": [3, 2, 7]}
    mask = rle.ann_to_mask(ann, 3, 4)
    expected = np.zeros((3, 4), np.uint8)
    expected[0, 1] = 1  # flat col-major idx 3 -> (row 0, col 1)
    expected[1, 1] = 1
    np.testing.assert_array_equal(mask, expected)


def test_polygon_rasterization():
    poly = [[1.0, 1.0, 6.0, 1.0, 6.0, 6.0, 1.0, 6.0]]
    mask = rle.poly_to_mask(poly, 8, 8)
    assert mask[3, 3] == 1 and mask[0, 0] == 0
    assert mask.sum() >= 25


def test_degenerate_polygon_fallback():
    mask = rle.ann_to_mask([[100.0, 100.0]], 8, 8)  # out of bounds point
    assert mask.sum() == 1 and mask[7, 7] == 1


# --------------------------------------------------------------------- #
# transforms
# --------------------------------------------------------------------- #

def test_preprocess_shape_and_pad():
    assert get_preprocess_shape(480, 640, 1024) == (768, 1024)
    img = Image.new("RGB", (640, 480), (128, 64, 32))
    resized = CustomResize(64)(img)
    assert resized.size == (64, 48)
    out = CustomNormalize(64)(resized)
    assert out.shape == (64, 64, 3)
    assert (out[48:] == 0).all()  # bottom padding


def test_prompts_processor_coords():
    pp = PromptsProcessor(long_side_length=100)
    coords = pp.apply_coords(np.asarray([[200.0, 100.0]]), (200, 400))
    # long side 400 -> 100; (H, W) = (200, 400) -> (50, 100)
    np.testing.assert_allclose(coords, [[50.0, 25.0]])
    box = pp.convert_bbox([10, 20, 30, 40], 200, 400)
    assert box == [10, 20, 40, 60]


# --------------------------------------------------------------------- #
# synthetic COCO fixture
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    n_imgs = 8
    for i in range(1, n_imgs + 1):
        h, w = 60 + 4 * i, 80
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        # every image has cat 1; even images also cat 2
        cats = [1] if i % 2 else [1, 2]
        for cat in cats:
            x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
            bw, bh = int(rng.integers(8, 20)), int(rng.integers(8, 20))
            poly = [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]]
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "segmentation": poly, "bbox": [x0, y0, bw, bh],
                "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    inst = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    (root / "instances.json").write_text(json.dumps(inst))
    return root


def test_coco_dataset_episode(coco_dir):
    ds = CocoLVISDataset(
        name="coco",
        instances_path=str(coco_dir / "instances.json"),
        img_dir=str(coco_dir / "images"),
        image_size=64,
        add_box_noise=False,
        seed=0,
    )
    from labelanything_tpu.typing import BatchMetadataKeys

    meta = {
        BatchMetadataKeys.PROMPT_TYPES: [PromptType.POINT, PromptType.BBOX,
                                         PromptType.MASK],
        BatchMetadataKeys.NUM_EXAMPLES: 2,
        BatchMetadataKeys.PROMPT_CHOICE_LEVEL: "batch",
    }
    item = ds[(0, meta)]
    n_imgs = item[BatchKeys.PROMPT_MASKS].shape[0]
    assert n_imgs == 3  # query + 2 examples
    c = item[BatchKeys.PROMPT_MASKS].shape[1]
    assert c >= 2  # bg + >= 1 class
    assert item[BatchKeys.IMAGES].shape == (3, 64, 64, 3)
    gt = item[BatchKeys.GROUND_TRUTHS]
    assert gt.shape == (3, 64, 64)
    assert set(np.unique(gt)) <= set(range(c)) | {IGNORE_INDEX}
    # bg flag always on for every example
    assert (item[BatchKeys.FLAG_EXAMPLES][:, 0] == 1).all()


def test_dataset_sampler_collate_model_e2e(coco_dir):
    union = LabelAnythingDataset(
        datasets_params={"coco": {
            "instances_path": str(coco_dir / "instances.json"),
            "img_dir": str(coco_dir / "images"),
        }},
        common_params={"image_size": 64, "add_box_noise": False, "seed": 0},
    )
    sampler = VariableBatchSampler(
        union, possible_batch_example_nums=[[2, 1], [2, 2]],
        shuffle=True, seed=1,
    )
    batches = list(iter(sampler))
    assert sum(len(b) for b in batches) == len(union)

    (batch, gts), names = union.collate_fn([union[i] for i in batches[0]])
    assert names[0] == "coco"
    b, n = batch[BatchKeys.IMAGES].shape[:2]
    assert b == len(batches[0])
    assert gts.shape == (b, n, 64, 64)
    # annotation axis is bucketed
    assert batch[BatchKeys.PROMPT_POINTS].shape[3] % 8 == 0

    # end-to-end: substitutor pass -> model forward
    from labelanything_tpu.models.build_lam import build_lam
    from labelanything_tpu.train.substitutor import Substitutor
    from labelanything_tpu.typing import ResultDict

    model = build_lam(
        use_vit=False, image_embed_dim=3, embed_dim=32, image_size=64,
        class_encoder={"name": "RandomMatrixEncoder", "bank_size": 10},
    )
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in (BatchKeys.CLASSES, BatchKeys.IMAGE_IDS)}
    # stand-in "precomputed embeddings": 16x-strided image pixels (B, N, 4, 4, 3),
    # projected 3 -> 32 by the neck (image_embed_dim=3 above)
    jb[BatchKeys.EMBEDDINGS] = jb.pop(BatchKeys.IMAGES)[:, :, ::16, ::16, :]
    sub = Substitutor(num_points=1)
    sub.reset(jb)
    input_dict, gt = next(sub)
    params = jax.jit(model.init)(jax.random.key(0), input_dict)
    out = jax.jit(model.apply)(params, input_dict)
    logits = out[ResultDict.LOGITS]
    c = batch[BatchKeys.PROMPT_MASKS].shape[2]
    assert logits.shape == (b, c, 64, 64)
    assert np.isfinite(np.asarray(logits)).any()


def test_episode_loader_process_mode(coco_dir):
    """Process-based loader: dataset pickles, workers assemble + collate,
    batches match the thread-mode schema (the canonical production path —
    thread mode is GIL-bound on the images path, see data/loader.py)."""
    import pickle

    union = LabelAnythingDataset(
        datasets_params={"coco": {
            "instances_path": str(coco_dir / "instances.json"),
            "img_dir": str(coco_dir / "images"),
        }},
        common_params={"image_size": 64, "add_box_noise": False, "seed": 0},
    )
    pickle.dumps(union)  # process workers require a picklable dataset

    from labelanything_tpu.data.loader import EpisodeLoader

    sampler = VariableBatchSampler(
        union, possible_batch_example_nums=[[2, 1]], shuffle=False, seed=1)
    loader = EpisodeLoader(union, sampler, num_workers=2, use_processes=True)
    try:
        batches = list(iter(loader))
        assert len(batches) == len(loader)
        (batch, gts), names = batches[0]
        assert names[0] == "coco"
        assert gts.shape[0] == 2
        assert BatchKeys.IMAGES in batch or BatchKeys.EMBEDDINGS in batch
    finally:
        loader.close()


def test_native_rle_matches_numpy_codec():
    """The ctypes C decoder (csrc/larle.c) must agree with the pure-NumPy
    codec on round-tripped random masks; skip only if no C compiler built
    the shared object."""
    from labelanything_tpu.data import native, rle

    lib = native.get_lib()
    if lib is None:
        import pytest as _pytest
        _pytest.skip("native RLE lib unavailable (no C compiler)")

    rng = np.random.default_rng(0)
    for h, w in [(37, 61), (64, 64), (128, 96)]:
        mask = (rng.random((h, w)) < 0.3).astype(np.uint8)
        obj = rle.encode(mask)
        # decode() prefers the native path when available
        dec = rle.decode(obj)
        np.testing.assert_array_equal(dec, mask)
        fast = native.rle_decode(obj["counts"], h, w)
        assert fast is not None
        np.testing.assert_array_equal(fast, mask)


def test_nearest_gather_matches_pil():
    """nearest_index_map must reproduce PIL NEAREST exactly (the maps are
    obtained from PIL itself; this checks the separability assumption the
    gather fast paths rely on) across up/down/identity resizes."""
    from labelanything_tpu.data.transforms import nearest_index_map

    rng = np.random.default_rng(3)
    for (h, w), (nh, nw) in [((37, 61), (256, 256)), ((480, 640), (256, 256)),
                             ((480, 640), (360, 480)), ((11, 7), (11, 7)),
                             ((300, 200), (1024, 683))]:
        arr = rng.integers(0, 255, (h, w), np.int32)
        ref = np.asarray(Image.fromarray(arr, mode="I").resize(
            (nw, nh), Image.NEAREST), np.int32)
        got = arr[np.ix_(nearest_index_map(h, nh), nearest_index_map(w, nw))]
        np.testing.assert_array_equal(got, ref)


def test_apply_masks_gather_matches_pil():
    """The composed-gather apply_masks must be bit-exact with the original
    PIL chain (apply_masks_pil) for both preprocess modes, including sizes
    where the resized extent does not tile the padded frame evenly."""
    rng = np.random.default_rng(4)
    for custom in (True, False):
        pp = PromptsProcessor(long_side_length=480, masks_side_length=256,
                              custom_preprocess=custom)
        for h, w in [(321, 481), (480, 640), (59, 207), (640, 480), (480, 480)]:
            masks = [(rng.random((h, w)) < 0.4).astype(np.uint8)
                     for _ in range(3)]
            np.testing.assert_array_equal(
                pp.apply_masks(list(masks)), pp.apply_masks_pil(list(masks)))
        np.testing.assert_array_equal(
            pp.apply_masks([]), np.zeros((256, 256), np.uint8))


def test_gt_to_input_frame_matches_pil(coco_dir):
    """gt_to_input_frame's gather must match the previous PIL mode-'I'
    nearest round-trip bit-for-bit."""
    ds = CocoLVISDataset(instances_path=str(coco_dir / "instances.json"),
                         img_dir=str(coco_dir / "images"), image_size=480,
                         seed=0)
    rng = np.random.default_rng(5)
    for h, w in [(321, 481), (480, 640), (59, 207)]:
        gt = rng.integers(0, 7, (h, w), np.int32)
        nh, nw = get_preprocess_shape(h, w, 480)
        img = Image.fromarray(gt.astype(np.int32), mode="I").resize(
            (nw, nh), Image.NEAREST)
        ref = np.full((480, 480), IGNORE_INDEX, np.int32)
        ref[:nh, :nw] = np.asarray(img, np.int32)
        np.testing.assert_array_equal(ds.gt_to_input_frame(gt), ref)


def test_gt_input_frame_fused_matches_two_step(coco_dir):
    """compute_ground_truths_input_frame must equal gt_to_input_frame over
    compute_ground_truths bit-for-bit (assignment commutes with the
    nearest gather)."""
    ds = CocoLVISDataset(instances_path=str(coco_dir / "instances.json"),
                         img_dir=str(coco_dir / "images"), image_size=480,
                         seed=0)
    image_ids = ds.image_ids[:3]
    cat_ids = sorted(ds.categories.keys())
    cat_ids.insert(0, -1)
    two_step = [ds.gt_to_input_frame(g)
                for g in ds.compute_ground_truths(image_ids, cat_ids)]
    fused = ds.compute_ground_truths_input_frame(image_ids, cat_ids)
    for a, b in zip(fused, two_step):
        np.testing.assert_array_equal(a, b)


def test_native_label_fill_matches_numpy():
    """csrc label_fill must equal the numpy fancy-index write."""
    from labelanything_tpu.data import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable (no C compiler)")
    rng = np.random.default_rng(6)
    for h, w in [(37, 61), (480, 640)]:
        mask = (rng.random((h, w)) < 0.3).astype(np.uint8)
        a = rng.integers(-5, 5, (h, w)).astype(np.int32)
        b = a.copy()
        assert native.label_fill(mask, a, 7)
        b[mask == 1] = 7
        np.testing.assert_array_equal(a, b)
    # contract: refuses non-contiguous / wrong dtypes
    assert not native.label_fill(mask[:, ::2], a[:, : w // 2 + w % 2], 1)
