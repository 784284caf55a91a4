"""Single-worker episode-assembly profile: where the host loader's time goes.

Builds the same synthetic on-disk COCO the images-path bench uses
(real JPEG decode + polygon/RLE annotations), then runs episode assembly +
collate on ONE worker under cProfile and prints eps/s plus the top internal
costs. This is the instrument behind PERF.md's "round-5 loader breakdown";
the canonical throughput number comes from scripts/microbench_data.py.
"""

from __future__ import annotations

import cProfile
import io
import pathlib
import pstats
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(episodes: int = 96, top: int = 25) -> None:
    from labelanything_tpu.benchmarks import _write_synthetic_coco
    from labelanything_tpu.data.dataset import (LabelAnythingDataset,
                                                VariableBatchSampler)

    root = pathlib.Path(tempfile.mkdtemp(prefix="laprof_"))
    _write_synthetic_coco(root, n_images=64, image_size=480)

    union = LabelAnythingDataset(
        datasets_params={"coco": {
            "instances_path": str(root / "instances.json"),
            "img_dir": str(root / "images"),
        }},
        common_params={"image_size": 480, "add_box_noise": True, "seed": 0,
                       "device_normalize": True},
    )
    sampler = VariableBatchSampler(
        union, possible_batch_example_nums=[[8, 1], [4, 2]],
        prompt_types=None, shuffle=True, seed=1)
    union.set_epoch(0)

    def run():
        done = 0
        for batch_idx in sampler:
            (batch, gts), _ = union.collate_fn([union[b] for b in batch_idx])
            done += gts.shape[0]
            if done >= episodes:
                return done
        return done

    run()  # warm caches (index maps, native lib, PIL imports)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    n = run()
    prof.disable()
    dt = time.perf_counter() - t0
    print(f"single-worker: {n / dt:.1f} eps/s  ({n} episodes in {dt:.2f}s)")

    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(top)
    print(s.getvalue())
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("tottime").print_stats(top)
    print(s.getvalue())


if __name__ == "__main__":
    main()
