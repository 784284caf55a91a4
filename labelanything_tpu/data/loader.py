"""Host episode loader with background prefetch.

The reference uses torch DataLoader worker processes (reference:
data/__init__.py get_dataloaders, dataloader.num_workers). Here episode
assembly (RLE decode, PIL resize, prompt tensorization — NumPy/PIL code that
releases the GIL for its hot parts) runs on a thread pool, batches are
collated and handed to the consumer while the next ones build, keeping the
TPU fed without multiprocessing serialization overhead.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

from .dataset import LabelAnythingDataset, VariableBatchSampler


class EpisodeLoader:
    def __init__(
        self,
        dataset: LabelAnythingDataset,
        batch_sampler: VariableBatchSampler,
        num_workers: int = 8,
        prefetch_batches: int = 2,
        group_size: int = 1,
    ):
        """``group_size`` merges that many consecutive per-rank batches (the
        sampler replicates each shape tuple once per data-parallel rank,
        reference: data/dataset.py:281-306) into one global batch whose
        leading axis is divisible by the mesh's data axis."""
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.group_size = max(1, group_size)

    def __len__(self):
        return len(self.batch_sampler) // self.group_size

    def __iter__(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    group, n_batches = [], 0
                    for batch_idxs in self.batch_sampler:
                        if stop.is_set():
                            return
                        group.extend(batch_idxs)
                        n_batches += 1
                        if n_batches == self.group_size:
                            items = list(pool.map(self.dataset.__getitem__, group))
                            out_q.put(("item", self.dataset.collate_fn(items)))
                            group, n_batches = [], 0
                    if group:
                        items = list(pool.map(self.dataset.__getitem__, group))
                        out_q.put(("item", self.dataset.collate_fn(items)))
            except BaseException as exc:  # propagate to consumer
                out_q.put(("error", exc))
                return
            out_q.put(("done", None))

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                kind, value = out_q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise value
                yield value
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
