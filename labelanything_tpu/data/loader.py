"""Host episode loader with background prefetch.

The reference uses torch DataLoader worker processes (reference:
data/__init__.py get_dataloaders, dataloader.num_workers). Here episode
assembly offers two modes:

* thread mode (default): a thread pool assembles items; cheap to start,
  fine for the embeddings path (safetensors reads release the GIL) and for
  tests.
* process mode (``use_processes=True``): episode assembly AND collation run
  in worker processes. The images path is GIL-bound in practice — profiling
  shows fp32 pixel memcpys (np.stack in collate), host normalization, and
  prompt tensorization dominating, none of which parallelize on threads —
  so 8 threads assemble only ~12 episodes/sec at 480px while the TPU trains
  at ~620: process workers remove the GIL from the equation, like the
  reference's DataLoader workers. Workers are spawned (not forked — the
  initialized TPU client does not survive forks) and receive the pickled
  dataset once via an initializer.
"""

from __future__ import annotations

import multiprocessing
import os
import pickle
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Optional

from .dataset import LabelAnythingDataset, VariableBatchSampler

_WORKER_DATASET = None


def _proc_init(pickled_dataset: bytes, worker_counter, base_seed) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = pickle.loads(pickled_dataset)
    # all workers share the SAME base seed: episode randomness is keyed by
    # (seed, epoch, episode_index) via EpisodeRng (data/rng.py), so draws
    # are identical no matter which worker assembles an episode — stricter
    # than the reference's per-worker streams, and what seeded validation
    # reruns need. The counter stays for workers to know their id.
    with worker_counter.get_lock():
        worker_counter.value += 1
    if base_seed is not None and hasattr(_WORKER_DATASET, "reseed"):
        _WORKER_DATASET.reseed(int(base_seed))


def _proc_collate(indices, epoch: int = 0) -> bytes:
    """Assemble + collate one batch inside the worker; returns the collated
    pytree (pickled implicitly by the executor)."""
    ds = _WORKER_DATASET
    if hasattr(ds, "set_epoch"):
        ds.set_epoch(epoch)
    return ds.collate_fn([ds[i] for i in indices])


class EpisodeLoader:
    def __init__(
        self,
        dataset: LabelAnythingDataset,
        batch_sampler: VariableBatchSampler,
        num_workers: int = 8,
        prefetch_batches: int = 2,
        group_size: int = 1,
        use_processes: bool = False,
        seed: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``group_size`` merges that many consecutive per-rank batches (the
        sampler replicates each shape tuple once per data-parallel rank,
        reference: data/dataset.py:281-306) into one global batch whose
        leading axis is divisible by the mesh's data axis.

        Multi-host (``process_count > 1``): every host runs the SAME sampler
        schedule (same seed -> identical shapes and episode permutation), but
        each assembles only the ``group_size / process_count`` rank-batches
        belonging to its local devices — rank slot ``p*L .. (p+1)*L`` of each
        group. The global array is then stitched by
        ``parallel.mesh.shard_batch`` via
        ``jax.make_array_from_process_local_data``. This removes the N-x
        redundant host assembly a naive pod run would pay (the reference
        feeds each DDP rank its own DataLoader shard:
        slurm/launch_run_multinode_exe:11-20)."""
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.group_size = max(1, group_size)
        self.use_processes = use_processes
        self.seed = seed
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        if self.group_size % self.process_count != 0:
            raise ValueError(
                f"group_size ({self.group_size}) must be divisible by "
                f"process_count ({self.process_count}): one rank-batch per "
                f"device, devices evenly spread over hosts")
        self.local_ranks = self.group_size // self.process_count
        self._epoch = 0
        self._pool: Optional[ProcessPoolExecutor] = None

    def __len__(self):
        return len(self.batch_sampler) // self.group_size

    def updates_per_epoch(self, substitute: bool = True,
                          accumulate: bool = False) -> int:
        """Exact optimizer updates one epoch produces — the divisor for
        ``step_moment: epoch`` schedules (reference steps the scheduler once
        per epoch, experiment/utils.py:77-100). With substitution and no
        accumulation every pass updates (num_examples + 1 per batch); with
        accumulation (or substitute off) each merged group updates once.
        Shuffling permutes but never changes the epoch's shape multiset, so
        this is constant across epochs."""
        n_groups = len(self)
        if accumulate or not substitute:
            return max(1, n_groups)
        from ..typing import BatchMetadataKeys as K

        examples = self.batch_sampler.batch_metadata.get(K.NUM_EXAMPLES)
        if not isinstance(examples, list):
            return max(1, n_groups)
        # one merged group = group_size consecutive sampler batches with the
        # same shape tuple (rank replication) -> passes counted per group
        per_group = examples[::self.group_size][:n_groups]
        return max(1, sum((m or 1) + 1 for m in per_group))

    # ------------------------------------------------------------------ #

    def _process_pool(self) -> ProcessPoolExecutor:
        """Lazily started, reused across epochs (spawn cost ~seconds)."""
        if self._pool is None:
            ctx = multiprocessing.get_context("spawn")
            counter = ctx.Value("i", 0)
            # With seed=None every spawned worker would unpickle byte-identical
            # dataset RNG state and draw duplicate episode randomness; derive a
            # one-shot fallback so base+worker_id decorrelation always applies.
            seed = self.seed
            if seed is None:
                seed = int.from_bytes(os.urandom(4), "little")
            self._pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=ctx,
                initializer=_proc_init,
                initargs=(pickle.dumps(self.dataset), counter, seed),
            )
        return self._pool

    def reseed(self, seed: int) -> None:
        """Reseed the dataset for the seeded rerun protocol (reference:
        experiment/run.py:618-641 seed = base + run). In process mode the
        workers hold their own dataset copies, so the pool is torn down and
        respawned from the reseeded pickle on the next iteration."""
        self.seed = seed
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(seed)
        if self._pool is not None:
            self.close()

    def set_epoch(self, epoch: int) -> None:
        """Propagate the epoch into episode seeding (data/rng.py). Process
        workers receive it with each submitted batch, so no respawn."""
        self._epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort; Run/Experimenter also close explicitly
        try:
            self.close()
        except Exception:
            pass

    def _groups(self):
        """Yield this process's episode indices for each global batch: rank
        slots [p*L, (p+1)*L) of every ``group_size``-batch window."""
        lo = self.process_index * self.local_ranks
        hi = lo + self.local_ranks
        group, pos = [], 0
        for batch_idxs in self.batch_sampler:
            if lo <= pos < hi:
                group.extend(batch_idxs)
            pos += 1
            if pos == self.group_size:
                if group:
                    yield group
                group, pos = [], 0
        if group:
            yield group

    def _iter_processes(self) -> Iterator:
        pool = self._process_pool()
        pending = []
        window = self.num_workers + self.prefetch_batches
        for group in self._groups():
            pending.append(pool.submit(_proc_collate, group, self._epoch))
            while len(pending) >= window:
                yield pending.pop(0).result()
        for fut in pending:
            yield fut.result()

    def _iter_threads(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for group in self._groups():
                        if stop.is_set():
                            return
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

    def __iter__(self) -> Iterator:
        if self.use_processes:
            yield from self._iter_processes()
        else:
            yield from self._iter_threads()
