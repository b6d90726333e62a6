"""Dataset + prefetching batch loader for the host data pipeline.

Replaces torch DataLoader/DistributedSampler (pascal_voc.py:74-157): a
thread-pool decodes/augments the next batch while the device computes the
current step, and per-epoch shuffling is deterministic in (seed, epoch).
Multi-host sharding slices each global batch by process index; per-device
sharding happens inside the jitted step via shard_map.
"""

from __future__ import annotations

import concurrent.futures as futures
import multiprocessing
import os
import queue as queue_mod
import random
from typing import Iterator, Optional, Tuple

import numpy as np

from u2pl_tpu.config import Config
from u2pl_tpu.data.splits import parse_split, subsample
from u2pl_tpu.data.transforms import build_transform

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class SegDataset:
    """Image/label pairs from a split file (reference voc_dset/city_dset)."""

    def __init__(self, data_root, data_list, transform, seed=0, n_sup=None,
                 split="val"):
        pairs = parse_split(data_list)
        if n_sup is not None:
            pairs = subsample(pairs, n_sup, seed, split)
        self.pairs = pairs
        self.data_root = data_root
        self.transform = transform

    def __len__(self):
        return len(self.pairs)

    def load_raw(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        img_p = os.path.join(self.data_root, self.pairs[i][0])
        lab_p = os.path.join(self.data_root, self.pairs[i][1])
        # keep uint8: the native fused transform consumes raw bytes; the
        # numpy pipeline converts to float32 itself
        img = np.asarray(Image.open(img_p).convert("RGB"), np.uint8)
        lab = np.asarray(Image.open(lab_p).convert("L"), np.uint8)
        return img, lab

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        img, lab = self.load_raw(i)
        return self.transform(img, lab)


def epoch_indices(n: int, epoch: int, seed: int, shuffle: bool = True) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    rng = np.random.RandomState((seed + epoch) % (2**31))
    return rng.permutation(n)


# ---- process-worker plumbing (workers_mode="process") ----------------------
#
# The thread pool below is GIL-bound: PIL decode + the numpy/cv2 transform
# chain release the GIL only partially, so measured throughput ANTI-scales
# with thread count (docs/PERF.md "Host data-plane throughput") and one core
# tops out near ~90 img/s at 513^2 — an 8-chip host needs ~235 img/s.
# Process workers sidestep the GIL entirely (torch DataLoader's num_workers,
# reference pascal_voc.py:117-123).  Design:
#   - fork-context ProcessPoolExecutor, one persistent pool per EpochLoader
#     (reused across epochs; fork is cheap and inherits the loaded native
#     augment .so — the CDLL handle lives in a module global and is
#     fork-safe because augment.cc keeps no mutable state).
#   - the dataset ships to each worker ONCE via the pool initializer
#     (SegDataset is picklable: path list + plain-attribute transforms).
#   - batches return as pickled stacked arrays: at the uint8 device_normalize
#     crop (~0.79 MB/img) a pipe moves >1 GB/s, two orders of magnitude
#     above the target rate, so shared-memory slabs are not needed.
#   - every task re-seeds `random` + `np.random` from (seed, epoch, batch),
#     making process-mode augmentation DETERMINISTIC under any scheduling —
#     stronger than thread mode, where concurrent assembles interleave on
#     the shared global RNG.

_WORKER_DATASET: Optional["SegDataset"] = None


def _proc_worker_init(dataset: "SegDataset") -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _proc_assemble(indices: np.ndarray, task_seed: int):
    random.seed(task_seed)
    np.random.seed(task_seed)
    samples = [_WORKER_DATASET[int(i)] for i in indices]
    return tuple(
        np.stack([s[k] for s in samples]) for k in range(len(samples[0]))
    )


class EpochLoader:
    """Iterates batches for one epoch with background prefetch.

    drop_last semantics match the reference train loaders
    (pascal_voc.py:136-156).  `batch_size` is PER DATA-PARALLEL REPLICA,
    exactly like the reference's per-GPU DataLoader batch size: the global
    batch is ``batch_size * replicas_per_process * process_count`` and each
    host yields its ``batch_size * replicas_per_process`` slice; per-device
    sharding happens inside the jitted step via shard_map.
    """

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        workers: int = 2,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        replicas_per_process: int = 1,
        workers_mode: str = "thread",
    ):
        if workers_mode not in ("thread", "process"):
            raise ValueError(f"workers_mode must be thread|process, got {workers_mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.replicas_per_process = replicas_per_process
        self.workers_mode = workers_mode
        self.global_batch = batch_size * replicas_per_process * process_count
        self._proc_pool: Optional[futures.ProcessPoolExecutor] = None

    def _get_proc_pool(self) -> futures.ProcessPoolExecutor:
        if self._proc_pool is None:
            # fork by default: workers only run numpy/PIL/cv2 (never JAX, so
            # the JAX fork-deadlock warning doesn't apply to what they
            # execute) and fork inherits the loaded native .so and the test
            # suite's in-module datasets for free.  U2PL_LOADER_MP_CONTEXT=
            # forkserver|spawn switches for environments where forking a
            # threaded parent proves fragile — both require every dataset/
            # transform class to be importable in a fresh interpreter.
            method = os.environ.get("U2PL_LOADER_MP_CONTEXT", "fork")
            self._proc_pool = futures.ProcessPoolExecutor(
                max_workers=self.workers,
                mp_context=multiprocessing.get_context(method),
                initializer=_proc_worker_init,
                initargs=(self.dataset,),
            )
        return self._proc_pool

    def close(self) -> None:
        """Tear down the persistent process pool (no-op in thread mode)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

    def __len__(self):
        n = len(self.dataset)
        gb = self.global_batch
        return n // gb if self.drop_last else -(-n // gb)

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = epoch_indices(len(self.dataset), epoch, self.seed, self.shuffle)
        nb = len(self)
        gb = self.global_batch
        batches = [idx[i * gb : (i + 1) * gb] for i in range(nb)]
        if self.process_count > 1:
            per = self.batch_size * self.replicas_per_process
            lo = self.process_index * per
            # a ragged final batch (drop_last=False) can leave later
            # processes with an empty slice — skip those
            batches = [b[lo : lo + per] for b in batches]
            batches = [b for b in batches if len(b)]
        nb = len(batches)

        pending: "queue_mod.Queue" = queue_mod.Queue()

        def assemble(b):
            # decode/augment sequentially within this worker thread;
            # parallelism comes from `workers` concurrent batch assemblies
            # (nesting pool tasks inside pool tasks deadlocks when all
            # workers hold assemble jobs).  Samples are (img, label) pairs
            # normally; cutout/cutmix transforms yield the reference Compose
            # 5-tuple / mask-triple protocol (augmentation.py:31-47), so
            # stack every component.
            samples = [self.dataset[i] for i in b]
            return tuple(
                np.stack([s[k] for s in samples]) for k in range(len(samples[0]))
            )

        if self.workers_mode == "process":
            ex = self._get_proc_pool()
            submit = lambda i, b: ex.submit(
                _proc_assemble,
                b,
                (self.seed * 1000003 + epoch * 9973 + i) % (2**31),
            )
        else:
            ex = futures.ThreadPoolExecutor(max_workers=self.workers)
            submit = lambda i, b: ex.submit(assemble, b)

        try:
            depth = min(self.prefetch, nb)
            for i, b in enumerate(batches[:depth]):
                pending.put(submit(i, b))
            for i in range(nb):
                fut = pending.get()
                if i + depth < nb:
                    pending.put(submit(i + depth, batches[i + depth]))
                yield fut.result()
        finally:
            if self.workers_mode == "process":
                # the pool persists across epochs; just drop queued work so
                # an early exit doesn't keep decoding into the void
                while not pending.empty():
                    pending.get().cancel()
            else:
                # cancel_futures: an early generator exit (break / exception
                # in the train loop) must not leave queued assemble jobs
                # running on orphaned non-daemon worker threads
                ex.shutdown(wait=False, cancel_futures=True)


def build_loaders(cfg: Config, seed: int = 0, process_index: int = 0,
                  process_count: int = 1, replicas_per_process: int = 1):
    """get_loader parity (dataset/builder.py:9-43): returns
    (sup, unsup, val) for *_semi dataset types, else (sup, val).

    The unlabeled list is the labeled list with "labeled.txt" ->
    "unlabeled.txt" (pascal_voc.py:131); the unlabeled n_sup is
    pool - n_sup so both loaders have equal length (pascal_voc.py:109).
    `dataset.batch_size` is per data-parallel replica (the reference's
    per-GPU convention); pass replicas_per_process=jax.local_device_count()
    so each host feeds one slice per local device."""
    d = cfg.dataset
    u8 = d.device_normalize
    mk = lambda split_cfg, u8=u8: build_transform(
        split_cfg, d.mean, d.std, d.ignore_label, output_u8=u8
    )
    common = dict(
        workers=d.workers,
        workers_mode=d.workers_mode,
        process_index=process_index,
        process_count=process_count,
        replicas_per_process=replicas_per_process,
    )

    val_ds = SegDataset(d.val.data_root, d.val.data_list, mk(d.val), seed, None, "val")
    val_loader = EpochLoader(
        val_ds, d.batch_size, seed, shuffle=False, drop_last=False, **common
    )

    if d.is_semi:
        n_unsup = d.pool_size - d.n_sup
        sup_ds = SegDataset(
            d.train.data_root, d.train.data_list, mk(d.train), seed, n_unsup, "train"
        )
        unsup_list = d.train.data_list.replace("labeled.txt", "unlabeled.txt")
        unsup_ds = SegDataset(
            d.train.data_root, unsup_list, mk(d.train), seed, n_unsup, "train"
        )
        sup_loader = EpochLoader(sup_ds, d.batch_size, seed, True, True, **common)
        unsup_loader = EpochLoader(unsup_ds, d.batch_size, seed, True, True, **common)
        return sup_loader, unsup_loader, val_loader

    sup_ds = SegDataset(
        d.train.data_root, d.train.data_list, mk(d.train), seed, d.n_sup, "train"
    )
    sup_loader = EpochLoader(sup_ds, d.batch_size, seed, True, True, **common)
    return sup_loader, val_loader
