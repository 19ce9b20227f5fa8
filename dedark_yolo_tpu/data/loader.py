"""Batched, prefetching data loader feeding fixed-shape device batches.

Replaces torch DataLoader + DistributedSampler (reference data/build.py:22-109)
with a thread-pool host pipeline:
  - deterministic per-epoch shuffling from a seed (reference build.py:65-69
    seeded workers);
  - per-host sharding by jax.process_index() (replaces DistributedSampler);
  - fixed-shape collate: images stacked uint8 (B,H,W,3) RGB, labels padded to
    max_boxes with a validity mask — so the jitted train step never re-traces;
  - double-buffered device prefetch (host->device copy overlaps compute).
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# ---------------------------------------------------------------------------
# Process-pool transform workers (reference build.py:93-109 multi-process
# DataLoader workers). The thread pool is the default — cv2/numpy release the
# GIL for the heavy kernels (measured hold fraction in docs/BENCHMARKS.md
# loader-scaling table) — but pure-Python label bookkeeping caps thread
# scaling on many-core hosts; `use_processes=True` sidesteps the GIL
# entirely. Fork-start workers inherit (dataset, transforms) by COW memory —
# per-item IPC is only (index, seed) in and the finished item out.
_MP_STATE: dict = {}


def _mp_init(dataset, transforms, base_seed):
    # each forked worker re-seeds cv2's internal pool to 1 thread: the
    # parallelism axis is processes here, and nested cv2 threading oversubscribes
    try:
        import cv2
        cv2.setNumThreads(0)
    except Exception:
        pass
    _MP_STATE["dataset"] = dataset
    _MP_STATE["transforms"] = transforms
    _MP_STATE["base_seed"] = base_seed


def _mp_make(task):
    i, pos, epoch = task
    rng = random.Random(_MP_STATE["base_seed"] + epoch + pos * 7919 + i)
    return _MP_STATE["transforms"](_MP_STATE["dataset"], i, rng)


def collate(items, max_boxes=128):
    """items: list of (img HWC uint8, xywh (n,4), cls (n,)) -> fixed-shape batch."""
    b = len(items)
    h, w = items[0][0].shape[:2]
    imgs = np.zeros((b, h, w, 3), np.uint8)
    bboxes = np.zeros((b, max_boxes, 4), np.float32)
    cls = np.zeros((b, max_boxes), np.float32)
    mask = np.zeros((b, max_boxes), np.float32)
    for i, (img, xywh, c) in enumerate(items):
        imgs[i] = img
        n = min(len(c), max_boxes)
        if n:
            bboxes[i, :n] = xywh[:n]
            cls[i, :n] = c[:n]
            mask[i, :n] = 1.0
    return {"img": imgs, "bboxes": bboxes, "cls": cls, "mask_gt": mask}


class DataLoader:
    """Iterable over fixed-shape batches with threaded decode/augment."""

    def __init__(self, dataset, transforms, batch_size, max_boxes=128, shuffle=True,
                 seed=0, workers=8, drop_last=True, process_index=0, process_count=1,
                 prefetch=2, indices=None, collate_fn=None, use_processes=False):
        self.dataset = dataset
        self.indices = list(indices) if indices is not None else None
        self.transforms = transforms
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        # task-specific collates (segment/pose/classify) plug in here; the
        # default is the detect fixed-shape collate
        self.collate_fn = collate_fn or (lambda items: collate(items, max_boxes))
        self.shuffle = shuffle
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0
        self.use_processes = bool(use_processes)
        self._mp_pool = None

    def _pool(self):
        """Lazy fork-start process pool, reused across epochs. Identical
        per-item seeding to the thread path, so switching modes never changes
        the produced batches (asserted in tests/test_data.py)."""
        if self._mp_pool is None:
            import multiprocessing as mp
            ctx = mp.get_context("fork")
            self._mp_pool = ctx.Pool(
                self.workers, initializer=_mp_init,
                initargs=(self.dataset, self.transforms, self.seed * 100003))
        return self._mp_pool

    def close(self):
        if self._mp_pool is not None:
            self._mp_pool.terminate()
            self._mp_pool.join()
            self._mp_pool = None

    def __del__(self):  # best-effort cleanup; close() is the explicit API
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch):
        """Reshuffle per epoch (reference trainer.py:297-298 sampler.set_epoch)."""
        self.epoch = epoch

    def _indices(self):
        idx = list(self.indices) if self.indices is not None \
            else list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        if self.process_count > 1:
            # wrap-pad so every process gets the SAME index count (torch
            # DistributedSampler semantics): unequal shards would give
            # processes different batch counts, and the jitted train step's
            # collectives would be entered unequally -> distributed deadlock
            per = -(-len(idx) // self.process_count)
            pad = per * self.process_count - len(idx)
            if pad:
                reps = -(-pad // len(idx))
                idx = idx + (idx * reps)[:pad]
            idx = idx[self.process_index::self.process_count]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        nb = len(self)
        base_seed = self.seed * 100003 + self.epoch

        def make_item(i, pos):
            rng = random.Random(base_seed + pos * 7919 + i)
            return self.transforms(self.dataset, i, rng)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            if self.use_processes:
                pool = self._pool()
                for bi in range(nb):
                    if stop.is_set():
                        return
                    chunk = idx[bi * self.batch_size:(bi + 1) * self.batch_size]
                    items = pool.map(_mp_make, [(i, pos, self.epoch)
                                                for pos, i in enumerate(chunk)])
                    out_q.put(self.collate_fn(items))
                out_q.put(None)
                return
            with ThreadPoolExecutor(max_workers=self.workers) as ex:
                for bi in range(nb):
                    if stop.is_set():
                        return
                    chunk = idx[bi * self.batch_size:(bi + 1) * self.batch_size]
                    items = list(ex.map(lambda t: make_item(t[1], t[0]),
                                        enumerate(chunk)))
                    out_q.put(self.collate_fn(items))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
