"""Batched data loading with parallel workers and background prefetch.

Replaces torch DataLoader (reference data/__init__.py:36-49): shuffled
unless serial, drop_last in train, and `--nThreads` worker *processes*
(the reference's `num_workers`) that decode+augment batches in parallel
while the chip computes. Numpy collation; string fields are collated into
lists.

Worker model: a process pool fed (batch_index, sample_indices) tasks; the
parent reorders results so iteration order is deterministic and independent
of worker count. Each worker process lazily re-opens its own file handles
(HDF5 etc.) and loads its own copy of the native host-pass library —
nothing JAX runs in workers.

Start method: **forkserver** (spawn where unavailable). The training entry
initializes JAX (multithreaded) before the first batch is requested, and
os.fork() from a multithreaded parent can deadlock the child — forkserver
forks workers from a clean single-threaded server process instead, so the
pool is safe to create at any point. Requires the dataset to be picklable
(all shipped datasets are). Fallbacks: `num_workers=0` is fully
synchronous; GFLA_LOADER=thread (or an unpicklable dataset) falls back to
one prefetch thread; GFLA_LOADER=fork forces the legacy fork context.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle
import queue
import threading
import traceback
from typing import Dict, Iterator, List, Optional

import numpy as np


class _WorkerDied(RuntimeError):
    """All results pending and at least one pool worker exited — e.g.
    forkserver/spawn re-import of __main__ failed because the parent has no
    real main file (python -c, notebooks). Triggers the thread fallback."""


def collate(samples: List[Dict]) -> Dict:
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def _worker_main(dataset, task_q, result_q, worker_id: int, seed: int):
    """Worker process loop: fetch + collate one batch per task."""
    # fork duplicates the parent's RNG state into every worker — reseed so
    # augmentation draws differ across workers (torch seeds workers
    # base_seed+id the same way)
    np.random.seed((seed + worker_id) % (2**31))
    if hasattr(dataset, "rng"):
        dataset.rng = np.random.RandomState((seed + worker_id) % (2**31))
    while True:
        task = task_q.get()
        if task is None:
            break
        bi, indices = task
        try:
            batch = collate([dataset[int(i)] for i in indices])
            result_q.put((bi, batch, None))
        except Exception:
            result_q.put((bi, None, traceback.format_exc()))


class _ProcessPool:
    """Persistent fork-context worker pool shared across epochs (keeps
    worker startup off the per-epoch path, like torch's
    persistent_workers)."""

    @staticmethod
    def _context():
        forced = os.environ.get("GFLA_LOADER", "")
        if forced in ("fork", "spawn", "forkserver"):
            return mp.get_context(forced)
        methods = mp.get_all_start_methods()
        return mp.get_context(
            "forkserver" if "forkserver" in methods else "spawn"
        )

    def __init__(self, dataset, num_workers: int, seed: int = 0):
        ctx = self._context()
        self.task_q = ctx.Queue()
        self.result_q = ctx.Queue()
        self.procs = [
            ctx.Process(
                target=_worker_main,
                args=(dataset, self.task_q, self.result_q, i, seed),
                daemon=True,
            )
            for i in range(num_workers)
        ]
        for p in self.procs:
            p.start()

    def close(self):
        for _ in self.procs:
            try:
                self.task_q.put(None)
            except Exception:
                pass
        for p in self.procs:
            p.join(timeout=2)
            if p.is_alive():
                p.terminate()


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 2,
        seed: int = 0,
        prefetch: int = 4,
        shard: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.prefetch = max(2, prefetch)
        self._epoch = 0
        self._seed = seed
        # (shard_id, num_shards): multi-host data parallelism. Every host
        # computes the SAME shuffled epoch order (seed is shared), then takes
        # a disjoint strided slice — shard_batch assembles the global batch
        # from genuinely different samples per process.
        self.shard = shard
        self._pool: Optional[_ProcessPool] = None
        self._pool_broken = os.environ.get("GFLA_LOADER", "") == "thread"
        # dataset indices withheld from iteration (train.py holds out a
        # validation batch here so eval never measures seen data)
        self.exclude: Optional[np.ndarray] = None

    def _n_indices(self):
        n = len(self.dataset)
        if self.exclude is not None:
            n -= len(np.unique(self.exclude))
        if self.shard is not None:
            sid, nsh = self.shard
            n = (n - sid + nsh - 1) // nsh
        return n

    def __len__(self):
        n = self._n_indices()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __del__(self):
        if self._pool is not None:
            self._pool.close()

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.exclude is not None:
            idx = idx[~np.isin(idx, self.exclude)]
            n = len(idx)
        if self.shuffle:
            rng = np.random.RandomState(self._seed + self._epoch)
            rng.shuffle(idx)
        if self.shard is not None:
            sid, nsh = self.shard
            idx = idx[sid::nsh]
            n = len(idx)
        batches = []
        for s in range(0, n, self.batch_size):
            b = idx[s : s + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            batches.append(b)
        return batches

    # ------------------------------------------------------------------
    def _iter_processes(self, batches) -> Iterator[Dict]:
        if self._pool is None:
            # offset worker seeds per shard so augmentation draws differ
            # across hosts, not just across workers
            sid = self.shard[0] if self.shard is not None else 0
            self._pool = _ProcessPool(self.dataset, self.num_workers,
                                      seed=self._seed + 7919 * sid)
        pool = self._pool
        in_flight = 0
        next_submit = 0
        next_yield = 0
        window = self.num_workers + self.prefetch
        buffered: Dict[int, Dict] = {}
        while next_yield < len(batches):
            while next_submit < len(batches) and in_flight < window:
                pool.task_q.put((next_submit, batches[next_submit]))
                next_submit += 1
                in_flight += 1
            while True:
                try:
                    bi, batch, err = pool.result_q.get(timeout=5.0)
                    break
                except queue.Empty:
                    # a worker that died before its first batch (e.g. the
                    # forkserver child failed to re-import __main__) would
                    # otherwise block this get() forever
                    if any(not p.is_alive() for p in pool.procs):
                        raise _WorkerDied(
                            "loader worker process(es) exited without "
                            "producing a batch")
            in_flight -= 1
            if err is not None:
                raise RuntimeError(f"loader worker failed:\n{err}")
            buffered[bi] = batch
            while next_yield in buffered:
                yield buffered.pop(next_yield)
                next_yield += 1

    def _iter_thread(self, batches) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        break
                    q.put(collate([self.dataset[int(i)] for i in b]))
                q.put(None)
            except Exception:
                q.put(RuntimeError(
                    f"loader worker failed:\n{traceback.format_exc()}"
                ))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers == 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return
        if not self._pool_broken:
            yielded = 0
            try:
                for item in self._iter_processes(batches):
                    yielded += 1
                    yield item
                return
            except (TypeError, AttributeError, OSError,
                    pickle.PicklingError, _WorkerDied) as e:
                # unpicklable dataset / no subprocess support / workers
                # dead on arrival → thread fallback (forkserver/spawn
                # pickle the dataset at Process.start() and re-import
                # __main__ in the child, so both failure modes surface
                # here in the parent)
                if yielded:
                    raise  # mid-epoch death: order is lost, fail loudly
                print(f"loader: process pool unavailable ({e!r}); "
                      "falling back to prefetch thread")
                self._pool_broken = True
                if self._pool is not None:
                    self._pool.close()
                    self._pool = None
        yield from self._iter_thread(batches)


def infinite(loader: DataLoader) -> Iterator[Dict]:
    """Epoch-less iteration (reference train.py:27 `while keep_training`)."""
    while True:
        yield from loader
