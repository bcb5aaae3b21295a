"""Multi-process host input pipeline (SURVEY §2.2 "multi-process data
loading" — the reference uses torch DataLoader ``num_workers=4``,
reference: training/trainer.py:489).

Worker processes run ONLY the host-side numpy/IO half of sample
production (``dataset.raw_item``: noise synthesis, raster window reads,
tiling); the jitted graph build + device placement (``dataset.finalize``)
stay in the parent — JAX must remain single-process here because on the
remote "axon" tunnel any extra process that initializes a backend can
claim the one TPU (benchmarks/RESULTS.md round-3 forensics), and even on
normal hosts per-worker XLA runtimes would waste memory.

Design notes:
* ``spawn`` context (not fork): the parent's initialized JAX runtime
  carries live gRPC/XLA threads that make forked children unreliable.
  Workers re-import the package; importing jax is safe — backends
  initialize lazily and ``raw_item`` never calls a jax API.
* The dataset is pickled ONCE per worker (initializer), not per task.
* Noise draws are a pure function of (epoch base seed, sample index) so
  results are independent of which worker runs what — unlike the
  sequential-rng in-process path, batches are reproducible under any
  worker schedule.
* A sliding in-flight window bounds result memory; the parent finalizes
  and collates in submission order while workers fill the window.
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
from collections import deque
from concurrent.futures import ProcessPoolExecutor
from typing import Iterator, Tuple

import numpy as np

_WORKER_DS = None


def _init_worker(ds_bytes: bytes) -> None:
    import os

    # belt and braces: even if some worker code path touched jax, keep it
    # off the TPU (the conftest pattern; the axon plugin may still ignore
    # this, which is why raw_item must never call jax at all)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    global _WORKER_DS
    _WORKER_DS = pickle.loads(ds_bytes)


def _raw(idx: int, seed: int):
    return _WORKER_DS.raw_item(int(idx), seed=int(seed))


class ProcessSampleLoader:
    """Drop-in replacement for datasets.epoch_batches backed by a
    process pool.

    Usage:
        loader = ProcessSampleLoader(dataset, num_workers=2)
        for graph, targets in loader.epoch_batches(bs, rng):
            ...
        loader.close()
    """

    def __init__(self, dataset, num_workers: int = 2,
                 max_inflight: int = 32, mp_context: str = "spawn"):
        if not hasattr(dataset, "raw_item"):
            raise TypeError(f"{type(dataset).__name__} has no raw_item — "
                            f"not splittable for worker processes")
        self.dataset = dataset
        self.num_workers = int(num_workers)
        self.max_inflight = max(int(max_inflight), 2)
        ctx = mp.get_context(mp_context)
        self._pool = ProcessPoolExecutor(
            max_workers=self.num_workers, mp_context=ctx,
            initializer=_init_worker,
            initargs=(pickle.dumps(dataset),))

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      shuffle: bool = True) -> Iterator[Tuple]:
        """Shuffled fixed-size batches (same contract as
        datasets.epoch_batches; ragged tail dropped)."""
        from ..training.datasets import collate_samples

        order = np.arange(len(self.dataset))
        if shuffle:
            rng.shuffle(order)
        base = int(rng.integers(1 << 30))
        usable = len(order) - len(order) % batch_size
        order = order[:usable]

        pending: deque = deque()
        submit_iter = iter(order)

        def submit_more():
            while len(pending) < self.max_inflight:
                try:
                    i = next(submit_iter)
                except StopIteration:
                    return
                pending.append(self._pool.submit(_raw, i, base + int(i)))

        submit_more()
        batch = []
        while pending:
            raw = pending.popleft().result()
            submit_more()
            batch.append(self.dataset.finalize(raw))
            if len(batch) == batch_size:
                yield collate_samples(batch)
                batch = []

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
