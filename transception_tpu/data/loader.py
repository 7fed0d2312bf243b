"""Host-side data loader: threaded decode/augment + device prefetch.

Replaces the reference's torch DataLoader (trainer.py:104-105, 4 forked
workers) with a thread-pool pipeline that overlaps numpy augmentation with
TPU compute and shards the global batch per host for multi-host DP (the
TPU-native replacement for DataParallel's in-process batch split,
trainer.py:86).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


class HostDataLoader:
    """Deterministic, seeded, sharded batch iterator.

    Each epoch re-shuffles with seed+epoch (the reference seeds workers with
    seed+worker_id, train_MSTransception.py:101-102; here determinism is
    exact across restarts). With multi-host DP, each host loads only its
    1/process_count of every global batch.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 1234, num_workers: int = 4,
                 drop_last: bool = True, process_index: int = 0,
                 process_count: int = 1, prefetch: int = 2):
        assert batch_size % process_count == 0, (
            "global batch must divide across hosts")
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // process_count
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.global_batch
        if not self.drop_last and len(self.dataset) % self.global_batch:
            n += 1
        return n

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        n_batches = len(self)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_item(global_idx: int, within: int):
            rng = np.random.default_rng(
                (self.seed * 1_000_003 + self.epoch * 131 + global_idx) & 0x7FFFFFFF)
            return self.dataset.get(int(within), rng)

        def put_or_stop(item) -> bool:
            """Bounded put that aborts when the consumer went away —
            otherwise an early break (e.g. max_steps mid-epoch) would leave
            the producer blocked on a full queue forever."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    start = b * self.global_batch
                    idxs = order[start:start + self.global_batch]
                    # This host's contiguous shard of the global batch.
                    lo = self.process_index * self.local_batch
                    idxs = idxs[lo:lo + self.local_batch]
                    futs = [pool.submit(load_item, start + lo + j, i)
                            for j, i in enumerate(idxs)]
                    items = [f.result() for f in futs]
                    batch = {
                        "image": np.stack([it["image"] for it in items]),
                        "label": np.stack([it["label"] for it in items]),
                        "case_name": [it["case_name"] for it in items],
                    }
                    if not put_or_stop(batch):
                        return
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False)
