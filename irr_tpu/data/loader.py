"""Prefetching batch loader (host-side).

Replaces torch DataLoader (reference configuration.py:412-446): worker
threads decode/augment examples while the TPU computes the previous step,
and batches are stacked into contiguous NHWC numpy arrays ready for a
single host->device transfer. PIL/numpy release the GIL in their C cores,
so threads overlap decode with compute even on one Python process.
"""

import queue
import threading

import numpy as np


def _stack_batch(examples):
    """Stack a list of example dicts into batched numpy arrays; non-array
    metadata (basename, basedir) becomes a list, index an int array."""
    out = {}
    for key in examples[0]:
        vals = [e[key] for e in examples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, np.integer)):
            out[key] = np.asarray(vals, dtype=np.int32)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over stacked batches.

    Mirrors the reference loader config surface: batch_size, shuffle,
    drop_last=False, num_workers (configuration.py:407-446).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=2,
                 drop_last=False, seed=0, prefetch=2,
                 process_index=0, process_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed
        # multi-host: batch_size is GLOBAL; every process computes the same
        # shuffle (same seed) and loads its contiguous slice of each batch
        # (parallel/mesh.local_shard_slice order contract).
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self._seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            if self.process_count > 1:
                if len(chunk) % self.process_count:
                    continue  # ragged final batch cannot split evenly
                from ..parallel.mesh import local_shard_slice
                chunk = local_shard_slice(chunk, self.process_index,
                                          self.process_count)
            batches.append(chunk)
        return batches

    def __iter__(self):
        batches = self._index_batches()
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                if self.num_workers <= 1:
                    for chunk in batches:
                        if stop.is_set():
                            break
                        examples = [self.dataset[int(i)] for i in chunk]
                        out_q.put(_stack_batch(examples))
                else:
                    # num_workers example-decode threads; batches assembled
                    # in order. Deterministic regardless of scheduling: the
                    # dataset seeds augmentation per (epoch, index), not
                    # from a shared stream. PIL/numpy release the GIL in
                    # their C cores, so decode overlaps device compute.
                    from concurrent.futures import ThreadPoolExecutor
                    import collections as _c
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        pending = _c.deque()
                        it = iter(batches)

                        def submit_next():
                            chunk = next(it, None)
                            if chunk is None:
                                return False
                            pending.append([pool.submit(
                                self.dataset.__getitem__, int(i)) for i in chunk])
                            return True

                        for _ in range(self.prefetch + 1):
                            if not submit_next():
                                break
                        while pending and not stop.is_set():
                            futs = pending.popleft()
                            examples = [f.result() for f in futs]
                            out_q.put(_stack_batch(examples))
                            submit_next()
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
