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
                 drop_last=False, seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed

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
            batches.append(chunk)
        return batches

    def __iter__(self):
        batches = self._index_batches()
        self._epoch += 1
        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for chunk in batches:
                    if stop.is_set():
                        break
                    examples = [self.dataset[int(i)] for i in chunk]
                    out_q.put(_stack_batch(examples))
            finally:
                out_q.put(None)

        # one producer thread per loader; example decode fan-out happens
        # inside the dataset readers (PIL releases the GIL)
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
