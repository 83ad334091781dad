"""Async host-side data pipeline: thread-pool item loading + device
prefetch double-buffering.

TPU-native replacement for the reference's 16-worker torch DataLoader
(`train.py:111-118`): cv2/PIL release the GIL during decode/resize, so a
thread pool saturates host cores without process overhead, and a depth-2
device prefetch overlaps H2D transfer with the running step so the TPU
never waits on input (HBM-bandwidth rule: minimize host<->device stalls).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import jax
import numpy as np


def threaded_batches(ds, batch_size: int, *, shuffle: bool = True,
                     seed: int = 0, drop_last: bool = True,
                     num_workers: int = 8, prefetch: int = 4,
                     epochs: int | None = 1) -> Iterator[tuple]:
    """Yields stacked numpy batches; items load in a thread pool."""
    rng = np.random.default_rng(seed)

    def epoch_orders():
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(ds))
            if shuffle:
                rng.shuffle(order)
            yield order
            epoch += 1

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for order in epoch_orders():
            # submit item futures in batch-sized windows, `prefetch` deep
            windows = [
                order[i:i + batch_size]
                for i in range(0, len(order), batch_size)
            ]
            if drop_last:
                windows = [w for w in windows if len(w) == batch_size]
            futs = []
            for w in windows[:prefetch]:
                futs.append([pool.submit(ds.__getitem__, int(i)) for i in w])
            for wi, w in enumerate(windows):
                nxt = wi + prefetch
                if nxt < len(windows):
                    futs.append([
                        pool.submit(ds.__getitem__, int(i))
                        for i in windows[nxt]
                    ])
                items = [f.result() for f in futs.pop(0)]
                yield tuple(np.stack(parts) for parts in zip(*items))


def device_prefetch(iterator: Iterator[tuple], sharding=None,
                    depth: int = 2) -> Iterator[tuple]:
    """Move batches to device `depth` steps ahead of consumption."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()

    def producer():
        try:
            for batch in iterator:
                arrs = tuple(
                    jax.device_put(b, sharding) if sharding is not None
                    else jax.device_put(b)
                    for b in batch)
                q.put(arrs)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
