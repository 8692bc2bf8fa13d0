"""Background-thread batch prefetching with device transfer overlap.

TPU-native replacement for the reference's torch DataLoader worker pool +
pin_memory (reference: cet_pick/main.py:84-91, test.py:19-60
``PrefetchDataset``): a producer thread runs the (numpy) sampling pipeline
and eagerly issues the async ``jax.device_put`` for the next batches while
the train step computes on the current one, so host augmentation/crop time
and host->device transfer hide behind device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterator; keep `depth` batches in flight on device."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2,
                 device_put: Optional[Callable] = None):
        import jax

        self._q = queue.Queue(maxsize=depth)
        self._put = device_put or jax.device_put
        self._err = None

        def worker():
            try:
                for batch in iterator:
                    self._q.put(self._put(batch))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_epoch(dataset, rng, batch_size, depth: int = 2, **kwargs):
    """Prefetched ``dataset.epoch_batches`` (drop-in for the train loops)."""
    return PrefetchIterator(
        dataset.epoch_batches(rng, batch_size, **kwargs), depth=depth
    )
