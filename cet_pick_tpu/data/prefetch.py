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
    """Wrap a batch iterator; keep `depth` batches in flight on device.

    Supports early termination: a consumer that stops mid-epoch (e.g. the
    ``--num_iters`` cap in the train loops) must call :meth:`close` — or use
    the iterator as a context manager — so the producer thread is released
    and its in-flight device batches are dropped; otherwise the producer
    stays blocked on the full queue forever.
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2,
                 device_put: Optional[Callable] = None):
        import jax

        self._q = queue.Queue(maxsize=depth)
        self._put = device_put or jax.device_put
        self._err = None
        self._stop = threading.Event()

        def worker():
            try:
                for batch in iterator:
                    item = self._put(batch)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                # The sentinel MUST reach the consumer: if the queue is full
                # (consumer still compiling its first step) a dropped
                # sentinel deadlocks __next__ after the queued batches drain.
                # Block, stop-aware, like the item puts; close() sets _stop
                # and drains, so an abandoned consumer still releases us.
                while not self._stop.is_set():
                    try:
                        self._q.put(self._SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

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

    def close(self):
        """Release the producer thread and drop queued device batches."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def prefetch_epoch(dataset, rng, batch_size, depth: int = 2, **kwargs):
    """Prefetched ``dataset.epoch_batches`` (drop-in for the train loops)."""
    return PrefetchIterator(
        dataset.epoch_batches(rng, batch_size, **kwargs), depth=depth
    )
