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
    ``--num_iters`` cap in the train loops) should call :meth:`close` — or
    use the iterator as a context manager — so the producer thread is
    released promptly and its in-flight device batches are dropped. An
    abandoned iterator is also released by GC: the producer thread closes
    over the queue/event locals rather than ``self``, so dropping the last
    consumer reference triggers ``__del__`` -> ``close()`` (a worker that
    referenced ``self`` would pin it alive and spin forever).
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2,
                 device_put: Optional[Callable] = None):
        import jax

        self._q = queue.Queue(maxsize=depth)
        self._put = device_put or jax.device_put
        self._errs = []
        self._exhausted = False
        self._stop = threading.Event()
        # locals for the worker closure — NOT self (see class docstring)
        q, put, stop = self._q, self._put, self._stop
        errs, sentinel = self._errs, self._SENTINEL

        def worker():
            try:
                for batch in iterator:
                    item = put(batch)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    # drop our reference immediately: after a successful put
                    # the consumer owns the (device-resident) batch
                    del item
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                errs.append(e)
            finally:
                # The sentinel MUST reach the consumer: if the queue is full
                # (consumer still compiling its first step) a dropped
                # sentinel deadlocks __next__ after the queued batches
                # drain. Block, stop-aware, like the item puts; close()
                # sets _stop and drains, so a stopped consumer releases us.
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        # the sentinel is enqueued exactly once, so remember exhaustion —
        # the iterator protocol requires every later __next__ to raise
        # StopIteration again rather than block on the empty queue forever
        if self._exhausted:
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            self._exhausted = True
            if self._errs:
                raise self._errs[0]
            raise StopIteration
        return item

    def _drain(self):
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                return

    def close(self):
        """Release the producer thread and drop queued device batches.

        Drain and join alternate until the thread is dead: a producer
        blocked in ``put`` when ``_stop`` is set can still complete that
        put into the just-drained queue, so a single drain could strand
        one device batch until GC — the final drain catches it.
        """
        self._stop.set()
        deadline = 50  # 5 s at 0.1 s joins; the thread only sleeps 0.1 s
        while self._thread.is_alive() and deadline > 0:
            self._drain()
            self._thread.join(timeout=0.1)
            deadline -= 1
        self._drain()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass  # interpreter shutdown

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
