"""Lagged per-step metric fetching for train loops.

Every jitted train step returns a dict of scalar metrics. The obvious
``{k: float(v) for ...}`` pattern costs K blocking device->host transfers
per step AND stalls the dispatch pipeline: the host cannot enqueue step
i+1 until step i's last scalar lands. Through a remote-device tunnel each
transfer has a ~8 ms latency floor, so a 5-metric step pays ~40 ms of pure
latency per 15-70 ms of compute (benchmarks/metrics_drain_bench.py).

``LaggedMetrics`` removes both costs:

* the dict is stacked into ONE (K,) device vector by a tiny jitted op —
  an async dispatch, no host wait;
* the vector is fetched one step LATE, after step i+1 has been dispatched,
  so the single round trip rides behind the device's compute.

The reference has no analog (torch's ``.item()`` calls in
trains/base_trainer.py:500-533 block the CUDA stream the same way; it just
never ran against a high-latency device link).

Usage::

    drain = LaggedMetrics()
    for batch in batches:
        state, metrics = train_step(state, batch)
        m = drain.push(metrics)       # host floats of the PREVIOUS step
        if m is not None:
            epoch_metrics.append(m)
    m = drain.pop()                   # the final step's metrics
    if m is not None:
        epoch_metrics.append(m)

Any per-step validity check (e.g. refine's zero-positive PU guard) then
fires one step late — acceptable, since such checks abort the whole run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _stacker(keys):
    # module-level cache: loops build a fresh LaggedMetrics per epoch, and a
    # per-instance jit would re-trace the (trivial) stack op every epoch
    fn = _STACKERS.get(keys)
    if fn is None:
        @jax.jit
        def fn(d):
            return jnp.stack(
                [jnp.asarray(d[k], jnp.float32).reshape(()) for k in keys]
            )

        _STACKERS[keys] = fn
    return fn


_STACKERS = {}


class LaggedMetrics:
    """One-step-lagged, single-transfer metric fetcher (see module doc)."""

    def __init__(self):
        self._pending = None  # (keys, (K,) device array)

    def push(self, metrics) -> dict | None:
        """Enqueue this step's metrics; return the previous step's as host
        floats (None on the first push)."""
        prev = self.pop()
        keys = tuple(metrics)
        self._pending = (keys, _stacker(keys)(dict(metrics)))
        return prev

    def pop(self) -> dict | None:
        """Fetch whatever is pending (the last pushed step), or None."""
        if self._pending is None:
            return None
        keys, arr = self._pending
        self._pending = None
        vals = np.asarray(arr)
        return {k: float(v) for k, v in zip(keys, vals)}
