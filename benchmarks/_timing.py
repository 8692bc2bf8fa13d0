"""Shared amortized-timing helper for the benchmark scripts.

The one correct recipe for this box (one TPU v5e behind the `axon` tunnel):

- `block_until_ready` does NOT block through the tunnel — the only reliable
  fence is a host fetch of the result.
- The tunnel moves ~40 MB/s, so the fence must fetch ONE ELEMENT, never a
  full output (an early A/B script fetched a (70,256,256,32) activation and
  measured 1.8 s/rep of pure transfer; aug_profile once fetched the full
  augmented batch and overstated per-op times by ~25-50%).
- Every dispatch costs ~8 ms through the tunnel; `reps` back-to-back
  enqueues amortize it, and microbenches of sub-8 ms ops must subtract it.

`timed` fences by slicing the first output leaf to one element ON DEVICE
and fetching only that — the slice depends on the full computation, so the
fetch completes exactly when the work does.
"""

import time

import numpy as np


def fence(out):
    """Wait for `out` by fetching a single element of its first leaf."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    if hasattr(leaf, "ravel") and getattr(leaf, "size", 1) > 1:
        leaf = leaf.ravel()[:1]  # device-side slice: fetch 1 element
    np.asarray(leaf)


def timed(fn, *a, reps=10):
    """Amortized seconds per call: warmup + fence, then `reps` back-to-back
    calls fenced once at the end."""
    fence(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*a)
    fence(out)
    return (time.perf_counter() - t0) / reps
