"""XLA profiler integration (SURVEY §5 tracing/observability).

The reference's only timing story is host-side wall-clock dicts
(detectors/base_detector.py:62-106); on TPU the authoritative tool is the
XLA profiler: ``jax.profiler`` writes xplane protobufs that TensorBoard's
profile plugin (or xprof) renders as the op-level timeline, HBM usage, and
MXU utilization. This module is the one switch the CLI exposes
(``--profile_dir``): wrap any region in ``maybe_trace`` and point
TensorBoard at the directory.
"""

from __future__ import annotations

from contextlib import contextmanager, nullcontext


@contextmanager
def xla_trace(profile_dir: str):
    """Capture a jax.profiler trace (xplane dump) around a code region."""
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield profile_dir
    finally:
        jax.profiler.stop_trace()


def maybe_trace(profile_dir: str | None):
    """``xla_trace`` when a directory is configured, else a no-op context."""
    return xla_trace(profile_dir) if profile_dir else nullcontext()


def annotate(name: str):
    """Named sub-region inside a trace (shows as a block in the timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
