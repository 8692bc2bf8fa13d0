"""Train state + checkpointing.

Replaces the reference's ``save_model``/``load_model`` (reference:
cet_pick/models/model.py:195-296) with a flax/orbax-based equivalent:
checkpoints bundle params, batch statistics, optimizer state, epoch, and the
full serialized Config (so inference can never run with mismatched flags —
the footgun the reference docs warn about twice).

``load_train_state`` keeps the reference's tolerant semantics
(model.py:219-231): parameters whose shapes mismatch the freshly-initialized
model are skipped with a warning instead of failing, so architecture tweaks
can be warm-started.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from flax import serialization


class TrainState(struct.PyTreeNode):
    step: int
    epoch: int
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats if batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def jit_init(model, *args, **kwargs):
    """``model.init`` under jit. flax's init runs EAGERLY, op by op; on a
    remote-attached TPU each of its hundreds of tiny dispatches pays the
    link's ~8-11 ms latency floor — measured 102 s of pure init for the
    flagship detector (benchmarks/train_cli_phases.py) vs one compile + one
    dispatch jitted. Param values are unchanged: init is PRNG- and
    shape-dependent only. kwargs (e.g. ``train=False``) are closed over as
    static; None args stay valid (empty pytrees)."""
    import functools

    return jax.jit(functools.partial(model.init, **kwargs))(*args)


def create_train_state(model, config, rng, sample_input, lr=None,
                       freeze=()):
    """Initialize model variables + Adam optimizer (torch defaults, main.py:55).

    ``freeze``: top-level param-tree names whose gradients are zeroed —
    the sequential fine-tune mode that freezes the ``hm`` head before
    continuing training (reference main_seq.py:36-40).
    """
    variables = jit_init(model, rng, jnp.asarray(sample_input), train=False)
    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr if lr is not None else config.lr
    )
    if freeze:
        frozen = set(freeze)

        def label(params):
            return {k: ("frozen" if k in frozen else "train")
                    for k in params.keys()}

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=0,
        epoch=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected Adam learning rate (epoch-step decay, main.py:122-128)."""
    opt_state = state.opt_state
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    elif hasattr(opt_state, "inner_states"):  # multi_transform (frozen heads)
        inner = opt_state.inner_states["train"].inner_state
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=opt_state)


# ---------------------------------------------------------------------------
# checkpoint I/O
# ---------------------------------------------------------------------------

def checkpoint_payload(state: TrainState) -> dict:
    """The serialized checkpoint's pytree (shared by the sync and
    write-behind savers)."""
    return {
        "step": state.step,
        "epoch": state.epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def prefetch_payload(payload):
    """Start the device->host copy of every array leaf, so the serializer's
    per-leaf ``np.asarray`` finds the bytes already in flight.

    flax's ``to_bytes`` fetches leaves one BLOCKING transfer at a time; on a
    remote-attached TPU that is leaves x round-trip-latency, serial —
    measured 9.9 s for the 232-leaf flagship refine state through a
    degraded axon window, 2.5 s with this prefetch (the remaining cost is
    the 24 MB of payload bytes on the link; benchmarks/ckpt_bench.py)."""
    for leaf in jax.tree_util.tree_leaves(payload):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:
                # optional fast path only — an exotic sharding falls back to
                # the serializer's own synchronous fetch
                pass


def write_checkpoint_file(path: str, filename: str, payload: dict,
                          config=None, _bytes=None):
    os.makedirs(path, exist_ok=True)
    # atomic replace: a write aborted mid-flight (write-behind thread killed
    # at process exit, disk full) leaves the previous checkpoint intact
    final = os.path.join(path, filename)
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload) if _bytes is None else _bytes)
    os.replace(tmp, final)
    if config is not None:
        config.save(os.path.join(path, "opt.json"))


def save_checkpoint(path: str, state: TrainState, config=None):
    """Serialize {epoch, params, batch_stats, opt_state} (+config JSON)."""
    payload = checkpoint_payload(state)
    prefetch_payload(payload)
    write_checkpoint_file(path, "state.msgpack", payload, config)


class AsyncCheckpointer:
    """Write-behind checkpoint saves for epoch loops.

    Every epoch of every train loop ends in a ``model_last`` write whose
    device->host fetch + msgpack + disk write the loop otherwise sits idle
    through (2.5-9.9 s per epoch through the axon tunnel, ckpt_bench.py).
    ``save()`` instead snapshots the payload ON DEVICE (``jnp.copy``, so the
    worker never races a later DP train step's buffer DONATION — donated
    inputs are marked deleted at the next step's dispatch, see
    parallel/mesh.warm_step), starts the host copies, and enqueues; one
    worker thread finishes the fetch, serializes, and writes behind the next
    epoch's compute.

    Saves land in submission order (``model_last`` is always the newest
    write) and repeated saves of one snapshot (model_last + model_best +
    model_N in the same epoch) serialize the bytes once. The bounded queue
    back-pressures a loop that outruns the disk. ``close()`` flushes and
    re-raises any worker failure; use as a context manager around the epoch
    loop so an aborted run still flushes what it saved.

    No reference analog (torch.save blocks the loop; reference
    base_trainer.py saves synchronously every epoch)."""

    def __init__(self, filename: str = "state.msgpack"):
        import queue
        import threading

        self._filename = filename
        self._q = queue.Queue(maxsize=2)
        self._error = None
        self._cache = (None, None)  # (payload snapshot, serialized bytes)
        self._thread = threading.Thread(
            target=self._drain, name="ckpt-writer", daemon=True)
        self._thread.start()

    def snapshot(self, payload):
        """Device-side copy + host-prefetch of ``payload``; the returned
        tree is safe to enqueue multiple times and immune to later buffer
        donation."""
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            payload,
        )
        prefetch_payload(snap)
        return snap

    def save(self, path: str, payload, config=None, snapshotted=False):
        """Queue one checkpoint write. ``payload`` is snapshotted here
        unless the caller already passed a :meth:`snapshot` result."""
        self._check()
        if not snapshotted:
            payload = self.snapshot(payload)
        self._q.put((path, payload, config))
        return payload

    def _drain(self):
        while True:
            job = self._q.get()
            try:
                if job is None:
                    return
                path, payload, config = job
                if self._cache[0] is payload:
                    data = self._cache[1]
                else:
                    data = serialization.to_bytes(payload)
                    self._cache = (payload, data)
                write_checkpoint_file(path, self._filename, payload, config,
                                  _bytes=data)
            except Exception as e:  # pragma: no cover - surfaced by _check
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                "background checkpoint write failed") from err

    def close(self):
        """Drain the queue, stop the worker, re-raise any write failure."""
        self._q.put(None)
        self._thread.join()
        self._check()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        try:
            self.close()
        except Exception as flush_err:
            if exc_type is None:
                raise
            # the loop's own exception stays primary; don't mask it
            import sys

            print(f"[ckpt] flush after abort also failed: {flush_err}",
                  file=sys.stderr)


def _merge_tolerant(target, loaded, path=""):
    """Copy loaded leaves into target where shapes match; warn otherwise
    (reference model.py:219-231 semantics)."""
    import numpy as np

    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_tolerant(v, loaded[k], f"{path}/{k}")
            else:
                print(f"[ckpt] no parameter {path}/{k} in checkpoint, keeping init")
                out[k] = v
        return out
    if loaded is None:
        return target
    t = np.asarray(target)
    l = np.asarray(loaded)
    if t.shape != l.shape:
        print(f"[ckpt] shape mismatch at {path}: ckpt {l.shape} vs model {t.shape}, keeping init")
        return target
    return jnp.asarray(l)


def load_checkpoint(path: str, state: TrainState, resume: bool = False) -> TrainState:
    """Load a checkpoint into an initialized state.

    resume=True also restores optimizer state + epoch (model.py:234-247);
    otherwise only parameters/batch stats are loaded.

    The file is restored WITHOUT a structural template
    (``msgpack_restore``): flax's ``from_bytes(template, ...)`` raises on
    any added/removed key or a different optimizer pytree before the
    tolerant merge could run, which made the documented warm-start path
    (shape/arch tweaks, freeze= changes) dead code — and forced the
    checkpoint's opt_state through the strict template even when
    resume=False throws it away.
    """
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = f.read()
    loaded = serialization.msgpack_restore(raw)
    params = _merge_tolerant(
        serialization.to_state_dict(state.params),
        loaded.get("params"),
        "params",
    )
    params = serialization.from_state_dict(state.params, params)
    batch_stats = _merge_tolerant(
        serialization.to_state_dict(state.batch_stats),
        loaded.get("batch_stats"),
        "batch_stats",
    )
    batch_stats = serialization.from_state_dict(state.batch_stats, batch_stats)
    new = state.replace(params=params, batch_stats=batch_stats)
    if resume:
        try:
            opt_state = serialization.from_state_dict(
                state.opt_state, loaded["opt_state"]
            )
        except (KeyError, ValueError, TypeError) as e:
            raise ValueError(
                "--resume requires the checkpoint's optimizer state to match "
                "the current optimizer structure (same freeze=/lr setup); "
                f"restoring opt_state from {path} failed: {e}. Load without "
                "--resume to warm-start parameters only."
            ) from e
        new = new.replace(
            step=int(loaded.get("step", 0)),
            epoch=int(loaded.get("epoch", 0)),
            opt_state=opt_state,
        )
    return new
