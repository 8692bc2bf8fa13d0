"""Write-behind checkpointing (train/state.AsyncCheckpointer).

The per-epoch model_last save is the train loops' last synchronous
device->host fetch (2.5-9.9 s through the axon tunnel, measured in
benchmarks/ckpt_bench.py); these tests pin the properties that make the
write-behind safe to ship:

- bytes identical to the synchronous save_checkpoint
- the device-side snapshot decouples the write from the live state (a DP
  train step DONATES its state input, deleting the previous buffers)
- submission order wins (model_last is always the newest)
- worker failures surface on close() instead of vanishing
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from cet_pick_tpu.train.state import AsyncCheckpointer, write_checkpoint_file


def _payload(scale=1.0):
    return {
        "step": 7,
        "epoch": 3,
        "params": {"w": jnp.arange(32.0) * scale, "b": jnp.ones((4, 4))},
        "opt_state": {"mu": jnp.zeros((32,))},
    }


def test_async_save_matches_sync(tmp_path):
    """Same restored tree as the synchronous writer (the snapshot's
    tree_map re-keys dicts in sorted order, so raw bytes may differ while
    every key and value is identical)."""
    payload = _payload()
    write_checkpoint_file(str(tmp_path / "sync"), "state.msgpack", payload, None)
    with AsyncCheckpointer() as ckpt:
        ckpt.save(str(tmp_path / "bg"), payload)
    sync = serialization.msgpack_restore(
        (tmp_path / "sync" / "state.msgpack").read_bytes())
    bg = serialization.msgpack_restore(
        (tmp_path / "bg" / "state.msgpack").read_bytes())
    assert jax.tree_util.tree_structure(sync) == \
        jax.tree_util.tree_structure(bg)
    for a, b in zip(jax.tree_util.tree_leaves(sync),
                    jax.tree_util.tree_leaves(bg)):
        np.testing.assert_array_equal(a, b)


def test_snapshot_decouples_from_live_buffers(tmp_path):
    """After save() returns, deleting the caller's device buffers (what a
    DONATING DP train step does to the previous state at its next dispatch)
    must not corrupt the queued write."""
    payload = _payload()
    with AsyncCheckpointer() as ckpt:
        ckpt.save(str(tmp_path / "ck"), payload)
        for leaf in (payload["params"]["w"], payload["params"]["b"],
                     payload["opt_state"]["mu"]):
            leaf.delete()
    loaded = serialization.msgpack_restore(
        (tmp_path / "ck" / "state.msgpack").read_bytes())
    np.testing.assert_array_equal(loaded["params"]["w"], np.arange(32.0))
    assert loaded["step"] == 7 and loaded["epoch"] == 3


def test_submission_order_wins(tmp_path):
    path = str(tmp_path / "model_last")
    with AsyncCheckpointer() as ckpt:
        ckpt.save(path, _payload(scale=1.0))
        ckpt.save(path, _payload(scale=2.0))
    loaded = serialization.msgpack_restore(
        (tmp_path / "model_last" / "state.msgpack").read_bytes())
    np.testing.assert_array_equal(loaded["params"]["w"], np.arange(32.0) * 2)


def test_shared_snapshot_serializes_once(tmp_path):
    """model_last + model_best + model_N of one epoch reuse one snapshot
    (and the worker's byte cache); all three files must still be complete."""
    with AsyncCheckpointer() as ckpt:
        snap = ckpt.save(str(tmp_path / "model_last"), _payload())
        ckpt.save(str(tmp_path / "model_best"), snap, snapshotted=True)
        ckpt.save(str(tmp_path / "model_9"), snap, snapshotted=True)
    blobs = [(tmp_path / d / "state.msgpack").read_bytes()
             for d in ("model_last", "model_best", "model_9")]
    assert blobs[0] == blobs[1] == blobs[2] and len(blobs[0]) > 0


def test_worker_error_surfaces_on_close(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("occupied")  # makedirs inside the worker must fail
    ckpt = AsyncCheckpointer()
    ckpt.save(str(blocker), _payload())
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        ckpt.close()


def test_no_tmp_files_left(tmp_path):
    """Atomic-replace writes: no .tmp residue after a clean close."""
    with AsyncCheckpointer() as ckpt:
        ckpt.save(str(tmp_path / "ck"), _payload())
    assert sorted(p.name for p in (tmp_path / "ck").iterdir()) == [
        "state.msgpack"]
