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

def save_checkpoint(path: str, state: TrainState, config=None):
    """Serialize {epoch, params, batch_stats, opt_state} (+config JSON)."""
    os.makedirs(path, exist_ok=True)
    payload = {
        "step": state.step,
        "epoch": state.epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(payload))
    if config is not None:
        config.save(os.path.join(path, "opt.json"))


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
