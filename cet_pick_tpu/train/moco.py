"""MoCo exploration training: momentum key encoder + negative queue.

Rebuild of reference cet_pick/models/moco.py:12-151 + moco_main.py +
trains/tomo_moco_trainer.py:17-84 as a pure-functional jax train step:

* query encoder = the SimSiam trunk + proj head (models/simsiam.py);
* key encoder params/batch-stats are an EMA copy (m = 0.999), updated inside
  the jitted step with ``jax.tree_map`` — the reference's per-parameter copy
  loop (moco.py:38-39);
* feature queue (r = 1024) and its pointer are part of the train state; the
  dequeue/enqueue is a ``lax.dynamic_update_slice`` (moco.py:42-52);
* InfoNCE: l_pos = q . k+, l_neg = q . queue, temperature T = 0.1, target
  class 0 (moco.py:125-151).

The reference's DDP batch-shuffle (moco.py:55-99) exists to de-correlate
BatchNorm statistics between shards; under a jax data-parallel mesh the key
forward uses the *running* statistics (train=False) instead, which removes
the intra-batch BN leakage the shuffle works around without any collective.
"""

from __future__ import annotations

import dataclasses

import itertools

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from cet_pick_tpu.ops.augment import (
    simsiam_augment, simsiam_augment_3d, simsiam_augment_vol, vol_out_size,
)


class MoCoState(struct.PyTreeNode):
    step: int
    epoch: int
    params: Any              # query encoder
    batch_stats: Any
    key_params: Any          # momentum (key) encoder
    key_batch_stats: Any
    queue: jnp.ndarray       # (r, dim), L2-normalized rows
    queue_ptr: jnp.ndarray   # () int32
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_moco_state(model, config, rng, sample_batch, r=1024, lr=None):
    from cet_pick_tpu.train.state import jit_init

    anchor = jnp.asarray(sample_batch["anchor"])
    if model.mode == "vol":
        od, oh, ow = vol_out_size(anchor.shape[1:])
        x2d = jnp.zeros((anchor.shape[0], od, oh, ow, 1), jnp.float32)
        x3d = None
    else:
        b, c = anchor.shape[:2]
        x2d = anchor[:, 0, :, :, None]
        x3d = anchor[:, 1, :, :, None] if c == 2 else None
    variables = jit_init(model, rng, x2d, x3d, x2d, x3d, train=False)
    tx = optax.inject_hyperparams(optax.sgd)(
        learning_rate=lr if lr is not None else config.lr
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    # model.head_conv, not config.head_conv: the reference-structural
    # migration arches (simsiamref/moco3dref) pin their head widths to the
    # reference's fixed dims regardless of the flag (models/simsiam.py
    # create_simsiam)
    dim = getattr(model, "head_conv", config.head_conv)
    queue = jax.random.normal(jax.random.fold_in(rng, 1),
                              (r, dim), jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=1, keepdims=True)
    return MoCoState(
        step=0, epoch=0,
        params=params, batch_stats=batch_stats,
        key_params=jax.tree_util.tree_map(jnp.copy, params),
        key_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        queue=queue, queue_ptr=jnp.zeros((), jnp.int32),
        opt_state=tx.init(params), tx=tx,
    )


def make_moco_train_step(model, config, mode: str, m=0.999, temperature=0.1):
    """Jitted (state, batch, key) -> (state, metrics) MoCo step."""
    return jax.jit(moco_step_fn(model, config, mode, m=m, temperature=temperature))


def moco_step_fn(model, config, mode: str, m=0.999, temperature=0.1):
    """Un-jitted MoCo step body — jit directly or hand to
    parallel.mesh.make_dp_step for the data-parallel (DDP-analog) path."""
    two_channel = mode == "2d3d"
    if mode == "vol":
        # 3D-subvolume pipeline (ops/augment.simsiam_augment_vol)
        out_size = vol_out_size(config.vol_size)
        augment = simsiam_augment_vol
    else:
        out_size = config.bbox
        # rec-only mode: ColorJitter+RandomResizedCrop pipeline, as in
        # explore (tomo_pre_proj_angle_select_new3d_vol.py:49-89)
        augment = simsiam_augment if two_channel else simsiam_augment_3d

    def split_views(x):
        if mode == "vol":
            return x[..., None], None  # (B, D, H, W) -> NDHWC
        x2d = x[:, 0, :, :, None]
        x3d = x[:, 1, :, :, None] if two_channel else None
        return x2d, x3d

    def embed(params, batch_stats, x, train):
        x2d, x3d = split_views(x)
        if train:
            (feat, z), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x2d, x3d, train, mutable=["batch_stats"],
                method=_encode_proj,
            )
            return z, updates["batch_stats"]
        feat, z = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x2d, x3d, train, method=_encode_proj,
        )
        return z, batch_stats

    def _encode_proj(mdl, x2d, x3d, train):
        feat = mdl.encode(x2d, x3d, train)
        z = mdl.proj(feat, train)
        return feat, z

    def loss_fn(params, batch_stats, key_z, queue, v_q):
        q, new_bs = embed(params, batch_stats, v_q, True)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        l_pos = jnp.sum(q * key_z, axis=1, keepdims=True)        # (B, 1)
        l_neg = q @ queue.T                                       # (B, r)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
        # cross-entropy against class 0 (moco.py:139-151)
        loss = jnp.mean(-logits[:, 0] + jax.nn.logsumexp(logits, axis=1))
        acc = jnp.mean(jnp.argmax(logits, axis=1) == 0)
        return loss, (new_bs, {"loss": loss, "acc": acc})

    # --moco_symmetric: the standalone MoCoModel/MoCoTrainer variant
    # (moco_single_main.py + trains/tomo_moco_small_trainer.py:135-161):
    # both views are strongly augmented, the InfoNCE runs in BOTH
    # directions (loss_12 + loss_21), and BOTH key embeddings enqueue (2B
    # keys/step). Expressed here as the asymmetric step on a doubled
    # batch: queries [v1, v2] against keys [k2, k1] — identical logits, a
    # single fused conv batch instead of two. (Our mean over 2B rows is
    # (loss_12+loss_21)/2, a constant factor the LR absorbs. The
    # standalone's single-GPU batch-shuffle BN trick is subsumed by the
    # running-stats key forward below, the same leakage answer the shared
    # path already uses.)
    symmetric = bool(getattr(config, "moco_symmetric", False))

    def train_step(state: MoCoState, batch, rng_key):
        k1, k2 = jax.random.split(rng_key)
        mnorm, snorm = batch["norm_mean"], batch["norm_std"]
        keys1 = jax.random.split(k1, batch["anchor"].shape[0])
        keys2 = jax.random.split(k2, batch["aug"].shape[0])
        v_q = augment(batch["anchor"], keys1, mnorm, snorm, out_size, strong=True)
        v_k = augment(batch["aug"], keys2, mnorm, snorm, out_size,
                      strong=symmetric)
        if symmetric:
            v_q, v_k = (jnp.concatenate([v_q, v_k], axis=0),
                        jnp.concatenate([v_k, v_q], axis=0))

        # momentum update BEFORE the key forward (moco.py:118-121)
        new_key_params = jax.tree_util.tree_map(
            lambda pk, pq: pk * m + pq * (1.0 - m), state.key_params, state.params
        )
        key_z, _ = embed(new_key_params, state.key_batch_stats, v_k, False)
        key_z = key_z / jnp.maximum(
            jnp.linalg.norm(key_z, axis=1, keepdims=True), 1e-12
        )
        key_z = jax.lax.stop_gradient(key_z)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, key_z, state.queue, v_q
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # enqueue keys at the pointer (moco.py:42-52); r % batch == 0 assumed.
        # The queue stays float32 regardless of the activation dtype (bf16
        # encoders produce bf16 keys; a bf16 queue would degrade every later
        # step's negatives and dynamic_update_slice requires matching dtypes)
        bsz = key_z.shape[0]
        queue = jax.lax.dynamic_update_slice(
            state.queue, key_z.astype(state.queue.dtype), (state.queue_ptr, 0)
        )
        ptr = (state.queue_ptr + bsz) % state.queue.shape[0]

        return state.replace(
            step=state.step + 1,
            params=new_params, batch_stats=new_bs,
            key_params=new_key_params,
            key_batch_stats=state.batch_stats,
            queue=queue, queue_ptr=ptr,
            opt_state=new_opt,
        ), metrics

    return train_step


def moco_payload(state: MoCoState) -> dict:
    """The serialized MoCo checkpoint pytree (query+key encoders, queue,
    optimizer) — shared by the sync and write-behind savers."""
    return {
        "step": state.step, "epoch": state.epoch,
        "params": state.params, "batch_stats": state.batch_stats,
        "key_params": state.key_params,
        "key_batch_stats": state.key_batch_stats,
        "queue": state.queue, "queue_ptr": state.queue_ptr,
        "opt_state": state.opt_state,
    }


def save_moco_checkpoint(path, state: MoCoState, config=None):
    """Serialize the full MoCo state (query+key encoders, queue, optimizer)."""
    from cet_pick_tpu.train.state import (
        prefetch_payload, write_checkpoint_file,
    )

    payload = moco_payload(state)
    prefetch_payload(payload)
    write_checkpoint_file(path, "moco_state.msgpack", payload, config)


def load_moco_checkpoint(path, state: MoCoState) -> MoCoState:
    import os

    from flax import serialization

    with open(os.path.join(path, "moco_state.msgpack"), "rb") as f:
        raw = f.read()
    # template-free restore, like train/state.load_checkpoint: a MoCo
    # resume assumes the same config (queue size r, arch), so fields are
    # restored strictly per-field — but msgpack_restore keeps a clear
    # failure mode (KeyError naming the missing field) instead of flax's
    # whole-template structure error
    loaded = serialization.msgpack_restore(raw)
    fields = {}
    for name in ("step", "epoch", "params", "batch_stats", "key_params",
                 "key_batch_stats", "queue", "queue_ptr", "opt_state"):
        fields[name] = serialization.from_state_dict(
            getattr(state, name), loaded[name]
        )
    return state.replace(**fields)


def prepare_moco(config, r=1024, log_fn=print, warm=True):
    """Device-side setup from config alone (static shapes — see
    train/explore.prepare_explore): model, state, checkpoint load, DP
    placement, step compiled + warm-run once on a zeros batch (discarded;
    the REAL state's queue is untouched). cmd_moco overlaps this with the
    ExploreDataset build."""
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.parallel.mesh import auto_dp_step
    from cet_pick_tpu.train.explore import dummy_explore_batch

    model = create_simsiam(config)
    init_rng = jax.random.PRNGKey(config.seed)
    dummy = dummy_explore_batch(config, model.mode)
    # queue size must divide evenly by batch (moco.py:46 assert)
    # queue size must divide evenly by the per-step enqueue block: B, or 2B
    # under --moco_symmetric (both directions' keys enqueue,
    # tomo_moco_small_trainer.py:155-157)
    blk = config.batch_size * (
        2 if getattr(config, "moco_symmetric", False) else 1)
    r = max(blk, r - r % blk)
    state = create_moco_state(model, config, init_rng, dummy, r=r)
    if config.load_model:
        if config.load_model.endswith((".pth", ".pt")):
            if model.mode == "vol" and not model.trunk_kind:
                raise ValueError(
                    "the TPU-native 3D-subvolume encoders (arch simsiam_N/"
                    "moco3d_N) have no torch conversion; use --arch "
                    "moco3dref_18 / simsiamref_18 for reference .pth "
                    "migration (see train/explore.prepare_explore)"
                )
            # torch checkpoint: trained reference ckpt or torchvision
            # imagenet resnet18 (simsiam_model_2d3d.py:809-838). The key
            # encoder restarts as a copy of the query encoder, as at init.
            from cet_pick_tpu.models.convert import load_simsiam_torch

            state = load_simsiam_torch(config.load_model, state, log_fn=log_fn)
            state = state.replace(
                key_params=jax.tree_util.tree_map(jnp.copy, state.params),
                key_batch_stats=jax.tree_util.tree_map(
                    jnp.copy, state.batch_stats
                ),
            )
        else:
            state = load_moco_checkpoint(config.load_model, state)
        log_fn(f"loaded checkpoint from {config.load_model}")

    # data-parallel mesh (shared policy with train_refine/train_explore); the
    # queue + momentum encoder are replicated state, the key embeddings that
    # feed the queue update are the all-gathered global batch, so the queue
    # stays bit-identical to the single-device run
    step, place_state, place_batch, _ = auto_dp_step(
        config, moco_step_fn(model, config, model.mode), log_fn=log_fn
    )
    state = place_state(state)
    if warm:
        from cet_pick_tpu.parallel.mesh import warm_step

        warm_step(step, state, place_batch(dummy), jax.random.PRNGKey(0))
    return {"model": model, "state": state, "step": step,
            "place_batch": place_batch}


def train_moco(config, dataset, num_epochs=None, r=1024, log_fn=print,
               prepared=None):
    """MoCo epoch loop (moco_main.py).

    ``prepared``: the result of :func:`prepare_moco`, when the caller
    overlapped device setup with the dataset build (cmd_moco)."""
    from cet_pick_tpu.train.explore import simsiam_lr_at_epoch, simsiam_warmup_lr

    if prepared is None:
        prepared = prepare_moco(config, r=r, log_fn=log_fn, warm=False)
    model = prepared["model"]
    state = prepared["state"]
    step = prepared["step"]
    place_batch = prepared["place_batch"]
    rng = np.random.default_rng(config.seed)

    norm_mean = (
        np.array([dataset.mean_2d, dataset.mean_3d], np.float32)
        if model.mode == "2d3d" else np.array([dataset.mean_3d], np.float32)
    )
    norm_std = (
        np.array([dataset.std_2d, dataset.std_3d], np.float32)
        if model.mode == "2d3d" else np.array([dataset.std_3d], np.float32)
    )

    num_epochs = num_epochs or config.num_epochs
    # schedule over the effective run length (see train_explore) and resume
    # from the restored epoch like the other loops — restarting at 1 after
    # load_moco_checkpoint replayed the warmup/cosine schedule from scratch
    sched_cfg = (config if num_epochs == config.num_epochs
                 else dataclasses.replace(config, num_epochs=num_epochs))
    history = []
    key = jax.random.PRNGKey(config.seed + 1)
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, set_learning_rate,
    )

    with AsyncCheckpointer(filename="moco_state.msgpack") as ckpt:
        for epoch in range(state.epoch + 1, num_epochs + 1):
            state = set_learning_rate(state, simsiam_lr_at_epoch(sched_cfg, epoch))
            epoch_metrics = []
            total_batches = max(len(dataset) // config.batch_size, 1)
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            # per-epoch cap (base_trainer.py:263-268); islice doesn't build the
            # first discarded batch
            for it, batch in enumerate(itertools.islice(
                    dataset.epoch_batches(rng, config.batch_size), cap)):
                wlr = simsiam_warmup_lr(sched_cfg, epoch, it, total_batches)
                if wlr is not None:
                    state = set_learning_rate(state, wlr)
                batch["norm_mean"] = norm_mean
                batch["norm_std"] = norm_std
                key, sub = jax.random.split(key)
                state, metrics = step(state, place_batch(batch), sub)
                m = drain.push(metrics)
                if m is not None:
                    epoch_metrics.append(m)
            m = drain.pop()
            if m is not None:
                epoch_metrics.append(m)
            if not epoch_metrics:
                raise ValueError(
                    f"no training batches: {len(dataset)} samples < batch_size "
                    f"{config.batch_size}"
                    + (" (--num_iters 0 caps every epoch at zero batches)"
                       if config.num_iters == 0 else "")
                )
            state = state.replace(epoch=epoch)
            means = {k: float(np.mean([mm[k] for mm in epoch_metrics]))
                     for k in epoch_metrics[0]}
            history.append(means)
            log_fn(f"epoch {epoch}: " + " ".join(f"{k}={v:.5f}" for k, v in means.items()))
            if config.save_dir:
                ckpt.save(os.path.join(config.save_dir, "model_last"),
                          moco_payload(state), config)
                if config.save_all and (config.val_intervals <= 0
                                        or epoch % config.val_intervals == 0):
                    ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                              moco_payload(state), config)
    return state, history
