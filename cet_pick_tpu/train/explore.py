"""Exploration (SimSiam) training: on-device augs + negative-cosine objective.

Rebuild of reference cet_pick/simsiam_main.py:25-166 +
trains/tomo_simsiam_trainer.py:17-55:

* optimizer: plain SGD(lr) (simsiam_main.py:65 — the lr*bs/256 value is
  computed there but unused);
* per-epoch LR: cosine with eta_min = lr * decay^3, or step decay
  (utils/utils.py:58-70);
* loss: symmetric negative cosine -(cos(p1, z2) + cos(p2, z1))/2 with
  stop-gradient z, plus the output-std collapse monitor
  (tomo_simsiam_trainer.py:28-40);
* the strong/weak augmentation pipelines run INSIDE the jitted train step
  (ops/augment.py), vmapped over the batch on the VPU — the reference burns
  CPU DataLoader workers on per-sample torchvision transforms.
"""

from __future__ import annotations

import dataclasses

import itertools

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core

from cet_pick_tpu.ops.augment import (
    simsiam_augment, simsiam_augment_3d, simsiam_augment_vol, vol_out_size,
)
from cet_pick_tpu.train.losses import simsiam_loss
from cet_pick_tpu.train.state import TrainState, jit_init


def create_simsiam_state(model, config, rng, sample_batch, lr=None):
    """Init SimSiam variables + SGD optimizer."""
    anchor = jnp.asarray(sample_batch["anchor"])
    if model.mode == "vol":
        # the step sees POST-crop subvolumes (ops/augment.vol_out_size)
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
    return TrainState(
        step=0, epoch=0, params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), tx=tx,
    )


def simsiam_lr_at_epoch(config, epoch):
    """Cosine or step LR (utils/utils.py:58-70)."""
    lr = config.lr
    if config.cosine:
        eta_min = lr * config.lr_decay_rate ** 3
        return eta_min + (lr - eta_min) * (
            1 + np.cos(np.pi * epoch / config.num_epochs)
        ) / 2
    steps = int(np.sum(epoch > np.asarray(config.lr_step)))
    return lr * config.lr_decay_rate ** steps if steps > 0 else lr


WARM_EPOCHS = 10
WARMUP_FROM = 0.01


def simsiam_warmup_lr(config, epoch, batch_id, total_batches):
    """SupContrast-style per-batch linear LR warmup for --warm
    (utils/utils.py:73-80 with warm_epochs/warmup_from/warmup_to set at
    opts.py:216-224). Returns the warm LR, or None outside the warm phase.

    The reference defines and imports warmup_learning_rate in its
    simsiam/moco mains but the per-batch call was dropped from the loops;
    here the flag is honored (linear 0.01 -> warmup_to over the first 10
    epochs) so --warm is not a silent no-op."""
    if not config.warm or epoch > WARM_EPOCHS:
        return None
    if config.cosine:
        eta_min = config.lr * config.lr_decay_rate ** 3
        warmup_to = eta_min + (config.lr - eta_min) * (
            1 + np.cos(np.pi * WARM_EPOCHS / config.num_epochs)
        ) / 2
    else:
        warmup_to = config.lr
    p = (batch_id + (epoch - 1) * total_batches) / (WARM_EPOCHS * total_batches)
    return WARMUP_FROM + p * (warmup_to - WARMUP_FROM)


def make_simsiam_train_step(model, config, mode: str):
    """Jitted step: device augs -> two-view forward -> neg-cosine -> SGD."""
    return jax.jit(simsiam_step_fn(model, config, mode))


def simsiam_step_fn(model, config, mode: str):
    """Un-jitted (state, batch, key) -> (state, metrics) step body.

    Exposed separately so parallel.mesh.make_dp_step can jit it with pinned
    data-parallel shardings (the DDP analog of reference simsiam_main.py:28-45).
    """
    two_channel = mode == "2d3d"
    if mode == "vol":
        # 3D-subvolume pipeline: tio-style blur/noise/z-rotation/crop/znorm
        # + block corruptions (ops/augment.simsiam_augment_vol)
        out_size = vol_out_size(config.vol_size)
        augment = simsiam_augment_vol
    else:
        out_size = config.bbox
        # rec-only (3d) exploration uses the reference's distinct pipeline:
        # ColorJitter + RandomResizedCrop, no rotation/corner-erase
        # (tomo_pre_proj_angle_select_new3d_vol.py:49-89)
        augment = simsiam_augment if two_channel else simsiam_augment_3d

    def split_views(x):
        if mode == "vol":
            return x[..., None], None  # (B, D, H, W) -> NDHWC
        # (B, C, H, W) -> NHWC single-channel 2d / 3d inputs
        x2d = x[:, 0, :, :, None]
        x3d = x[:, 1, :, :, None] if two_channel else None
        return x2d, x3d

    def loss_fn(params, batch_stats, v1, v2):
        x1_2d, x1_3d = split_views(v1)
        x2_2d, x2_3d = split_views(v2)
        (ret1, ret2), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x1_2d, x1_3d, x2_2d, x2_3d, train=True,
            mutable=["batch_stats"],
        )
        loss, std = simsiam_loss(
            ret1["pred"], ret1["proj"], ret2["pred"], ret2["proj"]
        )
        return loss, (updates["batch_stats"], {"loss": loss, "std": std})

    def train_step(state: TrainState, batch, key):
        k1, k2 = jax.random.split(key)
        # per-channel normalization constants travel in the batch dict
        m = batch["norm_mean"]
        s = batch["norm_std"]
        keys1 = jax.random.split(k1, batch["anchor"].shape[0])
        keys2 = jax.random.split(k2, batch["aug"].shape[0])
        v1 = augment(batch["anchor"], keys1, m, s, out_size, strong=True)
        v2 = augment(batch["aug"], keys2, m, s, out_size, strong=False)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, v1, v2
        )
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, metrics

    return train_step


def dummy_explore_batch(config, mode):
    """Zeros batch with ExploreDataset's sample layout — (B, C, bbox, bbox)
    anchor/aug ((B, *vol_size) in vol mode) plus per-channel norm constants,
    all static from config."""
    b = config.batch_size
    if mode == "vol":
        shape = (b,) + tuple(int(s) for s in config.vol_size)
        c = 1
    else:
        c = 2 if mode == "2d3d" else 1
        s = int(config.bbox)
        shape = (b, c, s, s)
    return {
        "anchor": np.zeros(shape, np.float32),
        "aug": np.zeros(shape, np.float32),
        "norm_mean": np.zeros((c,), np.float32),
        "norm_std": np.ones((c,), np.float32),
    }


def prepare_explore(config, log_fn=print, warm=True):
    """Device-side setup from config alone: model, train state (jitted
    init), checkpoint load, DP placement, and the step compiled + warm-run
    once on a zeros batch (outputs discarded).

    Every shape the exploration step sees is static, so ``cmd_explore``
    runs this concurrently with the ExploreDataset build — DoG mining +
    tilt-sum patch extraction, the pipeline's heaviest host preprocess
    (SURVEY §3.3) — instead of serializing the remote backend handshake +
    XLA compile behind it (same schedule as train/refine.prepare_refine)."""
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.parallel.mesh import auto_dp_step
    from cet_pick_tpu.train.state import load_checkpoint

    model = create_simsiam(config)
    init_rng = jax.random.PRNGKey(config.seed)
    dummy = dummy_explore_batch(config, model.mode)
    state = create_simsiam_state(model, config, init_rng, dummy)
    if config.load_model:
        if config.load_model.endswith((".pth", ".pt")):
            if model.mode == "vol" and not model.trunk_kind:
                raise ValueError(
                    "the TPU-native 3D-subvolume encoders (arch simsiam_N/"
                    "moco3d_N, Conv3D VolTrunk) have no torch conversion — "
                    "they are structurally different from the reference's "
                    "subvolume arches. To continue from a reference .pth use "
                    "the reference-structural migration arches: --arch "
                    "simsiamref_18 (simsiam_model.py slice-wise trunk) or "
                    "--arch moco3dref_18 (moco_encoder_3d.py Conv3d trunk). "
                    "Otherwise train from scratch or load a framework "
                    "checkpoint."
                )
            # torch checkpoint: trained reference exploration ckpt converts
            # fully; a standard torchvision resnet18 becomes the reference's
            # ImageNet trunk init (simsiam_model_2d3d.py:809-838)
            from cet_pick_tpu.models.convert import load_simsiam_torch

            state = load_simsiam_torch(config.load_model, state, log_fn=log_fn)
        else:
            state = load_checkpoint(config.load_model, state, resume=config.resume)
        log_fn(f"loaded checkpoint from {config.load_model} (epoch {state.epoch})")

    # data-parallel mesh when requested (--mesh_shape N) or when several
    # devices are visible and the batch shards evenly — shared policy with
    # train_refine/train_moco; the reference's DDP path (simsiam_main.py:28-45)
    step, place_state, place_batch, _ = auto_dp_step(
        config, simsiam_step_fn(model, config, model.mode), log_fn=log_fn
    )
    state = place_state(state)
    if warm:
        from cet_pick_tpu.parallel.mesh import warm_step

        warm_step(step, state, place_batch(dummy), jax.random.PRNGKey(0))
    return {"model": model, "state": state, "step": step,
            "place_batch": place_batch}


def train_explore(config, dataset, num_epochs=None, log_fn=print,
                  prepared=None, epoch_hook=None):
    """Full exploration training loop (simsiam_main.py:108-166).

    ``prepared``: the result of :func:`prepare_explore`, when the caller
    overlapped device setup with the dataset build (cmd_explore).
    ``epoch_hook(epoch, state, means)``: optional callback after each
    epoch's checkpoint (means = that epoch's averaged metrics) — used by
    the recommended-budget quality-trend run (benchmarks/flagship_explore.py
    --trend) to score separability mid-run without disturbing the LR
    schedule."""
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, set_learning_rate,
    )

    if prepared is None:
        prepared = prepare_explore(config, log_fn=log_fn, warm=False)
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
    # cosine/warmup schedules anneal over the EFFECTIVE run length — a
    # num_epochs override with config.num_epochs=140 would otherwise leave
    # a short run at ~full LR the whole way
    sched_cfg = (config if num_epochs == config.num_epochs
                 else dataclasses.replace(config, num_epochs=num_epochs))
    start_epoch = state.epoch + 1
    history = []
    key = jax.random.PRNGKey(config.seed + 1)
    # write-behind checkpointing (train/state.AsyncCheckpointer): the
    # model_last fetch+write runs behind the next epoch's compute
    with AsyncCheckpointer() as ckpt:
        for epoch in range(start_epoch, num_epochs + 1):
            state = set_learning_rate(state, simsiam_lr_at_epoch(sched_cfg, epoch))
            epoch_metrics = []
            from cet_pick_tpu.data.prefetch import PrefetchIterator

            def with_norm(it):
                for b in it:
                    b["norm_mean"] = norm_mean
                    b["norm_std"] = norm_std
                    yield b

            batches = PrefetchIterator(
                with_norm(dataset.epoch_batches(rng, config.batch_size)),
                device_put=place_batch,
            )
            total_batches = max(len(dataset) // config.batch_size, 1)
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            with batches:  # releases the producer thread on a num_iters break
                # per-epoch cap (base_trainer.py:263-268); islice doesn't pull
                # the first discarded batch
                for it, batch in enumerate(itertools.islice(batches, cap)):
                    wlr = simsiam_warmup_lr(sched_cfg, epoch, it, total_batches)
                    if wlr is not None:
                        state = set_learning_rate(state, wlr)
                    key, sub = jax.random.split(key)
                    state, metrics = step(state, batch, sub)
                    m = drain.push(metrics)
                    if m is not None:
                        epoch_metrics.append(m)
            m = drain.pop()
            if m is not None:
                epoch_metrics.append(m)
            if not epoch_metrics:
                raise ValueError(
                    f"no training batches: {len(dataset)} samples < batch_size "
                    f"{config.batch_size} with drop_last — lower batch_size"
                )
            state = state.replace(epoch=epoch)
            means = {
                k: float(np.mean([m[k] for m in epoch_metrics]))
                for k in epoch_metrics[0]
            }
            history.append(means)
            log_fn(f"epoch {epoch}: " + " ".join(f"{k}={v:.5f}" for k, v in means.items()))
            snap = ckpt.save(os.path.join(config.save_dir, "model_last"),
                             checkpoint_payload(state), config)
            if (config.save_all and config.val_intervals > 0
                    and epoch % config.val_intervals == 0):
                ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                          snap, config, snapshotted=True)
            if epoch_hook is not None:
                epoch_hook(epoch, state, means)
    return state, history
