"""Refinement training: PU focal + debiased contrastive + flip consistency.

TPU-native rebuild of the reference's flagship train loop — ``main.py semi``
with ``TomoCRSemiTrainer`` (reference: cet_pick/main.py:21-129,
cet_pick/trains/tomo_cr_semi_trainer.py:17-121, trains/base_trainer.py:446-552):

    loss = hm_loss + cr_weight * (debiased_sup + 0.1 * debiased_unsup) + consis
    hm_loss = PU focal (default) | focal (--pn) (tomo_cr_semi_trainer.py:25-31)
    both views forwarded through the model; the aug view's feature maps and
    heatmap are un-flipped by flip_prob before the contrastive/consistency
    terms (tomo_cr_semi_trainer.py:67-92)
    validation uses plain focal on whole volumes (:57-60)

The whole step (two forwards + all losses + Adam update) is a single jitted
function. Unlike the reference (whose scalar ``flip_prob`` branch restricts it
to batch size 1), samples carry per-sample flip flags and are un-flipped with
a vectorized ``jnp.where`` — arbitrary batch sizes shard cleanly over a device
mesh (see parallel/mesh.py).
"""

from __future__ import annotations

import itertools

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from cet_pick_tpu.ops.nms import sigmoid_clamped
from cet_pick_tpu.train import losses as L
from cet_pick_tpu.train.metrics import LaggedMetrics
from cet_pick_tpu.train.state import TrainState


def unflip_aug(x, flip_prob):
    """Undo per-sample flips on (B, P, D, H, W, ...) view-2 outputs.

    flip_prob > 0.5 means the aug view was flipped along H (ud), else along W
    (lr) — mirror of particle_moco.py:145-154 / tomo_cr_semi_trainer.py:71-76.
    """
    ud = jnp.flip(x, axis=3)
    lr = jnp.flip(x, axis=4)
    cond = (flip_prob > 0.5).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(cond, ud, lr)


def _forward_pair(model, params, batch_stats, x, train):
    """Apply the model to (B, P, D, H, W) paired crops by folding P into batch."""
    b, p, d, h, w = x.shape
    if train:
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.reshape(b * p, d, h, w),
            train=True,
            mutable=["batch_stats"],
        )
        # norm-free models (e.g. the GroupNorm 3D detector) return no stats
        updates = dict(updates) if updates else {}
        updates.setdefault("batch_stats", batch_stats)
    else:
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.reshape(b * p, d, h, w), train=False,
        )
        updates = {"batch_stats": batch_stats}
    # back to (B, P, D, H', W', C)
    out = {
        k: v.reshape((b, p) + v.shape[1:]) for k, v in out.items()
    }
    return out, updates["batch_stats"]


def make_train_step(model, config):
    """Build the jitted train step for this model/config."""
    cr_weight = config.cr_weight
    tau = config.tau
    temp = config.temp
    thresh = config.thresh
    use_pn = config.pn
    use_ge = config.ge
    contrastive = config.contrastive
    # Pallas flash-gram gate (decided at build time; see the helper's
    # docstring for the lax.map / GSPMD invariant it encodes)
    use_pallas_gram = L.pallas_gram_step_gate(config)

    def loss_fn(params, batch_stats, batch):
        out, bs1 = _forward_pair(model, params, batch_stats, batch["input"], True)
        # the aug view is the per-sample flip of the anchor crops
        # (particle_moco.py:145-154) — a flip is an involution, so the SAME
        # helper both makes and undoes it. Synthesizing it on device halves
        # the batch's host->device bytes vs shipping the flipped copy.
        input_aug = unflip_aug(batch["input"], batch["flip_prob"])
        out_cr, bs2 = _forward_pair(model, params, bs1, input_aug, True)

        hm = sigmoid_clamped(out["hm"][..., 0])        # (B, P, D, H', W')
        hm_cr = sigmoid_clamped(out_cr["hm"][..., 0])
        gt = batch["hm"]                               # (B, P, D, H', W')

        if use_pn:
            hm_loss = L.focal_loss(hm, gt)
            num_pos = (gt == 1).sum()
        elif use_ge:
            hm_loss = L.pu_ge_loss(hm, gt, tau=tau)
            num_pos = (gt == 1).sum()
        else:
            hm_loss, num_pos = L.pu_focal_loss(hm, gt, tau=tau)

        metrics = {"hm_loss": hm_loss, "num_pos": num_pos}
        loss = hm_loss

        if contrastive:
            flip = batch["flip_prob"]
            proj_cr = unflip_aug(out_cr["proj"], flip)
            hm_cr_unflipped = unflip_aug(hm_cr, flip)

            # Per-sample contrastive grams via vmap: each sample's 2N x 2N
            # similarity stays on its own device (no cross-device all-gather
            # under data-parallel sharding) and matches the reference's
            # batch-size-1 semantics (tomo_cr_semi_trainer.py:67-92) while
            # scaling O(B * N^2) instead of O((B*N)^2).
            c = out["proj"].shape[-1]
            bsz = gt.shape[0]
            feats = out["proj"].reshape(bsz, -1, c)
            feats_cr = proj_cr.reshape(bsz, -1, c)
            labels = gt.reshape(bsz, -1)
            hm_flat = hm.reshape(bsz, -1)
            hm_cr_flat = hm_cr_unflipped.reshape(bsz, -1)

            if use_pn and use_pallas_gram:
                # same lax.map-not-vmap rule as the unbiased branch below
                cr = jax.lax.map(
                    lambda a: L.supcon_loss(
                        *a, temp=temp, thresh=thresh, backend="pallas"
                    ),
                    (labels, feats, feats_cr),
                ).mean()
                metrics["cr_loss"] = cr
                loss = loss + cr * cr_weight
            elif use_pn:
                cr = jax.vmap(
                    lambda l, f, fc: L.supcon_loss(
                        l, f, fc, temp=temp, thresh=thresh, backend="xla"
                    )
                )(labels, feats, feats_cr).mean()
                metrics["cr_loss"] = cr
                loss = loss + cr * cr_weight
            elif use_pallas_gram:
                # Pallas flash-gram path (ops/pallas_gram.py; won the v5e
                # A/B, benchmarks/gram_step_ab.py). Sequential lax.map, NOT
                # vmap: vmapping the kernel re-lowers it through a batching
                # rule the remote Mosaic compiler rejects, while lax.map
                # traces the exact standalone kernel that compiles — and
                # the per-sample grams were never parallel anyway (each
                # fills the chip). Single-device only (gate below): a
                # lax.map over a GSPMD-sharded batch axis would serialize
                # across devices.
                sup, unsup, _ = jax.lax.map(
                    lambda a: L.unbiased_con_loss(
                        *a, temp=temp, tau_plus=tau, thresh=thresh,
                        backend="pallas",
                    ),
                    (labels, hm_flat, hm_cr_flat, feats, feats_cr),
                )
                cr = (sup + 0.1 * unsup).mean()
                metrics["cr_loss"] = cr
                loss = loss + cr * cr_weight
            else:
                sup, unsup, _ = jax.vmap(
                    lambda l, h1, h2, f, fc: L.unbiased_con_loss(
                        l, h1, h2, f, fc, temp=temp, tau_plus=tau,
                        thresh=thresh, backend="xla",
                    )
                )(labels, hm_flat, hm_cr_flat, feats, feats_cr)
                cr = (sup + 0.1 * unsup).mean()
                metrics["cr_loss"] = cr
                loss = loss + cr * cr_weight

            consis = L.consistency_loss(hm_flat, hm_cr_flat)
            metrics["consis_loss"] = consis
            loss = loss + consis

        metrics["loss"] = loss
        return loss, (bs2, metrics)

    @jax.jit
    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(state.params, state.batch_stats, batch)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, metrics

    return train_step


def make_val_step(model):
    """Whole-volume validation loss: plain focal (tomo_cr_semi_trainer.py:57-60)."""

    @jax.jit
    def val_step(state: TrainState, volume, gt_hm):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            volume, train=False, active_heads=("hm",),
        )
        hm = sigmoid_clamped(out["hm"][..., 0])
        return L.focal_loss(hm, gt_hm)

    return val_step


def lr_at_epoch(config, epoch):
    """Step decay: lr * decay^(#steps passed) (main.py:122-128)."""
    lr = config.lr
    for step_epoch in config.lr_step:
        if epoch >= step_epoch:
            lr *= config.lr_decay_rate
    return lr


def dummy_refine_batch(config, pairs=2, label=False):
    """Zeros batch with RefineDataset's sample layout. Every shape is a
    constant (CROP_D x 64 x 64 crops, anchor/partner pairs, batch_size) —
    which is what lets the whole device-side setup compile before any data
    exists. ``pairs=1, label=True`` is the semiclass layout (single
    voxel-centric crop + center label per sample, data/classify_dataset.py);
    the pytree structure must match the real batch exactly or the warm
    compile is wasted."""
    from cet_pick_tpu.data.refine_dataset import CROP_D

    b = config.batch_size
    from cet_pick_tpu.data.refine_dataset import CROP_HALF_XY, crop_hm_half

    s, hs = 2 * CROP_HALF_XY, 2 * crop_hm_half(config.down_ratio)
    out = {
        "input": np.zeros((b, pairs, CROP_D, s, s), np.float32),
        "hm": np.zeros((b, pairs, CROP_D, hs, hs), np.float32),
        "flip_prob": np.zeros((b,), np.float32),
    }
    if label:
        out["label"] = np.zeros((b,), np.float32)
    return out


def prepare_refine(config, log_fn=print, pairs=2, label=False, warm=True):
    """Device-side setup from config alone: model, train state (jitted
    init), checkpoint load, DP placement, and the train step compiled +
    warm-run once on a zeros batch (outputs discarded — params untouched).

    None of this needs data, so ``cmd_train`` runs it concurrently with the
    host-side dataset build (disk read + preprocess + heatmap splat, tens
    of seconds): on a remote-attached TPU the backend handshake + XLA
    compile are minutes that otherwise serialize in front of epoch 1.

    ``warm=False`` skips the warm-up execution — right for the
    prepared-is-None fallback (direct library calls, tests): with nothing
    to overlap, the compile happens at the same timeline point on the
    first real batch anyway and the zeros step would be pure overhead."""
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.parallel.mesh import auto_dp_step
    from cet_pick_tpu.train.state import create_train_state, load_checkpoint

    model = create_detector(config)
    init_rng = jax.random.PRNGKey(config.seed)
    dummy = dummy_refine_batch(config, pairs=pairs, label=label)
    b, p, d, h, w = dummy["input"].shape
    state = create_train_state(
        model, config, init_rng, dummy["input"].reshape(b * p, d, h, w))
    if config.load_model:
        if config.load_model.endswith((".pth", ".pt")):
            # reference torch checkpoint (TomoConvUNet / TomoRes3DNet):
            # warm-start parameters via models/convert (main.py --load_model)
            from flax import serialization

            from cet_pick_tpu.models.convert import load_reference_checkpoint

            params, batch_stats = load_reference_checkpoint(
                config.load_model, config
            )
            state = state.replace(
                params=serialization.from_state_dict(state.params, params),
                batch_stats=serialization.from_state_dict(
                    state.batch_stats, batch_stats),
            )
            log_fn(f"converted reference checkpoint {config.load_model}")
        else:
            state = load_checkpoint(config.load_model, state,
                                    resume=config.resume)
            log_fn(f"loaded checkpoint from {config.load_model} "
                   f"(epoch {state.epoch})")

    # data-parallel mesh when requested (--mesh_shape N) or when several
    # devices are visible and the batch shards evenly: state replicated,
    # batch sharded, gradient all-reduce inserted by GSPMD (parallel/mesh.py)
    train_step, place_state, place_batch, _ = auto_dp_step(
        config, make_train_step(model, config), log_fn=log_fn
    )
    state = place_state(state)
    if warm:
        from cet_pick_tpu.parallel.mesh import warm_step

        warm_step(train_step, state, place_batch(dummy))
    return {"model": model, "state": state, "train_step": train_step,
            "place_batch": place_batch}


def train_refine(config, dataset, val_dataset=None, num_epochs=None,
                 log_fn=print, prepared=None):
    """Full training loop (main.py:99-128): epochs, LR steps, periodic val/ckpt.

    ``prepared``: the result of :func:`prepare_refine`, when the caller
    overlapped device setup with the dataset build (cmd_train)."""
    import os

    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, set_learning_rate,
    )

    if prepared is None:
        prepared = prepare_refine(config, log_fn=log_fn, warm=False)
    model = prepared["model"]
    state = prepared["state"]
    train_step = prepared["train_step"]
    place_batch = prepared["place_batch"]
    rng = np.random.default_rng(config.seed)
    val_step = make_val_step(model) if val_dataset is not None else None

    num_epochs = num_epochs or config.num_epochs
    start_epoch = state.epoch + 1
    history = []
    # cross-restart best tracking: the reference resets best to inf on every
    # invocation (main.py:105) so a resumed run's first val always overwrites
    # model_best; we persist it beside the checkpoints instead (ADVICE r2)
    best_val = _load_best_val(config.save_dir) if config.resume else float("inf")
    # write-behind checkpointing: the per-epoch model_last save's fetch +
    # serialize + disk write runs behind the next epoch's compute
    # (train/state.AsyncCheckpointer; 2.5-9.9 s/epoch through the tunnel)
    with AsyncCheckpointer() as ckpt:
        for epoch in range(start_epoch, num_epochs + 1):
            state = set_learning_rate(state, lr_at_epoch(config, epoch))
            epoch_metrics = []
            from cet_pick_tpu.data.prefetch import PrefetchIterator

            batches = PrefetchIterator(
                dataset.epoch_batches(rng, config.batch_size),
                device_put=place_batch,
            )
            # --profile_dir: capture the first post-resume epoch as an XLA
            # profiler trace (utils/profiling.py; view in TensorBoard's profile tab)
            from cet_pick_tpu.utils.profiling import maybe_trace

            # the context manager releases the producer thread + its in-flight
            # device batches when the --num_iters cap breaks out mid-epoch
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py): the PU
            # zero-positive guard below therefore fires one step late — fine,
            # it aborts the whole run either way
            drain = LaggedMetrics()

            def _collect(m):
                if m is None:
                    return
                # only the plain PU risk estimator is undefined without
                # positives (reference loss.py:275-276); pn (focal) and ge
                # tolerate it
                if not config.pn and not config.ge and m.get("num_pos", 1) == 0:
                    # the reference's PU loss raises here (loss.py:275-276):
                    # zero labeled positives make the PU risk estimate undefined
                    raise ValueError(
                        "batch contains no positive heatmap voxels — "
                        "annotations missing or dropped (check --order and "
                        "coordinate files)"
                    )
                epoch_metrics.append(m)

            with maybe_trace(config.profile_dir if epoch == start_epoch else None), \
                    batches:
                # per-epoch iteration cap (base_trainer.py:263-268; -1 = all);
                # islice never pulls the first discarded batch off the prefetcher
                for batch in itertools.islice(batches, cap):
                    state, metrics = train_step(state, batch)
                    _collect(drain.push(metrics))
            _collect(drain.pop())
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
            if config.val_intervals > 0 and epoch % config.val_intervals == 0:
                if val_step is not None:
                    vals = []
                    for i in range(len(val_dataset.names)):
                        item = val_dataset.val_item(i)
                        vals.append(float(val_step(state, item["input"], item["hm"])))
                        if config.debug > 0:
                            _debug_val_volume(config, model, state, item, epoch, i)
                    val_mean = float(np.mean(vals))
                    log_fn(f"epoch {epoch}: val_focal={val_mean:.5f}")
                    # best-val checkpoint, the reference's
                    # model_best_contrastive.pth (main.py:106-128)
                    if val_mean < best_val:
                        best_val = val_mean
                        ckpt.save(os.path.join(config.save_dir, "model_best"),
                                  snap, config, snapshotted=True)
                        _save_best_val(config.save_dir, best_val, epoch)
                if config.save_all:
                    ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                              snap, config, snapshotted=True)
    return state, history


def _best_val_path(save_dir):
    import os

    return os.path.join(save_dir, "best_val.json")


def _load_best_val(save_dir):
    import json
    import os

    p = _best_val_path(save_dir)
    if os.path.exists(p):
        with open(p) as f:
            return float(json.load(f)["val"])
    return float("inf")


def _save_best_val(save_dir, val, epoch):
    import json
    import os

    # the model_best write that precedes this is write-behind now, so it no
    # longer guarantees save_dir exists yet
    os.makedirs(save_dir, exist_ok=True)
    with open(_best_val_path(save_dir), "w") as f:
        json.dump({"val": float(val), "epoch": int(epoch)}, f)


def _debug_val_volume(config, model, state, item, epoch, idx):
    """Validation debug PNGs + detection txt (tomo_cr_semi_trainer.py:123-187)."""
    import os

    from cet_pick_tpu.ops.decode import tomo_decode
    from cet_pick_tpu.ops.nms import sigmoid_clamped
    from cet_pick_tpu.utils.debugger import Debugger, debug_validation_volume

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        item["input"], train=False, active_heads=("hm",),
    )
    hm = sigmoid_clamped(out["hm"][0, ..., 0])
    dets = np.asarray(tomo_decode(hm, kernel=config.nms, k=config.K))
    dbg = Debugger(os.path.join(config.debug_dir, f"epoch{epoch}_{item['name']}"))
    debug_validation_volume(
        dbg, item["input"][0], np.asarray(hm), item["hm"][0], dets=dets
    )
    dbg.save_detection_txt(item["name"], dets, down_ratio=config.down_ratio)
