"""Voxel classifier training (task ``tcla``).

Rebuild of the reference's experimental classifier pathway (main_class.py +
trains/tomo_classifier_trainer.py:17-46): a model with a single ``class``
head trained with BCE against 0/1 voxel labels. The reference balances
positives/negatives with the stratified samplers (utils/sampler.py, also
provided here in data/sampler.py); this loop uses the annotation-centered
crop sampler in pn mode (labels 0/1), which yields the same positive-rich
batches without per-voxel bookkeeping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cet_pick_tpu.ops.nms import sigmoid_clamped
from cet_pick_tpu.train.state import TrainState


def bce_loss(pred, gt):
    """Binary cross-entropy over labeled voxels (gt >= 0); unlabeled (-1)
    ignored. pred: probabilities in (0, 1)."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    labeled = (gt >= 0).astype(pred.dtype)
    target = jnp.clip(gt, 0.0, 1.0)
    ll = target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred)
    return -_safe_mean(ll * labeled, labeled.sum())


def _safe_mean(x, n):
    return x.sum() / jnp.maximum(n, 1.0)


def make_classify_train_step(model, config):
    """Jitted BCE step over paired crops (tomo_classifier_trainer.py:25-38)."""

    def loss_fn(params, batch_stats, batch):
        x = batch["input"]
        b, p, d, h, w = x.shape
        if batch_stats:
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x.reshape(b * p, d, h, w), train=True,
                mutable=["batch_stats"],
            )
            new_bs = dict(updates).get("batch_stats", batch_stats)
        else:
            out = model.apply({"params": params}, x.reshape(b * p, d, h, w),
                              train=True)
            new_bs = batch_stats
        prob = sigmoid_clamped(out["class"][..., 0]).reshape(
            b, p, d, h // 2, w // 2
        )
        loss = bce_loss(prob, batch["hm"])
        acc = _safe_mean(
            ((prob > 0.5) == (batch["hm"] > 0.5)).astype(jnp.float32)
            * (batch["hm"] >= 0), (batch["hm"] >= 0).sum()
        )
        return loss, (new_bs, {"loss": loss, "acc": acc})

    @jax.jit
    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        return state.apply_gradients(grads, batch_stats=new_bs), metrics

    return step


def train_classify(config, dataset, num_epochs=None, log_fn=print):
    """Epoch loop for the tcla task (main_class.py:58-120)."""
    import os

    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, create_train_state,
        load_checkpoint,
    )

    model = create_detector(config)
    rng = np.random.default_rng(config.seed)
    sample = dataset.sample_batch(rng, [0])
    b, p, d, h, w = sample["input"].shape
    state = create_train_state(
        model, config, jax.random.PRNGKey(config.seed),
        sample["input"].reshape(b * p, d, h, w),
    )
    # --load_model was a silent no-op for tcla; the reference applies it
    # for every task (main.py:60-66)
    if config.load_model:
        state = load_checkpoint(config.load_model, state, resume=config.resume)
        log_fn(f"loaded checkpoint from {config.load_model} "
               f"(epoch {state.epoch})")
    from cet_pick_tpu.parallel.mesh import auto_dp_step

    # DP over the mesh like every other loop (BCE is per-voxel, so shards
    # stay independent; GSPMD reduces the mean like the refine step)
    step, place_state, place_batch, _ = auto_dp_step(
        config, make_classify_train_step(model, config), log_fn=log_fn
    )
    state = place_state(state)
    num_epochs = num_epochs or config.num_epochs
    history = []
    # resume continues from the restored epoch (model.py:234-247 semantics,
    # matching every other loop) instead of retraining the full schedule
    with AsyncCheckpointer() as ckpt:
        for epoch in range(state.epoch + 1, num_epochs + 1):
            metrics_epoch = []
            # NO base_trainer-style num_iters cap here: for tcla the flag is
            # consumed by SemiClassDataset as the per-tomogram stratified draw
            # count (classify_dataset.py) — the dataset's epoch length IS the
            # intended iteration budget, and capping again would silently
            # discard half the draws whenever n_tomos > batch_size (the
            # reference's main_class sampler length is likewise its own knob)
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            for batch in dataset.epoch_batches(rng, config.batch_size):
                state, metrics = step(state, place_batch(batch))
                m = drain.push(metrics)
                if m is not None:
                    metrics_epoch.append(m)
            m = drain.pop()
            if m is not None:
                metrics_epoch.append(m)
            if not metrics_epoch:
                raise ValueError(
                    f"no training batches: {len(dataset)} samples < batch_size "
                    f"{config.batch_size}"
                    + (" (--num_iters 0 caps every epoch at zero batches)"
                       if config.num_iters == 0 else "")
                )
            state = state.replace(epoch=epoch)
            means = {k: float(np.mean([m[k] for m in metrics_epoch]))
                     for k in metrics_epoch[0]}
            history.append(means)
            log_fn(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5f}" for k, v in means.items()))
            if config.save_dir:
                ckpt.save(os.path.join(config.save_dir, "model_last"),
                          checkpoint_payload(state), config)
                if config.save_all and (config.val_intervals <= 0
                                        or epoch % config.val_intervals == 0):
                    ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                              checkpoint_payload(state), config)
    return state, history
