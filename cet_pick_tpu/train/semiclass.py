"""Semiclass training: fill/unfill voxel crops through the refinement step.

Rebuild of the reference's semiclass trainer (reference:
cet_pick/trains/tomo_cr_semi_class_trainer.py:18-121): the objective is the
same composition as the semi task —

    loss = hm_loss + cr_weight * contrastive + consistency
    hm_loss = focal (--pn) | PU-GE (--ge, the reference's production choice:
              PUGELoss(tau, criteria=FocalLoss_mod(thresh)),
              tomo_cr_semi_class_trainer.py:28-36)

— applied to voxel-centric crops whose targets come from the *discrete*
fill/unfill label volumes (data/classify_dataset.py). The jitted step itself
is shared with the semi task (train/refine.make_train_step): the semiclass
batch is shaped (B, 1, D, H, W) and flows through the identical two-view
forward + per-sample vmapped contrastive + consistency pipeline. What makes
the task semiclass is the data (discrete 1/0.1/-1 labels, stratified voxel
sampling) and the inference decode (greedy spherical NMS,
infer/classify.py), not a different step function.
"""

from __future__ import annotations

import itertools

import os

import jax
import numpy as np


def check_semiclass_config(config):
    """Fail fast on an invalid loss selection — called by cmd_train BEFORE
    the (minutes-long on remote TPUs) device setup, and again here."""
    if not (config.pn or config.ge):
        raise ValueError(
            "semiclass requires --pn (focal) or --ge (PU-GE); the plain PU "
            "risk estimator is not defined for this task "
            "(tomo_cr_semi_class_trainer.py:25-36)"
        )


def train_semiclass(config, dataset, val_dataset=None, num_epochs=None,
                    log_fn=print, prepared=None):
    """Epoch loop for the semiclass task (main.py:99-128 with
    task=semiclass; trainer wiring train_factory.py:22).

    ``prepared``: the result of ``prepare_refine(config, pairs=1,
    label=True)`` (the step is shared with the semi task), when the caller
    overlapped device setup with the dataset build (cmd_train)."""
    from cet_pick_tpu.train.refine import (
        lr_at_epoch, make_val_step, prepare_refine,
    )
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, set_learning_rate,
    )

    check_semiclass_config(config)
    if prepared is None:
        prepared = prepare_refine(config, log_fn=log_fn, pairs=1, label=True,
                                  warm=False)
    model = prepared["model"]
    state = prepared["state"]
    train_step = prepared["train_step"]
    place_batch = prepared["place_batch"]
    rng = np.random.default_rng(config.seed)
    val_step = make_val_step(model) if val_dataset is not None else None

    num_epochs = num_epochs or config.num_epochs
    history = []
    with AsyncCheckpointer() as ckpt:
        for epoch in range(state.epoch + 1, num_epochs + 1):
            state = set_learning_rate(state, lr_at_epoch(config, epoch))
            epoch_metrics = []
            # per-epoch iteration cap (base_trainer.py:263-268); islice avoids
            # building the first discarded batch
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            for batch in itertools.islice(
                    dataset.epoch_batches(rng, config.batch_size), cap):
                state, metrics = train_step(state, place_batch(batch))
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
            means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                     for k in epoch_metrics[0]}
            history.append(means)
            log_fn(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5f}" for k, v in means.items()))
            if config.save_dir:
                ckpt.save(os.path.join(config.save_dir, "model_last"),
                          checkpoint_payload(state), config)
            if (val_step is not None and config.val_intervals > 0
                    and epoch % config.val_intervals == 0):
                vals = []
                for i in range(len(val_dataset.names)):
                    item = val_dataset.val_item(i)
                    # validation scores with plain focal on the 0/1 label volume
                    gt = np.where(item["hm"] < 0, 0.0, item["hm"])
                    vals.append(float(val_step(state, item["input"], gt)))
                log_fn(f"epoch {epoch}: val_focal={np.mean(vals):.5f}")
                if config.save_all:
                    ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                              checkpoint_payload(state), config)
    return state, history
