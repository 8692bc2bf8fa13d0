"""Dedicated supervised loops for the ``tomo`` and ``cr`` tasks.

Rebuild of the reference's two supervised baselines that predate the
semi-supervised flagship:

* ``cr``   — TomoCRTrainer (reference cet_pick/trains/tomo_cr_trainer.py:17-76):
             focal heatmap loss + ``cr_weight`` * single-view pixel supcon
             (SupConLossV2, loss.py:821-868) — no augmented second view, no
             PU debiasing.
* ``tomo`` — TomoTrainer (reference cet_pick/trains/tomo_trainer.py:17-107):
             focal heatmap loss + supervised contrastive pull between
             gathered positive-site features and sampled negative-site
             features (SupConLoss at temp 0.2 over gt_det / hard_neg
             gathers). The reference gathers through its superseded
             soft/hard-negative dataset fields; here positives are the
             gt==1 heatmap pixels and negatives are sampled labeled-negative
             pixels — static-size ``lax.top_k`` gathers, so the gram is
             (2*GATHER_K)^2 regardless of volume size.

Both reuse the RefineDataset crop sampler in pn mode (positive/negative
labels, no -1 unlabeled fill): batched crops rather than the reference's
batch-1 whole volumes, which is what makes the losses shard over a mesh.
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from cet_pick_tpu.ops.nms import sigmoid_clamped
from cet_pick_tpu.train import losses as L
from cet_pick_tpu.train.fewshot import partial_sup_loss

GATHER_K = 128  # static positive/negative gather size for the tomo task


def supcon_v2_loss(feats, hm, temp=0.07, thresh=0.5, backend="auto"):
    """Single-view pixel supcon (SupConLossV2, loss.py:821-868).

    feats: (N, C) pixel projections (raw, un-normalized — the reference
    takes plain dot products); hm: (N,) targets. Positive pixels
    (hm > thresh) attract each other, negative pixels (hm < thresh) attract
    each other; each row is softmax-normalized over all other pixels.

    backend="xla" materializes the (N, N) gram — size crops accordingly (a
    6x32x32 crop is 6144 pixels -> 151 MB in f32; fine per-TPU-core,
    vmapped per sample so nothing crosses devices under data parallelism).
    On TPU ("auto"/"pallas") the gram stays in VMEM stripes via
    ops/pallas_gram.gram_supcon_v2_stats — raw features mean the row max is
    real, computed per stripe in-kernel; assembly below is algebraically
    identical:
      (log_prob * mask).sum(1) = masked_sims_row_sum - (rowmax + log_tot)
                                 * mask.sum()
    Same vmap caveat as the other gram kernels — lax.map, not vmap."""
    pos = (hm > thresh).astype(feats.dtype)
    neg = (hm < thresh).astype(feats.dtype)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum(neg.sum(), 1.0)
    if L.pallas_gram_backend(backend, *feats.shape):
        from cet_pick_tpu.ops.pallas_gram import gram_supcon_v2_stats

        mx, psims, nsims, tot = gram_supcon_v2_stats(
            feats, pos, neg, temp, L._PALLAS_GRAM_RB, False
        )
        base = mx + jnp.log(jnp.maximum(tot, 1e-12))     # (N,)
        mean_pos_rows = (psims - base * pos.sum()) / n_pos
        mean_neg_rows = (nsims - base * neg.sum()) / n_neg
    else:
        n = feats.shape[0]
        mask = 1 - jnp.eye(n, dtype=feats.dtype)
        sims = (feats @ feats.T) * mask / temp
        shifted = sims - jax.lax.stop_gradient(
            sims.max(axis=1, keepdims=True))
        log_prob = shifted - jnp.log(
            jnp.maximum(jnp.exp(shifted).sum(axis=1, keepdims=True), 1e-12)
        )
        mean_pos_rows = (log_prob * pos[None, :]).sum(axis=1) / n_pos
        mean_neg_rows = (log_prob * neg[None, :]).sum(axis=1) / n_neg
    loss_pos = -(mean_pos_rows * pos).sum() / n_pos
    loss_neg = -(mean_neg_rows * neg).sum() / n_neg
    return loss_pos + loss_neg


def tomo_site_supcon(feats, hm, key=None, temp=0.2, thresh=0.5):
    """Gathered-site supcon for the tomo task (tomo_trainer.py:39-90).

    Gathers up to GATHER_K positive pixels (hm > thresh) and GATHER_K
    negative pixels into one labeled set and applies the two-group
    supervised contrastive objective; rows the gather could not fill carry
    label 0 and are masked out inside partial_sup_loss.

    ``key`` randomizes WHICH members of each group are gathered (the
    reference samples sites on the CPU, tomo_trainer.py:47-58). Without it
    top_k's tie-break deterministically returns flat indices 0..K-1 — the
    same corner pixels of z-slice 0 every single step, which is only
    acceptable in tests.
    """
    k = min(GATHER_K, feats.shape[0])
    pos = hm > thresh
    neg = hm <= thresh
    if key is None:
        tie_p = tie_n = jnp.zeros_like(hm)
    else:
        kp, kn = jax.random.split(key)
        tie_p = jax.random.uniform(kp, hm.shape)
        tie_n = jax.random.uniform(kn, hm.shape)
    # score in [1, 2) for group members, 0 otherwise: membership dominates,
    # the random tie-break picks a fresh subset each step
    pv, pi = jax.lax.top_k(jnp.where(pos, 1.0 + tie_p, 0.0), k)
    nv, ni = jax.lax.top_k(jnp.where(neg, 1.0 + tie_n, 0.0), k)
    f = jnp.concatenate([feats[pi], feats[ni]], axis=0)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    labels = jnp.concatenate([
        jnp.where(pv > 0, 1, 0), jnp.where(nv > 0, 2, 0)
    ])
    return partial_sup_loss(f, labels, temp=temp)


def make_supervised_train_step(model, config, task):
    """Jitted single-view step for tomo/cr (tomo_trainer.py / tomo_cr_trainer.py)."""
    temp = config.temp
    thresh = config.thresh
    cr_weight = config.cr_weight
    contrastive = config.contrastive
    # shared gate with train/refine.make_train_step (see its docstring for
    # the lax.map / GSPMD invariant it encodes)
    use_pallas_gram = L.pallas_gram_step_gate(config)

    def loss_fn(params, batch_stats, batch, key):
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
        hm = sigmoid_clamped(out["hm"][..., 0]).reshape(b, p, d, h // 2, w // 2)
        gt = batch["hm"]
        hm_loss = L.focal_loss(hm, gt)
        metrics = {"hm_loss": hm_loss}
        loss = hm_loss

        if contrastive:
            c = out["proj"].shape[-1]
            feats = out["proj"].reshape(b * p, -1, c)
            labels = gt.reshape(b * p, -1)
            if task == "cr" and use_pallas_gram:
                cr = jax.lax.map(
                    lambda a: supcon_v2_loss(
                        *a, temp=temp, thresh=thresh, backend="pallas"
                    ),
                    (feats, labels),
                ).mean()
            elif task == "cr":
                cr = jax.vmap(
                    lambda f, l: supcon_v2_loss(
                        f, l, temp=temp, thresh=thresh, backend="xla"
                    )
                )(feats, labels).mean()
            else:  # tomo
                keys = jax.random.split(key, feats.shape[0])
                cr = jax.vmap(
                    lambda f, l, kk: tomo_site_supcon(
                        f, l, key=kk, temp=0.2, thresh=thresh
                    )
                )(feats, labels, keys).mean()
            metrics["cr_loss"] = cr
            loss = loss + cr * cr_weight

        metrics["loss"] = loss
        return loss, (new_bs, metrics)

    @jax.jit
    def step(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, key
        )
        return state.apply_gradients(grads, batch_stats=new_bs), metrics

    return step


def train_supervised(config, dataset, num_epochs=None, log_fn=print):
    """Epoch loop for the tomo / cr tasks (main.py with those task names)."""
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import lr_at_epoch
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, create_train_state,
        load_checkpoint,
        set_learning_rate,
    )

    if config.task not in ("tomo", "cr"):
        raise ValueError(f"train_supervised handles tomo/cr, got {config.task!r}")
    if not config.pn:
        raise ValueError(
            "tomo/cr are fully supervised: run with --pn so the heatmap "
            "targets carry explicit negatives (tomo_trainer.py uses plain "
            "FocalLoss, no PU debiasing)"
        )
    model = create_detector(config)
    rng = np.random.default_rng(config.seed)
    sample = dataset.sample_batch(rng, [0])
    b, p, d, h, w = sample["input"].shape
    state = create_train_state(
        model, config, jax.random.PRNGKey(config.seed),
        sample["input"].reshape(b * p, d, h, w),
    )
    if config.load_model:
        state = load_checkpoint(config.load_model, state, resume=config.resume)
        log_fn(f"loaded checkpoint from {config.load_model} "
               f"(epoch {state.epoch})")

    from cet_pick_tpu.parallel.mesh import auto_dp_step

    # DP over the mesh like every other loop (the PRNG key rides replicated);
    # both losses are vmapped per sample, so shards stay independent
    step, place_state, place_batch, _ = auto_dp_step(
        config, make_supervised_train_step(model, config, config.task),
        log_fn=log_fn,
    )
    state = place_state(state)
    num_epochs = num_epochs or config.num_epochs
    history = []
    key = jax.random.PRNGKey(config.seed + 1)
    with AsyncCheckpointer() as ckpt:
        for epoch in range(state.epoch + 1, num_epochs + 1):
            state = set_learning_rate(state, lr_at_epoch(config, epoch))
            epoch_metrics = []
            # per-epoch iteration cap (base_trainer.py:263-268); islice so the
            # capped epoch never *builds* the first discarded batch
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            for batch in itertools.islice(
                    dataset.epoch_batches(rng, config.batch_size), cap):
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
            means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                     for k in epoch_metrics[0]}
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
