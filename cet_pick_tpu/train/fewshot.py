"""Few-shot (task ``fs``) training: constrained k-means over pixel embeddings.

Rebuild of the reference's few-shot pathway
(trains/tomo_fewshot_cr_trainer.py:20-168 via models/loss.py:871-935 and
models/kmeans.py:32+):

* ``kmeans_vmf_loss``   — soft von-Mises-Fisher assignment: cosine-softmax of
  pixel embeddings against cluster prototypes, cross-entropy against the
  (constrained-kmeans) labels (loss.py:871-905)
* ``partial_sup_loss``  — supervised contrastive loss over the labeled
  embeddings only (loss.py:907-935)
* ``constrained_kmeans``— must-link/cannot-link Lloyd iterations: labeled
  points stay in their class's cluster; unlabeled points assign freely
  (models/kmeans.py MPKMeans, simplified: hard constraints instead of
  penalty weights — the trainer uses them as hard seeds anyway)
* ``make_fewshot_train_step`` / ``train_fewshot`` — the TomoKMTrainer loop
  (tomo_fewshot_cr_trainer.py:38-134 + base_trainer.py:277-341): every step
  clusters the projection pixels with warm-started constrained k-means,
  then optimizes vmf + cr_weight * partial-supcon; the prototypes are
  threaded through the epoch exactly like the reference's
  ``cluster_centers`` carry
* ``fewshot_similarity``— inference: cosine similarity of every pixel to the
  target-class prototype (utils/post_process.tomo_cluster_postprocess +
  trainer save_results:285-293), decodable with ops/decode.tomo_decode

All on-device: assignments are matmuls, updates are one-hot segment sums,
the loop is a ``lax.fori_loop``. The supervised term gathers a static-size
set of labeled pixels (``lax.top_k`` over the label indicator) so the gram
stays (SUP_MAX, SUP_MAX) regardless of crop size — no dynamic shapes.
"""

from __future__ import annotations

import itertools

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# Similarity/prototype matmuls are pinned to true-f32 MXU passes: the
# TPU default runs f32 matmuls at bf16 precision, which measurably
# degrades the 16-dim cosine geometry this task lives on (device gate
# benchmarks/quality_tpu.py: prototype margin 0.057 default vs 0.208
# pinned, CPU 0.343). The trunk convs stay at the default — these
# gram-sized matmuls are microseconds.
_HIGH = jax.lax.Precision.HIGHEST


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def kmeans_vmf_loss(embeddings, labels, prototypes, temp=0.07):
    """-mean log p(label | embedding) under a cosine-softmax over prototypes
    (loss.py:871-905). embeddings (N, C), labels (N,) int, prototypes (K, C)."""
    u = _normalize(embeddings)
    v = _normalize(prototypes)
    sim = jnp.matmul(u, v.T, precision=_HIGH) / temp
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    e = jnp.exp(sim)
    k = prototypes.shape[0]
    one_hot = jax.nn.one_hot(labels, k, dtype=e.dtype)
    num = jnp.sum(e * one_hot, axis=1)
    den = jnp.sum(e, axis=1)
    prob = num / jnp.maximum(den, 1e-12)
    return -jnp.mean(jnp.log(jnp.maximum(prob, 1e-12)))


def partial_sup_loss(embeddings, gt_labels, temp=0.07):
    """Supervised contrastive loss over labeled rows (loss.py:907-935).

    gt_labels > 0 marks labeled rows; rows sharing a label attract. Uses a
    weight mask instead of boolean gathering so shapes stay static.
    """
    lbl = gt_labels.reshape(-1)
    valid = (lbl > 0).astype(embeddings.dtype)
    sims = jnp.matmul(embeddings, embeddings.T,
                      precision=_HIGH) / temp
    n = sims.shape[0]
    eye = jnp.eye(n, dtype=embeddings.dtype)
    offdiag = (1 - eye) * valid[:, None] * valid[None, :]
    same = (lbl[:, None] == lbl[None, :]).astype(embeddings.dtype) * offdiag

    sims = sims - jax.lax.stop_gradient(jnp.max(sims, axis=1, keepdims=True))
    denom = jnp.sum(jnp.exp(sims) * offdiag, axis=1)
    log_prob = sims - jnp.log(jnp.maximum(denom, 1e-12))[:, None]
    pos_count = jnp.maximum(same.sum(axis=1), 1.0)
    mean_log_prob = (same * log_prob).sum(axis=1) / pos_count
    row_has_pos = (same.sum(axis=1) > 0).astype(embeddings.dtype)
    return -jnp.sum(mean_log_prob * row_has_pos) / jnp.maximum(
        row_has_pos.sum(), 1.0
    )


def _lloyd_constrained(x, seed_labels, cents, n_clusters, max_iter):
    """Shared Lloyd body: labeled points pinned to their class's cluster."""
    seeded = seed_labels > 0

    def body(_, cents):
        sim = jnp.matmul(x, _normalize(cents).T,
                         precision=_HIGH)  # cosine affinity
        free = jnp.argmax(sim, axis=1)
        assign = jnp.where(seeded, seed_labels, free)
        oh = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
        cnt = oh.sum(axis=0)
        new = jnp.where(cnt[:, None] > 0,
                        (oh.T @ x) / jnp.maximum(cnt[:, None], 1.0), cents)
        return new

    cents = jax.lax.fori_loop(0, max_iter, body, cents)
    sim = jnp.matmul(x, _normalize(cents).T, precision=_HIGH)
    assign = jnp.where(seeded, seed_labels, jnp.argmax(sim, axis=1))
    return cents, assign


@partial(jax.jit, static_argnames=("n_clusters", "max_iter"))
def constrained_kmeans(embeddings, seed_labels, n_clusters=4, max_iter=30):
    """Must-link constrained k-means (models/kmeans.py MPKMeans semantics,
    mpkmeans_with_initial_labels).

    seed_labels: (N,) int — 0 = unlabeled (free assignment), c >= 1 = must
    stay in cluster c. Cluster 0 collects background/unlabeled structure.
    Returns (prototypes (K, C), assignments (N,)).
    """
    n, c = embeddings.shape
    x = _normalize(embeddings)

    # init: labeled class means; unlabeled clusters from data spread
    one_hot = jax.nn.one_hot(seed_labels, n_clusters, dtype=x.dtype)
    counts = one_hot.sum(axis=0)
    cents = jnp.where(
        counts[:, None] > 0,
        (one_hot.T @ x) / jnp.maximum(counts[:, None], 1.0),
        x[jnp.arange(n_clusters) % n],
    )
    return _lloyd_constrained(x, seed_labels, cents, n_clusters, max_iter)


@partial(jax.jit, static_argnames=("max_iter",))
def constrained_kmeans_warm(embeddings, seed_labels, init_centers,
                            max_iter=30):
    """Warm-started constrained k-means (MPKMeans.mpkmeans_with_old_centers,
    reference tomo_fewshot_cr_trainer.py:104-107): resume Lloyd iterations
    from the previous step's prototypes instead of re-initializing, so the
    cluster identities stay stable across training steps."""
    x = _normalize(embeddings)
    n_clusters = init_centers.shape[0]
    return _lloyd_constrained(x, seed_labels, init_centers, n_clusters,
                              max_iter)


# ---------------------------------------------------------------------------
# training loop (TomoKMTrainer)
# ---------------------------------------------------------------------------

SUP_MAX = 256  # static cap of labeled pixels in the supervised term


def make_fewshot_train_step(model, config):
    """Jitted fs step: warm k-means -> vmf + cr_weight * partial supcon
    (tomo_fewshot_cr_trainer.py:38-134)."""
    temp, cr_weight = config.temp, config.cr_weight

    def loss_fn(params, batch_stats, batch, centers):
        x = batch["input"]
        if batch_stats:
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            new_bs = dict(updates).get("batch_stats", batch_stats)
        else:
            out = model.apply({"params": params}, x, train=True)
            new_bs = batch_stats
        proj = out["proj"]                      # (B, D, H', W', C)
        c = proj.shape[-1]
        feats = _normalize(proj.reshape(-1, c))
        seeds = batch["lb_map"].reshape(-1).astype(jnp.int32)

        cents, assign = constrained_kmeans_warm(
            jax.lax.stop_gradient(feats), seeds, centers
        )
        cents = jax.lax.stop_gradient(cents)
        vmf = kmeans_vmf_loss(feats, assign, cents, temp=temp)

        # supervised contrastive over (up to SUP_MAX) labeled pixels; ties
        # in the indicator put labeled rows first, unlabeled fill rows get
        # label 0 and are masked inside partial_sup_loss
        k = min(SUP_MAX, feats.shape[0])
        _, top = jax.lax.top_k((seeds > 0).astype(jnp.float32), k)
        sup = partial_sup_loss(feats[top], seeds[top], temp=temp)

        loss = vmf + cr_weight * sup
        metrics = {"loss": loss, "vmf_loss": vmf, "sup_loss": sup}
        return loss, (new_bs, cents, metrics)

    @jax.jit
    def step(state, batch, centers):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, cents, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, centers
        )
        return state.apply_gradients(grads, batch_stats=new_bs), cents, metrics

    return step


def init_fewshot_centers(model, state, batch, n_clusters):
    """Cold-start prototypes from the first batch
    (mpkmeans_with_initial_labels, tomo_fewshot_cr_trainer.py:101-103)."""
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["input"], train=False,
    )
    c = out["proj"].shape[-1]
    feats = _normalize(out["proj"].reshape(-1, c))
    seeds = jnp.asarray(batch["lb_map"].reshape(-1), jnp.int32)
    cents, _ = constrained_kmeans(feats, seeds, n_clusters=n_clusters)
    return cents


def train_fewshot(config, dataset, num_epochs=None, log_fn=print):
    """Epoch loop for the fs task (main.py with task=fs ->
    train_factory TomoKMTrainer; base_trainer.py:277-341)."""
    import os

    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, checkpoint_payload, create_train_state,
        load_checkpoint,
    )

    n_clusters = max(int(config.nclusters), 3)  # bg=0, target=1, other=2
    model = create_detector(config)
    rng = np.random.default_rng(config.seed)
    batch0 = dataset.sample_batch(rng, range(min(config.batch_size, len(dataset))))
    state = create_train_state(
        model, config, jax.random.PRNGKey(config.seed), batch0["input"]
    )
    # --load_model BEFORE the prototype init: the reference warm-starts fs
    # from a trained detector for every task (main.py:60-66), and the cold
    # centers must come from the loaded encoder's embeddings
    if config.load_model:
        state = load_checkpoint(config.load_model, state, resume=config.resume)
        log_fn(f"loaded checkpoint from {config.load_model} "
               f"(epoch {state.epoch})")
    centers = init_fewshot_centers(model, state, batch0, n_clusters)

    step = make_fewshot_train_step(model, config)
    num_epochs = num_epochs or config.num_epochs
    history = []
    # resume continues from the restored epoch (model.py:234-247 semantics,
    # matching every other loop) instead of retraining the full schedule
    with AsyncCheckpointer() as ckpt:
        for epoch in range(state.epoch + 1, num_epochs + 1):
            epoch_metrics = []
            # per-epoch iteration cap (base_trainer.py:263-268); islice avoids
            # building the first discarded batch
            cap = config.num_iters if config.num_iters >= 0 else None
            # lagged single-transfer metric fetch (train/metrics.py)
            from cet_pick_tpu.train.metrics import LaggedMetrics

            drain = LaggedMetrics()
            for batch in itertools.islice(
                    dataset.epoch_batches(rng, config.batch_size), cap):
                state, centers, metrics = step(state, jax.device_put(batch), centers)
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
                # the write-behind save no longer creates save_dir before
                # this synchronous companion write runs
                os.makedirs(config.save_dir, exist_ok=True)
                np.save(os.path.join(config.save_dir, "cluster_centers.npy"),
                        np.asarray(centers))
                if config.save_all and (config.val_intervals <= 0
                                        or epoch % config.val_intervals == 0):
                    ckpt.save(os.path.join(config.save_dir, f"model_{epoch}"),
                              checkpoint_payload(state), config)
    return state, np.asarray(centers), history


def fewshot_similarity(model, state, centers, volume, target_cluster=1):
    """Per-voxel cosine similarity to the target-class prototype
    (trainer save_results, tomo_fewshot_cr_trainer.py:285-293). Returns a
    (D, H', W') score volume decodable with ops/decode.tomo_decode."""
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(volume)[None], train=False,
    )
    proj = _normalize(out["proj"][0])           # (D, H', W', C)
    proto = _normalize(jnp.asarray(centers)[target_cluster])
    return jnp.einsum("dhwc,c->dhw", proj, proto,
                      precision=_HIGH)
