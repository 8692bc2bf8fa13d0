"""Few-shot (task ``fs``) losses + constrained k-means.

Rebuild of the reference's experimental few-shot pathway
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

All on-device: assignments are matmuls, updates are one-hot segment sums,
the loop is a ``lax.fori_loop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def kmeans_vmf_loss(embeddings, labels, prototypes, temp=0.07):
    """-mean log p(label | embedding) under a cosine-softmax over prototypes
    (loss.py:871-905). embeddings (N, C), labels (N,) int, prototypes (K, C)."""
    u = _normalize(embeddings)
    v = _normalize(prototypes)
    sim = (u @ v.T) / temp
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
    sims = (embeddings @ embeddings.T) / temp
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


@partial(jax.jit, static_argnames=("n_clusters", "max_iter"))
def constrained_kmeans(embeddings, seed_labels, n_clusters=4, max_iter=30):
    """Must-link constrained k-means (models/kmeans.py MPKMeans semantics).

    seed_labels: (N,) int — 0 = unlabeled (free assignment), c >= 1 = must
    stay in cluster c. Cluster 0 collects background/unlabeled structure.
    Returns (prototypes (K, C), assignments (N,)).
    """
    n, c = embeddings.shape
    x = _normalize(embeddings)
    seeded = seed_labels > 0

    # init: labeled class means; unlabeled clusters from data spread
    one_hot = jax.nn.one_hot(seed_labels, n_clusters, dtype=x.dtype)
    counts = one_hot.sum(axis=0)
    cents = jnp.where(
        counts[:, None] > 0,
        (one_hot.T @ x) / jnp.maximum(counts[:, None], 1.0),
        x[jnp.arange(n_clusters) % n],
    )

    def body(_, cents):
        sim = x @ _normalize(cents).T  # cosine affinity
        free = jnp.argmax(sim, axis=1)
        assign = jnp.where(seeded, seed_labels, free)
        oh = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
        cnt = oh.sum(axis=0)
        new = jnp.where(cnt[:, None] > 0,
                        (oh.T @ x) / jnp.maximum(cnt[:, None], 1.0), cents)
        return new

    cents = jax.lax.fori_loop(0, max_iter, body, cents)
    sim = x @ _normalize(cents).T
    assign = jnp.where(seeded, seed_labels, jnp.argmax(sim, axis=1))
    return cents, assign
