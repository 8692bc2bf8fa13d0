"""SCAN semantic clustering: neighbor mining -> SCAN loss -> self-labeling.

Rebuild of the reference's SCAN pathway (tasks ``scan``/``scan2d3d``):

* neighbor mining with exact kNN over pretext (SimSiam) embeddings —
  reference utils/memory_bank.py:44-85 (FAISS) replaced by the on-device
  matmul kNN (ops/kmeans.py);
* ``scan_loss`` — loss.py:87-119: BCE pull between anchor/neighbor softmax
  similarity and 1, minus an entropy bonus on the mean cluster distribution
  (weight 2.0) that prevents cluster collapse;
* ``confidence_ce_loss`` — loss.py:15-66: self-labeling cross-entropy of
  strongly-augmented views against confident (p > threshold) weak-view
  pseudo-labels, with optional inverse-frequency class balancing;
* ``ClusteringHead`` on the shared trunk — simsiam_model_2d3d.py:847-877;
* SCAN evaluation helpers — trains/eval_utils.py:9-74.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, linen as nn, struct


def entropy_of_mean(probs, eps=1e-8):
    """Entropy of the batch-mean cluster distribution (loss.py anchors)."""
    mean = jnp.mean(probs, axis=0)
    return -jnp.sum(mean * jnp.log(mean + eps))


def scan_loss(anchor_logits, neighbor_logits, entropy_weight=2.0, eps=1e-8):
    """(total, consistency, entropy) — loss.py:94-119."""
    pa = jax.nn.softmax(anchor_logits, axis=1)
    pn = jax.nn.softmax(neighbor_logits, axis=1)
    sim = jnp.sum(pa * pn, axis=1)
    consistency = -jnp.mean(jnp.log(jnp.clip(sim, eps, 1.0)))  # BCE vs ones
    ent = entropy_of_mean(pa, eps)
    return consistency - entropy_weight * ent, consistency, ent


def confidence_ce_loss(weak_logits, strong_logits, threshold=0.99,
                       class_balance=True, eps=1e-8):
    """Masked self-labeling CE (loss.py:15-66). Returns (loss, n_confident)."""
    probs = jax.nn.softmax(weak_logits, axis=1)
    max_prob = jnp.max(probs, axis=1)
    target = jnp.argmax(probs, axis=1)
    mask = (max_prob > threshold).astype(jnp.float32)
    n = jnp.sum(mask)
    c = weak_logits.shape[1]
    if class_balance:
        one_hot = jax.nn.one_hot(target, c) * mask[:, None]
        counts = one_hot.sum(axis=0)
        freq = jnp.where(counts > 0, n / jnp.maximum(counts, 1.0), 1.0)
        w = freq[target]
    else:
        w = jnp.ones_like(max_prob)
    logp = jax.nn.log_softmax(strong_logits, axis=1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    loss = jnp.sum(ce * w * mask) / jnp.maximum(jnp.sum(w * mask), 1.0)
    return loss, n


class ClusteringHead(nn.Module):
    """Linear cluster head(s) on the frozen/shared trunk feature
    (simsiam_model_2d3d.py:847-877)."""

    n_clusters: int
    n_heads: int = 1

    @nn.compact
    def __call__(self, feat):
        return [nn.Dense(self.n_clusters, name=f"head{i}")(feat)
                for i in range(self.n_heads)]


def mine_neighbors(embeddings, k=20):
    """Top-k neighbor indices (self excluded) — memory_bank.py:44-85."""
    from cet_pick_tpu.ops.kmeans import knn_search

    emb = jnp.asarray(np.asarray(embeddings, np.float32))
    _, idx = knn_search(emb, emb, k=k + 1)
    return np.asarray(idx)[:, 1:]


class ScanState(struct.PyTreeNode):
    step: int
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def train_scan_head(features, neighbors, n_clusters, num_steps=200,
                    batch_size=128, lr=1e-3, entropy_weight=2.0, seed=0,
                    log_fn=print):
    """Train a clustering head over fixed pretext features with the SCAN
    objective (trains/tomo_scan_trainer.py:17-100, with the trunk frozen —
    the reference's 'scan' stage also primarily updates the cluster head).

    features: (N, D) float32; neighbors: (N, k) indices. Returns
    (state, head, cluster_assignments).
    """
    features = np.asarray(features, np.float32)
    n = len(features)
    head = ClusteringHead(n_clusters=n_clusters)
    params = head.init(jax.random.PRNGKey(seed), jnp.zeros((1, features.shape[1])))["params"]
    tx = optax.adam(lr)
    state = ScanState(step=0, params=params, opt_state=tx.init(params), tx=tx)

    @jax.jit
    def step(state, anchor_feat, neighbor_feat):
        def loss_fn(params):
            a_logits = head.apply({"params": params}, anchor_feat)[0]
            n_logits = head.apply({"params": params}, neighbor_feat)[0]
            total, cons, ent = scan_loss(a_logits, n_logits, entropy_weight)
            return total, {"loss": total, "consistency": cons, "entropy": ent}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
        ), metrics

    rng = np.random.default_rng(seed)
    k = neighbors.shape[1]
    for it in range(num_steps):
        idx = rng.integers(0, n, size=min(batch_size, n))
        nb = neighbors[idx, rng.integers(0, k, size=len(idx))]
        state, metrics = step(state, jnp.asarray(features[idx]),
                              jnp.asarray(features[nb]))
        if (it + 1) % 50 == 0:
            log_fn(f"scan step {it + 1}: " + " ".join(
                f"{kk}={float(v):.4f}" for kk, v in metrics.items()))

    logits = head.apply({"params": state.params}, jnp.asarray(features))[0]
    return state, head, np.asarray(jnp.argmax(logits, axis=1))


def scan_evaluate(assignments, neighbors):
    """Fraction of mined neighbors sharing the anchor's cluster
    (eval_utils.py:40-74's consistency measure)."""
    a = np.asarray(assignments)
    same = a[neighbors] == a[:, None]
    return float(same.mean())
