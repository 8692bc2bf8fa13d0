"""Few-shot (fs) components: vMF loss, partial supcon, constrained kmeans."""

import numpy as np
import pytest

import jax.numpy as jnp

from cet_pick_tpu.train.fewshot import (
    constrained_kmeans,
    kmeans_vmf_loss,
    partial_sup_loss,
)


def test_vmf_loss_prefers_correct_prototype():
    protos = jnp.asarray(np.eye(3, 8, dtype=np.float32))
    emb = jnp.asarray(np.eye(3, 8, dtype=np.float32))  # each matches proto i
    good = float(kmeans_vmf_loss(emb, jnp.array([0, 1, 2]), protos))
    bad = float(kmeans_vmf_loss(emb, jnp.array([1, 2, 0]), protos))
    assert good < bad


def test_partial_sup_loss_groups(rng):
    # two labeled groups, well separated -> low loss; shuffled labels -> high
    a = rng.standard_normal((6, 8)).astype(np.float32) * 0.01
    a[:3] += np.array([5] + [0] * 7, np.float32)
    a[3:] += np.array([0, 5] + [0] * 6, np.float32)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    labels_good = jnp.array([1, 1, 1, 2, 2, 2])
    labels_bad = jnp.array([1, 2, 1, 2, 1, 2])
    lg = float(partial_sup_loss(jnp.asarray(a), labels_good))
    lb = float(partial_sup_loss(jnp.asarray(a), labels_bad))
    assert lg < lb


def test_partial_sup_loss_ignores_unlabeled(rng):
    a = rng.standard_normal((6, 8)).astype(np.float32)
    labels = jnp.array([1, 1, 0, 0, 0, 0])  # only two labeled rows
    loss = float(partial_sup_loss(jnp.asarray(a), labels))
    assert np.isfinite(loss)


def test_constrained_kmeans_respects_seeds(rng):
    # three gaussian blobs on the sphere; seed two of them
    base = np.array([[10, 0, 0], [0, 10, 0], [0, 0, 10]], np.float32)
    pts = np.concatenate([
        base[i] + rng.standard_normal((20, 3)).astype(np.float32)
        for i in range(3)
    ])
    seeds = np.zeros(60, np.int64)
    seeds[:3] = 1    # first blob seeded to cluster 1
    seeds[20:23] = 2  # second blob seeded to cluster 2
    cents, assign = constrained_kmeans(jnp.asarray(pts), jnp.asarray(seeds),
                                       n_clusters=3, max_iter=30)
    assign = np.asarray(assign)
    # seeded points keep their labels
    assert (assign[:3] == 1).all() and (assign[20:23] == 2).all()
    # blob members follow their seeds
    assert (assign[:20] == 1).mean() > 0.9
    assert (assign[20:40] == 2).mean() > 0.9
    # third blob lands in one (other) cluster
    vals, counts = np.unique(assign[40:], return_counts=True)
    assert counts.max() / counts.sum() > 0.9
