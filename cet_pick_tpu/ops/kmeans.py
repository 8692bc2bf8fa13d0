"""On-device k-means (jitted Lloyd iterations on the MXU).

TPU-native replacement for the reference's FAISS GPU k-means
(reference: cet_pick/plot_2d.py:70-72 ``faiss.Kmeans(d, 256, niter=300)``
and cet_pick/models/kmeans.py:7-31 ``FaissKMeans``). Assignment distances are
one (N, D) x (D, K) matmul per iteration — exactly the shape the MXU wants —
and centroid updates are segment sums; the whole loop is a single
``lax.scan`` inside one jit, so 300 iterations never leave the device.

Also provides ``knn`` (exact k-nearest-neighbor search by blocked matmul),
replacing the FAISS index in utils/memory_bank.py:44-49 for SCAN neighbor
mining.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(x, key, k=256, iters=300):
    """Lloyd k-means. x: (N, D). Returns (centroids (K, D), assign (N,), inertia).

    Empty clusters keep their previous centroid (FAISS behavior is similar:
    empty clusters are rare at N >> K and get re-seeded; keeping the old
    centroid is the deterministic jit-friendly equivalent).
    """
    n, d = x.shape
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1), constant

    # k-means++ seeding: each next centroid sampled ∝ squared distance to the
    # nearest chosen one — avoids the split/merge local optima of uniform init
    key0, key_pp = jax.random.split(key)
    first = jax.random.randint(key0, (), 0, n)
    cents0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])
    mind2_0 = jnp.sum((x - x[first][None]) ** 2, axis=1)

    def seed_body(i, carry):
        cents, mind2, kk = carry
        kk, sub = jax.random.split(kk)
        idx = jax.random.categorical(sub, jnp.log(jnp.maximum(mind2, 1e-12)))
        c = x[idx]
        cents = cents.at[i].set(c)
        d2 = jnp.sum((x - c[None]) ** 2, axis=1)
        return cents, jnp.minimum(mind2, d2), kk

    init, _, _ = jax.lax.fori_loop(1, k, seed_body, (cents0, mind2_0, key_pp))

    def step(cents, _):
        # d2(n, k) = ||x||^2 - 2 x.c + ||c||^2 ; argmin over k
        logits = x @ cents.T  # (N, K) — MXU
        c_sq = jnp.sum(cents * cents, axis=1)
        d2 = x_sq - 2 * logits + c_sq[None, :]
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (N, K)
        counts = one_hot.sum(axis=0)  # (K,)
        sums = one_hot.T @ x          # (K, D) — MXU
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cents
        )
        return new, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    logits = x @ cents.T
    c_sq = jnp.sum(cents * cents, axis=1)
    d2 = x_sq - 2 * logits + c_sq[None, :]
    assign = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return cents, assign, inertia


def kmeans(x, k=256, iters=300, seed=1234):
    """Host-friendly wrapper: numpy in, numpy out."""
    x = jnp.asarray(np.asarray(x, dtype=np.float32))
    cents, assign, inertia = kmeans_fit(x, jax.random.PRNGKey(seed), k=k, iters=iters)
    return np.asarray(cents), np.asarray(assign), float(inertia)


@partial(jax.jit, static_argnames=("k", "block", "exclude_self"))
def knn_search(queries, base, k=20, block=1024, exclude_self=False):
    """Exact kNN by BLOCKED matmul distance; returns (dists, indices).

    Replaces the FAISS flat index of reference utils/memory_bank.py:44-49.
    ``lax.map`` over query blocks keeps peak memory O(block * N) instead of
    O(Q * N) — the same trick as the contrastive gram (train/losses.py) —
    so reference-scale candidate counts (10^5+) fit on one chip. Each block
    is one (block, D) x (D, N) matmul + top_k.

    exclude_self=True masks base[j] from query j's neighbors BY INDEX
    (requires queries is base; tie-safe — with duplicate embeddings rank-
    based exclusion can keep the anchor among its own neighbors).
    queries (Q, D), base (N, D).
    """
    q, d = queries.shape
    n = base.shape[0]
    block = min(block, q)  # shapes are static under jit
    b_sq = jnp.sum(base * base, axis=1)
    nb = -(-q // block)
    qp = jnp.pad(queries, ((0, nb * block - q), (0, 0)))
    base_idx = jnp.arange(n)

    def one(start):
        chunk = jax.lax.dynamic_slice(qp, (start, 0), (block, d))
        c_sq = jnp.sum(chunk * chunk, axis=1, keepdims=True)
        d2 = c_sq - 2 * (chunk @ base.T) + b_sq[None, :]
        if exclude_self:
            rows = start + jnp.arange(block)
            d2 = jnp.where(rows[:, None] == base_idx[None, :], jnp.inf, d2)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx

    dists, idxs = jax.lax.map(one, jnp.arange(nb) * block)
    return dists.reshape(-1, k)[:q], idxs.reshape(-1, k)[:q]
