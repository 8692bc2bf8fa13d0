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


def mine_neighbors(embeddings, k=20, block=1024):
    """Top-k neighbor indices (self excluded) — memory_bank.py:44-85.

    Self-exclusion is by INDEX, not rank: with duplicate/tied embeddings
    top-k can rank another point ahead of self, and dropping column 0 would
    then keep the anchor among its own neighbors (trivially satisfying the
    SCAN consistency term and inflating scan_evaluate).

    Delegates to the blocked ops/kmeans.knn_search so peak memory stays
    O(block * N) at reference-scale candidate counts."""
    from cet_pick_tpu.ops.kmeans import knn_search

    x = jnp.asarray(np.asarray(embeddings, np.float32))
    n = x.shape[0]
    _, idx = knn_search(x, x, k=min(k, n - 1), block=block, exclude_self=True)
    return np.asarray(idx)


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


# ---------------------------------------------------------------------------
# full-model SCAN fine-tune + confidence self-labeling
# (TomoSCANTrainer, trains/tomo_scan_trainer.py:17-103 +
#  base_trainer.py:59-109 ModelWithLossSCAN{,2D3D};
#  ClusteringModel simsiam_model_2d3d.py:847-877)
# ---------------------------------------------------------------------------

def _as_nhwc(patches):
    x = np.asarray(patches, np.float32)
    return x[..., None] if x.ndim == 3 else x


def create_scan_state(model, config, rng, sample2d, sample3d, lr=1e-4):
    """TrainState over a ScanClusteringModel (both views' patch shapes)."""
    import optax as _optax

    from cet_pick_tpu.train.state import TrainState, jit_init

    variables = jit_init(model, rng, jnp.asarray(sample2d),
                         None if sample3d is None else jnp.asarray(sample3d),
                         train=False)
    tx = _optax.inject_hyperparams(_optax.adam)(learning_rate=lr)
    params = variables["params"]
    from flax import core

    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(step=0, epoch=0, params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx)


def load_pretext_backbone(state, simsiam_params, simsiam_batch_stats):
    """Graft pretrained SimSiam encoder weights into the clustering model
    (the reference loads opt.simsiam_dir's checkpoint as the SCAN backbone,
    opts.py:259-263 + main.py load_model)."""
    import flax

    from cet_pick_tpu.train.state import _merge_tolerant

    def graft(target, source):
        # keep the clustering backbone's own structure AND leaf shapes:
        # per-leaf tolerant merge (state.py semantics) takes matching
        # modules from the SimSiam checkpoint, ignores its extras (e.g. the
        # predictor head), and skips shape-mismatched leaves — a verbatim
        # subtree graft from a different head_conv/arch would desync the
        # optimizer state initialized over the original shapes and crash
        # the first tx.update with an opaque pytree error
        from flax import serialization

        merged = _merge_tolerant(
            serialization.to_state_dict(target),
            serialization.to_state_dict(flax.core.unfreeze(source)),
            "backbone",
        )
        return serialization.from_state_dict(target, merged)

    params = flax.core.unfreeze(state.params)
    params["backbone"] = graft(params["backbone"], simsiam_params)
    bs = flax.core.unfreeze(state.batch_stats)
    if simsiam_batch_stats and "backbone" in bs:
        # only graft running stats the clustering model actually tracks —
        # inserting an empty 'backbone' entry the initialized model never
        # had would change the batch_stats pytree structure
        bs["backbone"] = graft(bs["backbone"], simsiam_batch_stats)
    return state.replace(
        params=flax.core.freeze(params) if isinstance(state.params, core.FrozenDict) else params,
        batch_stats=flax.core.freeze(bs) if isinstance(state.batch_stats, core.FrozenDict) else bs,
    )


def make_scan_finetune_step(model, entropy_weight=2.0, head_only=False):
    """Jitted SCAN step over (anchor, neighbor) patch batches.

    head_only=True reproduces --cluster_head (base_trainer.py:62-77): the
    backbone runs in eval mode under stop_gradient and only the cluster
    head(s) update. head_only=False fine-tunes the whole network — the
    reference's default SCAN mode (ModelWithLossSCAN else-branch :77-79).
    """

    def loss_fn(params, batch_stats, a2d, a3d, n2d, n3d):
        if head_only:
            vars_ = {"params": params, "batch_stats": batch_stats}
            fa = model.apply(vars_, a2d, a3d, train=False,
                             method=model.features)
            fn_ = model.apply(vars_, n2d, n3d, train=False,
                              method=model.features)
            fa = jax.lax.stop_gradient(fa)
            fn_ = jax.lax.stop_gradient(fn_)
            new_bs = batch_stats
        else:
            fa, upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, a2d, a3d,
                train=True, method=model.features, mutable=["batch_stats"],
            )
            bs1 = dict(upd).get("batch_stats", batch_stats)
            fn_, upd2 = model.apply(
                {"params": params, "batch_stats": bs1}, n2d, n3d,
                train=True, method=model.features, mutable=["batch_stats"],
            )
            new_bs = dict(upd2).get("batch_stats", bs1)

        la = model.apply({"params": params}, fa, method=model.head_logits)
        ln = model.apply({"params": params}, fn_, method=model.head_logits)
        totals, cons, ents = [], [], []
        for l_a, l_n in zip(la, ln):  # per cluster head (tomo_scan_trainer.py:66-76)
            t, c, e = scan_loss(l_a, l_n, entropy_weight)
            totals.append(t)
            cons.append(c)
            ents.append(e)
        loss = jnp.sum(jnp.stack(totals))
        metrics = {
            "total_loss": loss,
            "consistency_loss": jnp.mean(jnp.stack(cons)),
            "entropy_loss": jnp.mean(jnp.stack(ents)),
            # per-head totals: the reference trains nheads independent
            # cluster heads and keeps the lowest-loss one
            # (tomo_scan_trainer.py:66-76, model.py save best_loss_head)
            "head_losses": jnp.stack(totals),
        }
        return loss, (new_bs, metrics)

    @jax.jit
    def step(state, a2d, a3d, n2d, n3d):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, a2d, a3d, n2d, n3d
        )
        return state.apply_gradients(grads, batch_stats=new_bs), metrics

    return step


def make_selflabel_step(model, threshold=0.99, class_balance=True, head=0):
    """Jitted self-labeling step: confident weak-view pseudo-labels supervise
    the strong view (loss.py:15-66 ConfidenceBasedCE; the SCAN paper's
    self-label stage the reference ships the loss for). ``head`` selects the
    cluster head (the SCAN stage's best head when nheads > 1)."""

    def loss_fn(params, batch_stats, w2d, w3d, s2d, s3d):
        weak = model.apply({"params": params, "batch_stats": batch_stats},
                           w2d, w3d, train=False)[head]
        weak = jax.lax.stop_gradient(weak)
        fs, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, s2d, s3d,
            train=True, method=model.features, mutable=["batch_stats"],
        )
        new_bs = dict(upd).get("batch_stats", batch_stats)
        strong = model.apply({"params": params}, fs,
                             method=model.head_logits)[head]
        loss, n_conf = confidence_ce_loss(
            weak, strong, threshold=threshold, class_balance=class_balance
        )
        return loss, (new_bs, {"loss": loss, "n_confident": n_conf})

    @jax.jit
    def step(state, w2d, w3d, s2d, s3d):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, w2d, w3d, s2d, s3d
        )
        return state.apply_gradients(grads, batch_stats=new_bs), metrics

    return step


def _strong_aug(rng, x):
    """Host-side strong augmentation for self-labeling: random flips +
    gaussian noise (the reference's strong Compose for its 2-channel patches)."""
    y = x.copy()
    for i in range(len(y)):
        if rng.random() < 0.5:
            y[i] = y[i][:, ::-1]
        if rng.random() < 0.5:
            y[i] = y[i][::-1, :]
    return y + rng.standard_normal(y.shape).astype(np.float32) * 0.1


def scan_assignments(model, state, patches_2d, patches_3d, batch_size=256,
                     head=0):
    """Cluster assignment (argmax of ``head``, the SCAN stage's best head)
    for every patch."""
    p2 = _as_nhwc(patches_2d)
    p3 = None if patches_3d is None else _as_nhwc(patches_3d)
    out = []

    @jax.jit
    def fwd(params, batch_stats, x2d, x3d):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x2d, x3d, train=False)[head]

    for s in range(0, len(p2), batch_size):
        x2d = jnp.asarray(p2[s : s + batch_size])
        x3d = None if p3 is None else jnp.asarray(p3[s : s + batch_size])
        out.append(np.asarray(fwd(state.params, state.batch_stats, x2d, x3d)))
    logits = np.concatenate(out)
    return logits.argmax(axis=1), logits


def train_scan_full(config, patches_2d, patches_3d, neighbors, n_clusters,
                    n_heads=1, pretext=None, num_steps=300, batch_size=64,
                    lr=1e-4, entropy_weight=2.0, head_only=False,
                    selflabel_steps=0, selflabel_threshold=0.99, seed=0,
                    log_fn=print):
    """Full SCAN pipeline over candidate patches.

    patches_2d/patches_3d: (N, H, W) float32 patch stacks (patches_3d=None in
    2d mode); neighbors: (N, k) mined indices (mine_neighbors over pretext
    embeddings). pretext: optional (params, batch_stats) of a trained SimSiam
    encoder to warm-start the backbone. selflabel_steps > 0 appends the
    confidence self-labeling round (driven through the SCAN stage's best
    head). Returns (state, model, assignments, best_head): with n_heads > 1
    the reference trains independent cluster heads and keeps the
    lowest-loss one (tomo_scan_trainer.py:66-76, --nheads; model.py:79-89
    extracts cluster_head.{best_loss_head} at load time) — best_head is the
    argmin of the per-head loss averaged over the last 50 steps, and the
    returned assignments come from it.
    """
    from cet_pick_tpu.models.simsiam import create_scan_model

    model = create_scan_model(config, n_clusters, n_heads)
    p2 = _as_nhwc(patches_2d)
    p3 = None if patches_3d is None else _as_nhwc(patches_3d)
    n = len(p2)
    state = create_scan_state(
        model, config, jax.random.PRNGKey(seed), p2[:1],
        None if p3 is None else p3[:1], lr=lr,
    )
    if pretext is not None:
        state = load_pretext_backbone(state, *pretext)

    from cet_pick_tpu.parallel.mesh import auto_dp_step

    inner = make_scan_finetune_step(model, entropy_weight,
                                    head_only=head_only)

    def dict_step(state, batch):
        # dict adapter so the shared DP policy can shard the patch leaves;
        # the entropy term's batch-mean becomes a GSPMD psum, the rest is
        # per-sample (fewshot stays single-device by design: its loss runs
        # a GLOBAL constrained kmeans over every pixel in the batch)
        return inner(state, batch["a2d"], batch.get("a3d"),
                     batch["n2d"], batch.get("n3d"))

    step, place_state, place_batch, _ = auto_dp_step(
        config, dict_step, log_fn=log_fn
    )
    state = place_state(state)
    rng = np.random.default_rng(seed)
    k = neighbors.shape[1]
    tail = max(1, min(50, num_steps))  # best-head window: final 50 steps
    # head_sums accumulates ON DEVICE (adding two device vectors dispatches
    # async); the eager np.asarray per tail step was 50 blocking round trips
    head_sums = None
    head_cnt = 0
    for it in range(num_steps):
        idx = rng.integers(0, n, size=min(batch_size, n))
        nb = neighbors[idx, rng.integers(0, k, size=len(idx))]
        batch = {"a2d": p2[idx], "n2d": p2[nb]}
        if p3 is not None:
            batch["a3d"], batch["n3d"] = p3[idx], p3[nb]
        state, metrics = step(state, place_batch(batch))
        if num_steps - it <= tail:
            hl = metrics["head_losses"]
            head_sums = hl if head_sums is None else head_sums + hl
            head_cnt += 1
        if (it + 1) % 50 == 0:
            log_fn(f"scan step {it + 1}: " + " ".join(
                f"{kk}={float(v):.4f}" for kk, v in metrics.items()
                if np.ndim(v) == 0))
    # one fetch for the whole tail window (num_steps=0 leaves it empty)
    head_sums = (np.asarray(head_sums) if head_sums is not None
                 else np.zeros(n_heads))
    best_head = int(np.argmin(head_sums / max(head_cnt, 1)))
    if n_heads > 1:
        log_fn(f"best cluster head: {best_head} (mean losses "
               + " ".join(f"{v:.4f}" for v in head_sums / max(head_cnt, 1))
               + ")")

    if selflabel_steps > 0:
        sl_inner = make_selflabel_step(model, threshold=selflabel_threshold,
                                       head=best_head)

        def sl_dict_step(state, batch):
            return sl_inner(state, batch["w2d"], batch.get("w3d"),
                            batch["s2d"], batch.get("s3d"))

        sl_step, _, sl_place_batch, _ = auto_dp_step(
            config, sl_dict_step, log_fn=lambda *_: None  # mesh already logged
        )
        for it in range(selflabel_steps):
            idx = rng.integers(0, n, size=min(batch_size, n))
            batch = {"w2d": p2[idx], "s2d": _strong_aug(rng, p2[idx])}
            if p3 is not None:
                batch["w3d"] = p3[idx]
                batch["s3d"] = _strong_aug(rng, p3[idx])
            state, metrics = sl_step(state, sl_place_batch(batch))
            if (it + 1) % 50 == 0:
                log_fn(f"selflabel step {it + 1}: " + " ".join(
                    f"{kk}={float(v):.4f}" for kk, v in metrics.items()))

    assign, _ = scan_assignments(model, state, patches_2d, patches_3d,
                                 head=best_head)
    return state, model, assign, best_head
