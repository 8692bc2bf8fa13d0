"""SCAN clustering: losses, neighbor mining, head training."""

import numpy as np
import pytest

import jax.numpy as jnp

from cet_pick_tpu.train.scan import (
    confidence_ce_loss,
    entropy_of_mean,
    mine_neighbors,
    scan_loss,
    scan_evaluate,
    train_scan_head,
)


def test_scan_loss_components():
    # identical confident anchor/neighbor logits -> low consistency loss
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    total, cons, ent = scan_loss(logits, logits)
    assert cons < 1e-3
    # balanced two-cluster assignment -> entropy ~ log 2
    assert float(ent) == pytest.approx(np.log(2), abs=1e-3)
    assert float(total) == pytest.approx(float(cons - 2.0 * ent), abs=1e-6)


def test_scan_loss_penalizes_disagreement():
    a = jnp.array([[10.0, 0.0]])
    b_same = jnp.array([[10.0, 0.0]])
    b_diff = jnp.array([[0.0, 10.0]])
    _, cons_same, _ = scan_loss(a, b_same)
    _, cons_diff, _ = scan_loss(a, b_diff)
    assert cons_diff > cons_same + 1.0


def test_confidence_ce_masks_unconfident():
    weak = jnp.array([[20.0, 0.0], [0.1, 0.0]])   # row0 confident, row1 not
    strong = jnp.array([[5.0, 0.0], [0.0, 5.0]])
    loss, n = confidence_ce_loss(weak, strong, threshold=0.99)
    assert float(n) == 1.0
    # only row 0 contributes; its strong logits favor the pseudo-label -> small
    assert float(loss) < 0.1


def test_mine_neighbors_excludes_self(rng):
    emb = rng.standard_normal((40, 8)).astype(np.float32)
    nb = mine_neighbors(emb, k=5)
    assert nb.shape == (40, 5)
    assert not np.any(nb == np.arange(40)[:, None])


def test_train_scan_head_separates(rng):
    # two well-separated feature clusters
    f = np.concatenate([
        rng.standard_normal((60, 16)) + 8,
        rng.standard_normal((60, 16)) - 8,
    ]).astype(np.float32)
    nb = mine_neighbors(f, k=10)
    state, head, assign = train_scan_head(
        f, nb, n_clusters=2, num_steps=150, lr=5e-3,
        log_fn=lambda *_: None,
    )
    # neighbor-consistency metric near 1 and both clusters used
    assert scan_evaluate(assign, nb) > 0.95
    assert len(set(assign[:60].tolist())) == 1
    assert len(set(assign[60:].tolist())) == 1
    assert assign[0] != assign[-1]
