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


# ---------------------------------------------------------------------------
# full-model SCAN fine-tune + self-labeling
# (tomo_scan_trainer.py:17-103, base_trainer.py:59-109, loss.py:15-66)
# ---------------------------------------------------------------------------

def _two_class_patches(rng, n_per=16, size=24):
    """Blob patches (class 0) vs stripe patches (class 1)."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    patches, labels = [], []
    for i in range(2 * n_per):
        lb = i % 2
        base = rng.standard_normal((size, size)).astype(np.float32) * 0.3
        if lb == 0:
            base += np.exp(-(((yy - size / 2) ** 2 + (xx - size / 2) ** 2)
                           / 20.0)).astype(np.float32) * 3
        else:
            base += (np.sin(xx / 2.0) * 2).astype(np.float32)
        patches.append(base)
        labels.append(lb)
    patches = np.stack(patches)
    labels = np.array(labels)
    # neighbors: same-class indices (perfect pretext mining)
    neighbors = np.stack([
        rng.choice(np.setdiff1d(np.where(labels == lb)[0], [i]), size=4)
        for i, lb in enumerate(labels)
    ])
    return patches, labels, neighbors


def _scan_cfg():
    from cet_pick_tpu.config import Config

    return Config(task="scan", arch="simsiam2d_18", bbox=24,
                  nclusters=2, batch_size=16).finalize()


@pytest.mark.slow
def test_scan_full_finetune_updates_backbone(rng):
    from cet_pick_tpu.train.scan import scan_evaluate, train_scan_full

    patches, labels, neighbors = _two_class_patches(rng)
    cfg = _scan_cfg()
    state0 = None

    state, model, assign, best_head = train_scan_full(
        cfg, patches, None, neighbors, n_clusters=2, num_steps=30,
        batch_size=16, lr=1e-3, seed=0, log_fn=lambda *_: None,
    )
    assert assign.shape == (len(patches),) and best_head == 0
    # with perfect neighbors the SCAN objective should keep mined neighbors
    # together clearly better than chance (0.5 for 2 balanced clusters)
    consistency = scan_evaluate(assign, neighbors)
    assert consistency > 0.6, f"neighbor consistency {consistency:.3f}"


@pytest.mark.slow
def test_scan_head_only_freezes_backbone(rng):
    import jax

    from cet_pick_tpu.models.simsiam import create_scan_model
    from cet_pick_tpu.train.scan import (
        create_scan_state, make_scan_finetune_step,
    )

    patches, labels, neighbors = _two_class_patches(rng, n_per=8)
    cfg = _scan_cfg()
    p = patches[..., None]
    model = create_scan_model(cfg, n_clusters=2)
    state = create_scan_state(model, cfg, jax.random.PRNGKey(0), p[:1], None)
    before = jax.tree_util.tree_map(np.copy, state.params["backbone"])
    head_before = np.copy(np.asarray(state.params["head0"]["kernel"]))

    step = make_scan_finetune_step(model, head_only=True)
    state, _ = step(state, jnp.asarray(p[:8]), None, jnp.asarray(p[8:16]), None)
    after = state.params["backbone"]
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(leaves_b, leaves_a):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert not np.allclose(head_before,
                           np.asarray(state.params["head0"]["kernel"]))

    # full fine-tune DOES move the backbone
    state2 = create_scan_state(model, cfg, jax.random.PRNGKey(0), p[:1], None)
    step2 = make_scan_finetune_step(model, head_only=False)
    state2, _ = step2(state2, jnp.asarray(p[:8]), None,
                      jnp.asarray(p[8:16]), None)
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(leaves_b,
                        jax.tree_util.tree_leaves(state2.params["backbone"]))
    )
    assert changed, "full fine-tune did not update the backbone"


def test_selflabel_step_confident_mask(rng):
    import jax

    from cet_pick_tpu.models.simsiam import create_scan_model
    from cet_pick_tpu.train.scan import create_scan_state, make_selflabel_step

    patches, _, _ = _two_class_patches(rng, n_per=8)
    cfg = _scan_cfg()
    p = patches[..., None]
    model = create_scan_model(cfg, n_clusters=2)
    state = create_scan_state(model, cfg, jax.random.PRNGKey(0), p[:1], None)
    # threshold 0 -> every sample is confident; loss must be finite
    step = make_selflabel_step(model, threshold=0.0)
    state, metrics = step(state, jnp.asarray(p[:8]), None,
                          jnp.asarray(p[8:16]), None)
    assert float(metrics["n_confident"]) == 8
    assert np.isfinite(float(metrics["loss"]))


def test_load_pretext_backbone(rng):
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.simsiam import create_scan_model, create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state
    from cet_pick_tpu.train.scan import create_scan_state, load_pretext_backbone

    cfg = _scan_cfg()
    enc = create_simsiam(Config(task="simsiam3d", arch="simsiam2d_18",
                                head_conv=128).finalize())
    sample = {"anchor": np.zeros((1, 1, 24, 24), np.float32)}
    enc_state = create_simsiam_state(enc, cfg, jax.random.PRNGKey(1), sample)

    model = create_scan_model(cfg, n_clusters=2)
    p = np.zeros((1, 24, 24, 1), np.float32)
    state = create_scan_state(model, cfg, jax.random.PRNGKey(0), p, None)
    state = load_pretext_backbone(state, enc_state.params,
                                  enc_state.batch_stats)
    got = np.asarray(jax.tree_util.tree_leaves(state.params["backbone"])[0])
    want = np.asarray(jax.tree_util.tree_leaves(enc_state.params)[0])
    np.testing.assert_array_equal(got, want)


def test_scan_head_conv_default_matches_simsiam():
    """scan/scan2d3d must default head_conv to the simsiam encoder's 128 —
    a 32 default made the tolerant loader silently drop every trained
    fc/proj/pred head when scan-finetune loaded an exploration checkpoint
    (the reference leaves scan's head_conv at -1, an outright crash)."""
    from cet_pick_tpu.config import Config

    for task in ("scan", "scan2d3d"):
        assert Config(task=task).finalize().head_conv == 128
    assert Config(task="simsiam2d3d").finalize().head_conv == 128
    assert Config(task="semi").finalize().head_conv == 32


def test_scan_multihead_best_head_selection(rng):
    """--nheads parity (tomo_scan_trainer.py:66-76): independent cluster
    heads train jointly, per-head losses are tracked, the best head drives
    assignments, and its index is returned for persistence
    (model.py:79-89 best_loss_head)."""
    from cet_pick_tpu.train.scan import (
        scan_assignments, train_scan_full,
    )

    patches, labels, neighbors = _two_class_patches(rng, n_per=8)
    cfg = _scan_cfg()
    state, model, assign, best_head = train_scan_full(
        cfg, patches, None, neighbors, n_clusters=2, n_heads=3,
        num_steps=12, batch_size=16, lr=1e-3, seed=0,
        log_fn=lambda *_: None,
    )
    assert 0 <= best_head < 3
    assert assign.shape == (len(patches),)
    assert set(np.unique(assign)) <= {0, 1}
    # the returned assignments are exactly the best head's argmax
    a_best, logits = scan_assignments(model, state, patches, None,
                                      head=best_head)
    np.testing.assert_array_equal(assign, a_best)
    assert logits.shape == (len(patches), 2)
