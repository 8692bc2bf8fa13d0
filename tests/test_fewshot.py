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


# ---------------------------------------------------------------------------
# training loop + dataset (TomoKMTrainer, tomo_fewshot_cr_trainer.py:20-168)
# ---------------------------------------------------------------------------

def make_two_class_synthetic(rng, d=24, h=96, w=96, n_per_class=8):
    """Dark compact blobs (class 1) vs bright wide blobs (class 2)."""
    import pandas as pd

    vol = rng.standard_normal((d, h, w)).astype(np.float32) * 0.5
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    rows = []
    for lb in (1, 2):
        for _ in range(n_per_class):
            z = int(rng.integers(6, d - 6))
            y = int(rng.integers(24, h - 24))
            x = int(rng.integers(24, w - 24))
            if lb == 1:
                blob = np.exp(-(((zz - z) ** 2) / 6.0 + ((yy - y) ** 2) / 10.0
                               + ((xx - x) ** 2) / 10.0))
                vol -= 3.0 * blob.astype(np.float32)
            else:
                blob = np.exp(-(((zz - z) ** 2) / 10.0 + ((yy - y) ** 2) / 30.0
                               + ((xx - x) ** 2) / 30.0))
                vol += 3.0 * blob.astype(np.float32)
            rows.append(("syn0", x, y, z, lb))
    vol = (vol - vol.mean()) / vol.std()
    df = pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord",
                                     "z_coord", "label"])
    return vol, df


def test_constrained_kmeans_warm_keeps_seeds(rng):
    from cet_pick_tpu.train.fewshot import constrained_kmeans_warm

    x = rng.standard_normal((64, 8)).astype(np.float32)
    seeds = np.zeros(64, np.int32)
    seeds[:4] = 1
    seeds[4:8] = 2
    cents, assign = constrained_kmeans(jnp.asarray(x), jnp.asarray(seeds),
                                       n_clusters=3)
    cents2, assign2 = constrained_kmeans_warm(jnp.asarray(x),
                                              jnp.asarray(seeds), cents)
    for a in (assign, assign2):
        a = np.asarray(a)
        assert (a[:4] == 1).all() and (a[4:8] == 2).all()
    assert np.asarray(cents2).shape == (3, 8)


def test_fewshot_dataset_crops(tmp_path, rng):
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.fewshot_dataset import FewshotDataset

    vol, df = make_two_class_synthetic(rng)
    cfg = Config(task="fs", arch="unet_2", bbox=8,
                 root_dir=str(tmp_path)).finalize()
    ds = FewshotDataset(cfg, "train", images={"syn0": vol}, coords_df=df,
                        crop_d=6, crop_xy=64)
    assert len(ds) == 8  # class-1 annotations only index the sampler
    batch = ds.sample_batch(rng, range(2))
    assert batch["input"].shape == (2, 6, 64, 64)
    assert batch["hm"].shape == (2, 6, 32, 32)
    assert batch["lb_map"].shape == (2, 6, 32, 32)
    # crop is centered on a class-1 annotation -> its label voxel is present
    assert (batch["lb_map"] == 1).any()
    # label column is required
    with pytest.raises(ValueError, match="label"):
        FewshotDataset(cfg, "train", images={"syn0": vol},
                       coords_df=df.drop(columns=["label"]))


@pytest.mark.slow
def test_fewshot_training_separates_classes(tmp_path, rng):
    """Train fs on the two-class fixture; the target prototype must score
    held-out class-1 sites above class-2 sites (better than chance)."""
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.fewshot_dataset import FewshotDataset
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.fewshot import fewshot_similarity, train_fewshot

    vol, df = make_two_class_synthetic(rng)
    cfg = Config(task="fs", arch="unet_2", bbox=8, batch_size=2,
                 contrastive=True, num_epochs=10, lr=2e-3, nclusters=3,
                 cr_weight=1.0, root_dir=str(tmp_path)).finalize()
    ds = FewshotDataset(cfg, "train", images={"syn0": vol}, coords_df=df,
                        crop_d=6, crop_xy=64)
    state, centers, hist = train_fewshot(cfg, ds, log_fn=lambda *_: None)
    assert centers.shape[0] == 3
    assert np.isfinite(hist[-1]["loss"])

    model = create_detector(cfg)
    sim = np.asarray(fewshot_similarity(model, state, centers, vol))
    assert sim.shape == (24, 48, 48)
    lb1 = df[df.label == 1]
    lb2 = df[df.label == 2]
    s1 = [sim[int(r.z_coord), int(r.y_coord) // 2, int(r.x_coord) // 2]
          for r in lb1.itertuples()]
    s2 = [sim[int(r.z_coord), int(r.y_coord) // 2, int(r.x_coord) // 2]
          for r in lb2.itertuples()]
    assert np.mean(s1) > np.mean(s2) + 0.1, (
        f"target prototype does not separate classes: {np.mean(s1):.3f} vs "
        f"{np.mean(s2):.3f}"
    )
    # held-out site assignments: class-1 sites must pick cluster 1 more
    # often than class-2 sites do
    from cet_pick_tpu.train.fewshot import _normalize
    import jax.numpy as jnp

    cn = np.asarray(_normalize(jnp.asarray(centers)))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(vol)[None], train=False,
    )
    proj = np.asarray(_normalize(out["proj"][0]))
    assign = (proj @ cn.T).argmax(-1)
    a1 = np.mean([assign[int(r.z_coord), int(r.y_coord) // 2,
                         int(r.x_coord) // 2] == 1 for r in lb1.itertuples()])
    a2 = np.mean([assign[int(r.z_coord), int(r.y_coord) // 2,
                         int(r.x_coord) // 2] == 1 for r in lb2.itertuples()])
    assert a1 > a2, f"cluster-1 rate: class1 {a1:.2f} <= class2 {a2:.2f}"


def test_fewshot_load_model_applies(tmp_path, rng):
    """--load_model was a silent no-op for fs (and tcla) — the reference
    applies it for every task (main.py:60-66). Train briefly, save, then a
    warm-started run must begin from the saved parameters."""
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.fewshot_dataset import FewshotDataset
    from cet_pick_tpu.train.fewshot import train_fewshot
    from cet_pick_tpu.train.state import save_checkpoint

    vol, df = make_two_class_synthetic(rng)
    cfg = Config(task="fs", arch="unet_2", bbox=8, batch_size=2,
                 num_epochs=1, lr=2e-3, nclusters=3,
                 root_dir=str(tmp_path)).finalize()
    ds = FewshotDataset(cfg, "train", images={"syn0": vol}, coords_df=df,
                        crop_d=6, crop_xy=64)
    state, _, _ = train_fewshot(cfg, ds, log_fn=lambda *_: None)
    ck = str(tmp_path / "warm")
    save_checkpoint(ck, state, cfg)

    logs = []
    cfg2 = Config(task="fs", arch="unet_2", bbox=8, batch_size=2,
                  num_epochs=1, lr=0.0, nclusters=3, load_model=ck,
                  root_dir=str(tmp_path)).finalize()
    state2, _, _ = train_fewshot(cfg2, ds, log_fn=logs.append)
    assert any("loaded checkpoint" in str(l) for l in logs)
    # lr=0 run: parameters must equal the loaded checkpoint's
    l1 = jax.tree_util.tree_leaves(state.params)[0]
    l2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_fewshot_resume_continues_epochs(tmp_path, rng):
    """--resume must continue at the restored epoch (regression: the fs and
    tcla loops restarted at epoch 1, retraining the full schedule after a
    resume)."""
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.fewshot_dataset import FewshotDataset
    from cet_pick_tpu.train.fewshot import train_fewshot

    vol, df = make_two_class_synthetic(rng)
    cfg = Config(task="fs", arch="unet_2", bbox=8, batch_size=2,
                 num_epochs=2, lr=2e-3, nclusters=3, val_intervals=-1,
                 root_dir=str(tmp_path)).finalize()
    ds = FewshotDataset(cfg, "train", images={"syn0": vol}, coords_df=df,
                        crop_d=6, crop_xy=64)
    state, _, hist = train_fewshot(cfg, ds, log_fn=lambda *_: None)
    assert state.epoch == 2 and len(hist) == 2

    cfg2 = Config(task="fs", arch="unet_2", bbox=8, batch_size=2,
                  num_epochs=3, lr=2e-3, nclusters=3, val_intervals=-1,
                  resume=True, root_dir=str(tmp_path)).finalize()
    state2, _, hist2 = train_fewshot(cfg2, ds, log_fn=lambda *_: None)
    assert state2.epoch == 3 and len(hist2) == 1  # only epoch 3 ran
