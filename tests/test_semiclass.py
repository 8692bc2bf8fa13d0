"""Semiclass task: fill/unfill dataset, trainer, greedy-NMS inference.

Covers the reference's semiclass pathway (datasets/tomo_classify_moco.py +
particle_moco_classify.py, trains/tomo_cr_semi_class_trainer.py,
detectors/tomo_det_classify.py, test_class.py) end to end on the synthetic
blob fixture.
"""

import numpy as np
import pytest

from cet_pick_tpu.config import Config
from cet_pick_tpu.data.classify_dataset import SemiClassDataset, build_class_heatmap
from tests.test_e2e import make_synthetic


def _cfg(tmp_path, **kw):
    base = dict(
        task="semiclass", arch="unet_2", contrastive=False, batch_size=8,
        ge=True, lr=1e-3, num_epochs=2, val_intervals=-1, bbox=8, K=60,
        # a PU-GE-trained heatmap peaks lower than a focal one (the GE
        # penalty caps the unlabeled positive mass at tau), so the pick
        # threshold sits lower; tau stays at the 0.1 default — smaller taus
        # suppress the whole map
        out_thresh=0.15, cutoff_z=2, nms=5, num_iters=64,
        root_dir=str(tmp_path),
    )
    base.update(kw)
    return Config(**base).finalize()


def test_fill_unfill_labels():
    """Core voxels -> 1, ring -> 0.1, elsewhere -1 in PU train mode
    (tomo_classify_moco.py:119-139)."""
    coords = [(32, 32, 16)]
    hm, gt = build_class_heatmap((32, 64, 64), coords, bbox=8, down_ratio=2,
                                 pu=True, train=True)
    assert hm.shape == (32, 32, 32)
    assert hm[16, 16, 16] == 1.0                      # center = core
    vals = {round(float(v), 3) for v in np.unique(hm)}
    assert vals == {-1.0, 0.1, 1.0}
    # ring surrounds the core: some 0.1 voxels adjacent to the core region
    core = np.argwhere(hm == 1.0)
    assert len(core) >= 1
    assert (hm == 0.1).sum() > (hm == 1.0).sum()
    # pn / eval mode: untouched voxels stay 0
    hm_eval, _ = build_class_heatmap((32, 64, 64), coords, bbox=8,
                                     down_ratio=2, pu=True, train=False)
    assert {round(float(v), 3) for v in np.unique(hm_eval)} == {0.0, 0.1, 1.0}
    # fiber mode uses labels (1, 0) at threshold 0.2
    hm_f, _ = build_class_heatmap((32, 64, 64), coords, bbox=8, down_ratio=2,
                                  fiber=True, pu=False, train=True)
    assert {round(float(v), 3) for v in np.unique(hm_f)} <= {0.0, 1.0}


def test_dataset_stratified_batches(tmp_path, rng):
    vol, df = make_synthetic(rng, n_part=10)
    cfg = _cfg(tmp_path)
    ds = SemiClassDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    batch = ds.sample_batch(rng, range(16))
    assert batch["input"].shape == (16, 1, 6, 64, 64)
    assert batch["hm"].shape == (16, 1, 6, 32, 32)
    assert batch["label"].shape == (16,)
    assert batch["flip_prob"].shape == (16,)
    # stratification: about half of the drawn centers are positive cores
    pos_frac = (batch["label"] == 1.0).mean()
    assert 0.2 <= pos_frac <= 0.8, f"stratified balance off: {pos_frac}"
    # every drawn batch carries positives (PU losses require them)
    assert (batch["hm"] == 1).any()
    # flip consistency: the aug view is synthesized ON DEVICE inside the
    # shared refine step as the per-sample flip of the input
    # (particle_moco.py:145-154; train/refine.py loss_fn)
    from cet_pick_tpu.train.refine import unflip_aug

    aug = np.asarray(unflip_aug(batch["input"], batch["flip_prob"]))
    for i in range(4):
        if batch["flip_prob"][i] <= 0.5:
            np.testing.assert_array_equal(
                aug[i], batch["input"][i][:, :, :, ::-1])
        else:
            np.testing.assert_array_equal(
                aug[i], batch["input"][i][:, :, ::-1, :])


@pytest.mark.slow
def test_semiclass_train_pick_f1(tmp_path, rng):
    """Train (pn / focal mode, tomo_cr_semi_class_trainer.py:25-27) ->
    classify-test pipeline -> F1 on planted particles.

    The PU-GE mode's convergence is covered by
    test_semiclass_ge_loss_decreases: its GE penalty ties the background
    level to tau, so crisp picks need a tau matched to the true prior and a
    long schedule — too slow for CI; focal mode demonstrates the same
    dataset/trainer/decode pipeline end to end."""
    import pandas as pd

    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.infer.classify import TomoClassDetector
    from cet_pick_tpu.train.semiclass import train_semiclass

    # 256^2 fixture: the classify decode zeroes a 30-heatmap-voxel
    # (60-input-px) xy band like the reference, so particles must live
    # well inside it (margin 70) and the volume must leave a usable center
    vol, df = make_synthetic(rng, h=256, w=256, margin=70)
    cfg = _cfg(tmp_path, num_epochs=6, num_iters=128, ge=False, pn=True,
               out_thresh=0.3)
    ds = SemiClassDataset(cfg, "train", images={"syn0": vol}, coords_df=df)

    state, hist = train_semiclass(cfg, ds, log_fn=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["hm_loss"] < hist[0]["hm_loss"]

    det = TomoClassDetector(cfg, params=state.params,
                            batch_stats=state.batch_stats, tile_z=16)
    # borders are zeroed at 30 HEATMAP voxels (60 input px); the fixture's
    # margin=70 keeps every particle inside the surviving region
    r = det.run(vol, name="syn0", out_dir=str(tmp_path / "out"))
    assert (tmp_path / "out" / "syn0.txt").exists()
    assert (tmp_path / "out" / "syn0_hm.mrc").exists()

    dets = r["dets"]
    assert dets.shape[1] == 4
    pred = pd.DataFrame({
        "image_name": "syn0",
        "x_coord": dets[:, 0], "y_coord": dets[:, 1], "z_coord": dets[:, 2],
        "score": dets[:, 3],
    })
    res = evaluate_detections(df, pred, radius=5)
    assert res["best_f1"] > 0.6, (
        f"semiclass F1 too low: {res['best_f1']:.3f} (auprc {res['auprc']:.3f})"
    )


@pytest.mark.slow
def test_semiclass_ge_loss_decreases(tmp_path, rng):
    """The PU-GE objective (the reference's semiclass default,
    tomo_cr_semi_class_trainer.py:28-36) converges on the fixture."""
    from cet_pick_tpu.train.semiclass import train_semiclass

    vol, df = make_synthetic(rng, n_part=10)
    cfg = _cfg(tmp_path, num_epochs=3, num_iters=64)
    ds = SemiClassDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    state, hist = train_semiclass(cfg, ds, log_fn=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["hm_loss"] < hist[0]["hm_loss"] * 0.1


def test_semiclass_requires_pn_or_ge(tmp_path, rng):
    from cet_pick_tpu.train.semiclass import train_semiclass

    vol, df = make_synthetic(rng, n_part=5)
    cfg = _cfg(tmp_path, ge=False)
    ds = SemiClassDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    with pytest.raises(ValueError, match="pn.*ge|ge.*pn|--pn"):
        train_semiclass(cfg, ds, log_fn=lambda *_: None)
