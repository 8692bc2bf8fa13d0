"""End-to-end integration: synthetic tomogram -> train -> pick -> F1.

The tutorial-scale fixture SURVEY.md §4 calls for: gaussian blobs at known
coordinates play the role of the EMPIAR tutorial data; after a few epochs of
refinement training the detector must recover the planted particles with
high F1. Exercises every layer: loader-normalized volume -> heatmap targets
-> crop sampler -> PU focal training -> checkpoint state -> tiled inference
-> fused decode -> coordinate output -> Hungarian-matched PR/F1.
"""

import numpy as np
import pandas as pd
import pytest

from cet_pick_tpu.config import Config
from cet_pick_tpu.data.refine_dataset import RefineDataset
from cet_pick_tpu.eval.metrics import evaluate_detections
from cet_pick_tpu.infer.detector import TomoDetector
from cet_pick_tpu.train.refine import train_refine


def make_synthetic(rng, d=32, h=128, w=128, n_part=25):
    vol = rng.standard_normal((d, h, w)).astype(np.float32) * 0.5
    zz, yy, xx = np.meshgrid(
        np.arange(d), np.arange(h), np.arange(w), indexing="ij"
    )
    coords = []
    for _ in range(n_part):
        z = rng.integers(8, d - 8)
        y = rng.integers(40, h - 40)
        x = rng.integers(40, w - 40)
        blob = np.exp(
            -(((zz - z) ** 2) / 8.0 + ((yy - y) ** 2) / 18.0 + ((xx - x) ** 2) / 18.0)
        )
        vol -= 2.5 * blob.astype(np.float32)  # dark particles, as in cryo-ET
        coords.append(("syn0", x, y, z))
    vol = (vol - vol.mean()) / vol.std()
    df = pd.DataFrame(coords, columns=["image_name", "x_coord", "y_coord", "z_coord"])
    return vol, df


@pytest.mark.slow
def test_train_pick_f1(tmp_path, rng):
    vol, df = make_synthetic(rng)
    cfg = Config(
        task="semi", arch="unet_2", contrastive=False, batch_size=4,
        lr=1e-3, num_epochs=4, val_intervals=-1, bbox=8, K=60,
        out_thresh=0.3, cutoff_z=2, nms=5, root_dir=str(tmp_path),
    ).finalize()
    ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    assert len(ds) == len(df)

    state, hist = train_refine(cfg, ds, num_epochs=cfg.num_epochs, log_fn=lambda *_: None)
    assert hist[-1]["hm_loss"] < hist[0]["hm_loss"]

    det = TomoDetector(cfg, params=state.params, batch_stats=state.batch_stats,
                       tile_z=16)
    r = det.run(vol, name="syn0", out_dir=str(tmp_path / "out"))
    assert (tmp_path / "out" / "syn0.txt").exists()
    assert (tmp_path / "out" / "syn0_hm.mrc").exists()

    dets = r["dets"].copy()
    dets[:, :2] *= cfg.down_ratio
    pred = pd.DataFrame({
        "image_name": "syn0",
        "x_coord": dets[:, 0], "y_coord": dets[:, 1], "z_coord": dets[:, 2],
        "score": dets[:, 3],
    })
    res = evaluate_detections(df, pred, radius=5)
    assert res["best_f1"] > 0.7, f"F1 too low: {res['best_f1']:.3f} (auprc {res['auprc']:.3f})"
