"""On-chip quality gate for the Pallas flash-gram training path.

The suite's e2e quality tests run on CPU, where the Pallas gram is inactive
(losses auto-gate to the XLA path) — so this script certifies the kernel's
TRAINING TRAJECTORY on the real chip: the synthetic train -> pick -> F1
pipeline of tests/test_e2e.py::test_train_pick_f1 (bf16 + contrastive, the
production config), run twice with CET_PALLAS_GRAM off/on, both gated at
the same F1 > 0.7 floor the suite uses. The two runs share data, seeds and
config; the only difference is the gram backend (its backward's w-matmuls
run at Mosaic's native single-pass bf16, ~9e-4 relative grad deviation —
this shows it does not move the learned picker).

Run from the repo root (TPU attached): python benchmarks/quality_tpu.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd


def run_once(tag):
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.train import losses as L
    from cet_pick_tpu.train.refine import train_refine
    from tests.test_e2e import make_synthetic

    rng = np.random.default_rng(7)
    vol, df = make_synthetic(rng)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(
            task="semi", arch="unet_2", contrastive=True, batch_size=4,
            lr=1e-3, num_epochs=4, val_intervals=-1, bbox=8, K=60,
            out_thresh=0.3, cutoff_z=2, nms=5, root_dir=tmp,
            dtype="bfloat16",
        ).finalize()
        ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
        t0 = time.perf_counter()
        state, hist = train_refine(cfg, ds, num_epochs=cfg.num_epochs,
                                   log_fn=lambda *_: None)
        t_train = time.perf_counter() - t0
        det = TomoDetector(cfg, params=state.params,
                           batch_stats=state.batch_stats, tile_z=16)
        r = det.run(vol, name="syn0", out_dir=os.path.join(tmp, "out"))
        dets = r["dets"].copy()
        dets[:, :2] *= cfg.down_ratio
        pred = pd.DataFrame({
            "image_name": "syn0",
            "x_coord": dets[:, 0], "y_coord": dets[:, 1],
            "z_coord": dets[:, 2], "score": dets[:, 3],
        })
        res = evaluate_detections(df, pred, radius=5)
    print(f"{tag:<22} train {t_train:6.1f} s   "
          f"hm_loss {hist[0]['hm_loss']:.4f} -> {hist[-1]['hm_loss']:.4f}   "
          f"F1 {res['best_f1']:.4f}  auprc {res['auprc']:.4f}", flush=True)
    return res["best_f1"]


def main():
    import jax

    from cet_pick_tpu.train import losses as L

    print(f"devices: {jax.devices()}", flush=True)
    f1s = {}
    for mode, tag in (("0", "xla gram"), ("1", "pallas flash-gram")):
        L.PALLAS_GRAM = mode
        L.unbiased_con_loss.clear_cache()
        L.supcon_loss.clear_cache()
        f1s[tag] = run_once(tag)
    L.PALLAS_GRAM = "auto"
    ok = all(f > 0.7 for f in f1s.values())
    print(f"gate F1 > 0.7 both backends: {'PASS' if ok else 'FAIL'}", flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
