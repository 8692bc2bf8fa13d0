"""Measured reference baseline: run the ACTUAL reference pipeline (torch,
CPU — its supported mode, reference docs/index.md:9) next to ours on
identical weights and identical synthetic inputs.

Produces the numbers BASELINE.md's "vs reference" rows cite:

1. F1 parity at fixture scale: train this framework on the synthetic blob
   fixture (tests/test_e2e.make_synthetic), export the weights to a
   reference state_dict (models/convert.flax_to_torch_state_dict), run BOTH
   inference pipelines (reference: whole-volume torch forward + _sigmoid +
   tomo_decode, detectors/tomo_det.py:23-40; ours: tiled forward + fused
   decode), Hungarian-match both against the planted coordinates.
2. Throughput: per-volume wall-clock of the reference hot path
   (test.py:77-85) on a mid-size volume, reported as voxels/s. Convolution
   throughput is resolution-independent above cache scale, so voxels/s
   extrapolates linearly to the tutorial 256x512x512 size.

Run from the repo root: python benchmarks/reference_compare.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import pandas as pd
    import torch

    from cet_pick.models.decode import tomo_decode as ref_tomo_decode
    from cet_pick.models.networks.unet_small import get_tomo_unet_small
    from cet_pick.models.utils import _sigmoid

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.models.convert import flax_to_torch_state_dict
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import train_refine
    from tests.test_e2e import make_synthetic

    torch.set_num_threads(os.cpu_count() or 1)
    results = {}

    # ---- 1. F1 parity on the fixture, identical weights --------------------
    rng = np.random.default_rng(317)
    vol, df = make_synthetic(rng)
    cfg = Config(
        task="semi", arch="unet_4", contrastive=False, batch_size=4,
        lr=1e-3, num_epochs=4, val_intervals=-1, bbox=8, K=60,
        out_thresh=0.3, cutoff_z=2, nms=5, root_dir="/tmp/refcmp",
    ).finalize()
    ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    state, _ = train_refine(cfg, ds, num_epochs=cfg.num_epochs,
                            log_fn=lambda *_: None)

    # ours
    det = TomoDetector(cfg, params=state.params,
                       batch_stats=state.batch_stats, tile_z=16)
    t0 = time.perf_counter()
    r = det.run(vol, name="syn0")
    ours_time = time.perf_counter() - t0
    dets = r["dets"].copy()
    dets[:, :2] *= cfg.down_ratio
    ours_f1 = evaluate_detections(df, _pred_df(dets), radius=5)["best_f1"]

    # reference, same weights
    sd = flax_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, state.params),
        jax.tree_util.tree_map(np.asarray, state.batch_stats), 4, cfg.heads)
    tm = get_tomo_unet_small(4, dict(cfg.heads), 32)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=False)
    tm.eval()
    x = torch.from_numpy(vol[None])
    t0 = time.perf_counter()
    with torch.no_grad():
        out = tm(x)[0]
        hm = _sigmoid(out["hm"])
        ref_dets = ref_tomo_decode(hm, kernel=cfg.nms, K=cfg.K)
    ref_dets = ref_dets.numpy().reshape(-1, 5)
    ref_time = time.perf_counter() - t0
    ref_dets[:, :2] *= cfg.down_ratio
    ref_f1 = evaluate_detections(df, _pred_df(ref_dets), radius=5)["best_f1"]

    results["fixture"] = {
        "ours_f1": round(float(ours_f1), 4),
        "reference_f1": round(float(ref_f1), 4),
        "ours_infer_s": round(ours_time, 3),
        "reference_infer_s": round(ref_time, 3),
    }
    print(json.dumps({"stage": "fixture", **results["fixture"]}), flush=True)

    # ---- 2. reference CPU throughput at mid-size ----------------------------
    D, H, W = 128, 256, 256
    volm = np.random.default_rng(0).standard_normal((D, H, W)).astype(np.float32)
    xm = torch.from_numpy(volm[None])
    with torch.no_grad():  # warm any lazy init
        tm(xm[:, :8])
    t0 = time.perf_counter()
    with torch.no_grad():
        out = tm(xm)[0]
        hm = _sigmoid(out["hm"])
        _ = ref_tomo_decode(hm, kernel=3, K=900)
    t_ref = time.perf_counter() - t0
    vps = D * H * W / t_ref
    results["reference_cpu"] = {
        "volume": f"{D}x{H}x{W}",
        "seconds": round(t_ref, 2),
        "voxels_per_sec": round(vps, 1),
        "extrapolated_s_per_256x512x512": round(256 * 512 * 512 / vps, 1),
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps({"stage": "reference_cpu", **results["reference_cpu"]}),
          flush=True)
    return results


def _pred_df(dets):
    import pandas as pd

    return pd.DataFrame({
        "image_name": "syn0",
        "x_coord": dets[:, 0], "y_coord": dets[:, 1], "z_coord": dets[:, 2],
        "score": dets[:, 3],
    })


if __name__ == "__main__":
    main()
