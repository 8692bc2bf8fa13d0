"""Sweep the fused-inference z-tile size on the real TPU.

The shifted-window tiled forward (infer/tiled.py) pays a halo recompute per
tile; larger tiles amortize it but grow the activation working set. This
times the device-resident forward+decode for several tile_z values on the
bench volume and prints one JSON line per point.

Run from the repo root on a TPU-attached session:

    python benchmarks/tile_sweep.py

Measured 2026-08-16 on v5e (256x512x512 bf16 unet_4): 32 -> 0.288 s,
64 -> 0.307 s, 128 -> 0.293 s, 256 (untiled) -> 0.278 s. Spread is within
run-to-run noise (~5%), so the halo recompute is already negligible at the
default tile_z=64, which keeps the activation working set small enough for
volumes much deeper than the tutorial's 256.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.io.loader import preprocess_quantized
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state

    D, H, W = 256, 512, 512
    config = Config(task="semi", arch="unet_4", K=900, nms=3,
                    dtype="bfloat16").finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0), np.zeros((1, 8, 64, 64), np.float32)
    )
    rng = np.random.default_rng(0)
    vol, lo, hi = preprocess_quantized(
        rng.standard_normal((D, H, W)).astype(np.float32)
    )
    v_dev = jax.device_put(vol)
    np.asarray(v_dev[:1, :1, :1])

    print(json.dumps({"platform": jax.devices()[0].platform}))
    for tile_z in (32, 64, 128, 256):
        det = TomoDetector(config, params=state.params,
                           batch_stats=state.batch_stats, tile_z=tile_z)
        try:
            hm, dets = det.process(v_dev, lo, hi)   # compile
            np.asarray(dets)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                hm, dets = det.process(v_dev, lo, hi)
                np.asarray(dets)
                times.append(time.perf_counter() - t0)
            t = float(np.min(times))
            print(json.dumps({
                "tile_z": tile_z, "s": round(t, 3),
                "voxels_per_s": round(D * H * W / t, 1),
            }))
        except Exception as e:  # OOM at large tiles is an expected outcome
            print(json.dumps({"tile_z": tile_z, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
