"""A/B the decode hot path on the real TPU: XLA reduce_window NMS vs the
double-buffered Pallas kernel (ops/pallas_nms.py).

Decides which implementation TomoDetector.process ships (VERDICT r1 #6).
Timing fences use small np.asarray fetches (block_until_ready is a no-op on
this runtime, CLAUDE.md). Run from the repo root on a TPU-attached session:

    python benchmarks/decode_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from cet_pick_tpu.ops.decode import decode_detections

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    results = {"platform": platform}
    for shape in [(128, 256, 256), (256, 256, 256)]:
        logits = rng.standard_normal(shape).astype(np.float32) * 2
        x = jax.device_put(logits)
        np.asarray(x[:1, :1, :1])

        for name, use_pallas in [("xla", False), ("pallas", True)]:
            try:
                dets = decode_detections(x, kernel=3, k=900,
                                         use_pallas=use_pallas)
                np.asarray(dets)  # compile + drain
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    dets = decode_detections(x, kernel=3, k=900,
                                             use_pallas=use_pallas)
                    np.asarray(dets)
                    times.append(time.perf_counter() - t0)
                results[f"{name}_{shape[0]}x{shape[1]}x{shape[2]}_ms"] = round(
                    1e3 * float(np.min(times)), 3)
            except Exception as e:  # pallas may be unsupported off-TPU
                results[f"{name}_{shape[0]}x{shape[1]}x{shape[2]}_ms"] = (
                    f"error: {type(e).__name__}: {e}"[:200])

        # correctness cross-check on device
        try:
            a = np.asarray(decode_detections(x, kernel=3, k=900,
                                             use_pallas=False))
            b = np.asarray(decode_detections(x, kernel=3, k=900,
                                             use_pallas=True))
            results[f"match_{shape[0]}"] = bool(
                np.allclose(np.sort(a[:, 3]), np.sort(b[:, 3]), atol=1e-6))
        except Exception:
            results[f"match_{shape[0]}"] = "n/a"

    print(json.dumps(results))


if __name__ == "__main__":
    main()
