"""Benchmark the decode hot path (fused sigmoid + NMS + top-K) on device.

Historical A/B (VERDICT r1 #6, real v5e, 2026-08): the XLA reduce_window
path beat a hand-written double-buffered Pallas sigmoid+NMS kernel —
39.2 ms vs 40.8 ms on 128x256x256 with bit-identical outputs — because the
op is HBM-bandwidth-bound and XLA already fuses sigmoid + reduce_window +
compare + top-K into one pass. The losing kernel was deleted (the verdict
is recorded in ops/decode.py's docstring); this script now times the
shipping XLA path so the number can be re-checked on new runtimes.

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

        dets = decode_detections(x, kernel=3, k=900)
        np.asarray(dets)  # compile + drain
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            dets = decode_detections(x, kernel=3, k=900)
            np.asarray(dets)
            times.append(time.perf_counter() - t0)
        results[f"xla_{shape[0]}x{shape[1]}x{shape[2]}_ms"] = round(
            1e3 * float(np.min(times)), 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
