"""A/B of per-step metric fetching in the train loops: the eager
``{k: float(v) ...}`` pattern (K blocking device->host round trips per step,
pipeline stalled) vs train/metrics.LaggedMetrics (one stacked transfer,
fetched one step late so it hides behind the next step's compute).

Measures the WHOLE host loop wall clock over N steps of the real refine
train step on a device-resident batch — exactly what an epoch pays, minus
data loading (which prefetch already hides).

Run from the repo root (TPU attached): python benchmarks/metrics_drain_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def loop_eager(step, state, batch, n):
    for _ in range(n):
        state, metrics = step(state, batch)
        _ = {k: float(v) for k, v in metrics.items()}
    return state


def loop_lagged(step, state, batch, n):
    from cet_pick_tpu.train.metrics import LaggedMetrics

    drain = LaggedMetrics()
    for _ in range(n):
        state, metrics = step(state, batch)
        drain.push(metrics)
    drain.pop()
    return state


def main():
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state
    from train_roofline import make_batch

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    batch = jax.device_put(make_batch(rng))
    np.asarray(batch["flip_prob"])  # land the transfer

    cfg = Config(task="semi", arch="unet_4", contrastive=True,
                 batch_size=4, dtype="bfloat16").finalize()
    model = create_detector(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               np.asarray(batch["input"]).reshape(8, 6, 64, 64))
    step = make_train_step(model, cfg)

    n = 30
    for name, loop in (("eager per-key float()", loop_eager),
                       ("lagged single-transfer", loop_lagged)):
        loop(step, state, batch, 3)  # compile + warm the dispatch path
        t0 = time.perf_counter()
        loop(step, state, batch, n)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:26s} {dt * 1e3:7.2f} ms/step  "
              f"({1 / dt * cfg.batch_size:6.1f} samples/s)")


if __name__ == "__main__":
    main()
