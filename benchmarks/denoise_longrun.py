"""Long-budget SSDN run on the chip: does the noise estimate leave the
softplus floor and the posterior mean cross the prior mean?

Measured context (benchmarks/_ns_grad.py): the -0.1*noise_std bonus reaches
the sigma net as dL/d(est) ~= -1.8e-3, but per-batch NLL gradient noise is
an order larger, so Adam's drift on est is slow — the crossover regime
needs tens of thousands of iterations, not the 2k gate budget. With the
r5 global-norm clip the trajectory stays stable that long.

Run from the repo root (TPU attached): python benchmarks/denoise_longrun.py
[--iters 50000] [--stage 2500]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.train.denoise import (
        DenoiseDataset, denoise_forward, train_denoise,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50000)
    ap.add_argument("--stage", type=int, default=2500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--mode", default="restarts",
                    choices=("restarts", "global"))
    ap.add_argument("--decay", type=float, default=0.2,
                    help="per-stage peak-LR decay in restarts mode")
    a = ap.parse_args()

    rng = np.random.default_rng(317)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    clean = (np.sin(xx / 8.0) + np.cos(yy / 10.0)).astype(np.float32)
    sigma = 0.8
    noisy = np.stack([
        clean + rng.standard_normal((64, 64)).astype(np.float32) * sigma
        for _ in range(12)
    ])
    cfg = Config(task="denoise", arch="unet_4", lr=a.lr, batch_size=4,
                 dtype="bfloat16").finalize()
    ds = DenoiseDataset({"v": noisy}, crop=32, exclude=0)

    def psnr(x):
        mse = float(np.mean((x - clean[None]) ** 2))
        r = float(clean.max() - clean.min())
        return 10.0 * np.log10(r ** 2 / mse)

    state = models = None
    total = 0
    t0 = time.perf_counter()
    stage_lr = a.lr
    while total < a.iters:
        if a.mode == "global":
            state, models, _ = train_denoise(cfg, ds, num_iters=a.stage,
                                             crop=32, log_fn=lambda *_: None,
                                             state=state, models=models,
                                             it_offset=total,
                                             total_iters=a.iters)
        else:
            # decayed restarts: each stage runs its own short ramp
            # (0.1, 0.3) at a peak LR a.decay x lower than the last —
            # the one shape measured to leave the softplus floor (stage 1
            # at 1e-3: ns 0.65, mu 18.7, pme 17.8); full-LR restarts and
            # long single ramps both diverge mu (denoise_long*.log)
            import dataclasses
            scfg = dataclasses.replace(cfg, lr=stage_lr)
            state, models, _ = train_denoise(scfg, ds, num_iters=a.stage,
                                             crop=32, ramp_up=0.1,
                                             ramp_down=0.3,
                                             log_fn=lambda *_: None,
                                             state=state, models=models)
            stage_lr *= a.decay
        total += a.stage
        mu, pme, _, ns = denoise_forward(
            models, state.params_dn, state.params_sigma,
            jnp.asarray(noisy)[..., None])
        print(f"it {total:>6}: mu {psnr(np.asarray(mu)[..., 0]):7.2f} dB  "
              f"pme {psnr(np.asarray(pme)[..., 0]):7.2f} dB  "
              f"ns {float(np.mean(np.asarray(ns))):.4f} (true {sigma})  "
              f"t {time.perf_counter() - t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
