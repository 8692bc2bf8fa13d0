"""Profile the debiased-contrastive gram forward+backward on the real TPU.

Round-2 follow-up to the block-size study that picked block=1024 for the
FORWARD pass: the train step differentiates through `_row_stats_blocked`
(lax.map over row blocks), and the backward's rematerialized block grams can
prefer a different block size. This sweeps (rows N, block) over
value_and_grad of `unbiased_con_loss` and prints one JSON line per cell.

Run from the repo root on a TPU-attached session:

    python benchmarks/gram_profile.py

Measured 2026-08-16 on v5e (fwd+bwd, C=16):
* WITHOUT remat of the block body, the lax.map backward saves every block's
  (block, 2N) exp-matrix: at 2N=131k that is a 64 GB f32 allocation -> OOM.
  With jax.checkpoint on the block (now the default in
  losses._row_stats_blocked) 65k rows run in ~0.81 s at any block size,
  and 16k rows got FASTER (70 ms vs 76 ms) because the backward streams
  instead of spilling.
* block sweep after remat: 4k rows ~31-36 ms (noise), 16k rows best at
  block=256 (70 ms vs 84 ms @1024), 65k rows flat (~0.81 s). Default block
  stays 1024 for fwd-only callers; the train step's regime (4k-16k rows per
  sample) is insensitive within ~15%.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import unbiased_con_loss

    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform}))
    rng = np.random.default_rng(0)
    c = 16  # feature channels, matching the detector's contrastive head

    for n in (4096, 16384, 65536):
        labels = np.where(rng.random(n) < 0.01, 1.0, -1.0).astype(np.float32)
        labels[:8] = 1.0
        hm = rng.random(n).astype(np.float32)
        hm_cr = rng.random(n).astype(np.float32)
        f = rng.standard_normal((n, c)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        f_cr = rng.standard_normal((n, c)).astype(np.float32)
        f_cr /= np.linalg.norm(f_cr, axis=1, keepdims=True)

        args = tuple(jnp.asarray(a) for a in (labels, hm, hm_cr, f, f_cr))

        for block in (256, 512, 1024, 2048):
            if block > 2 * n:
                continue

            def loss_of_feats(ff, ff_cr):
                sup, unsup, _ = unbiased_con_loss(
                    args[0], args[1], args[2], ff, ff_cr, block=block
                )
                return sup + 0.1 * unsup

            grad_fn = jax.jit(jax.value_and_grad(loss_of_feats, argnums=(0, 1)))

            # warmup/compile
            val, grads = grad_fn(args[3], args[4])
            np.asarray(grads[0][:1])

            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                val, grads = grad_fn(args[3], args[4])
                np.asarray(grads[0][:1, :1])  # fence (block_until_ready no-op)
                times.append(time.perf_counter() - t0)
            t = float(np.min(times))
            # gram fwd+bwd is ~3 matmuls of (2N)^2 * C
            flops = 3 * 2 * (2 * n) ** 2 * c
            print(json.dumps({
                "rows": n, "block": block, "ms": round(t * 1e3, 2),
                "gram_tflops": round(flops / t / 1e12, 2),
                "loss": float(val),
            }))


if __name__ == "__main__":
    main()
