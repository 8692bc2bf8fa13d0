"""Roofline / breakdown of the exploration (SimSiam 2d3d) TRAIN step.

PARITY.md quotes the tutorial-scale step as one number (131 ms at bs=256,
bbox=36); this splits it into its three phases on the real chip:

  * on-device augmentation (two views: flips/rotate/crop/erase/normalize —
    gather + elementwise, VPU/HBM work)
  * model forward+backward (ResNet-18 layers1-3 shared trunk over the
    concatenated 2d/3d batch + MLP heads — the MXU work)
  * the full fused step (augs + grad + SGD update), what the loop runs

plus XLA's FLOP count for the grad, to place the step against the v5e
bf16 peak.

Run from the repo root (TPU attached): python benchmarks/explore_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence

V5E_BF16_PEAK = 197e12



def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.ops.augment import simsiam_augment
    from cet_pick_tpu.train.explore import (
        create_simsiam_state,
        simsiam_step_fn,
    )

    print(f"devices: {jax.devices()}")
    b, bbox = 256, 36
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    print(f"dtype: {dtype}")
    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18", bbox=bbox,
                 batch_size=b, dtype=dtype).finalize()
    model = create_simsiam(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "anchor": rng.standard_normal((b, 2, bbox, bbox)).astype(np.float32),
        "aug": rng.standard_normal((b, 2, bbox, bbox)).astype(np.float32),
        "norm_mean": np.array([0.1, 0.2], np.float32),
        "norm_std": np.array([1.1, 0.9], np.float32),
    }
    state = create_simsiam_state(
        model, cfg, jax.random.PRNGKey(0),
        {k: v[:2] if v.ndim == 4 else v for k, v in batch.items()},
    )
    step = jax.jit(simsiam_step_fn(model, cfg, "2d3d"))
    key = jax.random.PRNGKey(1)

    t_host = timed(lambda s, bt, k: step(s, bt, k)[1]["loss"],
                   state, batch, key)
    print(f"full step, host numpy batch   {t_host*1e3:8.2f} ms "
          f"({b/t_host:.0f} samples/s) — includes the host->device batch "
          f"transfer (5.3 MB; dominated by the tunnel link here, overlapped "
          f"by the prefetcher in the real loop)")

    batch = jax.device_put(batch)
    jax.block_until_ready(batch["anchor"])
    t_full = timed(lambda s, bt, k: step(s, bt, k)[1]["loss"],
                   state, batch, key)
    print(f"full step, device-resident    {t_full*1e3:8.2f} ms "
          f"({b/t_full:.0f} samples/s)")

    # ---- augs only (device-resident inputs)
    @jax.jit
    def augs(bt, k):
        k1, k2 = jax.random.split(k)
        keys1 = jax.random.split(k1, b)
        keys2 = jax.random.split(k2, b)
        m, s = bt["norm_mean"], bt["norm_std"]
        v1 = simsiam_augment(bt["anchor"], keys1, m, s, bbox, strong=True)
        v2 = simsiam_augment(bt["aug"], keys2, m, s, bbox, strong=False)
        return v1, v2

    t_aug = timed(augs, batch, key)
    print(f"augs (two views)     {t_aug*1e3:8.2f} ms")

    # ---- forward+backward only (pre-augmented views)
    v1, v2 = augs(batch, key)
    v1 = jax.block_until_ready(v1)

    def loss_fn(params, batch_stats, v1, v2):
        (ret1, ret2), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            v1[:, 0, :, :, None], v1[:, 1, :, :, None],
            v2[:, 0, :, :, None], v2[:, 1, :, :, None],
            train=True, mutable=["batch_stats"],
        )
        from cet_pick_tpu.train.losses import simsiam_loss

        loss, _ = simsiam_loss(ret1["pred"], ret1["proj"],
                               ret2["pred"], ret2["proj"])
        return loss

    g = jax.jit(jax.grad(loss_fn))
    t_grad = timed(lambda p, bs, a, c: g(p, bs, a, c)["trunk"]["conv1"]["kernel"],
                   state.params, state.batch_stats, v1, v2)
    print(f"model grad           {t_grad*1e3:8.2f} ms")

    try:
        cost = jax.jit(jax.grad(loss_fn)).lower(
            state.params, state.batch_stats, v1, v2).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        print(f"grad FLOPs {flops/1e9:.1f} G -> {flops/t_grad/1e12:.1f} TF/s "
              f"({100*flops/t_grad/V5E_BF16_PEAK:.1f}% MFU) in the grad phase")
    except Exception as e:
        print(f"cost analysis unavailable: {e}")


if __name__ == "__main__":
    main()
