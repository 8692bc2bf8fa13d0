"""unetw vs parity-arch forward roofline on the real TPU chip.

VERDICT r4 weak #1 / next #1: the parity family is pinned at ~18% MFU by
output-lane fill (16/32-channel convs); the measured sweet spot is 128-wide
(105 TF/s = 53.6% MFU for 128->128 k3). unetw_N (models/detector.
TomoPickNetW) is the TPU-first redesign built to that measurement: output
grid H/4, patchify stem, 128-wide UNet + z-tap head.

This script times the full `hm` forward of unet_4 / unet_5 / unetw_3 on the
bench tile (70 x 512 x 512, bf16) and reports TF/s + MFU from XLA cost
analysis, plus voxel/s — the apples-to-apples throughput number quoted in
PARITY.md next to the flagship F1s.

Run from the repo root (TPU attached): python benchmarks/unetw_roofline.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_BF16_PEAK = 197e12

from _timing import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state

    d, h, w = 70, 512, 512
    vol = np.random.default_rng(0).standard_normal((d, h, w)).astype(np.float32)
    vol_dev = jax.device_put(vol)

    for arch in ("unet_4", "unet_5", "unetw_2", "unetw_3"):
        cfg = Config(task="semi", arch=arch, dtype="bfloat16").finalize()
        model = create_detector(cfg)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0),
            np.zeros((1, 8, 64, 64), np.float32),
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def forward(v, variables=variables, model=model):
            return model.apply(variables, v[None], train=False,
                               active_heads=("hm",))["hm"]

        jfwd = jax.jit(forward)
        comp = jfwd.lower(vol_dev).compile()
        c = comp.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        t = timed(jfwd, vol_dev, reps=10)
        tf = flops / t / 1e12
        vox = d * h * w / t
        print(f"{arch:<8} {t*1e3:8.2f} ms  {tf:7.2f} TF/s "
              f"({100 * tf * 1e12 / V5E_BF16_PEAK:5.1f}% MFU)  "
              f"{vox/1e6:7.1f} M voxel/s  ({flops/1e12:.2f} TFLOP/fwd)",
              flush=True)


if __name__ == "__main__":
    main()
