"""Train-step timings for the remaining task families on the real chip.

PARITY.md carries deep rooflines for the two flagship loops (refine:
train_roofline.py, explore: explore_roofline.py); this one-pager times the
other trainers' jitted steps at tutorial-like shapes so every task family
has a measured number. Batches are device-resident (host transfer is the
prefetcher's job and, through the axon tunnel, would measure the link).

Covered: tomo / cr (supervised), tcla (classify), fs (fewshot), denoise,
moco (rec-only 2d mode). semiclass shares the refine step bit-for-bit
(train/semiclass.py) and scan-finetune's cost is the SimSiam trunk grad
(explore_roofline.py), so neither is re-timed.

Run from the repo root (TPU attached): python benchmarks/task_steps_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence



def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- supervised tomo / cr: paired crops like refine (bs 4, 2x6x64x64)
    from cet_pick_tpu.train.supervised import make_supervised_train_step

    b, p, d, h, w = 4, 2, 6, 64, 64
    batch = {
        "input": jnp.asarray(
            rng.standard_normal((b, p, d, h, w)), jnp.float32),
        "hm": jnp.asarray(
            (rng.random((b, p, d, h // 2, w // 2)) < 0.01), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    for task in ("tomo", "cr"):
        cfg = Config(task=task, arch="unet_4", contrastive=True,
                     batch_size=b, dtype="bfloat16").finalize()
        model = create_detector(cfg)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0),
            np.asarray(batch["input"]).reshape(b * p, d, h, w))
        step = make_supervised_train_step(model, cfg, task)
        t = timed(lambda s, bt, k: step(s, bt, k)[1]["loss"],
                  state, batch, key)
        print(f"{task:<10} step {t*1e3:8.2f} ms  ({b/t:.0f} samples/s)")

    # ---- tcla: BCE classifier over the same crop geometry
    from cet_pick_tpu.train.classify import make_classify_train_step

    cfg = Config(task="tcla", arch="unet_4", batch_size=b,
                 dtype="bfloat16").finalize()
    model = create_detector(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        np.asarray(batch["input"]).reshape(b * p, d, h, w))
    step = make_classify_train_step(model, cfg)
    cbatch = dict(batch)
    t = timed(lambda s, bt: step(s, bt)[1]["loss"], state, cbatch)
    print(f"{'tcla':<10} step {t*1e3:8.2f} ms  ({b/t:.0f} samples/s)")

    # ---- fs: fewshot crops (bs 2, 16x128x128 crop_xy like the CLI default)
    from cet_pick_tpu.train.fewshot import (
        init_fewshot_centers,
        make_fewshot_train_step,
    )

    cfg = Config(task="fs", arch="unet_4", batch_size=2,
                 dtype="bfloat16").finalize()
    model = create_detector(cfg)
    fb, fd, fh, fw = 2, 16, 128, 128
    fbatch = {
        "input": jnp.asarray(
            rng.standard_normal((fb, fd, fh, fw)), jnp.float32),
        "lb_map": jnp.asarray(
            rng.integers(0, 3, (fb, fd, fh // 2, fw // 2)), jnp.int32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               np.asarray(fbatch["input"]))
    centers = init_fewshot_centers(model, state, fbatch, n_clusters=3)
    step = make_fewshot_train_step(model, cfg)
    t = timed(lambda s, bt, c: step(s, bt, c)[2]["loss"],
              state, fbatch, centers)
    print(f"{'fs':<10} step {t*1e3:8.2f} ms  ({fb/t:.0f} crops/s)")

    # ---- denoise: 128^2 slice crops at bs 16
    from cet_pick_tpu.train.denoise import (
        create_denoise_state,
        make_denoise_train_step,
    )

    cfg = Config(task="denoise", arch="denoise", batch_size=16).finalize()
    dstate, models = create_denoise_state(cfg, jax.random.PRNGKey(0), crop=128)
    dstep = make_denoise_train_step(models)
    noisy = jnp.asarray(rng.standard_normal((16, 128, 128, 1)), jnp.float32)
    t = timed(lambda s, x: dstep(s, x)[1]["loss"], dstate, noisy)
    print(f"{'denoise':<10} step {t*1e3:8.2f} ms  ({16/t:.0f} slices/s)")

    # ---- moco (rec-only 2d mode), bs 256, bbox 36
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.moco import create_moco_state, make_moco_train_step

    cfg = Config(task="moco", arch="simsiam2d_18", bbox=36, batch_size=256,
                 dtype="bfloat16").finalize()
    model = create_simsiam(cfg)
    mbatch = {
        "anchor": jnp.asarray(
            rng.standard_normal((256, 1, 36, 36)), jnp.float32),
        "aug": jnp.asarray(
            rng.standard_normal((256, 1, 36, 36)), jnp.float32),
        "norm_mean": jnp.asarray([0.1], jnp.float32),
        "norm_std": jnp.asarray([1.1], jnp.float32),
    }
    mstate = create_moco_state(model, cfg, jax.random.PRNGKey(0), mbatch)
    mstep = make_moco_train_step(model, cfg, "2d")
    t = timed(lambda s, bt, k: mstep(s, bt, k)[1]["loss"],
              mstate, mbatch, key)
    print(f"{'moco':<10} step {t*1e3:8.2f} ms  ({256/t:.0f} samples/s)")

    # ---- vol (3D-subvolume) exploration: simsiam + moco over Conv3D crops,
    # bs 128, vol_size (8, 64, 64) — the reference moco_main.py geometry
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, make_simsiam_train_step,
    )

    for dt in ("float32", "bfloat16"):
        cfg = Config(task="simsiam", arch="simsiam_18", batch_size=128,
                     vol_size=(8, 64, 64), head_conv=128,
                     dtype=dt).finalize()
        model = create_simsiam(cfg)
        vbatch = {
            "anchor": jnp.asarray(
                rng.standard_normal((128, 8, 64, 64)), jnp.float32),
            "aug": jnp.asarray(
                rng.standard_normal((128, 8, 64, 64)), jnp.float32),
            "norm_mean": jnp.asarray([0.0], jnp.float32),
            "norm_std": jnp.asarray([1.0], jnp.float32),
        }
        vstate = create_simsiam_state(model, cfg, jax.random.PRNGKey(0),
                                      vbatch)
        vstep = make_simsiam_train_step(model, cfg, "vol")
        t = timed(lambda s, bt, k: vstep(s, bt, k)[1]["loss"],
                  vstate, vbatch, key)
        print(f"{'vol-' + dt[:4]:<10} step {t*1e3:8.2f} ms  "
              f"({128/t:.0f} subvols/s)")

        cfg_m = Config(task="simsiam", arch="moco3d_18", batch_size=128,
                       vol_size=(8, 64, 64), head_conv=128,
                       dtype=dt).finalize()
        model_m = create_simsiam(cfg_m)
        mvstate = create_moco_state(model_m, cfg_m, jax.random.PRNGKey(0),
                                    vbatch)
        mvstep = make_moco_train_step(model_m, cfg_m, "vol")
        t = timed(lambda s, bt, k: mvstep(s, bt, k)[1]["loss"],
                  mvstate, vbatch, key)
        print(f"{'mocovol-' + dt[:4]:<10} step {t*1e3:6.2f} ms  "
              f"({128/t:.0f} subvols/s)")


if __name__ == "__main__":
    main()
