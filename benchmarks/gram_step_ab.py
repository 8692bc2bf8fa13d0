"""Step-level A/B of the Pallas flash-gram wiring: the full refine train
step (vmapped per-sample contrastive, remat, Adam) with CET_PALLAS_GRAM on
vs off, on the real chip. This is the integration check for the kernel's
vmap/custom_vjp composition — ops-level numbers live in gram_ab.py.

Run from the repo root (TPU attached): python benchmarks/gram_step_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train import losses as L
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state
    from train_roofline import make_batch

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    batch_dev = jax.device_put(batch)
    np.asarray(batch_dev["flip_prob"])

    for label, kw in (("semi (PU + debiased)", {}),
                      ("semi --pn (supcon)", {"pn": True})):
        cfg = Config(task="semi", arch="unet_4", contrastive=True,
                     batch_size=4, dtype="bfloat16", **kw).finalize()
        model = create_detector(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch["input"].reshape(8, 6, 64, 64))
        pn_batch = dict(batch_dev)
        if kw.get("pn"):
            # pn mode needs 0/1 labels (no -1 unlabeled voxels)
            pn_batch["hm"] = jnp.maximum(batch_dev["hm"], 0.0)
        print(f"-- {label}")
        results = {}
        for mode in ("0", "1"):
            L.PALLAS_GRAM = mode
            L.unbiased_con_loss.clear_cache()
            L.supcon_loss.clear_cache()
            step = make_train_step(model, cfg)
            try:
                loss = float(step(state, pn_batch)[1]["loss"])
                t = timed(lambda s, b: step(s, b)[1]["loss"], state, pn_batch)
                results[mode] = (t, loss)
                name = "pallas" if mode == "1" else "xla   "
                print(f"{name} step {t*1e3:8.2f} ms  ({4/t:.0f} samples/s)  "
                      f"loss={loss:.6f}")
            except Exception as e:
                print(f"mode={mode} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}")
        L.PALLAS_GRAM = "auto"
        if len(results) == 2:
            dv = abs(results["1"][1] - results["0"][1]) / max(
                abs(results["0"][1]), 1e-9)
            print(f"speedup {results['0'][0]/results['1'][0]:.2f}x   "
                  f"loss rel diff {dv:.2e}")

    # ---- cr (supervised single-view supcon, train/supervised.py)
    from cet_pick_tpu.train.supervised import make_supervised_train_step

    cfg = Config(task="cr", arch="unet_4", contrastive=True, pn=True,
                 batch_size=4, dtype="bfloat16").finalize()
    model = create_detector(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch["input"].reshape(8, 6, 64, 64))
    cr_batch = {"input": batch_dev["input"],
                "hm": jnp.maximum(batch_dev["hm"], 0.0)}
    key = jax.random.PRNGKey(3)
    print("-- cr (supcon_v2)")
    results = {}
    for mode in ("0", "1"):
        L.PALLAS_GRAM = mode
        step = make_supervised_train_step(model, cfg, "cr")
        try:
            loss = float(step(state, cr_batch, key)[1]["loss"])
            t = timed(lambda s, b, k: step(s, b, k)[1]["loss"],
                      state, cr_batch, key)
            results[mode] = (t, loss)
            name = "pallas" if mode == "1" else "xla   "
            print(f"{name} step {t*1e3:8.2f} ms  ({4/t:.0f} samples/s)  "
                  f"loss={loss:.6f}")
        except Exception as e:
            print(f"mode={mode} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}")
    L.PALLAS_GRAM = "auto"
    if len(results) == 2:
        dv = abs(results["1"][1] - results["0"][1]) / max(
            abs(results["0"][1]), 1e-9)
        print(f"speedup {results['0'][0]/results['1'][0]:.2f}x   "
              f"loss rel diff {dv:.2e}")


if __name__ == "__main__":
    main()
