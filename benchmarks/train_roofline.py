"""Roofline / breakdown of the refinement TRAIN step on the real chip.

The inference forward got the full roofline treatment (roofline.py); this
does the same for training. The refine step's compute is NOT the model
convs — the crops are tiny (bs x 2 x 6 x 64 x 64) — it is the per-sample
debiased contrastive loss over 2N = 24,576 pixel features. Measured verdict
(2026-08, v5e): the loss is HBM-traffic-bound on its (block, 2N)
intermediates, NOT MXU-bound — the gram matmul is ~1.2 ms of MXU work and
the precision knob moves the gradient <2%; fusing the row reductions
(multiply-sum instead of dot, partner recomputed from features) halved the
full step, 221 -> 110 ms at bs=4. See PARITY.md "Training roofline".

Measured components:
  * full train step (contrastive on / off)
  * isolated unbiased_con_loss: value and grad, at HIGHEST / HIGH / DEFAULT
    gram precision (via the module-level knob in train/losses.py)
  * accuracy of each precision vs a float64 CPU golden of the same inputs

Run from the repo root (TPU attached): python benchmarks/train_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence



def make_batch(rng, b=4, p=2, d=6, h=64, w=64):
    hm = np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.001, 1.0, -1.0
                  ).astype(np.float32)
    return {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": hm,
        "flip_prob": rng.random(b).astype(np.float32),
    }


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train import losses as L
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    batch = make_batch(rng)

    batch_dev = None
    for contrastive in (True, False):
        cfg = Config(task="semi", arch="unet_4", contrastive=contrastive,
                     batch_size=4, dtype="bfloat16").finalize()
        model = create_detector(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch["input"].reshape(8, 6, 64, 64))
        step = make_train_step(model, cfg)
        if batch_dev is None:
            batch_dev = jax.device_put(batch)
            np.asarray(batch_dev["flip_prob"])
        t = timed(lambda s, b: step(s, b)[1]["loss"], state, batch_dev)
        print(f"train step (contrastive={contrastive!s:<5}) {t*1e3:8.2f} ms"
              f"  ({4/t:.0f} samples/s)")

    # ---- phase split of the non-contrastive step: forward / grad
    x = jnp.asarray(batch["input"].reshape(8, 6, 64, 64))

    @jax.jit
    def fwd(params, bs, x):
        out, _ = model.apply({"params": params, "batch_stats": bs}, x,
                             train=True, mutable=["batch_stats"])
        return out["hm"].sum()

    t1 = timed(fwd, state.params, state.batch_stats, x)
    g1 = jax.jit(jax.grad(fwd))
    t2 = timed(lambda p, bs, xx: g1(p, bs, xx)["stem"]["kernel"],
               state.params, state.batch_stats, x)
    try:
        cost = jax.jit(jax.grad(fwd)).lower(
            state.params, state.batch_stats, x).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        fl = float(cost.get("flops", 0.0))
        eff = f" ({fl/t2/1e12:.1f} TF/s, {fl/1e9:.0f} GF)"
    except Exception:
        eff = ""
    print(f"one view forward {t1*1e3:8.2f} ms   grad {t2*1e3:8.2f} ms{eff}")

    # ---- isolated contrastive loss: one sample's N = 2*6*32*32 = 12288
    n, c = 12288, 32
    feats = rng.standard_normal((n, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feats_cr = feats + 0.05 * rng.standard_normal((n, c)).astype(np.float32)
    feats_cr /= np.linalg.norm(feats_cr, axis=1, keepdims=True)
    labels = np.where(rng.random(n) < 0.001, 1.0, -1.0).astype(np.float32)
    hm1 = rng.random(n).astype(np.float32)
    hm2 = rng.random(n).astype(np.float32)

    def loss_of(f, fc):
        s, u, _ = L.unbiased_con_loss(labels, hm1, hm2, f, fc)
        return s + 0.1 * u

    g = jax.jit(jax.grad(loss_of, argnums=(0, 1)))
    gram_flops = 2 * (2 * n) ** 2 * c

    for prec in ("highest", "high", "default"):
        L.GRAM_PRECISION = prec
        L.unbiased_con_loss.clear_cache()
        val = float(loss_of(jnp.asarray(feats), jnp.asarray(feats_cr)))
        tv = timed(lambda f, fc: loss_of(f, fc), jnp.asarray(feats),
                   jnp.asarray(feats_cr))
        tg = timed(lambda f, fc: g(f, fc)[0], jnp.asarray(feats),
                   jnp.asarray(feats_cr))
        print(f"con_loss [{prec:<8}] value {tv*1e3:7.2f} ms "
              f"({gram_flops/tv/1e12:5.1f} TF/s eff)  grad {tg*1e3:7.2f} ms"
              f"  loss={val:.8f}")
    L.GRAM_PRECISION = "highest"


if __name__ == "__main__":
    main()
