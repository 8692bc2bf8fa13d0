"""Roofline for the SSDN denoise train step (the slowest per-task step in
task_steps_bench.py: 77.9 ms at bs 16 x 128^2 on v5e).

Decomposes the step into its three device phases and positions each against
the v5e ridge (197 TF/s bf16 peak, ~98 TF/s f32-ish via bf16x3; 819 GB/s
HBM), the same methodology as benchmarks/roofline.py:

- blindspot forward: the 4-rotation batch (bs*4 = 64) through the shifted
  UNet (48/96-channel convs — better lane fill than the picker's 16/32)
- sigma forward: the plain N2N UNet (bs = 16)
- full value_and_grad step

Run from the repo root (TPU attached):
    python benchmarks/denoise_roofline.py [bfloat16]
(the optional arg sets the conv compute dtype — the --dtype flag's A/B)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed


def cost(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    byts = float(c.get("bytes accessed", 0.0))
    return flops, byts


def report(name, t, flops, byts):
    tf = flops / t / 1e12
    gb = byts / t / 1e9
    inten = flops / max(byts, 1.0)
    print(f"{name:28s} {t * 1e3:8.2f} ms  {tf:6.1f} TF/s "
          f"({tf / 1.97:5.1f}% of bf16 peak)  {gb:6.0f} GB/s  "
          f"I={inten:6.1f} FLOP/B")


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.train.denoise import (
        create_denoise_state, denoise_forward, make_denoise_train_step,
    )

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b, hw = 16, 128
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    print(f"compute dtype: {dtype}")
    cfg = Config(task="denoise", batch_size=b, dtype=dtype).finalize()
    state, models = create_denoise_state(cfg, jax.random.PRNGKey(0), crop=hw)
    noisy = jnp.asarray(rng.standard_normal((b, hw, hw, 1)), jnp.float32)

    def blind_fwd(params, x):
        return models["denoise"].apply({"params": params}, x)

    def sigma_fwd(params, x):
        return models["sigma"].apply({"params": params}, x)

    bf = jax.jit(blind_fwd)
    sf = jax.jit(sigma_fwd)
    t = timed(bf, state.params_dn, noisy)
    report("blindspot fwd (4-rot batch)", t, *cost(blind_fwd,
                                                   state.params_dn, noisy))
    t = timed(sf, state.params_sigma, noisy)
    report("sigma fwd", t, *cost(sigma_fwd, state.params_sigma, noisy))

    step = make_denoise_train_step(models)
    t = timed(lambda s, x: step(s, x)[1]["loss"], state, noisy)

    def whole(params_dn, params_sigma, x):
        def loss(ps):
            mu, pme, sigma_y, ns = denoise_forward(models, ps[0], ps[1], x)
            li = (x - mu) ** 2 / sigma_y + jnp.log(sigma_y)
            return jnp.mean(li) - 0.1 * jnp.mean(ns)

        return jax.value_and_grad(loss)((params_dn, params_sigma))

    fl, by = cost(whole, state.params_dn, state.params_sigma, noisy)
    report("full train step", t, fl, by)
    print(f"-> {b / t:.0f} crops/s at bs {b} x {hw}^2")


if __name__ == "__main__":
    main()
