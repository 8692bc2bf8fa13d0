import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from cet_pick_tpu.config import Config
from cet_pick_tpu.train.denoise import (DenoiseDataset, create_denoise_state,
    make_denoise_train_step, denoise_forward, compute_ramped_lrate)
from cet_pick_tpu.train.state import set_learning_rate

rng = np.random.default_rng(317)
yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
clean = (np.sin(xx / 8.0) + np.cos(yy / 10.0)).astype(np.float32)
noisy = np.stack([clean + rng.standard_normal((64, 64)).astype(np.float32) * 0.8
                  for _ in range(12)])
cfg = Config(task="denoise", arch="unet_4", lr=1e-3, batch_size=4).finalize()
ds = DenoiseDataset({"v": noisy}, crop=32, exclude=0)
state, models = create_denoise_state(cfg, jax.random.PRNGKey(cfg.seed), crop=32)
step = jax.jit(make_denoise_train_step(models))
nr = np.random.default_rng(0)
N = 1500
for it in range(N):
    lr = compute_ramped_lrate(it, N, 0.1, 0.3, cfg.lr)
    state = set_learning_rate(state, lr)
    batch = ds.sample_batch(nr, cfg.batch_size)
    state, m = step(state, batch)
    if it % 300 == 0 or it == N-1:
        mu, pme, sy, ns = denoise_forward(models, state.params_dn,
                                          state.params_sigma,
                                          jnp.asarray(noisy)[..., None])
        err2 = float(np.mean((np.asarray(noisy)[...,None]-np.asarray(mu))**2))
        print(f"it {it}: loss {float(m['loss']):.4f} ns {float(np.mean(np.asarray(ns))):.5f} "
              f"sy {float(np.mean(np.asarray(sy))):.4f} err2 {err2:.4f}", flush=True)
