import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from cet_pick_tpu.config import Config
from cet_pick_tpu.train.denoise import (DenoiseDataset, create_denoise_state,
    make_denoise_train_step, compute_ramped_lrate)
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
for it in range(500):
    state = set_learning_rate(state, compute_ramped_lrate(it, 2000, 0.1, 0.3, cfg.lr))
    state, m = step(state, ds.sample_batch(nr, cfg.batch_size))

# gradient of the loss wrt a scalar offset on est
def loss_with_offset(off, noisy_b, pd, psig):
    net_out = models["denoise"].apply({"params": pd}, noisy_b)
    est = models["sigma"].apply({"params": psig}, noisy_b)
    est = jnp.mean(est, axis=(1, 2), keepdims=True) + off
    ns_map = jax.nn.softplus(est - 4.0) + 1e-3
    mu = net_out[..., 0:1]; sx = net_out[..., 1:2] ** 2
    sy = sx + ns_map ** 2
    li = (noisy_b - mu) ** 2 / sy + jnp.log(sy)
    ps = li.reshape(li.shape[0], -1).mean(1)
    ns = ns_map.reshape(ns_map.shape[0], -1).mean(1)
    return jnp.mean(ps - 0.1 * ns)

b = jnp.asarray(ds.sample_batch(nr, 8))
g = jax.grad(loss_with_offset)(0.0, b, state.params_dn, state.params_sigma)
est = models["sigma"].apply({"params": state.params_sigma}, b)
print("after 500 iters: mean est", float(jnp.mean(est)),
      "ns", float(jnp.mean(jax.nn.softplus(jnp.mean(est,axis=(1,2))-4.0)+1e-3)),
      "dL/d(est offset)", float(g))
