"""Self-supervised denoise training (SSDN gaussian noise model).

Rebuild of reference trains/base_trainer.py:21-57 (``ModelWithLossDenoise``),
trains/tomo_denoise_trainer.py:57-84 (``TomoDenoiseLoss``), and the ramped
learning rate of utils/utils.py:31-56:

* sigma net -> spatial-mean noise estimate -> softplus(est - 4) + 1e-3 = std
  (base_trainer.py:38-42)
* denoise net -> (mu_x, A); sigma_x = A^2; sigma_y = sigma_x + noise_std^2
* loss = mean[(noisy - mu)^2 / sigma_y + log sigma_y] - 0.1 * noise_std
  (tomo_denoise_trainer.py:57-76)
* posterior-mean denoised output
  pme = (noisy * sigma_x + mu * sigma_n) / (sigma_x + sigma_n)
  (base_trainer.py:50)
* LR ramp: cosine ramp-up over the first fraction of total iterations and
  cosine^2 ramp-down over the last (compute_ramped_lrate, utils.py:31-50)

The dataset is slice-based: random crops (multiples of 32 for the 5-level
UNet) from tomogram z-slices, excluding a border margin
(datasets/tomo_denoise.py:50-51 RandomCropNoBorder(128, exclude=200)).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from cet_pick_tpu.models.denoise import create_denoise_models


class DenoiseState(struct.PyTreeNode):
    step: int
    params_dn: Any
    params_sigma: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def compute_ramped_lrate(i, iteration_count, ramp_up_fraction,
                         ramp_down_fraction, learning_rate):
    """utils/utils.py:31-50 verbatim math."""
    if ramp_up_fraction > 0.0:
        ramp_up_end = iteration_count * ramp_up_fraction
        if i <= ramp_up_end:
            t = (i / ramp_up_fraction) / iteration_count
            learning_rate = learning_rate * (0.5 - np.cos(t * np.pi) / 2)
    if ramp_down_fraction > 0.0:
        ramp_down_start = iteration_count * (1 - ramp_down_fraction)
        if i >= ramp_down_start:
            t = ((i - ramp_down_start) / ramp_down_fraction) / iteration_count
            learning_rate = learning_rate * (0.5 + np.cos(t * np.pi) / 2) ** 2
    return learning_rate


def create_denoise_state(config, rng, crop=128, lr=None):
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        getattr(config, "dtype", "float32")
    ]
    models = create_denoise_models(dtype=dtype)
    x = jnp.zeros((1, crop, crop, 1), jnp.float32)
    k1, k2 = jax.random.split(rng)
    params_dn = models["denoise"].init(k1, x)["params"]
    params_sigma = models["sigma"].init(k2, x)["params"]

    # global-norm gradient clip ahead of Adam: the SSDN NLL's 1/sigma_y
    # scaling makes mu/A gradients explode whenever sigma_y underestimates
    # a batch's residual (measured: mu diverged to -208 dB PSNR mid-run at
    # iter ~900 on CPU AND on the chip's staged gate, from a healthy
    # 18.5 dB at iter 600 — benchmarks/_ns_debug.py). The clip bounds the
    # update without touching the objective; typical healthy grad norms on
    # the gate fixture are O(0.1-1), so 5.0 only catches blowups.
    def _tx(learning_rate):
        return optax.chain(optax.clip_by_global_norm(5.0),
                           optax.adam(learning_rate))

    tx = optax.inject_hyperparams(_tx)(
        learning_rate=lr if lr is not None else config.lr
    )
    return DenoiseState(
        step=0, params_dn=params_dn, params_sigma=params_sigma,
        opt_state=tx.init({"dn": params_dn, "sigma": params_sigma}), tx=tx,
    ), models


def denoise_forward(models, params_dn, params_sigma, noisy):
    """Noise model forward; returns (mu, pme, sigma_y, noise_std)
    (base_trainer.py:27-57)."""
    net_out = models["denoise"].apply({"params": params_dn}, noisy)
    est = models["sigma"].apply({"params": params_sigma}, noisy)
    est = jnp.mean(est, axis=(1, 2), keepdims=True)
    noise_std = jax.nn.softplus(est - 4.0) + 1e-3
    # Straight-through cap: the SSDN objective's -0.1*noise_std term is
    # unbounded below once noise_std exceeds ~2/0.1 = 20, where
    # d(log sigma_y)/d(ns) < 0.1 — Adam can jump the estimate past that
    # restoring regime and diverge (the reference avoids this only via long
    # low-lr ramps). The cap clips the VALUE but passes the gradient through
    # at full strength, so (a) below the cap the math is EXACTLY the
    # reference's (the r3 rational saturation ns*c/(ns+c) warped every
    # in-range value, e.g. 0.8 -> 0.76), and (b) at the cap the data term's
    # downward pull isn't attenuated — the rational cap multiplied it by
    # (c/(ns+c))^2, which froze TPU trajectories that overshot early in the
    # ns=cap basin permanently (measured on the device quality gate; the
    # same run on CPU never overshoots and converges to ns ~ 0).
    cap = 16.0
    noise_std = noise_std - jax.lax.stop_gradient(
        noise_std - jnp.minimum(noise_std, cap)
    )
    mu = net_out[..., 0:1]
    a_c = net_out[..., 1:2]
    sigma_x = a_c ** 2
    sigma_n = noise_std ** 2
    sigma_y = sigma_x + sigma_n
    pme = (noisy * sigma_x + mu * sigma_n) / (sigma_x + sigma_n)
    return mu, pme, sigma_y, noise_std


def make_denoise_train_step(models):
    def loss_fn(params, noisy):
        mu, pme, sigma_y, noise_std = denoise_forward(
            models, params["dn"], params["sigma"], noisy
        )
        loss_img = (noisy - mu) ** 2 / sigma_y + jnp.log(sigma_y)
        per_sample = loss_img.reshape(loss_img.shape[0], -1).mean(axis=1)
        ns = noise_std.reshape(noise_std.shape[0], -1).mean(axis=1)
        loss = jnp.mean(per_sample - 0.1 * ns)
        return loss, {"loss": loss, "noise_std": jnp.mean(ns)}

    @jax.jit
    def step(state: DenoiseState, noisy):
        params = {"dn": state.params_dn, "sigma": state.params_sigma}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(params, noisy)
        updates, new_opt = state.tx.update(grads, state.opt_state, params)
        new = optax.apply_updates(params, updates)
        return state.replace(
            step=state.step + 1, params_dn=new["dn"], params_sigma=new["sigma"],
            opt_state=new_opt,
        ), metrics

    return step


class DenoiseDataset:
    """Random slice crops from tomograms (datasets/tomo_denoise.py)."""

    def __init__(self, images: dict, crop=128, exclude=200):
        # exclude: border band (reconstruction artifacts) crops never touch
        # — the reference's RandomCropNoBorder(128, exclude=200)
        # (tomo_denoise.py:51); clamped per-slice in sample_batch so small
        # volumes still train. Was 40 — crops were drawn from border bands
        # the reference deliberately excludes.
        self.slices = []
        for vol in images.values():
            for z in range(vol.shape[0]):
                if vol.shape[1] < crop or vol.shape[2] < crop:
                    raise ValueError(
                        f"tomogram slices ({vol.shape[1]}x{vol.shape[2]}) are "
                        f"smaller than the denoise crop {crop}; pass a "
                        f"smaller --crop"
                    )
                self.slices.append(vol[z])
        self.crop = crop
        self.exclude = exclude

    def __len__(self):
        return len(self.slices)

    def sample_batch(self, rng: np.random.Generator, batch_size):
        out = []
        for _ in range(batch_size):
            s = self.slices[int(rng.integers(len(self.slices)))]
            h, w = s.shape
            ex = min(self.exclude, (min(h, w) - self.crop) // 2)
            ex = max(ex, 0)
            y0 = int(rng.integers(ex, h - self.crop - ex + 1))
            x0 = int(rng.integers(ex, w - self.crop - ex + 1))
            patch = s[y0 : y0 + self.crop, x0 : x0 + self.crop]
            if rng.random() < 0.5:
                patch = patch[:, ::-1]
            out.append(patch.astype(np.float32))
        return np.stack(out)[..., None]  # (B, crop, crop, 1)


def train_denoise(config, dataset, num_iters=200, crop=128,
                  ramp_up=0.2, ramp_down=0.7, log_every=50, log_fn=print,
                  state=None, models=None, it_offset=0, total_iters=None):
    """Iteration-based denoise training with ramped LR
    (base_trainer.py:345-444 run_epoch_denoise).

    Pass a previous run's (state, models) plus ``it_offset``/``total_iters``
    to EXTEND training under ONE global LR schedule — used by the on-chip
    posterior-convergence gate (benchmarks/quality_tpu.py). A warm RESTART
    (omitting it_offset) is destructive here: the sigma net's noise
    estimate only accumulates during low-LR phases (its useful gradient is
    the small steady -0.1*noise_std drift under much larger per-batch NLL
    noise), and a fresh high-LR ramp wipes it back to the softplus floor
    (measured on chip: ns 0.6466 after one annealed stage, 0.0010 after
    the next restart — benchmarks/denoise_longrun.py).

    Ramp defaults (0.2, 0.7) are the reference's own denoise constants
    (base_trainer.py:376 adjust_lr_denoise(..., 0.2, 0.7, ...)): only
    ~10% of the schedule sits at peak LR. The earlier (0.1, 0.3) spent
    60% at peak, where the NLL's 1/sigma_y gradients eventually diverge
    mu even under the global-norm clip (measured at iters ~900-5000)."""
    rng = np.random.default_rng(config.seed + it_offset)
    if total_iters is None:
        total_iters = it_offset + num_iters
    if state is None or models is None:
        state, models = create_denoise_state(
            config, jax.random.PRNGKey(config.seed), crop=crop)
    from cet_pick_tpu.parallel.mesh import auto_dp_step

    # DP over the mesh like every other loop: the SSDN loss is per-crop
    # (the sigma estimate averages within each sample), so crops shard
    step, place_state, place_batch, _ = auto_dp_step(
        config, make_denoise_train_step(models), log_fn=log_fn
    )
    state = place_state(state)
    history = []
    from cet_pick_tpu.train.state import (
        AsyncCheckpointer, set_learning_rate,
    )

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    # crop sampling + host->device transfer of batch i+1 hide behind step i
    batches = (dataset.sample_batch(rng, config.batch_size)
               for _ in range(num_iters))
    # lagged single-transfer metric fetch (train/metrics.py); entries are
    # labeled by their own iteration (len(history)), so log lines and
    # --save_all snapshots keep their meaning, emitted one step later
    from cet_pick_tpu.train.metrics import LaggedMetrics

    drain = LaggedMetrics()

    def _collect(m):
        if m is None:
            return
        history.append(m)
        n = len(history)
        if n % log_every == 0:
            log_fn(f"iter {n}: " + " ".join(
                f"{k}={v:.5f}" for k, v in m.items()))

    with AsyncCheckpointer(filename="denoise.msgpack") as ckpt, \
            PrefetchIterator(batches, depth=2,
                             device_put=place_batch) as prefetched:
        for it, batch in enumerate(prefetched):
            lr = compute_ramped_lrate(it + it_offset, total_iters,
                                      ramp_up, ramp_down,
                                      config.lr)
            state = set_learning_rate(state, lr)
            state, metrics = step(state, batch)
            _collect(drain.push(metrics))
            if (it + 1) % log_every == 0 and config.save_all \
                    and config.save_dir:
                # denoise is iteration-based (ramped LR), so --save_all
                # keeps numbered snapshots at the logging cadence rather
                # than per epoch (reference main.py:100 semantics); saved
                # here (not in _collect) so model_{n} is exactly the state
                # after n steps despite the lagged log line
                ckpt.save(
                    os.path.join(config.save_dir, f"model_{it + 1}"),
                    denoise_payload(state), config,
                )
    _collect(drain.pop())
    return state, models, history


def denoise_payload(state: DenoiseState) -> dict:
    """The serialized denoiser checkpoint pytree (shared by the sync and
    write-behind savers)."""
    return {
        "step": state.step,
        "params_dn": state.params_dn,
        "params_sigma": state.params_sigma,
        "opt_state": state.opt_state,
    }


def save_denoise_checkpoint(path, state: DenoiseState, config=None):
    """Persist the trained denoiser (DenoiseState is not a TrainState, so
    train/state.save_checkpoint cannot serve — without this, a denoise run
    without --write_denoised produced nothing but logs)."""
    from cet_pick_tpu.train.state import (
        prefetch_payload, write_checkpoint_file,
    )

    payload = denoise_payload(state)
    prefetch_payload(payload)
    write_checkpoint_file(path, "denoise.msgpack", payload, config)


def load_denoise_checkpoint(path, state: DenoiseState) -> DenoiseState:
    """Load a denoiser checkpoint into an initialized DenoiseState."""
    import os

    from flax import serialization

    with open(os.path.join(path, "denoise.msgpack"), "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    return state.replace(
        step=int(loaded.get("step", 0)),
        params_dn=serialization.from_state_dict(
            state.params_dn, loaded["params_dn"]),
        params_sigma=serialization.from_state_dict(
            state.params_sigma, loaded["params_sigma"]),
        opt_state=serialization.from_state_dict(
            state.opt_state, loaded["opt_state"]),
    )


def denoise_volume(models, state, volume, z_batch=8):
    """Apply the trained posterior-mean denoiser over z-slice batches.

    Extents are reflect-padded UP to the UNet's 32-multiple requirement and
    cropped back, so the whole slice is denoised — truncating to the lower
    multiple left a raw-noise band up to 31 px wide on two edges of every
    slice. Slices ride the batch axis ``z_batch`` at a time (one dispatch
    per chunk instead of per slice — per-dispatch overhead dominates
    single-slice calls on remote-attached devices); the last chunk is padded
    to the same shape so the forward compiles once."""
    d, h, w = volume.shape
    ph, pw = (-h) % 32, (-w) % 32
    z_batch = max(1, min(int(z_batch), d))

    @jax.jit
    def run(noisy):
        _, pme, _, _ = denoise_forward(
            models, state.params_dn, state.params_sigma, noisy
        )
        return pme

    padded = volume
    for ax, p in ((1, ph), (2, pw)):
        if p:
            width = [(0, 0)] * 3
            width[ax] = (0, p)
            # reflect needs pad < extent; tiny slices (<= 16 px on an axis)
            # fall back to edge replication instead of raising
            padded = np.pad(
                padded, width,
                mode="reflect" if p < padded.shape[ax] else "edge",
            )
    out = np.empty((d, h, w), np.float32)
    for z0 in range(0, d, z_batch):
        z1 = min(z0 + z_batch, d)
        chunk = padded[z0:z1]
        if z1 - z0 < z_batch:  # pad the remainder chunk to the jitted shape
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], z_batch - (z1 - z0), axis=0)]
            )
        x = jnp.asarray(chunk, jnp.float32)[..., None]
        out[z0:z1] = np.asarray(run(x))[: z1 - z0, :h, :w, 0]
    return out
