"""Blind-spot denoiser: architecture invariants + training smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cet_pick_tpu.config import Config
from cet_pick_tpu.models.denoise import NoiseNetwork, shift_down
from cet_pick_tpu.train.denoise import (
    DenoiseDataset,
    compute_ramped_lrate,
    create_denoise_state,
    denoise_forward,
    denoise_volume,
    make_denoise_train_step,
    train_denoise,
)


def test_shift_down():
    x = jnp.arange(8.0).reshape(1, 4, 2, 1)
    y = shift_down(x, 1)
    assert y.shape == x.shape
    np.testing.assert_array_equal(np.asarray(y)[0, 0, :, 0], [0, 0])
    np.testing.assert_array_equal(np.asarray(y)[0, 1, :, 0],
                                  np.asarray(x)[0, 0, :, 0])


def test_blindspot_property(rng):
    """The defining invariant: the output at a pixel does not depend on the
    input at that pixel (Laine et al.; denoise_network.py:23-35)."""
    net = NoiseNetwork(out_channels=1, blindspot=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    y0 = np.asarray(net.apply({"params": params}, x))
    # perturb the center pixel hugely
    x2 = x.at[0, 16, 16, 0].add(1000.0)
    y1 = np.asarray(net.apply({"params": params}, x2))
    assert abs(y1[0, 16, 16, 0] - y0[0, 16, 16, 0]) < 1e-3
    # but neighbors are affected (receptive field is real)
    assert np.abs(y1 - y0).max() > 1.0


def test_plain_network_not_blindspot(rng):
    net = NoiseNetwork(out_channels=1, blindspot=False)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    y0 = np.asarray(net.apply({"params": params}, x))
    x2 = x.at[0, 16, 16, 0].add(1000.0)
    y1 = np.asarray(net.apply({"params": params}, x2))
    assert abs(y1[0, 16, 16, 0] - y0[0, 16, 16, 0]) > 1e-3


def test_ramped_lrate():
    lr = 1e-3
    assert compute_ramped_lrate(0, 100, 0.1, 0.3, lr) == 0.0
    assert compute_ramped_lrate(50, 100, 0.1, 0.3, lr) == pytest.approx(lr)
    assert compute_ramped_lrate(99, 100, 0.1, 0.3, lr) < lr * 0.01


def test_bfloat16_forward_close_to_f32(rng):
    """--dtype bfloat16 keeps params f32 and only changes conv compute;
    outputs must track the f32 forward within bf16 rounding."""
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
    cfg32 = Config(task="denoise", batch_size=2).finalize()
    cfg16 = Config(task="denoise", batch_size=2, dtype="bfloat16").finalize()
    s32, m32 = create_denoise_state(cfg32, jax.random.PRNGKey(0), crop=32)
    s16, m16 = create_denoise_state(cfg16, jax.random.PRNGKey(0), crop=32)
    # identical f32 params regardless of compute dtype
    a = jax.tree_util.tree_leaves(s32.params_dn)
    b = jax.tree_util.tree_leaves(s16.params_dn)
    for la, lb in zip(a, b):
        assert la.dtype == lb.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    mu32, _, sy32, _ = denoise_forward(m32, s32.params_dn, s32.params_sigma, x)
    mu16, _, sy16, _ = denoise_forward(m16, s16.params_dn, s16.params_sigma, x)
    assert mu16.dtype == jnp.float32  # loss math stays f32
    scale = float(np.abs(np.asarray(mu32)).max())
    assert float(np.abs(np.asarray(mu16) - np.asarray(mu32)).max()) < 0.1 * max(scale, 1.0)
    assert np.isfinite(np.asarray(sy16)).all()


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_denoise_training_stable_and_learning(rng, dtype):
    """Short-budget smoke: the SSDN objective must decrease and stay finite
    (full noise-beating quality needs thousands of iterations — the
    architecture correctness is pinned by the blind-spot property test).
    The bfloat16 variant quality-gates the --dtype production setting."""
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    clean = np.sin(xx / 8.0) + np.cos(yy / 10.0)
    vol = np.stack([
        clean + rng.standard_normal((64, 64)) * 0.8 for _ in range(12)
    ]).astype(np.float32)
    cfg = Config(task="denoise", arch="unet_4", lr=1e-3, batch_size=4,
                 dtype=dtype).finalize()
    ds = DenoiseDataset({"v": vol}, crop=32, exclude=0)
    state, models, hist = train_denoise(cfg, ds, num_iters=60, crop=32,
                                        log_fn=lambda *_: None)
    losses = [h["loss"] for h in hist]
    assert np.isfinite(losses).all()
    # noise estimate is soft-capped — no sigma blow-up (was 1e17 uncapped)
    assert 0 < hist[-1]["noise_std"] <= 16.0
    den = denoise_volume(models, state, vol[:2])
    assert den.shape == vol[:2].shape and np.isfinite(den).all()
