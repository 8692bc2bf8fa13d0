"""Interpret-mode correctness of the fused gram row-stats kernel
(ops/pallas_gram.py) against the XLA lowering (train/losses._row_stats_blocked):
values and custom-VJP gradients, including non-multiple-of-block sizes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cet_pick_tpu.ops.pallas_gram import gram_row_stats
from cet_pick_tpu.train.losses import _row_stats_blocked


def _fixture(rng, m, c=32):
    f = rng.standard_normal((m, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    pos = (rng.random(m) < 0.05).astype(np.float32)
    other = (rng.random(m) < 0.7).astype(np.float32)
    return jnp.asarray(f), jnp.asarray(pos), jnp.asarray(other)


@pytest.mark.parametrize("m", [128, 200])
def test_gram_row_stats_matches_xla(rng, m):
    f, pos, other = _fixture(rng, m)
    temp = 0.07
    ps, os_, ts = gram_row_stats(f, pos, other, temp, 32, True)
    rps, ros, rts, _ = _row_stats_blocked(f, pos, other, temp, block=64)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(rps),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ros),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rts),
                               rtol=2e-5, atol=1e-6)


def test_gram_row_stats_grad_matches_xla(rng):
    m, temp = 160, 0.07
    f, pos, other = _fixture(rng, m)
    w1 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def loss_pl(ff):
        ps, os_, ts = gram_row_stats(ff, pos, other, temp, 32, True)
        return (w1 * ps).sum() + (w2 * os_).sum() + (w3 * ts).sum()

    def loss_xla(ff):
        ps, os_, ts, _ = _row_stats_blocked(ff, pos, other, temp, block=64)
        return (w1 * ps).sum() + (w2 * os_).sum() + (w3 * ts).sum()

    v1, g1 = jax.value_and_grad(loss_pl)(f)
    v2, g2 = jax.value_and_grad(loss_xla)(f)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("m", [128, 200])
def test_gram_logit_stats_matches_xla(rng, m):
    from cet_pick_tpu.ops.pallas_gram import gram_logit_stats
    from cet_pick_tpu.train.losses import _row_logit_stats_blocked

    f, pos, _ = _fixture(rng, m)
    temp = 0.07
    ls, ts = gram_logit_stats(f, pos, temp, 32, True)
    rls, _, rts = _row_logit_stats_blocked(f, pos, temp, block=64)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(rls),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rts),
                               rtol=2e-5, atol=1e-6)


def test_gram_logit_stats_grad_matches_xla(rng):
    from cet_pick_tpu.ops.pallas_gram import gram_logit_stats
    from cet_pick_tpu.train.losses import _row_logit_stats_blocked

    m, temp = 160, 0.07
    f, pos, _ = _fixture(rng, m)
    w1 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def loss_pl(ff):
        ls, ts = gram_logit_stats(ff, pos, temp, 32, True)
        return (w1 * ls).sum() + (w2 * ts).sum()

    def loss_xla(ff):
        ls, _, ts = _row_logit_stats_blocked(ff, pos, temp, block=64)
        return (w1 * ls).sum() + (w2 * ts).sum()

    v1, g1 = jax.value_and_grad(loss_pl)(f)
    v2, g2 = jax.value_and_grad(loss_xla)(f)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-4, atol=3e-5)


def test_supcon_loss_backends_agree(rng):
    """supcon_loss(backend='pallas', interpret via CPU fallback) — here we
    check the XLA path vs a direct pallas interpret composition, pinning the
    partner-logit recomputation in _row_logit_stats."""
    from cet_pick_tpu.train import losses as L

    m = 64
    f1, _, _ = _fixture(rng, m)
    f2, _, _ = _fixture(np.random.default_rng(1), m)
    labels = jnp.asarray((rng.random(m) < 0.1).astype(np.float32))

    ref = float(L.supcon_loss(labels, f1, f2, backend="xla"))

    # emulate the pallas dispatch with interpret=True (CPU has no Mosaic)
    feats_all = jnp.concatenate([f1, f2], axis=0)
    pos = jnp.concatenate([labels, labels]) > 0.5
    lsum, tot = __import__(
        "cet_pick_tpu.ops.pallas_gram", fromlist=["gram_logit_stats"]
    ).gram_logit_stats(feats_all, pos.astype(jnp.float32), 0.07, 32, True)
    rls, rp, rts = L._row_logit_stats_blocked(
        feats_all, pos.astype(jnp.float32), 0.07, 64)
    np.testing.assert_allclose(np.asarray(lsum), np.asarray(rls),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tot), np.asarray(rts),
                               rtol=2e-5, atol=1e-6)
    # partner recomputation (the piece _row_logit_stats adds outside)
    mm = feats_all.shape[0]
    pidx = jnp.concatenate([jnp.arange(mm // 2) + mm // 2,
                            jnp.arange(mm // 2)])
    partner = (feats_all * feats_all[pidx]).sum(axis=1) / 0.07 - 1.0 / 0.07
    np.testing.assert_allclose(np.asarray(partner), np.asarray(rp),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(ref)
