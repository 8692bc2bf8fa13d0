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
