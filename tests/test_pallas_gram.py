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


def _v2_ref_stats(f, pos, neg, temp):
    n = f.shape[0]
    mask = 1 - jnp.eye(n, dtype=f.dtype)
    sims = (f @ f.T) * mask / temp
    mx = jax.lax.stop_gradient(sims.max(axis=1))
    tot = jnp.exp(sims - mx[:, None]).sum(axis=1)
    return mx, (sims * pos[None, :]).sum(1), (sims * neg[None, :]).sum(1), tot


@pytest.mark.parametrize("m", [128, 200])
def test_gram_supcon_v2_stats_matches_dense(rng, m):
    from cet_pick_tpu.ops.pallas_gram import gram_supcon_v2_stats

    # RAW (un-normalized) features — this variant's whole point
    f = jnp.asarray(rng.standard_normal((m, 32)).astype(np.float32))
    pos = jnp.asarray((rng.random(m) < 0.05).astype(np.float32))
    neg = jnp.asarray((rng.random(m) < 0.7).astype(np.float32))
    temp = 0.07
    mx, ps, ns, tot = gram_supcon_v2_stats(f, pos, neg, temp, 32, True)
    rmx, rps, rns, rtot = _v2_ref_stats(f, pos, neg, temp)
    # tolerance note: raw features make |sims| ~ 1/temp * |f.f| ~ 4e2, so
    # the 3-pass bf16 emulation carries ~2^-17 relative error per element
    # (~3e-3 abs) into the LINEAR sums — the dense XLA path on real TPU
    # hardware runs the matmul at single-pass bf16 and is ~256x worse; the
    # f32 reference here is only reachable on CPU.
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rmx), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(rps),
                               rtol=3e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(rns),
                               rtol=3e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(tot), np.asarray(rtot),
                               rtol=2e-3, atol=1e-3)


def test_gram_supcon_v2_grad_matches_dense(rng):
    from cet_pick_tpu.ops.pallas_gram import gram_supcon_v2_stats

    m, temp = 160, 0.07
    f = jnp.asarray(rng.standard_normal((m, 32)).astype(np.float32))
    pos = jnp.asarray((rng.random(m) < 0.1).astype(np.float32))
    neg = jnp.asarray((rng.random(m) < 0.6).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def loss_pl(ff):
        _, ps, ns, tot = gram_supcon_v2_stats(ff, pos, neg, temp, 32, True)
        return (w1 * ps).sum() + (w2 * ns).sum() + (w3 * tot).sum()

    def loss_ref(ff):
        _, ps, ns, tot = _v2_ref_stats(ff, pos, neg, temp)
        return (w1 * ps).sum() + (w2 * ns).sum() + (w3 * tot).sum()

    v1, g1 = jax.value_and_grad(loss_pl)(f)
    v2, g2 = jax.value_and_grad(loss_ref)(f)
    # raw-scale sims: see the tolerance note in the stats test above
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-3, atol=5e-2)


def test_supcon_v2_assembly_matches_xla(rng):
    """The stats-based assembly in train/supervised.supcon_v2_loss must be
    algebraically identical to the dense log_prob formulation."""
    from cet_pick_tpu.train.supervised import supcon_v2_loss

    m = 96
    f = jnp.asarray(rng.standard_normal((m, 16)).astype(np.float32))
    hm = jnp.asarray((rng.random(m) < 0.08).astype(np.float32))
    ref = float(supcon_v2_loss(f, hm, backend="xla"))

    # hand-assemble from the reference stats (the pallas path's algebra)
    pos = (hm > 0.5).astype(jnp.float32)
    neg = (hm < 0.5).astype(jnp.float32)
    mx, ps, ns, tot = _v2_ref_stats(f, pos, neg, 0.07)
    base = mx + jnp.log(jnp.maximum(tot, 1e-12))
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum(neg.sum(), 1.0)
    mean_pos_rows = (ps - base * pos.sum()) / n_pos
    mean_neg_rows = (ns - base * neg.sum()) / n_neg
    ours = float(-(mean_pos_rows * pos).sum() / n_pos
                 - (mean_neg_rows * neg).sum() / n_neg)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
