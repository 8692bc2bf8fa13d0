"""Golden-value tests for training objectives.

Each loss is checked against an independent, naive numpy implementation of the
published math (full similarity matrix, explicit branches) on small random
inputs — mirroring how the reference composes them, without sharing any code
with either implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cet_pick_tpu.train.losses import (
    focal_loss,
    pu_focal_loss,
    unbiased_con_loss,
    consistency_loss,
    simsiam_loss,
)


def _np_focal(pred, gt):
    pos = (gt == 1).astype(float)
    neg = ((gt > -1) & (gt < 1)).astype(float)
    w = (1 - gt) ** 4
    pl = np.log(pred) * (1 - pred) ** 2 * pos
    nl = np.log(1 - pred) * pred ** 2 * w * neg
    npos = pos.sum()
    if npos == 0:
        return -nl.sum()
    return -(pl.sum() + nl.sum()) / npos


def _np_pu(pred, gt, tau, beta=0.0):
    tp = (gt == 1).astype(float)
    unl = (gt == -1).astype(float)
    soft = ((gt > -1) & (gt < 1)).astype(float)
    n_pos, n_unl, n_soft = tp.sum(), unl.sum(), soft.sum()
    pos_loss = (np.log(pred) * (1 - pred) ** 2 * tp).sum()
    if n_soft > 0:
        spl = (np.log(1 - pred) * pred ** 2 * (1 - gt) ** 4 * soft).sum()
        pos_tot = -pos_loss / n_pos - spl / n_soft
    else:
        pos_tot = -pos_loss / n_pos
    pos_risk = pos_tot * tau
    npl = (np.log(1 - pred) * pred ** 2 * tp).sum()
    if n_soft > 0:
        nspl = (np.log(pred) * (1 - pred) ** 2 * gt ** 4 * soft).sum()
        neg_pos_risk = -npl / n_pos - nspl / n_soft
    else:
        neg_pos_risk = -npl / n_pos
    unl_risk = -(pred ** 2 * np.log(1 - pred) * unl).sum() / n_unl
    neg_total = -tau * neg_pos_risk + unl_risk
    return pos_risk if neg_total < -beta else pos_risk + neg_total


def _np_unbiased_con(labels, hm, hm_cr, f, f_cr, temp, tau_plus, thresh):
    """Naive full-matrix implementation of the debiased contrastive loss."""
    n = len(labels)
    F = np.concatenate([f, f_cr], 0)
    all_labels = np.concatenate([labels, labels])
    all_preds = np.concatenate([hm, hm_cr])
    m = 2 * n

    sims = F @ F.T / temp
    rowmax = sims.max(axis=1, keepdims=True)
    logits = sims - rowmax
    mask = 1 - np.eye(m)
    e = np.exp(logits * mask)

    pos_lab = (all_labels > thresh).astype(float) if thresh < 1 else (all_labels == 1).astype(float)
    un_lab = (all_labels < 0).astype(float)
    other = (all_labels < thresh).astype(float)
    npos_tot = pos_lab.sum()
    num_neg = 2 * (n - npos_tot / 2)

    def calc_g(pm, nm, cp):
        return np.maximum((nm - cp * pm) / (1 - cp), np.e ** (-1 / temp))

    # supervised
    pos_rows = e[pos_lab.astype(bool)]
    pm = (pos_rows * pos_lab).sum(1) / (npos_tot - 1)
    rm = (pos_rows * other).sum(1) / other.sum()
    ng = calc_g(pm, rm, tau_plus)
    sup = (-np.log(pm / (pm + ng))).mean()

    # unlabeled
    self_mask = np.zeros((m, m))
    self_mask[:n, n:] = np.eye(n)
    self_mask[n:, :n] = np.eye(n)
    u_rows = e[un_lab.astype(bool)]
    u_mask = self_mask[un_lab.astype(bool)]
    upm = (u_rows * u_mask).sum(1)
    urm = (u_rows * (1 - u_mask)).sum(1) / num_neg
    ng_p = calc_g(upm, urm, tau_plus)
    ng_n = calc_g(upm, urm, 1 - tau_plus)
    p = all_preds[un_lab.astype(bool)]
    lp = -np.log(upm / (upm + ng_p)) * p
    ln = -np.log(upm / (upm + ng_n)) * (1 - p)
    unsup = 0.0
    pp = p > 0.99
    pn = p < 0.01
    mid = (~pp) & (~pn)
    if pp.sum() > 0:
        unsup += lp[pp].mean()
    if pn.sum() > 0:
        unsup += ln[pn].mean()
    if mid.sum() > 0:
        unsup += lp[mid].mean() + ln[mid].mean()
    return sup, unsup


class TestFocal:
    def test_matches_numpy(self, rng):
        pred = np.clip(rng.random(200), 1e-4, 1 - 1e-4)
        gt = rng.choice([1.0, 0.0, 0.3, -1.0], size=200)
        ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        assert ours == pytest.approx(_np_focal(pred, gt), rel=1e-5)

    def test_no_positives(self, rng):
        pred = np.clip(rng.random(50), 1e-4, 1 - 1e-4)
        gt = np.zeros(50)
        ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        assert ours == pytest.approx(_np_focal(pred, gt), rel=1e-5)

    def test_perfect_prediction_near_zero(self):
        gt = np.array([1.0, 0.0, -1.0])
        pred = np.array([1 - 1e-4, 1e-4, 0.5])
        assert float(focal_loss(jnp.asarray(pred), jnp.asarray(gt))) < 1e-3


class TestPUFocal:
    @pytest.mark.parametrize("beta", [0.0, 0.5])
    def test_matches_numpy(self, rng, beta):
        pred = np.clip(rng.random(300), 1e-4, 1 - 1e-4)
        gt = rng.choice([1.0, -1.0], size=300, p=[0.1, 0.9])
        ours, npos = pu_focal_loss(jnp.asarray(pred), jnp.asarray(gt), tau=0.1, beta=beta)
        assert float(ours) == pytest.approx(_np_pu(pred, gt, 0.1, beta), rel=1e-5)
        assert float(npos) == (gt == 1).sum()

    def test_with_soft_negatives(self, rng):
        pred = np.clip(rng.random(300), 1e-4, 1 - 1e-4)
        gt = rng.choice([1.0, -1.0, 0.4, 0.0], size=300, p=[0.1, 0.7, 0.1, 0.1])
        ours, _ = pu_focal_loss(jnp.asarray(pred), jnp.asarray(gt), tau=0.1)
        assert float(ours) == pytest.approx(_np_pu(pred, gt, 0.1), rel=1e-5)

    def test_clamp_branch(self):
        # confident negatives on unlabeled => neg_risk_total < -beta => pos_risk only
        pred = np.full(100, 1e-4)
        gt = np.full(100, -1.0)
        gt[:5] = 1.0
        pred2 = pred.copy()
        pred2[:5] = 0.9
        loss, _ = pu_focal_loss(jnp.asarray(pred2), jnp.asarray(gt), tau=0.1, beta=0.0)
        assert float(loss) == pytest.approx(_np_pu(pred2, gt, 0.1), rel=1e-3)


class TestUnbiasedCon:
    @pytest.mark.parametrize("block", [7, 64])
    def test_matches_full_matrix_oracle(self, rng, block):
        n, c = 50, 8
        f = rng.standard_normal((n, c))
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        f_cr = rng.standard_normal((n, c))
        f_cr /= np.linalg.norm(f_cr, axis=1, keepdims=True)
        labels = rng.choice([1.0, -1.0], size=n, p=[0.2, 0.8])
        hm = np.clip(rng.random(n), 1e-4, 1 - 1e-4)
        hm_cr = np.clip(rng.random(n), 1e-4, 1 - 1e-4)

        sup, unsup, npos = unbiased_con_loss(
            jnp.asarray(labels), jnp.asarray(hm), jnp.asarray(hm_cr),
            jnp.asarray(f, dtype=jnp.float32), jnp.asarray(f_cr, dtype=jnp.float32),
            temp=0.07, tau_plus=0.1, thresh=0.5, block=block,
        )
        ref_sup, ref_unsup = _np_unbiased_con(labels, hm, hm_cr, f, f_cr, 0.07, 0.1, 0.5)
        # sup involves -log(pm/(pm+ng)) with ng/pm ~ 1e-5: catastrophic
        # cancellation makes f32 agree with the f64 oracle only to ~1e-2 rel
        # (absolute agreement is ~1e-8)
        assert float(sup) == pytest.approx(ref_sup, rel=1e-2, abs=1e-6)
        assert float(unsup) == pytest.approx(ref_unsup, rel=1e-4)
        assert float(npos) == 2 * (labels > 0.5).sum()

    def test_pseudo_label_buckets(self, rng):
        # force all three unlabeled buckets to be populated
        n, c = 30, 4
        f = rng.standard_normal((n, c)); f /= np.linalg.norm(f, axis=1, keepdims=True)
        f_cr = rng.standard_normal((n, c)); f_cr /= np.linalg.norm(f_cr, axis=1, keepdims=True)
        labels = np.full(n, -1.0); labels[:4] = 1.0
        hm = np.full(n, 0.5); hm[4:8] = 0.999; hm[8:12] = 0.001
        hm_cr = hm.copy()
        sup, unsup, _ = unbiased_con_loss(
            jnp.asarray(labels), jnp.asarray(hm), jnp.asarray(hm_cr),
            jnp.asarray(f, dtype=jnp.float32), jnp.asarray(f_cr, dtype=jnp.float32),
            temp=0.07, tau_plus=0.1, thresh=0.5, block=16,
        )
        ref_sup, ref_unsup = _np_unbiased_con(labels, hm, hm_cr, f, f_cr, 0.07, 0.1, 0.5)
        assert float(sup) == pytest.approx(ref_sup, rel=1e-4)
        assert float(unsup) == pytest.approx(ref_unsup, rel=1e-4)


class TestConsistencySimsiam:
    def test_consistency_is_mse(self, rng):
        a = rng.random(100).astype(np.float32)
        b = rng.random(100).astype(np.float32)
        assert float(consistency_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            np.mean((a - b) ** 2), rel=1e-6
        )

    def test_simsiam_perfect_alignment(self, rng):
        z = rng.standard_normal((16, 8)).astype(np.float32)
        loss, std = simsiam_loss(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z), jnp.asarray(z))
        assert float(loss) == pytest.approx(-1.0, abs=1e-5)

    def test_simsiam_collapse_monitor(self):
        z = np.ones((16, 8), dtype=np.float32)  # collapsed embeddings
        _, std = simsiam_loss(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z), jnp.asarray(z))
        assert float(std) == pytest.approx(0.0, abs=1e-6)

    def test_simsiam_gradient_ignores_z(self, rng):
        import jax

        p = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
        z = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))

        def loss_wrt_z(zz):
            l, _ = simsiam_loss(p, zz, p, zz)
            return l

        g = jax.grad(loss_wrt_z)(z)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_pu_ge_loss_finite_and_count_sensitive(rng):
    """GE penalty prefers unlabeled positive-fraction near tau."""
    import jax.numpy as jnp
    from cet_pick_tpu.train.losses import pu_ge_loss

    n = 512
    gt = -np.ones(n, np.float32)
    gt[:10] = 1.0  # a few labeled positives

    def loss_at(frac):
        pred = np.full(n, 0.02, np.float32)
        pred[:10] = 0.95
        k = int(frac * (n - 10))
        pred[10:10 + k] = 0.95  # confident positives among unlabeled
        return float(pu_ge_loss(jnp.asarray(pred), jnp.asarray(gt), tau=0.1))

    on_target = loss_at(0.1)
    too_many = loss_at(0.6)
    too_few = loss_at(0.0)
    assert np.isfinite([on_target, too_many, too_few]).all()
    assert on_target < too_many
    assert on_target < too_few


def test_decode_classify_roundtrip(rng):
    from cet_pick_tpu.ops.decode import tomo_decode_classify

    hm = np.zeros((8, 32, 32), np.float32)
    hm[4, 10, 20] = 0.9
    hm[4, 11, 21] = 0.8   # suppressed: inside radius of the first
    hm[2, 25, 5] = 0.7
    dets = tomo_decode_classify(hm, r=6, threshold=0.5)
    assert dets.shape[1] == 4
    assert len(dets) == 2
    assert (dets[0][:3] == [20, 10, 4]).all() and dets[0][3] == np.float32(0.9)
