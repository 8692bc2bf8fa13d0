"""Training objectives (jitted, batched, memory-bounded).

Re-implements the refinement/exploration objectives of reference
cet_pick/models/loss.py with identical math at batch composition time:

* ``focal_loss``          — loss.py:378-411 (CornerNet penalty-reduced focal;
                            voxels labeled -1 excluded from the negative term)
* ``pu_focal_loss``       — loss.py:255-325 (non-negative positive-unlabeled
                            focal: pos risk scaled by class prior tau, negative
                            risk debiased by the positives' negative risk,
                            clamped at -beta)
* ``unbiased_con_loss``   — loss.py:571-699 (debiased pixel-level contrastive
                            regularization over two augmented views)
* ``consistency_loss``    — loss.py:701-712 (MSE between view heatmaps)
* ``supcon_loss``         — loss.py:759-818 (supervised variant for --pn mode)
* ``simsiam_loss``        — trains/tomo_simsiam_trainer.py:28-40 (symmetric
                            negative cosine + collapse monitor)

The contrastive losses never materialize the (2N, 2N) similarity matrix the
reference allocates (loss.py:623): rows are processed in fixed-size blocks via
``lax.map``, so HBM usage is O(block * 2N) while XLA fuses the exp/mask/reduce
chain into each block matmul. This is what makes the loss fit on a TPU core at
full reference resolution (2N = 24576 at batch 1).

Data-dependent branches in the reference (``if num_soft > 0`` etc.) become
``jnp.where`` with safe denominators — identical values, trace-compatible.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


# Gram matmul precision for the contrastive losses. On TPU, f32 matmuls are
# emulated by bf16 MXU passes: "highest" = 6 passes (full f32), "high" = 3,
# "default" = 1 (plain bf16, ~1e-2 absolute sim error -> 0.14 logit error at
# temp .07 — too coarse for the debiasing terms). Read at trace time; the
# train_roofline.py A/B measures speed/accuracy of each setting.
GRAM_PRECISION = "highest"

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _gram_precision():
    return _PRECISIONS[GRAM_PRECISION]


# ---------------------------------------------------------------------------
# focal losses
# ---------------------------------------------------------------------------

def focal_loss(pred, gt):
    """CornerNet modified focal loss (loss.py:378-411).

    pred: probabilities in (0, 1) (already sigmoid-clamped); gt: targets where
    1 = positive, [0, 1) = labeled negative with (1-gt)^4 down-weighting, and
    -1 = unlabeled (ignored).
    """
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    pos = (gt == 1).astype(pred.dtype)
    neg = ((gt > -1) & (gt < 1)).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg

    num_pos = pos.sum()
    pos_sum = pos_loss.sum()
    neg_sum = neg_loss.sum()
    return jnp.where(
        num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0)
    )


def pu_focal_loss(pred, gt, tau=0.1, beta=0.0):
    """Non-negative positive-unlabeled focal loss (loss.py:255-308).

    gt semantics: 1 = labeled positive, -1 = unlabeled, [0, 1) = soft
    negatives (only present in fiber/pn-style targets).

    Returns (loss, num_pos); the reference raises when num_pos == 0
    (loss.py:275-276) — here the caller should check num_pos host-side.
    """
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    true_pos = (gt == 1).astype(pred.dtype)
    labeled = (gt > -1).astype(pred.dtype)
    other = (gt < 1).astype(pred.dtype)
    soft_pos = (labeled == other).astype(pred.dtype)  # labeled negatives
    unlabeled = (gt == -1).astype(pred.dtype)

    num_pos = true_pos.sum()
    num_unlabeled = unlabeled.sum()
    num_soft = soft_pos.sum()

    soft_pow_w = jnp.power(1 - gt, 4)
    soft_pow_neg_w = jnp.power(gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * true_pos
    soft_pos_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * soft_pow_w * soft_pos
    pos_loss_tot = jnp.where(
        num_soft > 0,
        -_safe_div(pos_loss.sum(), num_pos) - _safe_div(soft_pos_loss.sum(), num_soft),
        -_safe_div(pos_loss.sum(), num_pos),
    )
    pos_risk = pos_loss_tot * tau

    neg_pos_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * true_pos
    neg_soft_pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * soft_pow_neg_w * soft_pos
    neg_pos_risk = jnp.where(
        num_soft > 0,
        -_safe_div(neg_pos_loss.sum(), num_pos)
        - _safe_div(neg_soft_pos_loss.sum(), num_soft),
        -_safe_div(neg_pos_loss.sum(), num_pos),
    )

    unlabeled_neg = jnp.power(pred, 2) * jnp.log(1 - pred) * unlabeled
    unlabeled_risk = -_safe_div(unlabeled_neg.sum(), num_unlabeled)

    neg_risk_total = -tau * neg_pos_risk + unlabeled_risk
    loss = jnp.where(neg_risk_total < -beta, pos_risk, pos_risk + neg_risk_total)
    return loss, num_pos


def pu_ge_loss(pred, gt, tau=0.1, slack=1.0, entropy_penalty=0.0):
    """Generalized-expectation PU loss (loss.py:215-253, 327-337, --ge mode).

    Focal loss on labeled voxels + a penalty matching the count of positives
    among unlabeled voxels to Binomial(N, tau): the predicted count
    distribution is approximated as a gaussian q(count) from the per-voxel
    Bernoulli moments, and scored against the binomial log-pmf.

    The reference materializes arange(0, N+1) with data-dependent N; here the
    count grid is the (static) total voxel count with entries > N masked, and
    the binomial log-pmf comes from gammaln — fully traceable.
    """
    from jax.scipy.special import gammaln

    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    classifier_loss = focal_loss(pred, gt)

    unl = (gt == -1).astype(pred.dtype)
    n_unl = unl.sum()
    p = pred * unl
    q_mu = p.sum()
    q_var = (p * (1 - pred) * unl).sum()

    v = pred.shape[0]
    k = jnp.arange(0, v + 1, dtype=pred.dtype)
    valid = k <= n_unl
    q_logits = jnp.where(valid, -0.5 * (q_mu - k) ** 2 / (q_var + 1e-7), -jnp.inf)
    q_discrete = jax.nn.softmax(q_logits)
    log_binom = (
        gammaln(n_unl + 1) - gammaln(k + 1) - gammaln(jnp.maximum(n_unl - k, 0) + 1)
        + k * jnp.log(tau) + jnp.maximum(n_unl - k, 0) * jnp.log1p(-tau)
    )
    ge_penalty = -jnp.sum(jnp.where(valid, log_binom * q_discrete, 0.0))
    if entropy_penalty > 0:
        q_entropy = 0.5 * (jnp.log(q_var + 1e-7) + jnp.log(2 * jnp.pi) + 1)
        ge_penalty = ge_penalty + q_entropy * entropy_penalty
    return classifier_loss + slack * ge_penalty


# ---------------------------------------------------------------------------
# debiased contrastive regularization
# ---------------------------------------------------------------------------

def _row_stats_blocked(feats_all, pos_mask, other_mask, temp, block):
    """Per-row reductions of the exp-similarity matrix, in row blocks.

    For every row i of exp((f_i . f_j / T - 1/T) * offdiag) returns:
      pos_sum[i]    = sum_j exp_ij * pos_mask[j]
      other_sum[i]  = sum_j exp_ij * other_mask[j]
      total_sum[i]  = sum_j exp_ij          (including the exp(0)=1 diagonal)
      partner[i]    = exp_i,partner(i)      (the augmented counterpart column)

    Matches the reference order of operations (loss.py:623-631): logits are
    divided by T, the row max is taken over the *unmasked* row (diagonal = 1/T
    dominates for normalized features), logits are shifted, the diagonal is
    zeroed (so it contributes exp(0) = 1 after exp).

    HBM-traffic-shaped (the measured bound, benchmarks/train_roofline.py —
    the gram matmul is ~1 ms of MXU work but the (block, 2N) intermediates
    cost ~10x that in HBM round-trips at every precision): the row
    reductions are fused multiply-sums, NOT dots, so the exp-matrix is a
    pure elementwise intermediate that XLA fuses into ONE reduction pass
    over the sims matmul output (a dot consumer would force ``e`` to
    materialize); the partner column is recomputed directly from the
    feature vectors (O(block * C)) instead of gathered from ``e``; and the
    row-max shift is the CONSTANT 1/T rather than a computed max — the
    features are L2-normalized (caller contract), so every similarity is
    <= 1 with the diagonal == 1, making the reference's row max exactly
    1/T up to the dot product's fp error; log-softmax is shift-invariant,
    all shifted logits stay <= 0 (no overflow), and skipping the max
    reduction deletes one of the two full HBM read passes of ``sims`` in
    the forward and again in the remat'd backward. The only HBM tensor per
    block is ``sims`` (one write, one fused exp/mask/reduce read).
    """
    m = feats_all.shape[0]
    n = m // 2
    pad = (-m) % block
    fT = feats_all.T  # (C, 2N)
    rowshift = 1.0 / temp  # == the reference's row max for unit features

    def one_block(start):
        idx = start + jnp.arange(block)
        valid = idx < m
        rows = feats_all[jnp.clip(idx, 0, m - 1)]
        # full-precision gram: the debiasing terms are sensitive to sim error
        # and this matmul is negligible FLOPs next to the model convs
        sims = jnp.matmul(rows, fT, precision=_gram_precision()) / temp

        col = jnp.arange(m)[None, :]
        offdiag = (col != idx[:, None]).astype(sims.dtype)
        e = jnp.exp((sims - rowshift) * offdiag)       # diag -> exp(0) = 1
        pos_sum = (e * pos_mask[None, :]).sum(axis=1)
        other_sum = (e * other_mask[None, :]).sum(axis=1)
        total_sum = e.sum(axis=1)
        partner_idx = jnp.clip(jnp.where(idx < n, idx + n, idx - n), 0, m - 1)
        partner_sims = (rows * feats_all[partner_idx]).sum(axis=1) / temp
        partner = jnp.exp(partner_sims - rowshift)
        z = jnp.where(valid, 1.0, 0.0)
        return pos_sum * z, other_sum * z, total_sum * z, partner * z

    starts = jnp.arange(0, m + pad, block)
    # remat the block body: without it the lax.map backward stores every
    # block's (block, 2N) exp-matrix — O((2N)^2) HBM, a 64 GB allocation at
    # 2N=131k that OOMs a v5e (measured, benchmarks/gram_profile.py).
    # Recomputing the block gram in the backward keeps HBM at
    # O(block * 2N) for ~2x gram FLOPs, which is negligible next to the
    # model convs.
    pos_s, other_s, tot_s, part = jax.lax.map(jax.checkpoint(one_block), starts)
    flat = lambda a: a.reshape(-1)[:m]
    return flat(pos_s), flat(other_s), flat(tot_s), flat(part)


# Backend switch for the debiased-contrastive row stats. "auto" uses the
# Pallas flash-gram kernel (ops/pallas_gram.py) on TPU — it keeps the
# (2N, 2N) sims matrix out of HBM entirely and won its real-v5e A/B
# (benchmarks/gram_ab.py: value 8.2 vs 9.1 ms, grad 12.6 vs 16.7 ms at the
# refine shape; value parity 2e-6, grad parity 9e-4 — the backward's
# w-matmuls run at Mosaic's native single-pass bf16, covered by the bf16
# e2e quality gates) — and the XLA blocked path everywhere else
# (CPU tests, interpret-unfriendly backends). CET_PALLAS_GRAM=0 disables.
PALLAS_GRAM = os.environ.get("CET_PALLAS_GRAM", "auto")

# the one (row-block) config the remote Mosaic compiler accepts; rb >= 64
# and explicit precision args crash it (see ops/pallas_gram.py)
_PALLAS_GRAM_RB = 32


def _pallas_gram_enabled():
    if PALLAS_GRAM in ("0", "off", "false"):
        return False
    if PALLAS_GRAM in ("1", "on", "true"):
        return True
    return jax.default_backend() == "tpu"


# Validated VMEM envelope for the kernels (benchmarks/gram_ab.py compiled
# and won at M=24576, C=32, rb=32; the resident feats copies + gradient
# accumulator + (rb, M) stripes scale with M and M*C, and Mosaic aborts at
# compile time when VMEM is exhausted). Shapes outside the envelope fall
# back to the blocked XLA path instead of hitting that cliff.
_PALLAS_GRAM_MAX_M = 24576
_PALLAS_GRAM_MAX_ELEMS = 24576 * 32


def pallas_gram_fits(m, c):
    return m <= _PALLAS_GRAM_MAX_M and m * c <= _PALLAS_GRAM_MAX_ELEMS


def pallas_gram_backend(backend, m, c):
    """Resolve one loss call's gram backend: True = the Pallas kernel.

    Shared by _row_stats, _row_logit_stats, and supervised.supcon_v2_loss
    so the envelope/env gate cannot drift between the three dispatches."""
    want = backend == "pallas" or (
        backend == "auto" and _pallas_gram_enabled())
    return want and pallas_gram_fits(m, c)


def pallas_gram_step_gate(config):
    """True when a train step may drive the Pallas gram kernels.

    The kernels must ride a sequential ``lax.map`` (their vmap batching
    rule crashes the remote Mosaic compiler), and a lax.map must not scan
    a GSPMD-sharded batch axis — so the gate mirrors
    parallel.mesh.auto_dp_step's mesh policy: TPU backend, no --mesh_shape,
    exactly one device. Shared by train/refine.py and train/supervised.py
    so the invariant cannot drift between them."""
    return (
        _pallas_gram_enabled()
        and not config.mesh_shape
        and len(jax.devices()) == 1
    )


def _row_stats(feats_all, pos_mask, other_mask, temp, block, backend="auto"):
    """Dispatch the gram row stats: Pallas fused kernel on TPU, XLA blocked
    lowering elsewhere. Identical outputs (see tests/test_pallas_gram.py).

    backend: "auto" (env + jax backend), "pallas", or "xla". Callers that
    vmap this function MUST force "xla" — the Pallas kernel's vmap batching
    rule re-lowers it in a form the remote Mosaic compiler rejects; the
    train step uses lax.map instead (train/refine.py). Shapes outside the
    validated VMEM envelope quietly take the XLA path either way."""
    if pallas_gram_backend(backend, *feats_all.shape):
        from cet_pick_tpu.ops.pallas_gram import gram_row_stats

        ps, os_, ts = gram_row_stats(
            feats_all, pos_mask, other_mask, temp, _PALLAS_GRAM_RB, False
        )
        m = feats_all.shape[0]
        n = m // 2
        pidx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
        psims = (feats_all * feats_all[pidx]).sum(axis=1) / temp
        partner = jnp.exp(psims - 1.0 / temp)
        return ps, os_, ts, partner
    return _row_stats_blocked(feats_all, pos_mask, other_mask, temp, block)


def _calc_g(pos_mean, neg_mean, class_prob, temp):
    """Debiased negative estimate, clamped at e^(-1/T) (loss.py:588-592)."""
    ng = (neg_mean - class_prob * pos_mean) / (1 - class_prob)
    return jnp.maximum(ng, np.e ** (-1.0 / temp))


@partial(jax.jit,
         static_argnames=("temp", "tau_plus", "thresh", "block", "backend"))
def unbiased_con_loss(
    labels, out_hm, out_hm_cr, feats, feats_cr,
    temp=0.07, tau_plus=0.1, thresh=0.5, block=1024, backend="auto",
):
    """Debiased contrastive regularization (loss.py:571-699).

    labels: (N,) gt heatmap values; out_hm/out_hm_cr: (N,) sigmoid heatmaps of
    the two views; feats/feats_cr: (N, C) L2-normalized pixel features of the
    two views (aug view un-flipped by the caller).

    Returns (debiased_loss_sup, debiased_loss_unsup, num_pos).
    """
    n = labels.shape[0]
    feats_all = jnp.concatenate([feats, feats_cr], axis=0)
    all_labels = jnp.concatenate([labels, labels], axis=0)
    all_preds = jnp.concatenate([out_hm, out_hm_cr], axis=0)

    if thresh < 1:
        pos_labels = (all_labels > thresh).astype(feats.dtype)
    else:
        pos_labels = (all_labels == 1).astype(feats.dtype)
    un_labels = (all_labels < 0).astype(feats.dtype)
    other_inds = (all_labels < thresh).astype(feats.dtype)

    num_pos_total = pos_labels.sum()
    num_pos = num_pos_total / 2
    num_of_negatives = 2 * (n - num_pos)

    pos_sum, other_sum, total_sum, partner = _row_stats(
        feats_all, pos_labels, other_inds, temp, block, backend
    )

    # --- supervised branch: rows with positive labels (loss.py:652-657)
    pos_feat_mean = pos_sum / jnp.maximum(num_pos_total - 1, 1.0)
    rem_feat_mean = other_sum / jnp.maximum(other_inds.sum(), 1.0)
    ng = _calc_g(pos_feat_mean, rem_feat_mean, tau_plus, temp)
    sup_rows = -jnp.log(pos_feat_mean / (pos_feat_mean + ng))
    sup = _safe_div((sup_rows * pos_labels).sum(), num_pos_total)

    # --- unlabeled branch (loss.py:660-695)
    u_pos = partner                                     # counterpart similarity
    u_rem = (total_sum - partner) / jnp.maximum(num_of_negatives, 1.0)
    ng_pos = _calc_g(u_pos, u_rem, tau_plus, temp)
    ng_neg = _calc_g(u_pos, u_rem, 1 - tau_plus, temp)
    p = all_preds

    l_pos = -jnp.log(u_pos / (u_pos + ng_pos)) * p
    l_neg = -jnp.log(u_pos / (u_pos + ng_neg)) * (1 - p)

    m_pseudo_pos = un_labels * (p > 0.99)
    m_pseudo_neg = un_labels * (p < 0.01)
    m_mid = un_labels * (p >= 0.01) * (p <= 0.99)

    def masked_mean(x, m):
        return _safe_div((x * m).sum(), m.sum())

    n_pp, n_pn, n_mid = m_pseudo_pos.sum(), m_pseudo_neg.sum(), m_mid.sum()
    term_pp = jnp.where(n_pp > 0, masked_mean(l_pos, m_pseudo_pos), 0.0)
    term_pn = jnp.where(n_pn > 0, masked_mean(l_neg, m_pseudo_neg), 0.0)
    term_mid = jnp.where(
        n_mid > 0, masked_mean(l_pos, m_mid) + masked_mean(l_neg, m_mid), 0.0
    )
    unsup = term_pp + term_pn + term_mid
    return sup, unsup, num_pos_total


def _row_logit_stats_blocked(feats_all, pos_mask, temp, block):
    """Per-row reductions needed by the supervised (pn) loss, in row blocks.

    Matches SupConLossV2_more's order of operations (loss.py:776-808): logits
    divided by T, shifted by the detached row max, the diagonal ZEROED before
    exp (so it contributes exp(0) = 1 to row sums and logit 0 to log sums).
    As in _row_stats_blocked, the shift is the constant 1/T — equal to the
    reference's row max for the L2-normalized features this is called with,
    up to the dot product's fp error — which deletes the max reduction's
    full read pass of ``sims``.
    Returns per row i:
      logit_pos_sum[i] = sum_{j in pos} shifted_masked_logit_ij
      partner_logit[i] = shifted_masked_logit_{i, i±N}
      total_sum[i]     = sum_j exp(shifted_masked_logit_ij)  (incl. diagonal)
    """
    m = feats_all.shape[0]
    n = m // 2
    pad = (-m) % block
    fT = feats_all.T
    rowshift = 1.0 / temp

    def one_block(start):
        idx = start + jnp.arange(block)
        valid = idx < m
        rows = feats_all[jnp.clip(idx, 0, m - 1)]
        sims = jnp.matmul(rows, fT, precision=_gram_precision()) / temp
        col = jnp.arange(m)[None, :]
        offdiag = (col != idx[:, None]).astype(sims.dtype)
        logits = (sims - rowshift) * offdiag  # diagonal -> 0 (loss.py:787)
        # fused multiply-sums, not dots — see _row_stats_blocked: keeps the
        # (block, 2N) logits/exp tensors out of HBM
        logit_pos_sum = (logits * pos_mask[None, :]).sum(axis=1)
        total_sum = jnp.exp(logits).sum(axis=1)
        # partner is always off-diagonal, so its masked logit is just the
        # shifted similarity, recomputed directly from the feature vectors
        partner_idx = jnp.clip(jnp.where(idx < n, idx + n, idx - n), 0, m - 1)
        partner_sims = (rows * feats_all[partner_idx]).sum(axis=1) / temp
        partner = partner_sims - rowshift
        z = jnp.where(valid, 1.0, 0.0)
        return logit_pos_sum * z, partner * z, total_sum * z

    starts = jnp.arange(0, m + pad, block)
    # remat for the same reason as _row_stats_blocked: without it the
    # lax.map backward stores every block's (block, 2N) logits/exp matrices
    lps, part, tot = jax.lax.map(jax.checkpoint(one_block), starts)
    flat = lambda a: a.reshape(-1)[:m]
    return flat(lps), flat(part), flat(tot)


def _row_logit_stats(feats_all, pos_mask, temp, block, backend="auto"):
    """Dispatch like _row_stats: Pallas gram_logit_stats on TPU (partner
    logit recomputed O(M*C) outside), XLA blocked lowering elsewhere.
    Same vmap caveat — force backend="xla" under vmap."""
    if pallas_gram_backend(backend, *feats_all.shape):
        from cet_pick_tpu.ops.pallas_gram import gram_logit_stats

        lsum, tot = gram_logit_stats(
            feats_all, pos_mask, temp, _PALLAS_GRAM_RB, False
        )
        m = feats_all.shape[0]
        n = m // 2
        pidx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
        psims = (feats_all * feats_all[pidx]).sum(axis=1) / temp
        partner = psims - 1.0 / temp
        return lsum, partner, tot
    return _row_logit_stats_blocked(feats_all, pos_mask, temp, block)


@partial(jax.jit, static_argnames=("temp", "thresh", "block", "backend"))
def supcon_loss(labels, feats, feats_cr, temp=0.07, thresh=0.5, block=1024,
                backend="auto"):
    """Supervised pixel contrastive loss for --pn mode, matching
    SupConLossV2_more (loss.py:759-818) exactly:

    * positive rows: mean over ALL positive columns (self included, where the
      zeroed-diagonal logit contributes 0) of log-softmax terms, normalized
      by the total positive count;
    * unlabeled (< thresh) rows: log-softmax of the augmented-counterpart
      column only;
    * loss = -(mean over positive rows) - (mean over unlabeled rows).
    """
    feats_all = jnp.concatenate([feats, feats_cr], axis=0)
    all_labels = jnp.concatenate([labels, labels], axis=0)
    pos = (all_labels > thresh).astype(feats.dtype)
    unl = (all_labels < thresh).astype(feats.dtype)

    logit_pos_sum, partner_logit, total_sum = _row_logit_stats(
        feats_all, pos, temp, block, backend
    )
    num_pos_total = pos.sum()
    log_tot = jnp.log(jnp.maximum(total_sum, 1e-12))

    mean_log_prob_pos = (
        logit_pos_sum - num_pos_total * log_tot
    ) / jnp.maximum(num_pos_total, 1.0)
    sup = _safe_div((mean_log_prob_pos * pos).sum(), num_pos_total)

    neg_rows = partner_logit - log_tot
    negs = _safe_div((neg_rows * unl).sum(), unl.sum())
    return -sup - negs


# ---------------------------------------------------------------------------
# consistency + simsiam
# ---------------------------------------------------------------------------

def consistency_loss(out_prob, out_prob_cr):
    """MSE between the two views' heatmaps (loss.py:701-712)."""
    return jnp.mean((out_prob - out_prob_cr) ** 2)


def simsiam_loss(p1, z1, p2, z2):
    """Symmetric negative cosine similarity with stop-gradient targets.

    Matches TomoSimSiamLoss (trains/tomo_simsiam_trainer.py:28-40): the model
    already detaches z (we stop_gradient here for safety), loss =
    -(cos(p1, z2) + cos(p2, z1)) / 2. Also returns the output std collapse
    monitor (mean over feature dims of per-dim std of normalized z1).
    """
    def _cos(a, b):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return (a * b).sum(axis=-1).mean()

    z1 = jax.lax.stop_gradient(z1)
    z2 = jax.lax.stop_gradient(z2)
    loss = -(_cos(p1, z2) + _cos(p2, z1)) / 2

    z1n = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-12)
    std_monitor = z1n.std(axis=0).mean()
    return loss, std_monitor
