"""Pallas TPU kernel: fused contrastive gram row-stats (flash-softmax style).

The debiased contrastive loss (train/losses._row_stats_blocked, reference
loss.py:571-699) is HBM-traffic-bound: the XLA lowering materializes each
(block, 2N) sims stripe in HBM (one write + one fused exp/mask/reduce read
per pass — benchmarks/train_roofline.py), ~2.4 GB per 24.5k-pixel sample
and again in the remat'd backward. But the FEATURES are tiny ((2N, C) ==
24576 x 32 == 3 MB f32): this kernel keeps them resident in VMEM, computes
each (RB, 2N) sims stripe on the MXU, and reduces it in place — the sims
matrix never exists in HBM. HBM traffic drops to reading feats once and
writing the three (2N,) row-stats.

Same math as _row_stats_blocked: with L2-normalized features the softmax
shift is the constant 1/T (row max == diagonal == 1/T), the diagonal's exp
argument is forced to 0 (e_ii = 1), padded columns are masked to 0.

The custom VJP recomputes each e-stripe (flash style) and accumulates
  dL/df_r = sum_j w_rj f_j  +  sum_i w_ir f_i,   w_ij = e_ij * a_ij / T,
  a_ij = g_pos_i p_j + g_other_i o_j + g_tot_i   (w_ii = 0),
where the column term sums into a VMEM-resident (2N, C) accumulator across
the sequential grid (its output block index is constant, so Mosaic keeps it
in VMEM between steps). Layout rules learned from ops/pallas_head.py: no
in-kernel transposes or lane<->sublane reshapes (they crash this remote
Mosaic backend) — both gradient matmuls are lax.dot_general contractions,
per-row cotangents ride as (M, 1) columns, and the diagonal test broadcasts
a (RB, 1) sublane iota against a (1, M) lane iota instead of materializing
(RB, M) int32 planes.

Wired into train/losses.unbiased_con_loss only if the real-chip A/B
(benchmarks/gram_ab.py) confirms the win; interpret-mode tests pin
correctness (values and gradients) against the XLA path either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# f32 matmul precision inside the kernel: the MXU multiplies in bf16, and a
# single pass gives ~1e-3 similarity error that the debiasing terms are
# sensitive to (train/losses.py keeps the XLA gram at HIGHEST for the same
# reason). Passing precision=HIGHEST/HIGH to an in-kernel dot_general
# crashes the remote Mosaic compiler (HTTP 500 from tpu_compile_helper, all
# block sizes), and so do in-kernel f32->bf16 casts — so the feature
# operands are split into bf16 hi + lo pairs OUTSIDE the kernel (XLA side)
# and the sims product is the 3-pass sum of native single-pass MXU dots
# (hh + hl + lh; the dropped ll term is ~2^-16 relative, matching
# lax.Precision.HIGH). The backward's w-matmuls keep the plain f32
# dot_general (Mosaic's own single-pass bf16 lowering, the one form that
# compiles) — the ~2^-9-relative error there is not exp-amplified and sits
# below bf16-training noise; the bf16 e2e quality gates cover it.


def _dot3(ah, al, bh, bl, dims):
    """3-pass f32-emulating product of pre-split bf16 hi/lo operands.

    Accumulated SEQUENTIALLY (s = hh; s += hl; s += lh) so at most two
    (RB, M) stripes are live at once — summing three dot results in one
    expression kept three alive and blew VMEM at RB >= 64."""
    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    s = d(ah, bh)
    s = s + d(ah, bl)
    s = s + d(al, bh)
    return s


def _split_hi_lo(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~2^-16 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _diag_mask(i, rb, m):
    """(RB, M) boolean 'is off-diagonal' from two thin iotas."""
    row = i * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    return row != col  # broadcasts to (rb, m)


def _col_valid(m, m_real):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    return col < m_real  # (1, m)


def _fwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, masks_ref,
                pos_ref, other_ref, tot_ref, *, rb, m, m_real, temp):
    i = pl.program_id(0)
    # sims stripe on the MXU: contract the lane (C) dims — an "NT" matmul,
    # no transpose materialized
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)            # (rb, m)
    offdiag = _diag_mask(i, rb, m)
    e = jnp.exp(jnp.where(offdiag, sims - 1.0 / temp, 0.0))
    e = jnp.where(_col_valid(m, m_real), e, 0.0)         # padded cols -> 0
    pmask = masks_ref[0:1, :]                            # (1, m)
    omask = masks_ref[1:2, :]
    pos_ref[...] = jnp.sum(e * pmask, axis=1, keepdims=True)
    other_ref[...] = jnp.sum(e * omask, axis=1, keepdims=True)
    tot_ref[...] = jnp.sum(e, axis=1, keepdims=True)


def _bwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, f_ref, r_ref, masks_ref,
                g_ref, grow_ref, gcol_ref, *, rb, m, m_real, temp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gcol_ref[...] = jnp.zeros_like(gcol_ref)

    feats = f_ref[...]                                   # (m, c) f32
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)
    offdiag = _diag_mask(i, rb, m)
    keep = offdiag & _col_valid(m, m_real)
    e = jnp.exp(jnp.where(offdiag, sims - 1.0 / temp, 0.0))
    pmask = masks_ref[0:1, :]                            # (1, m)
    omask = masks_ref[1:2, :]
    gp = g_ref[:, 0:1]                                   # (rb, 1) cotangents
    go = g_ref[:, 1:2]
    gt = g_ref[:, 2:3]
    a = gp * pmask + go * omask + gt                     # (rb, m)
    w = jnp.where(keep, e * a * (1.0 / temp), 0.0)
    # row term: (rb, m) @ (m, c) -> (rb, c)
    grow_ref[...] = jax.lax.dot_general(
        w, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # column term: contract the rb (sublane) dims: w^T . rows -> (m, c),
    # accumulated across the sequential grid in VMEM
    gcol_ref[...] += jax.lax.dot_general(
        w, r_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_to(x, mult, axis=0):
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gram_row_stats(feats, pos_mask, other_mask, temp, rb=32,
                   interpret=False):
    """Fused row stats of e = exp((f f^T / T - 1/T) * offdiag).

    feats (M, C) L2-normalized f32; pos_mask/other_mask (M,) f32.
    Returns (pos_sum, other_sum, total_sum), each (M,):
      pos_sum[i]   = sum_j e_ij * pos_mask[j]
      other_sum[i] = sum_j e_ij * other_mask[j]
      total_sum[i] = sum_j e_ij                (diagonal contributes 1)

    Matches train/losses._row_stats_blocked's first three outputs exactly
    (the partner column is O(M*C) and stays outside). Gradients flow to
    ``feats`` only (masks are data, not parameters).
    """
    out, _ = _gram_fwd(feats, pos_mask, other_mask, temp, rb, interpret)
    return out


def _masks_2d(pos_mask, other_mask, rb):
    return jnp.stack([
        _pad_to(pos_mask.astype(jnp.float32), rb),
        _pad_to(other_mask.astype(jnp.float32), rb),
    ])


def _gram_fwd(feats, pos_mask, other_mask, temp, rb, interpret):
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _masks_2d(pos_mask, other_mask, rb)           # (2, m)
    fh, fl = _split_hi_lo(fp)
    nr = m // rb
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))       # VMEM-resident
    masks_spec = pl.BlockSpec((2, m), lambda i: (0, 0))
    col_spec = pl.BlockSpec((rb, 1), lambda i: (i, 0))
    pos_s, other_s, tot_s = pl.pallas_call(
        functools.partial(_fwd_kernel, rb=rb, m=m, m_real=m_real, temp=temp),
        grid=(nr,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, masks_spec],
        out_specs=[col_spec, col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(fh, fl, fh, fl, masks)
    out = (pos_s[:m_real, 0], other_s[:m_real, 0], tot_s[:m_real, 0])
    return out, (feats, pos_mask, other_mask)


def _gram_bwd(temp, rb, interpret, res, cts):
    feats, pos_mask, other_mask = res
    g_pos, g_other, g_tot = cts
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _masks_2d(pos_mask, other_mask, rb)
    # cotangents ride as (m, 3) columns; padded rows have zero cotangent so
    # their w-rows vanish
    g = jnp.stack([
        _pad_to(g_pos.astype(jnp.float32), rb),
        _pad_to(g_other.astype(jnp.float32), rb),
        _pad_to(g_tot.astype(jnp.float32), rb),
    ], axis=1)                                            # (m, 3)
    fh, fl = _split_hi_lo(fp)
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    masks_spec = pl.BlockSpec((2, m), lambda i: (0, 0))
    g_spec = pl.BlockSpec((rb, 3), lambda i: (i, 0))
    grow_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    gcol_spec = pl.BlockSpec((m, c), lambda i: (0, 0))    # accumulated
    grow, gcol = pl.pallas_call(
        functools.partial(_bwd_kernel, rb=rb, m=m, m_real=m_real, temp=temp),
        grid=(m // rb,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, f_spec, rows_spec,
                  masks_spec, g_spec],
        out_specs=[grow_spec, gcol_spec],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.float32)] * 2,
        interpret=interpret,
    )(fh, fl, fh, fl, fp, fp, masks, g)
    grad = (grow + gcol)[:m_real].astype(feats.dtype)
    return grad, None, None


gram_row_stats.defvjp(_gram_fwd, _gram_bwd)


# ---------------------------------------------------------------------------
# supcon (pn-mode) variant: logit row stats for SupConLossV2_more
# (train/losses._row_logit_stats_blocked, reference loss.py:776-808)
# ---------------------------------------------------------------------------


def _logit_fwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, masks_ref,
                      lsum_ref, tot_ref, *, rb, m, m_real, temp):
    i = pl.program_id(0)
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)            # (rb, m)
    offdiag = _diag_mask(i, rb, m)
    cv = _col_valid(m, m_real)
    logits = jnp.where(offdiag & cv, sims - 1.0 / temp, 0.0)
    pmask = masks_ref[0:1, :]                            # (1, m)
    lsum_ref[...] = jnp.sum(logits * pmask, axis=1, keepdims=True)
    # the diagonal's zeroed logit contributes exp(0) = 1, like the XLA
    # path; padded columns (absent there) are excluded
    tot_ref[...] = jnp.sum(jnp.where(cv, jnp.exp(logits), 0.0),
                           axis=1, keepdims=True)


def _logit_bwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, f_ref, r_ref,
                      masks_ref, g_ref, grow_ref, gcol_ref,
                      *, rb, m, m_real, temp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gcol_ref[...] = jnp.zeros_like(gcol_ref)

    feats = f_ref[...]                                   # (m, c) f32
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)
    offdiag = _diag_mask(i, rb, m)
    keep = offdiag & _col_valid(m, m_real)
    e = jnp.exp(jnp.where(keep, sims - 1.0 / temp, 0.0))
    pmask = masks_ref[0:1, :]
    ga = g_ref[:, 0:1]                                   # d/d lsum  (rb, 1)
    gb = g_ref[:, 1:2]                                   # d/d total (rb, 1)
    w = jnp.where(keep, (ga * pmask + gb * e) * (1.0 / temp), 0.0)
    grow_ref[...] = jax.lax.dot_general(
        w, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gcol_ref[...] += jax.lax.dot_general(
        w, r_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gram_logit_stats(feats, pos_mask, temp, rb=32, interpret=False):
    """Fused row stats of the shifted masked logits (supcon / pn mode).

    logits_ij = (f_i . f_j / T - 1/T) * offdiag. Returns per row i:
      logit_pos_sum[i] = sum_j logits_ij * pos_mask[j]
      total_sum[i]     = sum_j exp(logits_ij)   (diagonal contributes 1)

    Matches train/losses._row_logit_stats_blocked's first and third outputs
    (the partner logit is O(M*C) and stays outside)."""
    out, _ = _logit_fwd(feats, pos_mask, temp, rb, interpret)
    return out


def _logit_fwd(feats, pos_mask, temp, rb, interpret):
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _pad_to(pos_mask.astype(jnp.float32), rb)[None, :]  # (1, m)
    fh, fl = _split_hi_lo(fp)
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    masks_spec = pl.BlockSpec((1, m), lambda i: (0, 0))
    col_spec = pl.BlockSpec((rb, 1), lambda i: (i, 0))
    lsum, tot = pl.pallas_call(
        functools.partial(_logit_fwd_kernel, rb=rb, m=m, m_real=m_real,
                          temp=temp),
        grid=(m // rb,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, masks_spec],
        out_specs=[col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.float32)] * 2,
        interpret=interpret,
    )(fh, fl, fh, fl, masks)
    return (lsum[:m_real, 0], tot[:m_real, 0]), (feats, pos_mask)


def _logit_bwd(temp, rb, interpret, res, cts):
    feats, pos_mask = res
    g_lsum, g_tot = cts
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _pad_to(pos_mask.astype(jnp.float32), rb)[None, :]
    g = jnp.stack([
        _pad_to(g_lsum.astype(jnp.float32), rb),
        _pad_to(g_tot.astype(jnp.float32), rb),
    ], axis=1)                                            # (m, 2)
    fh, fl = _split_hi_lo(fp)
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    masks_spec = pl.BlockSpec((1, m), lambda i: (0, 0))
    g_spec = pl.BlockSpec((rb, 2), lambda i: (i, 0))
    grow_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    gcol_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    grow, gcol = pl.pallas_call(
        functools.partial(_logit_bwd_kernel, rb=rb, m=m, m_real=m_real,
                          temp=temp),
        grid=(m // rb,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, f_spec, rows_spec,
                  masks_spec, g_spec],
        out_specs=[grow_spec, gcol_spec],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.float32)] * 2,
        interpret=interpret,
    )(fh, fl, fh, fl, fp, fp, masks, g)
    grad = (grow + gcol)[:m_real].astype(feats.dtype)
    return grad, None


gram_logit_stats.defvjp(_logit_fwd, _logit_bwd)


# ---------------------------------------------------------------------------
# single-view supcon variant (cr task): raw-feature gram with a real row max
# (train/supervised.supcon_v2_loss, reference loss.py:821-868)
# ---------------------------------------------------------------------------


def _v2_fwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, masks_ref,
                   mx_ref, psum_ref, nsum_ref, tot_ref,
                   *, rb, m, m_real, temp):
    i = pl.program_id(0)
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)            # (rb, m)
    offdiag = _diag_mask(i, rb, m)
    cv = _col_valid(m, m_real)
    # reference order: mask the diagonal to 0 BEFORE the max
    sims = jnp.where(offdiag, sims, 0.0)
    # padded columns must not win the max or enter any sum
    mx = jnp.max(jnp.where(cv, sims, -jnp.inf), axis=1, keepdims=True)
    pmask = masks_ref[0:1, :]
    nmask = masks_ref[1:2, :]
    psum_ref[...] = jnp.sum(sims * pmask, axis=1, keepdims=True)
    nsum_ref[...] = jnp.sum(sims * nmask, axis=1, keepdims=True)
    tot_ref[...] = jnp.sum(
        jnp.where(cv, jnp.exp(sims - mx), 0.0), axis=1, keepdims=True)
    mx_ref[...] = mx


def _v2_bwd_kernel(rh_ref, rl_ref, fh_ref, fl_ref, f_ref, r_ref,
                   masks_ref, mx_ref, g_ref, grow_ref, gcol_ref,
                   *, rb, m, m_real, temp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gcol_ref[...] = jnp.zeros_like(gcol_ref)

    feats = f_ref[...]
    sims = _dot3(rh_ref[...], rl_ref[...], fh_ref[...], fl_ref[...],
                 ((1,), (1,))) * (1.0 / temp)
    keep = _diag_mask(i, rb, m) & _col_valid(m, m_real)
    sims = jnp.where(keep, sims, 0.0)
    e = jnp.exp(sims - mx_ref[...])                      # (rb, m), mx (rb, 1)
    pmask = masks_ref[0:1, :]
    nmask = masks_ref[1:2, :]
    ga = g_ref[:, 0:1]                                   # d/d psum
    gb = g_ref[:, 1:2]                                   # d/d nsum
    gc = g_ref[:, 2:3]                                   # d/d tot
    # mx is stop-gradient (reference uses a detached row max), so only the
    # direct sims paths contribute
    w = jnp.where(keep, (ga * pmask + gb * nmask + gc * e) * (1.0 / temp),
                  0.0)
    grow_ref[...] = jax.lax.dot_general(
        w, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gcol_ref[...] += jax.lax.dot_general(
        w, r_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gram_supcon_v2_stats(feats, pos_mask, neg_mask, temp, rb=32,
                         interpret=False):
    """Fused row stats for the single-view supcon gram (cr task).

    sims_ij = (f_i . f_j) * offdiag / T with RAW (un-normalized) features —
    the row max is real, computed per VMEM stripe and returned detached.
    Returns (rowmax, pos_sims, neg_sims, tot), each (M,):
      rowmax[i]   = max_j sims_ij                 (stop-gradient)
      pos_sims[i] = sum_j sims_ij * pos_mask[j]
      neg_sims[i] = sum_j sims_ij * neg_mask[j]
      tot[i]      = sum_j exp(sims_ij - rowmax[i])
    """
    out, _ = _v2_fwd(feats, pos_mask, neg_mask, temp, rb, interpret)
    return out


def _v2_fwd(feats, pos_mask, neg_mask, temp, rb, interpret):
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _masks_2d(pos_mask, neg_mask, rb)
    fh, fl = _split_hi_lo(fp)
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    masks_spec = pl.BlockSpec((2, m), lambda i: (0, 0))
    col_spec = pl.BlockSpec((rb, 1), lambda i: (i, 0))
    mx, ps, ns, tot = pl.pallas_call(
        functools.partial(_v2_fwd_kernel, rb=rb, m=m, m_real=m_real,
                          temp=temp),
        grid=(m // rb,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, masks_spec],
        out_specs=[col_spec, col_spec, col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.float32)] * 4,
        interpret=interpret,
    )(fh, fl, fh, fl, masks)
    out = (jax.lax.stop_gradient(mx[:m_real, 0]), ps[:m_real, 0],
           ns[:m_real, 0], tot[:m_real, 0])
    return out, (feats, pos_mask, neg_mask, mx)


def _v2_bwd(temp, rb, interpret, res, cts):
    feats, pos_mask, neg_mask, mx = res
    _, g_ps, g_ns, g_tot = cts                           # rowmax is detached
    m_real, c = feats.shape
    fp = _pad_to(feats.astype(jnp.float32), rb)
    m = fp.shape[0]
    masks = _masks_2d(pos_mask, neg_mask, rb)
    g = jnp.stack([
        _pad_to(g_ps.astype(jnp.float32), rb),
        _pad_to(g_ns.astype(jnp.float32), rb),
        _pad_to(g_tot.astype(jnp.float32), rb),
    ], axis=1)                                            # (m, 3)
    fh, fl = _split_hi_lo(fp)
    rows_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    f_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    masks_spec = pl.BlockSpec((2, m), lambda i: (0, 0))
    mx_spec = pl.BlockSpec((rb, 1), lambda i: (i, 0))
    g_spec = pl.BlockSpec((rb, 3), lambda i: (i, 0))
    grow_spec = pl.BlockSpec((rb, c), lambda i: (i, 0))
    gcol_spec = pl.BlockSpec((m, c), lambda i: (0, 0))
    grow, gcol = pl.pallas_call(
        functools.partial(_v2_bwd_kernel, rb=rb, m=m, m_real=m_real,
                          temp=temp),
        grid=(m // rb,),
        in_specs=[rows_spec, rows_spec, f_spec, f_spec, f_spec, rows_spec,
                  masks_spec, mx_spec, g_spec],
        out_specs=[grow_spec, gcol_spec],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.float32)] * 2,
        interpret=interpret,
    )(fh, fl, fh, fl, fp, fp, masks, mx, g)
    grad = (grow + gcol)[:m_real].astype(feats.dtype)
    return grad, None, None


gram_supcon_v2_stats.defvjp(_v2_fwd, _v2_bwd)
