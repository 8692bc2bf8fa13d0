"""Golden-value loss tests against the actual reference PyTorch code.

SURVEY.md §7 'hard parts' requires golden-value validation of the PU +
contrastive losses on fixed tensors. These tests import the reference's
loss.py from /root/reference (skipped if absent) and compare exact values.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "cet_pick")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def torch_losses():
    sys.path.insert(0, REFERENCE)
    import torch  # noqa: F401

    from cet_pick.models import loss as ref_loss

    return ref_loss


class Opt:
    thresh = 0.5
    device = "cpu"


def _fixed(rng, n=96, c=16, pos_frac=0.08):
    labels = np.where(rng.random(n) < pos_frac, 1.0, -1.0).astype(np.float32)
    labels[:3] = 1.0
    hm1 = rng.uniform(1e-4, 1 - 1e-4, n).astype(np.float32)
    hm2 = rng.uniform(1e-4, 1 - 1e-4, n).astype(np.float32)
    f1 = rng.standard_normal((n, c)).astype(np.float32)
    f2 = rng.standard_normal((n, c)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=1, keepdims=True)
    return labels, hm1, hm2, f1, f2


def test_focal_loss_golden(torch_losses, rng):
    import torch

    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import focal_loss

    gt = np.where(rng.random(200) < 0.05, 1.0, 0.0).astype(np.float32)
    gt[rng.random(200) < 0.1] = -1.0
    gt[:2] = 1.0
    pred = rng.uniform(1e-4, 1 - 1e-4, 200).astype(np.float32)
    with torch.no_grad():
        ref = torch_losses.FocalLoss()(
            torch.from_numpy(pred), torch.from_numpy(gt)
        ).item()
    ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_pu_focal_loss_golden(torch_losses, rng):
    import torch

    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import pu_focal_loss

    labels, hm1, _, _, _ = _fixed(rng, n=300)
    with torch.no_grad():
        ref = torch_losses.PULoss(0.1)(
            torch.from_numpy(hm1), torch.from_numpy(labels)
        ).item()
    ours, _ = pu_focal_loss(jnp.asarray(hm1), jnp.asarray(labels), tau=0.1)
    assert float(ours) == pytest.approx(ref, rel=1e-5)


def test_unbiased_con_loss_golden(torch_losses, rng):
    import torch

    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import unbiased_con_loss

    labels, hm1, hm2, f1, f2 = _fixed(rng)
    labels = np.where(labels == 1.0, 1.0, -1.0).astype(np.float32)
    with torch.no_grad():
        ref = torch_losses.UnbiasedConLoss(0.07, 0.1)(
            torch.from_numpy(labels), torch.from_numpy(hm1),
            torch.from_numpy(hm2), torch.from_numpy(f1),
            torch.from_numpy(f2), Opt(),
        )
    ref_sup, ref_unsup = (r.item() if hasattr(r, "item") else float(r)
                          for r in ref)
    sup, unsup, _ = unbiased_con_loss(
        jnp.asarray(labels), jnp.asarray(hm1), jnp.asarray(hm2),
        jnp.asarray(f1), jnp.asarray(f2), temp=0.07, tau_plus=0.1,
        thresh=0.5, block=64,
    )
    # the sup term is -log(p/(p+Ng)) with Ng/p ~ 1e-5: computing log(1-eps)
    # at f32 carries ~1% relative noise in BOTH implementations (verified:
    # the pos/rem feature means agree to 7 significant digits) — compare
    # with a tolerance matching that noise floor
    assert float(sup) == pytest.approx(ref_sup, rel=5e-2)
    assert float(unsup) == pytest.approx(ref_unsup, rel=5e-2)


def test_supcon_loss_golden(torch_losses, rng):
    import torch

    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import supcon_loss

    labels, _, _, f1, f2 = _fixed(rng)
    labels = np.where(labels == 1.0, 1.0, 0.0).astype(np.float32)
    with torch.no_grad():
        ref = torch_losses.SupConLossV2_more(0.07)(
            torch.from_numpy(labels), None, None,
            torch.from_numpy(f1), torch.from_numpy(f2), Opt(),
        ).item()
    ours = float(supcon_loss(jnp.asarray(labels), jnp.asarray(f1),
                             jnp.asarray(f2), temp=0.07, thresh=0.5, block=64))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_consistency_loss_golden(torch_losses, rng):
    import torch

    import jax.numpy as jnp

    from cet_pick_tpu.train.losses import consistency_loss

    a = rng.random(500).astype(np.float32)
    b = rng.random(500).astype(np.float32)
    with torch.no_grad():
        ref = torch_losses.ConsistencyLoss()(
            torch.from_numpy(a), torch.from_numpy(b)
        ).item()
    ours = float(consistency_loss(jnp.asarray(a), jnp.asarray(b)))
    assert ours == pytest.approx(ref, rel=1e-5)
