"""Dedicated tomo/cr supervised loops (tomo_trainer.py / tomo_cr_trainer.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cet_pick_tpu.config import Config
from cet_pick_tpu.data.refine_dataset import RefineDataset
from cet_pick_tpu.train.supervised import (
    supcon_v2_loss,
    tomo_site_supcon,
    train_supervised,
)
from tests.test_e2e import make_synthetic


def test_supcon_v2_prefers_grouped(rng):
    """Positives clustered + negatives clustered -> lower loss than mixed."""
    f = rng.standard_normal((32, 8)).astype(np.float32) * 0.05
    f[:16] += np.array([3] + [0] * 7, np.float32)
    f[16:] += np.array([0, 3] + [0] * 6, np.float32)
    hm_good = np.array([1.0] * 16 + [0.0] * 16, np.float32)
    hm_bad = np.array([1.0, 0.0] * 16, np.float32)
    good = float(supcon_v2_loss(jnp.asarray(f), jnp.asarray(hm_good)))
    bad = float(supcon_v2_loss(jnp.asarray(f), jnp.asarray(hm_bad)))
    assert good < bad


def test_tomo_site_supcon_static_gather(rng):
    f = rng.standard_normal((500, 8)).astype(np.float32)
    hm = np.zeros(500, np.float32)
    hm[:5] = 1.0  # fewer positives than GATHER_K
    loss = float(tomo_site_supcon(jnp.asarray(f), jnp.asarray(hm)))
    assert np.isfinite(loss)


@pytest.mark.parametrize("task", ["cr", "tomo"])
def test_supervised_loop_decreases_loss(tmp_path, rng, task):
    vol, df = make_synthetic(rng, d=24, h=96, w=96, n_part=12)
    cfg = Config(
        task=task, arch="unet_2", contrastive=True, pn=True, batch_size=4,
        lr=1e-3, num_epochs=3, val_intervals=-1, bbox=8,
        root_dir=str(tmp_path),
    ).finalize()
    assert cfg.heads["proj"] == (16 if task == "tomo" else 32)
    ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    state, hist = train_supervised(cfg, ds, log_fn=lambda *_: None)
    assert "cr_loss" in hist[0]
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["hm_loss"] < hist[0]["hm_loss"]


def test_supervised_num_iters_caps_epoch(tmp_path, rng):
    """--num_iters bounds every epoch's batch count (base_trainer.py:263-268)
    — it was a silent no-op for the tomo/cr/semiclass/fewshot/tcla loops."""
    vol, df = make_synthetic(rng, d=24, h=96, w=96, n_part=12)
    cfg = Config(
        task="tomo", arch="unet_2", contrastive=True, pn=True, batch_size=2,
        lr=1e-3, num_epochs=2, num_iters=1, val_intervals=-1, bbox=8,
        root_dir=str(tmp_path),
    ).finalize()
    ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    consumed = []

    class Counting:
        def __getattr__(self, name):
            return getattr(ds, name)

        def __len__(self):
            return len(ds)

        def epoch_batches(self, rng_, bs):
            for b in ds.epoch_batches(rng_, bs):
                consumed.append(1)
                yield b

    state, hist = train_supervised(cfg, Counting(), log_fn=lambda *_: None)
    # 12 samples at bs=2 would run 6 batches/epoch; the cap allows 1. The
    # capped loop still PULLS one extra batch per epoch (enumerate consumes
    # before the cap check), so <= 2 per epoch is the observable bound.
    assert len(hist) == 2
    assert len(consumed) <= 4


def test_supervised_requires_pn(tmp_path, rng):
    vol, df = make_synthetic(rng, d=24, h=96, w=96, n_part=5)
    cfg = Config(task="cr", arch="unet_2", pn=False, batch_size=2,
                 bbox=8, root_dir=str(tmp_path)).finalize()
    ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
    with pytest.raises(ValueError, match="--pn"):
        train_supervised(cfg, ds, log_fn=lambda *_: None)
