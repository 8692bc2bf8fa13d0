"""Shape/behavior tests for the refinement detector model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cet_pick_tpu.config import Config
from cet_pick_tpu.models import TomoPickNet, UNet2D, create_detector


class TestUNet2D:
    def test_shapes_preserved(self, rng):
        model = UNet2D(n_blocks=3, start_filts=8, out_channels=16)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(vars_, x, train=False)
        assert y.shape == (2, 32, 32, 16)

    def test_odd_input_sizes(self, rng):
        # ceil-mode pooling + crop on upsampling must handle odd dims
        model = UNet2D(n_blocks=3, start_filts=8, out_channels=4)
        x = jnp.asarray(rng.standard_normal((1, 37, 45, 2)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(vars_, x, train=False)
        assert y.shape == (1, 37, 45, 4)


class TestStem:
    @pytest.mark.parametrize("hw", [(64, 64), (64, 62), (63, 64), (33, 47)])
    def test_s2d_matches_direct_conv(self, rng, hw):
        """The space-to-depth 4-phase lowering (even extents) and the odd-
        extent fallback must both equal the plain k7 s2 conv with torch's
        padding=3 alignment (reference unet_small.py:35-37); this is what
        keeps reference .pth conversion bit-exact through the stem."""
        from cet_pick_tpu.models.detector import _Stem

        h, w = hw
        x = jnp.asarray(rng.standard_normal((2, h, w, 1)).astype(np.float32))
        m = _Stem(16)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


class TestTomoPickNet:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = TomoPickNet(heads={"hm": 1, "proj": 8}, n_blocks=2, head_conv=8)
        x = jnp.zeros((2, 4, 32, 32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, vars_

    def test_output_shapes_down_ratio_2(self, model_and_vars, rng):
        model, vars_ = model_and_vars
        x = jnp.asarray(rng.standard_normal((2, 4, 32, 32)).astype(np.float32))
        out = model.apply(vars_, x, train=False)
        assert out["hm"].shape == (2, 4, 16, 16, 1)
        assert out["proj"].shape == (2, 4, 16, 16, 8)

    def test_proj_l2_normalized(self, model_and_vars, rng):
        model, vars_ = model_and_vars
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)).astype(np.float32))
        out = model.apply(vars_, x, train=False)
        norms = np.linalg.norm(np.asarray(out["proj"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_train_mode_updates_batch_stats(self, model_and_vars, rng):
        model, vars_ = model_and_vars
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)).astype(np.float32))
        out, updates = model.apply(
            vars_, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in updates
        # running stats changed from init zeros
        leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    def test_gradients_flow(self, model_and_vars, rng):
        model, vars_ = model_and_vars
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)).astype(np.float32))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out["hm"] ** 2)

        g = jax.grad(loss_fn)(vars_["params"])
        gnorm = sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(g))
        assert gnorm > 0

    def test_create_from_config(self):
        c = Config(task="semi", arch="unet_4").finalize()
        model = create_detector(c)
        assert model.n_blocks == 4
        assert model.heads == {"hm": 1, "proj": 32}

    def test_bfloat16_compute_f32_outputs(self, rng):
        model = TomoPickNet(
            heads={"hm": 1, "proj": 8}, n_blocks=2, head_conv=8, dtype=jnp.bfloat16
        )
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(vars_, x, train=False)
        assert out["hm"].dtype == jnp.float32
        # params stored in f32
        p = jax.tree_util.tree_leaves(vars_["params"])
        assert all(l.dtype == jnp.float32 for l in p)


class TestTomoPickNetW:
    """The lane-filling TPU-first arch (unetw_N): quarter-res output grid,
    patchify stem, 128-wide trunk (PARITY.md roofline redesign)."""

    def test_shapes_and_config(self, rng):
        import jax

        c = Config(task="semi", arch="unetw_2").finalize()
        assert c.down_ratio == 4 and c.head_conv == 128
        model = create_detector(c)
        assert model.stem_stride == 4 and model.n_blocks == 2
        x = jnp.asarray(rng.standard_normal((1, 4, 64, 64)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(vars_, x, train=False)
        assert out["hm"].shape == (1, 4, 16, 16, 1)
        assert out["proj"].shape == (1, 4, 16, 16, 128)
        # proj is channel-L2-normalized like the parity family
        n = np.linalg.norm(np.asarray(out["proj"]), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)

    def test_odd_extents_floor_grid(self, rng):
        import jax

        c = Config(task="semi", arch="unetw_2").finalize()
        model = create_detector(c)
        x = jnp.asarray(rng.standard_normal((1, 4, 62, 61)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(vars_, x, train=False)
        # output grid is floor(H/4) — the heatmap-target convention
        assert out["hm"].shape == (1, 4, 15, 15, 1)

    def test_gradients_flow(self, rng):
        import jax

        c = Config(task="semi", arch="unetw_2").finalize()
        model = create_detector(c)
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out["hm"] ** 2)

        g = jax.grad(loss_fn)(vars_["params"])
        gnorm = sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0


def test_detector3d_shapes(rng):
    import jax
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector

    cfg = Config(task="semi3d", arch="res3d_2").finalize()
    model = create_detector(cfg)
    x = rng.standard_normal((2, 6, 32, 32)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["hm"].shape == (2, 6, 16, 16, 1)
    assert out["proj"].shape == (2, 6, 16, 16, 32)
    norms = np.linalg.norm(np.asarray(out["proj"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_semi3d_trains(rng):
    """semi3d task end to end on the 3D detector (GroupNorm, no batch stats)."""
    import jax
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state

    cfg = Config(task="semi3d", arch="res3d_2", contrastive=False,
                 batch_size=2).finalize()
    model = create_detector(cfg)
    b, p, d, h, w = 2, 2, 6, 32, 32
    batch = {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.02, 1.0, -1.0
                       ).astype(np.float32),
        "flip_prob": rng.random(b).astype(np.float32),
    }
    batch["hm"][:, 0, 3, 8, 8] = 1.0
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch["input"].reshape(b * p, d, h, w))
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_freeze_head_finetune(rng):
    """main_seq-style fine-tune: frozen 'hm' head params stay fixed while the
    rest train (reference main_seq.py:36-40)."""
    import jax
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state, set_learning_rate

    cfg = Config(task="semi", arch="unet_2", contrastive=False,
                 batch_size=2).finalize()
    model = create_detector(cfg)
    b, p, d, h, w = 2, 2, 6, 32, 32
    batch = {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.02, 1.0, -1.0
                       ).astype(np.float32),
        "flip_prob": rng.random(b).astype(np.float32),
    }
    batch["hm"][:, 0, 3, 8, 8] = 1.0
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch["input"].reshape(b * p, d, h, w),
                               freeze=("hm",))
    state = set_learning_rate(state, 1e-3)
    hm_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["hm"])[0]).copy()
    stem_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["stem"])[0]).copy()
    step = make_train_step(model, cfg)
    state, _ = step(state, batch)
    hm_after = np.asarray(jax.tree_util.tree_leaves(state.params["hm"])[0])
    stem_after = np.asarray(jax.tree_util.tree_leaves(state.params["stem"])[0])
    np.testing.assert_array_equal(hm_before, hm_after)
    assert not np.allclose(stem_before, stem_after)


def test_tcla_classifier_trains(rng, tmp_path):
    """tcla task: BCE voxel classifier learns to separate blob voxels."""
    import pandas as pd

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.train.classify import train_classify

    d, h, w = 24, 96, 96
    vol = rng.standard_normal((d, h, w)).astype(np.float32) * 0.4
    rows = []
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    for _ in range(14):
        z, y, x = rng.integers(6, d - 6), rng.integers(40, h - 40), rng.integers(40, w - 40)
        vol -= 2.5 * np.exp(-(((zz - z) ** 2) / 6 + ((yy - y) ** 2) / 12
                              + ((xx - x) ** 2) / 12)).astype(np.float32)
        rows.append(("v", x, y, z))
    df = pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord", "z_coord"])
    cfg = Config(task="tcla", arch="unet_2", pn=True, batch_size=4, lr=1e-3,
                 num_epochs=3, val_intervals=-1, bbox=8,
                 root_dir=str(tmp_path)).finalize()
    assert cfg.heads == {"class": 1}
    ds = RefineDataset(cfg, "train", images={"v": vol}, coords_df=df)
    state, hist = train_classify(cfg, ds, log_fn=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert hist[-1]["acc"] > 0.9


def test_tcla_resume_continues_epochs(rng, tmp_path):
    """--resume must continue at the restored epoch (regression: the tcla
    loop restarted at epoch 1 — and never recorded the epoch into the
    saved state at all)."""
    import pandas as pd

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.train.classify import train_classify

    d, h, w = 12, 64, 64
    vol = rng.standard_normal((d, h, w)).astype(np.float32) * 0.4
    rows = [("v", 32, 32, 6), ("v", 20, 40, 6), ("v", 44, 24, 6),
            ("v", 28, 20, 7)]
    df = pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord",
                                     "z_coord"])
    cfg = Config(task="tcla", arch="unet_2", pn=True, batch_size=4, lr=1e-3,
                 num_epochs=2, val_intervals=-1, bbox=8,
                 root_dir=str(tmp_path)).finalize()
    ds = RefineDataset(cfg, "train", images={"v": vol}, coords_df=df)
    state, hist = train_classify(cfg, ds, log_fn=lambda *_: None)
    assert state.epoch == 2 and len(hist) == 2

    cfg2 = Config(task="tcla", arch="unet_2", pn=True, batch_size=4, lr=1e-3,
                  num_epochs=3, val_intervals=-1, bbox=8, resume=True,
                  root_dir=str(tmp_path)).finalize()
    state2, hist2 = train_classify(cfg2, ds, log_fn=lambda *_: None)
    assert state2.epoch == 3 and len(hist2) == 1  # only epoch 3 ran


def test_tolerant_load_survives_structure_changes(tmp_path, rng):
    """Warm-starting across ARCHITECTURE changes (added/missing params,
    different optimizer tree) must tolerant-merge instead of raising —
    flax's strict from_bytes(template) made the documented path dead code
    (it raised 'target dict keys and state dict keys do not match' before
    _merge_tolerant ever ran)."""
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import (
        create_train_state, load_checkpoint, save_checkpoint,
    )

    x = rng.standard_normal((2, 6, 32, 32)).astype(np.float32)
    cfg_small = Config(task="semi", arch="unet_2").finalize()
    m_small = create_detector(cfg_small)
    s_small = create_train_state(m_small, cfg_small, jax.random.PRNGKey(0), x)
    ck = str(tmp_path / "small")
    save_checkpoint(ck, s_small, cfg_small)

    # deeper model: extra blocks absent from the checkpoint keep their init;
    # matching modules (stem etc.) load
    cfg_big = Config(task="semi", arch="unet_3").finalize()
    m_big = create_detector(cfg_big)
    s_big = create_train_state(m_big, cfg_big, jax.random.PRNGKey(1), x)
    loaded = load_checkpoint(ck, s_big)  # must not raise
    np.testing.assert_array_equal(
        np.asarray(loaded.params["stem"]["kernel"]),
        np.asarray(s_small.params["stem"]["kernel"]),
    )

    # frozen-head optimizer has a different opt_state pytree: plain load
    # works (opt_state discarded), --resume fails with a clear message
    s_frozen = create_train_state(m_small, cfg_small, jax.random.PRNGKey(2),
                                  x, freeze=("hm",))
    load_checkpoint(ck, s_frozen)  # must not raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="--resume requires"):
        load_checkpoint(ck, s_frozen, resume=True)


def test_denoise_volume_covers_full_extent(rng):
    """Non-multiple-of-32 extents are reflect-padded and denoised to the
    edge — truncation left a raw-noise band on two edges of every slice."""
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.train.denoise import (
        create_denoise_state, denoise_volume,
    )

    cfg = Config(task="denoise", arch="denoise").finalize()
    state, models = create_denoise_state(cfg, jax.random.PRNGKey(0), crop=32)
    vol = rng.standard_normal((2, 40, 45)).astype(np.float32)
    out = denoise_volume(models, state, vol)
    assert out.shape == vol.shape
    # the denoiser output differs from the raw input EVERYWHERE, including
    # the former truncation bands (cols 32:, rows 32:)
    band = np.abs(out[:, :, 32:] - vol[:, :, 32:])
    assert float(band.max()) > 0.0
    assert not np.array_equal(out[:, 32:, :], vol[:, 32:, :])


def test_denoise_checkpoint_roundtrip(tmp_path, rng):
    """The trained denoiser persists and reloads (DenoiseState is not a
    TrainState; without its own save path a run produced only logs)."""
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.train.denoise import (
        create_denoise_state, load_denoise_checkpoint,
        save_denoise_checkpoint,
    )

    cfg = Config(task="denoise", arch="denoise").finalize()
    state, _ = create_denoise_state(cfg, jax.random.PRNGKey(0), crop=32)
    state = state.replace(step=7)
    ck = str(tmp_path / "dn")
    save_denoise_checkpoint(ck, state, cfg)

    fresh, _ = create_denoise_state(cfg, jax.random.PRNGKey(5), crop=32)
    back = load_denoise_checkpoint(ck, fresh)
    assert back.step == 7
    l0 = jax.tree_util.tree_leaves(state.params_dn)[0]
    l1 = jax.tree_util.tree_leaves(back.params_dn)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
