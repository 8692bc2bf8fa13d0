"""Tiled inference, detector pipeline, and post-processing tests."""

import numpy as np
import pytest

import jax

from cet_pick_tpu.config import Config
from cet_pick_tpu.infer.detector import TomoDetector
from cet_pick_tpu.infer.tiled import TiledHeatmapInference
from cet_pick_tpu.models.detector import create_detector
from cet_pick_tpu.ops.nms import sigmoid_clamped
from cet_pick_tpu.train.state import create_train_state
from cet_pick_tpu.utils.post_process import (
    fiber_postprocess,
    group_dets_by_z,
    spike_group_postprocess,
)


@pytest.fixture(scope="module")
def small_setup():
    config = Config(task="semi", arch="unet_2", K=50, nms=3,
                    out_thresh=0.0, cutoff_z=0).finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0), np.zeros((1, 8, 64, 64), np.float32)
    )
    return config, model, state


def test_tiled_matches_full_volume(small_setup, rng):
    """Shifted-window z-tiling must be bit-identical to one full forward."""
    config, model, state = small_setup
    vol = rng.standard_normal((20, 64, 64)).astype(np.float32)

    tiled = TiledHeatmapInference(model, state.params, state.batch_stats, tile_z=6)
    hm_tiled = np.asarray(tiled(vol))

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))

    assert hm_tiled.shape == hm_full.shape
    np.testing.assert_allclose(hm_tiled, hm_full, rtol=0, atol=1e-6)


@pytest.fixture(scope="module")
def unetw_setup():
    """The lane-filling TPU-first arch (models/detector.TomoPickNetW):
    output stride 4, patchify stem, 128-wide trunk."""
    config = Config(task="semi", arch="unetw_2", K=50, nms=3,
                    out_thresh=0.0, cutoff_z=0).finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        np.zeros((1, 8, 64, 64), np.float32)
    )
    return config, model, state


def test_fused_streams_when_min_tile_busts_budget(small_setup, rng):
    """When even the alignment-floored xy tile leaves the fused window
    batch (ALL z windows live) over the HBM budget, fused() must fall back
    to streaming z windows (one live at a time) — and stay bit-identical.
    Caught at 512x1024x1024 on the v5e: the envelope floored the tile but
    the halo-dominated window still allocated a 22.7 GB head
    intermediate."""
    config, model, state = small_setup
    vol = rng.standard_normal((20, 192, 192)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))
    infer = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=6)
    infer.auto_xy_budget = 30e6
    n_win = len(infer._window_plan(20)[0])
    auto = infer._auto_xy(n_win, 12, 192, 192)
    assert auto is not None
    # precondition: the clamped fused batch still exceeds the budget, so
    # the streamed fallback is what actually runs
    assert infer._window_batch_est(n_win, 12, 192, 192, auto) \
        > infer.auto_xy_budget
    np.testing.assert_allclose(np.asarray(infer.fused(vol)), hm_full,
                               rtol=0, atol=1e-6)


def test_unetw_tiled_matches_full_volume(unetw_setup, rng):
    """z-tiling stays bit-identical for the stride-4 arch."""
    config, model, state = unetw_setup
    vol = rng.standard_normal((20, 64, 64)).astype(np.float32)
    tiled = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=6)
    hm_tiled = np.asarray(tiled(vol))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))
    assert hm_tiled.shape == hm_full.shape == (20, 16, 16)
    np.testing.assert_allclose(hm_tiled, hm_full, rtol=0, atol=1e-6)


def test_unetw_xy_tiled_matches_full(unetw_setup, rng):
    """xy tiling with the stride-4 halo/alignment geometry (infer/tiled.
    xy_halo(n, stem_stride=4)) is bit-identical to the full forward on
    both the streamed and fused paths, shifted border windows included."""
    config, model, state = unetw_setup
    vol = rng.standard_normal((8, 256, 256)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))
    tiled = TiledHeatmapInference(
        model, state.params, state.batch_stats, tile_z=64, tile_xy=(64, 64)
    )
    assert tiled.xy_down == 4 and tiled.xy_align == 8
    assert tiled._xy_plan(256, 64) is not None, "fixture must actually tile"
    hm_tiled = np.asarray(tiled(vol))
    assert hm_tiled.shape == hm_full.shape == (8, 64, 64)
    np.testing.assert_allclose(hm_tiled, hm_full, rtol=0, atol=1e-6)
    hm_fused = np.asarray(tiled.fused(vol))
    np.testing.assert_allclose(hm_fused, hm_full, rtol=0, atol=1e-6)


def test_unetw_halo_covers_receptive_field(unetw_setup):
    """Abs-weights impulse probe: the measured one-sided xy reach of
    unetw_2 must sit inside the analytic xy_halo bound the tiler uses
    (the same validation the parity arch's bound carries)."""
    from cet_pick_tpu.infer.tiled import xy_halo

    config, model, state = unetw_setup
    absed = jax.tree_util.tree_map(jax.numpy.abs, state.params)
    vol = np.zeros((1, 6, 256, 256), np.float32)
    vol[0, 3, 128, 128] = 1.0
    out = model.apply(
        {"params": absed, "batch_stats": state.batch_stats},
        vol, train=False, active_heads=("hm",),
    )
    hm = np.abs(np.asarray(out["hm"][0, 3, :, :, 0]))
    base = model.apply(
        {"params": absed, "batch_stats": state.batch_stats},
        np.zeros_like(vol), train=False, active_heads=("hm",),
    )
    diff = np.abs(hm - np.abs(np.asarray(base["hm"][0, 3, :, :, 0])))
    ys, xs = np.nonzero(diff > 1e-6)
    # one-sided reach in INPUT pixels = output-cell distance * stride 4
    reach = max(np.abs(ys - 32).max(), np.abs(xs - 32).max()) * 4
    assert reach <= xy_halo(model.n_blocks, 4), (
        f"measured reach {reach} exceeds analytic halo "
        f"{xy_halo(model.n_blocks, 4)}"
    )


def test_active_heads_skips_proj(small_setup):
    config, model, state = small_setup
    x = np.zeros((1, 6, 32, 32), np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False, active_heads=("hm",),
    )
    assert set(out) == {"hm"}


def test_detector_run_and_save(small_setup, tmp_path, rng):
    config, model, state = small_setup
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=8)
    vol = rng.standard_normal((16, 96, 96)).astype(np.float32)
    r = det.run(vol, name="t1", out_dir=str(tmp_path))
    assert r["hm"].shape == (16, 48, 48)
    assert r["dets"].shape == (config.K, 5)
    txt = (tmp_path / "t1.txt").read_text().strip().splitlines()
    # all kept rows are x z y with 20 < x,y < 76 at input res
    for line in txt:
        x, z, y = map(int, line.split("\t"))
        assert 20 < x < 76 and 20 < y < 76 and 0 <= z <= 16
    from cet_pick_tpu.io.mrc import read_mrc

    hm_saved = read_mrc(str(tmp_path / "t1_hm.mrc"))
    # saved heatmap has y/z swapped (tomo_det.py:60-67)
    assert hm_saved.shape == (48, 16, 48)
    np.testing.assert_allclose(hm_saved, np.swapaxes(r["hm"], 1, 0), atol=1e-6)


def test_group_dets_by_z():
    dets = np.array([
        [1, 2, 0, 0.9, 0.9],
        [3, 4, 0, 0.8, 0.8],
        [5, 6, 2, 0.7, 0.7],
    ], dtype=np.float32)
    g = group_dets_by_z(dets, z_dim_tot=4)
    assert set(g) == {0, 2}
    assert len(g[0]) == 2 and len(g[2]) == 1


def test_spike_group_postprocess():
    # 7-point tight cluster survives; 2-point cluster dropped
    cluster = [[10 + i, 10, 10, 0.5] for i in range(7)]
    stray = [[100, 100, 100, 0.9], [101, 100, 100, 0.9]]
    out = spike_group_postprocess(cluster + stray, distance_cutoff=5,
                                  min_per_group=5)
    assert len(out) == 7
    assert all(row[0] < 20 for row in out)


def test_fiber_postprocess_straight_line():
    # points along a straight line varying in x (the fit's parameter axis,
    # post_process.py:71-75) -> accepted, resampled
    xs = np.arange(0, 40, 2)
    dets = [[x, 50, 30] for x in xs]
    out = fiber_postprocess(dets, distance_cutoff=5, res_cutoff=30,
                            curvature_cutoff=0.03, scale=2)
    assert len(out) > 0
    for x, z, y in out:
        assert abs(y - 50) <= 1 and abs(z - 30) <= 1


def test_fiber_postprocess_rejects_scatter(rng):
    # random scatter in a ball: high residual -> rejected
    pts = rng.uniform(0, 30, size=(12, 3)).tolist()
    out = fiber_postprocess(pts, distance_cutoff=60, res_cutoff=1e-3,
                            curvature_cutoff=1e-9, scale=2)
    assert out == []


def test_uint8_path_matches_float(small_setup, rng):
    """preprocess_quantized + on-device dequant == preprocess float path."""
    from cet_pick_tpu.io.loader import preprocess, preprocess_quantized

    config, model, state = small_setup
    raw = rng.standard_normal((12, 64, 64)).astype(np.float32)
    f32 = preprocess(raw).astype(np.float32)
    u8, lo, hi = preprocess_quantized(raw)
    np.testing.assert_allclose(
        (u8.astype(np.float64) - lo) / (hi - lo), f32, atol=1e-6
    )
    tiled = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=6)
    hm_f = np.asarray(tiled(f32))
    hm_u = np.asarray(tiled(u8, lo=lo, hi=hi))
    np.testing.assert_allclose(hm_u, hm_f, atol=1e-5)


def test_streamed_quantized_run_matches_float_run(small_setup, tmp_path, rng):
    """The pipelined CLI schedule (stream_quantized_volumes: disk -> uint8 ->
    async device_put) must write bit-identical detections to the float path
    the reference uses (load_tomos_from_list -> det.run)."""
    from cet_pick_tpu.infer.detector import stream_quantized_volumes
    from cet_pick_tpu.io.loader import load_tomos_from_list
    from cet_pick_tpu.io.mrc import write_mrc

    config, model, state = small_setup
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=8)
    raw = rng.standard_normal((16, 96, 96)).astype(np.float32)
    rec = tmp_path / "s0.rec"
    write_mrc(str(rec), raw)

    # float reference path, exactly what the old run_test did
    images = load_tomos_from_list(["s0"], [str(rec)], order=config.order)
    out_f = tmp_path / "float"
    r_f = det.run(images["s0"], name="s0", out_dir=str(out_f))

    # streamed quantized path (what run_test does now)
    out_q = tmp_path / "quant"
    with stream_quantized_volumes(config, ["s0"], [str(rec)]) as vols:
        rows = list(vols)
    assert len(rows) == 1
    name, v_dev, lo, hi = rows[0]
    assert name == "s0" and np.asarray(v_dev).dtype == np.uint8
    r_q = det.run(v_dev, name="s0", out_dir=str(out_q), lo=lo, hi=hi)

    np.testing.assert_allclose(r_q["hm"], r_f["hm"], atol=1e-5)
    assert (out_q / "s0.txt").read_text() == (out_f / "s0.txt").read_text()


def test_fused_matches_streamed(small_setup, rng):
    config, model, state = small_setup
    vol = rng.standard_normal((20, 64, 64)).astype(np.float32)
    tiled = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=6)
    hm_s = np.asarray(tiled(vol))
    hm_f = np.asarray(tiled.fused(vol))
    np.testing.assert_allclose(hm_f, hm_s, atol=1e-6)


def test_save_detection_fiber_branch(small_setup, tmp_path):
    """Fiber mode routes kept detections through curve fitting (tomo_det.py:84-88)."""
    config, model, state = small_setup
    import dataclasses

    cfg = dataclasses.replace(config, fiber=True, distance_cutoff=6.0,
                              r2_cutoff=30.0, curvature_cutoff=0.03,
                              distance_scale=2.0)
    cfg.heads = config.heads
    det = TomoDetector(cfg, params=state.params, batch_stats=state.batch_stats,
                       tile_z=8)
    hm = np.zeros((20, 48, 48), np.float32)
    # z-groups along a straight x-varying line at y=30 (input res y=60 > 20 ✓)
    z_groups = {5: [[x, 30, 5, 0.9, 0.9] for x in range(22, 61, 2)]}
    det.save_detection(hm, z_groups, str(tmp_path), "fib")
    lines = (tmp_path / "fib.txt").read_text().strip().splitlines()
    assert len(lines) > 0
    for line in lines:
        x, z, y = map(int, line.split("\t"))
        assert abs(y - 30) <= 2 and abs(z - 5) <= 1  # resampled on the fiber


def test_save_detection_spike_branch(small_setup, tmp_path):
    """Spike mode keeps only detections in groups > min size (tomo_det.py:90-95)."""
    config, model, state = small_setup
    import dataclasses

    cfg = dataclasses.replace(config, spike=True, distance_cutoff=10.0,
                              with_score=True)
    cfg.heads = config.heads
    det = TomoDetector(cfg, params=state.params, batch_stats=state.batch_stats,
                       tile_z=8)
    hm = np.zeros((20, 48, 48), np.float32)
    cluster = [[25 + i, 30, 5, 0.9, 0.9] for i in range(7)]
    stray = [[60, 60, 10, 0.9, 0.9]]
    z_groups = {5: cluster, 10: stray}
    det.save_detection(hm, z_groups, str(tmp_path), "spk")
    lines = (tmp_path / "spk.txt").read_text().strip().splitlines()
    assert len(lines) == 7  # stray dropped, cluster kept
    for line in lines:
        parts = line.split("\t")
        assert len(parts) == 4  # with_score


def test_xy_tiled_matches_full(small_setup, rng):
    """xy tiling with the full-network halo must be bit-identical to the
    full-volume forward (streamed AND fused paths), including shifted-inward
    windows at the borders."""
    config, model, state = small_setup
    vol = rng.standard_normal((12, 192, 192)).astype(np.float32)

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))

    tiled = TiledHeatmapInference(
        model, state.params, state.batch_stats, tile_z=64, tile_xy=(64, 64)
    )
    assert tiled._xy_plan(192, 64) is not None, "fixture must actually tile"
    hm_tiled = np.asarray(tiled(vol))
    assert hm_tiled.shape == hm_full.shape
    np.testing.assert_allclose(hm_tiled, hm_full, rtol=0, atol=1e-6)

    hm_fused = np.asarray(tiled.fused(vol))
    np.testing.assert_allclose(hm_fused, hm_full, rtol=0, atol=1e-6)


def test_auto_xy_tiling_engages_and_matches(small_setup, rng):
    """With no --tile H W, fused()/__call__ must tile xy on their own when
    the activation envelope exceeds the HBM budget — and stay bit-identical
    to the full-volume forward."""
    config, model, state = small_setup
    vol = rng.standard_normal((12, 192, 192)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))

    infer = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=64)  # tile_xy NOT set
    # the real budget never triggers at this size
    assert infer._auto_xy(1, 12, 192, 192) is None
    # a forced-small budget must pick an aligned tile and stay exact
    infer.auto_xy_budget = 30e6
    t = infer._auto_xy(1, 12, 192, 192)
    assert t is not None and t[0] % infer.xy_align == 0 and t[0] >= infer.xy_align
    np.testing.assert_allclose(np.asarray(infer(vol)), hm_full,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(infer.fused(vol)), hm_full,
                               rtol=0, atol=1e-6)


def test_auto_xy_clamps_explicit_tile(small_setup, rng):
    """The CLI default config ALWAYS sets --tile H W (512, 512), so the HBM
    envelope must also clamp explicitly-set tiles whose windows would blow
    the budget (regression: the envelope used to be consulted only when
    tile_xy was unset — i.e. never from the CLI); an explicit 0 stays the
    expert opt-out. Clamped runs remain bit-identical to the full forward."""
    config, model, state = small_setup
    vol = rng.standard_normal((12, 192, 192)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))

    infer = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=64, tile_xy=(512, 512))
    # (512, 512) covers the whole 192^2 extent: without the merge this ran
    # untiled no matter the budget
    infer.auto_xy_budget = 30e6
    eff = infer._effective_xy(1, 12, 192, 192)
    assert eff is not None and eff[0] < 512 and eff[0] % infer.xy_align == 0
    assert infer._xy_plan(192, eff[0]) is not None, "clamp must actually tile"
    np.testing.assert_allclose(np.asarray(infer(vol)), hm_full,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(infer.fused(vol)), hm_full,
                               rtol=0, atol=1e-6)
    # a roomy budget keeps the explicit tile as-is
    infer.auto_xy_budget = TiledHeatmapInference.AUTO_XY_BUDGET
    assert infer._effective_xy(1, 12, 192, 192) == (512, 512)

    # explicit 0 = opt-out: never tiled, even over budget
    infer2 = TiledHeatmapInference(model, state.params, state.batch_stats,
                                   tile_z=64, tile_xy=(0, 0))
    infer2.auto_xy_budget = 30e6
    assert infer2._effective_xy(1, 12, 192, 192) == (0, 0)


def test_xy_tiled_one_axis_and_z(small_setup, rng):
    """H-only xy tiling composed with z tiling stays exact."""
    config, model, state = small_setup
    vol = rng.standard_normal((20, 192, 64)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))
    tiled = TiledHeatmapInference(
        model, state.params, state.batch_stats, tile_z=6, tile_xy=(64, 0)
    )
    np.testing.assert_allclose(np.asarray(tiled(vol)), hm_full,
                               rtol=0, atol=1e-6)


def test_xy_tiled_misaligned_falls_back(small_setup, rng):
    """Misaligned xy extents warn and run untiled (a default-config run on
    an arbitrary-size volume must not crash) and stay exact."""
    config, model, state = small_setup
    tiled = TiledHeatmapInference(
        model, state.params, state.batch_stats, tile_z=64, tile_xy=(64, 64)
    )
    vol = rng.standard_normal((8, 194, 194)).astype(np.float32)
    with pytest.warns(UserWarning, match="not a multiple"):
        hm = np.asarray(tiled(vol))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    np.testing.assert_allclose(
        hm, np.asarray(sigmoid_clamped(out["hm"][0, ..., 0])), rtol=0,
        atol=1e-6)


def test_xy_tiled_odd_passthrough_axis(small_setup, rng):
    """An odd (untiled) H with a tiled W keeps the full ceil(H/2) output
    rows — floor-division there would silently clip the last row."""
    config, model, state = small_setup
    vol = rng.standard_normal((8, 193, 192)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol[None], train=False, active_heads=("hm",),
    )
    hm_full = np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))
    tiled = TiledHeatmapInference(
        model, state.params, state.batch_stats, tile_z=64, tile_xy=(64, 64)
    )
    with pytest.warns(UserWarning, match="not a multiple"):
        hm = np.asarray(tiled(vol))
    assert hm.shape == hm_full.shape  # (8, 97, 96)
    np.testing.assert_allclose(hm, hm_full, rtol=0, atol=1e-6)


def test_fiber_pipeline_recovers_planted_curve(tmp_path):
    """decode(if_fiber separable NMS) -> xy rescale -> z-grouping ->
    fiber_postprocess -> writer, end to end on a planted smooth curve: the
    written picks resample the true curve (reference tomo_det.py:84-95 +
    post_process.py:52-106 integration, one level above the unit tests)."""
    from cet_pick_tpu.infer.detector import write_detection_outputs
    from cet_pick_tpu.ops.decode import tomo_decode
    from cet_pick_tpu.utils.post_process import group_dets_by_z

    down = 2
    # curvature |2c| = 0.0016 must clear the reference default
    # curvature_cutoff 0.003 (post_process.py:52-106 acceptance gates)
    y_of = lambda x: 32.0 + 0.0008 * (x - 64.0) ** 2
    z_of = lambda x: 20.0 + 0.05 * (x - 64.0)
    hm = np.zeros((32, 64, 64), np.float32)
    planted = []
    for xg in range(12, 53, 2):  # grid coords; scaled x 24..104 clears the
                                 # writer's 20 < x < 108 border filter
        x = xg * down
        yg = int(round(y_of(x) / down))
        zg = int(round(z_of(x)))
        hm[zg, yg, xg] = 1.0
        planted.append((x, yg * down, zg))

    dets = np.array(tomo_decode(hm, kernel=3, k=60, if_fiber=True))
    assert (dets[:, 3] > 0.5).sum() == len(planted)

    cfg = Config(task="semi", arch="unet_2", out_thresh=0.0, cutoff_z=0,
                 fiber=True).finalize()
    assert cfg.down_ratio == down
    dets[:, :2] *= down
    z_groups = group_dets_by_z(dets, hm.shape[0])
    rows = (c for _, rs in z_groups.items() for c in rs)
    lines = write_detection_outputs(cfg, hm, rows, str(tmp_path), "fib")

    out = np.loadtxt(tmp_path / "fib.txt", ndmin=2)   # columns x z y
    assert len(out) >= 10
    for x, z, y in out:
        assert abs(y - y_of(x)) <= 2.5, (x, y, y_of(x))
        assert abs(z - z_of(x)) <= 2.5, (x, z, z_of(x))
    # resampling densifies along the fit: spacing ~= scale (default 2.0)
    xs = np.sort(out[:, 0])
    assert np.median(np.diff(xs)) <= 4.0
    assert lines == [f"{int(r[0])}\t{int(r[1])}\t{int(r[2])}" for r in out.astype(int)]


def test_spike_pipeline_keeps_dense_clusters(tmp_path):
    """decode -> rescale -> z-grouping -> spike_group_postprocess -> writer
    on planted clusters: the dense cluster's picks are written (with scores),
    the sparse one is dropped (reference tomo_det.py:89-95 integration)."""
    from cet_pick_tpu.infer.detector import write_detection_outputs
    from cet_pick_tpu.ops.decode import tomo_decode
    from cet_pick_tpu.utils.post_process import group_dets_by_z

    hm = np.zeros((32, 64, 64), np.float32)
    dense = [(20 + 2 * i, 16, 15) for i in range(8)]     # 8 tight (grid xy, z)
    sparse = [(52, 28, 24), (54, 30, 26)]                # 2 stray
    for xg, yg, zg in dense + sparse:
        hm[zg, yg, xg] = 1.0

    dets = np.array(tomo_decode(hm, kernel=3, k=40, if_fiber=False))
    cfg = Config(task="semi", arch="unet_2", out_thresh=0.0, cutoff_z=0,
                 spike=True, with_score=True,
                 distance_cutoff=10.0).finalize()
    dets[:, :2] *= cfg.down_ratio
    z_groups = group_dets_by_z(dets, hm.shape[0])
    rows = (c for _, rs in z_groups.items() for c in rs)
    write_detection_outputs(cfg, hm, rows, str(tmp_path), "spk")

    out = np.loadtxt(tmp_path / "spk.txt", ndmin=2)      # x z y score
    assert out.shape == (len(dense), 4)
    assert set(out[:, 0].astype(int)) == {2 * x for x, _, _ in dense}
    assert np.all(out[:, 2].astype(int) == 32) and np.all(out[:, 1] == 15)
    assert np.all(out[:, 3] > 0.5)


def test_nan_failfast_survives_no_write_hm(tmp_path):
    """The reference's NaN fail-fast must fire whenever the heatmap is
    available, even under --no-write_hm (the classify path always fetches
    the heatmap for its host NMS and passes it to the writer regardless of
    the flag — a NaN there must not silently yield a partial txt)."""
    from cet_pick_tpu.infer.detector import write_detection_outputs

    hm = np.zeros((8, 64, 64), np.float32)
    hm[4, 30, 30] = np.nan
    cfg = Config(task="semi", arch="unet_2", out_thresh=0.0, cutoff_z=0,
                 write_hm=False).finalize()
    with pytest.raises(ValueError, match="NaN"):
        write_detection_outputs(cfg, hm, [], str(tmp_path), "nanvol")
    assert not (tmp_path / "nanvol_hm.mrc").exists()  # flag still honored


def test_z_filter_uses_input_depth_for_rescaled_rows(tmp_path):
    """res3dref decodes z at D/2 and post_process rescales z by z_ratio=2
    back to input resolution; the writer's cutoff_z filter must bound z by
    the INPUT depth (z_dim_tot), not the half-resolution heatmap depth —
    otherwise every pick in the upper half of the volume is silently
    dropped (tomo_det.py:74's filter runs at the heatmap's own resolution
    in the reference; here rescaled rows need the rescaled bound)."""
    from cet_pick_tpu.infer.detector import write_detection_outputs

    cfg = Config(task="semi3d", arch="res3dref_18", head_conv=16,
                 out_thresh=0.0, cutoff_z=2, with_score=True).finalize()
    hm_shape = (16, 64, 64)  # heatmap at D/2: input depth is 32
    rows = [(30, 30, z, 0.9) for z in (1, 2, 15, 28, 30, 31)]
    write_detection_outputs(cfg, None, rows, str(tmp_path), "up",
                            hm_shape=hm_shape, z_dim_tot=32)
    out = np.loadtxt(tmp_path / "up.txt", ndmin=2)  # x z y score
    assert set(out[:, 1].astype(int)) == {2, 15, 28, 30}
    # without z_dim_tot the bound falls back to the heatmap depth (legacy
    # unet-family behavior where rows' z IS heatmap z)
    write_detection_outputs(cfg, None, rows, str(tmp_path), "hmres",
                            hm_shape=hm_shape)
    out = np.loadtxt(tmp_path / "hmres.txt", ndmin=2)
    assert set(out[:, 1].astype(int)) == {2}


def test_classify_warm_skips_host_nms(small_setup, monkeypatch):
    """TomoClassDetector.warm must only warm the device forward: on a zeros
    dummy the clamped-sigmoid heatmap is a near-constant > out_thresh, so
    running the full process() would greedy-NMS ~every voxel on the host
    (minutes) plus fetch the full heatmap — neither compiles anything."""
    import cet_pick_tpu.infer.classify as icl

    config, model, state = small_setup
    det = icl.TomoClassDetector(
        config, params=state.params, batch_stats=state.batch_stats)

    def boom(*a, **k):  # any decode attempt fails the test
        raise AssertionError("warm must not run the host greedy NMS")

    monkeypatch.setattr(icl, "tomo_decode_classify", boom)
    det.warm((12, 64, 64))
    # and the real decode still works afterwards on the warmed geometry
    monkeypatch.undo()
    hm, dets = det.process(np.zeros((12, 64, 64), np.uint8))
    assert hm.shape == (12, 32, 32)


def test_warm_from_header_swallows_bad_files(small_setup, tmp_path):
    """warm_from_header is a pure optimization: a corrupt-but-parseable MRC
    header (absurd dims) must not crash the run — the streaming loader keeps
    reporting its actionable per-file error instead."""
    import pandas as pd

    from cet_pick_tpu.infer.detector import TomoDetector, warm_from_header

    config, model, state = small_setup
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats)
    # 1024-byte header claiming bogus huge dims, then no data
    hdr = np.zeros(256, np.int32)
    hdr[0], hdr[1], hdr[2] = 2 ** 20, 2 ** 20, 2 ** 20
    hdr[3] = 2  # mode 2 = float32
    p = tmp_path / "corrupt.rec"
    p.write_bytes(hdr.tobytes())
    warm_from_header(det, pd.Series([str(p)]), config)  # must not raise


def test_no_write_hm_identical_picks(small_setup, tmp_path, rng):
    """--no-write_hm skips the _hm.mrc file AND the full-heatmap fetch
    (ret["hm"] is None) while the picks txt stays byte-identical."""
    import dataclasses

    config, model, state = small_setup
    vol = rng.standard_normal((16, 96, 96)).astype(np.float32)

    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=8)
    r_full = det.run(vol, name="t1", out_dir=str(tmp_path / "full"))

    cfg = dataclasses.replace(config, write_hm=False)
    cfg.heads = config.heads
    det_nh = TomoDetector(cfg, params=state.params,
                          batch_stats=state.batch_stats, tile_z=8)
    r = det_nh.run(vol, name="t1", out_dir=str(tmp_path / "nohm"))
    assert r["hm"] is None
    assert not (tmp_path / "nohm" / "t1_hm.mrc").exists()
    assert (tmp_path / "full" / "t1_hm.mrc").exists()
    assert ((tmp_path / "nohm" / "t1.txt").read_text()
            == (tmp_path / "full" / "t1.txt").read_text())
    np.testing.assert_array_equal(r["dets"], r_full["dets"])


def test_tta_averages_flip_views(small_setup, rng):
    """--tta heatmap == mean of the 4 manually flipped forwards (the
    mechanism: views ride the conv batch, outputs un-flip by reversal)."""
    config, model, state = small_setup
    vol = rng.standard_normal((8, 64, 64)).astype(np.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(v):
        out = model.apply(variables, v[None], train=False,
                          active_heads=("hm",))
        return np.asarray(sigmoid_clamped(out["hm"][0, ..., 0]))

    h0 = fwd(vol)
    hlr = fwd(vol[:, :, ::-1])[:, :, ::-1]
    hud = fwd(vol[:, ::-1, :])[:, ::-1, :]
    hb = fwd(vol[:, ::-1, ::-1])[:, ::-1, ::-1]
    want = (h0 + hlr + hud + hb) / 4

    tta = TiledHeatmapInference(model, state.params, state.batch_stats,
                                tile_z=64, tta=True)
    np.testing.assert_allclose(np.asarray(tta(vol)), want, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tta.fused(vol)), want,
                               rtol=0, atol=1e-6)


def test_tta_tiled_matches_full(small_setup, rng):
    """z + xy tiling stays exact with TTA on: tiles/halos/extents are all
    align-multiples, so the pooling grids still coincide under reflection."""
    config, model, state = small_setup
    vol = rng.standard_normal((20, 192, 64)).astype(np.float32)
    full = TiledHeatmapInference(model, state.params, state.batch_stats,
                                 tile_z=64, tta=True)
    hm_full = np.asarray(full(vol))
    tiled = TiledHeatmapInference(model, state.params, state.batch_stats,
                                  tile_z=6, tile_xy=(64, 0), tta=True)
    assert tiled._xy_plan(192, 64) is not None, "fixture must actually tile"
    np.testing.assert_allclose(np.asarray(tiled(vol)), hm_full,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tiled.fused(vol)), hm_full,
                               rtol=0, atol=1e-6)


def test_tta_rejects_odd_xy(small_setup, rng):
    config, model, state = small_setup
    tta = TiledHeatmapInference(model, state.params, state.batch_stats,
                                tta=True)
    with pytest.raises(ValueError, match="divisible by the output stride"):
        tta(rng.standard_normal((6, 63, 64)).astype(np.float32))
