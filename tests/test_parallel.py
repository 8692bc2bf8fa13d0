"""Multi-device sharding: DP step equivalence + spatial sharding exactness.

The "fake backend" tests from SURVEY.md §4: an 8-device virtual CPU mesh
validates the sharding strategy without TPU hardware.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cet_pick_tpu.config import Config
from cet_pick_tpu.models.detector import create_detector
from cet_pick_tpu.parallel.mesh import (
    make_dp_train_step,
    make_mesh,
    make_spatial_infer,
    replicate,
    shard_batch,
)
from cet_pick_tpu.train.refine import make_train_step
from cet_pick_tpu.train.state import create_train_state


def _tiny(contrastive=True):
    return Config(task="semi", arch="unet_2", contrastive=contrastive,
                  batch_size=8).finalize()


def _batch(rng, b=8, d=6, h=32, w=32, p=2):
    batch = {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.02, 1.0, -1.0
                       ).astype(np.float32),
        "flip_prob": rng.random(b).astype(np.float32),
    }
    batch["hm"][:, 0, 3, h // 4, w // 4] = 1.0
    return batch


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh((2, 4), ("data", "space"))
    assert mesh2.axis_names == ("data", "space")
    with pytest.raises(ValueError):
        make_mesh((100,))
    # a multi-dim --mesh_shape handed to a single-axis consumer (DP train
    # loops, spatial inference) rides its total device count on that axis
    # instead of crashing in Mesh() (regression: `test --mesh_shape 2 4`)
    mesh3 = make_mesh((2, 4), ("space",))
    assert mesh3.axis_names == ("space",) and mesh3.devices.shape == (8,)


def test_dp_step_matches_single_device(rng):
    # tiny 16x16 crops: the per-device contrastive gram must stay light —
    # XLA's in-process collective rendezvous has a 40 s watchdog that
    # SIGABRTs the whole process if one virtual device straggles on this
    # 1-core machine
    config = _tiny()
    model = create_detector(config)
    batch = _batch(rng, h=16, w=16)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        batch["input"].reshape(-1, *batch["input"].shape[2:]),
    )

    # single-device reference
    step1 = make_train_step(model, config)
    new1, metrics1 = step1(state, jax.device_put(batch))

    # 8-way data-parallel
    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_train_step(model, config, mesh)
    state8 = place_state(state)
    new8, metrics8 = step8(state8, place_batch(batch))

    assert float(metrics8["loss"]) == pytest.approx(float(metrics1["loss"]),
                                                    rel=2e-4)
    assert float(metrics8["num_pos"]) == float(metrics1["num_pos"])

    # BatchNorm under GSPMD data parallelism has SyncBatchNorm semantics:
    # the batch-mean over the sharded axis gets a global all-reduce, so the
    # updated running statistics equal the single-device ones (matching the
    # reference's DDP SyncBatchNorm path, main.py:52-53)
    bs1 = jax.tree_util.tree_leaves(new1.batch_stats)
    bs8 = jax.tree_util.tree_leaves(new8.batch_stats)
    for a, b in zip(bs1, bs8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_step_accepts_raw_numpy_batch(rng):
    """Pinned in_shardings: a caller skipping place_batch still gets the
    sharded step (VERDICT r1 weak #4), not a silent single-device run."""
    config = _tiny(contrastive=False)
    model = create_detector(config)
    batch = _batch(rng, h=16, w=16)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        batch["input"].reshape(-1, *batch["input"].shape[2:]),
    )
    mesh = make_mesh((8,), ("data",))
    step8, place_state, _ = make_dp_train_step(model, config, mesh)
    new_state, metrics = step8(place_state(state), batch)  # raw numpy batch
    assert np.isfinite(float(metrics["loss"]))
    # outputs respect the declared replicated sharding
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_spatial_sharding_matches_unsharded(rng):
    config = _tiny(contrastive=False)
    model = create_detector(config)
    vol = rng.standard_normal((1, 6, 64, 32)).astype(np.float32)
    state = create_train_state(model, config, jax.random.PRNGKey(0), vol)

    ref = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vol, train=False,
    )["hm"]

    mesh = make_mesh((8,), ("data",))
    infer = make_spatial_infer(model, mesh, axis="data")
    out = infer(state.params, state.batch_stats, vol)["hm"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_shard_batch_layout(rng):
    mesh = make_mesh((8,), ("data",))
    batch = {"x": rng.standard_normal((8, 4)).astype(np.float32),
             "s": np.float32(1.0)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_train_refine_dp_loop_matches_single(rng, tmp_path):
    """The full train_refine loop under an 8-device mesh reproduces the
    1-device run (same seed, same batches)."""
    import pandas as pd

    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.train.refine import train_refine

    d, h, w = 24, 96, 96
    vol = rng.standard_normal((d, h, w)).astype(np.float32) * 0.5
    rows = []
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    for _ in range(16):
        z, y, x = rng.integers(6, d - 6), rng.integers(40, h - 40), rng.integers(40, w - 40)
        vol -= 2.0 * np.exp(-(((zz - z) ** 2) / 6 + ((yy - y) ** 2) / 12
                              + ((xx - x) ** 2) / 12)).astype(np.float32)
        rows.append(("v", x, y, z))
    df = pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord", "z_coord"])

    def run(mesh_shape):
        cfg = Config(task="semi", arch="unet_2", contrastive=False,
                     batch_size=8, lr=1e-3, num_epochs=2, val_intervals=-1,
                     bbox=8, mesh_shape=mesh_shape,
                     root_dir=str(tmp_path / f"m{len(mesh_shape)}")).finalize()
        ds = RefineDataset(cfg, "train", images={"v": vol.copy()}, coords_df=df)
        _, hist = train_refine(cfg, ds, log_fn=lambda *_: None)
        return hist

    h1 = run((1,))
    h8 = run((8,))
    # per-step parity is ~2e-4 (test above); over epochs the f32 reduction-
    # order difference of sharded partial sums compounds through Adam, so
    # epoch-level losses track within ~1%
    for a, b in zip(h1, h8):
        assert a["loss"] == pytest.approx(b["loss"], rel=2e-2)
        assert a["num_pos"] == b["num_pos"]
    assert h8[-1]["loss"] < h8[0]["loss"]


def _simsiam_batch(rng, b=8, bbox=24):
    return {
        "anchor": rng.standard_normal((b, 1, bbox, bbox)).astype(np.float32),
        "aug": rng.standard_normal((b, 1, bbox, bbox)).astype(np.float32),
        "norm_mean": np.zeros(1, np.float32),
        "norm_std": np.ones(1, np.float32),
    }


def test_explore_dp_step_matches_single(rng):
    """make_dp_step over the SimSiam step == single-device step (the
    explore loop's DDP analog, reference simsiam_main.py:28-45)."""
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, make_simsiam_train_step, simsiam_step_fn,
    )

    cfg = Config(task="simsiam3d", arch="simsiam2d_18", bbox=24,
                 batch_size=8, lr=0.05, head_conv=32).finalize()
    model = create_simsiam(cfg)
    batch = _simsiam_batch(rng)
    state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(7)

    step1 = make_simsiam_train_step(model, cfg, model.mode)
    new1, m1 = step1(state, jax.device_put(batch), key)

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(
        simsiam_step_fn(model, cfg, model.mode), mesh
    )
    new8, m8 = step8(place_state(state), place_batch(batch), key)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    assert float(m8["std"]) == pytest.approx(float(m1["std"]), rel=2e-3)
    # sharded partial-sum reduction order differs from the single-device
    # loop; through BatchNorm + lr=0.05 SGD that compounds to ~1e-4
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # non-batch leaves (norm constants) stayed replicated; batch got sharded
    pb = place_batch(batch)
    assert pb["anchor"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert pb["norm_mean"].sharding.spec == jax.sharding.PartitionSpec()


def test_moco_dp_step_matches_single(rng):
    """MoCo under the DP mesh: loss, queue contents and momentum-encoder
    update all match the single-device step."""
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.moco import (
        create_moco_state, make_moco_train_step, moco_step_fn,
    )

    cfg = Config(task="moco", arch="simsiam2d_18", bbox=24,
                 batch_size=8, lr=0.05, head_conv=32).finalize()
    model = create_simsiam(cfg)
    batch = _simsiam_batch(rng)
    state = create_moco_state(model, cfg, jax.random.PRNGKey(0), batch, r=16)
    key = jax.random.PRNGKey(3)

    step1 = make_moco_train_step(model, cfg, model.mode)
    new1, m1 = step1(state, jax.device_put(batch), key)

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(
        moco_step_fn(model, cfg, model.mode), mesh
    )
    new8, m8 = step8(place_state(state), place_batch(batch), key)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    np.testing.assert_allclose(np.asarray(new8.queue), np.asarray(new1.queue),
                               atol=5e-5)
    assert int(new8.queue_ptr) == int(new1.queue_ptr)
    for a, b in zip(jax.tree_util.tree_leaves(new1.key_params),
                    jax.tree_util.tree_leaves(new8.key_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_multihost_dp_step_generic_single_process(rng):
    """make_multihost_dp_step (the step-agnostic multi-host wrapper) on a
    single process over the virtual 8-device mesh: the SimSiam step matches
    the plain single-device step; norm constants stay replicated."""
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.parallel.mesh import make_multihost_dp_step
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, make_simsiam_train_step, simsiam_step_fn,
    )

    cfg = Config(task="simsiam3d", arch="simsiam2d_18", bbox=24,
                 batch_size=8, lr=0.05, head_conv=32).finalize()
    model = create_simsiam(cfg)
    batch = _simsiam_batch(rng)
    state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(5)

    step1 = make_simsiam_train_step(model, cfg, model.mode)
    _, m1 = step1(state, jax.device_put(batch), key)

    step_mh, place_state, place_batch = make_multihost_dp_step(
        simsiam_step_fn(model, cfg, model.mode)
    )
    pb = place_batch(batch)
    assert pb["anchor"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert pb["norm_mean"].sharding.spec == jax.sharding.PartitionSpec()
    _, m8 = step_mh(place_state(state), pb, key)
    # GSPMD changes the reduction order of the batch statistics / loss mean,
    # so only near-equality is expected; the loss is a negative cosine near
    # zero, making pure-relative comparison brittle (observed |diff| ~1e-6
    # at loss ~3e-3), hence the abs floor.
    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]),
                                              rel=2e-4, abs=5e-6)


@pytest.mark.slow
def test_multihost_dp_two_processes(tmp_path):
    """2 processes x 4 virtual CPU devices: jax.distributed init + per-host
    batch sharding + cross-host gradient all-reduce (the reference's
    multi-node DDP capability, main.py:24-41)."""
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "multihost_worker.py"),
             str(pid), "2", str(port)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)  # 1-core box: compiles serialize
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = [float(re.search(r"MULTIHOST pid=\d loss=([\d.e+-]+)", o).group(1))
              for o in outs]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6), losses


def _pn_batch(rng, b=8, d=6, h=32, w=32, p=2):
    """Supervised (pn) batch: explicit 0/1 heatmap labels, no -1 fill."""
    batch = {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.02, 1.0, 0.0
                       ).astype(np.float32),
    }
    batch["hm"][:, 0, 3, h // 4, w // 4] = 1.0
    return batch


@pytest.mark.parametrize("task", ["tomo", "cr"])
def test_supervised_dp_step_matches_single(rng, task):
    """The tomo/cr supervised step under the DP mesh == single device (both
    losses are vmapped per sample, so shards stay independent)."""
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.supervised import make_supervised_train_step

    cfg = Config(task=task, arch="unet_2", pn=True, contrastive=True,
                 batch_size=8, bbox=16).finalize()
    model = create_detector(cfg)
    batch = _pn_batch(rng, h=16, w=16)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        batch["input"].reshape(-1, *batch["input"].shape[2:]),
    )
    key = jax.random.PRNGKey(11)

    step1 = make_supervised_train_step(model, cfg, task)
    new1, m1 = step1(state, jax.device_put(batch), key)

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(
        make_supervised_train_step(model, cfg, task), mesh
    )
    new8, m8 = step8(place_state(state), place_batch(batch), key)

    for k in m1:
        assert float(m8[k]) == pytest.approx(float(m1[k]), rel=2e-4, abs=1e-6)
    _assert_grads_match(new1.opt_state, new8.opt_state)


def _assert_grads_match(opt1, opt8, factor=1e-3, norm_rel=None):
    """Compare the gradient-LINEAR optimizer state (Adam's first moment is
    (1-b1)*grad after step one). Comparing params would amplify reduction-
    order fp noise through Adam's m/sqrt(v) ≈ sign(grad): a 1-ulp flip of a
    near-zero gradient moves the param a full ±lr."""
    pairs = [(np.asarray(a), np.asarray(b)) for a, b in
             zip(jax.tree_util.tree_leaves(opt1),
                 jax.tree_util.tree_leaves(opt8)) if np.ndim(a)]
    # global gradient scale: floors the denominator for leaves whose true
    # gradient is ~0 (e.g. a softmax-cancelled fc bias at 1e-7), where any
    # fp noise yields a meaningless relative ratio
    gscale = float(np.sqrt(sum(float((a * a).sum()) for a, _ in pairs)))
    for a, b in pairs:
        if norm_rel is not None:
            # per-leaf norm-relative check for BatchNorm trunks, whose
            # normalization subtractions amplify sharded-reduction stat
            # noise elementwise (single near-zero entries get ~10% rel
            # noise); the norm criterion still fails loudly on any real
            # DP bug (per-shard mean = 8x scale)
            err = np.linalg.norm(a - b) / (
                np.linalg.norm(a) + 1e-3 * gscale + 1e-9)
            assert err <= norm_rel, f"grad leaf rel-norm err {err:.2e}"
            continue
        # `factor` of the leaf's largest gradient: loose enough for f32
        # reduction-order noise (denoise losses are O(10^3)), tight enough
        # that any real DP bug (per-shard mean = 8x scale) fails loudly
        np.testing.assert_allclose(
            a, b, atol=factor * (np.abs(a).max() + 1e-3))


def test_classify_dp_step_matches_single(rng):
    """The tcla BCE step under the DP mesh == single device."""
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.classify import make_classify_train_step

    cfg = Config(task="tcla", arch="unet_2", batch_size=8, bbox=16).finalize()
    model = create_detector(cfg)
    batch = _pn_batch(rng, h=16, w=16)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        batch["input"].reshape(-1, *batch["input"].shape[2:]),
    )

    step1 = make_classify_train_step(model, cfg)
    new1, m1 = step1(state, jax.device_put(batch))

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(
        make_classify_train_step(model, cfg), mesh
    )
    new8, m8 = step8(place_state(state), place_batch(batch))

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    assert float(m8["acc"]) == pytest.approx(float(m1["acc"]), rel=2e-4)
    _assert_grads_match(new1.opt_state, new8.opt_state)


def test_denoise_dp_step_matches_single(rng):
    """The SSDN denoise step under the DP mesh == single device (the sigma
    estimate averages within each crop, so crops shard independently)."""
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.denoise import (
        create_denoise_state, make_denoise_train_step,
    )

    cfg = Config(task="denoise", batch_size=8).finalize()
    state, models = create_denoise_state(cfg, jax.random.PRNGKey(0), crop=32)
    batch = rng.standard_normal((8, 32, 32, 1)).astype(np.float32)

    step1 = make_denoise_train_step(models)
    new1, m1 = step1(state, jax.device_put(batch))

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(
        make_denoise_train_step(models), mesh
    )
    new8, m8 = step8(place_state(state), place_batch(batch))

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    assert float(m8["noise_std"]) == pytest.approx(
        float(m1["noise_std"]), rel=2e-4)
    _assert_grads_match(new1.opt_state, new8.opt_state)


def test_scan_finetune_dp_step_matches_single(rng):
    """The SCAN fine-tune step under the DP mesh == single device (the
    entropy term's batch mean becomes a GSPMD psum; consistency is
    per-sample)."""
    from cet_pick_tpu.models.simsiam import create_scan_model
    from cet_pick_tpu.parallel.mesh import make_dp_step
    from cet_pick_tpu.train.scan import (
        create_scan_state, make_scan_finetune_step,
    )

    cfg = Config(task="scan", arch="simsiam2d_18", bbox=24, nclusters=2,
                 nheads=2, batch_size=8).finalize()
    model = create_scan_model(cfg, n_clusters=2, n_heads=2)
    p = rng.standard_normal((8, 24, 24, 1)).astype(np.float32)
    nb = rng.standard_normal((8, 24, 24, 1)).astype(np.float32)
    state = create_scan_state(model, cfg, jax.random.PRNGKey(0), p[:1], None)

    inner = make_scan_finetune_step(model, entropy_weight=2.0)
    new1, m1 = inner(state, jax.device_put(p), None, jax.device_put(nb), None)

    def dict_step(state, batch):
        return inner(state, batch["a2d"], batch.get("a3d"),
                     batch["n2d"], batch.get("n3d"))

    mesh = make_mesh((8,), ("data",))
    step8, place_state, place_batch = make_dp_step(dict_step, mesh)
    new8, m8 = step8(place_state(state), place_batch({"a2d": p, "n2d": nb}))

    assert float(m8["total_loss"]) == pytest.approx(
        float(m1["total_loss"]), rel=2e-4)
    np.testing.assert_allclose(np.asarray(m8["head_losses"]),
                               np.asarray(m1["head_losses"]), rtol=2e-4)
    # the 18-BN-layer trunk amplifies sharded-reduction stat noise through
    # forward AND backward (the explore test tolerates the same class)
    _assert_grads_match(new1.opt_state, new8.opt_state, norm_rel=2e-2)


def test_detector_spatial_mesh_matches_single(rng, tmp_path):
    """TomoDetector with --mesh_shape shards the forward's H axis over the
    mesh (CLI-reachable spatial inference) and reproduces the single-device
    picks."""
    from cet_pick_tpu.infer.detector import TomoDetector

    vol = rng.standard_normal((12, 64, 64)).astype(np.float32)
    cfg1 = Config(task="semi", arch="unet_2", K=40, out_thresh=0.0,
                  cutoff_z=1, root_dir=str(tmp_path)).finalize()
    model = create_detector(cfg1)
    state = create_train_state(
        model, cfg1, jax.random.PRNGKey(0), np.zeros((1, 8, 64, 64),
                                                     np.float32))

    det1 = TomoDetector(cfg1, params=state.params,
                        batch_stats=state.batch_stats)
    hm1, dets1 = det1.process(vol)

    cfg8 = Config(task="semi", arch="unet_2", K=40, out_thresh=0.0,
                  cutoff_z=1, mesh_shape=(8,),
                  root_dir=str(tmp_path)).finalize()
    det8 = TomoDetector(cfg8, params=state.params,
                        batch_stats=state.batch_stats)
    assert det8.infer._vol_shard is not None  # the mesh actually engaged
    hm8, dets8 = det8.process(vol)

    np.testing.assert_allclose(np.asarray(hm8), np.asarray(hm1), atol=2e-5)
    d1, d8 = np.asarray(dets1), np.asarray(dets8)
    # same picked voxels; scores within conv reduction-order noise
    np.testing.assert_array_equal(d8[:, :3], d1[:, :3])
    np.testing.assert_allclose(d8[:, 3:], d1[:, 3:], atol=2e-5)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_detector_2d_mesh_matches_single(rng, tmp_path, mesh_shape):
    """A 2D --mesh_shape ("data", "space") DP-shards the fused forward's
    z-window batch over the leading axis AND spatially shards H over the
    trailing one; picks reproduce the single-device run. The volume is deep
    enough (3 z-windows at tile_z=16) that the fused batch actually has a
    data dimension to shard."""
    from cet_pick_tpu.infer.detector import TomoDetector

    vol = rng.standard_normal((48, 32, 32)).astype(np.float32)
    common = dict(task="semi", arch="unet_2", K=40, out_thresh=0.0,
                  cutoff_z=1, tile=(16, 0, 0))
    cfg1 = Config(root_dir=str(tmp_path / "s"), **common).finalize()
    model = create_detector(cfg1)
    state = create_train_state(
        model, cfg1, jax.random.PRNGKey(0), np.zeros((1, 8, 32, 32),
                                                     np.float32))

    det1 = TomoDetector(cfg1, params=state.params,
                        batch_stats=state.batch_stats)
    hm1, dets1 = det1.process(vol)

    cfgm = Config(root_dir=str(tmp_path / "m"), mesh_shape=mesh_shape,
                  **common).finalize()
    detm = TomoDetector(cfgm, params=state.params,
                        batch_stats=state.batch_stats)
    assert detm.infer._win_shard is not None
    assert detm.infer._win_shard.mesh.axis_names == ("data", "space")
    hmm, detsm = detm.process(vol)

    np.testing.assert_allclose(np.asarray(hmm), np.asarray(hm1), atol=2e-5)
    d1, dm = np.asarray(dets1), np.asarray(detsm)
    np.testing.assert_array_equal(dm[:, :3], d1[:, :3])
    np.testing.assert_allclose(dm[:, 3:], d1[:, 3:], atol=2e-5)
