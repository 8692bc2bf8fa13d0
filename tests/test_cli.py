"""CLI surface: dispatcher, config bridge, file-level tools."""

import os

import numpy as np
import pandas as pd
import pytest

from cet_pick_tpu.__main__ import main
from cet_pick_tpu.cli.common import parse_config
from cet_pick_tpu.config import Config


def test_help_and_unknown(capsys):
    assert main([]) == 0
    assert "train" in capsys.readouterr().out
    assert main(["nope"]) == 2


def test_parse_config_flags():
    cfg = parse_config(["--task", "semi", "--lr", "5e-4", "--bbox", "16",
                        "--contrastive", "--lr_step", "5", "9",
                        "--dog", "2", "4"])
    assert cfg.lr == 5e-4 and cfg.bbox == 16 and cfg.contrastive
    assert cfg.lr_step == (5, 9) and cfg.dog == (2.0, 4.0)
    assert cfg.heads == {"hm": 1, "proj": 32}


def test_config_json_roundtrip(tmp_path):
    cfg = parse_config(["--task", "simsiam2d3d", "--arch", "simsiam2d3d_18"])
    p = tmp_path / "opt.json"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.task == "simsiam2d3d" and cfg2.head_conv == 128
    assert cfg2.dog == cfg.dog


def test_gen_files(tmp_path):
    # fake rec files + coordinate txts
    for n in ("a", "b"):
        (tmp_path / f"{n}.rec").write_bytes(b"")
        (tmp_path / f"{n}.txt").write_text("10 20 30\n40 50 60\n")
    main(["gen-files", "--dir", str(tmp_path), "--out", "demo", "--ord", "xzy"])
    imgs = pd.read_csv(tmp_path / "demo_train_imgs.txt", sep="\t")
    coords = pd.read_csv(tmp_path / "demo_train_coords.txt", sep="\t")
    assert set(imgs.image_name) == {"a", "b"}
    assert len(coords) == 4
    # xzy order: file row "10 20 30" -> x=10, z=20, y=30
    row = coords[coords.image_name == "a"].iloc[0]
    assert (row.x_coord, row.y_coord, row.z_coord) == (10, 30, 20)


def test_merge_cli(tmp_path, capsys):
    (tmp_path / "t1.txt").write_text("h\n1\t2\t3\t0.5\n")
    main(["merge", "--path", str(tmp_path), "--out", "all.out"])
    out = (tmp_path / "all.out").read_text().splitlines()
    assert out[0].startswith("image_name")
    assert out[1].startswith("t1")


def test_pr_curve_cli(tmp_path, capsys):
    t = tmp_path / "targets.txt"
    p = tmp_path / "preds.txt"
    pd.DataFrame({
        "image_name": ["a", "a"], "x_coord": [10, 30],
        "y_coord": [10, 30], "z_coord": [5, 5],
    }).to_csv(t, sep="\t", index=False)
    pd.DataFrame({
        "image_name": ["a", "a"], "x_coord": [10, 30], "z_coord": [5, 5],
        "y_coord": [10, 30], "score": [0.9, 0.8],
    }).to_csv(p, sep="\t", index=False)
    main(["pr-curve", "--predicted", str(p), "--targets", str(t), "-r", "3",
          "--out", str(tmp_path / "pr.tsv")])
    out = capsys.readouterr().out
    assert "auprc=1.0" in out
    assert (tmp_path / "pr.tsv").exists()


def test_remove_golds_cli(tmp_path):
    det_dir = tmp_path / "dets"
    gold_dir = tmp_path / "golds"
    out_dir = tmp_path / "out"
    det_dir.mkdir()
    gold_dir.mkdir()
    (det_dir / "TS1.txt").write_text("10\t10\t10\n100\t100\t100\n")
    (gold_dir / "TS1_gold3d.txt").write_text("12\t10\t10\n")
    main(["remove-golds", "--path", str(det_dir), "--gold", str(gold_dir),
          "--out", str(out_dir)])
    kept = (out_dir / "TS1.txt").read_text().strip().splitlines()
    assert kept == ["100\t100\t100"]


def test_spectrum_cli_roundtrip(tmp_path, rng, capsys):
    """extract-spectrum -> match-spectrum through the real file formats."""
    from cet_pick_tpu.io.mrc import read_mrc, write_mrc

    tomo = rng.standard_normal((16, 16, 16)).astype(np.float32)
    write_mrc(str(tmp_path / "t.mrc"), tomo)
    main(["extract-spectrum", "-i", str(tmp_path / "t.mrc"),
          "-o", str(tmp_path / "s.tsv")])
    spec = pd.read_csv(tmp_path / "s.tsv", sep="\t")
    assert list(spec.columns) == ["freq", "intensity"]
    main(["match-spectrum", "-i", str(tmp_path / "t.mrc"),
          "-t", str(tmp_path / "s.tsv"), "-o", str(tmp_path / "m.mrc"),
          "-c", "6", "-s", "2.0"])
    out = read_mrc(str(tmp_path / "m.mrc"))
    assert out.shape == (16, 16, 16) and np.isfinite(out).all()


def test_backproject_cli(tmp_path, rng):
    from cet_pick_tpu.io.mrc import read_mrc, write_mrc
    from cet_pick_tpu.utils.geometry import random_so3
    from cet_pick_tpu.utils.reconstruct import save_poses

    imgs = rng.standard_normal((6, 16, 16)).astype(np.float32)
    write_mrc(str(tmp_path / "p.mrcs"), imgs)
    rots = random_so3(6, rng).astype(np.float32)
    trans = rng.uniform(-0.1, 0.1, (6, 2)).astype(np.float32)
    # fractions scale by the symmetrized lattice size box+1 (load_poses doc)
    save_poses(str(tmp_path / "pose.pkl"), rots, trans, d=17)
    main(["backproject", "--particles", str(tmp_path / "p.mrcs"),
          "--poses", str(tmp_path / "pose.pkl"), "-o", str(tmp_path / "v.mrc"),
          "--first", "6"])
    vol = read_mrc(str(tmp_path / "v.mrc"))
    assert vol.shape == (16, 16, 16) and np.isfinite(vol).all()


@pytest.mark.slow
def test_cli_train_then_test_from_disk(tmp_path, rng):
    """The real user surface end to end: .rec volume + image/coord lists on
    disk -> `cet_pick_tpu train` -> `cet_pick_tpu test` -> reference-format
    detection outputs (reference main.py + test.py driven via files)."""
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc

    vol, df = make_synthetic(np.random.default_rng(3))
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)
    df.to_csv(data / "train_coords.txt", sep="\t", index=False)

    common = ["--task", "semi", "--arch", "unet_2", "--order", "zxy",
              "--K", "60", "--data_dir", str(data),
              "--root_dir", str(tmp_path)]
    main(["train", *common, "--no-contrastive", "--batch_size", "4",
          "--num_epochs", "2", "--bbox", "8", "--val_intervals", "-1",
          "--lr", "1e-3"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="semi", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))

    main(["test", *common, "--out_thresh", "0.0", "--cutoff_z", "2",
          "--nms", "5"])
    out_txt = os.path.join(cfg.out_path, "syn0.txt")
    out_hm = os.path.join(cfg.out_path, "syn0_hm.mrc")
    assert os.path.exists(out_txt) and os.path.exists(out_hm)
    picks = np.loadtxt(out_txt, ndmin=2)
    assert len(picks) > 0 and picks.shape[1] in (3, 4)

    # --tta through the same CLI: flip-averaged heatmap, trained with the
    # flip-consistency loss the views ensemble over; the easy planted
    # particles must still all be found
    main(["test", *common, "--out_thresh", "0.0", "--cutoff_z", "2",
          "--nms", "5", "--tta", "--out_id", "output_tta"])
    cfg_tta = C(task="semi", root_dir=str(tmp_path),
                out_id="output_tta").finalize()
    picks_tta = np.loadtxt(os.path.join(cfg_tta.out_path, "syn0.txt"),
                           ndmin=2)
    assert len(picks_tta) > 0 and picks_tta.shape[1] in (3, 4)


@pytest.mark.slow
def test_cli_test_with_forced_xy_envelope_matches(tmp_path, rng,
                                                  monkeypatch):
    """The auto-xy HBM envelope driven END TO END through the real `test`
    CLI (run_test streaming, uint8 path, writers): with CET_XY_BUDGET
    forced small the envelope must engage and the written coordinate file
    must be byte-identical to the unforced run (the CI half of the
    giant-volume scale proof, benchmarks/giant_volume.py)."""
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc

    vol, df = make_synthetic(np.random.default_rng(3), h=192, w=192)
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)
    df.to_csv(data / "train_coords.txt", sep="\t", index=False)

    common = ["--task", "semi", "--arch", "unet_2", "--order", "zxy",
              "--K", "60", "--data_dir", str(data),
              "--root_dir", str(tmp_path)]
    main(["train", *common, "--no-contrastive", "--batch_size", "4",
          "--num_epochs", "1", "--bbox", "8", "--val_intervals", "-1"])

    main(["test", *common, "--out_thresh", "0.0", "--cutoff_z", "2",
          "--nms", "5", "--tile", "64", "0", "0"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="semi", root_dir=str(tmp_path)).finalize()
    base = open(os.path.join(cfg.out_path, "syn0.txt"), "rb").read()
    assert base

    monkeypatch.setenv("CET_XY_BUDGET", "30e6")
    from cet_pick_tpu.infer.tiled import TiledHeatmapInference

    engaged = []
    orig = TiledHeatmapInference._auto_xy

    def spy(self, *a):
        t = orig(self, *a)
        engaged.append(t)
        return t

    monkeypatch.setattr(TiledHeatmapInference, "_auto_xy", spy)
    main(["test", *common, "--out_thresh", "0.0", "--cutoff_z", "2",
          "--nms", "5", "--tile", "64", "0", "0", "--out_id", "out_env"])
    assert any(t is not None for t in engaged), "envelope never engaged"
    cfg2 = C(task="semi", root_dir=str(tmp_path), out_id="out_env").finalize()
    forced = open(os.path.join(cfg2.out_path, "syn0.txt"), "rb").read()
    assert forced == base


@pytest.mark.slow
def test_cli_train_resume_from_disk(tmp_path, rng):
    """`train --resume` must pick up model_last automatically
    (config.py mirrors opts.py:265-268), restore optimizer state + epoch
    (state.py load_checkpoint resume=True, model.py:234-247), and continue
    the epoch count instead of restarting at 1 — previously untested."""
    from flax import serialization
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc

    vol, df = make_synthetic(np.random.default_rng(5), d=20, h=96, w=96,
                             n_part=8)
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    df.to_csv(data / "train_coords.txt", sep="\t", index=False)

    common = ["--task", "semi", "--arch", "unet_2", "--order", "zxy",
              "--data_dir", str(data), "--root_dir", str(tmp_path),
              "--no-contrastive", "--batch_size", "4", "--bbox", "8",
              "--val_intervals", "-1", "--lr", "1e-3"]
    main(["train", *common, "--num_epochs", "2"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="semi", root_dir=str(tmp_path)).finalize()
    ck = os.path.join(cfg.save_dir, "model_last", "state.msgpack")

    def read_ck():
        with open(ck, "rb") as f:
            return serialization.msgpack_restore(f.read())

    p1 = read_ck()
    assert p1["epoch"] == 2 and p1["step"] > 0

    main(["train", *common, "--num_epochs", "4", "--resume"])
    p2 = read_ck()
    assert p2["epoch"] == 4  # continued 3..4, not restarted at 1
    assert p2["step"] > p1["step"]


@pytest.mark.slow
def test_cli_explore_chain_from_disk(tmp_path, rng):
    """The exploration workflow through the real CLI surface: .rec on disk
    -> `explore` (SimSiam training) -> `embed` (all_output_info.npz) ->
    `plot2d` (clusters + parquet + colors) -> `to-coords` (training
    coordinates) — the reference's simsiam_main.py -> simsiam_test_hm ->
    plot_2d.py -> interactive_to_training_coords.py chain."""
    from test_explore import make_explore_fixture

    from cet_pick_tpu.io.mrc import write_mrc

    rec, _, _ = make_explore_fixture(np.random.default_rng(5))
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn.rec"), rec)
    listing = f"image_name\trec_path\nsyn\t{data / 'syn.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)

    common = ["--task", "simsiam3d", "--arch", "simsiam2d_18", "--order",
              "zxy", "--bbox", "24", "--dog", "2", "4", "--head_conv", "32",
              "--data_dir", str(data), "--root_dir", str(tmp_path)]
    main(["explore", *common, "--batch_size", "4", "--num_epochs", "1",
          "--lr", "0.05", "--val_intervals", "-1"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="simsiam3d", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))

    main(["embed", *common])
    npz = os.path.join(cfg.save_dir, "all_output_info.npz")
    assert os.path.exists(npz)

    viz = tmp_path / "viz"
    main(["plot2d", "--input", npz, "--path", str(viz), "--n_cluster", "2",
          "--mode", "tsne", "--num_neighbor", "5", "--save_out_img", "0"])
    parquet = viz / "interactive_info_parquet.gzip"
    assert parquet.exists()
    assert (viz / "all_colors.npy").exists()

    out_coords = tmp_path / "training_coords.txt"
    main(["to-coords", "--input", str(parquet), "--output", str(out_coords)])
    table = pd.read_csv(out_coords, sep="\t")
    assert list(table.columns) == ["image_name", "x_coord", "y_coord", "z_coord"]
    assert len(table) > 0 and set(table.image_name) == {"syn"}

    # SCAN head over the extracted embeddings (reference scan task)
    scan_out = tmp_path / "scan_labels.npz"
    main(["scan", "--input", npz, "--out", str(scan_out), "--n_clusters", "2",
          "--neighbors", "3", "--steps", "30"])
    labels = np.load(scan_out)
    assert len(labels["label"]) == len(table)

    # full-model SCAN fine-tune off the pretext checkpoint
    sf_out = tmp_path / "scan_ft.npz"
    main(["scan-finetune", *common, "--load_model",
          os.path.join(cfg.save_dir, "model_last"), "--out", str(sf_out),
          "--neighbors", "3", "--steps", "8", "--nclusters", "2",
          "--batch_size", "8"])
    assert len(np.load(sf_out)["label"]) == len(table)
    assert os.path.isdir(os.path.join(cfg.save_dir, "scan_model_last"))


@pytest.mark.slow
def test_cli_semiclass_train_then_classify_test_from_disk(tmp_path, rng):
    """The semiclass workflow through the real CLI: .rec + lists on disk ->
    `train --task semiclass` (fill/unfill focal mode) -> `classify-test`
    (greedy spherical NMS picking) -> reference-format outputs
    (reference main.py --task semiclass + test_class.py driven via files)."""
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc

    # 256^2 + margin 70: classify-test zeroes a 60-input-px xy band
    vol, df = make_synthetic(np.random.default_rng(11), h=256, w=256,
                             margin=70)
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)
    df.to_csv(data / "train_coords.txt", sep="\t", index=False)

    common = ["--task", "semiclass", "--arch", "unet_2", "--order", "zxy",
              "--K", "60", "--data_dir", str(data), "--root_dir", str(tmp_path)]
    main(["train", *common, "--no-contrastive", "--no-ge", "--pn",
          "--batch_size", "8", "--num_epochs", "3", "--num_iters", "64",
          "--bbox", "8", "--val_intervals", "-1", "--lr", "1e-3"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="semiclass", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))

    main(["classify-test", *common, "--no-ge", "--pn", "--out_thresh", "0.0",
          "--cutoff_z", "2", "--nms", "5"])
    out_txt = os.path.join(cfg.out_path, "syn0.txt")
    assert os.path.exists(out_txt)
    assert os.path.exists(os.path.join(cfg.out_path, "syn0_hm.mrc"))


@pytest.mark.slow
def test_cli_denoise_from_disk(tmp_path, rng):
    """`cet_pick_tpu denoise` trains the blind-spot denoiser from a .rec on
    disk and writes the denoised volume (reference denoise workflow)."""
    from cet_pick_tpu.io.mrc import read_mrc, write_mrc

    vol = rng.standard_normal((16, 64, 64)).astype(np.float32)
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "n.rec"), vol)
    (data / "train_images.txt").write_text(
        f"image_name\trec_path\nn\t{data / 'n.rec'}\n")
    main(["denoise", "--order", "zxy", "--data_dir", str(data),
          "--root_dir", str(tmp_path), "--batch_size", "4",
          "--num_iters", "16", "--crop", "32", "--write_denoised"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="denoise", root_dir=str(tmp_path)).finalize()
    den = read_mrc(os.path.join(cfg.save_dir, "n_denoised.mrc"))
    assert den.shape == vol.shape and np.isfinite(den).all()


@pytest.mark.slow
def test_cli_fewshot_from_disk(tmp_path, rng):
    """`cet_pick_tpu fewshot --write_picks` from labeled coordinates on
    disk (task fs, reference tomo_fewshot_cr_trainer.py driven via files)."""
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc

    vol, df = make_synthetic(np.random.default_rng(9))
    df["label"] = [1 + (i % 2) for i in range(len(df))]
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    df.to_csv(data / "train_coords.txt", sep="\t", index=False)

    main(["fewshot", "--task", "fs", "--arch", "unet_2", "--order", "zxy",
          "--data_dir", str(data), "--root_dir", str(tmp_path),
          "--num_epochs", "2", "--K", "30", "--out_thresh", "0.0",
          "--write_picks"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="fs", root_dir=str(tmp_path)).finalize()
    out = os.path.join(cfg.out_path, "syn0.txt")
    assert os.path.exists(out)


@pytest.mark.slow
def test_cli_moco_from_disk(tmp_path, rng):
    """`cet_pick_tpu moco` (momentum-contrast exploration) from a .rec on
    disk (reference moco_main.py via files)."""
    from test_explore import make_explore_fixture

    from cet_pick_tpu.io.mrc import write_mrc

    rec, _, _ = make_explore_fixture(np.random.default_rng(6))
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn.rec"), rec)
    (data / "train_images.txt").write_text(
        f"image_name\trec_path\nsyn\t{data / 'syn.rec'}\n")
    main(["moco", "--task", "moco", "--arch", "simsiam2d_18", "--order",
          "zxy", "--bbox", "24", "--dog", "2", "4", "--head_conv", "32",
          "--data_dir", str(data), "--root_dir", str(tmp_path),
          "--batch_size", "4", "--num_epochs", "1", "--lr", "0.05",
          "--val_intervals", "-1"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="moco", root_dir=str(tmp_path)).finalize()
    assert os.path.exists(os.path.join(cfg.save_dir, "model_last",
                                       "moco_state.msgpack"))


def test_cli_sublabels_and_visualize3d(tmp_path, rng):
    """`sublabels` (cluster-label coordinate export) and `visualize3d`
    (napari overlay volumes) from synthetic embedding artifacts."""
    from cet_pick_tpu.io.mrc import write_mrc

    n = 12
    names = np.array(["syn"] * n)
    coords = rng.uniform(10, 50, (n, 3)).astype(np.float32)
    labels = np.array([i % 2 for i in range(n)])
    parquet = tmp_path / "interactive_info_parquet.gzip"
    pd.DataFrame({
        "name": list(names),
        "coord": [[str(v) for v in c] for c in coords],
        "label": list(labels),
    }).to_parquet(parquet, compression="gzip")
    main(["sublabels", "--input", str(parquet), "--out_path",
          str(tmp_path / "sub"), "--use_classes", "1"])
    out = tmp_path / "sub" / "syn.txt"
    assert out.exists() and len(out.read_text().strip().splitlines()) == 6

    npz = tmp_path / "emb.npz"
    np.savez(npz, name=names, coords=coords,
             proj=rng.standard_normal((n, 8)).astype(np.float32),
             pred=rng.standard_normal((n, 8)).astype(np.float32))
    colors = np.clip(rng.random((n, 3)), 0, 1).astype(np.float32)
    np.save(tmp_path / "all_colors.npy", colors)
    write_mrc(str(tmp_path / "syn.rec"),
              rng.standard_normal((64, 64, 64)).astype(np.float32))
    main(["visualize3d", "--input", str(npz), "--color",
          str(tmp_path / "all_colors.npy"), "--dir_simsiam",
          str(tmp_path / "v3d"), "--rec_dir", str(tmp_path),
          "--order", "zxy"])
    import glob as _glob

    written = _glob.glob(str(tmp_path / "v3d" / "*.npy"))
    assert len(written) >= 2  # _rec3d + _hm3d_simsiam volumes


def test_jax_cache_setup(tmp_path, monkeypatch):
    """CLI commands enable the persistent XLA compilation cache (opt-out via
    CET_PICK_TPU_CACHE=); an explicit JAX_COMPILATION_CACHE_DIR wins."""
    import jax

    from cet_pick_tpu.__main__ import _setup_jax_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.setenv("CET_PICK_TPU_CACHE", str(tmp_path / "xla"))
        _setup_jax_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")

        # empty CET_PICK_TPU_CACHE disables (config untouched)
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("CET_PICK_TPU_CACHE", "")
        _setup_jax_cache()
        assert jax.config.jax_compilation_cache_dir is None

        # user's JAX_COMPILATION_CACHE_DIR wins: helper must not override
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/elsewhere")
        monkeypatch.setenv("CET_PICK_TPU_CACHE", str(tmp_path / "xla"))
        _setup_jax_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cli_export_torch_roundtrip(tmp_path):
    """`export-torch` writes a reference-format .pth that imports back to
    the exact same parameters (disk-level inverse of --load_model *.pth)."""
    import jax

    from cet_pick_tpu.models.convert import load_reference_checkpoint
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    cfg = Config(task="semi", arch="unet_2", root_dir=str(tmp_path)).finalize()
    model = create_detector(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(7), np.zeros((1, 8, 64, 64), np.float32)
    )
    ck = tmp_path / "model_last"
    save_checkpoint(str(ck), state, config=cfg)

    out = tmp_path / "exported.pth"
    rc = main(["export-torch", "--load_model", str(ck), "--out", str(out)])
    assert rc in (0, None) and out.exists()

    import torch

    payload = torch.load(str(out), map_location="cpu")
    assert set(payload) == {"epoch", "state_dict"}

    params, batch_stats = load_reference_checkpoint(str(out), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(state.params)
    flat_b = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(state.batch_stats),
        jax.tree_util.tree_leaves_with_path(batch_stats),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cli_export_torch_rejects_non_unet(tmp_path, capsys):
    cfg = Config(task="semi", arch="res3d_1", root_dir=str(tmp_path)).finalize()
    ck = tmp_path / "ck"
    ck.mkdir()
    cfg.save(str(ck / "opt.json"))
    (ck / "state.msgpack").write_bytes(b"")
    rc = main(["export-torch", "--load_model", str(ck),
               "--out", str(tmp_path / "x.pth")])
    assert rc == 2
    assert "unet" in capsys.readouterr().out


def test_cli_export_torch_simsiam(tmp_path):
    """export-torch on an explore checkpoint writes a TomoResClassifier-format
    .pth whose tensors import back bitwise via simsiam_state_dict_to_flax."""
    import jax

    from cet_pick_tpu.models.convert import simsiam_state_dict_to_flax
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state
    from cet_pick_tpu.train.state import save_checkpoint

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18", head_conv=32,
                 bbox=16, root_dir=str(tmp_path)).finalize()
    model = create_simsiam(cfg)
    anchor = np.zeros((2, 2, 16, 16), np.float32)
    state = create_simsiam_state(
        model, cfg, jax.random.PRNGKey(1), {"anchor": anchor})
    ck = tmp_path / "model_last"
    save_checkpoint(str(ck), state, config=cfg)

    out = tmp_path / "simsiam.pth"
    rc = main(["export-torch", "--load_model", str(ck), "--out", str(out)])
    assert rc in (0, None) and out.exists()

    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(str(out), map_location="cpu")["state_dict"].items()}
    assert "proj.0.weight" in sd and "pred.3.bias" in sd
    params, stats = simsiam_state_dict_to_flax(sd)
    for tree_a, tree_b in ((state.params, params),
                           (state.batch_stats, stats)):
        flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
        flat_b = jax.tree_util.tree_leaves_with_path(tree_b)
        assert len(flat_a) == len(flat_b)
        for (pa, la), (pb, lb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cli_export_torch_scan(tmp_path):
    """export-torch on a SCAN checkpoint emits the reference ClusteringModel
    layout (backbone.* + cluster_head.{i}.*)."""
    import jax

    from cet_pick_tpu.models.simsiam import create_scan_model
    from cet_pick_tpu.train.state import TrainState, save_checkpoint

    import optax

    cfg = Config(task="scan2d3d", arch="simsiam2d3d_18", head_conv=32,
                 bbox=16, root_dir=str(tmp_path)).finalize()
    model = create_scan_model(cfg, n_clusters=3, n_heads=2)
    x = np.zeros((2, 16, 16, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(2), x, x, train=False)
    tx = optax.sgd(1e-3)
    state = TrainState(
        step=0, epoch=4, params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), tx=tx,
    )
    ck = tmp_path / "scan_model_last"
    save_checkpoint(str(ck), state, config=cfg)
    (ck / "best_head.json").write_text('{"best_loss_head": 1}')

    out = tmp_path / "scan.pth"
    rc = main(["export-torch", "--load_model", str(ck), "--out", str(out)])
    assert rc in (0, None)

    import torch

    payload = torch.load(str(out), map_location="cpu")
    assert payload["epoch"] == 4
    assert payload["best_loss_head"] == 1
    sd = payload["state_dict"]
    assert "backbone.conv1.weight" in sd
    assert "cluster_head.0.weight" in sd and "cluster_head.1.bias" in sd
    assert tuple(sd["cluster_head.0.weight"].shape) == (3, 32)
    np.testing.assert_array_equal(
        sd["cluster_head.1.weight"].numpy(),
        np.asarray(variables["params"]["head1"]["kernel"]).T)


def test_doctor_cli(capsys):
    """`doctor` prints one JSON health line; on the CPU test backend the
    tunnel probe is skipped and health == the compile smoke."""
    import json

    assert main(["doctor"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["backend"] == "cpu"
    assert report["device_count"] == 8  # conftest's virtual mesh
    assert report["compile_smoke_ok"] and report["healthy"]


@pytest.mark.slow
def test_doctor_empiar_dry_run(tmp_path):
    """`doctor --empiar <dir>`: the one-shot EMPIAR validation pipeline
    (train -> test -> pr-curve) dry-runs green against a synthetic fixture
    laid out in the EMPIAR tutorial directory format (VERDICT r3 item 9)."""
    from test_e2e import make_synthetic

    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.utils.empiar import run_empiar_validation

    vol, df = make_synthetic(np.random.default_rng(11))
    data = tmp_path / "empiar"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), vol)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    # the tutorial archives' own file names
    (data / "sample_train_explore_img.txt").write_text(listing)
    df.to_csv(data / "training_coordinates.txt", sep="\t", index=False)
    (data / "sample_val_img.txt").write_text(listing)
    df.to_csv(data / "val_coordinates.txt", sep="\t", index=False)

    # synthetic-fixture overrides (argparse keeps the LAST occurrence, so
    # these override the frozen tutorial recipe flags): identity axis
    # order, no z-compress, tiny arch, easy thresholds
    over_train = ["--order", "zxy", "--no-compress", "--gauss", "0",
                  "--arch", "unet_2", "--bbox", "8", "--batch_size", "4",
                  "--no-contrastive", "--lr", "1e-3", "--K", "60",
                  "--thresh", "0.5"]
    over_test = ["--order", "zxy", "--no-compress", "--gauss", "0",
                 "--arch", "unet_2", "--K", "60", "--out_thresh", "0.0",
                 "--cutoff_z", "2", "--nms", "5", "--no-fiber"]
    report = run_empiar_validation(
        str(data), recipe="globular", root_dir=str(tmp_path / "run"),
        num_epochs=4, extra_train=over_train, extra_test=over_test,
        f1_target=0.5, log_fn=lambda *_: None,
    )
    assert report["pass"], report
    assert report["best_f1"] > 0.5
    assert os.path.exists(report["pr_table"])
    assert os.path.exists(report["predictions"])


@pytest.mark.slow
def test_cli_vol_explore_and_embed_from_disk(tmp_path, rng):
    """`explore --task simsiam --arch simsiam_18` (3D-subvolume mode) then
    `embed` from a .rec on disk — the vol-mode user surface end to end
    (reference moco_main.py --dataset simsiam via files)."""
    from test_explore import make_explore_fixture

    from cet_pick_tpu.io.mrc import write_mrc

    rec, _, _ = make_explore_fixture(np.random.default_rng(6))
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn.rec"), rec)
    listing = f"image_name\trec_path\nsyn\t{data / 'syn.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)
    common = ["--task", "simsiam", "--arch", "simsiam_18", "--order", "zxy",
              "--vol_size", "8", "32", "32", "--dog", "2", "4",
              "--head_conv", "32", "--data_dir", str(data),
              "--root_dir", str(tmp_path)]
    main(["explore", *common, "--batch_size", "4", "--num_epochs", "1",
          "--lr", "0.05", "--val_intervals", "-1"])
    from cet_pick_tpu.config import Config as C

    cfg = C(task="simsiam", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))

    main(["embed", *common])
    npz = np.load(os.path.join(cfg.save_dir, "all_output_info.npz"))
    assert sorted(npz.files) == ["coords", "name", "pred", "proj", "subvol"]
    assert npz["subvol"].shape[1:] == (8, 32, 32)
    assert np.isfinite(npz["proj"]).all()
