"""The complete MiLoPYP user journey, driven end to end through the CLI.

Chains every stage of the documented two-module workflow
(docs/quick_tutorial.md == the reference tutorial, reference
docs/quick_tutorial.md:34-104) on one synthetic two-species tomogram:

    explore (simsiam3d, rec-only)      exploration training
    -> embed                           all_output_info.npz
    -> plot2d                          cluster + interactive parquet
    -> [select the target cluster]     the Phoenix step, simulated by
                                       filtering the parquet against the
                                       ground truth (what the user does
                                       visually)
    -> to-coords                       training_coordinates.txt
    -> train (semi, PU)                refinement training on the selection
    -> test                            picks txt (+ heatmap)
    -> merge -> pr-curve               F1 against the target species

Every stage consumes the previous stage's on-disk artifacts in the frozen
reference formats, so this certifies the cross-stage format interop the
per-stage tests cannot see. Per-stage quality is gated elsewhere
(tests/test_explore.py long-run separability, tests/test_e2e.py train->pick
F1); the floors here are deliberately modest — the chain compounds noise.
"""

import os

import numpy as np
import pandas as pd
import pytest

from cet_pick_tpu.__main__ import main
from cet_pick_tpu.config import Config


def two_species_volume():
    """Deterministic 40x96x96 volume with a 3x3x2 grid of alternating
    species (same construction as the exploration separability test):
    species 0 = small dense gaussians, species 1 = large diffuse ones."""
    rng = np.random.default_rng(42)
    d, h, w = 40, 96, 96
    rec = rng.standard_normal((d, h, w)).astype(np.float32) * 0.3
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    centers, labels = [], []
    i = 0
    for z in (14, 26):
        for y in (30, 48, 66):
            for x in (30, 48, 66):
                cls = i % 2
                if cls == 0:
                    rec -= 2.5 * np.exp(
                        -(((zz - z) ** 2) + (yy - y) ** 2 + (xx - x) ** 2) / 8.0
                    ).astype(np.float32)
                else:
                    rec -= 1.8 * np.exp(
                        -(((zz - z) ** 2) + (yy - y) ** 2 + (xx - x) ** 2) / 18.0
                    ).astype(np.float32)
                centers.append((x, y, z))
                labels.append(cls)
                i += 1
    return rec, np.array(centers, np.float64), np.array(labels)


@pytest.mark.slow
def test_full_two_stage_workflow_cli(tmp_path):
    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.io.mrc import write_mrc

    rec, centers, labels = two_species_volume()
    data = tmp_path / "data"
    data.mkdir()
    write_mrc(str(data / "syn0.rec"), rec)
    listing = f"image_name\trec_path\nsyn0\t{data / 'syn0.rec'}\n"
    (data / "train_images.txt").write_text(listing)
    (data / "test_images.txt").write_text(listing)

    # ---- stage 1: exploration training (rec-only entry path) ------------
    # recipe proven by test_explore_long_run_no_collapse_and_separable
    exp_common = ["--task", "simsiam3d", "--arch", "simsiam2d_18",
                  "--order", "zxy", "--bbox", "24", "--head_conv", "64",
                  "--dog", "2", "4", "--data_dir", str(data),
                  "--root_dir", str(tmp_path), "--mesh_shape", "1"]
    main(["explore", *exp_common, "--batch_size", "8", "--lr", "0.1",
          "--cosine", "--num_epochs", "20", "--val_intervals", "-1"])
    exp_cfg = Config(task="simsiam3d", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(exp_cfg.save_dir, "model_last"))

    # ---- stage 2: embedding extraction ----------------------------------
    main(["embed", *exp_common])
    npz_path = os.path.join(exp_cfg.save_dir, "all_output_info.npz")
    info = np.load(npz_path, allow_pickle=True)
    assert {"proj", "pred", "name", "coords", "subvol"} <= set(info.files)

    # ---- stage 3: clustering + interactive artifacts --------------------
    viz = tmp_path / "viz"
    main(["plot2d", "--input", npz_path, "--path", str(viz),
          "--n_cluster", "3", "--mode", "tsne", "--num_neighbor", "10"])
    pq = viz / "interactive_info_parquet.gzip"
    assert pq.exists()
    df = pd.read_parquet(pq)

    # ---- stage 4: the user picks the species-0 cluster in Phoenix -------
    # simulated with the ground truth: coords within r=8 of a species-0
    # center count toward a label's purity; take the purest usable label
    coord = np.stack([np.asarray(c, np.float64) for c in df["coord"]])
    dist = np.linalg.norm(coord[:, None] - centers[None], axis=-1)
    near = dist.min(1) < 8.0
    is_sp0 = near & (labels[dist.argmin(1)] == 0)
    best_label, best_purity, best_n = None, -1.0, 0
    for lab in np.unique(df["label"]):
        m = (df["label"] == lab).to_numpy()
        if m.sum() < 4:
            continue
        purity = float(is_sp0[m].mean())
        if purity > best_purity:
            best_label, best_purity, best_n = lab, purity, int(m.sum())
    assert best_label is not None and best_purity >= 0.55, (
        f"no cluster isolates species 0 (best purity {best_purity:.2f} "
        f"over {best_n} members) — exploration quality regressed"
    )
    export = tmp_path / "selected.parquet"
    df.loc[df["label"] == best_label].to_parquet(export)

    # ---- stage 5: exported selection -> training coordinates ------------
    main(["to-coords", "--input", str(export),
          "--output", str(data / "train_coords.txt")])
    sel = pd.read_csv(data / "train_coords.txt", sep="\t")
    assert list(sel.columns) == ["image_name", "x_coord", "y_coord",
                                 "z_coord"]
    assert len(sel) >= 4

    # ---- stage 6: refinement training on the selection -------------------
    ref_common = ["--task", "semi", "--arch", "unet_2", "--order", "zxy",
                  "--K", "40", "--data_dir", str(data),
                  "--root_dir", str(tmp_path)]
    # 24 epochs, not the tutorial's 5-10: the selection is only ~6-9 coords
    # (2-3 steps/epoch at bs 4), and eval-mode inference needs enough steps
    # for the BN running stats to converge — at 8 epochs (~16 updates) the
    # eval forward is still flat ~0.5 while the train-mode forward already
    # peaks (debugged r3: running-stats lag, not a training failure)
    main(["train", *ref_common, "--no-contrastive", "--batch_size", "4",
          "--num_epochs", "24", "--bbox", "10", "--val_intervals", "-1",
          "--lr", "1e-3"])
    ref_cfg = Config(task="semi", root_dir=str(tmp_path)).finalize()
    assert os.path.isdir(os.path.join(ref_cfg.save_dir, "model_last"))

    # ---- stage 7: inference ----------------------------------------------
    main(["test", *ref_common, "--out_thresh", "0.0", "--cutoff_z", "2",
          "--nms", "5", "--with_score"])
    picks_txt = os.path.join(ref_cfg.out_path, "syn0.txt")
    assert os.path.exists(picks_txt)

    # ---- stage 8: merge + evaluate against the species-0 ground truth ----
    main(["merge", "--path", ref_cfg.out_path, "--out", "merged.txt"])
    targets = data / "targets.txt"
    with open(targets, "w") as f:
        f.write("image_name\tx_coord\ty_coord\tz_coord\n")
        for (x, y, z), lab in zip(centers, labels):
            if lab == 0:
                f.write(f"syn0\t{int(x)}\t{int(y)}\t{int(z)}\n")
    main(["pr-curve", "--predicted",
          os.path.join(ref_cfg.out_path, "merged.txt"),
          "--targets", str(targets), "-r", "6"])

    res = evaluate_detections(
        pd.read_csv(targets, sep="\t"),
        pd.read_csv(os.path.join(ref_cfg.out_path, "merged.txt"), sep="\t"),
        radius=6,
    )
    table = res["table"]
    best_f1 = float(table["f1"].max())
    assert best_f1 >= 0.6, (
        f"chained workflow best F1 {best_f1:.3f} < 0.6 "
        f"(selection purity was {best_purity:.2f} over {best_n})"
    )
