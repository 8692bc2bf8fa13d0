"""Flagship tutorial-scale end-to-end run: train + pick + score, timed.

Reproduces the reference tutorial's refinement recipe at its data scale
(docs/quick_tutorial.md:13-14, :95): 2 tomograms of 256x512x512 with 100
sparse annotations each, 10 epochs of PU + debiased-contrastive training
(batch 4, bf16 compute), then the tiled `test` inference and Hungarian-match
PR/F1 against the planted coordinates at radius 10.

Everything goes through the real CLI surface (`train` then `test`), so the
wall-clock includes data loading, heatmap building, the prefetched epoch
loops, checkpointing, and the pipelined inference writers — the honest
number a user sees.

Run on the TPU box from the repo root: python benchmarks/flagship_e2e.py
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_volume(rng, name, d=256, h=512, w=512, n_part=100, margin=40):
    """Dark gaussian particles splatted in LOCAL windows (the full-volume
    version in tests/test_e2e.py is O(n_part * volume) — too slow here)."""
    import pandas as pd

    vol = (rng.standard_normal((d, h, w)) * 0.5).astype(np.float32)
    r = 16
    zz, yy, xx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                             np.arange(-r, r + 1), indexing="ij")
    blob = np.exp(-((zz ** 2) / 8.0 + (yy ** 2) / 18.0 + (xx ** 2) / 18.0))
    blob = (2.5 * blob).astype(np.float32)
    coords = []
    for _ in range(n_part):
        z = int(rng.integers(r, d - r))
        y = int(rng.integers(margin, h - margin))
        x = int(rng.integers(margin, w - margin))
        vol[z - r : z + r + 1, y - r : y + r + 1, x - r : x + r + 1] -= blob
        coords.append((name, x, y, z))
    vol = (vol - vol.mean()) / vol.std()
    df = pd.DataFrame(coords,
                      columns=["image_name", "x_coord", "y_coord", "z_coord"])
    return vol, df


def main():
    import argparse

    import pandas as pd

    from cet_pick_tpu.__main__ import main as cli
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.io.mrc import write_mrc

    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="semi", choices=("semi", "semi3d"))
    ap.add_argument("--arch", default="unet_4",
                    help="unet_4 (2D flagship), unetw_3 (TPU-first "
                    "lane-filling arch) or res3d_2 (3D family; pair with "
                    "--task semi3d and a smaller --size — the reference's "
                    "semi3d path is whole-volume)")
    ap.add_argument("--recipe", default="globular",
                    choices=("globular", "tubular"),
                    help="globular = point particles + Hungarian F1; "
                    "tubular = planted fibers, --fiber train/test and the "
                    "recovered-curve F1 (quick_tutorial.md:180)")
    ap.add_argument("--size", type=int, nargs=3, default=None,
                    metavar=("D", "H", "W"),
                    help="volume size (default 256 512 512; semi3d default "
                    "128 256 256)")
    ap.add_argument("--epochs", type=int, default=10)
    a = ap.parse_args()
    three_d = a.task == "semi3d"
    tubular = a.recipe == "tubular"
    d, h, w = a.size or ((128, 256, 256) if three_d else (256, 512, 512))
    n_part = max(12, 100 * d * h * w // (256 * 512 * 512))

    tmp = tempfile.mkdtemp(prefix="flagship_")
    data = os.path.join(tmp, "data")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    dfs, listing, curves = [], "image_name\trec_path\n", {}
    for i in range(2):
        name = f"syn{i}"
        if tubular:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tests"))
            from test_e2e import make_fiber_synthetic

            n_fib = max(3, 8 * h // 512)
            vol, df, pts = make_fiber_synthetic(
                rng, d=d, h=h, w=w, n_fib=n_fib, margin=40)
            df["image_name"] = name
            curves[name] = pts
        else:
            vol, df = make_volume(rng, name, d=d, h=h, w=w, n_part=n_part)
        write_mrc(os.path.join(data, f"{name}.rec"), vol)
        del vol
        dfs.append(df)
        listing += f"{name}\t{os.path.join(data, f'{name}.rec')}\n"
    targets = pd.concat(dfs, ignore_index=True)
    open(os.path.join(data, "train_images.txt"), "w").write(listing)
    open(os.path.join(data, "test_images.txt"), "w").write(listing)
    targets.to_csv(os.path.join(data, "train_coords.txt"), sep="\t",
                   index=False)

    common = ["--task", a.task, "--arch", a.arch, "--order", "zxy",
              "--data_dir", data, "--root_dir", tmp, "--dtype", "bfloat16"]
    if tubular:
        # the tutorial's microtubule recipe minus the IO flags the synthetic
        # volumes don't need (quick_tutorial.md:180: thresh 0.3, cr_weight
        # 1.0, lr 1e-4, bbox 12, K 550, fiber)
        common += ["--bbox", "12", "--fiber"]
        train_extra = ["--thresh", "0.3", "--cr_weight", "1.0",
                       "--lr", "5e-4"]
        test_extra = ["--K", "550", "--nms", "3", "--out_thresh", "0.205",
                      "--curvature_cutoff", "0.03", "--cutoff_z", "2"]
    else:
        common += ["--bbox", "24"]
        train_extra = ["--lr", "1e-3"]
        test_extra = ["--K", "900", "--nms", "3", "--out_thresh", "0.0",
                      "--cutoff_z", "2"]
    t0 = time.perf_counter()
    cli(["train", *common, "--contrastive", "--batch_size", "4",
         "--num_epochs", str(a.epochs), "--val_intervals", "-1",
         *train_extra])
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    cli(["test", *common, *test_extra, "--with_score",
         "--tile", "64", "0", "0"])
    t_test = time.perf_counter() - t0

    cfg = Config(task=a.task, root_dir=tmp).finalize()
    if tubular:
        from test_e2e import recovered_curve_f1

        f1s = []
        for i in range(2):
            arr = np.loadtxt(os.path.join(cfg.out_path, f"syn{i}.txt"),
                             ndmin=2)
            r = recovered_curve_f1(arr[:, [0, 2, 1]], curves[f"syn{i}"],
                                   radius=6.0)
            f1s.append(r["f1"])
        print(f"[{a.task}/{a.arch}/tubular] train {t_train:.1f} s "
              f"({a.epochs} epochs, 2x {d}x{h}x{w})  test {t_test:.1f} s  "
              f"curve_f1 {min(f1s):.4f}/{max(f1s):.4f} (min/max over vols)",
              flush=True)
    else:
        rows = []
        for i in range(2):
            arr = np.loadtxt(os.path.join(cfg.out_path, f"syn{i}.txt"),
                             ndmin=2)
            for x, z, y, s in arr:
                rows.append((f"syn{i}", x, y, z, s))
        preds = pd.DataFrame(
            rows,
            columns=["image_name", "x_coord", "y_coord", "z_coord", "score"])
        res = evaluate_detections(targets, preds, radius=10.0)
        print(f"[{a.task}/{a.arch}] train {t_train:.1f} s ({a.epochs} "
              f"epochs, 2x {d}x{h}x{w}, {2 * n_part} ann)  "
              f"test {t_test:.1f} s  best_f1 {res['best_f1']:.4f}  "
              f"auprc {res['auprc']:.4f}", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
