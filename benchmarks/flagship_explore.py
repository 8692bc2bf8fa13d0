"""Flagship exploration run at the reference tutorial's data scale, timed.

The tutorial exploration recipe (reference docs/quick_tutorial.md:13-14, :39):
one 512x512x256 tomogram + its 512x512x41 tilt series, 20 epochs of
simsiam2d3d at batch 256, bbox 36 — then the `embed` pass that writes
all_output_info.npz. Everything goes through the real CLI (`explore`, then
`embed`), so the wall-clock includes DoG mining, the vectorized tilt-sum
patch extraction, the prefetched + lag-drained epoch loop, checkpointing,
and the embedding dump.

Run on the TPU box from the repo root: python benchmarks/flagship_explore.py
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fixture(rng, d=256, h=512, w=512, n_tilt=41, n_blob=300,
                 two_class=False):
    """Synthetic reconstruction with dark blobs + a matching tilt stack.

    The tilt images don't need to be geometrically consistent projections
    for a TIMING benchmark — each is the z-mean plus fresh noise, which
    keeps DoG mining + patch extraction realistic. ``two_class`` alternates
    small-dense / large-diffuse blobs and returns (centers, labels) for the
    separability trend."""
    rec = (rng.standard_normal((d, h, w)) * 0.5).astype(np.float32)
    r = 10
    zz, yy, xx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                             np.arange(-r, r + 1), indexing="ij")
    blobs = [
        (2.0 * np.exp(-((zz ** 2) / 6.0 + (yy ** 2) / 12.0
                        + (xx ** 2) / 12.0))).astype(np.float32),
        (1.5 * np.exp(-((zz ** 2) / 14.0 + (yy ** 2) / 28.0
                        + (xx ** 2) / 28.0))).astype(np.float32),
    ]
    centers, labels = [], []
    for i in range(n_blob):
        cls = (i % 2) if two_class else 0
        z = int(rng.integers(r, d - r))
        y = int(rng.integers(40, h - 40))
        x = int(rng.integers(40, w - 40))
        rec[z - r : z + r + 1, y - r : y + r + 1, x - r : x + r + 1] -= blobs[cls]
        centers.append((x, y, z))
        labels.append(cls)
    rec = (rec - rec.mean()) / rec.std()
    base = rec.mean(axis=0)
    tilts = np.stack([
        base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)
        for _ in range(n_tilt)
    ]).astype(np.float32)
    angles = np.linspace(-60.0, 60.0, n_tilt).astype(np.float32)
    if two_class:
        return rec, tilts, angles, np.array(centers, np.float64), np.array(labels)
    return rec, tilts, angles


def trend(epochs=100, every=10, size=(256, 512, 512), n_blob=300,
          batch_size=256):
    """Recommended-budget run (VERDICT r4 next #8): the reference advises
    100-300 exploration epochs (docs/explore.md:73); this runs simsiam2d3d
    at tutorial scale for ``epochs`` on the chip, scoring loss / output-std
    / two-class 1-NN separability every ``every`` epochs via the
    train_explore epoch_hook — the quality trend at the budget real users
    run, not just the 20-epoch tutorial gate."""
    import pandas as pd  # noqa: F401  (env parity with main())

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.infer.embed import extract_embeddings
    from cet_pick_tpu.train.explore import train_explore

    tmp = tempfile.mkdtemp(prefix="explore_trend_")
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    d, h, w = size
    rec, tilts, angles, centers, labels = make_fixture(
        rng, d=d, h=h, w=w, n_blob=n_blob, two_class=True)
    print(f"fixture built in {time.perf_counter() - t0:.1f} s", flush=True)

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18", bbox=36,
                 dog=(3, 6), dtype="bfloat16", batch_size=batch_size,
                 lr=0.05, num_epochs=epochs, cosine=True, val_intervals=-1,
                 root_dir=tmp).finalize()
    kw = dict(images={"syn": rec}, tilts={"syn": tilts},
              angles={"syn": angles})
    ds = ExploreDataset(cfg, "train", **kw)
    ds_test = ExploreDataset(cfg, "test", **kw)
    print(f"{len(ds)} candidates", flush=True)

    rows = []

    def separability(state):
        res = extract_embeddings(cfg, ds_test, state.params,
                                 state.batch_stats, batch_size=256)
        emb = res["proj"].astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        cand = res["coords"].astype(np.float64)
        dist = np.linalg.norm(cand[:, None] - centers[None], axis=-1)
        close = dist.min(1) < 10.0
        lab = labels[dist.argmin(1)][close]
        e = emb[close]
        sim = e @ e.T
        np.fill_diagonal(sim, -np.inf)
        return float((lab[sim.argmax(1)] == lab).mean()), int(close.sum())

    t_start = time.perf_counter()

    def hook(epoch, state, means):
        if epoch % every and epoch != 1:
            return
        agree, n = separability(state)
        rows.append((epoch, means.get("loss", float("nan")),
                     means.get("std", float("nan")), agree,
                     time.perf_counter() - t_start))
        print(f"epoch {epoch:>3}: loss {rows[-1][1]:.4f}  "
              f"std {rows[-1][2]:.4f}  1-NN agree {agree:.4f} "
              f"({n} matched)  t {rows[-1][4]:.0f} s", flush=True)

    state, hist = train_explore(cfg, ds, log_fn=lambda *_: None,
                                epoch_hook=hook)
    print(f"total {time.perf_counter() - t_start:.1f} s for {epochs} epochs",
          flush=True)
    print("epoch, loss, std, agree, t_s")
    for r in rows:
        print(f"{r[0]}, {r[1]:.4f}, {r[2]:.4f}, {r[3]:.4f}, {r[4]:.0f}")
    shutil.rmtree(tmp, ignore_errors=True)


def main():
    from cet_pick_tpu.__main__ import main as cli
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.io.mrc import write_mrc

    tmp = tempfile.mkdtemp(prefix="flagship_explore_")
    data = os.path.join(tmp, "data")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    rec, tilts, angles = make_fixture(rng)
    write_mrc(os.path.join(data, "syn.rec"), rec)
    write_mrc(os.path.join(data, "syn.mrc"), tilts)
    np.savetxt(os.path.join(data, "syn.tlt"), angles, fmt="%.2f")
    listing = ("image_name\trec_path\ttilt_path\tangle_path\n"
               f"syn\t{data}/syn.rec\t{data}/syn.mrc\t{data}/syn.tlt\n")
    open(os.path.join(data, "train_images.txt"), "w").write(listing)
    open(os.path.join(data, "test_images.txt"), "w").write(listing)
    del rec, tilts
    print(f"fixture built in {time.perf_counter() - t0:.1f} s", flush=True)

    common = ["--task", "simsiam2d3d", "--arch", "simsiam2d3d_18",
              "--order", "zxy", "--bbox", "36", "--dog", "3", "6",
              "--dtype", "bfloat16", "--data_dir", data, "--root_dir", tmp]
    t0 = time.perf_counter()
    cli(["explore", *common, "--batch_size", "256", "--num_epochs", "20",
         "--lr", "0.05", "--val_intervals", "-1"])
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    cli(["embed", *common])
    t_embed = time.perf_counter() - t0

    cfg = Config(task="simsiam2d3d", root_dir=tmp).finalize()
    npz = np.load(os.path.join(cfg.save_dir, "all_output_info.npz"))
    print(f"explore {t_train:.1f} s (20 epochs, bs 256, 512x512x256 + "
          f"41 tilts)  embed {t_embed:.1f} s "
          f"({len(npz['coords'])} candidates)", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trend", action="store_true",
                    help="100-epoch recommended-budget quality-trend run "
                    "(loss/std/separability every 10 epochs)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--mini", action="store_true",
                    help="tiny-scale trend smoke (CPU pipeline check)")
    a = ap.parse_args()
    if a.trend:
        if a.mini:
            trend(epochs=a.epochs, every=max(1, a.epochs // 2),
                  size=(64, 128, 128), n_blob=40, batch_size=16)
        else:
            trend(epochs=a.epochs)
    else:
        main()
