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


def make_fixture(rng, d=256, h=512, w=512, n_tilt=41, n_blob=300):
    """Synthetic reconstruction with dark blobs + a matching tilt stack.

    The tilt images don't need to be geometrically consistent projections
    for a TIMING benchmark — each is the z-mean plus fresh noise, which
    keeps DoG mining + patch extraction realistic."""
    rec = (rng.standard_normal((d, h, w)) * 0.5).astype(np.float32)
    r = 10
    zz, yy, xx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                             np.arange(-r, r + 1), indexing="ij")
    blob = (2.0 * np.exp(-((zz ** 2) / 6.0 + (yy ** 2) / 12.0
                           + (xx ** 2) / 12.0))).astype(np.float32)
    for _ in range(n_blob):
        z = int(rng.integers(r, d - r))
        y = int(rng.integers(40, h - 40))
        x = int(rng.integers(40, w - 40))
        rec[z - r : z + r + 1, y - r : y + r + 1, x - r : x + r + 1] -= blob
    rec = (rec - rec.mean()) / rec.std()
    base = rec.mean(axis=0)
    tilts = np.stack([
        base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)
        for _ in range(n_tilt)
    ]).astype(np.float32)
    angles = np.linspace(-60.0, 60.0, n_tilt).astype(np.float32)
    return rec, tilts, angles


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
    main()
