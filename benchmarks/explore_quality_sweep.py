"""One-off: sweep explore-quality test recipe under the reference-parity
3d aug pipeline (ColorJitter+RRC) to re-calibrate the long-run test."""
import sys, tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from cet_pick_tpu.config import Config
from cet_pick_tpu.data.explore_dataset import ExploreDataset
from cet_pick_tpu.infer.embed import extract_embeddings
from cet_pick_tpu.train.explore import train_explore


def build_fixture():
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
    return rec, centers, labels


def run(epochs, lr, dtype="float32", seed=317):
    rec, centers, labels = build_fixture()
    cfg = Config(task="simsiam3d", arch="simsiam2d_18", bbox=24, batch_size=8,
                 lr=lr, num_epochs=epochs, val_intervals=-1, dog=(2, 4),
                 cosine=True, head_conv=64, mesh_shape=(1,), seed=seed,
                 dtype=dtype).finalize()
    with tempfile.TemporaryDirectory() as td:
        cfg.save_dir = td
        ds = ExploreDataset(cfg, "train", images={"syn": rec})
        state, hist = train_explore(cfg, ds, log_fn=lambda *_: None)
        stds = [e["std"] for e in hist]
        ds_test = ExploreDataset(cfg, "test", images={"syn": rec})
        res = extract_embeddings(cfg, ds_test, state.params, state.batch_stats,
                                 batch_size=32)
    emb = res["proj"].astype(np.float64)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    cand = res["coords"].astype(np.float64)
    ctr = np.array(centers, np.float64)
    dist = np.linalg.norm(cand[:, None] - ctr[None], axis=-1)
    close = dist.min(1) < 8.0
    lab = np.array(labels)[dist.argmin(1)][close]
    e = emb[close]
    sim = e @ e.T
    np.fill_diagonal(sim, -np.inf)
    agree = float((lab[sim.argmax(1)] == lab).mean())
    print(f"dtype={dtype} epochs={epochs} lr={lr} seed={seed}: "
          f"agree={agree:.3f} min_std={min(stds):.3f}", flush=True)


if __name__ == "__main__":
    for epochs, lr in ((10, 0.05), (20, 0.05), (30, 0.05), (20, 0.1)):
        run(epochs, lr)
