"""Exploration patch-extraction build-time benchmark (VERDICT r2 #3).

Times the vectorized candidate-patch extraction (_slices_batch /
_tilt_sums_batch, one strided fancy-index per tilt) against the scalar
per-candidate loop it replaced, on a reference-scale synthetic set:
512x512x256 reconstruction + 41-tilt series (SURVEY §3.3's "EXPENSIVE
PREPROCESS" stage). Target: >=10x.

Run from the repo root: python benchmarks/extract_bench.py
"""

import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cet_pick_tpu.data.explore_dataset import ExploreDataset  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    d, h, w = 256, 512, 512
    n_tilt, bbox = 41, 32
    rec = rng.standard_normal((d, h, w)).astype(np.float32)
    tilts = rng.standard_normal((n_tilt, h, w)).astype(np.float32)
    angles = np.linspace(-60, 60, n_tilt)
    used = (angles >= -20) & (angles <= 20)
    used_angles, used_tilts = angles[used], tilts[used]
    tomo_size = (w, h, d)

    # candidate coords at DoG-like density: thousands per tomogram
    n_cand = 4000
    coords = np.stack(
        [
            rng.integers(bbox, w - bbox, n_cand),
            rng.integers(bbox, h - bbox, n_cand),
            rng.integers(2, d - 2, n_cand),
        ],
        axis=1,
    ).astype(np.int64)
    # + the 4 aug-offset variants each, as _mine_tomogram extracts
    offs = np.array([(0, 0, 0)] + list(ExploreDataset.AUG_OFFSETS), np.int64)
    flat = (coords[:, None, :] + offs[None, :, :]).reshape(-1, 3)

    ds = ExploreDataset.__new__(ExploreDataset)
    ds.bbox = bbox
    ds.config = SimpleNamespace(compress=False)

    t0 = time.perf_counter()
    p3, v3 = ds._slices_batch(rec, flat)
    p2, v2 = ds._tilt_sums_batch(used_tilts, used_angles, flat, tomo_size)
    t_vec = time.perf_counter() - t0

    n_loop = 400  # scalar loop is too slow to run all 20k variants
    t0 = time.perf_counter()
    for c in flat[:n_loop]:
        ds._extract_slice(rec, tuple(int(v) for v in c))
        ds._extract_tilt_sum(used_tilts, used_angles,
                             tuple(int(v) for v in c), tomo_size)
    t_loop = (time.perf_counter() - t0) * (flat.shape[0] / n_loop)

    # the reference's actual per-candidate path: python loop + torch.tensor
    # conversions per patch (tomo_pre_proj_angle_select_new2d3d.py:102-133)
    import math

    import torch

    def ref_extract(coord):
        x, y, z = int(coord[0]), int(coord[1]), int(coord[2])
        half = bbox // 2
        p3 = rec[z, y - half : y + half, x - half : x + half].copy()
        p3 = (p3 - np.min(p3)) / (np.max(p3) - np.min(p3))
        p3 = torch.tensor(p3).unsqueeze(0).float()
        patches = None
        for ind, an in enumerate(used_angles):
            a = an * np.pi / 180
            tx = int((x - w // 2) * math.cos(a)
                     + ((d - z) - d // 2) * math.sin(a) + w // 2)
            if (tx <= bbox // 1.8 or tx >= w - bbox // 1.8
                    or y <= bbox // 1.8 or y >= h - bbox // 1.8):
                continue
            patch = used_tilts[ind, y - half : y + half,
                               tx - half : tx + half].copy()
            patches = patch if patches is None else patches + patch
        if patches is not None:
            patches = (patches - np.min(patches)) / (
                np.max(patches) - np.min(patches))
            patches = torch.tensor(patches).unsqueeze(0).float()
        return p3, patches

    t0 = time.perf_counter()
    for c in flat[:n_loop]:
        ref_extract(c)
    t_ref = (time.perf_counter() - t0) * (flat.shape[0] / n_loop)

    bytes_moved = (flat.shape[0] * bbox * bbox * 4
                   * (1 + len(used_angles)))  # slices + per-tilt windows
    print(f"variants extracted : {flat.shape[0]} (valid slices {int(v3.sum())},"
          f" valid tilt-sums {int(v2.sum())})")
    print(f"vectorized          : {t_vec:.3f} s"
          f"  ({bytes_moved / t_vec / 1e9:.1f} GB/s window traffic)")
    print(f"scalar numpy (est.) : {t_loop:.3f} s (measured on {n_loop})")
    print(f"reference-style loop: {t_ref:.3f} s (numpy+torch per candidate)")
    print(f"speedup vs scalar   : {t_loop / t_vec:.1f}x")
    print(f"speedup vs reference: {t_ref / t_vec:.1f}x")


if __name__ == "__main__":
    main()
