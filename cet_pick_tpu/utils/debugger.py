"""Visual debug artifacts: per-slice heatmap overlays + detection circles.

Rebuild of reference cet_pick/utils/debugger.py:36-99 + the trainer debug hook
(trains/tomo_cr_semi_trainer.py:123-187): during validation with debug > 0,
write per-z-slice PNGs of (a) the predicted heatmap color-mapped and blended
onto the input slice, (b) the ground-truth heatmap blend, and (c) detection
circles, plus the detection txt. These are the reference's primary QC channel
(docs/refine.md:105-136).
"""

from __future__ import annotations

import os

import numpy as np


def _norm01(x):
    lo, hi = float(np.min(x)), float(np.max(x))
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def gen_colormap(hm_slice):
    """Heatmap slice -> RGB uint8 via a jet-style colormap (debugger.py:36-48)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    return (cm.jet(np.clip(hm_slice, 0, 1))[..., :3] * 255).astype(np.uint8)


def blend(img_slice, hm_slice, alpha=0.5):
    """Blend a grayscale slice with a color-mapped heatmap (debugger.py:49-59)."""
    g = (_norm01(img_slice) * 255).astype(np.uint8)
    base = np.dstack([g, g, g])
    overlay = gen_colormap(hm_slice)
    return (alpha * base + (1 - alpha) * overlay).astype(np.uint8)


class Debugger:
    """Accumulates debug images for one validation volume and saves PNGs."""

    def __init__(self, out_dir):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.imgs = {}

    def add_blend(self, name, img_slice, hm_slice):
        self.imgs[name] = blend(img_slice, hm_slice)

    def add_detections(self, name, img_slice, dets, radius=8, color=(255, 0, 0)):
        """Circle detections (rows x, y[, ...]) on a slice (debugger.py:100+)."""
        import cv2

        g = (_norm01(img_slice) * 255).astype(np.uint8)
        canvas = np.dstack([g, g, g])
        for d in dets:
            cv2.circle(canvas, (int(d[0]), int(d[1])), radius, color, 1)
        self.imgs[name] = canvas

    def save_all(self, prefix=""):
        """Write accumulated images (debugger.py:89-99)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        paths = []
        for name, img in self.imgs.items():
            p = os.path.join(self.out_dir, f"{prefix}{name}.png")
            plt.imsave(p, img)
            paths.append(p)
        return paths

    def save_detection_txt(self, name, dets, down_ratio=2, with_score=True):
        """Detection table txt (debugger.py:73-88)."""
        p = os.path.join(self.out_dir, f"{name}.txt")
        with open(p, "w") as f:
            for d in dets:
                x, y, z = int(d[0]) * down_ratio, int(d[1]) * down_ratio, int(d[2])
                row = [str(x), str(z), str(y)] + (
                    [f"{float(d[3]):.4f}"] if with_score and len(d) > 3 else []
                )
                f.write("\t".join(row) + "\n")
        return p


def debug_validation_volume(debugger, volume, pred_hm, gt_hm, dets=None,
                            every=4):
    """Per-slice debug dump for a validation volume
    (tomo_cr_semi_trainer.py:123-187). volume (D, H, W) at input res,
    pred/gt (D, H', W') at heatmap res."""
    d = pred_hm.shape[0]
    for z in range(0, d, every):
        img = volume[z, ::2, ::2] if volume.shape[1] != pred_hm.shape[1] else volume[z]
        debugger.add_blend(f"pred_z{z:03d}", img, pred_hm[z])
        debugger.add_blend(f"gt_z{z:03d}", img, np.clip(gt_hm[z], 0, 1))
        if dets is not None:
            zdets = [row for row in dets if int(row[2]) == z]
            if zdets:
                debugger.add_detections(f"det_z{z:03d}", img, zdets)
    return debugger.save_all()
