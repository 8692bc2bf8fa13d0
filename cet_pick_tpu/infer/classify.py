"""Semiclass inference: tiled forward -> border zeroing -> greedy ball NMS.

Rebuild of reference cet_pick/detectors/tomo_det_classify.py:77-217 +
test_class.py:47-78:

* the probability volume comes from the same tiled z-window forward as the
  semi detector (infer/tiled.py replaces the reference's host-side
  PatchDataset loop, tomo_det_classify.py:18-75/116-151 — bit-exact vs the
  whole-volume forward and one device dispatch instead of a patch loop);
* a 30-HEATMAP-voxel xy border is zeroed before decoding — the reference
  indexes ``out_hm``, its down_ratio-grid model output, so the band is 30
  heatmap voxels (= 60 input pixels at down_ratio 2), NOT 30 input pixels
  (tomo_det_classify.py:106-109; see ``TomoClassDetector.BORDER``);
* decoding is greedy spherical NMS with exclusion diameter ``--nms`` and
  score floor ``--out_thresh`` (models/decode.py:108-120 via
  ops/greedy_nms.py) — not max-pool top-K;
* outputs match the reference writers: ``{name}.txt`` rows ``x\tz\ty`` after
  the score/z-cutoff/border filters and ``{name}_hm.mrc`` with y/z swapped
  (tomo_det_classify.py:172-216).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from cet_pick_tpu.infer.detector import TomoDetector
from cet_pick_tpu.ops.decode import tomo_decode_classify


class TomoClassDetector(TomoDetector):
    """Semiclass picker: greedy-NMS decode over the tiled heatmap."""

    BORDER = 30  # HEATMAP-voxel xy border zeroed before decode (:106-109 —
    # the reference indexes out_hm, the down_ratio-grid model output, so the
    # band is 30 heatmap voxels = 60 input pixels at down_ratio 2)

    def process(self, volume: np.ndarray, lo: float = 0.0, hi: float = 1.0,
                fused: bool = True):
        """Tiled forward + greedy spherical NMS; returns (hm, (N, 4) dets).

        Detection rows are (x, y, z, score) at heatmap (down_ratio) grid
        coordinates, like tomo_decode_classify (models/decode.py:108-120).
        """
        cfg = self.config
        if fused:
            hm = self.infer.fused(volume, lo=lo, hi=hi)
        else:
            hm = self.infer(volume, lo=lo, hi=hi)
        hm = np.array(hm)  # writable host copy (np.asarray of a jax array is read-only)
        b = self.BORDER
        hm[:, :b, :] = 0
        hm[:, -b:, :] = 0
        hm[:, :, :b] = 0
        hm[:, :, -b:] = 0
        # z boundary planes are off-distribution (the 3D head's zero padding)
        # and the reference drops them at save time anyway (cutoff_z filter,
        # tomo_det_classify.py:193); zero them on a DECODE-ONLY copy so the
        # saved _hm.mrc keeps the reference's content (xy borders zeroed, z
        # untouched), and mirror the save filter's INCLUSIVE upper bound
        # (z <= max_z - cutoff_z survives)
        if cfg.cutoff_z > 0:
            hm_dec = hm.copy()
            hm_dec[: cfg.cutoff_z] = 0
            hm_dec[hm.shape[0] - cfg.cutoff_z + 1 :] = 0
        else:
            hm_dec = hm
        dets = tomo_decode_classify(hm_dec, cfg.nms, cfg.out_thresh)
        return hm, dets

    def warm(self, shape):
        """Compile the device half only. Unlike the refine detector, this
        pipeline's decode (greedy ball NMS) is host numpy — running the full
        ``process`` on a zeros dummy would fetch the entire heatmap and then
        greedy-NMS ~every voxel of it on the host (the clamped sigmoid of a
        constant volume clears any out_thresh <= 1e-4), minutes of warmup
        for nothing. Fence with a one-element fetch, not the heatmap."""
        import jax.numpy as jnp

        v = jnp.zeros(tuple(int(s) for s in shape), jnp.uint8)
        hm = self.infer.fused(v, lo=0.0, hi=1.0)
        np.asarray(hm[0, 0, 0])  # drain: the next dispatch starts clean

    def post_process(self, dets: np.ndarray, z_dim_tot: int = None):
        """xy back to input resolution (tomo_det_classify.py:158-170)."""
        dets = np.asarray(dets, dtype=np.float32).copy()
        if len(dets):
            dets[:, :2] *= self.config.down_ratio
        return dets

    def run(self, volume: np.ndarray, name: str = "tomo",
            out_dir: Optional[str] = None, lo: float = 0.0,
            hi: float = 1.0) -> Dict:
        """Full semiclass picking pipeline for one tomogram.

        Accepts the uint8 + (lo, hi) quantized representation like
        TomoDetector.run (dequantized on device, bit-identical)."""
        t0 = time.time()
        hm, dets = self.process(volume, lo=lo, hi=hi)
        t_net = time.time()
        dets = self.post_process(dets)
        t_post = time.time()
        ret = {
            "name": name,
            "hm": hm,
            "dets": dets,
            "times": {"net+dec": t_net - t0, "post": t_post - t_net},
        }
        if out_dir is not None:
            self.save_detection(hm, dets, out_dir, name)
            ret["times"]["save"] = time.time() - t_post
        ret["times"]["tot"] = time.time() - t0
        return ret

    def save_detection(self, hm: np.ndarray, dets: np.ndarray, path: str,
                       name: str):
        """Write ``{name}_hm.mrc`` + filtered ``{name}.txt``
        (tomo_det_classify.py:172-216 — identical frozen filters/formats to
        the refine detector's writer, shared via write_detection_outputs)."""
        from cet_pick_tpu.infer.detector import write_detection_outputs

        rows = np.asarray(dets, dtype=np.float32).reshape(-1, 4)
        return write_detection_outputs(self.config, hm, rows, path, name)


def run_classify_test(config, out_dir=None):
    """test_class.py equivalent: semiclass picking over the test image list
    (reference cet_pick/test_class.py:47-78), on the same pipelined uint8
    transfer schedule as run_test."""
    from cet_pick_tpu.infer.detector import (
        stream_quantized_volumes, warm_from_header,
    )
    from cet_pick_tpu.io.coords import read_image_list

    il = read_image_list(os.path.join(config.data_dir, config.test_img_txt))
    det = TomoClassDetector(config)
    out_dir = out_dir or config.out_path
    results = {}
    with stream_quantized_volumes(config, il.image_name, il.rec_path) as vols:
        # pre-compile for volume 0's geometry while its data loads
        warm_from_header(det, il.rec_path, config)
        for name, v_dev, lo, hi in vols:
            r = det.run(v_dev, name=name, out_dir=out_dir, lo=lo, hi=hi)
            print(f"{name}: " + " ".join(
                f"{k} {v:.3f}s" for k, v in r["times"].items()))
            results[name] = r["times"]
    return results
