"""Inference driver: checkpoint -> tiled forward -> decode -> coordinate files.

Behavioral rebuild of reference cet_pick/detectors/base_detector.py:22-106 +
detectors/tomo_det.py:18-95:

* ``TomoDetector.run``     — forward (tiled, see infer/tiled.py) -> fused
                             sigmoid+NMS+topK decode on device -> per-stage
                             wall-clock dict (base_detector.py:62-106)
* ``post_process``         — x,y scaled by down_ratio, grouped by z slice
                             (tomo_det.py:42-51)
* ``save_detection``       — writes ``{name}_hm.mrc`` (y/z axes swapped, NaN
                             check) and ``{name}.txt`` rows ``x\tz\ty[\tscore]``
                             after score/border filters; fiber/spike modes run
                             the curve/group post-processing first
                             (tomo_det.py:53-95)

The whole hot path (forward + decode) stays on device; only the (K, 5)
detection table and the final heatmap cross back to host.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from cet_pick_tpu.infer.tiled import TiledHeatmapInference
from cet_pick_tpu.io.mrc import write_mrc
from cet_pick_tpu.ops.decode import tomo_decode
from cet_pick_tpu.utils.post_process import (
    fiber_postprocess,
    group_dets_by_z,
    spike_group_postprocess,
)


class TomoDetector:
    """Loads a trained refinement checkpoint and picks particles from volumes."""

    def __init__(self, config, params=None, batch_stats=None, tile_z=None):
        from cet_pick_tpu.infer.tiled import Z_HALO
        from cet_pick_tpu.models.detector import create_detector

        if tile_z is None:
            tile_z = int(config.tile[0])  # --tile D H W
        tile_xy = tuple(config.tile[1:]) if len(config.tile) >= 3 else None
        if config.arch.startswith(("res3d", "p3d")):
            # TomoPickNet3D's GroupNorm takes statistics over the FULL
            # spatial extent, so any tiling changes the normalization and
            # silently deviates from the whole-volume forward — run these
            # arches untiled (the reference's semi3d path is whole-volume
            # too, trains/tomo_trainer.py)
            tile_z = 10 ** 9
            tile_xy = None
        halo = max(int(config.halo), Z_HALO)  # smaller would break exactness

        self.config = config
        # reference-structural res3dref downsamples z 2x (resnet_3d_small.py
        # conv1 s2 + maxpool vs 2 deconvs); its decoded z indices are
        # rescaled like xy so written coordinates stay in input resolution
        self.z_ratio = 2 if config.arch.startswith("res3dref") else 1
        self.model = create_detector(config)
        if params is None:
            if config.load_model.endswith((".pth", ".pt")):
                # trained reference (PyTorch) checkpoint: convert in place
                from cet_pick_tpu.models.convert import load_reference_checkpoint

                params, batch_stats = load_reference_checkpoint(
                    config.load_model, config
                )
            else:
                from cet_pick_tpu.train.state import (
                    create_train_state, load_checkpoint,
                )

                state = create_train_state(
                    self.model, config, jax.random.PRNGKey(0),
                    np.zeros((1, 8, 64, 64), np.float32),
                )
                state = load_checkpoint(config.load_model, state)
                params, batch_stats = state.params, state.batch_stats
        mesh = None
        if config.mesh_shape and len(jax.devices()) > 1:
            # --mesh_shape at inference. One dim: spatially shard every
            # forward's H axis over the chips (replicated params, XLA halo
            # exchanges) — the CLI-reachable form of
            # parallel.mesh.make_spatial_infer, minimizing single-volume
            # latency / per-chip HBM. Two dims ("data", "space"): ALSO shard
            # the z-window batch of the fused forward over the leading axis
            # (the trunk folds z into batch, so this is plain DP over a
            # volume's own tiles) — the throughput layout for deep volumes,
            # e.g. `--mesh_shape 4 2` on a v5e-8. Opt-in only: single-chip
            # stays the default everywhere.
            from cet_pick_tpu.parallel.mesh import make_mesh

            shape = tuple(int(s) for s in config.mesh_shape)
            if len(shape) > 2:  # collapse extras onto the data axis
                import math

                shape = (math.prod(shape[:-1]), shape[-1])
            mesh = make_mesh(shape, ("data", "space")[-len(shape):])
        self.infer = TiledHeatmapInference(
            self.model, params, batch_stats, tile_z=tile_z, halo=halo,
            tile_xy=tile_xy, mesh=mesh, tta=config.tta,
        )

    # -- pipeline stages -----------------------------------------------------

    def process(self, volume: np.ndarray, lo: float = 0.0, hi: float = 1.0,
                fused: bool = True):
        """Tiled forward + fused decode; returns (hm probs, (K,5) dets).

        Pass a uint8 volume with (lo, hi) from preprocess_quantized to cut
        host->device transfer 4x (dequantized on device, bit-identical).
        fused=True batches all z-tiles through one dispatch (fastest);
        fused=False streams tile by tile (lowest peak memory)."""
        cfg = self.config
        if fused:
            hm = self.infer.fused(volume, lo=lo, hi=hi)
        else:
            hm = self.infer(volume, lo=lo, hi=hi)
        dets = tomo_decode(hm, kernel=cfg.nms, k=cfg.K, if_fiber=cfg.fiber)
        return hm, dets

    def warm(self, shape):
        """Compile (and first-run) the full device pipeline for a volume
        geometry using an on-device zeros dummy — no host transfer. run_test
        calls this with header-predicted shapes while the producer thread is
        still reading volume 0 from disk, so the one-time compile+warmup cost
        overlaps the load instead of following it."""
        import jax.numpy as jnp

        v = jnp.zeros(tuple(int(s) for s in shape), jnp.uint8)
        _, dets = self.process(v, lo=0.0, hi=1.0)
        np.asarray(dets)  # drain: the next dispatch starts clean

    def post_process(self, dets: np.ndarray, z_dim_tot: int):
        """Scale xy back to input resolution and group rows by z
        (tomo_det.py:42-51)."""
        dets = np.asarray(dets, dtype=np.float32).copy()
        dets[:, :2] *= self.config.down_ratio
        if self.z_ratio != 1:
            dets[:, 2] *= self.z_ratio
        return group_dets_by_z(dets, z_dim_tot)

    def run(self, volume: np.ndarray, name: str = "tomo",
            out_dir: Optional[str] = None, lo: float = 0.0,
            hi: float = 1.0) -> Dict:
        """Full picking pipeline for one tomogram with per-stage timing.

        Pass a uint8 volume with its ``preprocess_quantized`` (lo, hi) bounds
        to dequantize on device (bit-identical, 4x smaller transfer)."""
        hm_dev, dets, t0, t_net = self._compute(volume, lo=lo, hi=hi)
        return self._finish(hm_dev, dets, name, out_dir, t0, t_net)

    def _compute(self, volume, lo: float = 0.0, hi: float = 1.0):
        """Device half of run(): forward + decode + small-result fence."""
        t0 = time.time()
        hm, dets = self.process(volume, lo=lo, hi=hi)
        # np.asarray of the small (K, 5) table forces completion of the whole
        # device program; block_until_ready is a no-op on remote runtimes
        # (CLAUDE.md) so a materializing fetch is the only honest fence
        dets = np.asarray(dets)
        return hm, dets, t0, time.time()

    def _finish(self, hm_dev, dets: np.ndarray, name: str,
                out_dir: Optional[str], t0: float, t_net: float) -> Dict:
        """Host half of run(): heatmap fetch, grouping, writers. Safe to run
        on a writer thread while the next volume computes (run_test does)."""
        hm_shape = tuple(hm_dev.shape)
        if self.config.write_hm:
            hm = np.asarray(hm_dev)  # the large heatmap device->host fetch
        else:
            # --no-write_hm: picks decode on device, so the heatmap — the
            # pipeline's largest device->host transfer — never crosses
            hm = None
            if np.isnan(dets).any():  # keep the reference's NaN fail-fast
                raise ValueError("Output contains NaN values")
        t_fetch = time.time()
        z_groups = self.post_process(dets, z_dim_tot=hm_shape[0] * self.z_ratio)
        t_post = time.time()
        ret = {
            "name": name,
            "hm": hm,
            "dets": dets,
            "z_groups": z_groups,
            "times": {"net+dec": t_net - t0, "fetch": t_fetch - t_net,
                      "post": t_post - t_fetch},
        }
        if out_dir is not None:
            self.save_detection(hm, z_groups, out_dir, name,
                                hm_shape=hm_shape,
                                z_dim_tot=hm_shape[0] * self.z_ratio)
            ret["times"]["save"] = time.time() - t_post
        ret["times"]["tot"] = time.time() - t0
        return ret

    # -- output writers ------------------------------------------------------

    def save_detection(self, hm: Optional[np.ndarray], z_groups: Dict,
                       path: str, name: str, hm_shape=None, z_dim_tot=None):
        """Write ``{name}_hm.mrc`` + filtered ``{name}.txt`` (tomo_det.py:53-95)."""
        rows = (c for _, rs in z_groups.items() for c in rs)
        return write_detection_outputs(self.config, hm, rows, path, name,
                                       hm_shape=hm_shape, z_dim_tot=z_dim_tot)


def write_detection_outputs(cfg, hm: Optional[np.ndarray], rows, path: str,
                            name: str, hm_shape=None, z_dim_tot=None):
    """Shared reference-format detection writer (tomo_det.py:53-95 ==
    tomo_det_classify.py:172-216): ``{name}_hm.mrc`` with y/z axes swapped +
    ``{name}.txt`` after the frozen score / cutoff_z / 20-px-border filters
    and the fiber/spike post-processing branches.

    rows: iterable of (x, y, z, score) with xy already at input resolution.
    hm may be None under --no-write_hm (pass hm_shape for the filters).
    z_dim_tot: input-resolution z extent for the cutoff_z filter. Required
    when rows' z was rescaled past the heatmap depth (res3dref decodes at
    D/2 and post_process multiplies z by z_ratio=2 — filtering those rows
    against the half-resolution hm depth would silently drop every pick in
    the upper half of the volume). Defaults to the heatmap depth.
    """
    os.makedirs(path, exist_ok=True)

    max_z, max_y, max_x = hm.shape if hm is not None else hm_shape
    max_x, max_y = max_x * cfg.down_ratio, max_y * cfg.down_ratio
    if z_dim_tot is not None:
        max_z = z_dim_tot
    if hm is not None:
        # NaN fail-fast runs whenever the heatmap is available, even under
        # --no-write_hm (the classify path always fetches it for host NMS;
        # the refine path covers --no-write_hm via the dets check in _finish)
        if np.isnan(hm).any():
            raise ValueError("Output contains NaN values")
        if cfg.write_hm:
            # heatmap saved with y/z axes swapped, matching the reference's
            # np.swapaxes(hm, 1, 0) before mrc write (tomo_det.py:60-67)
            write_mrc(os.path.join(path, f"{name}_hm.mrc"),
                      np.float32(np.swapaxes(hm, 1, 0)))

    lines = []
    pre_coords = []
    for c in rows:
        x, y, z = int(np.floor(c[0])), int(np.floor(c[1])), int(np.floor(c[2]))
        score = float(c[3])
        keep = (
            score > cfg.out_thresh
            and cfg.cutoff_z <= z <= max_z - cfg.cutoff_z
            and 20 < x < max_x - 20
            and 20 < y < max_y - 20
        )
        if not keep:
            continue
        if cfg.compress:
            z = z * 2
        if cfg.fiber or cfg.spike:
            pre_coords.append([x, y, z, score])
        elif cfg.with_score:
            lines.append(f"{x}\t{z}\t{y}\t{score}")
        else:
            lines.append(f"{x}\t{z}\t{y}")

    if cfg.fiber and pre_coords:
        post = fiber_postprocess(
            [c[:3] for c in pre_coords],
            distance_cutoff=cfg.distance_cutoff,
            res_cutoff=cfg.r2_cutoff,
            curvature_cutoff=cfg.curvature_cutoff,
            scale=cfg.distance_scale,
        )
        lines += [f"{c[0]}\t{c[1]}\t{c[2]}" for c in post]
    elif cfg.spike and pre_coords:
        post = spike_group_postprocess(
            pre_coords, distance_cutoff=cfg.distance_cutoff, min_per_group=5
        )
        for c in post:
            if cfg.with_score:
                lines.append(f"{int(c[0])}\t{int(c[2])}\t{int(c[1])}\t{c[3]}")
            else:
                lines.append(f"{int(c[0])}\t{int(c[2])}\t{int(c[1])}")

    with open(os.path.join(path, f"{name}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines


def stream_quantized_volumes(config, names, paths, depth: int = 2,
                             isolate_errors: bool = False):
    """Disk -> quantize -> async device transfer pipeline over a volume list.

    The reference streams test tomograms through a PrefetchDataset wrapped in
    a 1-worker DataLoader (test.py:19-60, :77); the TPU-native schedule here
    is what bench.py measures as the pipelined headline: a producer thread
    reads + preprocesses tomogram i+1 while tomogram i computes on device,
    shipping the uint8 representation (preprocess_quantized — 4x fewer bytes
    over the host->device link, bit-identical picks) with the device_put
    dispatched asynchronously so the transfer also hides behind compute.

    Yields ``(name, device_volume_u8, lo, hi)``; use as a context manager so
    an early exit releases the producer thread. A load failure kills the
    whole stream — what `test` wants for a fixed list. ``isolate_errors=True``
    (the `watch` service: it must outlive one corrupt volume) instead yields
    ``(name, device_volume_u8 | None, lo, hi, exc | None)`` per input, in
    input order, so the ONE streaming schedule serves both consumers.
    """
    import jax

    from cet_pick_tpu.data.prefetch import PrefetchIterator
    from cet_pick_tpu.io.loader import load_rec, preprocess_quantized

    def produce():
        for name, path in zip(names, paths):
            try:
                vol = load_rec(path, order=config.order,
                               compress=config.compress)
                u8, lo, hi = preprocess_quantized(vol, denoise=config.gauss)
            except Exception as e:  # noqa: BLE001 — recorded per file
                if not isolate_errors:
                    raise
                yield name, None, 0.0, 0.0, e
                continue
            yield (name, u8, lo, hi, None) if isolate_errors else (
                name, u8, lo, hi)

    def put(item):
        if isolate_errors:
            name, u8, lo, hi, err = item
            if err is not None:
                return item
            return name, jax.device_put(u8), lo, hi, None
        name, u8, lo, hi = item
        return name, jax.device_put(u8), lo, hi

    return PrefetchIterator(produce(), depth=depth, device_put=put)


def warm_from_header(det, rec_paths, config):
    """Pre-compile ``det``'s device pipeline for volume 0's geometry (a 1 KB
    MRC header read) while the producer thread is still loading its data —
    the one-time compile+warmup no longer serializes behind the first disk
    read (benchmarks/test_cli_phases.py measured both near ~11-25 s).

    Purely an optimization: ANY failure (unreadable header, absurd dims from
    a corrupt-but-parseable file, device OOM on a bogus geometry) is
    swallowed so the stream's loader keeps reporting its actionable per-file
    error instead of an opaque crash inside the warmup."""
    paths = list(rec_paths)
    if not paths:
        return
    from cet_pick_tpu.io.loader import predict_loaded_shape

    try:
        shape = predict_loaded_shape(
            paths[0], order=config.order, compress=config.compress)
        det.warm(shape)
    except Exception:
        pass


def run_test(config, out_dir=None):
    """test.py equivalent: run the detector over the test image list
    (reference cet_pick/test.py:65-93), pipelined at both ends: the producer
    thread overlaps tomogram i+1's load + async uint8 device_put with
    tomogram i's forward, and a writer thread overlaps tomogram i-1's large
    heatmap fetch + post-process + file writes with it too. Outputs are
    byte-identical to the sequential schedule (same data, same writers)."""
    import queue
    import threading

    from cet_pick_tpu.io.coords import read_image_list
    from cet_pick_tpu.utils.profiling import maybe_trace

    il = read_image_list(os.path.join(config.data_dir, config.test_img_txt))
    det = TomoDetector(config)
    out_dir = out_dir or config.out_path
    results = {}
    errs = []
    q = queue.Queue(maxsize=2)  # bounds heatmaps held on device

    def writer():
        while True:
            item = q.get()
            if item is None:
                return
            try:
                name, hm_dev, dets, t0, t_net = item
                r = det._finish(hm_dev, dets, name, out_dir, t0, t_net)
                print(f"{name}: " + " ".join(
                    f"{k} {v:.3f}s" for k, v in r["times"].items()
                ))
                results[name] = r["times"]
            except BaseException as e:  # surfaced after join
                errs.append(e)

    w = threading.Thread(target=writer, daemon=True)
    w.start()
    try:
        with maybe_trace(config.profile_dir):
            with stream_quantized_volumes(
                config, il.image_name, il.rec_path
            ) as vols:
                # pre-compile for volume 0's geometry while the producer
                # thread is loading its 256 MB of data; later volumes'
                # compiles already overlap the prefetched loads
                warm_from_header(det, il.rec_path, config)
                for name, v_dev, lo, hi in vols:
                    hm_dev, dets, t0, t_net = det._compute(v_dev, lo=lo, hi=hi)
                    q.put((name, hm_dev, dets, t0, t_net))
                    if errs:
                        break
    finally:
        q.put(None)
        w.join()
    if errs:
        raise errs[0]
    return results
