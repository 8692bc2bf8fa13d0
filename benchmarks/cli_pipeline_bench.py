"""A/B: the old float-sequential test loop vs the streamed uint8 CLI path.

Synthesizes three tutorial-size tomograms (256x512x512) as .rec files, then
drives the REAL ``run_test`` surface (disk -> picks) both ways:

* old: load_tomos_from_list (float32) then det.run per volume, sequential —
  what run_test did before the streaming change;
* new: stream_quantized_volumes (uint8 + async device_put producer thread)
  -> det.run(lo, hi) — what run_test does now.

Reports wall-clock per volume for each schedule. Run on the TPU box from the
repo root: ``python benchmarks/cli_pipeline_bench.py``.
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.infer.detector import (
        TomoDetector, stream_quantized_volumes,
    )
    from cet_pick_tpu.io.loader import load_tomos_from_list
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.train.state import create_train_state
    from cet_pick_tpu.models.detector import create_detector

    D, H, W = 256, 512, 512
    n_vols = 3
    config = Config(task="semi", arch="unet_4", K=900, nms=3, order="zxy",
                    dtype="bfloat16").finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        np.zeros((1, 8, 64, 64), np.float32),
    )
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=64)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="cli_pipe_bench_")
    names, paths = [], []
    for i in range(n_vols):
        vol = rng.standard_normal((D, H, W)).astype(np.float32)
        p = os.path.join(tmp, f"v{i}.rec")
        write_mrc(p, vol)
        names.append(f"v{i}")
        paths.append(p)

    def drain(r):
        np.asarray(r["dets"])

    # warm both compiled paths (float32 and uint8 tile programs)
    warm = load_tomos_from_list(names[:1], paths[:1], order="zxy")
    drain(det.run(warm["v0"], name="warm"))
    del warm
    with stream_quantized_volumes(config, names[:1], paths[:1]) as vols:
        for name, v, lo, hi in vols:
            drain(det.run(v, name="warm", lo=lo, hi=hi))

    def run_old():
        # old schedule: float load of everything, then sequential runs
        t0 = time.perf_counter()
        images = load_tomos_from_list(names, paths, order="zxy")
        for name, vol in images.items():
            drain(det.run(np.asarray(vol, np.float32), name=name))
        return (time.perf_counter() - t0) / n_vols

    def run_new():
        # new schedule: streamed uint8 with prefetch
        t0 = time.perf_counter()
        with stream_quantized_volumes(config, names, paths) as vols:
            for name, v, lo, hi in vols:
                drain(det.run(v, name=name, lo=lo, hi=hi))
        return (time.perf_counter() - t0) / n_vols

    # the box + tunnel are noisy: interleave trials so a degraded window
    # can't flip the verdict, and report per-trial numbers + medians with a
    # tunnel-health probe between trials
    from bench import probe_tunnel

    olds, news = [], []
    for trial in range(3):
        olds.append(run_old())
        news.append(run_new())
        mm, link = probe_tunnel()
        print(f"trial{trial}: old {olds[-1]:.2f} s/vol   "
              f"new {news[-1]:.2f} s/vol   "
              f"(tunnel: matmul {mm:.1f} ms, link {link:.1f} MB/s)",
              flush=True)
    t_old, t_new = float(np.median(olds)), float(np.median(news))
    print(f"old  float sequential : {t_old:.3f} s/volume (median of {olds})")
    print(f"new  uint8 streamed   : {t_new:.3f} s/volume (median of {news})")
    print(f"speedup (disk->picks) : {t_old / t_new:.2f}x")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
