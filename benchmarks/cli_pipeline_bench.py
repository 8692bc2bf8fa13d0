"""A/B: the old float-sequential test loop vs the pipelined run_test CLI.

Synthesizes three tutorial-size tomograms (256x512x512) as .rec files plus a
checkpoint, then drives disk -> detection txt + _hm.mrc three ways:

* old: load_tomos_from_list (float32) then det.run per volume, sequential —
  what run_test did before the streaming change;
* stream: stream_quantized_volumes (uint8 + async device_put producer
  thread) -> det.run(lo, hi) — inputs pipelined, writes synchronous;
* cli: the REAL ``run_test`` — inputs pipelined AND the heatmap fetch +
  writers on a write-behind thread.

All three write the full outputs. The box + tunnel are noisy: trials are
interleaved and medians reported, with a tunnel-health probe per trial.
Run on the TPU box from the repo root:
``python benchmarks/cli_pipeline_bench.py``.
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
        TomoDetector, run_test, stream_quantized_volumes,
    )
    from cet_pick_tpu.io.loader import load_tomos_from_list
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    D, H, W = 256, 512, 512
    n_vols = 3
    tmp = tempfile.mkdtemp(prefix="cli_pipe_bench_")
    config = Config(task="semi", arch="unet_4", K=900, nms=3, order="zxy",
                    dtype="bfloat16", data_dir=tmp, root_dir=tmp).finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        np.zeros((1, 8, 64, 64), np.float32),
    )
    ckpt = os.path.join(tmp, "ck")
    save_checkpoint(ckpt, state, config)
    config.load_model = ckpt
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=64)

    rng = np.random.default_rng(0)
    names, paths = [], []
    for i in range(n_vols):
        vol = rng.standard_normal((D, H, W)).astype(np.float32)
        p = os.path.join(tmp, f"v{i}.rec")
        write_mrc(p, vol)
        names.append(f"v{i}")
        paths.append(p)
    with open(os.path.join(tmp, "test_images.txt"), "w") as f:
        f.write("image_name\trec_path\n" + "".join(
            f"{n}\t{p}\n" for n, p in zip(names, paths)))
    out_dir = os.path.join(tmp, "out")

    # warm both compiled tile programs (float32 and uint8)
    warm = load_tomos_from_list(names[:1], paths[:1], order="zxy")
    np.asarray(det.run(warm["v0"], name="warm")["dets"])
    del warm
    with stream_quantized_volumes(config, names[:1], paths[:1]) as vols:
        for name, v, lo, hi in vols:
            np.asarray(det.run(v, name="warm", lo=lo, hi=hi)["dets"])

    def run_old():
        # old schedule: float load of everything, then sequential run+write
        t0 = time.perf_counter()
        images = load_tomos_from_list(names, paths, order="zxy")
        for name, vol in images.items():
            det.run(np.asarray(vol, np.float32), name=name, out_dir=out_dir)
        return (time.perf_counter() - t0) / n_vols

    def run_stream():
        # inputs pipelined (uint8 producer thread), writes synchronous
        t0 = time.perf_counter()
        with stream_quantized_volumes(config, names, paths) as vols:
            for name, v, lo, hi in vols:
                det.run(v, name=name, out_dir=out_dir, lo=lo, hi=hi)
        return (time.perf_counter() - t0) / n_vols

    def run_cli():
        # the shipped run_test: pipelined at both ends
        t0 = time.perf_counter()
        run_test(config, out_dir=out_dir)
        return (time.perf_counter() - t0) / n_vols

    import dataclasses

    config_nohm = dataclasses.replace(config, write_hm=False)
    config_nohm.heads = config.heads

    def run_cli_nohm():
        # picks-only serving: --no-write_hm skips the 67 MB heatmap fetch
        # and the _hm.mrc write per volume
        t0 = time.perf_counter()
        run_test(config_nohm, out_dir=os.path.join(tmp, "out_nohm"))
        return (time.perf_counter() - t0) / n_vols

    run_cli()  # warm run_test's own detector instance (compile-cache hit)

    from bench import probe_tunnel

    rows = {"old": [], "stream": [], "cli": [], "cli_nohm": []}
    for trial in range(3):
        rows["old"].append(run_old())
        rows["stream"].append(run_stream())
        rows["cli"].append(run_cli())
        rows["cli_nohm"].append(run_cli_nohm())
        mm, link = probe_tunnel()
        print(f"trial{trial}: " + "   ".join(
            f"{k} {v[-1]:.2f} s/vol" for k, v in rows.items()
        ) + f"   (tunnel: matmul {mm:.1f} ms, link {link:.1f} MB/s)",
            flush=True)
    med = {k: float(np.median(v)) for k, v in rows.items()}
    for k, v in med.items():
        print(f"{k:7s}: {v:.3f} s/volume (trials {[round(t, 2) for t in rows[k]]})")
    print(f"speedup old->cli (disk->picks+writes): "
          f"{med['old'] / med['cli']:.2f}x")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
