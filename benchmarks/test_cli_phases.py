"""Phase breakdown of the `test` CLI wall-clock: where do the seconds go
besides the per-volume detector timings it already prints?

Builds 2 tutorial-size volumes + a checkpoint, then times: detector
construction (checkpoint load + state init), the streaming loop's first-item
latency (first volume's read + preprocess + transfer, which nothing overlaps),
and the loop body. Run on the TPU box: python benchmarks/test_cli_phases.py
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
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    D, H, W = 256, 512, 512
    tmp = tempfile.mkdtemp(prefix="test_phases_")
    config = Config(task="semi", arch="unet_4", K=900, nms=3, order="zxy",
                    dtype="bfloat16", tile=(64, 0, 0), data_dir=tmp,
                    root_dir=tmp).finalize()
    model = create_detector(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0),
                               np.zeros((1, 8, 64, 64), np.float32))
    ckpt = os.path.join(tmp, "ck")
    save_checkpoint(ckpt, state, config)
    config.load_model = ckpt

    rng = np.random.default_rng(0)
    names, paths = [], []
    for i in range(2):
        p = os.path.join(tmp, f"v{i}.rec")
        write_mrc(p, rng.standard_normal((D, H, W)).astype(np.float32))
        names.append(f"v{i}")
        paths.append(p)
    out_dir = os.path.join(tmp, "out")

    for trial in range(2):
        t0 = time.perf_counter()
        det = TomoDetector(config)
        t_det = time.perf_counter()
        with stream_quantized_volumes(config, names, paths) as vols:
            it = iter(vols)
            name, v, lo, hi = next(it)
            t_first = time.perf_counter()
            r = det.run(v, name=name, out_dir=out_dir, lo=lo, hi=hi)
            t_v0 = time.perf_counter()
            for name, v, lo, hi in it:
                det.run(v, name=name, out_dir=out_dir, lo=lo, hi=hi)
        t_rest = time.perf_counter()
        print(f"trial{trial}: detector_init {t_det - t0:.1f}s  "
              f"first_volume_ready {t_first - t_det:.1f}s  "
              f"v0_run {t_v0 - t_first:.1f}s  rest {t_rest - t_v0:.1f}s  "
              f"total {t_rest - t0:.1f}s", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
