"""A/B of run_test's header-predicted pre-compile (TomoDetector.warm):
shipped (compile overlaps volume 0's disk read) vs disabled (compile
serializes behind it, the old behavior). Interleaved trials; each run_test
builds a fresh detector, so each pays its own jit-instance compile (the
persistent XLA disk cache serves both equally).

Run on the TPU box from the repo root: python benchmarks/warm_ab.py
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
    from cet_pick_tpu.infer import detector as det_mod
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    D, H, W = 256, 512, 512
    tmp = tempfile.mkdtemp(prefix="warm_ab_")
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
    with open(os.path.join(tmp, "test_images.txt"), "w") as f:
        f.write("image_name\trec_path\n" + "".join(
            f"{n}\t{p}\n" for n, p in zip(names, paths)))
    out_dir = os.path.join(tmp, "out")

    real_warm = det_mod.TomoDetector.warm
    rows = {"warm": [], "no_warm": []}
    for trial in range(3):
        for label, warm_fn in (("warm", real_warm),
                               ("no_warm", lambda self, shape: None)):
            det_mod.TomoDetector.warm = warm_fn
            t0 = time.perf_counter()
            det_mod.run_test(config, out_dir=out_dir)
            rows[label].append(time.perf_counter() - t0)
        print(f"trial{trial}: " + "  ".join(
            f"{k} {v[-1]:.1f}s" for k, v in rows.items()), flush=True)
    det_mod.TomoDetector.warm = real_warm
    for k, v in rows.items():
        print(f"{k:8s} median {float(np.median(v)):.1f}s "
              f"(trials {[round(t, 1) for t in v]})")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
