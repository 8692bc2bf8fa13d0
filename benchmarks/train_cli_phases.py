"""Phase breakdown of the flagship `train` wall-clock: dataset build
(disk read + preprocess + full-volume heatmap splat), state init, first-step
compile, steady-state stepping, and checkpoint saves.

Run on the TPU box from the repo root: python benchmarks/train_cli_phases.py
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flagship_e2e import make_volume  # same tutorial-scale fixture


def main():
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.refine import make_train_step
    from cet_pick_tpu.train.state import create_train_state

    tmp = tempfile.mkdtemp(prefix="train_phases_")
    data = os.path.join(tmp, "data")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    dfs, listing = [], "image_name\trec_path\n"
    import pandas as pd

    for i in range(2):
        name = f"syn{i}"
        vol, df = make_volume(rng, name)
        write_mrc(os.path.join(data, f"{name}.rec"), vol)
        del vol
        dfs.append(df)
        listing += f"{name}\t{os.path.join(data, f'{name}.rec')}\n"
    open(os.path.join(data, "train_images.txt"), "w").write(listing)
    pd.concat(dfs, ignore_index=True).to_csv(
        os.path.join(data, "train_coords.txt"), sep="\t", index=False)

    cfg = Config(task="semi", arch="unet_4", order="zxy", contrastive=True,
                 batch_size=4, dtype="bfloat16", bbox=24, data_dir=data,
                 root_dir=tmp).finalize()

    t0 = time.perf_counter()
    ds = RefineDataset(cfg, split="train")
    t_ds = time.perf_counter()
    model = create_detector(cfg)
    srng = np.random.default_rng(cfg.seed)
    sample = ds.sample_batch(srng, [0])
    b, p, d, h, w = sample["input"].shape
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               sample["input"].reshape(b * p, d, h, w))
    t_init = time.perf_counter()
    step = make_train_step(model, cfg)
    batch = jax.device_put(ds.sample_batch(srng, list(range(cfg.batch_size))))
    np.asarray(batch["flip_prob"])
    state2, metrics = step(state, batch)
    np.asarray(metrics["loss"])
    t_compile = time.perf_counter()
    n = 20
    for _ in range(n):
        state2, metrics = step(state2, batch)
    np.asarray(metrics["loss"])
    t_steps = time.perf_counter()
    print(f"dataset_build {t_ds - t0:.1f}s  state_init {t_init - t_ds:.1f}s  "
          f"first_step(compile) {t_compile - t_init:.1f}s  "
          f"steady {(t_steps - t_compile) / n * 1e3:.1f} ms/step", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
