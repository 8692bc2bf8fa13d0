"""Real-device smoke drive of run_test: 3 small volumes from disk through
the full pipelined CLI path (producer thread, uint8 transfers, write-behind
writer thread) -> detection txt files. Run from the repo root on any
backend; asserts outputs exist and prints per-volume timings."""
import os, sys, tempfile
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
from cet_pick_tpu.config import Config
from cet_pick_tpu.io.mrc import write_mrc
from cet_pick_tpu.models.detector import create_detector
from cet_pick_tpu.train.state import create_train_state, save_checkpoint

tmp = tempfile.mkdtemp(prefix="runtest_drive_")
rng = np.random.default_rng(0)
for i in range(3):
    write_mrc(os.path.join(tmp, f"v{i}.rec"),
              rng.standard_normal((64, 128, 128)).astype(np.float32))
listing = "image_name\trec_path\n" + "".join(
    f"v{i}\t{os.path.join(tmp, f'v{i}.rec')}\n" for i in range(3))
open(os.path.join(tmp, "test_images.txt"), "w").write(listing)

cfg = Config(task="semi", arch="unet_2", K=50, nms=3, order="zxy",
             out_thresh=0.0, cutoff_z=1, data_dir=tmp, root_dir=tmp).finalize()
model = create_detector(cfg)
state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                           np.zeros((1, 8, 64, 64), np.float32))
ck = os.path.join(tmp, "ck")
save_checkpoint(ck, state, cfg)
cfg = cfg.replace(load_model=ck) if hasattr(cfg, "replace") else cfg
if not getattr(cfg, "load_model", ""):
    cfg.load_model = ck

from cet_pick_tpu.infer.detector import run_test
res = run_test(cfg, out_dir=os.path.join(tmp, "out"))
assert set(res) == {"v0", "v1", "v2"}, res
for i in range(3):
    p = os.path.join(tmp, "out", f"v{i}.txt")
    assert os.path.exists(p), p
print("TPU run_test drive OK:", {k: round(v["tot"], 2) for k, v in res.items()})
import shutil; shutil.rmtree(tmp, ignore_errors=True)
