"""Logger + Debugger artifacts."""

import os

import numpy as np

from cet_pick_tpu.config import Config
from cet_pick_tpu.utils.debugger import Debugger, debug_validation_volume
from cet_pick_tpu.utils.logger import Logger


def test_logger_writes_files(tmp_path):
    cfg = Config(task="semi", root_dir=str(tmp_path)).finalize()
    lg = Logger(cfg, use_tensorboard=False)
    lg.log_epoch(1, {"loss": 0.5, "hm_loss": 0.4})
    lg.close()
    assert os.path.exists(os.path.join(cfg.save_dir, "opt.txt"))
    assert os.path.exists(os.path.join(cfg.save_dir, "opt.json"))
    text = open(lg.log_path).read()
    assert "epoch: 1" in text and "loss 0.5" in text
    # opt.json reload gives the same task
    assert Config.load(os.path.join(cfg.save_dir, "opt.json")).task == "semi"


def test_debugger_artifacts(tmp_path, rng):
    dbg = Debugger(str(tmp_path))
    vol = rng.standard_normal((8, 32, 32)).astype(np.float32)
    hm = rng.random((8, 16, 16)).astype(np.float32)
    gt = np.zeros((8, 16, 16), np.float32)
    dets = np.array([[5, 6, 0, 0.9, 0.9], [3, 3, 4, 0.8, 0.8]])
    paths = debug_validation_volume(dbg, vol, hm, gt, dets=dets, every=4)
    assert any("pred_z000" in p for p in paths)
    assert any("det_z000" in p for p in paths)
    for p in paths:
        assert os.path.getsize(p) > 0
    txt = dbg.save_detection_txt("volA", dets)
    rows = open(txt).read().strip().splitlines()
    assert rows[0].split("\t")[:3] == ["10", "0", "12"]  # x*2, z, y*2


def test_xla_profiler_trace(tmp_path):
    """--profile_dir writes TensorBoard-readable xplane traces
    (utils/profiling.py, SURVEY §5 tracing)."""
    import glob

    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.utils.profiling import annotate, maybe_trace

    with maybe_trace(str(tmp_path)):
        with annotate("tiny_matmul"):
            x = jnp.ones((64, 64))
            np.asarray(jax.jit(lambda a: a @ a)(x))
    files = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert files, "no xplane trace written"
    # no-op path: nothing written, nothing raised
    with maybe_trace(None):
        pass
    with maybe_trace(""):
        pass


def test_lagged_metrics_drain():
    """train/metrics.LaggedMetrics returns every pushed dict exactly once,
    one step late, with float values matching the device scalars — and a
    mixed int/float dict round-trips (num_pos is an int count)."""
    import jax.numpy as jnp

    from cet_pick_tpu.train.metrics import LaggedMetrics

    drain = LaggedMetrics()
    pushed = []
    got = []
    for i in range(5):
        m = {"loss": jnp.float32(0.5 * i), "num_pos": jnp.int32(i)}
        pushed.append({k: float(v) for k, v in m.items()})
        out = drain.push(m)
        if i == 0:
            assert out is None  # nothing pending on the first push
        else:
            got.append(out)
    got.append(drain.pop())
    assert drain.pop() is None  # drained
    assert got == pushed
    assert all(isinstance(v, float) for m in got for v in m.values())
