"""Watch service (infer/watch.py): directory polling, stability claiming,
restart manifest, per-file error isolation, `test`-identical outputs."""

import os

import numpy as np
import pytest

from cet_pick_tpu.config import Config
from cet_pick_tpu.infer.watch import MANIFEST, _load_manifest, run_watch
from cet_pick_tpu.io.mrc import write_mrc


@pytest.fixture()
def watch_setup(tmp_path):
    """Random-init unet_2 checkpoint + a watch dir with one volume."""
    import jax

    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    cfg = Config(task="semi", arch="unet_2", order="zxy", K=40,
                 out_thresh=0.0, cutoff_z=1, root_dir=str(tmp_path)).finalize()
    model = create_detector(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), np.zeros((1, 8, 64, 64), np.float32)
    )
    ck = tmp_path / "model_last"
    save_checkpoint(str(ck), state, config=cfg)
    cfg.load_model = str(ck)

    watch_dir = tmp_path / "incoming"
    watch_dir.mkdir()
    rng = np.random.default_rng(0)
    write_mrc(str(watch_dir / "a.rec"),
              rng.standard_normal((12, 64, 64)).astype(np.float32))
    out_dir = tmp_path / "picks"
    return cfg, str(watch_dir), str(out_dir), rng


def test_watch_once_drains_backlog_and_resumes(watch_setup):
    cfg, watch_dir, out_dir, rng = watch_setup
    write_mrc(os.path.join(watch_dir, "b.rec"),
              rng.standard_normal((12, 64, 64)).astype(np.float32))

    served = run_watch(cfg, watch_dir, out_dir, once=True,
                       log_fn=lambda *_: None)
    assert set(served.values()) == {"ok"} and len(served) == 2
    for n in ("a", "b"):
        assert os.path.exists(os.path.join(out_dir, f"{n}.txt"))
        assert os.path.exists(os.path.join(out_dir, f"{n}_hm.mrc"))
    assert len(_load_manifest(out_dir)) == 2

    # restart: manifest prevents reprocessing
    served = run_watch(cfg, watch_dir, out_dir, once=True,
                       log_fn=lambda *_: None)
    assert served == {}

    # a new file appears -> only it is processed
    write_mrc(os.path.join(watch_dir, "c.rec"),
              rng.standard_normal((12, 64, 64)).astype(np.float32))
    served = run_watch(cfg, watch_dir, out_dir, once=True,
                       log_fn=lambda *_: None)
    assert list(served) == [os.path.join(watch_dir, "c.rec")]


def test_watch_outputs_match_test_command(watch_setup, tmp_path):
    """The service writes byte-identical outputs to `test` on the same file."""
    from cet_pick_tpu.infer.detector import run_test

    cfg, watch_dir, out_dir, rng = watch_setup
    run_watch(cfg, watch_dir, out_dir, once=True, log_fn=lambda *_: None)

    data = tmp_path / "data"
    data.mkdir()
    (data / "test_images.txt").write_text(
        f"image_name\trec_path\na\t{os.path.join(watch_dir, 'a.rec')}\n")
    cfg.data_dir = str(data)
    cfg.test_img_txt = "test_images.txt"
    ref_out = str(tmp_path / "ref_picks")
    run_test(cfg, out_dir=ref_out)

    with open(os.path.join(out_dir, "a.txt")) as f1, \
            open(os.path.join(ref_out, "a.txt")) as f2:
        assert f1.read() == f2.read()
    with open(os.path.join(out_dir, "a_hm.mrc"), "rb") as f1, \
            open(os.path.join(ref_out, "a_hm.mrc"), "rb") as f2:
        assert f1.read() == f2.read()


def test_watch_stability_claiming(watch_setup):
    """Continuous mode claims a file only after its stat is stable across two
    polls: cycle 1 registers, cycle 2 processes."""
    cfg, watch_dir, out_dir, rng = watch_setup
    served = run_watch(cfg, watch_dir, out_dir, once=False, poll_s=0.01,
                       max_cycles=1, log_fn=lambda *_: None)
    assert served == {}  # seen once: pending, not claimed
    served = run_watch(cfg, watch_dir, out_dir, once=False, poll_s=0.01,
                       max_cycles=2, log_fn=lambda *_: None)
    assert set(served.values()) == {"ok"}


def test_watch_error_isolation(watch_setup):
    """A corrupt volume is recorded as failed; the good one still serves;
    nothing is retried until the file changes."""
    cfg, watch_dir, out_dir, rng = watch_setup
    bad = os.path.join(watch_dir, "corrupt.rec")
    with open(bad, "wb") as f:
        f.write(b"not an mrc file")

    served = run_watch(cfg, watch_dir, out_dir, once=True,
                       log_fn=lambda *_: None)
    assert served[bad] == "failed"
    assert served[os.path.join(watch_dir, "a.rec")] == "ok"
    assert run_watch(cfg, watch_dir, out_dir, once=True,
                     log_fn=lambda *_: None) == {}

    # the corrupt file is replaced -> retried and now ok
    rng2 = np.random.default_rng(7)
    write_mrc(bad, rng2.standard_normal((12, 64, 64)).astype(np.float32))
    served = run_watch(cfg, watch_dir, out_dir, once=True,
                       log_fn=lambda *_: None)
    assert served == {bad: "ok"}
    mpath = os.path.join(out_dir, MANIFEST)
    with open(mpath) as f:
        statuses = [ln.split("\t")[3] for ln in f if not ln.startswith("#")]
    assert statuses == ["ok", "failed", "ok"]


def test_watch_cli(watch_setup, capsys):
    from cet_pick_tpu.__main__ import main

    cfg, watch_dir, out_dir, rng = watch_setup
    rc = main(["watch", "--watch_dir", watch_dir, "--once",
               "--task", "semi", "--arch", "unet_2", "--order", "zxy",
               "--K", "40", "--out_thresh", "0.0", "--cutoff_z", "1",
               "--root_dir", cfg.root_dir, "--load_model", cfg.load_model])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(cfg.out_path, "a.txt"))
    assert "picks" in capsys.readouterr().out
