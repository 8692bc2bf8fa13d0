"""Tests for MRC I/O, loader normalization semantics, and coordinate tables."""

import numpy as np
import pytest

from cet_pick_tpu.io import mrc as mrcio
from cet_pick_tpu.io import loader, coords


class TestMrc:
    def test_roundtrip_float32(self, tmp_path, rng):
        vol = rng.standard_normal((5, 7, 9)).astype(np.float32)
        path = str(tmp_path / "t.mrc")
        mrcio.write_mrc(path, vol)
        back, hdr = mrcio.read_mrc(path, return_header=True)
        np.testing.assert_array_equal(back, vol)
        assert (hdr.nz, hdr.ny, hdr.nx) == (5, 7, 9)
        assert hdr.mode == 2
        assert hdr.dmin == pytest.approx(vol.min())
        assert hdr.dmax == pytest.approx(vol.max())

    def test_read_int16_mode(self, tmp_path, rng):
        # hand-build a mode-1 file
        import struct

        vol = rng.integers(-100, 100, size=(3, 4, 5)).astype("<i2")
        hdr = bytearray(1024)
        struct.pack_into("<4i", hdr, 0, 5, 4, 3, 1)
        hdr[208:212] = b"MAP "
        hdr[212:216] = b"\x44\x44\x00\x00"
        path = tmp_path / "i16.mrc"
        path.write_bytes(bytes(hdr) + vol.tobytes())
        back = mrcio.read_mrc(str(path))
        np.testing.assert_array_equal(back, vol)

    def test_extended_header_skipped(self, tmp_path, rng):
        import struct

        vol = rng.standard_normal((2, 3, 4)).astype("<f4")
        ext = b"\x00" * 128
        hdr = bytearray(1024)
        struct.pack_into("<4i", hdr, 0, 4, 3, 2, 2)
        struct.pack_into("<i", hdr, 92, len(ext))  # nsymbt
        hdr[212:216] = b"\x44\x44\x00\x00"
        path = tmp_path / "ext.mrc"
        path.write_bytes(bytes(hdr) + ext + vol.tobytes())
        back = mrcio.read_mrc(str(path))
        np.testing.assert_array_equal(back, vol)


class TestQuantize:
    def test_matches_reference_formula(self):
        # reference loader.py:16-25: 255*(x-mi)/(ma-mi), clip, round
        x = np.array([-3.0, -2.5, 0.0, 2.0, 5.0])
        q = loader.quantize(x)
        expected = np.round(np.clip(255 * (x + 2.5) / 4.5, 0, 255)).astype(np.uint8)
        np.testing.assert_array_equal(q, expected)

    def test_none_bounds_use_minmax(self):
        x = np.array([1.0, 2.0, 3.0])
        q = loader.quantize(x, mi=None, ma=None)
        assert q[0] == 0 and q[-1] == 255


class TestLoadRec:
    def _write(self, tmp_path, arr, name="v.mrc"):
        path = str(tmp_path / name)
        mrcio.write_mrc(path, arr.astype(np.float32))
        return path

    def test_zxy_identity_order_and_standardization(self, tmp_path, rng):
        raw = rng.standard_normal((6, 8, 10))
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="zxy")
        assert out.shape == (6, 8, 10)
        assert abs(out.mean()) < 1e-10
        assert abs(out.std() - 1) < 1e-10

    def test_xyz_transposes_to_z_x_y(self, tmp_path, rng):
        # raw semantic (x, y, z): output[j] == raw[:, :, j] (loader.py:52-59)
        raw = rng.standard_normal((4, 5, 6))  # x=4, y=5, z=6
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="xyz")
        assert out.shape == (6, 4, 5)
        ref = np.moveaxis(raw, 2, 0)
        ref = (ref - ref.mean()) / ref.std()
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)

    def test_xzy_swaps_then_transposes(self, tmp_path, rng):
        raw = rng.standard_normal((4, 6, 5))  # x=4, z=6, y=5
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="xzy")
        assert out.shape == (6, 4, 5)
        sem = np.swapaxes(raw, 2, 1)  # (x, y, z)
        ref = np.moveaxis(sem, 2, 0)
        ref = (ref - ref.mean()) / ref.std()
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)

    def test_compress_pairwise_max(self, tmp_path):
        raw = np.zeros((6, 2, 2), dtype=np.float32)
        for i in range(6):
            raw[i] = i
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="zxy", compress=True)
        assert out.shape == (3, 2, 2)
        # pairs (0,1),(2,3),(4,5) -> maxes 1,3,5 then standardized
        vals = np.array([1.0, 3.0, 5.0])
        ref = np.repeat((vals - vals.mean()) / vals.std(), 4).reshape(3, 2, 2)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_compress_odd_keeps_tail(self, tmp_path):
        raw = np.arange(5, dtype=np.float32).reshape(5, 1, 1) * np.ones((5, 2, 2), np.float32)
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="zxy", compress=True)
        assert out.shape == (3, 2, 2)

    def test_tilt_per_slice_standardization(self, tmp_path, rng):
        raw = rng.standard_normal((4, 8, 8)) * np.array([1, 5, 10, 20]).reshape(4, 1, 1)
        path = self._write(tmp_path, raw)
        out = loader.load_rec(path, order="zxy", is_tilt=True)
        for s in out:
            assert abs(s.mean()) < 1e-9
            assert abs(s.std() - 1) < 1e-9


class TestPreprocess:
    def test_tomo_output_range_and_dtype(self, rng):
        vol = rng.standard_normal((8, 16, 16))
        out = loader.preprocess(vol)
        assert out.min() == 0.0 and out.max() == 1.0
        # quantized to 256 levels then rescaled: values on a uniform grid
        uniq = np.unique(out)
        assert len(uniq) <= 256

    def test_tilt_per_slice_minmax(self, rng):
        vol = rng.standard_normal((3, 16, 16))
        out = loader.preprocess(vol, is_tilt=True)
        for s in out:
            assert s.min() == pytest.approx(0.0)
            assert s.max() == pytest.approx(1.0)

    def test_denoise_smooths(self, rng):
        vol = rng.standard_normal((8, 32, 32))
        out_plain = loader.preprocess(vol)
        out_dn = loader.preprocess(vol, denoise=2)
        # denoised volume has smaller local variation
        dv_plain = np.abs(np.diff(out_plain, axis=1)).mean()
        dv_dn = np.abs(np.diff(out_dn, axis=1)).mean()
        assert dv_dn < dv_plain


class TestCoords:
    def test_table_grouping_and_matching(self, tmp_path, rng):
        import pandas as pd

        df = pd.DataFrame(
            {
                "image_name": ["a", "a", "b"],
                "x_coord": [1, 2, 3],
                "y_coord": [4, 5, 6],
                "z_coord": [0, 1, 2],
            }
        )
        images = {"a": np.zeros((4, 10, 12)), "b": np.zeros((4, 10, 12)), "c": np.zeros((4, 10, 12))}
        matched = coords.match_coordinates_to_images(df, images)
        assert matched["a"]["coord"].shape == (2, 3)
        assert matched["c"]["coord"].shape == (0, 3)
        # flat index: z*(w*h) + y*w + x with w=12, h=10
        np.testing.assert_array_equal(
            matched["a"]["inds"], [0 * 120 + 4 * 12 + 1, 1 * 120 + 5 * 12 + 2]
        )

    def test_order_conversion_roundtrip(self):
        xyz = np.array([[1, 2, 3], [4, 5, 6]])
        np.testing.assert_array_equal(coords.convert_coord_order(xyz, "xyz"), xyz)
        np.testing.assert_array_equal(
            coords.convert_coord_order(xyz, "xzy"), [[1, 3, 2], [4, 6, 5]]
        )
        np.testing.assert_array_equal(
            coords.convert_coord_order(xyz, "zxy"), [[2, 3, 1], [5, 6, 4]]
        )

    def test_write_read_roundtrip(self, tmp_path):
        rows = [("t1", 1, 2, 3), ("t2", 4, 5, 6)]
        path = str(tmp_path / "c.txt")
        coords.write_coord_table(path, rows)
        df = coords.read_coord_table(path)
        assert list(df.columns) == ["image_name", "x_coord", "y_coord", "z_coord"]
        assert len(df) == 2


class TestConfig:
    def test_finalize_heads_semi(self):
        from cet_pick_tpu.config import Config

        c = Config(task="semi").finalize()
        assert c.heads == {"hm": 1, "proj": 32}
        assert c.head_conv == 32

    def test_finalize_heads_simsiam(self):
        from cet_pick_tpu.config import Config

        c = Config(task="simsiam2d3d").finalize()
        assert c.heads == {"proj": 128, "pred": 128}

    def test_json_roundtrip(self):
        from cet_pick_tpu.config import Config

        c = Config(task="semi", bbox=16, tau=0.2).finalize()
        c2 = Config.from_json(c.to_json())
        assert c2.bbox == 16 and c2.tau == 0.2 and c2.lr_step == c.lr_step


def test_stratified_sampler_balance(rng):
    from cet_pick_tpu.data.sampler import StratifiedCoordinateSampler

    labels = np.zeros((4, 8, 8), np.float32)
    labels[0, :2, :2] = 1.0  # 4 positives among 256 voxels
    s = StratifiedCoordinateSampler(labels, balance=0.5, size=200, random=rng)
    draws = [next(s) for _ in range(200)]
    pos_set = set(np.where(labels.ravel() > 0.5)[0].tolist())
    frac_pos = np.mean([d in pos_set for d in draws])
    assert 0.4 < frac_pos < 0.6


def test_stratified_sampler_requires_both_groups(rng):
    from cet_pick_tpu.data.sampler import StratifiedCoordinateSampler
    import pytest as _pytest

    with _pytest.raises(ValueError):
        StratifiedCoordinateSampler(np.zeros((2, 2, 2)), random=rng)


def test_prefetch_iterator_order_and_errors(rng):
    import jax
    from cet_pick_tpu.data.prefetch import PrefetchIterator

    batches = [np.full((2, 2), i, np.float32) for i in range(5)]
    out = list(PrefetchIterator(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0, 0]) == i

    def boom():
        yield batches[0]
        raise RuntimeError("producer failed")

    it = PrefetchIterator(boom(), depth=2)
    next(it)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer failed"):
        for _ in it:
            pass


def test_constant_volume_preprocess_consistent():
    """A constant (zero-variance) volume must give zeros on BOTH the float
    and uint8 preprocess paths — not NaN on one and dequant blow-up on the
    other (round-2 review finding)."""
    from cet_pick_tpu.io.loader import preprocess, preprocess_quantized

    vol = np.full((8, 16, 16), 3.25, np.float32)
    f = preprocess(vol)
    assert np.isfinite(f).all()
    np.testing.assert_array_equal(f, np.zeros_like(f))

    q, lo, hi = preprocess_quantized(vol)
    deq = (q.astype(np.float64) - lo) / max(hi - lo, 1e-12)
    np.testing.assert_array_equal(deq, np.zeros_like(deq))

    # per-slice tilt path with one constant slice stays finite too
    tilt = np.random.default_rng(0).standard_normal((3, 16, 16)).astype(np.float32)
    tilt[1] = 7.0
    t = preprocess(tilt, is_tilt=True)
    assert np.isfinite(t).all()


def test_prefetch_close_releases_producer():
    """Breaking out mid-epoch (the --num_iters cap) must release the
    producer thread instead of leaving it blocked on the full queue."""
    import itertools
    import time

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    produced = []

    def src():
        for i in itertools.count():
            produced.append(i)
            yield {"i": i}

    it = PrefetchIterator(src(), depth=2, device_put=lambda b: b)
    with it:
        for n, batch in enumerate(it):
            if n >= 3:
                break
    # close() joined the thread; it must be dead and production stopped
    assert not it._thread.is_alive()
    count = len(produced)
    time.sleep(0.3)
    assert len(produced) == count


def test_prefetch_close_drains_racing_put():
    """A producer blocked in put() when close() fires can still complete
    that put into the just-drained queue; close() must not strand the batch
    (device HBM) in the dead iterator's queue."""
    import time

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    def src():
        for i in range(100):
            yield {"i": i}

    for _ in range(10):  # the race needs a few tries to land
        it = PrefetchIterator(src(), depth=1, device_put=lambda b: b)
        next(it)
        it.close()
        assert not it._thread.is_alive()
        assert it._q.qsize() == 0
    time.sleep(0.05)


def test_prefetch_abandoned_iterator_released_by_gc():
    """An abandoned iterator (consumer stops without close()) must be
    releasable by GC: the worker closes over locals, not self, so __del__
    runs and stops the producer instead of spinning at 10 Hz forever."""
    import gc
    import time
    import weakref

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield {"i": i}

    it = PrefetchIterator(src(), depth=1, device_put=lambda b: b)
    next(it)
    thread = it._thread
    ref = weakref.ref(it)
    del it
    gc.collect()
    assert ref() is None  # the worker thread must not pin the iterator
    for _ in range(50):
        if not thread.is_alive():
            break
        time.sleep(0.1)
    assert not thread.is_alive()
    count = len(produced)
    time.sleep(0.3)
    assert len(produced) == count


def test_prefetch_slow_consumer_gets_sentinel():
    """The end-of-epoch sentinel must arrive even when the producer finishes
    while the queue is FULL (consumer stalled, e.g. compiling its first
    step). A dropped sentinel deadlocks __next__ after the queued batches
    drain — the exact hang the round-3 CLI train drive hit."""
    import threading
    import time

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(iter([{"i": 0}, {"i": 1}, {"i": 2}]), depth=1,
                          device_put=lambda b: b)
    time.sleep(0.5)  # producer exhausts the iterator against a full queue

    got = []
    done = threading.Event()

    def consume():
        got.extend(b["i"] for b in it)
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=10.0), "consumer deadlocked: sentinel was lost"
    assert got == [0, 1, 2]


def test_mrc_big_endian_without_machst(tmp_path, rng):
    """A big-endian MRC whose MACHST stamp is garbage must still parse via
    the dims+mode fallback — a dims-only nx check misreads BE nx=256 as LE
    65536 ('sane') and returns byteswapped garbage."""
    import struct

    from cet_pick_tpu.io import mrc as mrcio

    vol = rng.standard_normal((4, 8, 256)).astype(">f4")  # nx=256 BE
    header = bytearray(1024)
    struct.pack_into(">4i", header, 0, 256, 8, 4, 2)     # nx ny nz mode
    struct.pack_into(">3i", header, 28, 256, 8, 4)        # mx my mz
    struct.pack_into(">3f", header, 40, 256.0, 8.0, 4.0)  # cella
    struct.pack_into(">3i", header, 64, 1, 2, 3)          # mapc/r/s
    header[208:212] = b"MAP "
    header[212:216] = b"\x00\x00\x00\x00"                 # garbage MACHST
    path = tmp_path / "be.mrc"
    path.write_bytes(bytes(header) + vol.tobytes())
    back = mrcio.read_mrc(str(path))
    assert back.shape == (4, 8, 256)
    np.testing.assert_allclose(back, vol.astype(np.float32), rtol=1e-6)


def test_prefetch_repeated_stopiteration():
    """The iterator protocol requires StopIteration on every __next__ after
    exhaustion — the single sentinel used to make a second next() block
    forever on the empty queue."""
    import pytest as _pytest

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(iter([{"i": 0}]), depth=2, device_put=lambda b: b)
    assert next(it)["i"] == 0
    with _pytest.raises(StopIteration):
        next(it)
    with _pytest.raises(StopIteration):
        next(it)  # must raise again, not hang


def test_refine_dataset_needs_two_annotations(rng):
    """A single-annotation train set fails with a clear message instead of
    an opaque rng.integers(0, 0) ValueError on the first sample."""
    import pandas as pd
    import pytest as _pytest

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset

    vol = rng.standard_normal((16, 96, 96)).astype(np.float32)
    df = pd.DataFrame({"image_name": ["syn0"], "x_coord": [48],
                       "y_coord": [48], "z_coord": [8]})
    cfg = Config(task="semi", bbox=8).finalize()
    with _pytest.raises(ValueError, match=">= 2 annotations"):
        RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)


def test_predict_loaded_shape_matches_load_rec(tmp_path, rng):
    """Header-only shape prediction == load_rec's actual output shape for
    every axis order, with and without z-compression (odd + even depths) —
    run_test pre-compiles from this prediction while volume 0 loads."""
    from cet_pick_tpu.io.loader import load_rec, predict_loaded_shape
    from cet_pick_tpu.io.mrc import read_mrc_shape, write_mrc

    for i, dims in enumerate([(7, 10, 12), (8, 12, 10)]):
        raw = rng.standard_normal(dims).astype(np.float32)
        p = str(tmp_path / f"v{i}.rec")
        write_mrc(p, raw)
        assert read_mrc_shape(p) == dims
        for order in ("zxy", "xzy", "xyz", "yxz"):
            for compress in (False, True):
                got = predict_loaded_shape(p, order=order, compress=compress)
                real = load_rec(p, order=order, compress=compress).shape
                assert got == real, (order, compress, got, real)


def test_quantized_tomo_store_bit_identical(tmp_path, rng):
    """Datasets built from disk hold volumes uint8-resident (4x less host
    RAM) and must produce BIT-IDENTICAL samples to a float-resident build:
    preprocess()'s tomogram output is exactly (q - lo)/(hi - lo), and
    QuantizedTomo dequantizes crops with the same float64 op order."""
    import pandas as pd

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.io.loader import (
        QuantizedTomo, load_rec, load_tomos_quantized_from_list, preprocess,
    )
    from cet_pick_tpu.io.mrc import write_mrc

    vol = rng.standard_normal((16, 96, 96)).astype(np.float32)
    p = str(tmp_path / "syn0.rec")
    write_mrc(p, vol)
    (tmp_path / "train_images.txt").write_text(
        f"image_name\trec_path\nsyn0\t{p}\n")
    df = pd.DataFrame({
        "image_name": ["syn0"] * 6,
        "x_coord": [20, 40, 60, 70, 30, 50],
        "y_coord": [30, 60, 20, 50, 70, 40],
        "z_coord": [4, 8, 11, 6, 9, 7],
    })
    df.to_csv(tmp_path / "train_coords.txt", sep="\t", index=False)

    cfg = Config(task="semi", arch="unet_2", order="zxy", bbox=8,
                 data_dir=str(tmp_path), root_dir=str(tmp_path)).finalize()
    ds_q = RefineDataset(cfg, "train")  # disk path -> quantized store
    assert isinstance(ds_q.tomos[0], QuantizedTomo)
    assert ds_q.tomos[0].u8.dtype == np.uint8

    floats = {"syn0": preprocess(load_rec(p, order="zxy")).astype(np.float32)}
    ds_f = RefineDataset(cfg, "train", images=floats, coords_df=df)

    # the standalone QuantizedTomo views equal the float volume bitwise
    qt = load_tomos_quantized_from_list(["syn0"], [p], order="zxy")["syn0"]
    np.testing.assert_array_equal(qt.astype(np.float32), floats["syn0"])
    np.testing.assert_array_equal(qt[3:9, 10:40, 20:50],
                                  floats["syn0"][3:9, 10:40, 20:50])
    np.testing.assert_array_equal(np.asarray(qt, np.float32), floats["syn0"])

    # identical rng streams -> identical batches, bit for bit
    b_q = ds_q.sample_batch(np.random.default_rng(7), [0, 3, 5])
    b_f = ds_f.sample_batch(np.random.default_rng(7), [0, 3, 5])
    for k in b_f:
        np.testing.assert_array_equal(b_q[k], b_f[k], err_msg=k)
    v_q, v_f = ds_q.val_item(0), ds_f.val_item(0)
    np.testing.assert_array_equal(v_q["input"], v_f["input"])
    np.testing.assert_array_equal(v_q["hm"], v_f["hm"])
