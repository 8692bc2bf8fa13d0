"""Clustering + visualization layer: kmeans, colormaps, plot_2d, interop files."""

import numpy as np
import pandas as pd
import pytest

from cet_pick_tpu.ops.kmeans import kmeans, knn_search
from cet_pick_tpu.viz.colormap2d import ColorMap2D
from cet_pick_tpu.viz.interactive import (
    interactive_to_training_coords,
    select_sublabels,
)
from cet_pick_tpu.viz.plot2d import cluster_embeddings, layout_2d, plot_2d
from cet_pick_tpu.viz.tomo3d import render_3d_hm


def gaussian_mixture(rng, n_per=50, k=4, d=16):
    centers = rng.standard_normal((k, d)) * 10
    pts = np.concatenate([
        centers[i] + rng.standard_normal((n_per, d)) for i in range(k)
    ]).astype(np.float32)
    labels = np.repeat(np.arange(k), n_per)
    return pts, labels


def test_kmeans_separates_clusters(rng):
    pts, true = gaussian_mixture(rng)
    cents, assign, inertia = kmeans(pts, k=4, iters=50, seed=0)
    # every true cluster maps to exactly one k-means cluster
    for t in range(4):
        vals = assign[true == t]
        assert len(set(vals.tolist())) == 1
    assert inertia < pts.shape[0] * pts.shape[1] * 2


def test_knn_search_finds_self(rng):
    pts = rng.standard_normal((30, 8)).astype(np.float32)
    import jax.numpy as jnp

    d, idx = knn_search(jnp.asarray(pts), jnp.asarray(pts), k=3)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(30))


def test_knn_search_blocked_matches_dense(rng):
    """Blocked lax.map path == dense reference at uneven block boundaries."""
    import jax.numpy as jnp

    pts = rng.standard_normal((37, 8)).astype(np.float32)
    base = rng.standard_normal((53, 8)).astype(np.float32)
    d_blk, i_blk = knn_search(jnp.asarray(pts), jnp.asarray(base), k=5, block=16)
    # dense reference
    d2 = ((pts[:, None] - base[None]) ** 2).sum(-1)
    ref_idx = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i_blk), ref_idx)
    np.testing.assert_allclose(
        np.asarray(d_blk), np.take_along_axis(d2, ref_idx, 1), rtol=1e-4, atol=1e-4
    )


def test_knn_search_memory_stays_blocked():
    """Peak temp memory of the compiled kNN is O(block*N), not O(N^2):
    at N=100k, D=16, block=512 the dense distance matrix would be 40 GB;
    the compiled executable must budget far less (compile-only check, no
    100k-point execution needed)."""
    import jax
    import jax.numpy as jnp

    n, d, block = 100_000, 16, 512
    x = jax.ShapeDtypeStruct((n, d), jnp.float32)
    compiled = (
        jax.jit(
            lambda q: knn_search(q, q, k=20, block=block, exclude_self=True)
        )
        .lower(x)
        .compile()
    )
    mem = compiled.memory_analysis()
    if mem is None or not hasattr(mem, "temp_size_in_bytes"):
        pytest.skip("memory_analysis unavailable on this backend")
    # dense would need n*n*4 = 40e9 temp bytes; blocked needs ~block*n*4*
    # (a few buffers). Allow a generous 16x slack over one block buffer.
    assert mem.temp_size_in_bytes < 16 * block * n * 4, (
        f"temp {mem.temp_size_in_bytes/1e9:.1f} GB suggests an unblocked "
        f"(N,N) distance matrix"
    )


def test_colormap_distinct_corners():
    cm = ColorMap2D("ziegler")
    corners = [cm(0, 0), cm(1, 0), cm(0, 1), cm(1, 1)]
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.abs(corners[i].astype(int) - corners[j].astype(int)).sum() > 100


def test_colormap_sample_many_matches_scalar(rng):
    cm = ColorMap2D("bremm")
    xy = rng.random((20, 2))
    many = cm.sample_many(xy)
    for i in range(20):
        np.testing.assert_array_equal(many[i], cm(xy[i, 0], xy[i, 1]))


def test_colormap_unknown_name():
    with pytest.raises(ValueError):
        ColorMap2D("nope")


def test_cluster_embeddings(rng):
    pts, true = gaussian_mixture(rng, n_per=40)
    labels, cents, assign = cluster_embeddings(pts, n_cluster=4, ncentroids=16,
                                               niter=30)
    assert labels.shape == (160,)
    # points in the same true cluster should mostly share a final label
    for t in range(4):
        vals, counts = np.unique(labels[true == t], return_counts=True)
        assert counts.max() / counts.sum() > 0.9


def test_plot_2d_outputs(tmp_path, rng):
    n, d = 60, 32
    projs = rng.standard_normal((n, d)).astype(np.float32)
    npz = tmp_path / "all_output_info.npz"
    np.savez(
        npz,
        proj=projs, pred=projs,
        name=np.array(["t1"] * n),
        coords=rng.integers(0, 100, (n, 3)).astype(np.float32),
        subvol=rng.standard_normal((n, 1, 24, 24)).astype(np.float32),
    )
    out = tmp_path / "plot"
    parquet = plot_2d(str(npz), str(out), n_cluster=3, num_neighbor=10,
                      min_dist_vis=0.01)
    assert (out / "interactive_info_parquet.gzip").exists()
    assert (out / "all_colors.npy").exists()
    assert (out / "2d_visualization_out.webp").exists()
    assert (out / "2d_visualization_labels.webp").exists()
    assert (out / "imgs" / "0.png").exists()
    df = pd.read_parquet(parquet)
    assert list(df.columns) == ["name", "coord", "embeddings", "label", "image"]
    colors = np.load(out / "all_colors.npy")
    assert colors.shape == (n, 3)


def test_interactive_roundtrip(tmp_path, rng):
    df = pd.DataFrame({
        "name": ["a", "a", "b"],
        "coord": [["1", "2", "3"], ["4", "5", "6"], ["7", "8", "9"]],
        "embeddings": [[0.1] * 4] * 3,
        "label": [0, 1, 0],
        "image": ["u"] * 3,
    })
    pq = tmp_path / "sel.parquet"
    df.to_parquet(pq)

    out_txt = tmp_path / "training_coordinates.txt"
    interactive_to_training_coords(str(pq), str(out_txt), if_double=True)
    table = pd.read_csv(out_txt, sep="\t")
    assert list(table.columns) == ["image_name", "x_coord", "y_coord", "z_coord"]
    assert table.z_coord.tolist() == [6.0, 12.0, 18.0]

    files = select_sublabels(str(pq), str(tmp_path / "sub"), use_classes=[0])
    assert len(files) == 2  # names a and b both have label-0 rows
    rows = open(files[0]).read().strip().splitlines()
    x, z, y = rows[0].split("\t")
    assert (x, z, y) == ("1.0", "3.0", "2.0")


def test_render_3d_hm(tmp_path, rng):
    vol = rng.standard_normal((10, 64, 64)).astype(np.float32)
    coords = np.array([[30, 30, 5], [50, 20, 5]], dtype=np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    names = np.array(["t1", "t1"])
    rec_path, hm_path = render_3d_hm(vol, coords, colors, names, "t1",
                                     str(tmp_path))
    rec = np.load(rec_path)
    hm = np.load(hm_path)
    assert rec.shape == (10, 64, 64, 3) and hm.shape == (10, 64, 64, 3)
    assert hm[5, 30, 30, 0] == 255  # red circle at first particle
    assert hm[5, 20, 50, 1] == 255  # green at second (x, y) -> (col, row)
    # no coords for unknown name
    r2, h2 = render_3d_hm(vol, coords, colors, names, "nope", str(tmp_path))
    assert r2 is None


def test_launch_phoenix_schema_with_stub(tmp_path, monkeypatch):
    """Exercise the phoenix schema-building path without arize-phoenix: a
    stub module records the Schema/Dataset/launch_app calls, including the
    port-rewrite of image URLs (phoenix_visualization.py:30-59)."""
    import sys
    import types

    calls = {}

    stub = types.ModuleType("phoenix")

    class EmbeddingColumnNames:
        def __init__(self, vector_column_name, link_to_data_column_name):
            calls["embedding_cols"] = (vector_column_name,
                                       link_to_data_column_name)

    class Schema:
        def __init__(self, prediction_label_column_name, tag_column_names,
                     embedding_feature_column_names):
            calls["label_col"] = prediction_label_column_name
            calls["tags"] = tuple(tag_column_names)
            calls["features"] = dict(embedding_feature_column_names)

    class Dataset:
        def __init__(self, dataframe, schema):
            calls["df"] = dataframe
            calls["schema"] = schema

    stub.EmbeddingColumnNames = EmbeddingColumnNames
    stub.Schema = Schema
    stub.Dataset = Dataset
    stub.launch_app = lambda ds: calls.setdefault("launched", ds) or "session"
    monkeypatch.setitem(sys.modules, "phoenix", stub)

    df = pd.DataFrame({
        "label": [0, 1],
        "name": ["tomo1", "tomo1"],
        "coord": [[1, 2, 3], [4, 5, 6]],
        "embeddings": [[0.1, 0.2], [0.3, 0.4]],
        "image": ["http://localhost:7000/imgs/a.png",
                  "http://localhost:7000/imgs/b.png"],
    })
    pq = tmp_path / "interactive_info_parquet.gzip"
    df.to_parquet(pq, compression="gzip")

    from cet_pick_tpu.viz.interactive import launch_phoenix

    launch_phoenix(str(pq), port=7000)
    assert calls["label_col"] == "label"
    assert calls["tags"] == ("name", "coord")
    assert calls["embedding_cols"] == ("embeddings", "image")
    assert "image_embedding" in calls["features"]
    assert "launched" in calls

    # non-default port rewrites the thumbnail URLs
    calls.clear()
    launch_phoenix(str(pq), port=29999)
    assert calls["df"]["image"].str.contains("localhost:29999").all()


def test_phoenix_cli_drive_with_stub(tmp_path, monkeypatch, capsys):
    """Disk-level CLI drive of the phoenix command against the stub."""
    import sys
    import types

    stub = types.ModuleType("phoenix")
    stub.EmbeddingColumnNames = lambda **kw: None
    stub.Schema = lambda **kw: None
    stub.Dataset = lambda dataframe, schema: None
    stub.launch_app = lambda ds: "session"
    monkeypatch.setitem(sys.modules, "phoenix", stub)
    monkeypatch.setattr("builtins.input", lambda *a: "")

    df = pd.DataFrame({
        "label": [0], "name": ["t"], "coord": [[1, 2, 3]],
        "embeddings": [[0.1]], "image": ["http://localhost:7000/x.png"],
    })
    pq = tmp_path / "p.gzip"
    df.to_parquet(pq, compression="gzip")

    from cet_pick_tpu.__main__ import main

    main(["phoenix", "--input", str(pq)])
