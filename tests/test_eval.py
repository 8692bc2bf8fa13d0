"""Evaluation layer: Hungarian matching, PR curve, merge/remove utilities."""

import numpy as np
import pandas as pd

from cet_pick_tpu.eval.matching import match_coordinates
from cet_pick_tpu.eval.metrics import (
    evaluate_detections,
    f1_from_pr,
    merge_output,
    precision_recall_curve,
    remove_golds,
)


def test_match_coordinates_exact():
    targets = np.array([[0, 0, 0], [10, 10, 10]], dtype=float)
    preds = np.array([[1, 0, 0], [10, 10, 11], [50, 50, 50]], dtype=float)
    match, dist = match_coordinates(targets, preds, radius=3)
    np.testing.assert_array_equal(match, [1, 1, 0])
    assert abs(dist[0] - 1.0) < 1e-9 and abs(dist[1] - 1.0) < 1e-9


def test_match_coordinates_hungarian_resolves_conflict():
    # two predictions near one target: only one can match
    targets = np.array([[0, 0, 0]], dtype=float)
    preds = np.array([[1, 0, 0], [0, 1, 0]], dtype=float)
    match, _ = match_coordinates(targets, preds, radius=3)
    assert match.sum() == 1


def test_match_radius_cube_cost():
    # the reference cost is d^2 - r^3: a prediction at distance d matches
    # iff d^2 < r^3 (algorithms.py:9-10)
    targets = np.array([[0, 0, 0]], dtype=float)
    r = 4
    d_in = np.sqrt(r ** 3) - 0.1
    d_out = np.sqrt(r ** 3) + 0.1
    m_in, _ = match_coordinates(targets, np.array([[d_in, 0, 0]]), r)
    m_out, _ = match_coordinates(targets, np.array([[d_out, 0, 0]]), r)
    assert m_in[0] == 1 and m_out[0] == 0


def test_precision_recall_curve_perfect():
    target = np.array([1, 1, 1, 0, 0])
    pred = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    precision, recall, thr, avpr = precision_recall_curve(target, pred)
    assert abs(avpr - 1.0) < 1e-9
    assert recall[-1] == 1.0
    f1 = f1_from_pr(precision, recall)
    assert f1.max() > 0.99


def test_precision_recall_curve_ties_bucketed():
    # three predictions share a score: one bucket of k=3
    target = np.array([1, 0, 1, 0])
    pred = np.array([0.5, 0.5, 0.5, 0.1])
    precision, recall, thr, avpr = precision_recall_curve(target, pred)
    assert len(thr) == 2  # buckets: {0.5}, {0.1}
    assert abs(precision[0] - 2 / 3) < 1e-9


def test_evaluate_detections_roundtrip():
    targets = pd.DataFrame({
        "image_name": ["a"] * 3,
        "x_coord": [10, 30, 50], "y_coord": [10, 30, 50], "z_coord": [5, 5, 5],
    })
    preds = pd.DataFrame({
        "image_name": ["a"] * 4,
        "x_coord": [10, 30, 50, 90], "y_coord": [11, 30, 50, 90],
        "z_coord": [5, 5, 5, 5],
        "score": [0.9, 0.8, 0.7, 0.6],
    })
    res = evaluate_detections(targets, preds, radius=4)
    assert res["best_f1"] > 0.85
    assert res["n_targets"] == 3


def test_merge_output(tmp_path):
    (tmp_path / "t1.txt").write_text("header\n1\t2\t3\t0.9\n4\t5\t6\t0.8\n")
    (tmp_path / "t2.txt").write_text("header\n7\t8\t9\t0.7\n")
    out = merge_output(str(tmp_path), "merged.out")
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["image_name", "x_coord", "z_coord", "y_coord", "score"]
    assert len(df) == 3
    assert set(df.image_name) == {"t1", "t2"}


def test_remove_golds():
    preds = np.array([[0, 0, 0], [100, 100, 100]], dtype=float)
    golds = np.array([[5, 0, 0]], dtype=float)
    kept = remove_golds(preds, golds, radius=20)
    assert len(kept) == 1 and kept[0, 0] == 100
