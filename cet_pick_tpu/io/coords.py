"""Coordinate-table I/O and matching, reference-compatible.

Re-implements reference cet_pick/utils/coordinates.py:5-52 plus the coordinate
order conversions of cet_pick/utils/generate_train_file.py:55-72.

On-disk formats (tab-separated, identical to the reference so nextPYP
workflows drop in):

* image list:  header ``image_name\trec_path`` (optionally ``tilt_path``,
  ``angle_path`` columns for the exploration 2d3d mode)
* coord list:  header ``image_name\tx_coord\ty_coord\tz_coord``
* detections:  ``x\tz\ty[\tscore]`` rows, no header (tomo_det.py:81-83)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def read_image_list(path):
    """Read a tab-separated image list with an ``image_name`` column."""
    return pd.read_csv(path, sep="\t")


def read_coord_table(path):
    """Read a tab-separated coordinate table (image_name, x_coord, y_coord, z_coord)."""
    return pd.read_csv(path, sep="\t")


def convert_coord_order(xyz, order="xyz"):
    """Map raw coordinate columns in ``order`` to canonical (x, y, z).

    Matches generate_train_file.py:55-72: input rows may be stored as
    x,y,z / x,z,y / z,x,y and are rewritten to x,y,z.
    """
    xyz = np.asarray(xyz)
    if order == "xyz":
        return xyz
    if order == "xzy":
        return xyz[:, [0, 2, 1]]
    if order == "zxy":
        return xyz[:, [1, 2, 0]]
    raise ValueError(f"unknown coordinate order {order!r}")


def convert_3d_to_1d_coord(coords, w, h):
    """Flatten (x, y, z) integer coords to z*(w*h) + y*w + x (coordinates.py:5-12)."""
    coords = np.asarray(coords)
    if coords.size == 0:
        return np.zeros(0)
    return (
        coords[:, 2].astype(np.int64) * (w * h)
        + coords[:, 1].astype(np.int64) * w
        + coords[:, 0].astype(np.int64)
    ).astype(np.float64)


def coordinates_table_to_dict(coords: pd.DataFrame):
    """Group a coordinate table by image name -> {name: (n, 3) int32 array}.

    Mirrors coordinates.py:14-24 including the optional ``source`` grouping.
    """
    root = {}
    if "source" in coords:
        for (source, name), df in coords.groupby(["source", "image_name"]):
            xyz = df[["x_coord", "y_coord", "z_coord"]].values.astype(np.int32)
            root.setdefault(source, {})[name] = xyz
    else:
        for name, df in coords.groupby("image_name"):
            xyz = df[["x_coord", "y_coord", "z_coord"]].values.astype(np.int32)
            root[name] = xyz
    return root


def match_coordinates_to_images(coord: pd.DataFrame, images: dict):
    """Join loaded tomograms with their annotations (coordinates.py:37-52).

    Returns {name: {"tomo": (D,H,W) array, "coord": (n,3) int32, "inds": (n,) flat}}.
    Images without annotations get empty coordinate arrays.
    """
    coords = coordinates_table_to_dict(coord)
    null_coords = np.zeros((0, 3), dtype=np.int32)
    matched = {}
    for name, im in images.items():
        depth, height, width = im.shape
        xyz = coords.get(name, null_coords)
        matched[name] = {
            "tomo": im,
            "coord": xyz,
            "inds": convert_3d_to_1d_coord(xyz, width, height),
        }
    return matched


def write_coord_table(path, rows):
    """Write an ``image_name\tx_coord\ty_coord\tz_coord`` table."""
    df = pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord", "z_coord"])
    df.to_csv(path, sep="\t", index=False)
