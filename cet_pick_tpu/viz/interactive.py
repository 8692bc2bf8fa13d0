"""Interactive-session interop: Phoenix launcher + parquet converters.

Rebuilds of three reference scripts with identical file formats:

* ``launch_phoenix``            — cet_pick/phoenix_visualization.py:6-59
  (schema: label prediction, name/coord tags, embeddings vector linked to
  image thumbnails; port-collision fallback). Gated on arize-phoenix being
  installed.
* ``interactive_to_training_coords`` — interactive_to_training_coords.py:13-33
  (Phoenix-exported parquet(s) -> ``training_coordinates.txt`` with header
  image_name/x_coord/y_coord/z_coord; optional z doubling).
* ``select_sublabels``          — select_sublabels.py:16-34 (extract chosen
  cluster labels from interactive_info_parquet.gzip into per-tomogram
  ``x\tz\ty`` txts).
"""

from __future__ import annotations

import glob
import os
import socket
from typing import Iterable, Optional


def _port_in_use(port, host="127.0.0.1"):
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        try:
            s.bind((host, port))
            return False
        except OSError:
            return True


def _next_free_port(start, host="127.0.0.1"):
    port = start
    while _port_in_use(port, host):
        port += 1
    return port


def launch_phoenix(parquet_path, port=7000):
    """Launch the Arize Phoenix embedding browser (phoenix_visualization.py:30-59)."""
    import pandas as pd

    try:
        import phoenix as px
    except ImportError as e:
        raise ImportError(
            "arize-phoenix is not installed; install it to use the interactive "
            "3D embedding browser (pip install arize-phoenix). The parquet at "
            f"{parquet_path} is already in the schema Phoenix expects."
        ) from e

    df = pd.read_parquet(parquet_path)
    default_port = 7000
    if port != default_port and _port_in_use(port):
        port = _next_free_port(port)
        print(f"Using port {port}")
    if port != default_port:
        df["image"] = df["image"].str.replace(
            f"localhost:{default_port}", f"localhost:{port}"
        )
    schema = px.Schema(
        prediction_label_column_name="label",
        tag_column_names=["name", "coord"],
        embedding_feature_column_names={
            "image_embedding": px.EmbeddingColumnNames(
                vector_column_name="embeddings",
                link_to_data_column_name="image",
            )
        },
    )
    ds = px.Dataset(dataframe=df, schema=schema)
    return px.launch_app(ds)


def interactive_to_training_coords(input_path, output_path, if_double=False):
    """Phoenix-exported parquet(s) -> training_coordinates.txt
    (interactive_to_training_coords.py:13-33)."""
    import pandas as pd

    if os.path.isfile(input_path):
        parquets = [input_path]
    else:
        parquets = glob.glob(os.path.join(input_path, "*.parquet"))
    with open(output_path, "w") as f:
        f.write("image_name\tx_coord\ty_coord\tz_coord\n")
        for pq in parquets:
            df = pd.read_parquet(pq)
            for name, coord in zip(df["name"], df["coord"]):
                x, y, z = coord[0], coord[1], coord[2]
                if if_double:
                    z = str(float(z) * 2)
                f.write(f"{name}\t{x}\t{y}\t{z}\n")
    return output_path


def select_sublabels(parquet_path, out_path, use_classes: Iterable[int],
                     if_double=False):
    """Extract coordinates of selected cluster labels into per-tomogram txts
    (select_sublabels.py:16-34). Output rows: x\tz\ty."""
    import numpy as np
    import pandas as pd

    os.makedirs(out_path, exist_ok=True)
    df = pd.read_parquet(parquet_path)
    sub = df.loc[df["label"].isin(list(use_classes))]
    written = []
    for name in np.unique(sub["name"].to_numpy()):
        out_full = os.path.join(out_path, f"{name}.txt")
        with open(out_full, "w") as f:
            for c in sub.loc[sub["name"] == name].coord:
                x, y, z = float(c[0]), float(c[1]), float(c[2])
                if if_double:
                    z *= 2
                f.write(f"{x}\t{z}\t{y}\n")
        written.append(out_full)
    return written
