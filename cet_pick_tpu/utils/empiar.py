"""One-shot EMPIAR tutorial validation: train -> test -> pr-curve.

Executable form of docs/empiar_validation.md §1-2 (the reference's
quick-tutorial recipes, reference docs/quick_tutorial.md:95 + refine.md
tubular flags): point ``cet_pick_tpu doctor --empiar <dir>`` at a directory
in the EMPIAR tutorial layout and it runs the full two-stage refinement
pipeline and scores F1 against the validation coordinates — the moment real
data is mounted, the real-data parity gate (BASELINE.json: F1 within 1% of
the reference) is one command.

Expected directory layout (the tutorial archives' own file names; any can be
overridden):

    <dir>/sample_train_explore_img.txt        image list (train)
    <dir>/training_coordinates.txt            train coordinates
    <dir>/sample_val_img.txt                  image list (validation; falls
                                              back to the train list)
    <dir>/val_coordinates.txt                 validation coordinates (falls
                                              back to the train coordinates)

The dry-run against a synthetic fixture laid out in this format is
tests/test_cli.py::test_doctor_empiar_dry_run.
"""

from __future__ import annotations

import json
import os
from typing import Optional

# The two tutorial recipes (docs/empiar_validation.md §1-2; flags match the
# reference tutorial commands one for one).
RECIPES = {
    "globular": {  # EMPIAR-10304 ribosomes
        "train": ["--arch", "unet_5", "--contrastive", "--down_ratio", "2",
                  "--bbox", "16", "--K", "900", "--thresh", "0.85",
                  "--cr_weight", "0.1", "--temp", "0.07", "--tau", "0.01",
                  "--lr", "5e-4", "--compress", "--order", "xzy",
                  "--gauss", "0.8"],
        "test": ["--arch", "unet_5", "--K", "900", "--out_thresh", "0.2",
                 "--order", "xzy", "--compress", "--gauss", "0.8",
                 "--down_ratio", "2"],
        "train_img": "sample_train_explore_img.txt",
        "train_coord": "training_coordinates.txt",
        "radius": 10,
        "epochs": 10,
    },
    "tubular": {  # EMPIAR-10987 microtubules (--fiber)
        "train": ["--arch", "unet_5", "--contrastive", "--fiber",
                  "--down_ratio", "2", "--bbox", "12", "--K", "550",
                  "--thresh", "0.3", "--cr_weight", "1.0", "--temp", "0.07",
                  "--tau", "0.01", "--lr", "1e-4", "--compress",
                  "--order", "xzy", "--gauss", "1", "--last_k", "5"],
        "test": ["--arch", "unet_5", "--fiber", "--K", "550",
                 "--out_thresh", "0.205", "--cutoff_z", "10", "--nms", "3",
                 "--last_k", "5", "--curvature_cutoff", "0.03",
                 "--order", "xzy", "--compress", "--gauss", "1",
                 "--down_ratio", "2"],
        "train_img": "sample_train_microtubule_img.txt",
        "train_coord": "training_coordinates_microtubule.txt",
        "radius": 10,
        "epochs": 10,
    },
}


def run_empiar_validation(data_dir: str, recipe: str = "globular",
                          root_dir: Optional[str] = None,
                          num_epochs: Optional[int] = None,
                          extra_train=(), extra_test=(),
                          f1_target: Optional[float] = None,
                          log_fn=print) -> dict:
    """Train + pick + score on an EMPIAR-layout directory; returns the
    report dict (also what ``doctor --empiar`` prints as JSON)."""
    import pandas as pd

    from cet_pick_tpu.__main__ import main
    from cet_pick_tpu.eval.metrics import evaluate_detections, merge_output

    if recipe not in RECIPES:
        raise ValueError(f"unknown recipe {recipe!r}; one of {sorted(RECIPES)}")
    r = RECIPES[recipe]
    root_dir = root_dir or os.path.join(data_dir, "cet_pick_tpu_validation")
    exp_id = f"empiar_{recipe}"

    def pick(name, fallback=None):
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            return name
        return fallback

    train_img = pick(r["train_img"], "train_images.txt")
    train_coord = pick(r["train_coord"], "train_coords.txt")
    val_img = pick("sample_val_img.txt", train_img)
    val_coord = pick("val_coordinates.txt", train_coord)
    for name in (train_img, train_coord, val_img, val_coord):
        if name is None or not os.path.exists(os.path.join(data_dir, name)):
            raise FileNotFoundError(
                f"EMPIAR layout incomplete in {data_dir}: need "
                f"{r['train_img']} / {r['train_coord']} "
                "(see docs/empiar_validation.md §0 for the download)"
            )

    epochs = num_epochs if num_epochs is not None else r["epochs"]
    common = ["--data_dir", data_dir, "--root_dir", root_dir,
              "--exp_id", exp_id, "--task", "semi"]
    log_fn(f"[empiar] stage 1/3: train ({recipe}, {epochs} epochs)")
    rc = main(["train", *r["train"], *common, "--num_epochs", str(epochs),
               "--train_img_txt", train_img, "--train_coord_txt", train_coord,
               "--val_img_txt", val_img, "--val_coord_txt", val_coord,
               "--val_intervals", "-1", *extra_train])
    if rc not in (None, 0):
        raise RuntimeError(f"train stage failed (rc={rc})")

    save_dir = os.path.join(root_dir, "exp", "semi", exp_id)
    log_fn("[empiar] stage 2/3: test (picking the validation volumes)")
    # --with_score always: the pr-curve stage sweeps thresholds over the
    # score column (a score-less txt would merge to NaN scores)
    rc = main(["test", *r["test"], *common,
               "--load_model", os.path.join(save_dir, "model_last"),
               "--test_img_txt", val_img, "--out_id", "empiar_val",
               "--no-write_hm", "--with_score", *extra_test])
    if rc not in (None, 0):
        raise RuntimeError(f"test stage failed (rc={rc})")

    log_fn("[empiar] stage 3/3: pr-curve (F1 vs validation coordinates)")
    out_dir = os.path.join(save_dir, "empiar_val")
    # .tsv, NOT .txt: merge_output globs *.txt, so a .txt name would merge
    # the previous run's merged table into itself on a re-run
    merged = os.path.join(out_dir, "merged_predictions.tsv")
    merge_output(out_dir, merged)
    targets = pd.read_csv(os.path.join(data_dir, val_coord), sep="\t")
    predicts = pd.read_csv(merged, sep="\t", comment="#")
    res = evaluate_detections(targets, predicts, r["radius"])
    table_path = os.path.join(out_dir, f"pr_{recipe}.tsv")
    res["table"].to_csv(table_path, sep="\t", index=False)

    report = {
        "recipe": recipe,
        "data_dir": data_dir,
        "num_epochs": epochs,
        "best_f1": float(res["best_f1"]),
        "auprc": float(res["auprc"]),
        "assignment_radius": r["radius"],
        "pr_table": table_path,
        "predictions": merged,
        "checkpoint": os.path.join(save_dir, "model_last"),
    }
    if f1_target is not None:
        report["f1_target"] = float(f1_target)
        report["pass"] = bool(report["best_f1"] >= f1_target)
    log_fn(f"[empiar] best F1 = {report['best_f1']:.4f} "
           f"(auprc {report['auprc']:.4f}); PR table: {table_path}")
    return report


def empiar_report_json(report: dict) -> str:
    return json.dumps(report)
