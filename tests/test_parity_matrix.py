"""Machine-checked parity matrix against the reference registries.

Reads the ACTUAL reference factory dicts (datasets/dataset_factory.py:40-87,
trains/train_factory.py:16-31, models/model.py:32-56,
detectors/detector_factory.py:8-13) and asserts every key is either mapped
to an importable framework entry point or on the explicit documented
exclusion list below — so a key added to the reference (or an entry point
renamed here) fails the suite instead of silently rotting in PARITY.md
prose (VERDICT r3 item 7).

The registries are extracted by AST rather than import: the factory modules
pull in the reference's full dependency closure (mrcfile, torchio,
torchvision, progress, sknetwork...) which this environment doesn't ship,
and stubbing them far enough to import segfaults torch. The dict literals
are still read from the real files, which is the enforcement that matters.
"""

import ast
import importlib
import os

import pytest

REFERENCE = "/root/reference/cet_pick"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)


def registry_keys(relpath, name):
    """String keys of the top-level dict literal assigned to ``name``."""
    with open(os.path.join(REFERENCE, relpath)) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign):
            continue
        targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
        if name in targets and isinstance(node.value, ast.Dict):
            keys = []
            for k in node.value.keys:
                assert isinstance(k, ast.Constant) and isinstance(k.value, str)
                keys.append(k.value)
            return keys
    raise AssertionError(f"{name} dict not found in {relpath}")


def entry(modattr, note=""):
    return ("entry", modattr, note)


def excluded(reason):
    return ("excluded", None, reason)


# -- reference key -> framework entry point / documented exclusion -----------

TRAIN_FACTORY_MAP = {
    "tomo": entry("cet_pick_tpu.train.supervised:train_supervised"),
    "tcla": entry("cet_pick_tpu.train.classify:train_classify"),
    "cr": entry("cet_pick_tpu.train.supervised:train_supervised"),
    "fs": entry("cet_pick_tpu.train.fewshot:train_fewshot"),
    "semi": entry("cet_pick_tpu.train.refine:train_refine"),
    "semiclass": entry("cet_pick_tpu.train.semiclass:train_semiclass"),
    "semi3d": entry("cet_pick_tpu.train.refine:train_refine",
                    "3D detector via models/detector3d"),
    "simsiam": entry("cet_pick_tpu.train.explore:train_explore",
                     "vol mode: 3D subvolume crops"),
    "moco": entry("cet_pick_tpu.train.moco:train_moco"),
    "scan": entry("cet_pick_tpu.train.scan:train_scan_head",
                  "+ train_scan_full for the fine-tune variant"),
    "simsiam2d3d": entry("cet_pick_tpu.train.explore:train_explore"),
    "simsiam3d": entry("cet_pick_tpu.train.explore:train_explore",
                       "2d mode: z-slice patches"),
    "scan2d3d": entry("cet_pick_tpu.train.scan:train_scan_full"),
    "denoise": entry("cet_pick_tpu.train.denoise:train_denoise"),
}

DATASET_FACTORY_MAP = {
    "tomo": entry("cet_pick_tpu.data.refine_dataset:RefineDataset"),
    "tcla": entry("cet_pick_tpu.data.sampler:StratifiedCoordinateSampler",
                  "tcla samples stratified voxel coordinates"),
    "cr": entry("cet_pick_tpu.data.refine_dataset:RefineDataset"),
    "fs": entry("cet_pick_tpu.data.fewshot_dataset:FewshotDataset"),
    "semi": entry("cet_pick_tpu.data.refine_dataset:RefineDataset"),
    "semi_test": entry("cet_pick_tpu.io.loader:load_tomos_from_list",
                       "inference loads volumes directly (infer/detector)"),
    "semi3d": entry("cet_pick_tpu.data.refine_dataset:RefineDataset"),
    "semiclass": entry("cet_pick_tpu.data.classify_dataset:SemiClassDataset"),
    "simsiam": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                     "mode 'vol': DoG-mined 3D subvolume crops"),
    "simsiam_test": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                          "split 'test'"),
    "simsiam2d": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                       "mode '3d' (z-slice patches)"),
    "simsiamproj": excluded(
        "superseded in the reference itself by simsiam2d3d "
        "(tomo_pre_proj_angle_select_new2d3d.py is the 'new' rewrite of "
        "tomo_pre_proj_angle_select_new.py); not referenced by any entry "
        "script"),
    "simsiamproj_test": excluded("test split of the superseded simsiamproj"),
    "scan": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                  "SCAN consumes explore patches + mined neighbors"),
    "simsiam2d3d": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                         "mode '2d3d'"),
    "simsiam3d": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset",
                       "mode '3d'"),
    "simsiam3dpost": excluded(
        "registry-only: no reference entry script passes "
        "--dataset simsiam3dpost (grep of cet_pick/*.py)"),
    "scan2d3d": entry("cet_pick_tpu.data.explore_dataset:ExploreDataset"),
    "denoise": entry("cet_pick_tpu.train.denoise:DenoiseDataset"),
}

MODEL_FACTORY_MAP = {
    "res": excluded("experimental arch zoo (SURVEY §2.4): resnet.py trunk "
                    "superseded by unet in every reference recipe"),
    "unet": entry("cet_pick_tpu.models.detector:TomoPickNet"),
    "class": excluded("experimental classifier trunk (classifier.py); tcla "
                      "production path uses the unet classifier"),
    "small": excluded("experimental classifier trunk (classifier_small.py)"),
    "ressmall": excluded("experimental arch zoo (resnet_small.py)"),
    "p3d": entry("cet_pick_tpu.models.detector3d:TomoPickNet3D",
                 "behavioral: both reference 3D trunks map to the "
                 "TPU-native 3D detector"),
    "res3d": entry("cet_pick_tpu.models.detector3d_ref:TomoRes3DRefNet",
                   "lossless two-way conversion (tests/test_convert.py); "
                   "TPU-native redesign at models/detector3d.py"),
    "unetcla": entry("cet_pick_tpu.models.unet:UNet2D",
                     "tcla classifier head over the same UNet"),
    "resclass": excluded("experimental classifier trunk (resnet_new.py)"),
    "simsiam": entry("cet_pick_tpu.models.simsiam:VolTrunk",
                     "3D-subvolume encoder (mode 'vol')"),
    "simsiam3d": entry("cet_pick_tpu.models.simsiam:VolTrunk",
                       "same reference class as 'simsiam'"),
    "moco3d": entry("cet_pick_tpu.models.simsiam:VolTrunk",
                    "MoCo over subvolumes (mode 'vol')"),
    "simsiam2d": entry("cet_pick_tpu.models.simsiam:SimSiamEncoder",
                       "mode '2d'"),
    "simsiamwide3d": excluded("experimental arch zoo (wideresnet.py)"),
    "simsiampyr3d": excluded("experimental arch zoo (pyramidnet.py)"),
    "simsiamsmall3d": excluded("experimental arch zoo (simsiam_ressmall.py)"),
    "scan2d": entry("cet_pick_tpu.models.simsiam:ScanClusteringModel"),
    "simsiam2d3d": entry("cet_pick_tpu.models.simsiam:SimSiamEncoder",
                         "mode '2d3d'"),
    "scan2d3d": entry("cet_pick_tpu.models.simsiam:ScanClusteringModel"),
    "denoise": entry("cet_pick_tpu.models.denoise:NoiseNetwork"),
    "moco2d": entry("cet_pick_tpu.models.simsiam:SimSiamEncoder",
                    "MoCo query/key encoders share the SimSiam trunk"),
}

DETECTOR_FACTORY_MAP = {
    "tomo": entry("cet_pick_tpu.infer.detector:TomoDetector"),
    "semi": entry("cet_pick_tpu.infer.detector:TomoDetector"),
    "semi3d": entry("cet_pick_tpu.infer.detector:TomoDetector"),
    "semiclass": entry("cet_pick_tpu.infer.classify:TomoClassDetector"),
}


REGISTRIES = [
    ("trains/train_factory.py", "train_factory", TRAIN_FACTORY_MAP),
    ("datasets/dataset_factory.py", "dataset_factory", DATASET_FACTORY_MAP),
    ("datasets/dataset_factory.py", "_sample_factory", DATASET_FACTORY_MAP),
    ("models/model.py", "_model_factory", MODEL_FACTORY_MAP),
    ("detectors/detector_factory.py", "detector_factory",
     DETECTOR_FACTORY_MAP),
]


@pytest.mark.parametrize("relpath,name,mapping",
                         REGISTRIES, ids=[r[1] for r in REGISTRIES])
def test_every_reference_key_is_mapped(relpath, name, mapping):
    keys = registry_keys(relpath, name)
    assert keys, f"no keys parsed from {relpath}:{name}"
    missing = [k for k in keys if k not in mapping]
    assert not missing, (
        f"reference {name} keys with no framework mapping or documented "
        f"exclusion: {missing} — extend tests/test_parity_matrix.py"
    )


@pytest.mark.parametrize("mapping", [TRAIN_FACTORY_MAP, DATASET_FACTORY_MAP,
                                     MODEL_FACTORY_MAP, DETECTOR_FACTORY_MAP],
                         ids=["train", "dataset", "model", "detector"])
def test_mapped_entry_points_exist(mapping):
    for key, (kind, modattr, note) in mapping.items():
        if kind == "excluded":
            assert note, f"{key}: exclusion needs a reason"
            continue
        mod, attr = modattr.split(":")
        m = importlib.import_module(mod)
        assert hasattr(m, attr), f"{key} -> {modattr}: attribute missing"


# -- entry scripts (SURVEY §2.1): every reference top-level script maps to a
#    CLI command or a documented exclusion ---------------------------------

ENTRY_SCRIPT_MAP = {
    "__init__.py": excluded("package marker"),
    "opts.py": excluded("flag system -> config.py + cli/common.py "
                        "(every flag audited by tests/test_config_audit.py)"),
    "logger.py": excluded("support module -> utils/logger.py"),
    "main.py": entry("cli", "train"),
    "test.py": entry("cli", "test"),
    "main_class.py": entry("cli", "classify"),
    "test_class.py": entry("cli", "classify-test"),
    "main_seq.py": entry("cli", "train  (freeze= fine-tune via "
                         "create_train_state(freeze=))"),
    "simsiam_main.py": entry("cli", "explore"),
    "moco_main.py": entry("cli", "moco"),
    "moco_single_main.py": entry(
        "cli", "moco --moco_symmetric  (r5: the standalone MoCoModel/"
        "MoCoTrainer's distinguishing behavior — bidirectional InfoNCE, "
        "both keys enqueued, tomo_moco_small_trainer.py:135-161 — is a "
        "flag on the shared moco path; its single-GPU batch-shuffle-BN "
        "trick is subsumed by the running-stats key forward, and its "
        "EMA/queue/InfoNCE mechanics were always the shared ones. The "
        "loop itself is not registered in the reference's train_factory)"),
    "simsiam_test_hm_2d3d.py": entry("cli", "embed"),
    "simsiam_test_hm_3d.py": entry("cli", "embed"),
    "moco_test.py": entry("cli", "embed"),
    "moco_test_3d.py": entry("cli", "embed"),
    "plot_2d.py": entry("cli", "plot2d"),
    "phoenix_visualization.py": entry("cli", "phoenix"),
    "interactive_to_training_coords.py": entry("cli", "to-coords"),
    "select_sublabels.py": entry("cli", "sublabels"),
    "visualize_3dhm.py": entry("cli", "visualize3d"),
    "merge_output.py": entry("cli", "merge"),
    "precision_recall_curve.py": entry("cli", "pr-curve"),
    "remove_golds.py": entry("cli", "remove-golds"),
}


def test_every_reference_entry_script_is_mapped():
    import glob

    scripts = sorted(os.path.basename(p)
                     for p in glob.glob(os.path.join(REFERENCE, "*.py")))
    missing = [s for s in scripts if s not in ENTRY_SCRIPT_MAP]
    assert not missing, (
        f"reference entry scripts with no CLI mapping or documented "
        f"exclusion: {missing}"
    )


def test_mapped_cli_commands_exist():
    from cet_pick_tpu.__main__ import COMMANDS

    for script, (kind, _, note) in ENTRY_SCRIPT_MAP.items():
        if kind == "excluded":
            assert note, f"{script}: exclusion needs a reason"
            continue
        cmd = note.split()[0]
        assert cmd in COMMANDS, f"{script} -> CLI {cmd!r} does not exist"
