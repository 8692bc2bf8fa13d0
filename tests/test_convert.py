"""Reference-checkpoint conversion: bit-level output parity torch vs flax.

Imports the actual reference TomoConvUNet from /root/reference (skipped when
the reference tree is absent), randomizes it, converts the state_dict with
models/convert.py, and compares full forward outputs on a fixed input.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "cet_pick")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def torch_model_and_outputs():
    sys.path.insert(0, REFERENCE)
    import torch

    from cet_pick.models.networks.unet_small import get_tomo_unet_small

    torch.manual_seed(0)
    heads = {"hm": 1, "proj": 32}
    model = get_tomo_unet_small(4, heads, 32)
    # re-randomize every parameter at full scale (the reference init leaves
    # the task heads near zero — fill_fc_weights std=0.001 — which would make
    # the output comparison insensitive to upstream layers; see the simsiam
    # stride-2 padding bug that hid exactly this way) and randomize BN
    # running stats so statistics conversion is actually tested
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.05)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x))[0]
    state_dict = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return state_dict, x, {k: v.numpy() for k, v in out.items()}


def test_converted_outputs_match(torch_model_and_outputs):
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import torch_state_dict_to_flax
    from cet_pick_tpu.models.detector import create_detector

    state_dict, x, torch_out = torch_model_and_outputs
    cfg = Config(task="semi", arch="unet_4").finalize()
    model = create_detector(cfg)
    params, stats = torch_state_dict_to_flax(state_dict, 4, cfg.heads)

    # validate tree structure against a fresh init
    init = model.init(jax.random.PRNGKey(0), x, train=False)
    init_paths = {tuple(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    conv_paths = {tuple(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(
                      jax.tree_util.tree_map(np.asarray, params))[0]}
    assert init_paths == conv_paths

    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)

    # torch outputs are NC(D)HW; ours are (B, D, H, W, C)
    hm_t = torch_out["hm"][0].transpose(1, 2, 3, 0)      # (D, H, W, 1)
    proj_t = torch_out["proj"][0].transpose(1, 2, 3, 0)  # (D, H, W, 32)
    np.testing.assert_allclose(np.asarray(out["hm"][0]), hm_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["proj"][0]), proj_t, atol=2e-4)


def test_simsiam_conversion_matches():
    """Reference exploration encoder -> SimSiamEncoder output parity."""
    sys.path.insert(0, REFERENCE)
    import torch

    import jax

    from cet_pick.models.networks.simsiam_model_2d3d import (
        BasicBlock, TomoResClassifier2D3D,
    )

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import simsiam_state_dict_to_flax
    from cet_pick_tpu.models.simsiam import create_simsiam

    torch.manual_seed(0)
    heads = {"proj": 64, "pred": 64}
    tm = TomoResClassifier2D3D(BasicBlock, [2, 2, 2], heads, 64)
    # re-randomize EVERY parameter at full scale: the reference's own init
    # leaves fc/proj/pred weights at std=0.001 (fill_fc_weights), which made
    # proj/pred outputs numerically constant in their input — a conversion
    # test against that init is insensitive to the entire trunk (it masked a
    # real stride-2 padding mismatch until the export test caught it)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0, 0.05)
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    rng = np.random.default_rng(0)
    x2d = rng.standard_normal((2, 1, 24, 24)).astype(np.float32)
    x3d = rng.standard_normal((2, 1, 24, 24)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.forward_test(torch.from_numpy(x2d), torch.from_numpy(x3d))

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=64).finalize()
    model = create_simsiam(cfg)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = simsiam_state_dict_to_flax(sd)

    j2d = np.transpose(x2d, (0, 2, 3, 1))
    j3d = np.transpose(x3d, (0, 2, 3, 1))
    out = model.apply({"params": params, "batch_stats": stats},
                      j2d, j3d, method=model.forward_test)
    np.testing.assert_allclose(np.asarray(out["proj"]), t_out["proj"].numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["pred"]), t_out["pred"].numpy(),
                               atol=3e-4)


def test_flax_to_torch_roundtrip(torch_model_and_outputs):
    """flax -> torch export is the exact inverse of the import direction."""
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import (
        flax_to_torch_state_dict, torch_state_dict_to_flax,
    )

    state_dict, _, _ = torch_model_and_outputs
    cfg = Config(task="semi", arch="unet_4").finalize()
    params, stats = torch_state_dict_to_flax(state_dict, 4, cfg.heads)
    back = flax_to_torch_state_dict(params, stats, 4, cfg.heads)
    missing = set(state_dict) - set(back) - {
        k for k in state_dict if k.endswith("num_batches_tracked")
    }
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k, v in back.items():
        np.testing.assert_array_equal(v, state_dict[k], err_msg=k)


def test_exported_torch_model_matches_flax(torch_model_and_outputs):
    """A TPU-trained (here: random-init) flax model exported with
    flax_to_torch_state_dict reproduces identical outputs in the actual
    reference TomoConvUNet."""
    import torch

    import jax

    from cet_pick.models.networks.unet_small import get_tomo_unet_small

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import flax_to_torch_state_dict
    from cet_pick_tpu.models.detector import create_detector

    cfg = Config(task="semi", arch="unet_4").finalize()
    model = create_detector(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 32, 32)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    ours = model.apply({"params": params, "batch_stats": stats}, x,
                       train=False)

    sd = flax_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, stats), 4, cfg.heads)
    tm = get_tomo_unet_small(4, dict(cfg.heads), 32)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))[0]
    hm_t = t_out["hm"][0].numpy().transpose(1, 2, 3, 0)
    np.testing.assert_allclose(np.asarray(ours["hm"][0]), hm_t, atol=2e-4)


def _fake_torchvision_resnet18_sd(rng):
    """Randomized state_dict with torchvision resnet18's exact key names and
    shapes (no download needed; mirrors the file init_weights loads at
    simsiam_model_2d3d.py:807-838)."""
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.array(10, np.int64)

    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
    bn("bn1", 64)
    widths = [64, 64, 128, 256, 512]
    for stage in range(1, 5):
        cin, cout = widths[stage - 1], widths[stage]
        for b in range(2):
            pre = f"layer{stage}.{b}"
            c0 = cin if b == 0 else cout
            sd[f"{pre}.conv1.weight"] = rng.standard_normal(
                (cout, c0, 3, 3)).astype(np.float32)
            bn(f"{pre}.bn1", cout)
            sd[f"{pre}.conv2.weight"] = rng.standard_normal(
                (cout, cout, 3, 3)).astype(np.float32)
            bn(f"{pre}.bn2", cout)
            if b == 0 and cin != cout:
                sd[f"{pre}.downsample.0.weight"] = rng.standard_normal(
                    (cout, cin, 1, 1)).astype(np.float32)
                bn(f"{pre}.downsample.1", cout)
    sd["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


def test_imagenet_resnet18_partial_load(tmp_path):
    """A standard torchvision resnet18 .pth initializes the SimSiam trunk the
    way the reference's init_weights does (simsiam_model_2d3d.py:783-806):
    bn1 + layers1-3 loaded, conv1/heads keep fresh init (shape-gated)."""
    import torch

    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import load_simsiam_torch
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state

    rng = np.random.default_rng(7)
    sd = _fake_torchvision_resnet18_sd(rng)
    path = tmp_path / "resnet18.pth"
    torch.save({k: torch.from_numpy(np.atleast_1d(np.asarray(v)))
                for k, v in sd.items()}, str(path))

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=64, bbox=24).finalize()
    model = create_simsiam(cfg)
    x = np.random.default_rng(0).standard_normal((2, 2, 24, 24)).astype(
        np.float32)
    state = create_simsiam_state(
        model, cfg, jax.random.PRNGKey(0), {"anchor": x})
    fresh = jax.tree_util.tree_map(np.asarray, state.params)

    state = load_simsiam_torch(str(path), state, log_fn=lambda *_: None)

    trunk = state.params["trunk"]
    # loaded: bn1 + all layer1-3 tensors (transposed conv layout)
    np.testing.assert_array_equal(trunk["bn1"]["scale"], sd["bn1.weight"])
    np.testing.assert_array_equal(
        trunk["layer1_0"]["conv1"]["kernel"],
        np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        trunk["layer2_0"]["downsample_conv"]["kernel"],
        np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        state.batch_stats["trunk"]["layer3_1"]["bn2"]["mean"],
        sd["layer3.1.bn2.running_mean"])
    # skipped by shape gate: conv1 (k7s2 RGB-collapse vs k3s1 trunk stem)
    np.testing.assert_array_equal(trunk["conv1"]["kernel"],
                                  fresh["trunk"]["conv1"]["kernel"])
    # untouched: SimSiam heads keep fresh init
    np.testing.assert_array_equal(state.params["proj"]["fc1"]["kernel"],
                                  fresh["proj"]["fc1"]["kernel"])


def test_moco_wrapper_checkpoint_loads_query_encoder(tmp_path):
    """A reference MoCo checkpoint (the whole MoCo wrapper, keys
    encoder_q.*/encoder_k.* — moco.py:19-20) loads its query encoder, and
    heads absent from the checkpoint keep their fresh init."""
    sys.path.insert(0, REFERENCE)
    import torch

    import jax

    from cet_pick.models.networks.simsiam_model_2d3d import (
        BasicBlock, TomoResClassifier2D3D,
    )

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import load_simsiam_torch
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state

    torch.manual_seed(0)
    enc = TomoResClassifier2D3D(BasicBlock, [2, 2, 2], {"proj": 64}, 64)
    sd = {f"encoder_q.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"encoder_k.{k}": torch.zeros_like(v)
               for k, v in enc.state_dict().items()})
    path = tmp_path / "model_last_contrastive.pth"
    torch.save({"state_dict": sd, "epoch": 3}, str(path))

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=64, bbox=24).finalize()
    model = create_simsiam(cfg)
    x = np.random.default_rng(0).standard_normal((2, 2, 24, 24)).astype(
        np.float32)
    state = create_simsiam_state(
        model, cfg, jax.random.PRNGKey(0), {"anchor": x})
    fresh_pred = np.asarray(state.params["pred"]["fc1"]["kernel"])

    state = load_simsiam_torch(str(path), state, log_fn=lambda *_: None)
    np.testing.assert_array_equal(
        state.params["trunk"]["conv1"]["kernel"],
        np.transpose(enc.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0)))
    # proj head converted from the Sequential indices
    np.testing.assert_array_equal(
        state.params["proj"]["fc0"]["kernel"],
        enc.state_dict()["proj.0.weight"].numpy().T)
    # pred head was not in the checkpoint: fresh init preserved
    np.testing.assert_array_equal(state.params["pred"]["fc1"]["kernel"],
                                  fresh_pred)


def test_simsiam_export_matches_reference_model():
    """A TPU-trained (here: random-init) SimSiamEncoder exported with
    simsiam_flax_to_torch_state_dict reproduces identical outputs in the
    actual reference TomoResClassifier2D3D (the simsiam_test_hm_*.py load
    surface)."""
    sys.path.insert(0, REFERENCE)
    import torch

    import jax

    from cet_pick.models.networks.simsiam_model_2d3d import (
        BasicBlock, TomoResClassifier2D3D,
    )

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import simsiam_flax_to_torch_state_dict
    from cet_pick_tpu.models.simsiam import create_simsiam

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=64).finalize()
    model = create_simsiam(cfg)
    rng = np.random.default_rng(5)
    j2d = rng.standard_normal((2, 24, 24, 1)).astype(np.float32)
    j3d = rng.standard_normal((2, 24, 24, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(4), j2d, j3d, j2d, j3d,
                           train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    # randomize BN stats so the statistics mapping is actually tested
    stats = jax.tree_util.tree_map(
        lambda v: v + rng.normal(0, 0.05, v.shape).astype(v.dtype), stats)
    ours = model.apply({"params": params, "batch_stats": stats},
                       j2d, j3d, method=model.forward_test)

    sd = simsiam_flax_to_torch_state_dict(params, stats)
    tm = TomoResClassifier2D3D(BasicBlock, [2, 2, 2],
                               {"proj": 64, "pred": 64}, 64)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    tm.eval()
    x2d = torch.from_numpy(np.transpose(j2d, (0, 3, 1, 2)))
    x3d = torch.from_numpy(np.transpose(j3d, (0, 3, 1, 2)))
    with torch.no_grad():
        t_out = tm.forward_test(x2d, x3d)
    np.testing.assert_allclose(np.asarray(ours["proj"]),
                               t_out["proj"].numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(ours["pred"]),
                               t_out["pred"].numpy(), atol=3e-4)


def test_simsiam_export_import_roundtrip():
    """simsiam_flax_to_torch_state_dict is the exact inverse of
    simsiam_state_dict_to_flax (bitwise, both directions)."""
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import (
        simsiam_flax_to_torch_state_dict, simsiam_state_dict_to_flax,
    )
    from cet_pick_tpu.models.simsiam import create_simsiam

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=48).finalize()
    model = create_simsiam(cfg)
    x = np.zeros((1, 20, 20, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(9), x, x, x, x, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = simsiam_flax_to_torch_state_dict(params, stats)
    params2, stats2 = simsiam_state_dict_to_flax(sd)
    for tree_a, tree_b in ((params, params2), (stats, stats2)):
        flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
        flat_b = jax.tree_util.tree_leaves_with_path(tree_b)
        assert len(flat_a) == len(flat_b)
        for (pa, la), (pb, lb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=str(pa))


# -- res3d (semi3d) family ---------------------------------------------------
# Reference arch res3d_N (resnet_3d_small.py TomoRes3DNet) <-> TomoRes3DRefNet
# (VERDICT r3 item 2: semi3d checkpoint migration both ways).


@pytest.fixture(scope="module")
def torch_res3d_and_outputs():
    sys.path.insert(0, REFERENCE)
    import torch

    from cet_pick.models.networks.resnet_3d_small import get_tomo_net_3d

    torch.manual_seed(1)
    heads = {"hm": 1, "proj": 16}
    model = get_tomo_net_3d(18, heads, 16)
    # full-scale re-randomization (keep goldens sensitive — the simsiam
    # near-zero-head lesson)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.05)
    model.eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x))[0]
    state_dict = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return state_dict, x, {k: v.numpy() for k, v in out.items()}


def test_res3d_import_outputs_match(torch_res3d_and_outputs):
    from cet_pick_tpu.models.convert import res3d_state_dict_to_flax
    from cet_pick_tpu.models.detector3d_ref import TomoRes3DRefNet

    state_dict, x, torch_out = torch_res3d_and_outputs
    heads = {"hm": 1, "proj": 16}
    params, stats = res3d_state_dict_to_flax(state_dict, heads)
    model = TomoRes3DRefNet(heads=heads)
    out = model.apply({"params": params}, x, train=False)
    for head in heads:
        # torch NCDHW -> NDHWC
        expect = np.transpose(torch_out[head], (0, 2, 3, 4, 1))
        got = np.asarray(out[head])
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, atol=2e-5, rtol=1e-4)


def test_res3d_export_roundtrip(torch_res3d_and_outputs):
    """flax -> torch export: a freshly initialized (full-scale random)
    TomoRes3DRefNet exported to the reference state_dict produces identical
    outputs in the actual reference model."""
    sys.path.insert(0, REFERENCE)
    import jax
    import torch

    from cet_pick.models.networks.resnet_3d_small import get_tomo_net_3d

    from cet_pick_tpu.models.convert import res3d_flax_to_torch_state_dict
    from cet_pick_tpu.models.detector3d_ref import TomoRes3DRefNet

    heads = {"hm": 1, "proj": 16}
    model = TomoRes3DRefNet(heads=heads)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    # full-scale re-randomization of every leaf
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(4), len(leaves))
    leaves = [0.05 * jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    flax_out = model.apply({"params": params}, x, train=False)

    sd = res3d_flax_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, params), heads
    )
    tmodel = get_tomo_net_3d(18, heads, 16)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    tmodel.eval()
    with torch.no_grad():
        torch_out = tmodel(torch.from_numpy(x))[0]
    for head in heads:
        expect = np.asarray(flax_out[head])
        got = np.transpose(torch_out[head].numpy(), (0, 2, 3, 4, 1))
        np.testing.assert_allclose(got, expect, atol=2e-5, rtol=1e-4)


def test_res3d_import_export_cli_roundtrip(torch_res3d_and_outputs, tmp_path):
    """import-torch (reference res3d .pth -> framework ckpt dir) then
    export-torch back to .pth: every tensor survives bit-exactly."""
    import torch

    from cet_pick_tpu.__main__ import main

    state_dict, _, _ = torch_res3d_and_outputs
    pth = tmp_path / "ref_res3d.pth"
    torch.save({"epoch": 7, "state_dict": {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state_dict.items()
    }}, pth)
    ckpt_dir = tmp_path / "imported"
    main(["import-torch", "--task", "semi3d", "--arch", "res3dref_18",
          "--head_conv", "16", "--load_model", str(pth),
          "--out", str(ckpt_dir), "--root_dir", str(tmp_path)])
    assert (ckpt_dir / "state.msgpack").exists()
    out_pth = tmp_path / "back.pth"
    main(["export-torch", "--load_model", str(ckpt_dir), "--out",
          str(out_pth)])
    back = torch.load(out_pth, map_location="cpu")["state_dict"]
    assert set(back) == set(state_dict)
    for k in state_dict:
        np.testing.assert_array_equal(back[k].numpy(), state_dict[k])


def test_res3dref_detector_infers(torch_res3d_and_outputs, tmp_path):
    """A migrated res3dref checkpoint picks through TomoDetector: whole
    volume, z decoded at D/2 and rescaled back to input resolution."""
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.models.convert import res3d_state_dict_to_flax

    state_dict, _, _ = torch_res3d_and_outputs
    cfg = Config(task="semi3d", arch="res3dref_18", head_conv=16, K=64,
                 out_thresh=-1.0, cutoff_z=0, root_dir=str(tmp_path)).finalize()
    params, stats = res3d_state_dict_to_flax(state_dict, cfg.heads)
    # the fixture's full-scale weights drive every logit past the sigmoid
    # clamp (all scores 0.9999 -> top-k tie-breaks onto the z=0 plane);
    # shrink the hm head so scores vary and picks spread across z
    import jax
    params = dict(params)
    params["hm"] = jax.tree_util.tree_map(lambda a: a * 0.02, params["hm"])
    det = TomoDetector(cfg, params=params, batch_stats=stats)
    vol = np.random.default_rng(5).standard_normal((16, 96, 96)).astype(np.float32)
    res = det.run(vol, name="syn", out_dir=str(tmp_path / "out"))
    assert res["hm"].shape == (8, 48, 48)  # z at D/2 like the reference
    zs = np.array([r[2] for rows in res["z_groups"].values() for r in rows])
    assert zs.size and zs.max() < 16 and np.all(zs == np.round(zs))
    # written coordinate file exists in the frozen x\tz\ty format and the
    # deliberate deviation from the reference holds: z is written at INPUT
    # resolution (z*2 vs the reference's heatmap-space z, tomo_det.py:44),
    # so the writer's z filter must not clip the upper half of the volume
    out = np.loadtxt(tmp_path / "out" / "syn.txt", ndmin=2)  # x z y
    assert out.size, "every pick was filtered out"
    assert out[:, 1].max() > 8, (
        "upper-half-z picks were dropped by a heatmap-depth z bound"
    )
    assert out[:, 1].max() < 16


def _randomize_torch(model, seed=7):
    """Full-scale re-randomization of every parameter AND BatchNorm running
    stat (keep goldens sensitive — the fill_fc_weights std=0.001 lesson)."""
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.05)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def torch_simsiam_ref3d():
    """The ACTUAL reference 3D-subvolume SimSiam encoder (TomoResClassifier,
    simsiam_model.py:159 — reference arches ``simsiam``/``simsiam3d``) at
    full-scale random weights. Instantiated directly: get_simsiam_net_small's
    init_weights hard-requires a pretrained-resnet file."""
    sys.path.insert(0, REFERENCE)
    from cet_pick.models.networks.simsiam_model import (
        BasicBlock, TomoResClassifier,
    )

    heads = {"proj": 256, "pred": 256}
    return _randomize_torch(
        TomoResClassifier(BasicBlock, [2, 2, 2, 2], heads, head_conv=0),
        seed=7,
    )


@pytest.fixture(scope="module")
def torch_moco_ref3d():
    """The ACTUAL reference moco3d subvolume encoder (TomoResClassifier3D,
    moco_encoder_3d.py:156) at full-scale random weights (direct
    instantiation — get_moco_net_small_3d loads a hard-coded hpc path)."""
    sys.path.insert(0, REFERENCE)
    from cet_pick.models.networks.moco_encoder_3d import (
        BasicBlock, TomoResClassifier3D,
    )

    heads = {"proj": 128}
    return _randomize_torch(
        TomoResClassifier3D(BasicBlock, [2, 2, 2, 2], heads, head_conv=0),
        seed=8,
    )


def _ref_vol_cfg(arch, tmp=None):
    from cet_pick_tpu.config import Config

    kw = dict(task="simsiam", arch=arch, vol_size=(8, 32, 32))
    if tmp is not None:
        kw["root_dir"] = str(tmp)
    return Config(**kw).finalize()


def test_simsiam_ref3d_import_outputs_match(torch_simsiam_ref3d):
    """Reference simsiam (3D-subvolume, slice trunk) .pth -> arch
    simsiamref_18: identical proj/pred on identical subvolumes."""
    import torch

    from cet_pick_tpu.models.convert import simsiam_ref3d_state_dict_to_flax
    from cet_pick_tpu.models.simsiam import create_simsiam

    tm = torch_simsiam_ref3d
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.forward_test(torch.from_numpy(x))

    cfg = _ref_vol_cfg("simsiamref_18")
    model = create_simsiam(cfg)
    assert model.mode == "vol" and model.trunk_kind == "ref2d"
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = simsiam_ref3d_state_dict_to_flax(sd)
    out = model.apply({"params": params, "batch_stats": stats},
                      x[..., None], None, method=model.forward_test)
    np.testing.assert_allclose(np.asarray(out["proj"]),
                               t_out["proj"].numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               t_out["pred"].numpy(), atol=3e-4)


def test_moco_ref3d_import_outputs_match(torch_moco_ref3d):
    """Reference moco3d (Conv3d subvolume) .pth -> arch moco3dref_18:
    identical proj embeddings."""
    import torch

    from cet_pick_tpu.models.convert import moco_ref3d_state_dict_to_flax
    from cet_pick_tpu.models.simsiam import create_simsiam

    tm = torch_moco_ref3d
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.forward_test(torch.from_numpy(x[:, None]))

    cfg = _ref_vol_cfg("moco3dref_18")
    model = create_simsiam(cfg)
    assert model.mode == "vol" and model.trunk_kind == "ref3d"
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = moco_ref3d_state_dict_to_flax(sd)
    # the reference encoder has no pred head; graft a fresh one so the
    # apply tree is complete (load_simsiam_torch does the same)
    import jax

    fresh = model.init(jax.random.PRNGKey(0), x[..., None], None,
                       method=model.forward_test)
    params["pred"] = fresh["params"]["pred"]
    stats["pred"] = fresh["batch_stats"]["pred"]
    out = model.apply({"params": params, "batch_stats": stats},
                      x[..., None], None, method=model.forward_test)
    np.testing.assert_allclose(np.asarray(out["proj"]),
                               t_out["proj"].numpy(), atol=3e-4)


def test_simsiam_ref3d_export_roundtrip(torch_simsiam_ref3d):
    """Import then export: every reference tensor survives bit-exactly."""
    from cet_pick_tpu.models.convert import (
        simsiam_ref3d_flax_to_torch_state_dict,
        simsiam_ref3d_state_dict_to_flax,
    )

    sd = {k: v.numpy() for k, v in torch_simsiam_ref3d.state_dict().items()}
    params, stats = simsiam_ref3d_state_dict_to_flax(sd)
    back = simsiam_ref3d_flax_to_torch_state_dict(params, stats)
    want = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(back) == want
    for k in back:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_moco_ref3d_export_matches_torch(torch_moco_ref3d):
    """flax -> torch export: a full-scale-random moco3dref encoder exported
    to the reference state_dict produces identical proj in the actual
    reference TomoResClassifier3D."""
    import jax
    import torch

    from cet_pick_tpu.models.convert import moco_ref3d_flax_to_torch_state_dict
    from cet_pick_tpu.models.simsiam import create_simsiam

    cfg = _ref_vol_cfg("moco3dref_18")
    model = create_simsiam(cfg)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 32, 32, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), x, None,
                           method=model.forward_test)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [0.05 * jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    stats = variables["batch_stats"]
    ours = model.apply({"params": params, "batch_stats": stats}, x, None,
                       method=model.forward_test)

    sd = moco_ref3d_flax_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, stats))
    tm = torch_moco_ref3d
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    tm.eval()
    with torch.no_grad():
        t_out = tm.forward_test(torch.from_numpy(
            np.transpose(x, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(np.asarray(ours["proj"]),
                               t_out["proj"].numpy(), atol=3e-4)


def test_vol_ref_import_torch_cli_and_embed(torch_simsiam_ref3d, tmp_path):
    """import-torch persists a reference 3D-subvolume simsiam .pth as a
    framework checkpoint, and embed-style extraction runs from it (the
    migrated-ckpt embed smoke: a reference --task simsiam user continues
    mid-workflow here)."""
    import torch

    from cet_pick_tpu.__main__ import main
    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.infer.embed import extract_embeddings
    from cet_pick_tpu.train.state import load_checkpoint

    pth = tmp_path / "ref_simsiam_vol.pth"
    torch.save({"epoch": 5, "state_dict": torch_simsiam_ref3d.state_dict()},
               pth)
    ckpt_dir = tmp_path / "imported"
    main(["import-torch", "--task", "simsiam", "--arch", "simsiamref_18",
          "--vol_size", "8", "32", "32", "--load_model", str(pth),
          "--out", str(ckpt_dir), "--root_dir", str(tmp_path)])
    assert (ckpt_dir / "state.msgpack").exists()

    # embed from the migrated checkpoint on a synthetic tomogram
    import jax

    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, dummy_explore_batch,
    )

    cfg = Config(task="simsiam", arch="simsiamref_18", vol_size=(8, 32, 32),
                 batch_size=4, root_dir=str(tmp_path)).finalize()
    model = create_simsiam(cfg)
    state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0),
                                 dummy_explore_batch(cfg, model.mode))
    state = load_checkpoint(str(ckpt_dir), state)
    rng = np.random.default_rng(11)
    rec = rng.standard_normal((24, 64, 64)).astype(np.float32) * 0.3
    rec[8:14, 28:36, 28:36] -= 4.0
    ds = ExploreDataset(cfg, "test", images={"syn": rec})
    assert len(ds) > 0
    res = extract_embeddings(cfg, ds, state.params, state.batch_stats,
                             batch_size=4)
    assert res["proj"].shape[1] == 256  # reference's pinned head width
    assert np.all(np.isfinite(res["proj"]))


def test_vol_ref_arch_mismatch_raises(torch_simsiam_ref3d, tmp_path):
    """Loading a reference subvolume .pth under the WRONG arch fails loudly
    with the migration-arch hint instead of silently grafting."""
    import jax
    import torch

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import load_simsiam_torch
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, dummy_explore_batch,
    )

    pth = tmp_path / "ref_simsiam_vol.pth"
    torch.save({"epoch": 5, "state_dict": torch_simsiam_ref3d.state_dict()},
               pth)
    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=32, bbox=16).finalize()
    model = create_simsiam(cfg)
    state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0),
                                 dummy_explore_batch(cfg, model.mode))
    with pytest.raises(ValueError, match="simsiamref"):
        load_simsiam_torch(str(pth), state, log_fn=lambda *_: None)


def test_scan_clustering_model_pth_imports_backbone(tmp_path, rng):
    """A reference SCAN ClusteringModel checkpoint (backbone.* +
    cluster_head.*) imports its SimSiam backbone through load_simsiam_torch
    (and hence `import-torch` / every exploration --load_model path) — the
    pretext handoff a reference SCAN user needs to continue here."""
    import jax
    import torch

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.convert import (
        load_simsiam_torch, simsiam_flax_to_torch_state_dict,
    )
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import (
        create_simsiam_state, dummy_explore_batch,
    )

    cfg = Config(task="simsiam2d3d", arch="simsiam2d3d_18",
                 head_conv=32, bbox=16).finalize()
    model = create_simsiam(cfg)
    state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0),
                                 dummy_explore_batch(cfg, model.mode))
    # synthesize the reference layout from a full-scale-random flax state
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [0.05 * jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    sd = simsiam_flax_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, state.batch_stats))
    pth = tmp_path / "scan_model.pth"
    torch.save({"epoch": 3, "state_dict": {
        **{"backbone." + k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()},
        "cluster_head.0.weight": torch.zeros(3, 32),
        "cluster_head.0.bias": torch.zeros(3),
    }}, pth)

    loaded = load_simsiam_torch(str(pth), state, log_fn=lambda *_: None)
    got = np.asarray(loaded.params["trunk"]["conv1"]["kernel"])
    want = np.asarray(params["trunk"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
