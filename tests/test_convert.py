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
    # randomize BN running stats so statistics conversion is actually tested
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
