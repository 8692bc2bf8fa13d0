"""PyTorch reference checkpoint -> flax parameter conversion.

Loads a trained reference refinement checkpoint (``TomoConvUNet``,
cet_pick/models/networks/unet_small.py:30-113, saved by models/model.py:283-296
as ``{'epoch', 'state_dict', 'optimizer'}``) into this framework's
``TomoPickNet`` — numerically exact (same convs, same normalization
statistics, explicit-padding stem), so users can migrate existing trained
models without retraining.

Layout rules:
  Conv2d  (out, in, kh, kw)        -> (kh, kw, in, out)
  Conv3d  (out, in, kd, kh, kw)    -> (kd, kh, kw, in, out)
  ConvTranspose2d (in, out, kh, kw)-> transpose to (kh, kw, in, out) then
                                      flip both spatial axes (flax
                                      ConvTranspose convention; verified
                                      numerically)
  BatchNorm weight/bias            -> params scale/bias
  BatchNorm running_mean/var       -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv2d(w):
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def torch_state_dict_to_flax(state_dict: Dict, n_blocks: int, heads: Dict):
    """Reference TomoConvUNet state_dict -> (params, batch_stats) dicts."""
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst):
        _set(params, dst + ("scale",), sd[src + ".weight"])
        _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    def conv(src, dst, fn=_conv2d, bias=True):
        _set(params, dst + ("kernel",), fn(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    # stem (unet_small.py:35-37)
    conv("conv1", ("stem",), bias=False)
    bn("bn1", ("stem_bn",))

    # UNet encoder (unet.py DownConv i: conv1/norm0, conv2/norm1)
    for i in range(n_blocks):
        base = f"unet.down_convs.{i}"
        blk = ("unet", f"down{i}")
        conv(base + ".conv1", blk + ("ConvNormAct_0", "Conv_0"))
        bn(base + ".norm0", blk + ("ConvNormAct_0", "BatchNorm_0"))
        conv(base + ".conv2", blk + ("ConvNormAct_1", "Conv_0"))
        bn(base + ".norm1", blk + ("ConvNormAct_1", "BatchNorm_0"))

    # UNet decoder (UpConv i: upconv/norm0, conv1/norm1, conv2/norm2)
    for i in range(n_blocks - 1):
        base = f"unet.up_convs.{i}"
        blk = ("unet", f"up{i}")
        conv(base + ".upconv", blk + ("ConvTranspose_0",), fn=_deconv2d)
        bn(base + ".norm0", blk + ("BatchNorm_0",))
        conv(base + ".conv1", blk + ("ConvNormAct_0", "Conv_0"))
        bn(base + ".norm1", blk + ("ConvNormAct_0", "BatchNorm_0"))
        conv(base + ".conv2", blk + ("ConvNormAct_1", "Conv_0"))
        bn(base + ".norm2", blk + ("ConvNormAct_1", "BatchNorm_0"))

    conv("unet.conv_final", ("unet", "final"))

    # dilated 3D feature head (unet_small.py:39-49): Sequential indices 0, 2
    conv("feature_head.0", ("feature_head", "conv0"), fn=_conv3d, bias=False)
    conv("feature_head.2", ("feature_head", "conv1"), fn=_conv3d, bias=False)

    # per-task heads (k(3,1,1) Conv3d, bias-free)
    for head in heads:
        conv(head, (head,), fn=_conv3d, bias=False)
    return params, stats


def _linear(w):
    return np.transpose(w, (1, 0))


def simsiam_state_dict_to_flax(state_dict: Dict, stage_sizes=(2, 2, 2)):
    """Reference TomoResClassifier2D3D / 2D state_dict -> (params, batch_stats)
    for models/simsiam.SimSiamEncoder (simsiam_model_2d3d.py:560-892).

    Trunk: conv1/bn1 + layer{1..3}.{b} BasicBlocks; heads: fc, proj
    (3-layer MLP, final affine-free BN), pred (2-layer MLP).
    """
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst, affine=True):
        if affine:
            _set(params, dst + ("scale",), sd[src + ".weight"])
            _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    def conv(src, dst):
        _set(params, dst + ("kernel",), _conv2d(sd[src + ".weight"]))

    def dense(src, dst, bias=True):
        _set(params, dst + ("kernel",), _linear(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    _walk_resnet_trunk(sd, stage_sizes, conv, bn)

    if "fc.weight" in sd:
        dense("fc", ("fc",))
    # proj Sequential indices 0,1 / 3,4 / 6,7 (simsiam_model_2d3d.py:590-598)
    if "proj.0.weight" in sd:
        dense("proj.0", ("proj", "fc0"), bias=False)
        bn("proj.1", ("proj", "bn0"))
        dense("proj.3", ("proj", "fc1"), bias=False)
        bn("proj.4", ("proj", "bn1"))
        dense("proj.6", ("proj", "fc2"), bias=False)
        bn("proj.7", ("proj", "bn2"), affine=False)
    # pred Sequential indices 0,1 / 3 (:600-605); MoCo encoders may omit it
    if "pred.0.weight" in sd:
        dense("pred.0", ("pred", "fc0"), bias=False)
        bn("pred.1", ("pred", "bn0"))
        dense("pred.3", ("pred", "fc1"))
    return params, stats


def _head_mlps_to_flax(sd, dense, bn):
    """proj (Sequential 0,1/3,4/6,7 — final BN affine-free) and optional
    pred (0,1/3) head conversion, shared by every SimSiam/MoCo family
    (simsiam_model_2d3d.py:590-605 == simsiam_model.py:196-210 ==
    moco_encoder_3d.py:227-243 modulo dims)."""
    if "fc.weight" in sd:
        dense("fc", ("fc",))
    if "proj.0.weight" in sd:
        dense("proj.0", ("proj", "fc0"), bias=False)
        bn("proj.1", ("proj", "bn0"))
        dense("proj.3", ("proj", "fc1"), bias=False)
        bn("proj.4", ("proj", "bn1"))
        dense("proj.6", ("proj", "fc2"), bias=False)
        bn("proj.7", ("proj", "bn2"), affine=False)
    if "pred.0.weight" in sd:
        dense("pred.0", ("pred", "fc0"), bias=False)
        bn("pred.1", ("pred", "bn0"))
        dense("pred.3", ("pred", "fc1"))


def simsiam_ref3d_state_dict_to_flax(state_dict: Dict):
    """Reference ``simsiam``/``simsiam3d`` 3D-subvolume encoder
    (TomoResClassifier, simsiam_model.py:159-366) state_dict ->
    (params, batch_stats) for SimSiamEncoder(trunk_kind='ref2d') — arch
    ``simsiamref_18``. Trunk: k7s2 conv1/bn1 + maxpool + layer{1..3}
    BasicBlocks with CONV-ONLY downsamples (:256-263), then the Conv3d
    ``feature_3d`` aggregation (:182-185); heads: fc(256), proj/pred(256)."""
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst, affine=True):
        if affine:
            _set(params, dst + ("scale",), sd[src + ".weight"])
            _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    def conv(src, dst, fn=_conv2d):
        _set(params, dst + ("kernel",), fn(sd[src + ".weight"]))

    def dense(src, dst, bias=True):
        _set(params, dst + ("kernel",), _linear(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn1"))
    for stage in range(3):
        for b in range(2):
            src = f"layer{stage + 1}.{b}"
            dst = ("trunk", f"layer{stage + 1}_{b}")
            conv(src + ".conv1", dst + ("conv1",))
            bn(src + ".bn1", dst + ("bn1",))
            conv(src + ".conv2", dst + ("conv2",))
            bn(src + ".bn2", dst + ("bn2",))
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ("downsample_conv",))
    conv("feature_3d.0", ("trunk", "f3d_conv"), fn=_conv3d)
    bn("feature_3d.1", ("trunk", "f3d_bn"))
    _head_mlps_to_flax(sd, dense, bn)
    return params, stats


def moco_ref3d_state_dict_to_flax(state_dict: Dict):
    """Reference ``moco3d`` 3D-subvolume encoder (TomoResClassifier3D,
    moco_encoder_3d.py:156-420) state_dict -> (params, batch_stats) for
    SimSiamEncoder(trunk_kind='ref3d') — arch ``moco3dref_18``. Trunk:
    Conv3d k7s2 conv1/bn1 + maxpool3d + BN-LESS BasicBlocks (:55-84) with
    conv-only downsamples, Conv3d feature_3d; heads: fc(128), proj(128)."""
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst, affine=True):
        if affine:
            _set(params, dst + ("scale",), sd[src + ".weight"])
            _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    def conv(src, dst):
        _set(params, dst + ("kernel",), _conv3d(sd[src + ".weight"]))

    def dense(src, dst, bias=True):
        _set(params, dst + ("kernel",), _linear(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn1"))
    for stage in range(3):
        for b in range(2):
            src = f"layer{stage + 1}.{b}"
            dst = ("trunk", f"layer{stage + 1}_{b}")
            conv(src + ".conv1", dst + ("conv1",))
            conv(src + ".conv2", dst + ("conv2",))
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ("downsample_conv",))
    conv("feature_3d.0", ("trunk", "f3d_conv"))
    bn("feature_3d.1", ("trunk", "f3d_bn"))
    _head_mlps_to_flax(sd, dense, bn)
    return params, stats


def _walk_resnet_trunk(sd, stage_sizes, conv, bn):
    """Shared trunk traversal: conv1/bn1 + layer{s}.{b} BasicBlocks with
    optional downsamples, mapped onto SimSiam ``ResNetTrunk`` module names.
    ``conv(src, dst_path)`` / ``bn(src, dst_path)`` define the leaf writes
    (full-load vs shape-gated partial load)."""
    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn1"))
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            src = f"layer{stage + 1}.{b}"
            dst = ("trunk", f"layer{stage + 1}_{b}")
            conv(src + ".conv1", dst + ("conv1",))
            bn(src + ".bn1", dst + ("bn1",))
            conv(src + ".conv2", dst + ("conv2",))
            bn(src + ".bn2", dst + ("bn2",))
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ("downsample_conv",))
                bn(src + ".downsample.1", dst + ("downsample_bn",))


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def imagenet_resnet_to_flax(state_dict, params, batch_stats,
                            stage_sizes=(2, 2, 2), log_fn=print):
    """Merge a STANDARD torchvision resnet18/34 state_dict into freshly
    initialized SimSiam trunk parameters, reproducing the reference's
    from-pretrained recipe (simsiam_model_2d3d.py:785-838):

    * conv1 is collapsed RGB->1 by summing over the input-channel dim
      (:787-789) — and then, like every tensor, kept only if the shape
      matches; torchvision's k7s2 conv1 vs this trunk's k3s1 mismatches, so
      conv1 keeps its fresh init exactly as the reference's partial load
      does ("Skip loading parameter conv1.weight ...", :797-801);
    * bn1 and layer1-3 BasicBlocks (convs, bns, downsamples) are loaded;
    * layer4 / fc / every head (fc, proj, pred) keep the fresh init.

    Returns (params, batch_stats) with the matched trunk leaves replaced.
    """
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    if "conv1.weight" in sd and sd["conv1.weight"].shape[1] == 3:
        sd["conv1.weight"] = sd["conv1.weight"].sum(axis=1, keepdims=True)

    params = _to_mutable(params)
    stats = _to_mutable(batch_stats)
    loaded, skipped = [], []

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        cur = node[path[-1]]
        if np.shape(cur) != np.shape(value):
            skipped.append("/".join(path))
            return
        node[path[-1]] = np.asarray(value)
        loaded.append("/".join(path))

    def conv(src, dst):
        if src + ".weight" in sd:
            put(params, dst + ("kernel",), _conv2d(sd[src + ".weight"]))

    def bn(src, dst):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    _walk_resnet_trunk(sd, stage_sizes, conv, bn)
    log_fn(f"imagenet init: loaded {len(loaded)} trunk tensors, "
           f"kept fresh init for {skipped or 'none'} (shape mismatch, "
           f"reference-compatible partial load)")
    return params, stats


def load_simsiam_torch(path, state, log_fn=print):
    """Load a torch ``.pth`` into a SimSiam/MoCo TrainState: a trained
    reference exploration checkpoint (has proj./pred. heads) converts fully;
    a reference MoCo checkpoint (the MoCo wrapper, moco.py:19-20) converts
    its ``encoder_q.*`` query encoder; a standard torchvision resnet18
    becomes an ImageNet trunk init (partial load)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    raw = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in raw.items() if hasattr(v, "numpy")}
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    if any(k.startswith("encoder_q.") for k in sd):
        # reference MoCo wrapper: take the query encoder (moco_main.py saves
        # the whole MoCo module; encoder_k is its EMA copy)
        sd = {k[len("encoder_q."):]: v for k, v in sd.items()
              if k.startswith("encoder_q.")}
    elif any(k.startswith("backbone.") for k in sd):
        # reference SCAN ClusteringModel (simsiam_model_2d3d.py:847-877):
        # take the SimSiam backbone; the linear cluster_head.{i} layers are
        # retrained by the scan stage here (their best-head selection is a
        # training-time concern, trains/tomo_scan_trainer.py)
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
    if any(k.startswith("proj.") for k in sd):
        # family detection: the 3D-subvolume encoders both carry the Conv3d
        # feature_3d aggregation; a 5-D conv1 is the Conv3d trunk (moco3d),
        # a 4-D one the slice trunk (simsiam/simsiam3d). Patch encoders
        # (2d/2d3d) have no feature_3d.
        if "feature_3d.0.weight" in sd:
            if np.ndim(sd["conv1.weight"]) == 5:
                family, convert = "moco3dref", moco_ref3d_state_dict_to_flax
            else:
                family, convert = "simsiamref", simsiam_ref3d_state_dict_to_flax
        else:
            family, convert = "simsiam2d/2d3d", simsiam_state_dict_to_flax
        params, stats = convert(sd)
        want = np.shape(_get(state.params, ("trunk", "conv1", "kernel")))
        got = np.shape(params["trunk"]["conv1"]["kernel"])
        if want != got:
            raise ValueError(
                f"checkpoint is a reference {family} encoder (trunk conv1 "
                f"{got}) but the model was built with an incompatible arch "
                f"(conv1 {want}); pass the matching migration arch (e.g. "
                f"--arch {family.split('/')[0]}_18)"
            )
        # heads absent from the checkpoint (e.g. pred in a MoCo encoder)
        # keep their fresh init so the model's parameter tree stays complete
        for tree, fresh in ((params, _to_mutable(state.params)),
                            (stats, _to_mutable(state.batch_stats))):
            for key, sub in fresh.items():
                tree.setdefault(key, sub)
    else:
        params, stats = imagenet_resnet_to_flax(
            sd, state.params, state.batch_stats, log_fn=log_fn
        )
    return state.replace(params=params, batch_stats=stats)


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


def flax_to_torch_state_dict(params, batch_stats, n_blocks: int, heads):
    """Inverse of ``torch_state_dict_to_flax``: export a trained TomoPickNet
    to a reference-compatible ``TomoConvUNet`` state_dict.

    Lets users take a model trained on TPU back into the reference's torch
    pipeline (test.py etc.); also powers the measured-baseline comparison
    (benchmarks/reference_compare.py) where both frameworks run identical
    weights. Layout rules are the exact inverses of the header table.
    """
    sd: Dict = {}

    def bn(dst, src):
        sd[dst + ".weight"] = _get(params, src + ("scale",))
        sd[dst + ".bias"] = _get(params, src + ("bias",))
        sd[dst + ".running_mean"] = _get(batch_stats, src + ("mean",))
        sd[dst + ".running_var"] = _get(batch_stats, src + ("var",))

    def conv2d(dst, src, bias=True):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (3, 2, 0, 1))
        _maybe_bias(dst, src, bias)

    def conv3d(dst, src, bias=True):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (4, 3, 0, 1, 2))
        _maybe_bias(dst, src, bias)

    def deconv2d(dst, src, bias=True):
        w = _get(params, src + ("kernel",))[::-1, ::-1]
        sd[dst + ".weight"] = np.transpose(w, (2, 3, 0, 1))
        _maybe_bias(dst, src, bias)

    def _maybe_bias(dst, src, bias):
        node = params
        try:
            for k in src:
                node = node[k]
            if bias and "bias" in node:
                sd[dst + ".bias"] = np.asarray(node["bias"])
        except (KeyError, TypeError):
            pass

    conv2d("conv1", ("stem",), bias=False)
    bn("bn1", ("stem_bn",))
    for i in range(n_blocks):
        base = f"unet.down_convs.{i}"
        blk = ("unet", f"down{i}")
        conv2d(base + ".conv1", blk + ("ConvNormAct_0", "Conv_0"))
        bn(base + ".norm0", blk + ("ConvNormAct_0", "BatchNorm_0"))
        conv2d(base + ".conv2", blk + ("ConvNormAct_1", "Conv_0"))
        bn(base + ".norm1", blk + ("ConvNormAct_1", "BatchNorm_0"))
    for i in range(n_blocks - 1):
        base = f"unet.up_convs.{i}"
        blk = ("unet", f"up{i}")
        deconv2d(base + ".upconv", blk + ("ConvTranspose_0",))
        bn(base + ".norm0", blk + ("BatchNorm_0",))
        conv2d(base + ".conv1", blk + ("ConvNormAct_0", "Conv_0"))
        bn(base + ".norm1", blk + ("ConvNormAct_0", "BatchNorm_0"))
        conv2d(base + ".conv2", blk + ("ConvNormAct_1", "Conv_0"))
        bn(base + ".norm2", blk + ("ConvNormAct_1", "BatchNorm_0"))
    conv2d("unet.conv_final", ("unet", "final"))
    conv3d("feature_head.0", ("feature_head", "conv0"), bias=False)
    conv3d("feature_head.2", ("feature_head", "conv1"), bias=False)
    for head in heads:
        conv3d(head, (head,), bias=False)
    return sd


def simsiam_flax_to_torch_state_dict(params, batch_stats,
                                     stage_sizes=(2, 2, 2)):
    """Inverse of ``simsiam_state_dict_to_flax``: export a trained
    ``SimSiamEncoder`` (explore / MoCo query encoder) to the reference's
    ``TomoResClassifier2D3D`` / ``2D`` state_dict so TPU-trained exploration
    encoders run unmodified in the reference's torch embed/test scripts
    (simsiam_test_hm_2d3d.py, loaded via models/model.py:199-232 tolerant
    load). MoCo-trained states (no ``pred`` head in the checkpoint's used
    params) export whatever heads are present — the reference load fills the
    rest from its fresh init, same as its own MoCo->simsiam handoff."""
    sd: Dict = {}

    def bn(dst, src, affine=True):
        if affine:
            sd[dst + ".weight"] = _get(params, src + ("scale",))
            sd[dst + ".bias"] = _get(params, src + ("bias",))
        sd[dst + ".running_mean"] = _get(batch_stats, src + ("mean",))
        sd[dst + ".running_var"] = _get(batch_stats, src + ("var",))

    def conv(dst, src):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (3, 2, 0, 1))

    def dense(dst, src, bias=True):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (1, 0))
        if bias:
            sd[dst + ".bias"] = _get(params, src + ("bias",))

    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn1"))
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            dst = f"layer{stage + 1}.{b}"
            src = ("trunk", f"layer{stage + 1}_{b}")
            conv(dst + ".conv1", src + ("conv1",))
            bn(dst + ".bn1", src + ("bn1",))
            conv(dst + ".conv2", src + ("conv2",))
            bn(dst + ".bn2", src + ("bn2",))
            if "downsample_conv" in params["trunk"][f"layer{stage + 1}_{b}"]:
                conv(dst + ".downsample.0", src + ("downsample_conv",))
                bn(dst + ".downsample.1", src + ("downsample_bn",))
    if "fc" in params:
        dense("fc", ("fc",))
    if "proj" in params:
        # proj Sequential indices 0,1 / 3,4 / 6,7 (simsiam_model_2d3d.py:590-598)
        dense("proj.0", ("proj", "fc0"), bias=False)
        bn("proj.1", ("proj", "bn0"))
        dense("proj.3", ("proj", "fc1"), bias=False)
        bn("proj.4", ("proj", "bn1"))
        dense("proj.6", ("proj", "fc2"), bias=False)
        bn("proj.7", ("proj", "bn2"), affine=False)
    if "pred" in params:
        # pred Sequential indices 0,1 / 3 (:600-605)
        dense("pred.0", ("pred", "fc0"), bias=False)
        bn("pred.1", ("pred", "bn0"))
        dense("pred.3", ("pred", "fc1"))
    return sd


def _ref_vol_flax_to_torch(params, batch_stats, kind: str):
    """Shared inverse for the two reference-structural 3D-subvolume
    encoders: kind 'ref2d' -> TomoResClassifier (simsiam_model.py, 2D
    slice trunk WITH block BNs, conv-only downsample), kind 'ref3d' ->
    TomoResClassifier3D (moco_encoder_3d.py, Conv3d trunk with BN-LESS
    blocks). Heads (fc/proj/pred) export whatever is present."""
    sd: Dict = {}
    conv_tr = (lambda w: np.transpose(w, (3, 2, 0, 1))) if kind == "ref2d" \
        else (lambda w: np.transpose(w, (4, 3, 0, 1, 2)))

    def bn(dst, src, affine=True):
        if affine:
            sd[dst + ".weight"] = _get(params, src + ("scale",))
            sd[dst + ".bias"] = _get(params, src + ("bias",))
        sd[dst + ".running_mean"] = _get(batch_stats, src + ("mean",))
        sd[dst + ".running_var"] = _get(batch_stats, src + ("var",))

    def conv(dst, src):
        sd[dst + ".weight"] = conv_tr(_get(params, src + ("kernel",)))

    def dense(dst, src, bias=True):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (1, 0))
        if bias:
            sd[dst + ".bias"] = _get(params, src + ("bias",))

    conv("conv1", ("trunk", "conv1"))
    bn("bn1", ("trunk", "bn1"))
    for stage in range(3):
        for b in range(2):
            dst = f"layer{stage + 1}.{b}"
            src = ("trunk", f"layer{stage + 1}_{b}")
            conv(dst + ".conv1", src + ("conv1",))
            conv(dst + ".conv2", src + ("conv2",))
            if kind == "ref2d":
                bn(dst + ".bn1", src + ("bn1",))
                bn(dst + ".bn2", src + ("bn2",))
            if "downsample_conv" in params["trunk"][f"layer{stage + 1}_{b}"]:
                conv(dst + ".downsample.0", src + ("downsample_conv",))
    # feature_3d is Conv3d in BOTH families (aggregation over slices)
    sd["feature_3d.0.weight"] = np.transpose(
        _get(params, ("trunk", "f3d_conv", "kernel")), (4, 3, 0, 1, 2))
    bn("feature_3d.1", ("trunk", "f3d_bn"))
    if "fc" in params:
        dense("fc", ("fc",))
    if "proj" in params:
        dense("proj.0", ("proj", "fc0"), bias=False)
        bn("proj.1", ("proj", "bn0"))
        dense("proj.3", ("proj", "fc1"), bias=False)
        bn("proj.4", ("proj", "bn1"))
        dense("proj.6", ("proj", "fc2"), bias=False)
        bn("proj.7", ("proj", "bn2"), affine=False)
    if "pred" in params and kind == "ref2d":
        dense("pred.0", ("pred", "fc0"), bias=False)
        bn("pred.1", ("pred", "bn0"))
        dense("pred.3", ("pred", "fc1"))
    return sd


def simsiam_ref3d_flax_to_torch_state_dict(params, batch_stats):
    """Inverse of ``simsiam_ref3d_state_dict_to_flax`` (arch simsiamref_N
    -> reference TomoResClassifier .pth)."""
    return _ref_vol_flax_to_torch(params, batch_stats, "ref2d")


def moco_ref3d_flax_to_torch_state_dict(params, batch_stats):
    """Inverse of ``moco_ref3d_state_dict_to_flax`` (arch moco3dref_N ->
    reference TomoResClassifier3D .pth). The reference moco3d encoder has
    no pred head, so any pred params stay framework-side."""
    return _ref_vol_flax_to_torch(params, batch_stats, "ref3d")


def _deconv3d(w):
    """torch ConvTranspose3d (in, out, kd, kh, kw) -> flax ConvTranspose
    (kd, kh, kw, in, out) with all three spatial axes flipped (same
    convention as _deconv2d, verified numerically)."""
    return np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()


def res3d_state_dict_to_flax(state_dict: Dict, heads: Dict):
    """Reference ``TomoRes3DNet`` (arch res3d_N, resnet_3d_small.py:140-297)
    state_dict -> (params, batch_stats) for models/detector3d_ref.
    TomoRes3DRefNet. The arch is norm-free, so batch_stats is empty."""
    sd = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }
    params: Dict = {}

    def conv(src, dst, fn=_conv3d, bias=False):
        _set(params, dst + ("kernel",), fn(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    conv("conv1", ("conv1",))
    for stage, blocks in ((1, 2), (2, 2)):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = (f"layer{stage}_{b}",)
            conv(src + ".conv1", dst + ("conv1",))
            conv(src + ".conv2", dst + ("conv2",))
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ("downsample",))
    # deconv Sequential indices: 0 conv / 2 up / 4 conv / 6 up
    # (resnet_3d_small.py:231-268: [fc, relu, up, relu] per stage)
    conv("deconv_layers.0", ("deconv0_conv",))
    conv("deconv_layers.2", ("deconv0_up",), fn=_deconv3d)
    conv("deconv_layers.4", ("deconv1_conv",))
    conv("deconv_layers.6", ("deconv1_up",), fn=_deconv3d)
    conv("feature_head.0", ("feature_head",), bias=True)
    for head in heads:
        conv(head, (head,), bias=True)
    return params, {}


def res3d_flax_to_torch_state_dict(params, heads):
    """Inverse of ``res3d_state_dict_to_flax``: export a TomoRes3DRefNet to
    the reference ``TomoRes3DNet`` state_dict (semi3d checkpoints migrate
    back into the torch pipeline)."""
    sd: Dict = {}

    def conv(dst, src, bias=False):
        sd[dst + ".weight"] = np.transpose(_get(params, src + ("kernel",)),
                                           (4, 3, 0, 1, 2))
        node = params
        for k in src:
            node = node[k]
        if bias and "bias" in node:
            sd[dst + ".bias"] = np.asarray(node["bias"])

    def deconv(dst, src):
        w = _get(params, src + ("kernel",))[::-1, ::-1, ::-1]
        sd[dst + ".weight"] = np.transpose(w, (3, 4, 0, 1, 2))

    conv("conv1", ("conv1",))
    for stage, blocks in ((1, 2), (2, 2)):
        for b in range(blocks):
            dst = f"layer{stage}.{b}"
            src = (f"layer{stage}_{b}",)
            conv(dst + ".conv1", src + ("conv1",))
            conv(dst + ".conv2", src + ("conv2",))
            if "downsample" in params[f"layer{stage}_{b}"]:
                conv(dst + ".downsample.0", src + ("downsample",))
    conv("deconv_layers.0", ("deconv0_conv",))
    deconv("deconv_layers.2", ("deconv0_up",))
    conv("deconv_layers.4", ("deconv1_conv",))
    deconv("deconv_layers.6", ("deconv1_up",))
    conv("feature_head.0", ("feature_head",), bias=True)
    for head in heads:
        conv(head, (head,), bias=True)
    return sd


def load_reference_checkpoint(path: str, config):
    """Load a reference ``model_N.pth`` into (params, batch_stats) for
    ``create_detector(config)``. Requires torch (CPU is fine)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()
                  if hasattr(v, "numpy")}
    is_res3d_format = any(
        k.endswith("deconv_layers.0.weight") and np.ndim(v) == 5
        for k, v in state_dict.items()
    )
    if config.arch.startswith("res3dref"):
        if not is_res3d_format:
            raise ValueError(
                f"{path} is not a reference res3d (TomoRes3DNet) checkpoint "
                "— arch res3dref_N expects one (resnet_3d_small.py)"
            )
        return res3d_state_dict_to_flax(state_dict, config.heads)
    if is_res3d_format:
        raise ValueError(
            f"{path} is a reference res3d (semi3d) checkpoint; load it with "
            "--arch res3dref_18 (the structural migration target — arch "
            f"{config.arch!r} is the TPU-native redesign and is not "
            "weight-compatible)"
        )
    if config.arch.startswith("unetw"):
        raise ValueError(
            "arch unetw_N is the TPU-first redesign and has no reference "
            "torch counterpart; load reference .pth checkpoints with the "
            "parity arch (--arch unet_N) or train unetw from scratch"
        )
    n_blocks = int(config.arch.split("_")[1]) if "_" in config.arch else 4
    return torch_state_dict_to_flax(state_dict, n_blocks, config.heads)
