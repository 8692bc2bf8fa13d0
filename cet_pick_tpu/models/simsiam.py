"""SimSiam exploration encoders (flax).

Behavioral equivalents of the reference's exploration models
(reference: cet_pick/models/networks/simsiam_model_2d3d.py:560-892 arch
``simsiam2d3d_18``, and simsiam_model_2d.py:617-932 arch ``simsiam2d_18``):

* trunk: ResNet-18-style — conv 1->64 k3 s1 (no maxpool), BasicBlock stages
  [2, 2, 2] at 64/128/256 channels (layer4 dropped), global average pool
  (simsiam_model_2d3d.py:567-574)
* 2d3d mode: the 2D tilt patch and the 3D slice patch run through the SAME
  trunk concatenated along batch (shared weights + shared BN statistics,
  :737-738), then their pooled features concatenate channel-wise -> fc to
  head_conv (:755-766)
* SimSiam heads: proj = 3-layer MLP with BN (final BN affine-free), pred =
  2-layer MLP (:588-607); the returned 'proj' is stop-gradient'd — the
  reference's ``.detach()`` (:769-779)

TPU-first: channels-last NHWC convs, one fused batch for both views where
the caller wants it, bfloat16-capable, static shapes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # explicit ((1,1),(1,1)) padding, NOT "SAME": torch's conv3x3 pads
        # symmetrically (simsiam_model_2d3d.py:56-59). For stride 1 the two
        # are identical, but at stride 2 on EVEN spatial sizes XLA's SAME
        # resolves to (0,1) — a one-pixel window shift vs the reference.
        # The reference's near-zero head init (fill_fc_weights std=0.001)
        # made the conversion golden test insensitive to the trunk, which is
        # how this hid until the flax->torch export test (random full-scale
        # weights) caught it.
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        residual = x
        y = conv(self.features, self.strides, "conv1")(x)
        y = bn("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.features, 1, "conv2")(y)
        y = bn("bn2")(y, use_running_average=not train)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual, use_running_average=not train)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """conv1 (1->64 k3 s1) + stages [2,2,2] @ 64/128/256 + global avg pool."""

    stage_sizes: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, H, W, 1)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, (64, 128, 256))
        ):
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(feats, strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 256)


def explore_mode(config) -> str:
    """Resolve the exploration modality from task/arch strings.

    '2d3d'  — paired tilt-projection + z-slice patches
              (reference task simsiam2d3d, datasets/tomo_pre_proj_angle_
              select_new2d3d.py);
    'vol'   — true 3D subvolume crops (reference task ``simsiam`` =
              datasets/tomo_pre.py + particle_pre.py subvols, arches
              ``simsiam_N`` models/networks/simsiam_model.py:517 and
              ``moco3d_N`` moco_encoder_3d.py:470);
    '2d'    — single z-slice patches (reference task simsiam3d /
              arch simsiam2d).
    """
    if "2d3d" in config.arch or "2d3d" in config.task:
        return "2d3d"
    stem = config.arch.split("_")[0]
    if stem in ("simsiam", "moco3d", "simsiamref", "moco3dref"):
        return "vol"
    if config.task == "simsiam":
        if stem in ("simsiam2d", "moco"):
            # an explicitly 2D arch must not be silently overridden into a
            # VolTrunk by the vol task string — make the conflict loud
            raise ValueError(
                f"--task simsiam (3D-subvolume exploration) conflicts with "
                f"2D arch '{config.arch}'; use --arch simsiam_18|moco3d_18 "
                f"for vol mode or --task simsiam3d for 2D patches"
            )
        return "vol"
    return "2d"


class BasicBlock3D(nn.Module):
    """3D residual block, NDHWC (counterpart of the reference's 3D
    BasicBlock, moco_encoder_3d.py:55-84 — which drops BatchNorm; kept here
    for training stability and SyncBN-for-free parity with the 2D trunk)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.features, (3, 3, 3), strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = bn("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y, use_running_average=not train)
        if residual.shape[-1] != self.features or self.strides != (1, 1, 1):
            residual = nn.Conv(self.features, (1, 1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual,
                                           use_running_average=not train)
        return nn.relu(y + residual)


class VolTrunk(nn.Module):
    """Conv3D encoder trunk for subvolume crops, NDHWC.

    TPU-first redesign of the reference's subvolume encoders (slice-wise-2D
    TomoResClassifier simsiam_model.py:159 and Conv3D TomoResClassifier3D
    moco_encoder_3d.py:156): an early stride-(1,2,2) stem keeps the FLOPs on
    the MXU-friendly downsampled grid (the reference stems also downsample
    4x immediately), then residual 3D stages [2,2,2] @ 64/128/256 with
    strides (2,2,2)/(1,2,2), then a global average pool.
    """

    stage_sizes: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, D, H, W, 1)
        b, d, h, w, _ = x.shape
        if h % 2 == 0 and w % 2 == 0:
            # stem as xy space-to-depth (2x2 phases -> 4 channels) + k(3,4,4)
            # s1 conv: the single-channel k7 s(1,2,2) conv is the worst MXU
            # lane shape in the trunk (input lane fill 1/128); folding the
            # stride's pixel phases into channels quadruples the lane
            # occupancy at the same downsampled output grid (the same move
            # as the 2D detector's _Stem, which A/B'd 1.46x on v5e). This is
            # the ARCHITECTURE here — VolTrunk has no reference checkpoint
            # to stay weight-compatible with.
            x = x.reshape(b, d, h // 2, 2, w // 2, 2)
            x = x.transpose(0, 1, 2, 4, 3, 5).reshape(b, d, h // 2, w // 2, 4)
            x = nn.Conv(64, (3, 4, 4), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        else:  # odd extents: direct strided conv (same param name/shape
            # family is NOT required across the two paths — a model is
            # built for one static vol_size)
            x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        stage_strides = ((1, 1, 1), (2, 2, 2), (1, 2, 2))
        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, (64, 128, 256))
        ):
            for b in range(blocks):
                strides = stage_strides[stage] if b == 0 else (1, 1, 1)
                x = BasicBlock3D(feats, strides, dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(x, train)
        return jnp.mean(x, axis=(1, 2, 3))  # global average pool -> (B, 256)


class RefBlock2D(nn.Module):
    """Reference BasicBlock of the 3D-subvolume slice trunk
    (simsiam_model.py:44-74): conv/bn x2 with a CONV-ONLY 1x1 downsample —
    unlike the 2d3d family's block, the downsample has no BatchNorm
    (simsiam_model.py:256-263 comments it out). Explicit (1,1) padding for
    torch stride-2 parity on even sizes (the simsiam2d export lesson)."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        residual = x
        y = conv(self.features, self.strides, "conv1")(x)
        y = bn("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.features, 1, "conv2")(y)
        y = bn("bn2")(y, use_running_average=not train)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
        return nn.relu(y + residual)


class SliceTrunkRef(nn.Module):
    """Reference-structural trunk of the ``simsiam``/``simsiam3d`` 3D-
    subvolume encoder (TomoResClassifier, simsiam_model.py:159-366):
    every z slice of the subvolume runs a ResNet18-style 2D trunk (conv1
    1->64 k7 s2 p3 + bn + maxpool k3 s2 p1 + layers [2,2,2] @ 64/128/256,
    slices folded into batch exactly like the reference's b>1 reshape,
    :377-382), the per-slice maps stack back into a (B, D, h, w, 256)
    volume for the Conv3d ``feature_3d`` aggregation (:182-185), global
    average pool -> (B, 256).

    Structure-matched for lossless .pth migration (simsiam_ref3d_state_dict_
    to_flax) — the TPU-native production trunk remains VolTrunk."""

    stage_sizes: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, D, H, W, 1) -> slices as batch (B*D, H, W, 1)
        b, d, h, w, c = x.shape
        x = x.reshape(b * d, h, w, c)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        # torch MaxPool2d(k3, s2, p1) pads with -inf; flax max_pool matches
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, (64, 128, 256))
        ):
            for blk in range(blocks):
                strides = 2 if (stage > 0 and blk == 0) else 1
                x = RefBlock2D(feats, strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x, train)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, d, hh, ww, x.shape[-1])  # (B, D, h, w, 256)
        x = nn.Conv(256, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                    dtype=self.dtype, name="f3d_conv")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="f3d_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))


class RefBlock3D(nn.Module):
    """Reference 3D BasicBlock of the ``moco3d`` encoder
    (moco_encoder_3d.py:55-84): conv/relu/conv with NO BatchNorm (the
    reference comments both bn layers out) and a conv-only 1x1x1
    downsample (:296-303)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3, 3), strides=self.strides,
                    padding=((1, 1),) * 3, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding=((1, 1),) * 3,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        if residual.shape[-1] != self.features or self.strides != (1, 1, 1):
            residual = nn.Conv(self.features, (1, 1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
        return nn.relu(y + residual)


class VolTrunkRef(nn.Module):
    """Reference-structural trunk of the ``moco3d`` 3D-subvolume encoder
    (TomoResClassifier3D, moco_encoder_3d.py:156-420): Conv3d 1->64 k7 s2
    p3 + BN + maxpool3d k3 s2 p1, BN-less residual stages [2,2,2] @
    64/128/256, Conv3d ``feature_3d`` + BN + relu, global average pool ->
    (B, 256). Structure-matched for lossless .pth migration — the
    TPU-native production trunk remains VolTrunk."""

    stage_sizes: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, D, H, W, 1)
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2), padding=((3, 3),) * 3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1),) * 3)
        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, (64, 128, 256))
        ):
            for blk in range(blocks):
                strides = (2, 2, 2) if (stage > 0 and blk == 0) else (1, 1, 1)
                x = RefBlock3D(feats, strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x, train)
        x = nn.Conv(256, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                    dtype=self.dtype, name="f3d_conv")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="f3d_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2, 3))


class ProjMLP(nn.Module):
    """3-layer projection MLP, final BN affine-free (simsiam_model_2d3d.py:590-598)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2):
            x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"fc{i}")(x)
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_bias=False,
                         use_scale=False, dtype=self.dtype, name="bn2")(
            x, use_running_average=not train
        )
        return x


class PredMLP(nn.Module):
    """2-layer prediction MLP (simsiam_model_2d3d.py:600-605)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc0")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn0")(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x)


class SimSiamEncoder(nn.Module):
    """Shared trunk + fc + proj/pred heads; handles both 2d3d and 2d modes.

    mode '2d3d': inputs are (patch_2d, patch_3d) pairs -> features concat to
    512 before fc. mode '2d': single patch -> 256 -> fc.
    """

    head_conv: int = 128
    mode: str = "2d3d"
    trunk_kind: str = ""  # "" (production), "ref2d" / "ref3d" (migration)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.mode == "vol":
            # production trunk is the TPU-first VolTrunk; the two reference-
            # structural trunks exist for lossless .pth migration (arches
            # simsiamref_N / moco3dref_N)
            self.trunk = {
                "": VolTrunk, "ref2d": SliceTrunkRef, "ref3d": VolTrunkRef,
            }[self.trunk_kind](dtype=self.dtype)
        else:
            self.trunk = ResNetTrunk(dtype=self.dtype)
        self.fc = nn.Dense(self.head_conv, dtype=self.dtype)
        self.proj = ProjMLP(self.head_conv, dtype=self.dtype)
        self.pred = PredMLP(self.head_conv, dtype=self.dtype)

    def encode(self, x2d, x3d, train: bool):
        """Pooled feature for one view. x2d/x3d: (B, H, W, 1); x3d may be None
        in 2d mode. In 'vol' mode x2d carries the subvolume (B, D, H, W, 1)
        and x3d is None."""
        if self.mode == "2d3d":
            b = x2d.shape[0]
            both = jnp.concatenate([x2d, x3d], axis=0)  # batch-concat, shared BN
            feat = self.trunk(both, train)
            feat = jnp.concatenate([feat[:b], feat[b:]], axis=1)  # (B, 512)
        else:
            feat = self.trunk(x2d, train)
        return self.fc(feat)

    def heads_of(self, feat, train: bool):
        z = self.proj(feat, train)
        p = self.pred(z, train)
        return {"proj": jax.lax.stop_gradient(z), "pred": p}

    def __call__(self, x1_2d, x1_3d, x2_2d, x2_3d, train: bool = True):
        """Two augmented views -> [ret1, ret2] with stop-grad proj targets
        (simsiam_model_2d3d.py:728-782)."""
        f1 = self.encode(x1_2d, x1_3d, train)
        f2 = self.encode(x2_2d, x2_3d, train)
        return [self.heads_of(f1, train), self.heads_of(f2, train)]

    def forward_test(self, x1_2d, x1_3d=None):
        """Single-view embeddings (simsiam_model_2d3d.py:697-726)."""
        f = self.encode(x1_2d, x1_3d, train=False)
        return self.heads_of(f, train=False)


def create_simsiam(config, dtype=None):
    """arch 'simsiam2d3d_18' / 'simsiam2d_18' / 'simsiam_18' / 'moco3d_18'
    -> SimSiamEncoder (reference models/model.py:32-70 arch parsing; the
    last two select the 3D-subvolume VolTrunk). Arches 'simsiamref_18' /
    'moco3dref_18' select the reference-STRUCTURAL subvolume encoders
    (TomoResClassifier / TomoResClassifier3D) for lossless .pth migration;
    their head widths are pinned to the reference's fixed dims (fc/proj 256
    for simsiam_model.py:188-204, 128 for moco_encoder_3d.py:227-243)."""
    mode = explore_mode(config)
    dtype = dtype or {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[config.dtype]
    stem = config.arch.split("_")[0]
    trunk_kind = {"simsiamref": "ref2d", "moco3dref": "ref3d"}.get(stem, "")
    head_conv = {"ref2d": 256, "ref3d": 128}.get(trunk_kind, config.head_conv)
    return SimSiamEncoder(head_conv=head_conv, mode=mode,
                          trunk_kind=trunk_kind, dtype=dtype)


class ScanClusteringModel(nn.Module):
    """SimSiam backbone + linear cluster head(s) for the SCAN stage
    (reference simsiam_model_2d3d.py:847-877 ClusteringModel +
    get_clustering2d3d_net_small:879-885).

    ``features`` runs trunk -> fc -> projection MLP WITHOUT the SimSiam
    stop-gradient (the reference's forward_test path has no detach either),
    so the SCAN loss fine-tunes the whole network when the caller doesn't
    stop-grad the features itself (base_trainer.py:59-109
    update_cluster_head_only switch).
    """

    head_conv: int = 128
    mode: str = "2d3d"
    n_clusters: int = 3
    n_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = SimSiamEncoder(
            head_conv=self.head_conv, mode=self.mode, dtype=self.dtype
        )
        self.cluster_heads = [
            nn.Dense(self.n_clusters, dtype=self.dtype, name=f"head{i}")
            for i in range(self.n_heads)
        ]

    def features(self, x2d, x3d=None, train: bool = False):
        """Projection features with gradients (ClusteringModel
        forward_pass='backbone')."""
        f = self.backbone.encode(x2d, x3d, train)
        return self.backbone.proj(f, train)

    def head_logits(self, feats):
        """Per-head cluster logits (forward_pass='head')."""
        return [h(feats) for h in self.cluster_heads]

    def __call__(self, x2d, x3d=None, train: bool = False):
        """forward_pass='default': features -> list of per-head logits."""
        return self.head_logits(self.features(x2d, x3d, train))


def create_scan_model(config, n_clusters, n_heads=1, dtype=None):
    """arch 'simsiam2d3d_18' / 'simsiam2d_18' -> ScanClusteringModel
    (the scan / scan2d3d tasks, base_trainer.py:217-220)."""
    mode = "2d3d" if "2d3d" in config.arch else "2d"
    dtype = dtype or {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[config.dtype]
    return ScanClusteringModel(
        head_conv=config.head_conv, mode=mode, n_clusters=n_clusters,
        n_heads=n_heads, dtype=dtype,
    )
