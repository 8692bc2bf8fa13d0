"""TomoRes3DRefNet — reference-structural 3D detector (arch ``res3dref_N``).

Exact structural mirror of the reference's ``res3d`` family
(reference: cet_pick/models/networks/resnet_3d_small.py:140-341
``TomoRes3DNet`` / ``get_tomo_net_3d``), kept layer-for-layer convertible in
both directions (models/convert.py: ``res3d_state_dict_to_flax`` /
``res3d_flax_to_torch_state_dict``) so reference ``semi3d`` checkpoints
migrate losslessly — the redesigned :class:`~cet_pick_tpu.models.detector3d.
TomoPickNet3D` (GroupNorm, full-z output) is incompatible by construction.

Structure (all norm-free except none — the reference comments out every
BatchNorm on this path):

* conv1: 1->64 k7 s(2,2,2) p3, no bias          (resnet_3d_small.py:148-154)
* maxpool k3 s2 p1                              (:158)
* layer1: 2x BasicBlock(64)  — conv3x3x3 + relu, conv3x3x3, +residual, relu
  (no norm, :68-97)
* layer2: 2x BasicBlock(128, stride 2, 1x1x1-conv downsample)  (:160-161)
* deconv: 2x [conv3d k3 p1 no-bias -> relu -> ConvTranspose3d k4 s2 p1
  no-bias -> relu] at 64 then 32 channels       (:162-166, :231-268)
* feature_head: conv3d 32->16 k3 p1 bias + relu (:168-170)
* heads: conv3d 16->classes k1 bias; 'hm' bias init -2.19, 'proj' output
  L2-normalized over channels                   (:175-196, :285-293)

Output stride is 2 in ALL axes — z included (the reference's semi3d targets
are built at depth // down_ratio, datasets/tomo_moco_3d.py:76) — unlike the
TPU-native TomoPickNet3D which preserves z.

Layout is NDHWC (TPU-native); conversion transposes kernels. Torch pad-1 on
stride-2 convs at even sizes differs from XLA "SAME" (the r3 SimSiam export
bug), so every conv uses explicit padding.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn


def _conv(features, kernel, strides, pad, name, use_bias=False):
    return nn.Conv(
        features, kernel, strides=strides,
        padding=tuple((p, p) for p in pad),
        use_bias=use_bias, name=name,
    )


class RefBasicBlock3D(nn.Module):
    """Norm-free 3D basic block (resnet_3d_small.py:68-97)."""

    features: int
    strides: tuple = (1, 1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.features, (3, 3, 3), self.strides, (1, 1, 1),
                  "conv1")(x)
        y = nn.relu(y)
        y = _conv(self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                  "conv2")(y)
        if self.downsample:
            residual = nn.Conv(self.features, (1, 1, 1), strides=self.strides,
                               use_bias=False, name="downsample")(x)
        return nn.relu(y + residual)


class TomoRes3DRefNet(nn.Module):
    """Reference-structural res3d detector; (B, D, H, W) in,
    {head: (B, D/2, H/2, W/2, C)} out."""

    heads: Dict[str, int]

    @nn.compact
    def __call__(self, x, train: bool = True, active_heads=None):
        b, d, h, w = x.shape
        x = x.reshape(b, d, h, w, 1)
        x = _conv(64, (7, 7, 7), (2, 2, 2), (3, 3, 3), "conv1")(x)
        x = nn.relu(x)
        # torch MaxPool3d(k3, s2, p1) pads with -inf outside
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1), (1, 1), (1, 1)))
        for i in range(2):
            x = RefBasicBlock3D(64, name=f"layer1_{i}")(x)
        x = RefBasicBlock3D(128, strides=(2, 2, 2), downsample=True,
                            name="layer2_0")(x)
        x = RefBasicBlock3D(128, name="layer2_1")(x)
        # deconv stages: conv k3 -> relu -> transpose-conv k4 s2 p1 -> relu
        for i, planes in enumerate((64, 32)):
            x = _conv(planes, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                      f"deconv{i}_conv")(x)
            x = nn.relu(x)
            # torch ConvTranspose3d(k4, s2, p1): out = 2*in. flax ConvTranspose
            # with padding ((1,1),)*3 after k4 s2 gives 2*in+... — use explicit
            # VALID transpose then crop 1 on each side (identical arithmetic:
            # torch crops `padding` from both ends of the full correlation)
            x = nn.ConvTranspose(
                planes, (4, 4, 4), strides=(2, 2, 2), padding="VALID",
                use_bias=False, name=f"deconv{i}_up",
            )(x)
            x = x[:, 1:-1, 1:-1, 1:-1, :]
            x = nn.relu(x)
        x = _conv(16, (3, 3, 3), (1, 1, 1), (1, 1, 1), "feature_head",
                  use_bias=True)(x)
        x = nn.relu(x)
        out = {}
        for head, classes in self.heads.items():
            if active_heads is not None and head not in active_heads:
                continue
            y = nn.Conv(
                classes, (1, 1, 1),
                bias_init=(nn.initializers.constant(-2.19) if "hm" in head
                           else nn.initializers.zeros),
                name=head,
            )(x)
            if "proj" in head:
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12
                )
            out[head] = y
        return out
