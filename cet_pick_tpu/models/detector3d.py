"""TomoPickNet3D — fully-3D residual detector (task ``semi3d``).

Behavioral counterpart of the reference's 3D arches for the ``semi3d`` task
(``res3d`` models/networks/resnet_3d_small.py, ``p3d`` p3d_small.py —
registered at models/model.py:32-56): same contract as TomoPickNet
((B, D, H, W) in, {head: (B, D, H/2, W/2, C)} out, down_ratio 2 in xy only)
but with genuine 3D convolutions throughout instead of slice-wise 2D + a
3D head.

TPU-first: NDHWC layout, residual Conv3D blocks with GroupNorm (BatchNorm3D
statistics are noisy at the tiny batch sizes 3D memory forces; GroupNorm is
the standard SPMD-safe swap — SURVEY.md §2.7), bfloat16-capable.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn


class ResBlock3D(nn.Module):
    features: int
    strides: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3, 3), strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn2")(y)
        if residual.shape[-1] != self.features or self.strides != (1, 1, 1):
            residual = nn.Conv(self.features, (1, 1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
        return nn.relu(y + residual)


class TomoPickNet3D(nn.Module):
    """3D residual trunk + per-task heads; xy down_ratio 2, z preserved."""

    heads: Dict[str, int]
    n_blocks: int = 2
    head_conv: int = 32
    stem_features: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, active_heads=None):
        b, d, h, w = x.shape
        x = x.reshape(b, d, h, w, 1).astype(self.dtype)
        # stem: Conv3D stride (1, 2, 2) -> xy down_ratio 2 like the 2D stem
        x = nn.Conv(self.stem_features, (3, 7, 7), strides=(1, 2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="stem_gn")(x)
        x = nn.relu(x)
        feats = 32
        for i in range(self.n_blocks):
            x = ResBlock3D(feats, dtype=self.dtype, name=f"block{i}")(x)
        # dilated context stage, mirroring the 2D model's feature head
        for i in range(2):
            x = nn.Conv(self.head_conv, (3, 3, 3), kernel_dilation=(1, 4, 4),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"context{i}")(x)
            x = nn.relu(x)
        out = {}
        for head, classes in self.heads.items():
            if active_heads is not None and head not in active_heads:
                continue
            y = nn.Conv(classes, (3, 1, 1), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=head)(x)
            y = y.astype(jnp.float32)
            if "proj" in head:
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12
                )
            out[head] = y
        return out
