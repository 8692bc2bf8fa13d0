"""2D U-Net encoder/decoder (flax), the slice-wise backbone of the detector.

Behavioral equivalent of the ELEKTRONN3-derived UNet the reference vendors
(reference: cet_pick/models/networks/unet.py:538-884) in the configuration the
production model uses (unet_small.py:38): ``dim=2``, ``merge_mode='concat'``,
``up_mode='transpose'``, SAME convs, batch normalization placed *after* the
activation of each conv (unet.py:240-247), start_filts 32, and n_blocks
down-blocks with n_blocks-1 up-blocks.

TPU-first choices: channels-last (NHWC) layout, optional bfloat16 compute with
float32 parameters/statistics, and GroupNorm as a drop-in alternative to
BatchNorm for very small per-device batches.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvNormAct(nn.Module):
    """3x3 conv -> norm -> ReLU (order of reference unet.py:240-247)."""

    features: int
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # bias-free 3x3 convs, like the reference's conv3 helper
        # (unet.py:127-128, bias=False); the norm's shift plays that role
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)(
                x, use_running_average=not train
            )
        elif self.normalization == "group":
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        x = nn.relu(x)
        return x


class DownBlock(nn.Module):
    """Two ConvNormAct, then 2x max-pool when pooling (unet.py:199-249)."""

    features: int
    pooling: bool = True
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvNormAct(self.features, self.normalization, self.dtype)(x, train)
        x = ConvNormAct(self.features, self.normalization, self.dtype)(x, train)
        before_pool = x
        if self.pooling:
            # ceil_mode=True equivalent: SAME padding on the window
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        return x, before_pool


class UpBlock(nn.Module):
    """Transpose-conv 2x up -> norm -> ReLU -> concat skip -> two ConvNormAct
    (unet.py:318-396)."""

    features: int
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype
        )(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)(
                x, use_running_average=not train
            )
        elif self.normalization == "group":
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        x = nn.relu(x)
        # crop upsampled map if the encoder shape was odd (unet.py:253-317)
        if x.shape[1] != skip.shape[1] or x.shape[2] != skip.shape[2]:
            x = x[:, : skip.shape[1], : skip.shape[2], :]
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvNormAct(self.features, self.normalization, self.dtype)(x, train)
        x = ConvNormAct(self.features, self.normalization, self.dtype)(x, train)
        return x


class UNet2D(nn.Module):
    """n_blocks-deep 2D U-Net, channels-last, start_filts * 2^i per level."""

    n_blocks: int = 4
    start_filts: int = 32
    out_channels: int = 32
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        skips = []
        for i in range(self.n_blocks):
            feats = self.start_filts * (2 ** i)
            pooling = i < self.n_blocks - 1
            x, before = DownBlock(
                feats, pooling, self.normalization, self.dtype, name=f"down{i}"
            )(x, train)
            skips.append(before)
        for i in range(self.n_blocks - 1):
            feats = self.start_filts * (2 ** (self.n_blocks - 2 - i))
            x = UpBlock(feats, self.normalization, self.dtype, name=f"up{i}")(
                x, skips[-(i + 2)], train
            )
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="final")(x)
        return x
