"""Jitted 3D max-pool non-maximum suppression + clamped sigmoid.

TPU-native equivalents of reference cet_pick/models/decode.py:11-33 (torch
``max_pool3d`` keep-mask NMS) and cet_pick/models/utils.py:167-169
(``_sigmoid`` clamp). Implemented with ``lax.reduce_window`` so XLA lowers the
pooling to fused vector ops; shapes are static under jit.

All functions operate on a single unbatched volume (D, H, W); batch with
``jax.vmap`` when needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def sigmoid_clamped(x, eps=1e-4):
    """sigmoid clamped to [eps, 1-eps] (models/utils.py:167-169)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def _maxpool_same(heat, window):
    """Max pool with stride 1 and SAME extent (odd windows), -inf padding.

    Equivalent to torch ``max_pool3d(..., stride=1, padding=(k-1)//2)``: torch
    pads with -inf for max pooling, as does reduce_window's init value.
    """
    pads = tuple((w // 2, w // 2) for w in window)
    return lax.reduce_window(
        heat,
        -jnp.inf,
        lax.max,
        window_dimensions=window,
        window_strides=(1, 1, 1),
        padding=pads,
    )


@partial(jax.jit, static_argnames=("kernel", "kernel_z"))
def nms3d(heat, kernel=3, kernel_z=3):
    """Full 3D NMS: keep voxels equal to their (kz, k, k) window max (decode.py:27-33).

    The reference fixes the z window to 3 regardless of ``kernel``
    (decode.py:30-31); pass ``kernel_z`` explicitly for other behavior.
    """
    hmax = _maxpool_same(heat, (kernel_z, kernel, kernel))
    return heat * (hmax == heat).astype(heat.dtype)


@partial(jax.jit, static_argnames=("kernel",))
def nms3d_xy(heat, kernel=3):
    """Separable xy-only NMS (decode.py:11-17), used for fibers + DoG mining."""
    hmax = _maxpool_same(heat, (1, kernel, kernel))
    return heat * (hmax == heat).astype(heat.dtype)


@partial(jax.jit, static_argnames=("kernel",))
def nms3d_z(heat, kernel=3):
    """Separable z-only NMS (decode.py:19-25)."""
    hmax = _maxpool_same(heat, (kernel, 1, 1))
    return heat * (hmax == heat).astype(heat.dtype)
