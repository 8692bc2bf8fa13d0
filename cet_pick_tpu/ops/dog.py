"""Difference-of-Gaussian candidate mining (jitted pyramid + host greedy NMS).

TPU-native rebuild of reference cet_pick/utils/image.py:138-183
(``get_potential_coords_pyramid``): multi-sigma 3D gaussian blurs, consecutive
differences with zeroed borders, per-scale xy NMS, max across scales, an
adaptive threshold mean + std/2 over positive responses, then greedy spherical
NMS (diameter 14) to emit candidate centers.

The blur/diff/NMS/threshold stage is one jitted function (``dog_response``)
built from separable 1D convolutions, so the whole pyramid is a single XLA
program; only the final sparse greedy suppression runs on host
(``greedy_nms_3d``), on the handful of surviving voxels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cet_pick_tpu.ops.greedy_nms import greedy_nms_3d
from cet_pick_tpu.ops.nms import nms3d_xy


def _gaussian_kernel1d(sigma, truncate=4.0):
    """scipy.ndimage-compatible 1D gaussian kernel (radius = truncate*sigma + 0.5)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def _blur_axis(vol, kernel, radius, axis):
    """Symmetric-padded (scipy 'reflect') 1D convolution along ``axis``."""
    vol = jnp.moveaxis(vol, axis, -1)
    shape = vol.shape
    x = vol.reshape(-1, 1, shape[-1])
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius)), mode="symmetric")
    w = kernel.reshape(1, 1, -1)
    # Pin full f32 precision: this is deterministic preprocessing, and the
    # platform's default conv precision is reduced (bf16-class accumulate).
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(y.reshape(shape), -1, axis)


def gaussian_blur_3d(vol, sigma, truncate=4.0):
    """Separable 3D gaussian blur matching scipy.ndimage.gaussian_filter defaults."""
    kernel, radius = _gaussian_kernel1d(sigma, truncate)
    kernel = jnp.asarray(kernel)
    for axis in range(3):
        vol = _blur_axis(vol, kernel, radius, axis)
    return vol


@partial(jax.jit, static_argnames=("sigmas", "kernel", "bound_z", "bound_xy"))
def dog_response(rec, sigmas=(2, 4), kernel=3, bound_z=10, bound_xy=30):
    """Jitted DoG pyramid response: blurs, diffs, border zeroing, xy NMS, scale max.

    Returns (response, cutoff): the per-voxel NMS'd response volume and the
    adaptive threshold mean + 0.5 * std over positive responses
    (image.py:177-179; std with Bessel correction to match torch ``.std()``).
    """
    d, h, w = rec.shape
    blurred = [gaussian_blur_3d(rec, s) for s in sigmas]

    responses = []
    for i in range(len(sigmas) - 1):
        diff = blurred[i + 1] - blurred[i]
        mask = jnp.zeros_like(diff)
        mask = mask.at[bound_z : d - bound_z, bound_xy : h - bound_xy, bound_xy : w - bound_xy].set(1.0)
        diff = diff * mask
        responses.append(nms3d_xy(diff, kernel=kernel))
    resp = jnp.max(jnp.stack(responses, axis=0), axis=0)

    pos = resp > 0
    n = jnp.sum(pos)
    mean = jnp.sum(jnp.where(pos, resp, 0.0)) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.where(pos, (resp - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
    cutoff = mean + 0.5 * jnp.sqrt(var)
    return resp, cutoff


def dog_candidates_pyramid(rec, sigmas=(2, 4), kernel=3, nms_diameter=14):
    """Full candidate mining: jitted response + host greedy ball NMS.

    Matches get_potential_coords_pyramid (image.py:138-183): borders of 10
    z-slices and 30 xy-pixels (60 for volumes larger than 512^2) are excluded.
    Returns (scores, coords) with coords rows (x, y, z).
    """
    d, h, w = rec.shape
    bound_xy = 60 if (h > 512 and w > 512) else 30
    resp, cutoff = dog_response(
        jnp.asarray(rec, dtype=jnp.float32),
        sigmas=tuple(sigmas),
        kernel=kernel,
        bound_xy=bound_xy,
    )
    resp = np.asarray(resp)
    cutoff = float(cutoff)
    return greedy_nms_3d(resp, nms_diameter, threshold=cutoff)
