"""Pallas TPU kernel: fused k(3,3,3) dilation-(1,4,4) conv3d (+ ReLU).

The 3D feature head (models/detector.FeatureHead3D, reference
unet_small.py:39-49) is the forward's hottest component. The XLA lowering
chosen by A/B (``_ZTapDilatedConv``) computes the three z-taps as output
channel blocks of ONE fat dilated 2D conv — already at the MXU lane-fill
ceiling (~30 TF/s for 96 of 128 output lanes) — but must round-trip the
(D, H, W, 3F) intermediate ``u`` through HBM for the shifted z-add:
~880 MB written + read per conv on the 70x512x512 bench tile, ~2x4 ms of
pure bandwidth (benchmarks/roofline.py).

This kernel keeps ``u`` in VMEM: the grid walks z innermost (TPU grids are
sequential), each step computes u[z] for one xy row-block via one im2col
matmul, and a 3-deep VMEM ring carries u[z-2], u[z-1], u[z] so
``y[z-1] = u[z-2]·K[0] + u[z-1]·K[1] + u[z]·K[2]`` (the conv3d SAME z-sum)
is emitted as a pure-VMEM epilogue. HBM traffic drops to reading x once and
writing y once.

Layout rule learned the hard way: the Mosaic backend behind the axon
remote-compile path crashes on lane<->sublane reshapes, so every in-kernel
reshape here merges or splits LEADING dims only ((hb, W, C) <-> (hb*W, C)),
which preserves the VMEM tile layout; the im2col is 9 shifted sub-window
slices lane-concatenated into (hb*W, 9C) for one fat matmul.

Numerics match the XLA path: bf16 (or f32) inputs, f32 matmul accumulation,
cast to the compute dtype before the z-add (XLA's conv does the same
internally). Inference-only: no custom VJP is defined — training uses the
XLA ``_ZTapDilatedConv``.

A/B RESULT (real v5e, benchmarks/pallas_head_ab.py, healthy-tunnel baseline
re-checked): XLA 13.05 ms / 19.5 TF/s vs this kernel 15.03 ms (hb=16) /
15.63 ms (hb=8); hb=32 crashes the remote Mosaic compiler. The bandwidth
saved on the u round-trip is more than given back by the in-kernel im2col
(9 lane-32 VMEM slice copies per step) undercutting XLA's conv lowering.
**NOT wired into the model** — FeatureHead3D ships the XLA lowering; this
file is kept as the reproducible A/B subject (tests cover interpret-mode
correctness) and as the working template for the VMEM-ring + leading-dim
reshape rules this Mosaic backend tolerates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, k2_ref, o_ref, r0, r1, r2, *, hb, W, C, F, d, relu):
    z = pl.program_id(2)
    D = pl.num_programs(2) - 1

    # ring roll: r0 <- u[z-2], r1 <- u[z-1]
    r0[...] = r1[...]
    r1[...] = r2[...]

    @pl.when(z == 0)
    def _():
        r0[...] = jnp.zeros_like(r0)
        r1[...] = jnp.zeros_like(r1)

    @pl.when(z < D)
    def _():
        xs = x_ref[0, 0]  # (hb + 2d, W + 2d, C)
        parts = []
        for dy in range(3):
            for dx in range(3):
                s = xs[dy * d:dy * d + hb, dx * d:dx * d + W, :]
                # leading-dim merge only — lane dim (C) untouched, so the
                # VMEM layout is preserved (lane<->sublane reshapes crash
                # the Mosaic backend through the remote-compile path)
                parts.append(s.reshape(hb * W, C))
        patches = jnp.concatenate(parts, axis=1)          # (hb*W, 9C)
        u = jnp.dot(patches, k2_ref[...],
                    preferred_element_type=jnp.float32)    # (hb*W, 3F)
        r2[...] = u.astype(r2.dtype)

    @pl.when(z == D)
    def _():
        r2[...] = jnp.zeros_like(r2)

    @pl.when(z > 0)
    def _():
        y = (r0[:, 0:F] + r1[:, F:2 * F] + r2[:, 2 * F:3 * F])
        if relu:
            y = jnp.maximum(y, 0)
        o_ref[0, 0] = y.reshape(hb, W, F)  # leading-dim split, layout-free


@functools.partial(jax.jit, static_argnames=("dilation", "relu", "hb",
                                             "interpret"))
def ztap_dilated_conv(x, kernel, *, dilation: int = 4, relu: bool = True,
                      hb: int = 16, interpret: bool = False):
    """Fused SAME conv3d k(3,3,3) dil(1, dilation, dilation) (+ ReLU).

    x: (B, D, H, W, C); kernel: (3, 3, 3, C, F) — nn.Conv layout, so the
    model's parameters are used as-is. Requires H % hb == 0.
    """
    B, D, H, W, C = x.shape
    F = kernel.shape[-1]
    d = dilation
    if H % hb:
        raise ValueError(f"H={H} must divide by the row block {hb}")

    x2 = jnp.pad(x, ((0, 0), (0, 0), (d, d), (d, d), (0, 0)))
    # (kz, ky, kx, c, f) -> rows (ky, kx, c), cols (kz, f)
    k2 = jnp.transpose(kernel, (1, 2, 3, 0, 4)).reshape(9 * C, 3 * F)
    k2 = k2.astype(x.dtype)

    nh = H // hb
    grid = (B, nh, D + 1)

    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(1), pl.Element(hb + 2 * d),
         pl.Element(W + 2 * d), pl.Element(C)),
        lambda b, h, z: (b, jnp.minimum(z, D - 1), h * hb, 0, 0),
    )
    k_spec = pl.BlockSpec((9 * C, 3 * F), lambda b, h, z: (0, 0))
    o_spec = pl.BlockSpec(
        (1, 1, hb, W, F),
        lambda b, h, z: (b, jnp.maximum(z - 1, 0), h, 0, 0),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, hb=hb, W=W, C=C, F=F, d=d, relu=relu),
        grid=grid,
        in_specs=[x_spec, k_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb * W, 3 * F), x.dtype),
            pltpu.VMEM((hb * W, 3 * F), x.dtype),
            pltpu.VMEM((hb * W, 3 * F), x.dtype),
        ],
        interpret=interpret,
    )(x2, k2)
    return out
