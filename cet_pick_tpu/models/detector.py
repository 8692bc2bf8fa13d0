"""TomoPickNet — the refinement heatmap detector (flax).

Behavioral equivalent of the reference's production model ``TomoConvUNet``
(reference: cet_pick/models/networks/unet_small.py:30-113, arch ``unet_N``):

    stem Conv2d(1->16, k7, stride 2) + BN + ReLU        (unet_small.py:35-37)
    per-z-slice 2D UNet (16 -> 32, n_blocks=N)          (:38, :63-76)
    3D feature head: two Conv3d k3 dilation (1,4,4)     (:39-49)
    per-task heads: Conv3d k(3,1,1), no bias            (:53-61)
    'proj' head output L2-normalized over channels      (:88-94)

TPU-first design:
  * channels-last everywhere (NDHWC); z-slices fold into the batch axis for
    the 2D trunk (one big NHWC conv batch = best MXU utilization), mirroring
    the reference's reshape trick (:63-84) but without per-sample branching.
  * optional bfloat16 activations with float32 params & normalization stats.
  * the whole forward is shape-static and jit/pjit friendly; spatial dims are
    polymorphic across traces (one compile per tile shape).

Input:  (B, D, H, W) float volumes.
Output: dict head -> (B, D, H//2, W//2, C) arrays.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from cet_pick_tpu.models.unet import UNet2D


class _ZTapDilatedConv(nn.Module):
    """k(3,3,3) dilation-(1,4,4) 3D conv as ONE fat 2D dilated conv.

    The three z-taps become OUTPUT channel blocks: a single 2D conv with
    kernel (3, 3, Cin, 3*F) computes u[z, dz] = k[dz] * x[z] for all z at
    once, then y[z] = u[z-1, 0] + u[z, 1] + u[z+1, 2] is a pad + three
    strided adds (bandwidth-bound, measured ~500 GB/s). Identical sums to
    the direct conv3d; chosen by a real-v5e A/B over the direct lowering,
    an input-side z-window (channel concat), a space-to-batch phase
    decomposition, and a grouped-conv form — this one tripled the conv's
    output-channel width (32 -> 96 lanes of the 128-wide MXU), which the
    measurements showed is the binding constraint (benchmarks/roofline.py):
    head time 43 ms -> 26 ms on the 70x512x512 bench tile. Parameter
    path/shape are identical to nn.Conv's (3,3,3,Cin,F) "kernel", so
    reference .pth conversion (models/convert.py) is unaffected.
    """

    features: int
    dilation: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, cin = x.shape
        f = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, cin, f),
            jnp.float32,
        )
        # (kz, ky, kx, c, f) -> (ky, kx, c, kz*f): output blocks by z offset
        k2 = jnp.transpose(kernel, (1, 2, 3, 0, 4)).reshape(3, 3, cin, 3 * f)
        u = jax.lax.conv_general_dilated(
            x.reshape(b * d, h, w, cin).astype(self.dtype),
            k2.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(b, d, h, w, 3, f)
        # y[z] = u[z-1, dz=0] + u[z, dz=1] + u[z+1, dz=2]; the zero pad at
        # the z borders reproduces conv3d's SAME padding exactly
        up = jnp.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
        return up[:, :-2, :, :, 0] + up[:, 1:-1, :, :, 1] + up[:, 2:, :, :, 2]


class _Stem(nn.Module):
    """k7 s2 stem conv (unet_small.py:35-37) lowered as a space-to-depth
    4-phase k4 s1 conv when H, W are even.

    The stride-2 output grid splits the input into 2x2 pixel phases; each
    output position reads rows 2h'+ky-3, which land on the even phase for
    ky in {1,3,5} (offsets -1..1) and the odd phase for ky in {0,2,4,6}
    (offsets -2..1) — so the 49-tap 1-channel conv (input lane dim 1, the
    single worst MXU shape in the model, 2.5 TF/s measured) becomes a
    16-tap 4-channel conv over the half-res grid: same sums, 4x the input
    lane occupancy. Parameter path/shape ('stem'/kernel, (7,7,1,F)) are
    identical to nn.Conv's, so reference .pth conversion is unaffected.
    Odd extents fall back to the direct conv.
    """

    features: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        f = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, f),
            jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        if h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        k = kernel[:, :, 0, :]  # (7, 7, F)
        rows = {
            0: jnp.pad(k[1:6:2], ((1, 0), (0, 0), (0, 0))),  # even: ky 1,3,5
            1: k[0:7:2],                                      # odd: ky 0,2,4,6
        }
        blocks = []
        for py in (0, 1):
            r = rows[py]
            cols = {
                0: jnp.pad(r[:, 1:6:2], ((0, 0), (1, 0), (0, 0))),
                1: r[:, 0:7:2],
            }
            for px in (0, 1):
                blocks.append(cols[px])
        k4 = jnp.stack(blocks, axis=2)  # (4, 4, 4, F), channel = py*2+px
        xp = x.reshape(n, h // 2, 2, w // 2, 2)
        xp = xp.transpose(0, 1, 3, 2, 4).reshape(n, h // 2, w // 2, 4)
        return jax.lax.conv_general_dilated(
            xp, k4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class FeatureHead3D(nn.Module):
    """Two dilated 3D convs + ReLU (unet_small.py:39-49), each lowered via
    _ZTapDilatedConv for MXU-friendly output widths (the ReLU fuses into the
    shift-add epilogue under XLA)."""

    features: int = 32
    normalization: str = "batch"  # unused; reserved for variants
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = _ZTapDilatedConv(
                self.features, dtype=self.dtype, name=f"conv{i}"
            )(x)
            x = nn.relu(x)
        return x


class _PatchStem(nn.Module):
    """4x4 space-to-depth patchify + 1x1 channel embed + k3 mixing conv.

    The TPU-first stem of ``unetw_N``: a 4x4 input patch becomes one
    position with 16 channels (pure reshape, no FLOPs), a 1x1 conv embeds
    16 -> features (a (16, F) matmul — the only narrow-lane op left, and it
    is ~0.1% of the model's FLOPs), then one k3 conv mixes neighbors at
    full width. Compare the parity stem (_Stem): a 49-tap conv on ONE input
    channel, the worst MXU shape in that model (PARITY.md roofline). Inputs
    with H or W not divisible by 4 are zero-padded up and the output grid
    cropped to (H//4, W//4) — this arch has no reference checkpoint to stay
    bit-compatible with, so the padded border definition IS the arch.
    """

    features: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        ph, pw = (-h) % 4, (-w) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hh, ww = (h + ph) // 4, (w + pw) // 4
        x = x.reshape(n, hh, 4, ww, 4, 1)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh, ww, 16)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="embed")(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="mix")(x)
        # crop any ceil-grid rows that are mostly padding so the output grid
        # is exactly (H//4, W//4) — the heatmap target convention
        return x[:, : h // 4, : w // 4, :]


class TomoPickNetW(nn.Module):
    """``unetw_N`` — the lane-filling TPU-first detector.

    Same capability as TomoPickNet (slice-wise 2D trunk + dilated z-context
    head + per-task heads; reference role anchor unet_small.py:30-113) but
    REDESIGNED to the v5e's measured MXU sweet spot instead of the
    reference's 16/32-channel widths (PARITY.md roofline: 128->128 convs
    run at 105 TF/s = 53.6% MFU vs ~20 TF/s at 16/32-out — output-lane
    fill is the binding constraint of the whole parity family):

      * output grid H/4 (config.down_ratio = 4): the heatmap lives on the
        quarter-res grid, so every conv both runs 16x fewer positions per
        slice AND carries 128 channels — the two levers the roofline says
        matter. Sub-pixel accuracy is preserved by peak quantization only
        (<= 2 px xy at input resolution, well under the particle radii the
        eval distance cutoffs use).
      * _PatchStem: zero-FLOP space-to-depth patchify instead of a 1-channel
        k7 conv (input lane fill 16/128 for one cheap 1x1 embed, then full
        width).
      * UNet2D trunk at start_filts=128 (128/256/... per level — every conv
        at or above the full 128 MXU lane width).
      * FeatureHead3D(128): the z-tap lowering emits ONE 128 -> 384 dilated
        conv per layer (3 full output-lane groups).

    No torch conversion by design — this is the "re-designed tpu-first"
    half of the framework's bar; checkpoint migration users keep unet_N.
    """

    heads: Dict[str, int]
    n_blocks: int = 3
    head_conv: int = 128
    width: int = 128
    stem_stride: int = 4           # read by infer/tiled for xy geometry
    bytes_per_voxel: float = 256.0  # f32 activation bytes/input voxel for
    # the auto-xy HBM envelope: ~8 level-0 tensors x 128 ch x 4 B at 1/16
    # the input positions, vs the parity arch's 128 (infer/tiled.py)
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, active_heads=None):
        b, d, h, w = x.shape
        x = x.reshape(b * d, h, w, 1).astype(self.dtype)
        x = _PatchStem(self.width, dtype=self.dtype, name="stem")(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name="stem_bn")(x, use_running_average=not train)
        else:
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name="stem_gn")(x)
        x = nn.relu(x)
        x = UNet2D(
            n_blocks=self.n_blocks,
            start_filts=self.width,
            out_channels=self.width,
            normalization=self.normalization,
            dtype=self.dtype,
            name="unet",
        )(x, train)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, d, hh, ww, self.width)
        x = FeatureHead3D(self.head_conv, dtype=self.dtype,
                          name="feature_head")(x)
        out = {}
        for head, classes in self.heads.items():
            if active_heads is not None and head not in active_heads:
                continue
            y = nn.Conv(
                classes, kernel_size=(3, 1, 1), padding="SAME",
                use_bias=False, dtype=self.dtype, name=head,
            )(x)
            y = y.astype(jnp.float32)
            if "proj" in head:
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12
                )
            out[head] = y
        return out


class TomoPickNet(nn.Module):
    """Slice-wise 2D UNet + dilated 3D head heatmap detector."""

    heads: Dict[str, int]          # e.g. {"hm": 1, "proj": 32}
    n_blocks: int = 4              # arch "unet_4"
    head_conv: int = 32
    stem_features: int = 16
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, active_heads=None):
        """active_heads: optional subset of self.heads to compute (e.g. only
        'hm' for whole-volume picking — skips the proj conv and its
        (D, H', W', C) output tensor). Params for skipped heads are simply
        unused; flax tolerates the extra entries."""
        b, d, h, w = x.shape
        # fold z into batch: (B, D, H, W) -> (B*D, H, W, 1)
        x = x.reshape(b * d, h, w, 1).astype(self.dtype)

        # stem: k7 s2 conv + BN + ReLU (unet_small.py:35-37); down_ratio = 2.
        # explicit (3, 3) padding matches torch's padding=3 alignment (jax
        # SAME would pad (2, 3)) so reference checkpoints convert bit-exactly;
        # lowered via a space-to-depth phase conv for MXU occupancy (_Stem)
        x = _Stem(self.stem_features, dtype=self.dtype, name="stem")(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="stem_bn")(
                x, use_running_average=not train
            )
        else:
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="stem_gn")(x)
        x = nn.relu(x)

        x = UNet2D(
            n_blocks=self.n_blocks,
            start_filts=32,
            out_channels=32,
            normalization=self.normalization,
            dtype=self.dtype,
            name="unet",
        )(x, train)

        # unfold: (B*D, H', W', 32) -> (B, D, H', W', 32)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, d, hh, ww, 32)

        x = FeatureHead3D(self.head_conv, dtype=self.dtype, name="feature_head")(x)

        out = {}
        for head, classes in self.heads.items():
            if active_heads is not None and head not in active_heads:
                continue
            y = nn.Conv(
                classes, kernel_size=(3, 1, 1), padding="SAME", use_bias=False,
                dtype=self.dtype, name=head,
            )(x)
            y = y.astype(jnp.float32)
            if "proj" in head:
                # L2-normalize feature vectors over channels (unet_small.py:92)
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12
                )
            out[head] = y
        return out


def create_detector(config, dtype=None):
    """Build a TomoPickNet from a Config (arch 'unet_N' -> n_blocks=N).

    Mirrors the arch-string parsing of reference models/model.py:65-70.
    """
    arch = config.arch
    n_blocks = int(arch.split("_")[1]) if "_" in arch else 4
    dtype = dtype or {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[config.dtype]
    if arch.startswith("res3dref"):
        # reference-structural TomoRes3DNet mirror: the lossless two-way
        # migration target for reference semi3d checkpoints (z downsampled
        # 2x like the reference, unlike TomoPickNet3D's full-z redesign)
        from cet_pick_tpu.models.detector3d_ref import TomoRes3DRefNet

        return TomoRes3DRefNet(heads=dict(config.heads))
    if arch.startswith(("res3d", "p3d")):
        from cet_pick_tpu.models.detector3d import TomoPickNet3D

        return TomoPickNet3D(
            heads=dict(config.heads),
            n_blocks=n_blocks,
            head_conv=config.head_conv,
            dtype=dtype,
        )
    if arch.startswith("unetw"):
        return TomoPickNetW(
            heads=dict(config.heads),
            n_blocks=n_blocks if "_" in arch else 3,
            head_conv=config.head_conv,
            dtype=dtype,
        )
    return TomoPickNet(
        heads=dict(config.heads),
        n_blocks=n_blocks,
        head_conv=config.head_conv,
        dtype=dtype,
    )
