"""Whole-volume heatmap inference, tiled along z with halo overlap.

The reference pushes entire 512x512x256 volumes through the net in one
forward (reference: cet_pick/test.py:77-85, detectors/tomo_det.py:23-40) and
relies on 32 GB GPUs plus ad-hoc validation crops when that OOMs
(datasets/particle_moco.py:171-177). The TPU-native design instead streams
fixed-shape z-tiles through a single compiled program:

* the 2D UNet trunk is slice-wise (no z mixing), and the 3D head's z
  receptive field is exactly +-3 (two k3/dil-1 convs + one k(3,1,1) head,
  models/networks/unet_small.py:39-61), so a halo of 3 slices makes tiled
  output bit-identical to the full-volume forward in the tile interior;
* every tile has the same static shape -> ONE XLA compilation, double
  buffering between HBM transfers and compute comes from jax async dispatch
  (the next tile's host->device copy overlaps the current tile's compute);
* NMS/top-K decode runs once on the stitched full heatmap, so tile
  boundaries cannot split or duplicate peaks.

Volumes are never zero-padded: tile windows near the z borders are shifted
INWARD (window start clamped to [0, d - win]), so every core slice either has
>= halo slices of real context inside its window or sits at the true volume
border where the convolutions' own zero padding applies — exactly as in a
full-volume forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Z_HALO = 3  # z receptive-field radius of the 3D head (unet_small.py:39-61)

# xy tiling (single-chip large-volume path; --tile D H W consumes H, W here):
# unlike z — where the 2D UNet mixes nothing — the whole network mixes xy, so
# the halo must cover the full architectural xy receptive field. Window
# starts must also stay on the total-downsample grid (stem 2 x 2^(n_blocks-1)
# max pools), or the ceil-mode pools pair different pixels than the
# full-volume forward and exactness dies.


def xy_align(n_blocks: int, stem_stride: int = 2) -> int:
    """Total xy downsample stride: stem x pool(2)^(n_blocks-1)."""
    return stem_stride * 2 ** (n_blocks - 1)


def xy_halo(n_blocks: int, stem_stride: int = 2) -> int:
    """Architectural xy receptive-field radius in INPUT pixels, rounded up
    to the pooling grid. One-sided analytic bound at the UNet grid (=
    input / stem_stride), summing (kernel reach) x (dilation x stride) per
    layer: down-path k3 convs 2*(2^n - 1), up-path k3 convs 2*(2^(n-1) -
    1), ceil-mode k2 pools 2^(n-1) - 1, k2s2 transposed convs 2^(n-1) - 1,
    two dil-4 k3 head convs 8 — total 2^(n+2) + 2; scaled to input pixels
    by the stem stride, plus the stem's own reach (k7s2: 6 input px for
    the parity arch; patchify + k3 mix conv: one UNet-grid cell =
    stem_stride px for unetw). An abs-weights impulse probe measures 108
    for n_blocks=4 against this bound's 144
    (tests/test_infer.py::test_xy_tiled_matches_full)."""
    raw = stem_stride * (2 ** (n_blocks + 2) + 2)
    raw += 6 if stem_stride == 2 else stem_stride
    a = xy_align(n_blocks, stem_stride)
    return -(-raw // a) * a


class TiledHeatmapInference:
    """Jitted z-tiled (and optionally xy-tiled) `hm` forward for one model +
    params."""

    # auto-xy-tiling envelope: rough activation bytes per input voxel of the
    # batched fused forward, and the HBM budget those may occupy before
    # fused() tiles xy on its own (v5e has 16 GB; leave headroom for
    # params/volume/heatmap/workspace). 224 B/voxel is calibrated against a
    # real 512x1024x1024 unet_5 run: the z-tap head's (D, H/2, W/2, 96)
    # f32 intermediate alone is 96 B/voxel and two can coexist across the
    # head convs — the earlier 128 B/voxel estimate let a 9.4 GB-estimated
    # streamed window through that RESOURCE_EXHAUSTED the chip.
    BYTES_PER_VOXEL = 224.0
    AUTO_XY_BUDGET = 12e9

    def __init__(self, model, params, batch_stats, tile_z: int = 64,
                 halo: int = Z_HALO, tile_xy=None, mesh=None,
                 tta: bool = False):
        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.tile_z = int(tile_z)
        self.halo = int(halo)
        # flip test-time augmentation (--tta, no reference analog): average
        # the heatmap over the 4 xy-flip views of every window. Well-founded
        # for this model family — refinement training carries an explicit
        # flip-consistency loss (train/refine.py), so the flip views are
        # calibrated ensemble members. 4x the forward compute; exactness
        # tests run with it both off (default, bit-identical to the
        # reference) and on (tiled == full still holds: window starts stay
        # on the pooling grid under reflection because extents, tiles and
        # halos are all align-multiples).
        self.tta = bool(tta)
        # (tile_h, tile_w) in input pixels, 0/None = never tile that axis
        self.tile_xy = tuple(int(t) for t in tile_xy) if tile_xy else None
        # CET_XY_BUDGET: test/ops escape hatch to force the auto-xy HBM
        # envelope at small scales (CI drives the engaged path end-to-end
        # through the real CLI; benchmarks/giant_volume.py proves it at
        # OOM scale on the chip)
        import os as _os

        self.auto_xy_budget = float(
            _os.environ.get("CET_XY_BUDGET", self.AUTO_XY_BUDGET))
        n_blocks = int(getattr(model, "n_blocks", 4))
        # output stride / stem downsample (2 for the parity family, 4 for
        # the unetw TPU-first arch); drives window alignment, core slicing
        # and the TTA grid constraint
        self.xy_down = int(getattr(model, "stem_stride", 2))
        self.xy_halo = xy_halo(n_blocks, self.xy_down)
        self.xy_align = xy_align(n_blocks, self.xy_down)
        self.bytes_per_voxel = float(
            getattr(model, "bytes_per_voxel", self.BYTES_PER_VOXEL)
        )
        # multi-chip sharding (--mesh_shape on test/watch): params
        # replicated, every forward's H axis partitioned over the mesh's
        # trailing ("space") axis with XLA-inserted conv halo exchanges;
        # outputs replicated so decode and stitching are unchanged. A 2D
        # ("data", "space") mesh additionally shards the z dimension — the
        # fused window batch, or a single window's slices (the trunk folds z
        # into batch either way, so this is plain DP over a volume's own
        # tiles; only the 3D head's +-3 z reach exchanges halos).
        self._vol_shard = self._tile_shard = self._win_shard = None
        self._repl = None
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            space = mesh.axis_names[-1]
            data = mesh.axis_names[0] if len(mesh.axis_names) > 1 else None
            self._vol_shard = NamedSharding(
                mesh, PartitionSpec(None, space, None))
            self._tile_shard = NamedSharding(
                mesh, PartitionSpec(data, space, None))
            self._win_shard = NamedSharding(
                mesh, PartitionSpec(data, None, space, None))
            self._repl = NamedSharding(mesh, PartitionSpec())
            self.variables = jax.device_put(self.variables, self._repl)
        tile_shard, repl = self._tile_shard, self._repl

        @functools.partial(jax.jit, out_shardings=repl)
        def _tile_forward(variables, tile, lo, hi):
            if tile_shard is not None:
                tile = jax.lax.with_sharding_constraint(tile, tile_shard)
            # affine dequantization fuses into the stem conv's input read;
            # float inputs pass through unchanged via (lo, hi) = (0, 1)
            x = (tile.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-12)
            # (1, tz, H, W) -> (tz, H', W') probabilities
            return self._hm_probs(variables, x[None])[0]

        self._tile_forward = _tile_forward

    def _hm_probs(self, variables, x):
        """(B, D, H, W) float input -> (B, D, H', W') heatmap probabilities.

        With ``tta`` the 4 xy-flip views ride the conv batch together (one
        compiled program, 4x batch) and the un-flipped probabilities are
        averaged. Un-flipping is a pure reversal of the output axis for even
        extents: output cell j of the flipped input covers original inputs
        {W-1-2j, W-2-2j}, i.e. original cell W' - 1 - j."""
        from cet_pick_tpu.ops.nms import sigmoid_clamped

        if self.tta:
            x = jnp.concatenate(
                [x, x[..., ::-1], x[..., ::-1, :], x[..., ::-1, ::-1]],
                axis=0,
            )
        out = self.model.apply(variables, x, train=False, active_heads=("hm",))
        hm = sigmoid_clamped(out["hm"][..., 0])
        if self.tta:
            h0, hlr, hud, hb = jnp.split(hm, 4, axis=0)
            hm = (h0 + hlr[..., ::-1] + hud[..., ::-1, :]
                  + hb[..., ::-1, ::-1]) * 0.25
        return hm

    def _check_tta_shape(self, h, w):
        """Flip-TTA's output un-flip mapping needs even xy extents (odd
        extents put the two grids half a cell apart)."""
        dn = self.xy_down
        if self.tta and (h % dn or w % dn):
            raise ValueError(
                f"--tta needs H and W divisible by the output stride {dn} "
                f"(got {h}x{w}); pad/crop the volume or drop --tta"
            )

    def _put_volume(self, volume):
        """Host volume -> device, directly into the spatial sharding when a
        mesh is active (a single-device put would bounce through one HBM)."""
        if isinstance(volume, jax.Array):
            return volume
        if self._vol_shard is not None:
            return jax.device_put(volume, self._vol_shard)
        return jax.device_put(volume)

    def _window_plan(self, d):
        """Static (start, core_lo, core_hi) per tile for depth d."""
        tz, halo = self.tile_z, self.halo
        win = tz + 2 * halo
        plan = []
        n_tiles = -(-d // tz)
        for t in range(n_tiles):
            z0 = t * tz
            z1 = min(z0 + tz, d)
            s = min(max(z0 - halo, 0), d - win)
            plan.append((s, z0 - s, z1 - s))
        return tuple(plan), win

    def _xy_plan(self, dim, tile):
        """Shifted-inward xy window plan, or None when one window covers the
        axis. Starts/cores stay on the pooling grid (see xy_halo/xy_align)."""
        halo, align = self.xy_halo, self.xy_align
        if not tile:
            return None
        tile = max(tile - tile % align, align)
        win = tile + 2 * halo
        if dim <= win:
            return None
        if dim % align:
            # misaligned extents cannot tile exactly (window starts would
            # leave the pooling grid); fall back to the untiled forward on
            # this axis rather than failing a default-config run
            import warnings

            warnings.warn(
                f"xy extent {dim} is not a multiple of {align}; running "
                f"this axis untiled (pad/crop the volume to enable xy "
                f"tiling)", stacklevel=3,
            )
            return None
        plan = []
        for t in range(-(-dim // tile)):
            a0 = t * tile
            a1 = min(a0 + tile, dim)
            s = min(max(a0 - halo, 0), dim - win)
            plan.append((s, a0, a1))
        return tuple(plan), win

    def _auto_xy(self, n_windows, win_d, h, w):
        """Pick a square (tile_h, tile_w) when the fused window batch would
        exceed the HBM activation budget; None when it fits untiled.

        The reference's answer to volumes that do not fit is a hand-placed
        validation crop (particle_moco.py:171-177); here oversized volumes
        tile themselves with the exact full-network halo instead — same
        bits, bounded memory."""
        import math

        views = 4 if self.tta else 1  # flip-TTA rides the conv batch
        est = views * n_windows * win_d * h * w * self.bytes_per_voxel
        if est <= self.auto_xy_budget:
            return None
        a, halo = self.xy_align, self.xy_halo
        max_win_area = self.auto_xy_budget / (
            views * n_windows * win_d * self.bytes_per_voxel
        )
        side = int(math.floor(math.sqrt(max_win_area))) - 2 * halo
        tile = max(a, side - side % a)
        return (tile, tile)

    def _window_batch_est(self, n_windows, win_d, h, w, tile_xy):
        """Activation estimate of the fused window batch AFTER xy tiling at
        ``tile_xy`` (per-axis window extent = clamped tile + 2*halo, or the
        full extent where that axis is untiled/opted out)."""
        views = 4 if self.tta else 1
        a, halo = self.xy_align, self.xy_halo

        def extent(t, dim):
            if not t:
                return dim
            t = max(t - t % a, a)
            return min(dim, t + 2 * halo)

        wh, ww = extent(tile_xy[0], h), extent(tile_xy[1], w)
        return views * n_windows * win_d * wh * ww * self.bytes_per_voxel

    def _effective_xy(self, n_windows, win_d, h, w):
        """Merge the explicit ``--tile H W`` with the auto HBM envelope: the
        smaller tile wins per axis, so the always-set default-config tile
        (512, 512) can never bypass the OOM protection — without the merge
        any volume whose extent fits inside one explicit window (<= tile +
        2*halo) ran untiled no matter how many z-windows the fused batch
        stacked. An explicit 0 still opts that axis out entirely (expert
        escape hatch). The envelope estimate uses the untiled extents, so a
        clamp can be slightly conservative when the explicit tile alone
        would have fit; the budget is a rough bound either way."""
        auto = self._auto_xy(n_windows, win_d, h, w)
        if auto is None:
            return self.tile_xy
        if self.tile_xy is None:
            return auto
        return tuple(t if t == 0 else min(t, a)
                     for t, a in zip(self.tile_xy, auto))

    def _xy_tiled(self, volume, lo, hi, z_forward, tile_xy=None):
        """Decompose xy, run ``z_forward`` per xy window, stitch output cores
        (output grid = input/2). Returns None when no xy tiling is needed."""
        d, h, w = volume.shape
        tile_xy = tile_xy if tile_xy is not None else self.tile_xy
        th, tw = tile_xy if tile_xy else (0, 0)
        hplan = self._xy_plan(h, th)
        wplan = self._xy_plan(w, tw)
        if hplan is None and wplan is None:
            return None
        # passthrough axes keep the window's FULL output extent (slice(None))
        # — the output there is ceil(dim/2), which floor-division would clip
        # for odd extents; tiled axes are all-even by construction, so the
        # exact core is [ (a0-s)/2, (a1-s)/2 )
        hp, hwin = hplan if hplan else ((None,), h)
        wp, wwin = wplan if wplan else ((None,), w)

        def core(entry):
            if entry is None:
                return 0, slice(None)
            s, a0, a1 = entry
            dn = self.xy_down
            return s, slice((a0 - s) // dn, (a1 - s) // dn)

        volume = self._put_volume(volume)
        rows = []
        for he in hp:
            sy, ysl = core(he)
            cols = []
            for we in wp:
                sx, xsl = core(we)
                window = jax.lax.slice(
                    volume, (0, sy, sx), (d, sy + hwin, sx + wwin)
                )
                hm = z_forward(window)
                cols.append(hm[:, ysl, xsl])
            rows.append(jnp.concatenate(cols, axis=2) if len(cols) > 1
                        else cols[0])
        return jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]

    def fused(self, volume, lo: float = 0.0, hi: float = 1.0):
        """Whole-volume heatmap in ONE device dispatch.

        All tile windows are gathered, batched through the model together
        (z folds into one large conv batch), and the cores re-stitched —
        inside a single jit. On remote-attached TPUs this removes the
        per-tile dispatch round-trips that otherwise dominate; on directly
        attached chips it trades peak activation memory for utilization.
        Results are bit-identical to the streamed path.
        """
        d, h, w = volume.shape
        self._check_tta_shape(h, w)
        tz, halo = self.tile_z, self.halo
        if d <= tz + 2 * halo:
            n_win, win_d = 1, d
        else:
            plan, win_d = self._window_plan(d)
            n_win = len(plan)
        txy = self._effective_xy(n_win, win_d, h, w)
        if txy is not None and n_win > 1 and self._window_batch_est(
                n_win, win_d, h, w, txy) > self.auto_xy_budget:
            # even at the clamped tile the fused batch (ALL z windows live)
            # cannot fit the budget — the envelope's tile floor is the
            # alignment, and with a halo-dominated window (deep volume x
            # large halo) the floored window still blows HBM (observed: a
            # 512x1024x1024 run allocated a 22.7 GB head intermediate).
            # Stream the z windows instead: __call__ keeps ONE window live
            # and re-derives its own (much larger) tile. Bit-identical.
            return self(volume, lo=lo, hi=hi)
        tiled = self._xy_tiled(
            volume, lo, hi, lambda win_: self.fused(win_, lo=lo, hi=hi),
            tile_xy=txy,
        )
        if tiled is not None:
            return tiled
        if d <= tz + 2 * halo:
            return self._forward_z(volume, lo=lo, hi=hi)
        plan, win = self._window_plan(d)
        volume = self._put_volume(volume)

        if not hasattr(self, "_fused_fns"):
            # bounded compile cache: each distinct (shape, dtype, plan)
            # pins an XLA executable; evict least-recently-used beyond 8 so
            # a long-lived service over heterogeneous volumes cannot leak
            from collections import OrderedDict

            self._fused_fns = OrderedDict()
        key = (d,) + volume.shape[1:] + (str(volume.dtype), plan)
        if key in self._fused_fns:
            self._fused_fns.move_to_end(key)
        else:
            while len(self._fused_fns) >= 8:
                self._fused_fns.popitem(last=False)

            vol_shard, win_shard = self._vol_shard, self._win_shard
            repl = self._repl

            @functools.partial(jax.jit, out_shardings=repl)
            def _fused(variables, vol, lo_, hi_):
                if vol_shard is not None:
                    vol = jax.lax.with_sharding_constraint(vol, vol_shard)
                windows = jnp.stack([
                    jax.lax.slice_in_dim(vol, s, s + win, axis=0)
                    for s, _, _ in plan
                ])
                if win_shard is not None:
                    # 2D mesh: window batch over "data", H over "space"
                    windows = jax.lax.with_sharding_constraint(
                        windows, win_shard)
                x = (windows.astype(jnp.float32) - lo_) / jnp.maximum(
                    hi_ - lo_, 1e-12
                )
                hm = self._hm_probs(variables, x)  # (T, win, H', W')
                cores = [hm[i, c0:c1] for i, (_, c0, c1) in enumerate(plan)]
                return jnp.concatenate(cores, axis=0)

            self._fused_fns[key] = _fused
        return self._fused_fns[key](
            self.variables, volume, jnp.float32(lo), jnp.float32(hi)
        )

    def __call__(self, volume: np.ndarray, lo: float = 0.0,
                 hi: float = 1.0) -> jnp.ndarray:
        """volume: (D, H, W) float32 — or uint8 with (lo, hi) dequantization
        bounds from ``io.loader.preprocess_quantized`` (the uint8 path ships
        4x fewer bytes to the device) -> stitched (D, H//2, W//2) heatmap
        probabilities (device array).

        Windows are shifted inward at the volume borders (never zero-padded),
        so every core slice either has >= halo slices of real context inside
        its window or sits at the true volume border where the convolutions'
        own zero padding applies — the stitched result is bit-identical to a
        single full-volume forward. When ``tile_xy`` is set and the volume
        exceeds it, the same scheme tiles H/W with the full-network xy halo.
        """
        d, h, w = volume.shape
        self._check_tta_shape(h, w)
        win_d = min(d, self.tile_z + 2 * self.halo)
        txy = self._effective_xy(1, win_d, h, w)  # streamed: 1 window live
        tiled = self._xy_tiled(
            volume, lo, hi, lambda win_: self._forward_z(win_, lo=lo, hi=hi),
            tile_xy=txy,
        )
        if tiled is not None:
            return tiled
        return self._forward_z(volume, lo=lo, hi=hi)

    def _forward_z(self, volume, lo: float = 0.0, hi: float = 1.0):
        d, h, w = volume.shape
        # ONE bulk async host->device transfer, then slice on device.
        # jax.device_put streams ~GB/s where jnp.asarray / per-tile host
        # slices fall into a ~40 MB/s synchronous path on remote-attached
        # TPU runtimes — and per-tile sends would ship halo rows twice.
        volume = self._put_volume(volume)
        lo = jnp.float32(lo)
        hi = jnp.float32(hi)
        plan, win = self._window_plan(d)
        if d <= win:
            # single window covers the volume; exact by construction
            return self._tile_forward(self.variables, volume, lo, hi)

        cores = []
        for s, core_lo, core_hi in plan:
            window = jax.lax.slice_in_dim(volume, s, s + win, axis=0)
            hm = self._tile_forward(self.variables, window, lo, hi)
            cores.append(hm[core_lo:core_hi])
        return jnp.concatenate(cores, axis=0)
