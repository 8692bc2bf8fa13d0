"""Jitted, batched image augmentations for exploration training.

TPU-native rebuild of the reference's torchvision transform pipelines
(reference: cet_pick/datasets/tomo_pre_proj_angle_select_new2d3d.py:49-82 and
cet_pick/utils/image.py:195-324). The reference runs these per-sample on CPU
DataLoader workers; here every augmentation is a pure jax function of
(image, PRNG key), vmapped over the batch and fused into the training step —
the augmentations execute on the VPU between the host transfer and the conv
stack, costing ~nothing.

All functions take (C, H, W) images (the 2d/3d patch pair is stacked along C
so both receive identical spatial randomness, exactly like torchvision's
Compose over a 2-channel tensor). Shapes are static; randomness flows through
explicit keys.

Pipelines (matching the reference's strong/weak compositions):
  2d3d mode (tomo_pre_proj_angle_select_new2d3d.py:49-82):
    strong: hflip(.5) -> vflip(.5) -> rotate(±30°) -> center-crop ->
            corner-erase(.5) -> rot90(k~U{0..3}) -> normalize
    weak:   same without the continuous rotation
  3d-only mode (tomo_pre_proj_angle_select_new3d_vol.py:49-89):
    hflip(.5) -> vflip(.5) -> ColorJitter(0.5,0.2,0.3,0.1) ->
    RandomResizedCrop(scale 0.8-1.0 strong / 0.9-1.0 weak, ratio 1) ->
    rot90 -> normalize
    (on single-channel data ColorJitter reduces to brightness*U[0.5,1.5]
    and contrast blending with factor U[0.8,1.2], applied in random order —
    torchvision's saturation/hue are identity on grayscale)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def random_hflip(img, key, p=0.5):
    return jnp.where(jax.random.uniform(key) < p, img[:, :, ::-1], img)


def random_vflip(img, key, p=0.5):
    return jnp.where(jax.random.uniform(key) < p, img[:, ::-1, :], img)


def rot90_random(img, key):
    """Rotate by k*90° with k ~ U{0..3} (image.py:195-201)."""
    k = jax.random.randint(key, (), 0, 4)
    branches = [lambda x, kk=kk: jnp.rot90(x, k=kk, axes=(1, 2)) for kk in range(4)]
    return jax.lax.switch(k, branches, img)


def _gather_2x2(img, y0, x0):
    """One (C, 2, 2) patch per output pixel via a single ``lax.gather``,
    falling back to four per-tap gathers for single-channel images.

    For C >= 2 the patch gather beats fetching each bilinear tap separately
    (the taps are contiguous; measured on the v5e via
    benchmarks/aug_profile.py: rrc 12 -> 7 ms at C=2). For C == 1, XLA's
    TPU lowering of the (1, 2, 2)-slice gather degenerates to a scalar
    loop — 714 ms vs 34 ms for plain per-tap advanced indexing at bs=256
    (measured; a squeezed rank-2 (2, 2)-slice gather is equally slow) — so
    single-channel images take the per-tap path. Identical values either
    way. ``img`` must already be padded so that clamping the patch start to
    [0, H-2] never shifts a wanted tap. Returns (H', W', C, 2, 2)."""
    c, h, w = img.shape
    shape = y0.shape
    if c == 1:
        yc = jnp.clip(y0, 0, h - 2)
        xc = jnp.clip(x0, 0, w - 2)
        rows = []
        for dy in (0, 1):
            rows.append(jnp.stack(
                [img[0, yc + dy, xc], img[0, yc + dy, xc + 1]], axis=-1
            ))
        return jnp.stack(rows, axis=-2)[..., None, :, :]
    starts = jnp.stack(
        [jnp.clip(y0, 0, h - 2).ravel(), jnp.clip(x0, 0, w - 2).ravel()],
        axis=-1,
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
    )
    patches = jax.lax.gather(
        img, starts, dnums, slice_sizes=(c, 2, 2),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return patches.reshape(shape + (c, 2, 2))


def _bilinear_sample(img, ys, xs):
    """Sample (C, H, W) at float coords (H', W') grids, zero padding."""
    c, h, w = img.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    # zero-pad by one so the patch at y0 = -1 or h-1 reads real zeros; taps
    # further out are zeroed by the validity masks below
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1)))
    p = _gather_2x2(imgp, y0 + 1, x0 + 1)  # (H', W', C, 2, 2)

    vy0 = ((y0 >= 0) & (y0 < h))[..., None].astype(img.dtype)
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h))[..., None].astype(img.dtype)
    vx0 = ((x0 >= 0) & (x0 < w))[..., None].astype(img.dtype)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w))[..., None].astype(img.dtype)

    out = (
        p[..., 0, 0] * ((1 - wy) * (1 - wx) * vy0 * vx0)
        + p[..., 0, 1] * ((1 - wy) * wx * vy0 * vx1)
        + p[..., 1, 0] * (wy * (1 - wx) * vy1 * vx0)
        + p[..., 1, 1] * (wy * wx * vy1 * vx1)
    )
    return jnp.moveaxis(out, -1, 0)  # (C, H', W')


def random_rotate(img, key, max_deg=30.0):
    """Continuous rotation about the image center, bilinear, zero fill
    (torchvision RandomRotation(30) semantics)."""
    c, h, w = img.shape
    theta = jax.random.uniform(key, (), minval=-max_deg, maxval=max_deg)
    theta = theta * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    yr = yy - cy
    xr = xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = cos * yr - sin * xr + cy
    xs = sin * yr + cos * xr + cx
    return _bilinear_sample(img, ys, xs)


def center_crop(img, out_h, out_w):
    c, h, w = img.shape
    top = (h - out_h) // 2
    left = (w - out_w) // 2
    return img[:, top : top + out_h, left : left + out_w]


def corner_erase(img, key, p=0.5, scale=(0.01, 0.02), ratio=(0.5, 1.5), value=1.0):
    """Erase one random rectangle placed off-center (image.py:249-324).

    The reference rejects rectangles overlapping the central ±6 px band and
    retries up to 10x; here the placement is sampled directly in the allowed
    off-center quadrants (same distribution family, no rejection loop —
    rejection loops don't trace)."""
    c, h, w = img.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    mid_h, mid_w = h // 2, w // 2
    area = h * w
    erase_area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1]) * area
    log_r = jnp.log(jnp.asarray(ratio))
    aspect = jnp.exp(jax.random.uniform(k2, (), minval=log_r[0], maxval=log_r[1]))
    eh = jnp.clip(jnp.round(jnp.sqrt(erase_area * aspect)), 1, max(mid_h - 7, 1)).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(erase_area / aspect)), 1, max(mid_w - 7, 1)).astype(jnp.int32)

    # top-left corner: either in [0, mid-h-6) or [mid+6, H-h)
    def side(kk, m, size, extent):
        ku, ka, kb = jax.random.split(kk, 3)
        hi1 = jnp.maximum(m - size - 6, 1)
        lo2 = m + 6
        hi2 = jnp.maximum(extent - size, lo2 + 1)
        u = jax.random.randint(ku, (), 0, 2)
        a = jax.random.randint(ka, (), 0, hi1)
        b = jax.random.randint(kb, (), lo2, hi2)
        return jnp.where(u == 0, a, b)

    i = side(k3, mid_h, eh, h)
    j = side(k4, mid_w, ew, w)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    mask = (yy >= i) & (yy < i + eh) & (xx >= j) & (xx < j + ew)
    erased = jnp.where(mask[None], jnp.asarray(value, img.dtype), img)
    return jnp.where(jax.random.uniform(k5) < p, erased, img)


def color_jitter(img, key, brightness=0.5, contrast=0.2):
    """torchvision ColorJitter(0.5, 0.2, 0.3, 0.1) on single-channel input
    (tomo_pre_proj_angle_select_new3d_vol.py:53/77): saturation and hue are
    identity on grayscale, leaving brightness (img * U[1-b, 1+b]) and
    contrast ((img - mean)*U[1-c, 1+c] + mean, mean over the grayscale image)
    applied in random order.

    Each op CLAMPS its result to [0, 1]: the reference runs ColorJitter on a
    uint8 PIL 'L' image (ToPILImage multiplies the min-max-normalized patch
    by 255) where every ImageEnhance blend saturates at [0, 255] — and
    torchvision's float-tensor path clamps identically (_blend's
    .clamp(0, bound)). With fb in [0.5, 1.5] roughly half the draws hit the
    bright clamp, so omitting it shifts the training-view intensity
    distribution. The sub-1/255 uint8 quantization is not reproduced."""
    kb, kc, ko = jax.random.split(key, 3)
    fb = jax.random.uniform(kb, (), minval=1.0 - brightness, maxval=1.0 + brightness)
    fc = jax.random.uniform(kc, (), minval=1.0 - contrast, maxval=1.0 + contrast)

    def bright(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def contr(x):
        m = jnp.mean(x)
        return jnp.clip((x - m) * fc + m, 0.0, 1.0)

    return jnp.where(
        jax.random.uniform(ko) < 0.5,
        contr(bright(img)),
        bright(contr(img)),
    )


def _interp_matrix(src, n):
    """(m, n) linear-interp operator with edge clamping: row i holds the
    two bilinear tap weights for source position src[i] (exactly
    _bilinear_sample_clamped's 1D semantics — clip, floor, blend). Built
    from iota comparisons: matmul-friendly, no gather."""
    s = jnp.clip(src, 0.0, n - 1.0)
    i0 = jnp.floor(s).astype(jnp.int32)
    f = (s - i0)[:, None]
    j = jnp.arange(n)[None, :]
    t0 = (j == i0[:, None]).astype(s.dtype)
    t1 = (j == jnp.minimum(i0 + 1, n - 1)[:, None]).astype(s.dtype)
    return (1.0 - f) * t0 + f * t1


def random_resized_crop(img, key, out_size, scale=(0.8, 1.0)):
    """torchvision RandomResizedCrop(out, scale, ratio=(1,1)) semantics:
    crop a square covering an area fraction ~U[scale] at a uniform-random
    location, bilinear-resize to (out_size, out_size). Crop+resize are
    axis-SEPARABLE, so the whole op is two small interp-matrix matmuls
    (out = Ry · img · Rx^T) — value-identical to the fused bilinear gather
    it replaces (same clamp/floor/blend math; the batched 2x2-tap gather
    lowers far off bandwidth on TPU, see _rotate_vol_xy_shear). top/left/
    side are continuous rather than torchvision's integer sampling — same
    distribution family."""
    c, h, w = img.shape
    ka, ki, kj = jax.random.split(key, 3)
    area_frac = jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1])
    # square crop (ratio fixed at 1): side = sqrt(area_frac * H * W)
    side = jnp.sqrt(area_frac * h * w)
    side = jnp.minimum(side, float(min(h, w)))
    top = jax.random.uniform(ki, ()) * (h - side)
    left = jax.random.uniform(kj, ()) * (w - side)
    # sample grid: out_size points spanning [top, top+side) like PIL resize
    # (pixel centers at top + (i + 0.5) * side/out - 0.5)
    step = side / out_size
    idx = (jnp.arange(out_size) + 0.5) * step - 0.5
    ry = _interp_matrix(top + idx, h)     # (out, H)
    rx = _interp_matrix(left + idx, w)    # (out, W)
    return jnp.einsum("ir,crw,jw->cij", ry, img, rx)


def _bilinear_sample_clamped(img, ys, xs):
    """Bilinear sample with edge clamping (PIL resize semantics — no zero
    fill, unlike the rotation path's _bilinear_sample). Same one-gather
    2x2-patch lowering as _bilinear_sample; edge padding reproduces the
    ``min(y0 + 1, h - 1)`` tap clamp exactly."""
    c, h, w = img.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    p = _gather_2x2(imgp, y0 + 1, x0 + 1)  # (H', W', C, 2, 2)
    out = (
        p[..., 0, 0] * ((1 - wy) * (1 - wx))
        + p[..., 0, 1] * ((1 - wy) * wx)
        + p[..., 1, 0] * (wy * (1 - wx))
        + p[..., 1, 1] * (wy * wx)
    )
    return jnp.moveaxis(out, -1, 0)


def normalize(img, mean, std):
    """Per-channel (C,) mean/std normalization."""
    mean = jnp.asarray(mean, img.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(std, img.dtype).reshape(-1, 1, 1)
    return (img - mean) / std


@partial(jax.jit, static_argnames=("out_size", "strong"))
def simsiam_augment(imgs, keys, mean, std, out_size, strong=True):
    """Batched strong/weak pipeline: imgs (B, C, H, W), keys (B, 2) uint32.

    Returns (B, C, out_size, out_size)."""

    def one(img, key):
        ks = jax.random.split(key, 5)
        x = random_hflip(img, ks[0])
        x = random_vflip(x, ks[1])
        if strong:
            # Paeth 3-shear rotation (see _rotate_vol_xy_shear): 2.3x the
            # batched bilinear gather at this shape on v5e (12.0 -> 5.1 ms
            # for the member at bs 256); same rotation family, 3-pass
            # linear interpolation (slightly stronger high-frequency
            # low-pass than one bilinear resample — quality re-gated by the
            # long-run separability test)
            theta = jax.random.uniform(ks[2], (), minval=-30.0, maxval=30.0)
            x = _rotate_vol_xy_shear(x, theta * jnp.pi / 180.0)
        x = center_crop(x, out_size, out_size)
        x = corner_erase(x, ks[3], p=0.5, scale=(0.01, 0.02), ratio=(0.5, 1.5))
        x = rot90_random(x, ks[4])
        return normalize(x, mean, std)

    return jax.vmap(one)(imgs, keys)


@partial(jax.jit, static_argnames=("out_size", "strong"))
def simsiam_augment_3d(imgs, keys, mean, std, out_size, strong=True):
    """Batched 3d-only-mode pipeline (rec-only exploration, no tilt series):
    imgs (B, C, H, W), keys (B, 2) uint32 -> (B, C, out_size, out_size).

    Matches tomo_pre_proj_angle_select_new3d_vol.py:49-89: flips ->
    ColorJitter -> RandomResizedCrop(0.8-1.0 strong / 0.9-1.0 weak, square)
    -> rot90 -> normalize. No continuous rotation or corner erasing (those
    are the 2d3d pipeline's; the reference comments them out here)."""
    scale = (0.8, 1.0) if strong else (0.9, 1.0)

    def one(img, key):
        ks = jax.random.split(key, 5)
        x = random_hflip(img, ks[0])
        x = random_vflip(x, ks[1])
        x = color_jitter(x, ks[2])
        x = random_resized_crop(x, ks[3], out_size, scale=scale)
        x = rot90_random(x, ks[4])
        return normalize(x, mean, std)

    return jax.vmap(one)(imgs, keys)


# -- 3D subvolume pipeline (task ``simsiam``) ---------------------------------
#
# Behavioral rebuild of the reference's subvolume augmentations: the tio
# Compose at datasets/tomo_pre.py:53-62 (RandomBlur(0-1, p=.15) ->
# RandomNoise(p=.5) -> RandomAffine(z-rotation 0-60deg, p=.75) ->
# Crop(size//8 per side) -> ZNorm -> Rescale(-3,3) -> ZNorm) followed by the
# per-view flips and block corruptions of datasets/particle_pre.py:48-87
# (flip_ud/flip_lr at p=1/3 each, then one of drop_out / center_out /
# swap_out at p=.25 each — utils/image.py:481-524). Both views draw from the
# SAME distribution (no strong/weak split in this mode). Differences by
# design: rotation fills with zeros instead of tio's minimum-pad (the border
# is cropped away right after), and the blur is a 3x3 xy binomial blend
# rather than a variable-sigma gaussian (sigma ~ U(0,1) blurs sub-pixel).


def _znorm(x):
    return (x - jnp.mean(x)) / jnp.maximum(jnp.std(x), 1e-6)


def _rescale(x, lo=-3.0, hi=3.0):
    mn, mx = jnp.min(x), jnp.max(x)
    return lo + (x - mn) / jnp.maximum(mx - mn, 1e-12) * (hi - lo)


def _blur_xy(vol, t):
    """3x3 binomial xy blur blended by strength t in [0, 1] (per z-slice)."""
    p = jnp.pad(vol, ((0, 0), (1, 1), (0, 0)), mode="edge")
    b = p[:, :-2] * 0.25 + p[:, 1:-1] * 0.5 + p[:, 2:] * 0.25
    p = jnp.pad(b, ((0, 0), (0, 0), (1, 1)), mode="edge")
    b = p[..., :-2] * 0.25 + p[..., 1:-1] * 0.5 + p[..., 2:] * 0.25
    return vol * (1.0 - t) + b * t


def _rotate_vol_xy(vol, theta):
    """Rotate every z-slice by the same angle about the xy center (the
    z-axis rotation of the reference's RandomAffine). The (D, H, W) volume
    rides through _bilinear_sample as D channels — one fused gather."""
    d, h, w = vol.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    yr, xr = yy - cy, xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = cos * yr - sin * xr + cy
    xs = sin * yr + cos * xr + cx
    return _bilinear_sample(vol, ys, xs)


def _offcenter_start(key, dim, diam):
    """Random block start avoiding the central band, matching the sampling
    ranges of utils/image.py:481-517: U([0, mid-2*diam) + [mid+diam,
    dim-diam))."""
    mid = dim // 2
    n1 = max(mid - 2 * diam, 0)
    lo2 = mid + diam
    n2 = max(dim - diam - lo2, 0)
    u = jax.random.randint(key, (), 0, max(n1 + n2, 1))
    start = jnp.where(u < n1, u, lo2 + (u - n1))
    return jnp.clip(start, 0, max(dim - diam, 0))


def _block_mask(starts, diams, shape):
    """(D, H, W) bool mask of the block at dynamic ``starts``."""
    masks = []
    for ax, (s, dd, n) in enumerate(zip(starts, diams, shape)):
        i = jnp.arange(n)
        masks.append((i >= s) & (i < s + dd))
    return (masks[0][:, None, None] & masks[1][None, :, None]
            & masks[2][None, None, :])


def _drop_out(vol, key, diams):
    """Zero one random off-center block (utils/image.py:502-517)."""
    d, h, w = vol.shape
    ks = jax.random.split(key, 3)
    starts = [_offcenter_start(ks[i], (d, h, w)[i], diams[i]) for i in range(3)]
    return jnp.where(_block_mask(starts, diams, (d, h, w)), 0.0, vol)


def _center_out(vol, diams):
    """Keep only the central xy band, all z (utils/image.py:519-524)."""
    d, h, w = vol.shape
    hh, ww = h // 2, w // 2
    ih = jnp.arange(h)
    iw = jnp.arange(w)
    keep = ((ih >= hh - diams[1]) & (ih < hh + diams[1]))[:, None] & (
        (iw >= ww - diams[2]) & (iw < ww + diams[2])
    )[None, :]
    return jnp.where(keep[None], vol, 0.0)


def _swap_out(vol, key, diams):
    """Swap two random off-center blocks (utils/image.py:481-500)."""
    d, h, w = vol.shape
    ks = jax.random.split(key, 6)
    s0 = [_offcenter_start(ks[i], (d, h, w)[i], diams[i]) for i in range(3)]
    s1 = [_offcenter_start(ks[3 + i], (d, h, w)[i], diams[i]) for i in range(3)]
    a = jax.lax.dynamic_slice(vol, s0, diams)
    b = jax.lax.dynamic_slice(vol, s1, diams)
    out = jax.lax.dynamic_update_slice(vol, b, s0)
    return jax.lax.dynamic_update_slice(out, a, s1)


@partial(jax.jit, static_argnames=("out_size", "strong"))
def simsiam_augment_vol(vols, keys, mean, std, out_size, strong=True):
    """Batched subvolume pipeline: vols (B, D, H, W), keys (B, 2) uint32 ->
    (B, *out_size). ``out_size`` = input size minus 2*(size//8) per axis
    (the tio Crop). ``mean``/``std`` are accepted for signature parity with
    the patch pipelines but unused — this mode z-normalizes per sample.
    ``strong`` is likewise accepted and ignored (both views full-strength,
    particle_pre.py:55-87)."""
    del mean, std, strong
    b, d, h, w = vols.shape
    od, oh, ow = out_size
    # block-corruption diameters derive from the PRE-CROP size like the
    # reference's drop1/drop2/center1/center2 (particle_pre.py:53-54)
    drop_diams = (max(d // 8, 1), max(h // 8, 1), max(w // 8, 1))
    center_diams = (max(d // 4, 1), max(h // 4, 1), max(w // 4, 1))

    def one(vol, key):
        ks = jax.random.split(key, 9)
        # tio Compose --------------------------------------------------
        t_blur = jax.random.uniform(ks[0])
        x = jnp.where(jax.random.uniform(ks[1]) < 0.15,
                      _blur_xy(vol, t_blur), vol)
        noise = jax.random.normal(ks[2], x.shape) * jax.random.uniform(
            ks[3], (), minval=0.0, maxval=0.25
        )
        x = jnp.where(jax.random.uniform(ks[4]) < 0.5, x + noise, x)
        theta = jax.random.uniform(ks[5], (), minval=0.0, maxval=60.0)
        x = jnp.where(jax.random.uniform(ks[6]) < 0.75,
                      _rotate_vol_xy_shear(x, theta * jnp.pi / 180.0), x)
        x = x[(d - od) // 2 : (d - od) // 2 + od,
              (h - oh) // 2 : (h - oh) // 2 + oh,
              (w - ow) // 2 : (w - ow) // 2 + ow]
        x = _znorm(_rescale(_znorm(x)))
        # per-view flips + block corruption (particle_pre.py:55-87) ----
        fp = jax.random.uniform(ks[7])
        x = jnp.where(fp < 0.33, x[:, ::-1, :],
                      jnp.where(fp > 0.66, x[:, :, ::-1], x))
        bp = jax.random.uniform(ks[8])
        kd, ksw = jax.random.split(jax.random.fold_in(key, 77))
        x = jnp.where(
            bp < 0.25, _drop_out(x, kd, drop_diams),
            jnp.where(
                bp < 0.5, _center_out(x, center_diams),
                jnp.where(bp < 0.75, _swap_out(x, ksw, drop_diams), x),
            ),
        )
        return x

    return jax.vmap(one)(vols, keys)


def vol_out_size(vol_size):
    """Post-crop subvolume shape: size - 2*(size//8) per axis (the tio
    Crop(size//8) at tomo_pre.py:57)."""
    return tuple(int(s) - 2 * (int(s) // 8) for s in vol_size)


def vol_test_view(vols):
    """Deterministic test-time transform for subvolume embedding extraction:
    center crop + the znorm/rescale/znorm chain, no randomness (the tio
    pipeline minus its random members). vols: (N, D, H, W) numpy."""
    import numpy as np

    d, h, w = vols.shape[1:]
    od, oh, ow = vol_out_size((d, h, w))
    x = vols[:, (d - od) // 2 : (d - od) // 2 + od,
             (h - oh) // 2 : (h - oh) // 2 + oh,
             (w - ow) // 2 : (w - ow) // 2 + ow].astype(np.float32)
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        v = x[i]
        v = (v - v.mean()) / max(v.std(), 1e-6)
        mn, mx = v.min(), v.max()
        v = -3.0 + (v - mn) / max(mx - mn, 1e-12) * 6.0
        out[i] = (v - v.mean()) / max(v.std(), 1e-6)
    return out


def _shear_matrices(shift, n):
    """(R, n, n) linear-interp shift operators: out[r, i] = (1-f) in[r, i-k]
    + f in[r, i-k-1] for shift[r] = k + f; out-of-range taps are zero rows
    (zero fill). Built from iota comparisons — no gather."""
    k = jnp.floor(shift).astype(jnp.int32)
    f = (shift - k)[:, None, None]
    i = jnp.arange(n)[None, :, None]
    j = jnp.arange(n)[None, None, :]
    tap0 = (j == i - k[:, None, None]).astype(f.dtype)
    tap1 = (j == i - k[:, None, None] - 1).astype(f.dtype)
    return (1.0 - f) * tap0 + f * tap1


def _rotate_vol_xy_shear(vol, theta):
    """xy rotation of every z-slice by Paeth's 3-shear decomposition,
    R(theta) = Sx(-tan(theta/2)) Sy(sin theta) Sx(-tan(theta/2)), with each
    shear a per-row/column linear-interp SHIFT-MATRIX einsum.

    TPU-first replacement for the gather-based `_rotate_vol_xy`: batched
    2x2-tap gathers lower ~150x off bandwidth on this stack (measured
    15.2 ms inside the vol pipeline at bs 128; per-tap and fused-crop
    variants 16.9/11.1 ms — benchmarks note in PARITY.md), while the three
    shear einsums are MXU matmuls over (W, W) operators. Angles beyond 45
    degrees pre-compose a rot90 so every shear stays well-conditioned.
    Interpolation is linear per pass (vs one bilinear resample): values
    differ from the gather path at the ~1% level — the same family of
    difference as tio's own spline interpolation, and the exploration augs
    are distribution-level anyway. Zero fill like the gather path.
    """
    d, h, w = vol.shape
    if h != w:
        # the >45deg rot90 pre-compose changes (h, w) on non-square slices;
        # non-square inputs take the gather rotation (static branch — every
        # in-tree caller is square)
        return _rotate_vol_xy(vol, theta)
    # theta > 45deg: rotate the grid 90deg first (transpose + flip = exact),
    # leaving a residual in [-45, 0] for the shears
    use90 = theta > jnp.pi / 4
    # +theta in the sampling convention == rot90(k=-1) (see the 2D test
    # test_rotate_90deg_matches_rot90)
    vol = jnp.where(use90, jnp.rot90(vol, k=-1, axes=(1, 2)), vol)
    th = jnp.where(use90, theta - jnp.pi / 2, theta)

    a = -jnp.tan(th / 2.0)
    b = jnp.sin(th)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h) - cy
    xs = jnp.arange(w) - cx
    # x-shear: out(x) = in(x - a*y)  (per-row shift a*y)
    sx = _shear_matrices(a * ys, w)          # (H, W, W)
    # y-shear: out(y) = in(y - b*x)  (per-column shift b*x)
    sy = _shear_matrices(b * xs, h)          # (W, H, H)

    v = jnp.einsum("yij,dyj->dyi", sx, vol)
    v = jnp.einsum("xij,djx->dix", sy, v)
    return jnp.einsum("yij,dyj->dyi", sx, v)
