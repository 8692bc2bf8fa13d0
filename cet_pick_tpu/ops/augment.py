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


def random_resized_crop(img, key, out_size, scale=(0.8, 1.0)):
    """torchvision RandomResizedCrop(out, scale, ratio=(1,1)) semantics:
    crop a square covering an area fraction ~U[scale] at a uniform-random
    location, bilinear-resize to (out_size, out_size). Implemented as one
    bilinear gather over the source grid (crop+resize fused) so the traced
    shape stays static; top/left/side are continuous rather than
    torchvision's integer sampling — same distribution family."""
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
    ys = top + idx
    xs = left + idx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return _bilinear_sample_clamped(img, yy, xx)


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
            x = random_rotate(x, ks[2], max_deg=30.0)
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
