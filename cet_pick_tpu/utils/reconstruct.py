"""Fourier-space voxel backprojection + amplitude-spectrum tools.

TPU-native rebuild of the reference's vendored cryoDRGN/topaz long tail
(reference: cet_pick/utils/lattice.py, pose.py, backproject_voxel.py,
extract_spectrum.py, match_spectrum.py, filter_utils.py) — the standalone
reconstruction/filtering command-line tools that ship alongside the picker.

Design notes (vs the reference):

* The reference backprojects one image per Python-loop iteration with eight
  `tensor[index] +=` scatters each (backproject_voxel.py:44-62,117-137).
  Here the whole stack goes through ONE jitted ``lax.scan`` whose body does
  the Hartley-slice insertion with ``.at[].add`` — XLA fuses the eight
  corner scatters and keeps the running (V, counts) accumulators in HBM.
* The reference's ``Lattice`` class (lattice.py:11-148) becomes plain
  precomputed coordinate arrays closed over by the jitted body; the
  Hartley-space phase-shift translation (lattice.py:127-148) is
  ``translate_ht`` below.
* ``match_spectrum`` builds its radial equalization kernel on an octant and
  mirror-pads to save memory (filter_utils.py:78-93). Per-axis mirrored
  distance vectors give the identical kernel in closed form (odd axis:
  |i-(s-1)/2|; even axis: |i-(s-1)/2|-1/2), so the kernel here is one
  broadcast expression the TPU evaluates fused with the FFT multiply.

File formats (pose .pkl layout, .tsv spectrum columns) are frozen to the
reference's.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cet_pick_tpu.utils.geometry import compute_ctf, fftn_center, ht2_center


# ---------------------------------------------------------------------------
# centered 3D Hartley transform (reference fft.py ihtn_center's role)
# ---------------------------------------------------------------------------

def htn_center(v):
    """Centered n-D Hartley transform: Re(F) - Im(F) of the centered FFT."""
    f = fftn_center(np.asarray(v))
    return (f.real - f.imag).astype(np.float32)


def ihtn_center(v):
    """Inverse centered Hartley transform (involution up to 1/N)."""
    f = fftn_center(np.asarray(v))
    return ((f.real - f.imag) / v.size).astype(np.float32)


# ---------------------------------------------------------------------------
# lattice (reference lattice.py:11-99)
# ---------------------------------------------------------------------------

def lattice_coords(d: int, extent: Optional[float] = None) -> np.ndarray:
    """(D^2, 3) xyz coordinates of the centered D x D Fourier lattice.

    Row order matches a row-major raveled image: x fast, y slow, z = 0
    (lattice.py:14-17). D must be odd so the DC component sits on a sample.
    """
    assert d % 2 == 1, "lattice size must be odd"
    if extent is None:
        extent = d // 2
    grid = np.linspace(-extent, extent, d, endpoint=True, dtype=np.float32)
    yy, xx = np.meshgrid(grid, grid, indexing="ij")
    return np.stack(
        [xx.ravel(), yy.ravel(), np.zeros(d * d, np.float32)], axis=1
    )


def circular_mask(d: int, radius: int, ignore_dc: bool = True) -> np.ndarray:
    """Boolean mask restricting the lattice to a centered disc
    (lattice.py:66-77); the DC sample is dropped like the reference's
    ignore_DC default."""
    coords = lattice_coords(d)
    extent = d // 2
    r = radius / (d // 2) * extent
    mask = (coords ** 2).sum(-1) <= r ** 2
    if ignore_dc:
        mask[d * d // 2] = False
    return mask


def translate_ht(ff, t, freqs):
    """Phase-shift a Hartley-transformed image by t pixels
    (lattice.py:127-148): H'(k) = cos(2pi k.t) H(k) + sin(2pi k.t) H(-k).

    ff: (M,) masked HT samples whose index reversal maps k -> -k (true for
    any centrosymmetric mask over the centered lattice); t: (2,) pixel shift;
    freqs: (M, 2) spatial frequencies in cycles/pixel.
    """
    tfilt = 2.0 * jnp.pi * (freqs @ t)
    return jnp.cos(tfilt) * ff + jnp.sin(tfilt) * ff[::-1]


# ---------------------------------------------------------------------------
# poses (reference pose.py PoseTracker.load/save/get_pose)
# ---------------------------------------------------------------------------

def load_poses(path, n_img: int, d: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Load a cryoDRGN-format pose pickle: (rots,) or (rots, trans) with
    trans in fraction-of-box units (pose.py:38-80). Returns rots (N, 3, 3)
    float32 and trans (N, 2) in PIXELS (or None).

    ``d`` is the lattice box size the fractions are scaled by — for
    backprojection that is the SYMMETRIZED size (image box + 1), matching
    the reference's ``PoseTracker.load(..., data.D)`` (backproject_voxel.py:89).
    """
    with open(path, "rb") as f:
        poses = pickle.load(f)
    if not isinstance(poses, tuple):
        poses = (poses,)
    rots = np.asarray(poses[0], np.float32)
    assert rots.shape == (n_img, 3, 3), (
        f"rotations have shape {rots.shape}, expected ({n_img}, 3, 3)"
    )
    trans = None
    if len(poses) == 2:
        trans = np.asarray(poses[1], np.float32)
        assert trans.shape == (n_img, 2), (
            f"translations have shape {trans.shape}, expected ({n_img}, 2)"
        )
        assert np.all(trans <= 1), (
            "old pose format: translations must be fraction-of-box"
        )
        trans = trans * d
    return rots, trans


def save_poses(path, rots: np.ndarray, trans: Optional[np.ndarray] = None,
               d: Optional[int] = None):
    """Write the reference pose pickle format (pose.py:82-99); trans given in
    pixels is converted back to fraction-of-box."""
    rots = np.asarray(rots, np.float32)
    if trans is not None:
        assert d is not None, "box size d required to normalize translations"
        payload = (rots, np.asarray(trans, np.float32) / d)
    else:
        payload = (rots,)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


# ---------------------------------------------------------------------------
# backprojection (reference backproject_voxel.py)
# ---------------------------------------------------------------------------

def symmetrize_ht(ht: np.ndarray) -> np.ndarray:
    """(..., D, D) -> (..., D+1, D+1): append the wrapped Nyquist row/column
    so the Hartley lattice is symmetric around DC."""
    d = ht.shape[-1]
    out = np.zeros((*ht.shape[:-2], d + 1, d + 1), np.float32)
    out[..., :-1, :-1] = ht
    out[..., -1, :] = out[..., 0, :]
    out[..., :, -1] = out[..., :, 0]
    return out


def backproject(images, rots, trans=None, ctf_params=None,
                tilt_images=None, tilt_deg=45.0):
    """Weighted Fourier (Hartley) voxel backprojection of a particle stack.

    images: (N, d, d) real-space particles (d even); rots: (N, 3, 3);
    trans: optional (N, 2) pixel shifts; ctf_params: optional (N, 9) rows of
    [Apix, dfu, dfv, dfang, volt, cs, w, phase_shift, bfactor] used for CTF
    phase flipping (backproject_voxel.py:121-126); tilt_images: optional
    (N, d, d) tilt-pair stack inserted at the extra right-handed x-axis
    rotation ``tilt_deg`` on top of each pose — the reference's --tilt mode
    (backproject_voxel.py:129-137).

    Returns the (d, d, d) real-space reconstruction.
    """
    images = np.asarray(images, np.float32)
    n, d, d2_ = images.shape
    assert d == d2_ and d % 2 == 0, "images must be square with even box size"
    D = d + 1

    mask = circular_mask(D, D // 2)                  # (D^2,)
    coords = lattice_coords(D)[mask]                 # (M, 3), integer-spaced
    freqs = coords[:, :2] / (D // 2) / 2.0           # cycles/pixel

    def masked_ht(stack):
        ht = symmetrize_ht(ht2_center(np.asarray(stack, np.float32)))
        return ht.reshape(len(stack), -1)[:, mask]   # (N, M)

    ff = masked_ht(images)
    sign = None
    if ctf_params is not None:
        import jax as _jax

        ctf_params = np.asarray(ctf_params, np.float32)
        freqs_j = jnp.asarray(freqs)
        c = _jax.vmap(
            lambda ap, row: compute_ctf(
                freqs_j / ap, row[0], row[1], row[2], row[3], row[4],
                row[5], row[6],
            )
        )(jnp.asarray(ctf_params[:, 0]), jnp.asarray(ctf_params[:, 1:8]))
        sign = np.sign(np.asarray(c))
        ff = ff * sign

    if trans is None:
        trans = np.zeros((n, 2), np.float32)
        use_trans = False
    else:
        trans = np.asarray(trans, np.float32)
        use_trans = True

    rots = np.asarray(rots, np.float32)
    # (ff_stack, rots_stack) insertion passes: the base pose, plus the
    # tilt-pair images at xrot(tilt_deg) @ r (backproject_voxel.py:129-137;
    # the tilt pair shares its mate's CTF sign and translation, :131-136)
    passes = [(ff, rots)]
    if tilt_images is not None:
        assert np.asarray(tilt_images).shape == images.shape, (
            "tilt stack must match the particle stack shape"
        )
        t = np.deg2rad(tilt_deg)
        xrot = np.array([[1, 0, 0],
                         [0, np.cos(t), -np.sin(t)],
                         [0, np.sin(t), np.cos(t)]], np.float32)
        ff_tilt = masked_ht(tilt_images)
        if sign is not None:
            ff_tilt = ff_tilt * sign
        passes.append((ff_tilt, xrot @ rots))

    coords_j = jnp.asarray(coords)
    freqs_j = jnp.asarray(freqs)
    d_half = D // 2

    def insert(carry, inp):
        vol, counts = carry
        f, rot, t = inp
        if use_trans:
            f = translate_ht(f, t, freqs_j)
        pts = coords_j @ rot                          # (M, 3) xyz
        lo = jnp.floor(pts)
        hi = jnp.ceil(pts)
        # eight corners; weight 1 - euclidean distance, clipped at 0
        # (backproject_voxel.py:44-62 add_for_corner)
        vol_new, cnt_new = vol, counts
        for cz in (0, 1):
            for cy in (0, 1):
                for cx in (0, 1):
                    corner = jnp.stack([
                        hi[:, 0] if cx else lo[:, 0],
                        hi[:, 1] if cy else lo[:, 1],
                        hi[:, 2] if cz else lo[:, 2],
                    ], axis=1)
                    w = jnp.maximum(
                        0.0,
                        1.0 - jnp.linalg.norm(corner - pts, axis=1),
                    )
                    iz = corner[:, 2].astype(jnp.int32) + d_half
                    iy = corner[:, 1].astype(jnp.int32) + d_half
                    ix = corner[:, 0].astype(jnp.int32) + d_half
                    vol_new = vol_new.at[iz, iy, ix].add(w * f)
                    cnt_new = cnt_new.at[iz, iy, ix].add(w)
        return (vol_new, cnt_new), None

    @jax.jit
    def run(ff_stack, rots_stack, trans_stack):
        vol = jnp.zeros((D, D, D), jnp.float32)
        counts = jnp.zeros((D, D, D), jnp.float32)
        (vol, counts), _ = jax.lax.scan(
            insert, (vol, counts), (ff_stack, rots_stack, trans_stack)
        )
        return vol, counts

    vol = jnp.zeros((D, D, D), jnp.float32)
    counts = jnp.zeros((D, D, D), jnp.float32)
    for ff_pass, rmats in passes:
        v, c = run(jnp.asarray(ff_pass), jnp.asarray(rmats), jnp.asarray(trans))
        vol = vol + v
        counts = counts + c

    vol = np.array(vol)
    counts = np.array(counts)
    counts[counts == 0] = 1.0
    vol /= counts
    return ihtn_center(vol[:-1, :-1, :-1])


# ---------------------------------------------------------------------------
# amplitude spectrum tools (reference extract_spectrum.py / match_spectrum.py
# / filter_utils.py)
# ---------------------------------------------------------------------------

def _rad_bins(shape) -> np.ndarray:
    """Integer radial bin index per voxel, reference rad_avg binning
    (filter_utils.py:65-75: every axis is offset by max(shape)/2 and the bin
    count is max(shape)/2)."""
    m = max(shape)
    axes = np.ogrid[tuple(slice(0, s) for s in shape)]
    r = np.sqrt(sum((a - m * 0.5) ** 2 for a in axes))
    bins = m / 2
    return (bins * r / r.max()).astype(np.int32)


def rad_avg(image) -> np.ndarray:
    """Radially averaged intensity; bin 0 (the exact center) is dropped like
    the reference's index=arange(1, ...) (filter_utils.py:73-75). Empty bins
    yield NaN, matching ndimage.mean's empty-label behavior."""
    image = jnp.asarray(image)
    rbin = _rad_bins(image.shape)
    length = int(rbin.max()) + 1
    sums = jnp.bincount(jnp.asarray(rbin.ravel()), weights=image.ravel(),
                        length=length)
    cnts = jnp.bincount(jnp.asarray(rbin.ravel()), length=length)
    out = np.asarray(sums[1:] / jnp.maximum(cnts[1:], 1))
    return np.where(np.asarray(cnts[1:]) == 0, np.nan, out)


def extract_spectrum(tomo) -> np.ndarray:
    """Radially averaged amplitude spectrum of a (min-max normalized)
    volume (extract_spectrum.py:9-21)."""
    tomo = jnp.asarray(tomo, jnp.float32)
    tomo = tomo - tomo.min()
    tomo = tomo / tomo.max()
    t = jnp.abs(jnp.fft.fftshift(jnp.fft.fftn(tomo)))
    return rad_avg(t)


def save_spectrum(path, spectrum: np.ndarray):
    """Write the reference .tsv format: freq\\tintensity with a header
    (extract_spectrum.py:33)."""
    with open(path, "w") as f:
        f.write("freq\tintensity\n")
        for i, v in enumerate(np.asarray(spectrum)):
            f.write(f"{i}\t{v}\n")


def load_spectrum(path) -> np.ndarray:
    import pandas as pd

    return pd.read_csv(path, sep="\t")["intensity"].values


def _axis_dist(s: int) -> np.ndarray:
    """Mirrored per-axis distance vector reproducing the reference's
    octant-then-pad kernel construction (filter_utils.py:78-93): odd axes
    reflect (|i-(s-1)/2|), even axes duplicate the edge (|i-(s-1)/2| - 1/2).
    """
    i = np.arange(s, dtype=np.float32)
    d = np.abs(i - (s - 1) / 2.0)
    return d if s % 2 else d - 0.5


def equalization_kernel(equal_v, shape):
    """Radial kernel: interpolate the per-bin gains onto every voxel's
    radius; zero beyond the last bin (filter_utils.py:78-93 rot_kernel)."""
    axes = [jnp.asarray(_axis_dist(s)) for s in shape]
    r2 = 0.0
    for i, a in enumerate(axes):
        bshape = [1] * len(shape)
        bshape[i] = -1
        r2 = r2 + a.reshape(bshape) ** 2
    r = jnp.sqrt(r2)
    gains = jnp.asarray(equal_v, jnp.float32)
    k = jnp.interp(r, jnp.arange(len(equal_v), dtype=jnp.float32), gains)
    return jnp.where(r > len(equal_v) - 1, 0.0, k)


def match_spectrum(tomo, target_spectrum, cutoff: Optional[int] = None,
                   smooth: float = 0.0) -> np.ndarray:
    """Filter `tomo` so its radial amplitude spectrum matches
    `target_spectrum` (match_spectrum.py:12-51): per-bin gain
    target/input, optional low-pass (hard, or sigmoid of width ~`smooth`
    pixels), applied as one fused FFT multiply on device."""
    tomo = jnp.asarray(tomo, jnp.float32)
    tomo = tomo - tomo.min()
    tomo = tomo / tomo.max()
    t = jnp.fft.fftshift(jnp.fft.fftn(tomo))

    input_spectrum = rad_avg(jnp.abs(t))
    target = np.asarray(target_spectrum, np.float64).copy()
    target.resize(len(input_spectrum))  # zero-pad / truncate like np.resize
    equal_v = target / np.asarray(input_spectrum, np.float64)

    if cutoff:
        n = len(equal_v)
        if smooth:
            slope = n / smooth
            offset = 2 * slope * ((cutoff - n / 2) / n)
            cutoff_v = 1.0 / (1.0 + np.exp(np.linspace(-slope, slope, n)
                                           - offset))
        else:
            cutoff_v = np.ones_like(equal_v)
            equal_v[cutoff:] = 0
        equal_v = equal_v * cutoff_v

    kernel = equalization_kernel(np.asarray(equal_v, np.float32), t.shape)
    t = t * kernel
    out = jnp.abs(jnp.fft.ifftn(t))
    return np.asarray(out, np.float32)
