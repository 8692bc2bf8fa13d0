"""Backprojection + spectrum tools (reference backproject_voxel.py,
extract_spectrum.py, match_spectrum.py, lattice.py, pose.py)."""

import numpy as np
import pytest

from cet_pick_tpu.utils.geometry import Projector, random_so3
from cet_pick_tpu.utils.reconstruct import (
    backproject,
    circular_mask,
    equalization_kernel,
    extract_spectrum,
    htn_center,
    ihtn_center,
    lattice_coords,
    load_poses,
    load_spectrum,
    match_spectrum,
    rad_avg,
    save_poses,
    save_spectrum,
    symmetrize_ht,
    translate_ht,
)


def _blob_volume(rng, d=16, n=3):
    vol = np.zeros((d, d, d), np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(d)] * 3, indexing="ij")
    for _ in range(n):
        c = rng.integers(5, d - 5, size=3)
        vol += np.exp(-(((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                         + (xx - c[2]) ** 2) / 6.0)).astype(np.float32)
    return vol


# -- Hartley transform -------------------------------------------------------

def test_htn_involution(rng):
    v = rng.standard_normal((8, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(ihtn_center(htn_center(v)), v, atol=1e-4)


def test_symmetrize_ht_wraps_nyquist(rng):
    ht = rng.standard_normal((4, 4)).astype(np.float32)
    s = symmetrize_ht(ht)
    assert s.shape == (5, 5)
    np.testing.assert_array_equal(s[-1, :-1], ht[0])
    np.testing.assert_array_equal(s[:-1, -1], ht[:, 0])


# -- lattice -----------------------------------------------------------------

def test_lattice_coords_order():
    c = lattice_coords(5, extent=2)
    # row-major ravel: x fast, y slow (lattice.py:14-17)
    np.testing.assert_allclose(c[0], [-2, -2, 0])
    np.testing.assert_allclose(c[1], [-1, -2, 0])
    np.testing.assert_allclose(c[5], [-2, -1, 0])
    np.testing.assert_allclose(c[12], [0, 0, 0])  # DC at the center row


def test_circular_mask_drops_dc():
    m = circular_mask(5, 2)
    assert not m[12]  # ignore_DC
    assert m.sum() > 0
    # centrosymmetric: reversing maps k -> -k
    np.testing.assert_array_equal(m, m[::-1])


def test_translate_ht_matches_real_shift(rng):
    """Integer-pixel Hartley phase shift == periodic roll in real space."""
    import jax.numpy as jnp

    from cet_pick_tpu.utils.geometry import ht2_center, iht2_center

    d = 16
    img = rng.standard_normal((d, d)).astype(np.float32)
    ht = ht2_center(img[None])[0]
    coords = lattice_coords(d + 1, extent=(d + 1) // 2)
    # full symmetric lattice including DC (mask of all True)
    sym = symmetrize_ht(ht[None])[0]
    freqs = coords[:, :2] / ((d + 1) // 2) / 2.0
    shifted = translate_ht(jnp.asarray(sym.ravel()), jnp.asarray([2.0, 3.0]),
                           jnp.asarray(freqs))
    back = np.asarray(shifted).reshape(d + 1, d + 1)[:-1, :-1]
    out = iht2_center(back[None])[0]
    # H'(k) = cos(2pi k.t)H(k) + sin(2pi k.t)H(-k) moves content BY +t
    expected = np.roll(img, shift=(3, 2), axis=(0, 1))
    np.testing.assert_allclose(out, expected, atol=1e-3)


# -- poses -------------------------------------------------------------------

def test_pose_roundtrip(tmp_path, rng):
    rots = random_so3(4, rng).astype(np.float32)
    trans = rng.uniform(-5, 5, (4, 2)).astype(np.float32)
    p = str(tmp_path / "pose.pkl")
    save_poses(p, rots, trans, d=32)
    r2, t2 = load_poses(p, 4, 32)
    np.testing.assert_allclose(r2, rots, atol=1e-6)
    np.testing.assert_allclose(t2, trans, atol=1e-4)
    # rotations-only variant
    save_poses(p, rots)
    r3, t3 = load_poses(p, 4, 32)
    assert t3 is None
    np.testing.assert_allclose(r3, rots, atol=1e-6)


# -- backprojection ----------------------------------------------------------

@pytest.mark.slow
def test_backproject_recovers_volume(rng):
    """Central-slice round trip: project along many orientations, then the
    Fourier-voxel backprojection correlates strongly with the original."""
    d = 16
    vol = _blob_volume(rng, d)
    rots = random_so3(120, rng).astype(np.float32)
    proj = Projector(vol)
    images = np.stack([np.asarray(proj.project(r)) for r in rots])

    rec = backproject(images, rots)
    a = vol - vol.mean()
    b = rec - rec.mean()
    corr = float((a * b).sum() / np.sqrt((a ** 2).sum() * (b ** 2).sum()))
    assert corr > 0.6, f"reconstruction correlation too low: {corr}"


@pytest.mark.slow
def test_backproject_translation_consistency(rng):
    """Backprojecting shifted images with the matching pose translations
    reproduces the unshifted reconstruction."""
    d = 16
    vol = _blob_volume(rng, d)
    rots = random_so3(60, rng).astype(np.float32)
    proj = Projector(vol)
    images = np.stack([np.asarray(proj.project(r)) for r in rots])

    shift = np.tile(np.array([[2.0, 1.0]], np.float32), (len(rots), 1))
    shifted = np.stack([
        np.roll(im, shift=(-1, -2), axis=(0, 1)) for im in images
    ])  # roll by (-ty, -tx): the inverse of a (+tx, +ty) translation

    rec_plain = backproject(images, rots)
    rec_fixed = backproject(shifted, rots, trans=shift)
    a = rec_plain - rec_plain.mean()
    b = rec_fixed - rec_fixed.mean()
    corr = float((a * b).sum() / np.sqrt((a ** 2).sum() * (b ** 2).sum()))
    assert corr > 0.95, f"translation correction broken: corr={corr}"


def test_backproject_ctf_phase_flip_smoke(rng):
    """CTF phase flipping (vmapped compute_ctf over per-image params,
    backproject_voxel.py:121-126) runs and returns a finite volume."""
    d = 12
    images = rng.standard_normal((4, d, d)).astype(np.float32)
    rots = random_so3(4, rng).astype(np.float32)
    params = np.tile(
        np.array([[1.0, 10000.0, 9000.0, 10.0, 300.0, 2.7, 0.1, 0.0, 0.0]],
                 np.float32), (4, 1))
    rec = backproject(images, rots, ctf_params=params)
    assert rec.shape == (d, d, d) and np.isfinite(rec).all()


@pytest.mark.slow
def test_backproject_tilt_pairs(rng):
    """--tilt mode: tilt-pair images inserted at xrot(tilt_deg) @ r
    (backproject_voxel.py:129-137) sharpen the reconstruction rather than
    corrupting it."""
    d = 16
    vol = _blob_volume(rng, d)
    rots = random_so3(60, rng).astype(np.float32)
    t = np.deg2rad(45.0)
    xrot = np.array([[1, 0, 0],
                     [0, np.cos(t), -np.sin(t)],
                     [0, np.sin(t), np.cos(t)]], np.float32)
    proj = Projector(vol)
    images = np.stack([np.asarray(proj.project(r)) for r in rots])
    tilt_imgs = np.stack([np.asarray(proj.project(xrot @ r)) for r in rots])

    rec = backproject(images, rots, tilt_images=tilt_imgs, tilt_deg=45.0)
    a = vol - vol.mean()
    b = rec - rec.mean()
    corr = float((a * b).sum() / np.sqrt((a ** 2).sum() * (b ** 2).sum()))
    assert corr > 0.6, f"tilt-pair reconstruction correlation too low: {corr}"


# -- spectrum tools ------------------------------------------------------------

def test_rad_avg_shell(rng):
    """A spherical shell indicator averages high inside its radial bin and
    ~zero far away."""
    d = 32
    zz, yy, xx = np.meshgrid(*[np.arange(d)] * 3, indexing="ij")
    r = np.sqrt((zz - d / 2) ** 2 + (yy - d / 2) ** 2 + (xx - d / 2) ** 2)
    shell = ((r > 6) & (r < 8)).astype(np.float32)
    avg = rad_avg(shell)
    assert len(avg) == 16
    # reference binning: bin = 16 * r / r_corner with r_corner = 16*sqrt(3),
    # so shell radius 6..8 lands in bins 3..4 == indices 2..3 after the
    # dropped DC bin (filter_utils.py:65-75)
    peak = int(np.argmax(avg))
    assert peak in (2, 3)
    assert avg[0] == 0 and avg[8] == 0 and avg[14] == 0


def test_extract_spectrum_peak(rng):
    """A pure sinusoid's amplitude spectrum peaks at its frequency bin."""
    d = 32
    x = np.arange(d)
    tomo = np.broadcast_to(
        np.sin(2 * np.pi * 8 * x / d)[None, None, :], (d, d, d)
    ).astype(np.float32) + 0.01 * rng.standard_normal((d, d, d)).astype(np.float32)
    spec = extract_spectrum(tomo)
    # frequency 8/d on a 32-box: 8 voxels from DC; bins are ~max/2 wide over
    # the corner-to-corner radius, so the peak lands in the single-digit bins
    peak = int(np.argmax(spec[1:])) + 1  # skip the DC-adjacent bin
    assert 3 <= peak <= 10, f"peak bin {peak}"


def test_spectrum_tsv_roundtrip(tmp_path):
    spec = np.linspace(1.0, 0.1, 16).astype(np.float32)
    p = str(tmp_path / "spec.tsv")
    save_spectrum(p, spec)
    loaded = load_spectrum(p)
    np.testing.assert_allclose(loaded, spec, rtol=1e-6)


def test_equalization_kernel_radial():
    k = np.asarray(equalization_kernel(np.array([1.0, 0.5, 0.0]), (7, 7)))
    c = 3  # center index for odd axis
    assert k[c, c] == pytest.approx(1.0)
    assert k[c, c + 1] == pytest.approx(0.5)
    assert k[c, c + 2] == pytest.approx(0.0)
    np.testing.assert_allclose(k, k[::-1, :], atol=1e-6)  # symmetric


def test_match_spectrum_self_is_identity(rng):
    """Matching a tomogram to its own spectrum leaves it (min-max
    normalized) unchanged up to interpolation error."""
    tomo = rng.standard_normal((24, 24, 24)).astype(np.float32)
    spec = extract_spectrum(tomo)
    out = match_spectrum(tomo, spec)
    norm = tomo - tomo.min()
    norm = norm / norm.max()
    # gains are ~1 in every populated bin, but the reference's kernel scale
    # quirk (rad_avg bins span the corner radius while rot_kernel evaluates
    # at voxel radius, filter_utils.py:65-93) low-passes beyond bin max/2 —
    # replicated here, so identity holds only up to that implicit filter
    corr = np.corrcoef(out.ravel(), norm.ravel())[0, 1]
    assert corr > 0.65, f"self-match correlation {corr}"


def test_match_spectrum_cutoff_lowpass(rng):
    tomo = rng.standard_normal((24, 24, 24)).astype(np.float32)
    spec = extract_spectrum(tomo)
    out = match_spectrum(tomo, spec, cutoff=4)
    # high frequencies killed: spectrum beyond the cutoff collapses
    out_spec = extract_spectrum(out)
    assert out_spec[10:].mean() < 0.01 * out_spec[1:5].mean()
