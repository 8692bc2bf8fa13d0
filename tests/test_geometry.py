"""Geometry toolbox: SO(3), projector, FFT, CTF."""

import numpy as np
import pytest

from cet_pick_tpu.utils.geometry import (
    Projector,
    compute_ctf,
    constrained_so3,
    ctf_freqs,
    fft2_center,
    grid_SO3,
    ht2_center,
    ifft2_center,
    iht2_center,
    quaternions_to_so3,
    random_quaternions,
    random_so3,
)


def test_random_so3_are_rotations(rng):
    rots = random_so3(10, rng)
    for r in rots:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(r) == pytest.approx(1.0)


def test_random_quaternions_unit_norm(rng):
    q = random_quaternions(100, rng)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-12)


def test_constrained_so3_valid_rotation(rng):
    # "constrained" squeezes two Shoemake params into [0, 0.1] — a restricted
    # subset of SO(3) (lie_tools.py:146-163), still a proper rotation
    r = constrained_so3(rng)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(r) == pytest.approx(1.0)


def test_grid_so3_rotations():
    rots = grid_SO3(0)
    assert len(rots) > 20
    for r in rots[:5]:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)


def test_projector_identity(rng):
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    p = Projector(vol)
    rotated = np.asarray(p.rotate(np.eye(3)))
    np.testing.assert_allclose(rotated, vol, atol=1e-4)
    proj = np.asarray(p.project(np.eye(3)))
    np.testing.assert_allclose(proj, vol.sum(axis=0), atol=1e-3)


def test_projector_180deg(rng):
    vol = np.zeros((17, 17, 17), np.float32)
    vol[8, 8, 12] = 1.0  # off-center in x
    p = Projector(vol)
    rot = np.diag([-1.0, -1.0, 1.0])  # 180° about z
    rotated = np.asarray(p.rotate(rot))
    assert rotated[8, 8, 4] == pytest.approx(1.0, abs=1e-4)


def test_fft_roundtrip(rng):
    img = rng.standard_normal((16, 16))
    back = ifft2_center(fft2_center(img))
    np.testing.assert_allclose(back.real, img, atol=1e-10)


def test_hartley_involution(rng):
    img = rng.standard_normal((16, 16)).astype(np.float32)
    np.testing.assert_allclose(iht2_center(ht2_center(img)), img, atol=1e-4)


def test_ctf_basic():
    freqs = ctf_freqs(32, apix=2.0).reshape(-1, 2)
    ctf = np.asarray(compute_ctf(freqs, 15000.0, 15000.0, 0.0, 300.0, 2.7, 0.1))
    assert ctf.shape == (32 * 32,)
    assert np.abs(ctf).max() <= 1.0 + 1e-6
    # zero frequency: gamma=0 -> ctf = -w
    center = ctf.reshape(32, 32)[16, 16]
    assert center == pytest.approx(-0.1, abs=1e-6)
    # B-factor envelope shrinks high frequencies
    ctf_b = np.asarray(compute_ctf(freqs, 15000.0, 15000.0, 0.0, 300.0, 2.7,
                                   0.1, bfactor=500.0))
    assert np.abs(ctf_b).sum() < np.abs(ctf).sum()


def test_fsc_identical_and_noise(rng):
    from cet_pick_tpu.utils.geometry import fsc, fsc_resolution

    vol = rng.standard_normal((32, 32, 32)).astype(np.float32)
    freqs, corr = fsc(vol, vol)
    np.testing.assert_allclose(corr, 1.0, atol=1e-6)
    assert fsc_resolution(freqs, corr, apix=1.0) == pytest.approx(2.0)

    other = rng.standard_normal((32, 32, 32)).astype(np.float32)
    _, corr2 = fsc(vol, other)
    assert np.abs(corr2).mean() < 0.2  # uncorrelated noise
