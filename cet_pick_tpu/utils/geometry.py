"""Volume geometry toolbox: SO(3) sampling, rotation/projection, FFT, CTF.

Jax/numpy rebuild of the reference's cryoDRGN-derived utilities
(reference: cet_pick/utils/lie_tools.py, project3d.py, fft.py, ctf.py,
so3_grid.py — SURVEY.md §2.6 "cryoDRGN-derived geometry"):

* ``random_quaternions`` / ``random_so3`` / ``constrained_so3`` — uniform and
  near-identity rotation sampling (lie_tools.py:137-166)
* ``Projector`` — real-space volume rotation by trilinear resampling on a
  centered lattice + projection (z-sum), jitted (project3d.py:48-97)
* ``fft2_center`` / ``ifft2_center`` / ``ht2_center`` — centered FFT /
  Hartley transforms (fft.py)
* ``compute_ctf`` — standard 2D CTF with astigmatism, phase shift and
  B-factor envelope (ctf.py:6-39)
* ``grid_SO3`` — quasi-uniform SO(3) grid via Hopf-style (theta, phi, psi)
  product sampling (so3_grid.py's role; construction differs, coverage
  matches in expectation)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def random_quaternions(n, rng: np.random.Generator):
    """Uniform unit quaternions (Shoemake; lie_tools.py:137-144)."""
    u1, u2, u3 = rng.random((3, n))
    return np.stack([
        np.sqrt(1 - u1) * np.sin(2 * np.pi * u2),
        np.sqrt(1 - u1) * np.cos(2 * np.pi * u2),
        np.sqrt(u1) * np.sin(2 * np.pi * u3),
        np.sqrt(u1) * np.cos(2 * np.pi * u3),
    ], axis=1)


def quaternions_to_so3(q):
    """Unit quaternion(s) (N, 4) -> rotation matrices (N, 3, 3)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def random_so3(n, rng: np.random.Generator):
    """n uniform rotation matrices (lie_tools.py:165-166)."""
    return quaternions_to_so3(random_quaternions(n, rng))


def constrained_so3(rng: np.random.Generator):
    """Small near-identity rotation (lie_tools.py:146-163): the first two
    Shoemake parameters are squeezed into [0, 0.1]."""
    u = rng.random(3)
    u[0] = u[0] * 0.1
    u[1] = u[1] * 0.1
    q = np.array([
        np.sqrt(1 - u[0]) * np.sin(2 * np.pi * u[1]),
        np.sqrt(1 - u[0]) * np.cos(2 * np.pi * u[1]),
        np.sqrt(u[0]) * np.sin(2 * np.pi * u[2]),
        np.sqrt(u[0]) * np.cos(2 * np.pi * u[2]),
    ])
    return quaternions_to_so3(q[None])[0]


def grid_SO3(resol: int):
    """Quasi-uniform SO(3) rotation grid with ~(4^resol * 72) elements."""
    n_side = 2 ** resol
    thetas = np.arccos(np.linspace(1, -1, 2 * n_side + 2)[1:-1])
    phis = np.linspace(0, 2 * np.pi, 4 * n_side, endpoint=False)
    psis = np.linspace(0, 2 * np.pi, 6 * n_side, endpoint=False)
    quats = []
    for t in thetas:
        for p in phis:
            for s in psis:
                quats.append([
                    np.cos(t / 2) * np.cos(s / 2),
                    np.cos(t / 2) * np.sin(s / 2),
                    np.sin(t / 2) * np.cos(p + s / 2),
                    np.sin(t / 2) * np.sin(p + s / 2),
                ])
    return quaternions_to_so3(np.asarray(quats))


# ---------------------------------------------------------------------------
# real-space rotation + projection
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _rotate_volume(vol, rot):
    """Trilinear resample of vol (D, D, D) under rotation rot (3, 3) about the
    center, on the [-1, 1] lattice (project3d.py:49-90)."""
    d = vol.shape[0]
    coords = jnp.linspace(-1.0, 1.0, d)
    zz, yy, xx = jnp.meshgrid(coords, coords, coords, indexing="ij")
    lattice = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # (N, 3) xyz
    src = lattice @ rot  # rotate sampling points
    # map [-1, 1] -> [0, d-1] index space
    idx = (src + 1.0) * (d - 1) / 2.0
    ix, iy, iz = idx[:, 0], idx[:, 1], idx[:, 2]
    out = jax.scipy.ndimage.map_coordinates(
        vol, [iz, iy, ix], order=1, mode="constant", cval=0.0
    )
    return out.reshape(d, d, d)


class Projector:
    """Real-space rotate + project (z-sum) of a cubic volume
    (project3d.py:48-97)."""

    def __init__(self, vol):
        vol = np.asarray(vol, np.float32)
        assert vol.ndim == 3 and len(set(vol.shape)) == 1, "volume must be cubic"
        self.vol = jnp.asarray(vol)

    def rotate(self, rot):
        return _rotate_volume(self.vol, jnp.asarray(rot, jnp.float32))

    def project(self, rot):
        return self.rotate(rot).sum(axis=0)


# ---------------------------------------------------------------------------
# centered FFT / Hartley (fft.py)
# ---------------------------------------------------------------------------

def fft2_center(img):
    return np.fft.fftshift(np.fft.fft2(np.fft.fftshift(img, axes=(-1, -2))),
                           axes=(-1, -2))


def ifft2_center(img):
    return np.fft.ifftshift(np.fft.ifft2(np.fft.ifftshift(img, axes=(-1, -2))),
                            axes=(-1, -2))


def ht2_center(img):
    f = fft2_center(img)
    return (f.real - f.imag).astype(np.float32)


def iht2_center(img):
    img = fft2_center(img)
    img /= img.shape[-1] * img.shape[-2]
    return (img.real - img.imag).astype(np.float32)


def fftn_center(v):
    return np.fft.fftshift(np.fft.fftn(np.fft.fftshift(v)))


def ifftn_center(v):
    return np.fft.ifftshift(np.fft.ifftn(np.fft.ifftshift(v)))


# ---------------------------------------------------------------------------
# CTF (ctf.py:6-39)
# ---------------------------------------------------------------------------

def compute_ctf(freqs, dfu, dfv, dfang, volt, cs, w, phase_shift=0.0,
                bfactor=None):
    """2D CTF. freqs: (..., 2) spatial frequencies (1/A); dfu/dfv defocus (A);
    dfang astigmatism angle (deg); volt (kV); cs (mm); w amplitude contrast."""
    freqs = jnp.asarray(freqs)
    volt = volt * 1000.0
    cs = cs * 1e7
    dfang = dfang * jnp.pi / 180.0
    phase_shift = phase_shift * jnp.pi / 180.0
    lam = 12.2639 / jnp.sqrt(volt + 0.97845e-6 * volt ** 2)
    x, y = freqs[..., 0], freqs[..., 1]
    ang = jnp.arctan2(y, x)
    s2 = x ** 2 + y ** 2
    df = 0.5 * (dfu + dfv + (dfu - dfv) * jnp.cos(2 * (ang - dfang)))
    gamma = 2 * jnp.pi * (-0.5 * df * lam * s2 + 0.25 * cs * lam ** 3 * s2 ** 2) \
        - phase_shift
    ctf = jnp.sqrt(1 - w ** 2) * jnp.sin(gamma) - w * jnp.cos(gamma)
    if bfactor is not None:
        ctf = ctf * jnp.exp(-bfactor / 4 * s2)
    return ctf


def fsc(vol1, vol2):
    """Fourier shell correlation between two cubic volumes (utils/fsc.py's
    role). Returns (shell_radii_fractional, correlations)."""
    vol1 = np.asarray(vol1)
    vol2 = np.asarray(vol2)
    d = vol1.shape[0]
    f1 = fftn_center(vol1)
    f2 = fftn_center(vol2)
    coords = np.arange(d) - d // 2
    zz, yy, xx = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
    shells = np.arange(1, d // 2)
    corr = np.zeros(len(shells))
    prev = 0.5
    for i, s in enumerate(shells):
        mask = (r >= prev) & (r < s + 0.5)
        a = f1[mask]
        b = f2[mask]
        num = np.real(np.vdot(a, b))
        den = np.sqrt(np.vdot(a, a).real * np.vdot(b, b).real)
        corr[i] = num / den if den > 0 else 0.0
        prev = s + 0.5
    return shells / d, corr


def fsc_resolution(freqs, corr, threshold=0.143, apix=1.0):
    """First shell where FSC drops below threshold -> resolution in A."""
    below = np.where(corr < threshold)[0]
    if len(below) == 0:
        return 2 * apix  # Nyquist
    return apix / freqs[below[0]]


def ctf_freqs(d, apix=1.0):
    """Centered (d, d, 2) frequency lattice up to Nyquist (1/(2*apix))."""
    f = np.fft.fftshift(np.fft.fftfreq(d, d=apix))
    fx, fy = np.meshgrid(f, f, indexing="xy")
    return np.stack([fx, fy], axis=-1)
