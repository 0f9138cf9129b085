"""Batched FPFS shear estimation in JAX.

The reference measures shear per galaxy on the CPU with the ``fpfs``
package (v3.0.2): Fourier Power Function Shapelet moments of the
PSF-power-deconvolved galaxy power spectrum, combined into a per-galaxy
ellipticity and its shear response (reference ``utils/utils_test.py:33-49``,
with ``sigma_arcsec=0.6``, ``pix_scale=0.2``, ``const=1``, ``noirev=False``).

This module implements the same measurement natively in JAX, fully batched
over stamps, so the 10k-galaxy x 7-SNR evaluation sweep is a handful of
jitted device calls instead of 70k python/CPU roundtrips.  The algorithm
(derived from the FPFS papers — Li et al. 2018, MNRAS 481; Li & Mandelbaum
2022, arXiv:2110.01214 — because the package itself is not installable
here) is shared line-for-line with the auditable NumPy twin in
:mod:`galaxy_deconv_tpu.metrics.fpfs_numpy`; see that module's docstring
for the full derivation and validation story.  In brief::

    D(k)  = |F[gal](k)|^2 / |F[psf](k)|^2        (power function; delta PSF
                                                  = no deconvolution)
    M00   = (1/N^2) sum D exp(-x/2)               x = |k|^2 sigma^2
    M22   = (1/N^2) sum D (x/sqrt 2) e^{-2 i phi} exp(-x/2)
    M40   = (1/N^2) sum D ((x^2-4x+2)/2) exp(-x/2)
    e_i   = M22{c,s} / (M00 + C)
    R1E   = (s0 - s4)/sqrt(2) + sqrt(2) e1^2
    g_i   = e_i / R1E                             (R1E for BOTH — reference
                                                  quirk, utils_test.py:45-47)

The power function is translation invariant, so no centroiding is needed
(or performed — matching fpfs).  Stamps are background-subtracted by their
minimum first, replicating ``task.measure(obs - obs.min())``.

TPU design notes: inputs are real, so the half-spectrum ``rfft2`` is used
with Hermitian double-count weights (D(-k) = D(k) and the m=0/2/4 basis
phases are pair-invariant, so the half-plane sum is exact).  Everything is
pointwise algebra around one rfft2 — XLA fuses it into a single pass, and
measurement costs ~1/30th of a solver forward at benchmark batch sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def delta_psf(h: int = 48, w: int = 48) -> np.ndarray:
    """Centered delta 'PSF' used when measuring already-deconvolved images
    (reference ``delta_2D``, utils/utils_test.py:27-30)."""
    d = np.zeros((h, w), np.float32)
    d[h // 2, w // 2] = 1.0
    return d


@functools.lru_cache(maxsize=None)
def _basis_np(shape: tuple[int, int], sigma_arcsec: float, pix_scale: float):
    """Half-spectrum chi_00*, chi_22*, chi_40* with Hermitian multiplicity."""
    H, W = shape
    ky = 2.0 * np.pi * np.fft.fftfreq(H, d=pix_scale)
    kx = 2.0 * np.pi * np.fft.rfftfreq(W, d=pix_scale)
    KY, KX = np.meshgrid(ky, kx, indexing="ij")
    x = (KY**2 + KX**2) * sigma_arcsec**2
    # angle from the k_y axis — the convention under which the estimator
    # returns applied shear with the standard real-space sign (see
    # fpfs_numpy._basis and the metamorphic tests)
    phi = np.arctan2(KX, KY)
    w = np.exp(-x / 2.0)
    # each interior rfft column represents a conjugate (k, -k) pair; the
    # power function is even and the basis phases are pair-invariant
    mult = np.full((H, W // 2 + 1), 2.0)
    mult[:, 0] = 1.0
    if W % 2 == 0:
        mult[:, -1] = 1.0
    chi00 = w * mult
    chi22 = (x / np.sqrt(2.0)) * w * np.exp(-2j * phi) * mult
    chi40 = ((x**2 - 4.0 * x + 2.0) / 2.0) * w * mult
    # plain numpy (not jnp): this is lru_cached and may be hit inside a jit
    # trace — device constants are materialized at the use site instead
    return chi00.astype(np.float32), chi22.astype(np.complex64), chi40.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma_arcsec", "pix_scale", "deconv_psf"))
def fpfs_moments(
    images: jnp.ndarray,
    psf: jnp.ndarray | None = None,
    sigma_arcsec: float = 0.6,
    pix_scale: float = 0.2,
    deconv_psf: bool = False,
) -> dict[str, jnp.ndarray]:
    """FPFS power-function shapelet moments of (B, H, W) stamps.

    ``psf``: (B, H, W) PSF stamps whose *power* deconvolves the galaxy
    power when ``deconv_psf=True``; otherwise the delta-PSF identity
    applies (the reference's convention for post-deconvolution images).
    """
    B, H, W = images.shape
    images = images.astype(jnp.float32)
    images = images - images.min(axis=(-2, -1), keepdims=True)  # reference: obs - obs.min()
    D = jnp.abs(jnp.fft.rfft2(images, axes=(-2, -1))) ** 2
    if deconv_psf:
        P = jnp.abs(jnp.fft.rfft2(psf.astype(jnp.float32), axes=(-2, -1))) ** 2
        P = jnp.maximum(P, 1e-12 * P.max(axis=(-2, -1), keepdims=True))
        D = D / P

    chi00, chi22, chi40 = _basis_np((H, W), float(sigma_arcsec), float(pix_scale))
    n = 1.0 / (H * W)
    m00 = jnp.sum(D * chi00, axis=(-2, -1)) * n
    m22 = jnp.sum(D * chi22, axis=(-2, -1)) * n
    m40 = jnp.sum(D * chi40, axis=(-2, -1)) * n
    return {
        "M00": m00,
        "M22c": jnp.real(m22),
        "M22s": jnp.imag(m22),
        "M40": m40,
    }


@functools.partial(jax.jit, static_argnames=("sigma_arcsec", "pix_scale", "deconv_psf", "const"))
def estimate_shear(
    images: jnp.ndarray,
    psf: jnp.ndarray | None = None,
    sigma_arcsec: float = 0.6,
    pix_scale: float = 0.2,
    deconv_psf: bool = False,
    const: float = 1.0,
) -> jnp.ndarray:
    """Batched (g1, g2, |g|) estimates: (B, H, W) -> (B, 3).

    Follows ``fpfsM2E(mms, const=1, noirev=False)`` + the reference's
    response normalization, including the quirk that *both* components are
    divided by R1E (utils/utils_test.py:45-47).
    """
    m = fpfs_moments(images, psf, sigma_arcsec, pix_scale, deconv_psf)
    denom = m["M00"] + const
    e1 = m["M22c"] / denom
    e2 = m["M22s"] / denom
    s0 = m["M00"] / denom
    s4 = m["M40"] / denom
    r1e = (s0 - s4) / jnp.sqrt(2.0) + jnp.sqrt(2.0) * e1 * e1
    g1 = e1 / r1e
    g2 = e2 / r1e
    g = jnp.sqrt(g1**2 + g2**2)
    return jnp.stack([g1, g2, g], axis=-1)


def estimate_shear_fpfs_reference(obs: np.ndarray, psf: np.ndarray | None = None, sigma_arcsec: float = 0.6):
    """CPU cross-check using the real fpfs package when installed
    (exact reference metric; reference ``utils/utils_test.py:33-49``).
    When fpfs is absent, use :func:`...metrics.fpfs_numpy.estimate_shear_numpy`
    — the auditable NumPy twin of this module's algorithm."""
    import fpfs  # optional dependency

    if psf is None:
        psf = delta_psf(obs.shape[0], obs.shape[1])
    task = fpfs.image.measure_source(psf, noiFit=None, sigma_arcsec=sigma_arcsec, pix_scale=0.2)
    mms = task.measure(obs - obs.min())
    ells = fpfs.catalog.fpfsM2E(mms, const=1, noirev=False)
    resp = ells["fpfs_R1E"][0]
    g1 = ells["fpfs_e1"][0] / resp
    g2 = ells["fpfs_e2"][0] / resp
    return g1, g2, float(np.hypot(g1, g2))
