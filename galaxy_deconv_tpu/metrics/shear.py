"""Batched FPFS-style shear estimation in JAX.

The reference measures shear per galaxy on the CPU with the ``fpfs``
package (v3.0.2): Fourier Power Function Shapelets (Li et al. 2018,
Li & Mandelbaum 2022) — Gaussian-weighted polar-shapelet moments of the
PSF-deconvolved Fourier image, combined into a per-galaxy ellipticity and
its shear response (reference ``utils/utils_test.py:33-49``, with
``sigma_arcsec=0.6``, ``pix_scale=0.2``, ``const=1``, ``noirev=False``).

This module implements the same measurement natively in JAX, fully batched
over stamps, so the 10k-galaxy x 7-SNR evaluation sweep is a handful of
jitted device calls instead of 70k python/CPU roundtrips.  Formulas
(polar shapelets at Fourier radius r = |k| * sigma, weight exp(-r^2/2)):

    M00  = sum Re[F(k)] L0(r^2) w(k)            L0 = 1
    M22c = sum Re[F(k) e^{-2 i phi}] r^2/2 w(k)
    M22s = sum Im[F(k) e^{-2 i phi}] r^2/2 w(k)
    M40  = sum Re[F(k)] L2(r^2) w(k)            L2(x) = (x^2 - 4x + 2)/2

    e1 = -M22c / (M00 + C),  e2 = M22s / (M00 + C)
    R_i = (M00 - M40) / 2 / (M00 + C) + e_i^2
    g_i = e_i / R_i,  g = sqrt(g1^2 + g2^2)

where F(k) is the centered image spectrum divided by the PSF spectrum
(delta PSF => plain spectrum).  The absolute shapelet normalization is
chosen to match fpfs's scaling closely; since the benchmark compares
``rec`` and ``gt`` shears measured with the *same* estimator, the metric
median |g_rec - g_gt| is self-consistent.  When the real ``fpfs`` package
is importable, :func:`estimate_shear_fpfs_reference` provides the CPU
cross-check path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def delta_psf(h: int = 48, w: int = 48) -> np.ndarray:
    """Centered delta 'PSF' used when measuring already-deconvolved images."""
    d = np.zeros((h, w), np.float32)
    d[h // 2, w // 2] = 1.0
    return d


def _kgrid(h: int, w: int, pix_scale: float, sigma_arcsec: float):
    ky = 2 * np.pi * np.fft.fftfreq(h, d=pix_scale)
    kx = 2 * np.pi * np.fft.rfftfreq(w, d=pix_scale)
    KY, KX = np.meshgrid(ky, kx, indexing="ij")
    # FPFS Fourier-space scale: a Gaussian of width sigma in real space has
    # width 1/sigma in k; r is |k| in units of that scale.
    r2 = (KY**2 + KX**2) * sigma_arcsec**2
    phi = np.arctan2(KY, KX)
    return jnp.asarray(r2, jnp.float32), jnp.asarray(phi, jnp.float32)


def weighted_centroid(images: jnp.ndarray, sigma_px: float, n_iter: int = 12) -> jnp.ndarray:
    """Iterative Gaussian-weighted centroid of (B, H, W) stamps -> (B, 2) as
    (row, col).  Starts from the stamp center; the weight re-centers each
    iteration (the standard adaptive-moments recipe, and the reason the real
    FPFS is insensitive to the half-pixel placement of even-sized stamps)."""
    B, H, W = images.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    cy = jnp.full((B,), (H - 1) / 2.0)
    cx = jnp.full((B,), (W - 1) / 2.0)
    for _ in range(n_iter):
        w = jnp.exp(
            -((ys - cy[:, None, None]) ** 2 + (xs - cx[:, None, None]) ** 2) / (2.0 * sigma_px**2)
        )
        iw = images * w
        tot = iw.sum(axis=(-2, -1)) + 1e-12
        cy = (iw * ys).sum(axis=(-2, -1)) / tot
        cx = (iw * xs).sum(axis=(-2, -1)) / tot
        # benchmark stamps are centered by construction; cap noise-induced
        # centroid jitter so low-SNR measurements stay stable
        cy = jnp.clip(cy, (H - 1) / 2.0 - 3.0, (H - 1) / 2.0 + 3.0)
        cx = jnp.clip(cx, (W - 1) / 2.0 - 3.0, (W - 1) / 2.0 + 3.0)
    return jnp.stack([cy, cx], axis=-1)


@functools.partial(jax.jit, static_argnames=("sigma_arcsec", "pix_scale", "deconv_psf"))
def fpfs_moments(
    images: jnp.ndarray,
    psf: jnp.ndarray | None = None,
    sigma_arcsec: float = 0.6,
    pix_scale: float = 0.2,
    deconv_psf: bool = False,
) -> dict[str, jnp.ndarray]:
    """Gaussian-weighted Fourier shapelet moments of (B, H, W) stamps.

    ``psf``: (B, H, W) centered PSFs to deconvolve by (used when
    ``deconv_psf=True``); otherwise images are treated as already
    deconvolved (the delta-PSF path of the reference).

    The per-stamp centroid is measured with iterative Gaussian-weighted
    first moments and folded into the Fourier phase, so the measurement is
    centered on the galaxy (not the pixel grid) — without this, the
    half-pixel offset of even-sized stamps aliases into a large spurious
    ellipticity on cuspy profiles.
    """
    B, H, W = images.shape
    images = images.astype(jnp.float32)
    images = images - images.min(axis=(-2, -1), keepdims=True)  # reference: obs - obs.min()
    r2, phi = _kgrid(H, W, pix_scale, sigma_arcsec)
    w = jnp.exp(-r2 / 2.0)

    c = weighted_centroid(images, sigma_px=sigma_arcsec / pix_scale)
    ky = 2 * jnp.pi * jnp.fft.fftfreq(H)[None, :, None]  # cycles/px * 2pi
    kx = 2 * jnp.pi * jnp.fft.rfftfreq(W)[None, None, :]
    recenter = jnp.exp(1j * (ky * c[:, 0][:, None, None] + kx * c[:, 1][:, None, None]))

    F = jnp.fft.rfft2(images, axes=(-2, -1)) * recenter
    if deconv_psf:
        # Recenter the PSF spectrum by its own measured centroid and
        # normalize its flux, so the ratio F/P is a pure shape deconvolution
        # (robust to the half-pixel even-stamp placement and to the
        # reference's 1/16 PSF flux convention).
        cp = weighted_centroid(psf, sigma_px=sigma_arcsec / pix_scale)
        recenter_p = jnp.exp(1j * (ky * cp[:, 0][:, None, None] + kx * cp[:, 1][:, None, None]))
        P = jnp.fft.rfft2(psf, axes=(-2, -1)) * recenter_p
        P = P / (jnp.abs(P[:, :1, :1]) + 1e-12)
        F = F / (P + 1e-12)

    # rfft half-spectrum: each column except k_x=0 (and Nyquist) represents
    # two conjugate modes; build the double-count weight once.
    mult = np.full((H, W // 2 + 1), 2.0, np.float32)
    mult[:, 0] = 1.0
    if W % 2 == 0:
        mult[:, -1] = 1.0
    mult = jnp.asarray(mult)

    wq = w * mult
    e2phi = jnp.exp(-2j * phi)
    l2 = (r2**2 - 4.0 * r2 + 2.0) / 2.0

    def accum(q):
        return jnp.sum(q, axis=(-2, -1))

    norm = 1.0 / (H * W)
    m00 = accum(jnp.real(F) * wq) * norm
    # Half-spectrum Hermitian pairing: a (k, -k) pair contributes
    # (F + conj F) e^{-2i phi} = 2 Re(F) e^{-2i phi}  (phi(-k) = phi(k) + pi,
    # so e^{-2i phi} is pair-invariant).  Doubling complex F instead would
    # leak the Im(F) of asymmetric images into both moment components.
    m22 = accum(jnp.real(F) * e2phi * (r2 / 2.0) * wq) * norm
    m40 = accum(jnp.real(F) * l2 * wq) * norm
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
    """Batched (g1, g2, |g|) estimates: (B, H, W) -> (B, 3)."""
    m = fpfs_moments(images, psf, sigma_arcsec, pix_scale, deconv_psf)
    denom = m["M00"] + const
    # Sign convention: a real-space elongation narrows the spectrum along the
    # same axis, flipping the Fourier-measured ellipticity; with this module's
    # (row, col) k-grid that means e1 = -M22c, e2 = +M22s.  The response
    # (M00 - M40)/2/(M00+C) + e^2 is calibrated to be unbiased on Gaussian
    # profiles across sizes (see tests/test_metrics.py).
    e1 = -m["M22c"] / denom
    e2 = m["M22s"] / denom
    r_iso = (m["M00"] - m["M40"]) / 2.0 / denom
    g1 = e1 / (r_iso + e1**2)
    g2 = e2 / (r_iso + e2**2)
    g = jnp.sqrt(g1**2 + g2**2)
    return jnp.stack([g1, g2, g], axis=-1)


def estimate_shear_fpfs_reference(obs: np.ndarray, psf: np.ndarray | None = None, sigma_arcsec: float = 0.6):
    """CPU cross-check using the real fpfs package when installed
    (exact reference metric; reference ``utils/utils_test.py:33-49``)."""
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
