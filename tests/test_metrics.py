"""Metric tests: PSNR identities and shear-estimator calibration."""

import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.metrics import delta_psf, estimate_shear, psnr


def sheared_gaussian(g1, g2, sigma=3.0, H=48, flux=100.0, dx=0.0, dy=0.0):
    ys = np.arange(H) - H // 2 - dy
    xs = np.arange(H) - H // 2 - dx
    Y, X = np.meshgrid(ys, xs, indexing="ij")
    Xs = (1 - g1) * X - g2 * Y
    Ys = -g2 * X + (1 + g1) * Y
    img = np.exp(-(Xs**2 + Ys**2) / (2 * sigma**2))
    return (flux * img / img.sum()).astype(np.float32)


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((1, 8, 8))
        b = jnp.ones((1, 8, 8)) * 0.5
        # pixel_max = 0.5, mse = 0.25 -> 20*log10(0.5/0.5) = 0
        assert float(psnr(a, b)[0]) == pytest.approx(0.0, abs=1e-5)

    def test_higher_for_closer(self, rng):
        gt = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
        near = gt + 0.01
        far = gt + 0.5
        assert (np.asarray(psnr(near, gt)) > np.asarray(psnr(far, gt))).all()


class TestShearEstimator:
    @pytest.mark.parametrize("sigma", [2.0, 3.0, 5.0])
    @pytest.mark.parametrize("g", [(0.03, 0.0), (0.0, 0.05), (0.05, -0.05), (-0.02, 0.04)])
    def test_unbiased_on_gaussians(self, sigma, g):
        img = sheared_gaussian(*g, sigma=sigma)
        out = np.asarray(estimate_shear(jnp.asarray(img[None])))[0]
        assert out[0] == pytest.approx(g[0], abs=2e-3)
        assert out[1] == pytest.approx(g[1], abs=2e-3)
        assert out[2] == pytest.approx(np.hypot(*g), abs=3e-3)


    def test_m22_matches_full_spectrum_on_asymmetric_images(self, rng):
        """Half-spectrum M22 must equal the full-spectrum shapelet sum even
        for images with no symmetry (Im F != 0): the Hermitian pairing doubles
        Re(F), not complex F."""
        from galaxy_deconv_tpu.metrics.shear import fpfs_moments, weighted_centroid

        img = np.abs(rng.standard_normal((2, 48, 48))).astype(np.float32)
        m = fpfs_moments(jnp.asarray(img))
        sigma_arcsec, pix = 0.6, 0.2
        x = img - img.min(axis=(-2, -1), keepdims=True)
        c = np.asarray(weighted_centroid(jnp.asarray(x), sigma_px=sigma_arcsec / pix))
        H, W = img.shape[-2:]
        ky = 2 * np.pi * np.fft.fftfreq(H)[:, None]
        kx = 2 * np.pi * np.fft.fftfreq(W)[None, :]
        KY = 2 * np.pi * np.fft.fftfreq(H, d=pix)[:, None]
        KX = 2 * np.pi * np.fft.fftfreq(W, d=pix)[None, :]
        r2 = (KY**2 + KX**2) * sigma_arcsec**2
        w = np.exp(-r2 / 2)
        phi = np.arctan2(KY, KX)
        for b in range(img.shape[0]):
            F = np.fft.fft2(x[b]) * np.exp(1j * (ky * c[b, 0] + kx * c[b, 1]))
            m22 = np.sum(F * np.exp(-2j * phi) * (r2 / 2) * w) / (H * W)
            assert float(m["M22c"][b]) == pytest.approx(m22.real, rel=1e-4, abs=1e-6)
            assert float(m["M22s"][b]) == pytest.approx(m22.imag, rel=1e-4, abs=1e-6)

    def test_round_galaxy_zero_shear(self):
        img = sheared_gaussian(0.0, 0.0)
        out = np.asarray(estimate_shear(jnp.asarray(img[None])))[0]
        assert abs(out[2]) < 1e-4

    def test_batched(self):
        imgs = np.stack([sheared_gaussian(0.03, 0.0), sheared_gaussian(0.0, 0.04)])
        out = np.asarray(estimate_shear(jnp.asarray(imgs)))
        assert out.shape == (2, 3)
        assert out[0, 0] == pytest.approx(0.03, abs=2e-3)
        assert out[1, 1] == pytest.approx(0.04, abs=2e-3)

    def test_subpixel_offset_consistency(self):
        """The benchmark compares rec vs gt of the *same* galaxy; a common
        sub-pixel offset must shift both estimates together."""
        a = sheared_gaussian(0.03, 0.02, dx=0.7, dy=-0.5)
        b = sheared_gaussian(0.03, 0.02, dx=0.7, dy=-0.5, flux=73.0)
        ea = np.asarray(estimate_shear(jnp.asarray(a[None])))[0]
        eb = np.asarray(estimate_shear(jnp.asarray(b[None])))[0]
        # flux-scaled copy of the same image: only the M00+C denominators
        # differ; estimates stay within a few 1e-3
        np.testing.assert_allclose(ea[:2], eb[:2], atol=5e-3)

    def test_psf_deconvolution_path(self):
        """Measuring (gal * psf) while deconvolving by the psf must recover
        the same shear as measuring the galaxy alone."""
        gal = sheared_gaussian(0.04, -0.02, sigma=3.0)
        psf = sheared_gaussian(0.0, 0.0, sigma=2.0, flux=1.0)
        blurred = np.fft.irfft2(np.fft.rfft2(np.fft.ifftshift(gal)) * np.fft.rfft2(np.fft.ifftshift(psf)), (48, 48))
        blurred = np.fft.fftshift(blurred).astype(np.float32)
        e_deconv = np.asarray(
            estimate_shear(jnp.asarray(blurred[None]), jnp.asarray(psf[None]), deconv_psf=True)
        )[0]
        e_direct = np.asarray(estimate_shear(jnp.asarray(gal[None])))[0]
        np.testing.assert_allclose(e_deconv[:2], e_direct[:2], atol=3e-3)

    def test_delta_psf_fixture(self):
        d = delta_psf(48, 48)
        assert d.shape == (48, 48) and d[24, 24] == 1.0 and d.sum() == 1.0


class TestAdaptiveMoments:
    """ngmix-equivalent elliptical-Gaussian-fit estimator."""

    def test_exact_on_gaussians(self):
        from galaxy_deconv_tpu.metrics import adaptive_moments, estimate_shear_adaptive

        img = sheared_gaussian(0.04, -0.03, sigma=2.5, dx=0.6, dy=-0.4)
        out = np.asarray(estimate_shear_adaptive(jnp.asarray(img[None])))[0]
        assert out[0] == pytest.approx(0.04, abs=1e-3)
        assert out[1] == pytest.approx(-0.03, abs=1e-3)
        m = adaptive_moments(jnp.asarray(img[None]))
        # shear inflates T by ~(1+|g|^2)/(1-|g|^2)
        assert float(m["T"][0]) == pytest.approx(2 * 2.5**2, rel=1.5e-2)
        assert float(m["cx"][0]) == pytest.approx(24.6, abs=1e-2)
        assert float(m["cy"][0]) == pytest.approx(23.6, abs=1e-2)

    def test_batched_and_noise_tolerant(self, rng):
        from galaxy_deconv_tpu.metrics import estimate_shear_adaptive

        imgs = np.stack([sheared_gaussian(0.03, 0.0), sheared_gaussian(0.0, 0.04)])
        noisy = imgs + rng.normal(0, 0.01 * imgs.max(), imgs.shape).astype(np.float32)
        out = np.asarray(estimate_shear_adaptive(jnp.asarray(noisy)))
        assert out.shape == (2, 3)
        assert out[0, 0] == pytest.approx(0.03, abs=5e-3)
        assert out[1, 1] == pytest.approx(0.04, abs=5e-3)
