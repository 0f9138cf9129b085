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


    def test_matches_numpy_twin_on_asymmetric_images(self, rng):
        """The batched half-spectrum JAX estimator must agree with the
        auditable full-spectrum NumPy reimplementation (fpfs_numpy) on
        arbitrary asymmetric inputs — both in moments and final shear."""
        from galaxy_deconv_tpu.metrics.fpfs_numpy import estimate_shear_numpy, fpfs_moments_numpy
        from galaxy_deconv_tpu.metrics.shear import fpfs_moments

        gal = sheared_gaussian(0.05, -0.03, sigma=2.5, dx=0.8, dy=-0.6)
        img = np.stack([gal + rng.normal(0, 0.1, gal.shape).astype(np.float32), gal])
        m = fpfs_moments(jnp.asarray(img))
        g = np.asarray(estimate_shear(jnp.asarray(img)))
        for b in range(img.shape[0]):
            x = img[b] - img[b].min()
            mn = fpfs_moments_numpy(x)
            for k in ("M00", "M22c", "M22s", "M40"):
                assert float(m[k][b]) == pytest.approx(mn[k], rel=1e-4, abs=1e-6)
            gn = estimate_shear_numpy(img[b])
            np.testing.assert_allclose(g[b], gn, rtol=1e-4, atol=1e-5)

    def test_position_sensitivity_matches_fpfs_convention(self):
        """The linear estimator (fpfs 3.x) is phase- i.e. position-
        sensitive: stamps are assumed centered at (H//2, W//2), matching
        the real package (its delta 'PSF' cancels exactly that centering
        phase).  Two properties replace the power function's exact
        translation invariance: (a) measuring a rolled galaxy while
        deconvolving by the identically-rolled delta recovers the centered
        measurement exactly (the phases cancel); (b) the estimate is
        continuous under small shifts of a centered galaxy."""
        a = sheared_gaussian(0.04, 0.02, sigma=3.0)
        ea = np.asarray(estimate_shear(jnp.asarray(a[None])))[0]

        # (a) rolled galaxy + identically-rolled delta "PSF"
        b = np.roll(np.roll(a, 3, axis=0), -2, axis=1)
        d = np.roll(np.roll(delta_psf(48, 48), 3, axis=0), -2, axis=1)
        eb = np.asarray(
            estimate_shear(jnp.asarray(b[None]), jnp.asarray(d[None]), deconv_psf=True)
        )[0]
        np.testing.assert_allclose(ea, eb, atol=1e-4)

        # (b) continuity: a 1-px decenter perturbs the estimate at the
        # ~(shift/sigma_weight)^2 level (~0.03 here; benchmark stamps are
        # centered to +-0.25 px, i.e. ~2e-3), far from the wholesale change
        # an uncompensated multi-pixel roll causes
        c = np.roll(a, 1, axis=0)
        ec = np.asarray(estimate_shear(jnp.asarray(c[None])))[0]
        assert abs(ec[0] - ea[0]) < 0.05 and abs(ec[1] - ea[1]) < 0.05

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


@pytest.mark.slow
class TestReferenceFingerprint:
    """Population-level validation against the *real fpfs* measurements
    committed in the reference repo (results_200/No_Deconv/results.json):
    the simulated benchmark + this estimator must reproduce the reference
    benchmark's measured-shape statistics.  This is the strongest available
    cross-check with fpfs not installable here (no per-stamp goldens ship
    with the reference; see metrics/fpfs_numpy.py docstring)."""

    def test_population_statistics_match_reference(self):
        import jax

        from galaxy_deconv_tpu.data.simulate import SimulationConfig, simulate_batch_at_snr

        cfg = SimulationConfig()
        N = 300
        key = jax.random.PRNGKey(7)
        b100 = simulate_batch_at_snr(key, N, 100.0, cfg)
        gt = np.asarray(b100["gt"])
        g_gt = np.asarray(estimate_shear(jnp.asarray(gt)))
        # reference gt_shear (real fpfs on noiseless COSMOS gt): med 0.158, p90 0.395
        assert np.median(g_gt[:, 2]) == pytest.approx(0.158, abs=0.02)
        assert np.percentile(g_gt[:, 2], 90) == pytest.approx(0.395, abs=0.06)
        # seeing dilution at high SNR: reference obs med 0.082, err 0.0684 @ SNR 200
        b200 = simulate_batch_at_snr(key, N, 200.0, cfg)
        g200 = np.asarray(estimate_shear(jnp.asarray(np.asarray(b200["obs"]))))
        assert np.median(g200[:, 2]) == pytest.approx(0.082, abs=0.015)
        err200 = np.median(np.minimum(np.abs(g200[:, 2] - g_gt[:, 2]), 1))
        assert err200 == pytest.approx(0.0684, abs=0.012)
        # noise inflation direction at low SNR (reference med rises to 0.162)
        b20 = simulate_batch_at_snr(key, N, 20.0, cfg)
        g20 = np.asarray(estimate_shear(jnp.asarray(np.asarray(b20["obs"]))))
        assert np.median(g20[:, 2]) > np.median(g200[:, 2]) * 1.5


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
