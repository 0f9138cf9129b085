"""Unit tests for the Fourier-optics ops layer.

Oracle strategy: mathematical identities (delta kernels, shifts, Parseval,
adjointness) plus an explicit O(N^4) spatial-domain circular convolution on
tiny images, rather than goldens — these pin the conventions (centering,
quadrant swap, pad/crop) that the shear metric is most sensitive to.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu import ops


def circular_conv_direct(kernel_centered: np.ndarray, x: np.ndarray) -> np.ndarray:
    """O(N^4) circular convolution with a centered kernel (independent oracle)."""
    H, W = x.shape
    kh, kw = kernel_centered.shape
    ch, cw = kh // 2, kw // 2
    out = np.zeros_like(x)
    for i in range(kh):
        for j in range(kw):
            out += kernel_centered[i, j] * np.roll(x, (i - ch, j - cw), axis=(0, 1))
    return out


class TestOtf:
    def test_delta_center_is_identity(self):
        H = 16
        psf = np.zeros((H, H), np.float32)
        psf[H // 2, H // 2] = 1.0
        otf = ops.psf_to_otf(jnp.asarray(psf))
        np.testing.assert_allclose(np.asarray(otf), np.ones((H, H // 2 + 1)), atol=1e-6)

    def test_conv_matches_direct_even_kernel(self, rng):
        x = rng.standard_normal((16, 16)).astype(np.float32)
        k = rng.standard_normal((16, 16)).astype(np.float32)
        otf = ops.psf_to_otf(jnp.asarray(k))
        got = np.asarray(ops.conv_fft(otf, jnp.asarray(x)))
        want = circular_conv_direct(k, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_conv_matches_direct_small_odd_kernel(self, rng):
        x = rng.standard_normal((12, 12)).astype(np.float32)
        k = np.asarray(ops.laplacian_kernel())
        otf = ops.psf_to_otf(jnp.asarray(k), (12, 12))
        got = np.asarray(ops.conv_fft(otf, jnp.asarray(x)))
        want = circular_conv_direct(k, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_matches_reference_quadrant_swap_convention(self, rng):
        """For even image-sized kernels the OTF must equal the reference's
        quadrant-swap + fft construction (utils/utils_torch.py:79-92)."""
        k = rng.standard_normal((48, 48)).astype(np.float32)
        c = (48 + 1) // 2
        swapped = np.zeros_like(k)
        swapped[:c, :c] = k[c:, c:]
        swapped[:c, -c:] = k[c:, :c]
        swapped[-c:, :c] = k[:c, c:]
        swapped[-c:, -c:] = k[:c, :c]
        want = np.fft.rfft2(swapped)
        got = np.asarray(ops.psf_to_otf(jnp.asarray(k)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_batched_broadcast(self, rng):
        x = rng.standard_normal((4, 16, 16)).astype(np.float32)
        k = rng.standard_normal((4, 16, 16)).astype(np.float32)
        otf = ops.psf_to_otf(jnp.asarray(k))
        got = np.asarray(ops.conv_fft(otf, jnp.asarray(x)))
        for b in range(4):
            np.testing.assert_allclose(got[b], circular_conv_direct(k[b], x[b]), rtol=1e-4, atol=1e-4)


class TestPadCrop:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))
        padded = ops.pad_double(x)
        assert padded.shape == (2, 96, 96)
        np.testing.assert_array_equal(np.asarray(ops.crop_half(padded)), np.asarray(x))

    def test_pad_is_centered(self):
        x = jnp.ones((4, 4))
        p = np.asarray(ops.pad_double(x))
        assert p.shape == (8, 8)
        assert p[:2].sum() == 0 and p[-2:].sum() == 0
        assert p[2:6, 2:6].sum() == 16

    def test_pad_to_size_centered_odd_kernel(self):
        k = np.asarray(ops.laplacian_kernel())
        p = np.asarray(ops.pad_to_size_centered(jnp.asarray(k), (9, 9)))
        # center of the 3x3 kernel (-4) must land on the canvas center pixel
        assert p[4, 4] == -4.0
        assert p.sum() == pytest.approx(0.0)


class TestResize:
    def test_average_downsample_constant(self):
        x = jnp.full((8, 8), 3.0)
        np.testing.assert_allclose(np.asarray(ops.average_downsample(x, 4)), np.full((2, 2), 3.0))

    def test_average_downsample_blocks(self, rng):
        x = rng.standard_normal((2, 8, 8)).astype(np.float32)
        got = np.asarray(ops.average_downsample(jnp.asarray(x), 2))
        want = x.reshape(2, 4, 2, 4, 2).mean(axis=(2, 4))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_pad_to_multiple_edge(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 45, 45, 1)).astype(np.float32))
        padded, (h, w) = ops.pad_to_multiple_edge(x, 8)
        assert padded.shape == (1, 48, 48, 1)
        assert (h, w) == (45, 45)
        # replication: last padded row equals last original row
        np.testing.assert_array_equal(np.asarray(padded[0, 46, :45, 0]), np.asarray(x[0, 44, :, 0]))

    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        up = np.asarray(ops.upsample_nearest(x, 2))
        assert up.shape == (1, 4, 4, 1)
        assert (up[0, :2, :2, 0] == 0).all() and (up[0, 2:, 2:, 0] == 3).all()


class TestShiftConventions:
    def test_pad_fft_shift_chain_centers_energy(self, rng):
        """The Gaussian-ADMM chain fftshift(irfft2(rfft2(ifftshift(pad(x)))))
        must be the identity on the padded canvas."""
        x = jnp.asarray(rng.standard_normal((48, 48)).astype(np.float32))
        p = ops.pad_double(x)
        back = ops.fftshift2(ops.irfft2(ops.rfft2(ops.ifftshift2(p)), (96, 96)))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-4, atol=1e-4)


class TestConvFftSymm:
    def test_matches_direct_symmetric_conv(self, rng):
        """Oracle: O(N^4) direct convolution with reflect boundary."""
        x = rng.standard_normal((12, 12)).astype(np.float32)
        k = rng.standard_normal((5, 5)).astype(np.float32)
        got = np.asarray(ops.conv_fft_symm(jnp.asarray(k), jnp.asarray(x)[None])[0])

        # reflect-pad (no edge duplication, as torch ReflectionPad2d) and
        # convolve; centered 5x5 kernel taps offsets in [-2, 2]
        xp = np.pad(x, 5, mode="reflect")
        want = np.zeros_like(x)
        for i in range(12):
            for j in range(12):
                acc = 0.0
                for a in range(5):
                    for b in range(5):
                        acc += k[a, b] * xp[5 + i - (a - 2), 5 + j - (b - 2)]
                want[i, j] = acc
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_delta_kernel_is_identity(self, rng):
        x = rng.standard_normal((2, 16, 16)).astype(np.float32)
        k = np.zeros((3, 3), np.float32)
        k[1, 1] = 1.0
        got = np.asarray(ops.conv_fft_symm(jnp.asarray(k), jnp.asarray(x)))
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


class TestDeblurToolbox:
    """Classical-deblur utilities (reference utils/utils_deblur.py capability)."""

    def test_gauss_kernel_normalized_symmetric(self):
        k = np.asarray(ops.gauss_kernel(11, 1.7))
        assert k.shape == (11, 11)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(k, k[::-1, ::-1], rtol=1e-6)  # centered
        np.testing.assert_allclose(k, k.T, rtol=1e-6)  # isotropic
        assert k[5, 5] == k.max()

    def test_disk_normalized_and_binary_support(self):
        k = np.asarray(ops.disk(15, 4.0))
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        vals = np.unique(k)
        assert len(vals) == 2 and vals[0] == 0.0
        np.testing.assert_allclose(k, k[::-1, ::-1], rtol=1e-6)

    def test_disk_tiny_radius_falls_back_to_delta(self):
        """r below the nearest grid point must not produce 0/0 NaNs."""
        k = np.asarray(ops.disk(16, 0.5))
        assert np.isfinite(k).all()
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        assert (k > 0).sum() == 4  # the four nearest-to-center pixels of an even grid

    def test_shrinkage_is_soft_threshold(self, rng):
        z = rng.standard_normal((64,)).astype(np.float32)
        got = np.asarray(ops.shrinkage(jnp.asarray(z), 0.3))
        want = np.sign(z) * np.maximum(np.abs(z) - 0.3, 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_tv_grad_periodic_and_adjoint(self, rng):
        u = rng.standard_normal((9, 12)).astype(np.float32)
        dx, dy = ops.tv_grad(jnp.asarray(u))
        # forward difference with circular wrap (reference D semantics)
        np.testing.assert_allclose(np.asarray(dx)[:, -1], u[:, 0] - u[:, -1], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dy)[-1, :], u[0, :] - u[-1, :], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dx)[:, :-1], np.diff(u, axis=1), rtol=1e-5, atol=1e-6)
        # adjoint identity <D u, p> == <u, D* p>
        px, py = rng.standard_normal(u.shape).astype(np.float32), rng.standard_normal(u.shape).astype(np.float32)
        lhs = (np.asarray(dx) * px + np.asarray(dy) * py).sum()
        rhs = (u * np.asarray(ops.tv_grad_adjoint(jnp.asarray(px), jnp.asarray(py)))).sum()
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_estimate_kernel_recovers_gaussian_blur(self, rng):
        """Blind kernel estimation: blur a blocky image with a known
        Gaussian, recover a normalized kernel peaked at the center that
        correlates with the truth.  (The saliency mask makes the reference
        algorithm approximate by construction, so exact-moment recovery is
        not expected — see ops/deblur.py docstrings.)"""
        blocks = rng.random((8, 8)).astype(np.float32) * 8
        x = np.kron(blocks, np.ones((8, 8), np.float32))
        k_true = np.asarray(ops.gauss_kernel(9, 1.2))
        otf = ops.psf_to_otf(jnp.asarray(k_true), (64, 64))
        y = ops.conv_fft(otf, jnp.asarray(x)[None])[0]
        k_est = np.asarray(ops.estimate_kernel(jnp.asarray(x), y, lambda_l2=1e-3, ksize=15))
        np.testing.assert_allclose(k_est.sum(), 1.0, rtol=1e-5)
        assert k_est.min() >= 0.0
        peak = np.unravel_index(k_est.argmax(), k_est.shape)
        assert peak == (7, 7)  # exactly centered (zero-lag at ksize//2)
        ax = np.arange(15) - 7.0
        cy, cx = (k_est * ax[:, None]).sum(), (k_est * ax[None, :]).sum()
        assert abs(cy) < 0.5 and abs(cx) < 0.5
        kt = np.zeros((15, 15), np.float32)
        kt[3:12, 3:12] = k_true
        corr = (k_est * kt).sum() / np.sqrt((k_est**2).sum() * (kt**2).sum())
        assert corr > 0.5

    def test_bayer_roundtrip(self, rng):
        x = rng.random((8, 10, 3)).astype(np.float32)
        bayer = np.asarray(ops.rgb_to_bayer(jnp.asarray(x)))
        assert bayer.shape == (16, 20)
        planes = [bayer[0::2, 0::2], bayer[0::2, 1::2], bayer[1::2, 0::2], bayer[1::2, 1::2]]
        rgb = np.asarray(ops.rggb_to_rgb([jnp.asarray(p) for p in planes]))
        np.testing.assert_allclose(rgb, x, rtol=1e-6)
        bgr = np.asarray(ops.rggb_to_rgb([jnp.asarray(p) for p in planes], switch_rgb=True))
        np.testing.assert_allclose(bgr, x[:, :, ::-1], rtol=1e-6)

    def test_gradient_mask_keeps_coherent_edges(self):
        """A clean step edge survives masking; flat regions are zeroed."""
        u = np.zeros((32, 32), np.float32)
        u[:, 16:] = 4.0
        dx, dy = ops.tv_grad(jnp.asarray(u))
        mx, my, m = ops.gradient_mask(dx, dy)
        mx = np.asarray(mx)
        assert mx[16, 15] != 0.0  # edge gradient kept (scaled)
        assert np.all(np.asarray(my) == 0.0)  # no vertical gradients anywhere
        assert mx[16, 5] == 0.0  # flat region suppressed
