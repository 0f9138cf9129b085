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
