"""Matmul-DFT spectra (ops/dft.py) vs the stock FFT path — exact-equivalence
tests for the fused pad+shift+rfft2 / irfft2+shift+crop transforms, their
round-trip, gradients, and the solver wired through fft_impl="matmul"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.models.unrolled_admm_gaussian import (
    UnrolledADMMGaussian,
    gaussian_spectra,
    wiener_init,
    x_update,
)
from galaxy_deconv_tpu.ops import dft, fourier


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ref_fwd(x):
    return fourier.rfft2(fourier.ifftshift2(fourier.pad_double(x)))


def _ref_inv(S, shape):
    padded = (2 * shape[0], 2 * shape[1])
    return fourier.crop_half(fourier.fftshift2(fourier.irfft2(S, padded)))


class TestSpecTransforms:
    @pytest.mark.parametrize("hw", [(48, 48), (24, 32)])
    def test_forward_matches_fft(self, rng, hw):
        x = jnp.asarray(rng.standard_normal((3, *hw)).astype(np.float32))
        want = np.asarray(_ref_fwd(x))
        got = np.asarray(dft.spec_rfft2_padded(x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)

    @pytest.mark.parametrize("hw", [(48, 48), (24, 32)])
    def test_inverse_matches_fft(self, rng, hw):
        # a half-spectrum of a real padded image (so the Hermitian-weight
        # folding in the inverse is exercised on realistic data)
        S = _ref_fwd(jnp.asarray(rng.standard_normal((3, *hw)).astype(np.float32)))
        S = S * (1.0 + 0.3j)  # perturb off the exact-roundtrip manifold
        want = np.asarray(_ref_inv(S, hw))
        got = np.asarray(dft.spec_irfft2_cropped(S, hw))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)

    def test_plan_cache_safe_across_traces(self):
        # regression (round-5 eval-sweep failure): the transform-matrix cache
        # must hold numpy, because a jnp constant materialized during one jit
        # trace is a trace-local tracer — caching it leaks it into the next
        # trace (UnexpectedTracerError).  Simulate a cold cache whose first
        # population happens INSIDE a jit trace, then trace again.
        dft._plan.cache_clear()
        dft._iplan.cache_clear()
        x = jnp.ones((2, 48, 48))
        jax.jit(lambda x: dft.spec_rfft2_padded(x).real.sum())(x)
        jax.jit(lambda x: dft.spec_rfft2_padded(x * 2).real.sum())(x)  # must not raise
        S = dft.spec_rfft2_padded(x)
        jax.jit(lambda s: dft.spec_irfft2_cropped(s, (48, 48)).sum())(S)
        jax.jit(lambda s: dft.spec_irfft2_cropped(s * 2, (48, 48)).sum())(S)

    def test_roundtrip_identity(self, rng):
        # pad -> spectrum -> crop is exactly identity on the stamp
        x = jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))
        back = dft.spec_irfft2_cropped(dft.spec_rfft2_padded(x), (48, 48))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-4)

    def test_forward_grad_matches_fft(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))

        def loss_dft(x):
            return jnp.sum(jnp.abs(dft.spec_rfft2_padded(x)) ** 2 * 1e-3)

        def loss_fft(x):
            return jnp.sum(jnp.abs(_ref_fwd(x)) ** 2 * 1e-3)

        g1 = np.asarray(jax.grad(loss_dft)(x))
        g2 = np.asarray(jax.grad(loss_fft)(x))
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-3)
        del ct


class TestSolverParity:
    def _inputs(self, rng, B=3):
        y = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) * 20)
        psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
        psf = psf / psf.sum(axis=(1, 2), keepdims=True)
        alpha = jnp.asarray(np.full((B,), 50.0, np.float32))
        return y, psf, alpha

    def test_x_update_impl_parity(self, rng):
        y, psf, alpha = self._inputs(rng)
        z = jnp.asarray(rng.standard_normal((3, 48, 48)).astype(np.float32))
        u = jnp.asarray(rng.standard_normal((3, 48, 48)).astype(np.float32))
        rho = jnp.full((3, 1, 1), 0.7, jnp.float32)
        Yx, Htx, HtHx = gaussian_spectra(y, psf, "xla")
        Ym, Htm, HtHm = gaussian_spectra(y, psf, "matmul")
        np.testing.assert_allclose(np.asarray(Ym), np.asarray(Yx), rtol=2e-5, atol=2e-3)
        a = np.asarray(x_update(Yx, Htx, HtHx, z, u, rho, (48, 48), "xla"))
        b = np.asarray(x_update(Ym, Htm, HtHm, z, u, rho, (48, 48), "matmul"))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-3)
        wa = np.asarray(wiener_init(Yx, Htx, HtHx, alpha, (48, 48), "xla"))
        wb = np.asarray(wiener_init(Ym, Htm, HtHm, alpha, (48, 48), "matmul"))
        np.testing.assert_allclose(wb, wa, rtol=1e-4, atol=1e-3)

    def test_full_model_impl_parity(self, rng):
        # end-to-end: the flagship forward through both spectral impls
        y, psf, alpha = self._inputs(rng, B=2)
        model_x = UnrolledADMMGaussian(n_iters=2, features=(8, 8, 8, 8), fft_impl="xla")
        model_m = UnrolledADMMGaussian(n_iters=2, features=(8, 8, 8, 8), fft_impl="matmul")
        variables = model_x.init(jax.random.PRNGKey(0), y, psf, alpha)
        out_x = np.asarray(model_x.apply(variables, y, psf, alpha))
        out_m = np.asarray(model_m.apply(variables, y, psf, alpha))
        np.testing.assert_allclose(out_m, out_x, rtol=1e-4, atol=5e-4)
