"""Pallas kernel correctness (interpret mode on CPU) against the jnp
reference implementation and the solver's x_update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.models.unrolled_admm_gaussian import gaussian_spectra, x_update
from galaxy_deconv_tpu.ops.pallas_kernels import (
    x_update_batch_last,
    x_update_spectral,
    x_update_spectral_pallas,
)


class TestSpectralSolveKernel:
    def test_matches_jnp_reference(self, rng):
        K, B = 4704, 128
        arrs = [jnp.asarray(rng.standard_normal((K, B)).astype(np.float32)) for _ in range(6)]
        hth = jnp.asarray(np.abs(rng.standard_normal((K, B))).astype(np.float32)) + 0.1
        rho = jnp.asarray(np.abs(rng.standard_normal((1, B))).astype(np.float32)) + 0.1
        want = x_update_spectral(*arrs, hth, rho)
        got = x_update_spectral_pallas(*arrs, hth, rho, interpret=True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)

    def test_ragged_grid(self, rng):
        # K and B not multiples of the block sizes
        K, B = 100, 70
        arrs = [jnp.asarray(rng.standard_normal((K, B)).astype(np.float32)) for _ in range(6)]
        hth = jnp.ones((K, B)) * 0.5
        rho = jnp.ones((1, B))
        want = x_update_spectral(*arrs, hth, rho)
        got = x_update_spectral_pallas(*arrs, hth, rho, interpret=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-5, atol=1e-5)


class TestXUpdateDropIn:
    def test_matches_solver_x_update(self, rng):
        B = 4
        y = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
        psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) / 100)
        z = jnp.asarray(rng.standard_normal((B, 48, 48)).astype(np.float32))
        u = jnp.asarray(rng.standard_normal((B, 48, 48)).astype(np.float32))
        rho = jnp.asarray(np.abs(rng.standard_normal((B, 1, 1))).astype(np.float32)) + 0.5

        Y, Ht, HtH = gaussian_spectra(y, psf)
        want = np.asarray(x_update(Y, Ht, HtH, z, u, rho, (48, 48), impl="xla"))
        got = np.asarray(x_update_batch_last(Y, Ht, HtH, z, u, rho, (96, 96), interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
