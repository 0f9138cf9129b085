"""Closed-form baseline solvers: Wiener filter and identity passthrough."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.ops import fourier


class Wiener(nn.Module):
    """One-shot Wiener deconvolution x = Ht*Y / (|H|^2 + nsr/alpha).

    Capability parity: reference ``models/Wiener.py`` (hard-coded NSR
    constant 350 exposed as a field here).  Circular convolution model at
    the stamp size; no learnable parameters.
    """

    nsr: float = 350.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        B = obs.shape[0]
        alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)[:, None, None]
        H = fourier.psf_to_otf(psf)
        numerator = jnp.conj(H) * fourier.rfft2(obs)
        divisor = jnp.abs(H) ** 2 + self.nsr / alpha
        return fourier.irfft2(numerator / divisor, obs.shape[-2:])


class NoDeconv(nn.Module):
    """Identity passthrough — the 'No_Deconv' baseline of the eval harness."""

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del psf, alpha, train
        return obs
