"""Richardson–Lucy iterative deconvolution.

Capability parity: reference ``models/Richard_Lucy.py`` — multiplicative
updates x <- x * (Ht (y / Hx)) / (Ht 1) with the circular FFT convolution
model, initialized at the observation, iteration counts {10,20,30,50,100}.

TPU notes: the fixed-length iteration runs under ``lax.fori_loop`` so the
compiled program is one small loop body regardless of ``n_iters``; OTFs are
computed once outside the loop.  An optional ``eps`` guards the ratio
against division blow-ups (the reference is unguarded; default keeps
parity with eps=0).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from galaxy_deconv_tpu.ops import fourier


class RichardsonLucy(nn.Module):
    n_iters: int = 30
    eps: float = 0.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray = None, train: bool = False) -> jnp.ndarray:
        del alpha, train
        y = jnp.maximum(obs, 0.0)
        H = fourier.psf_to_otf(psf)
        Ht = jnp.conj(H)
        shape = obs.shape[-2:]
        # Ht applied to the all-ones image is a constant image equal to the
        # kernel sum (DC gain); computing it via FFT keeps exact parity with
        # the reference's conv_fft_batch(Ht, ones).
        divisor = fourier.conv_fft(Ht, jnp.ones_like(y))

        def body(_, x):
            Hx = fourier.conv_fft(H, x)
            ratio = y / (Hx + self.eps) if self.eps else y / Hx
            numerator = fourier.conv_fft(Ht, ratio)
            return x * numerator / divisor

        return jax.lax.fori_loop(0, self.n_iters, body, y)
