"""SubNet — the ADMM hyperparameter (penalty schedule) network.

Capability parity with reference ``models/unrolled_admm_gaussian.py:43-71``
(single-rho Gaussian variant) and ``models/Unrolled_ADMM.py:59-90``
(two-rho Poisson variant): embeds the 48x48 PSF into a 128x128 canvas,
takes the power spectrum |FFT|^2, runs a small CNN (4 x [maxpool2 +
DoubleConv]) down to 8x8x16, concatenates the photon level alpha, and maps
through a 3-layer MLP with Softplus to ``n_outputs`` strictly positive
per-iteration penalty parameters (+1e-6 floor to guard the downstream
divisions).

TPU notes: the FFT runs over the batch in one rfft2; the |H|^2 power
spectrum is Hermitian so only the half spectrum is computed and then
mirrored to the full 128x128 grid the CNN expects.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets.blocks import DoubleConv
from galaxy_deconv_tpu.ops import fourier


def psf_power_spectrum(psf: jnp.ndarray, size: int = 128) -> jnp.ndarray:
    """|FFT|^2 of the PSF embedded centered in a ``size`` x ``size`` canvas.

    psf: (B, h, w) -> (B, size, size) float32.
    """
    k_pad = fourier.pad_to_size_centered(psf, (size, size))
    H = jnp.fft.fft2(fourier.ifftshift2(k_pad), axes=(-2, -1))
    return jnp.abs(H).astype(jnp.float32) ** 2


class SubNet(nn.Module):
    """PSF power spectrum + alpha -> ``n_outputs`` positive scalars per sample.

    ``raw=True`` returns the pre-Softplus logits instead (used by the
    bounded-rho ADMM variant, which applies its own log-space squashing;
    reference parity keeps the default Softplus + 1e-6 head).
    """

    n_outputs: int
    spectrum_size: int = 128
    raw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """psf: (B, h, w); alpha: broadcastable to (B,).  Returns (B, n_outputs)."""
        B = psf.shape[0]
        alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)
        x = psf_power_spectrum(psf, self.spectrum_size)[..., None]  # (B, 128, 128, 1)

        for ch in (4, 8, 16, 16):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = DoubleConv(ch, dtype=self.dtype)(x, train=train)

        x = x.reshape(B, -1)
        x = jnp.concatenate([x, alpha[:, None]], axis=-1)
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        x = nn.Dense(self.n_outputs, dtype=self.dtype)(x)
        if self.raw:
            return x.astype(jnp.float32)
        return nn.softplus(x).astype(jnp.float32) + 1e-6
