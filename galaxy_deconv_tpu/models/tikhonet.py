"""Tikhonet: one-shot Tikhonov deconvolution + XDenseUNet denoiser.

Capability parity: reference ``models/Tikhonet.py``.  The Fourier-domain
Tikhonov solve x = Ht*F(y/alpha) / (|H|^2 + lam*|L|^2) with Identity or
Laplacian regularizer, followed by the DenseNet UNet, output rescaled by
alpha.  'ShapeNet' is this same architecture trained with the
ShapeConstraint loss (reference ``train.py:44-45,58-59``).

Deviation (documented): the reference's ``self.lam = torch.tensor(1.,
requires_grad=True)`` is never registered as an nn.Parameter, so lam was
silently frozen at 1.0 during training; here ``lam`` is a real learnable
parameter (softplus-reparameterized to stay positive), initialized so its
initial value is 1.0.  The reference's Laplacian OTF also suffers a
broadcast quirk (see ops.fourier docstring); we use the correct 3x3
circular embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from galaxy_deconv_tpu.nets import XDenseUNet
from galaxy_deconv_tpu.ops import fourier

_SOFTPLUS_INV_1 = float(np.log(np.expm1(1.0)))  # softplus(x) = 1  =>  x = log(e-1)


def tikhonov_solve(
    obs: jnp.ndarray,
    psf: jnp.ndarray,
    alpha: jnp.ndarray,
    lam: jnp.ndarray,
    filter: str = "Laplacian",
    laplacian: str = "reference",
) -> jnp.ndarray:
    """Closed-form Tikhonov-regularized deconvolution at the stamp size.

    ``laplacian='reference'`` uses the reference's quirk OTF (six-tap
    stencil, DC-regularizing — what its shipped weights were trained
    against; see ops.fourier.laplacian_otf_reference_quirk);
    ``laplacian='exact'`` uses the correct 3x3 circular embedding.
    """
    B = obs.shape[0]
    alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)[:, None, None]
    shape = obs.shape[-2:]
    H = fourier.psf_to_otf(psf)
    HtH = jnp.abs(H) ** 2
    numerator = jnp.conj(H) * fourier.rfft2(obs / alpha)
    if filter == "Laplacian":
        if laplacian == "reference":
            L = fourier.laplacian_otf_reference_quirk(shape)
        else:
            L = fourier.psf_to_otf(fourier.laplacian_kernel(), shape)
        divisor = HtH + lam * jnp.abs(L) ** 2
    elif filter == "Identity":
        divisor = HtH + lam
    else:
        raise ValueError(f"unknown Tikhonov filter: {filter}")
    return fourier.irfft2(numerator / divisor, shape)


class Tikhonet(nn.Module):
    filter: str = "Laplacian"
    laplacian: str = "reference"  # 'reference' (quirk-parity) | 'exact'

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = obs.shape[0]
        alpha_flat = jnp.reshape(alpha, (B,)).astype(jnp.float32)
        y = jnp.maximum(obs, 0.0)
        lam_raw = self.param("lam_raw", lambda _: jnp.asarray(_SOFTPLUS_INV_1, jnp.float32))
        lam = nn.softplus(lam_raw)
        x = tikhonov_solve(y, psf, alpha_flat, lam, self.filter, self.laplacian)
        x = XDenseUNet()(x[..., None], train=train)[..., 0]
        return (x * alpha_flat[:, None, None]).astype(jnp.float32)
