"""ADMMNet — plug-and-play ADMM with fixed penalties and a frozen denoiser.

Capability parity: reference ``models/ADMMNet.py`` — the ablation baseline
that runs the same two-dual ADMM loop as :class:`UnrolledADMM` but with
rho1 = rho2 = 0.5 hard-coded (reference ``:118-119``) and a *separately
pre-trained* denoiser whose weights are loaded from file and never updated
("PnP with frozen denoiser" training style, reference ``:51-58``).

In the functional JAX design "frozen" simply means: initialize this
module, then overwrite its denoiser subtree with pretrained parameters and
exclude them from the optimizer (see ``train.loop.freeze_mask``).  Output
is rescaled by alpha (reference ``:129``).

Reference design quirk, preserved by default: the frozen denoiser is
trained on raw-ADU denoise stamps (reference generate_data.py:423-431)
but applied to the *unit-scale* ADMM variable x+u1 (reference ``:123``),
a large train/inference input-scale mismatch that makes ADMMNet the
paper's weakest learned baseline.  ``denoiser_scale='adu'`` fixes it:
the denoiser sees alpha-rescaled (training-scale) inputs,
z = D((x+u1)*alpha)/alpha, with identical parameters.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets import ResUNet, XDenseUNet
from galaxy_deconv_tpu.ops import fourier
from galaxy_deconv_tpu.models.unrolled_admm import (
    v_update_gaussian,
    v_update_poisson,
    v_update_poisson_exact,
)


class ADMMNet(nn.Module):
    n_iters: int = 8
    llh: str = "Poisson"
    denoiser: str = "ResUNet"
    features: Sequence[int] = (64, 128, 256, 512)
    rho1: float = 0.5
    rho2: float = 0.5
    denoiser_scale: str = "unit"  # 'unit' = reference quirk; 'adu' = scale-matched
    # 'reference' keeps the reference's non-prox v-update (wrong quadratic
    # root -> a ~alpha/rho2 constant plane on the loop variable; see
    # v_update_poisson docstring); 'exact' uses the true Poisson prox.
    poisson_prox: str = "reference"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.denoiser_scale not in ("unit", "adu"):
            raise ValueError(f"denoiser_scale must be 'unit' or 'adu', got {self.denoiser_scale!r}")
        if self.poisson_prox not in ("reference", "exact"):
            raise ValueError(f"poisson_prox must be 'reference' or 'exact', got {self.poisson_prox!r}")
        B = obs.shape[0]
        shape = obs.shape[-2:]
        alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)[:, None, None]
        y = jnp.maximum(obs, 0.0)

        H = fourier.psf_to_otf(psf)
        Ht, HtH = jnp.conj(H), jnp.abs(H) ** 2

        if self.denoiser == "ResUNet":
            net = ResUNet(features=self.features, dtype=self.dtype)
            denoise = lambda z: net(z[..., None])[..., 0]
        else:
            net = XDenseUNet(dtype=self.dtype)
            denoise = lambda z: net(z[..., None], train=train)[..., 0]

        x = fourier.irfft2(Ht * fourier.rfft2(y / alpha) / (HtH + 1.0 / alpha), shape)
        x = jnp.clip(x, 0.0, 1.0)
        z, v = x, y
        u1 = jnp.zeros_like(x)
        u2 = jnp.zeros_like(y)

        rho1, rho2 = self.rho1, self.rho2
        for _ in range(self.n_iters):
            Hx = fourier.conv_fft(H, x)
            if self.llh == "Poisson" and self.poisson_prox == "exact":
                v = v_update_poisson_exact(Hx + u2, y, rho2, alpha)
            elif self.llh == "Poisson":
                v = v_update_poisson(Hx + u2, y, rho2, alpha)
            else:
                v = v_update_gaussian(Hx + u2, y / alpha, rho2)
            if self.denoiser_scale == "adu":
                z = denoise((x + u1) * alpha) / alpha
            else:
                z = denoise(x + u1)
            rhs = fourier.rfft2(rho1 * (z - u1) + rho2 * fourier.conv_fft(Ht, v - u2))
            # reference ADMMNet.py:16 pairs rho1 with |H|^2 in the
            # denominator (same quirk as the shadowed Unrolled_ADMM X_Update;
            # numerically identical at the rho1 == rho2 = 0.5 defaults)
            x = fourier.irfft2(rhs / (rho1 * HtH + rho2), shape)
            u1 = u1 + x - z
            u2 = u2 + fourier.conv_fft(H, x) - v

        return (x * alpha).astype(jnp.float32)
