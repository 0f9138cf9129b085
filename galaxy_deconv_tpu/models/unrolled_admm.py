"""Unrolled PnP-ADMM with Poisson or Gaussian likelihood (two-dual variant).

Capability parity: reference ``models/Unrolled_ADMM.py:153-216`` — the
variant evaluated by ``test.py:42-44``.  Differences from the Gaussian
flagship: pure circular convolution at the stamp size (no pad/crop), a
separate likelihood variable v with its own dual u2, per-iteration
(rho1, rho2) predicted by a single SubNet with 2*n outputs, and the
Poisson proximal map solved in closed form.  The Poisson path returns
``x * alpha``; the Gaussian path fits ``y / alpha`` and returns x.

Update order per iteration (v, z, x then duals):
    v = prox_likelihood(H x + u2)              (Poisson quadratic / Gaussian average)
    z = denoiser(x + u1)                       (PnP)  or soft-threshold (l1)
    x = F^-1( F(rho1 (z-u1) + rho2 Ht(v-u2)) / (rho1 |H|^2 + rho2) )
    u1 += x - z ;  u2 += H x - v

X-update quirk, preserved (load-bearing for transplanted weights): the
reference file defines ``X_Update`` twice; the second definition
(``models/Unrolled_ADMM.py:311-319``) *shadows* the first (``:93-101``) at
import time, so the model actually evaluated by ``test.py`` divides by
``rho1*|H|^2 + rho2`` — the rho roles in the denominator are swapped
relative to the textbook ADMM x-update that the numerator implies (and
relative to the first, never-used definition).  SubNet is trained through
this update, so its rho schedule compensates; reproducing the first
definition instead changes outputs by several percent per iteration.

The non-PnP z-update is an l1 soft-threshold with a learnable ``lam``
(the reference references an undefined ``lam`` at this call site —
``models/Unrolled_ADMM.py:208`` — which would NameError; fixed here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets import ResUNet, SubNet, XDenseUNet
from galaxy_deconv_tpu.ops import fourier


def v_update_poisson(v_tilde, y, rho2, alpha):
    """The reference's Poisson v-update (models/Unrolled_ADMM.py:104-110,
    models/ADMMNet.py:22-28), kept verbatim for transplant parity.

    NOTE this is NOT the prox of the Poisson NLL: the quadratic root is
    taken with the wrong sign (see :func:`v_update_poisson_exact`), so for
    unit-scale ``v_tilde`` and raw-ADU ``y`` it returns v ~ alpha/rho2 —
    a constant plane that rides on the loop variable.  The *trained*
    two-dual ADMM absorbs this (SubNet + end-to-end denoiser training),
    but fixed-rho frozen-denoiser ADMMNet cannot, which is why the
    reference never evaluates its own ADMMNet (test.py:220 comments it
    out; the paper figure uses hard-coded literature numbers,
    figures/error_snr.ipynb `admmnet_errs`)."""
    t1 = rho2 * v_tilde - alpha
    return 0.5 * (1.0 / rho2) * (-t1 + jnp.sqrt(t1**2 + 4.0 * y * rho2))


def v_update_poisson_exact(v_tilde, y, rho2, alpha):
    """Exact prox of the Poisson NLL ``alpha*v - y*log(alpha*v)``:
    positive root of ``rho2*v^2 + (alpha - rho2*v_tilde)*v - y = 0``
    (stationarity ``rho2*(v - v_tilde) + alpha - y/v = 0``).  For large
    alpha this gives v ~ y/alpha — the unit scale the rest of the ADMM
    loop lives on.

    Numerically stable form: for t1 < 0 (the typical regime — alpha
    dominates rho2*v_tilde) the direct root ``t1 + sqrt(t1^2 + 4 y rho2)``
    subtracts nearly-equal fp32 quantities on background pixels (small y),
    losing relative precision on the ~y/alpha result; the conjugate form
    ``2 y / (sqrt(t1^2 + 4 y rho2) - t1)`` avoids the cancellation there,
    while the direct form is the stable one for t1 > 0."""
    t1 = rho2 * v_tilde - alpha
    disc = jnp.sqrt(t1**2 + 4.0 * y * rho2)
    return jnp.where(
        t1 > 0,
        0.5 * (1.0 / rho2) * (t1 + disc),
        2.0 * y / jnp.maximum(disc - t1, 1e-30),
    )

def v_update_gaussian(v_tilde, y, rho2):
    return (rho2 * v_tilde + y) / (1.0 + rho2)


def soft_threshold(z_tilde, lam, rho1):
    return jnp.sign(z_tilde) * jnp.maximum(0.0, jnp.abs(z_tilde) - lam / rho1)


class UnrolledADMM(nn.Module):
    n_iters: int = 8
    llh: str = "Poisson"  # 'Poisson' | 'Gaussian'
    denoiser: str = "ResUNet"  # 'ResUNet' | 'XDenseUNet'
    pnp: bool = True
    subnet: bool = True
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = obs.shape[0]
        shape = obs.shape[-2:]
        alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)[:, None, None]
        y = jnp.maximum(obs, 0.0)

        H = fourier.psf_to_otf(psf)
        Ht, HtH = jnp.conj(H), jnp.abs(H) ** 2

        if self.subnet:
            rho_all = SubNet(n_outputs=2 * self.n_iters, dtype=self.dtype)(psf, alpha, train=train)
            rho1_iters, rho2_iters = rho_all[:, : self.n_iters], rho_all[:, self.n_iters :]
        else:
            rho1_iters = jnp.broadcast_to(self.param("rho1_iters", nn.initializers.ones, (self.n_iters,))[None], (B, self.n_iters))
            rho2_iters = jnp.broadcast_to(self.param("rho2_iters", nn.initializers.ones, (self.n_iters,))[None], (B, self.n_iters))

        if self.pnp:
            net = ResUNet(features=self.features, dtype=self.dtype) if self.denoiser == "ResUNet" else XDenseUNet(dtype=self.dtype)
            denoise = lambda z, r1: (net(z[..., None], train=train)[..., 0] if isinstance(net, XDenseUNet) else net(z[..., None])[..., 0])
            lam = None
        else:
            lam_raw = self.param("lam_raw", nn.initializers.zeros, ())
            lam = nn.softplus(lam_raw)
            denoise = lambda z, r1: soft_threshold(z, lam, r1)

        # Wiener init on y/alpha, clipped to [0, 1] (reference init_l2, :170-175).
        x = fourier.irfft2(Ht * fourier.rfft2(y / alpha) / (HtH + 1.0 / alpha), shape)
        x = jnp.clip(x, 0.0, 1.0)
        z = x
        v = y
        u1 = jnp.zeros_like(x)
        u2 = jnp.zeros_like(y)

        for i in range(self.n_iters):
            rho1 = rho1_iters[:, i][:, None, None]
            rho2 = rho2_iters[:, i][:, None, None]
            Hx = fourier.conv_fft(H, x)
            if self.llh == "Poisson":
                v = v_update_poisson(Hx + u2, y, rho2, alpha)
            else:
                v = v_update_gaussian(Hx + u2, y / alpha, rho2)
            z = denoise(x + u1, rho1)
            rhs = fourier.rfft2(rho1 * (z - u1) + rho2 * fourier.conv_fft(Ht, v - u2))
            # NB: rho1 pairs with |H|^2 here (shadowed X_Update, see module
            # docstring), not the rho2 the numerator would suggest.
            x = fourier.irfft2(rhs / (rho1 * HtH + rho2), shape)
            u1 = u1 + x - z
            u2 = u2 + fourier.conv_fft(H, x) - v

        out = x * alpha if self.llh == "Poisson" else x
        return out.astype(jnp.float32)
