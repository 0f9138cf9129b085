"""Shape-constraint loss: MSE + shearlet-projected moment constraints.

Capability parity: reference ``utils/utils_train.py:286-304`` with the
constant machinery of ``utils/cadmos_lib.py`` (the CADMOS galaxy-shape
constraint of Nammour et al. 2022):

    loss = MSE(out, gt)
           + gamma * sum_{i<6, j<S} mu_ij * (L1(out * psu_ij, gt * psu_ij))^2 / 2

where ``psu = Psi^*(U)`` are the six moment-constraint matrices U1..U6
(first/second-order coordinate monomials) convolved with the adjoint
shearlet filter bank, and ``mu`` are per-filter normalization weights.

The constants are precomputed once at construction (as the reference does
at loss init).  The default filter bank is the built-in cone-adapted
Meyer shearlet system (:mod:`galaxy_deconv_tpu.losses.shearlets`) — the
same construction family as the reference's AlphaTransform(alpha=0.5,
real, parseval) bank, with exact tightness and real filters.  When the
optional AlphaTransform package is installed its bank is used instead
(``bank='alpha'`` forces it); ``bank='dog'`` selects the legacy isotropic
difference-of-Gaussians stand-in (kept for comparability with runs that
used it).  Precomputed constants can also be supplied directly
(``psu=``, ``mu=``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def make_u(n: int, m: int) -> np.ndarray:
    """The six moment-constraint matrices U1..U6 (6, n, m).

    U1=i, U2=j, U3=1, U4=i^2+j^2, U5=i^2-j^2, U6=i*j — the generators of
    first- and second-order moments used by the CADMOS shape constraint.
    """
    i = np.arange(n, dtype=np.float64)[:, None] * np.ones((1, m))
    j = np.ones((n, 1)) * np.arange(m, dtype=np.float64)[None, :]
    return np.stack([i, j, np.ones((n, m)), i**2 + j**2, i**2 - j**2, i * j])


def _dog_filter_bank(n: int, m: int, n_scales: int) -> np.ndarray:
    """Isotropic difference-of-Gaussians bank (n_scales+1, n, m) — the
    built-in stand-in for the shearlet adjoint bank."""
    ys = np.arange(n) - n // 2
    xs = np.arange(m) - m // 2
    r2 = ys[:, None] ** 2 + xs[None, :] ** 2

    def gauss(sigma):
        g = np.exp(-r2 / (2 * sigma**2))
        return g / g.sum()

    sigmas = [0.5 * 2**s for s in range(n_scales + 1)]
    bank = [gauss(sigmas[0])]
    for s in range(n_scales):
        bank.append(gauss(sigmas[s + 1]) - gauss(sigmas[s]))
    return np.stack(bank)


def _convolve_same(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'same'-mode linear convolution via zero-padded FFT (numpy, init-time only)."""
    n, m = img.shape
    kn, km = kernel.shape
    N, M = n + kn - 1, m + km - 1
    out = np.fft.irfft2(np.fft.rfft2(img, (N, M)) * np.fft.rfft2(kernel, (N, M)), (N, M))
    top, left = (kn - 1) // 2, (km - 1) // 2
    return out[top : top + n, left : left + m]


def compute_psu_mu(
    fov_pixels: int, n_shearlet: int = 2, bank: "Optional[np.ndarray | str]" = None
) -> tuple[np.ndarray, np.ndarray]:
    """Precompute psu = Psi^*(U) (6, S, H, W) and mu (6, S) weights.

    ``bank``: None/'shearlet' = built-in Meyer shearlet adjoints (default;
    AlphaTransform is used instead when importable), 'alpha' = require
    AlphaTransform, 'dog' = legacy isotropic stand-in, or an explicit
    (S, H, W) filter array.
    """
    U = make_u(fov_pixels, fov_pixels)
    if bank is None or isinstance(bank, str):
        kind = bank or "shearlet"
        adj = None
        if kind in ("shearlet", "alpha"):
            try:  # optional dependency, as in the reference
                from AlphaTransform import AlphaShearletTransform as AST  # type: ignore

                trafo = AST(fov_pixels, fov_pixels, [0.5] * n_shearlet, real=True, parseval=True, verbose=False)
                adj = np.array(
                    [_adjoint_filter(trafo, s, fov_pixels) for s in range(len(trafo.indices))]
                )
            except ImportError:
                if kind == "alpha":
                    raise
        if adj is None:
            if kind == "dog":
                adj = _dog_filter_bank(fov_pixels, fov_pixels, n_shearlet)
            else:
                from galaxy_deconv_tpu.losses.shearlets import shearlet_spatial_filters

                adj = shearlet_spatial_filters(fov_pixels, fov_pixels, n_shearlet)
    else:
        adj = bank
    adj = np.stack([f / (np.linalg.norm(f) + 1e-12) for f in adj])
    psu = np.stack([np.stack([_convolve_same(u, f) for f in adj]) for u in U])  # (6, S, H, W)

    n = psu.shape[-1]
    norms = np.linalg.norm(psu.reshape(*psu.shape[:2], -1), axis=-1)
    mu = np.where(np.isclose(norms, 0.0), 0.0, n / np.maximum(norms, 1e-12) ** 2)
    mu = n * mu / mu.size
    return psu.astype(np.float32), mu.astype(np.float32)


def _adjoint_filter(trafo, scale: int, fov: int) -> np.ndarray:
    coeff = np.zeros((len(trafo.indices), fov, fov))
    coeff[scale, fov // 2, fov // 2] = 1.0
    return np.real(trafo.adjoint_transform(coeff, do_norm=False))


class ShapeConstraint:
    """MSE + gamma * weighted squared-L1 moment constraints."""

    def __init__(
        self,
        fov_pixels: int = 48,
        gamma: float = 1.0,
        n_shearlet: int = 2,
        psu: Optional[np.ndarray] = None,
        mu: Optional[np.ndarray] = None,
        bank: "Optional[np.ndarray | str]" = None,
    ):
        if psu is None or mu is None:
            psu, mu = compute_psu_mu(fov_pixels, n_shearlet, bank=bank)
        self.gamma = gamma
        self.psu = jnp.asarray(psu)  # (6, S, H, W)
        self.mu = jnp.asarray(mu)  # (6, S)

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = jnp.mean((output - target) ** 2)
        # (B, 6, S, H, W) products; L1 over batch+pixels per constraint, then
        # squared, mu-weighted, halved — vectorized over all 6*S constraints.
        diff = output[:, None, None] * self.psu[None] - target[:, None, None] * self.psu[None]
        l1 = jnp.mean(jnp.abs(diff), axis=(0, -2, -1))  # (6, S)
        return loss + self.gamma * jnp.sum(self.mu * l1**2) / 2.0
