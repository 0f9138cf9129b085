"""Unrolled Plug-and-Play ADMM with Gaussian likelihood — the flagship solver.

Capability parity: reference ``models/unrolled_admm_gaussian.py`` (the model
``train.py:41`` instantiates for every ``--model Unrolled_ADMM`` run).
Structure per forward pass on (B, 48, 48) stamps:

1. spectra:  Y = F(pad2(y)), H = F(pad2(psf)) at 2Hx2W (linear-conv padding),
2. schedule: per-iteration penalty rho from SubNet(psf, alpha)
             (or a learnable per-iteration vector when ``subnet=False``),
3. init:     Wiener solve z0 = crop(F^-1(Ht Y / (|H|^2 + 1/alpha))),
4. n_iters unrolled iterations of
       x = crop(F^-1((Ht Y + F(pad2(rho z - u))) / (rho + |H|^2)))   (x-update)
       z = ResUNet(rho x + u)                                         (PnP z-update)
       u = u + rho (x - z)                                            (dual)
5. returns the final z, or the full (x, z, u, rho) iteration traces when
   ``analysis=True`` (reference ``analysis`` flag, used by figures/analysis.ipynb).

TPU design: everything is expressed on the real half-spectrum (rfft2) —
all spectra involved are Hermitian so this is exact and halves the FFT
cost; the iteration is a Python-unrolled static loop (n_iters is 2/4/8) so
XLA schedules the FFTs and the denoiser convolutions of consecutive
iterations together; the denoiser weights are shared across iterations
(plug-and-play), so unrolling adds no parameters.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

import jax

from galaxy_deconv_tpu.nets import ResUNet, SubNet
from galaxy_deconv_tpu.ops import dft, fourier


def _spec_fns(impl: str):
    """Resolve the padded-spectrum transform pair for ``impl``.

    ``"matmul"`` routes the ``pad+shift+rfft2`` / ``irfft2+shift+crop``
    round-trips through dense MXU matmuls with the layout ops folded into
    the DFT matrices (ops/dft.py — measured ~35% of model wall-clock
    reclaimed on v5e); ``"xla"`` is the stock FFT path; ``"auto"`` picks
    matmul on TPU, FFT elsewhere (small-size DFT matmuls are a TPU-shaped
    trade — on CPU the FFT wins).
    """
    if impl == "auto":
        impl = "matmul" if jax.default_backend() == "tpu" else "xla"
    if impl == "matmul":
        return dft.spec_rfft2_padded, dft.spec_irfft2_cropped

    def fwd(x):
        return fourier.rfft2(fourier.ifftshift2(fourier.pad_double(x)))

    def inv(S, shape):
        padded = (2 * shape[0], 2 * shape[1])
        return fourier.crop_half(fourier.fftshift2(fourier.irfft2(S, padded)))

    return fwd, inv


def gaussian_spectra(y: jnp.ndarray, psf: jnp.ndarray, impl: str = "auto"):
    """Padded-domain spectra for the Gaussian ADMM: Y, Ht, |H|^2 at (2H, 2W)."""
    fwd, _ = _spec_fns(impl)
    Y = fwd(y)
    H = fwd(psf)
    return Y, jnp.conj(H), jnp.abs(H) ** 2


def wiener_init(Y: jnp.ndarray, Ht: jnp.ndarray, HtH: jnp.ndarray, alpha: jnp.ndarray, shape,
                impl: str = "auto") -> jnp.ndarray:
    """Wiener-deconvolution initialization on the padded grid, cropped back.

    ``shape`` is the *output* stamp shape (H, W).
    """
    _, inv = _spec_fns(impl)
    return inv(Y * Ht / (HtH + 1.0 / alpha[..., None, None]), shape)


def x_update(Y, Ht, HtH, z, u, rho, shape, impl: str = "auto"):
    """Closed-form Fourier solve of the quadratic x-subproblem.

    ``rho`` is (B, 1, 1) so it broadcasts against both the (B, H, W) image
    grid and the (B, 2H, W+1) half-spectrum grid.  ``shape`` is the output
    stamp shape (H, W).
    """
    fwd, inv = _spec_fns(impl)
    rhs = Ht * Y + fwd(rho * z - u)
    return inv(rhs / (rho + HtH), shape)


class UnrolledADMMGaussian(nn.Module):
    """The flagship 8-iteration unrolled PnP-ADMM (Gaussian likelihood)."""

    n_iters: int = 8
    features: Sequence[int] = (32, 64, 128, 256)
    subnet: bool = True
    analysis: bool = False
    # Optional (lo, hi) log-space bounds on the SubNet rho schedule:
    # rho = lo * (hi/lo)^sigmoid(logit).  The reference-parity default
    # (None -> Softplus + 1e-6) lets online training drive the schedule
    # orders of magnitude non-uniform (measured on the committed
    # checkpoints: median rho per iteration spans ~1e-4..2 — evidence in
    # figures/rho_schedule.json / scripts/rho_trace.py; RESULTS.md "The
    # SubNet rho schedule"), leaving some iterations with a nearly
    # likelihood-only x-update.  Bounding keeps every iteration's penalty
    # in a non-degenerate range.
    rho_bounds: "tuple[float, float] | None" = None
    dtype: Any = jnp.float32
    # Spectral-transform implementation for the padded x-update round-trips:
    # "auto" (matmul-DFT on TPU / stock FFT elsewhere), "matmul", or "xla".
    # See ops/dft.py for the measured rationale.
    fft_impl: str = "auto"

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray, alpha: jnp.ndarray, train: bool = False):
        B = obs.shape[0]
        alpha = jnp.reshape(alpha, (B,)).astype(jnp.float32)
        y = jnp.maximum(obs, 0.0)
        stamp_shape = (y.shape[-2], y.shape[-1])

        Y, Ht, HtH = gaussian_spectra(y, psf, self.fft_impl)

        if self.subnet and self.rho_bounds is not None:
            lo, hi = self.rho_bounds
            logits = SubNet(n_outputs=self.n_iters, raw=True, dtype=self.dtype)(psf, alpha, train=train)
            rho_iters = lo * (hi / lo) ** nn.sigmoid(logits)  # (B, n) in [lo, hi]
        elif self.subnet:
            rho_iters = SubNet(n_outputs=self.n_iters, dtype=self.dtype)(psf, alpha, train=train)  # (B, n)
        else:
            rho_vec = self.param("rho_iters", nn.initializers.ones, (self.n_iters,))
            rho_iters = jnp.broadcast_to(rho_vec[None, :], (B, self.n_iters))

        denoiser = ResUNet(features=self.features, dtype=self.dtype)

        z = wiener_init(Y, Ht, HtH, alpha, stamp_shape, self.fft_impl)
        u = jnp.zeros_like(y)

        traces = {"x": [], "z": [], "u": [], "rho": []}
        for i in range(self.n_iters):
            rho = rho_iters[:, i][:, None]  # (B, 1), broadcast over (B, H, W) via [..., None]
            rho_img = rho[..., None]
            x = x_update(Y, Ht, HtH, z, u, rho_img, stamp_shape, self.fft_impl)
            z = denoiser((rho_img * x + u)[..., None])[..., 0]
            u = u + rho_img * (x - z)
            if self.analysis:
                traces["x"].append(x)
                traces["z"].append(z)
                traces["u"].append(u)
                traces["rho"].append(rho_img)

        if self.analysis:
            return {k: jnp.stack(v, axis=1).astype(jnp.float32) for k, v in traces.items()}
        return z.astype(jnp.float32)
