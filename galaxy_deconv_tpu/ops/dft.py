"""Matmul-DFT spectra for the padded-domain ADMM solves — the MXU fast path.

Motivation (measured, figures/op_profile.json): the flagship pipeline's
FFT/pointwise path — ``rfft2(ifftshift2(pad_double(.)))`` forward and
``crop_half(fftshift2(irfft2(.)))`` inverse, 19 transforms of a 96x96
grid per 8-iteration forward — costs ~35% of model wall-clock for 0.6%
of its FLOPs.  XLA's TPU FFT cannot tile a 96-point transform onto the
128x128 MXU, so it runs on the vector unit and round-trips HBM between
the pad/shift/FFT/shift/crop stages.

A 96-point DFT is small enough to do as a *dense matmul* instead, and —
the actual win — the zero-padding, ifftshift, fftshift, and crop that
bracket every transform are all linear maps, so they fuse INTO the DFT
matrix.  With ``pad_double`` placing an H-row image at rows H/2..3H/2 of
a 2H canvas and ``ifftshift`` rolling by -H (even canvas), row r of the
image lands at canvas row (r - H/2) mod 2H; the combined
"embed+shift+DFT" matrix is therefore just 2H x H with entries

    A[f, r] = exp(-2*pi*i * f * (r - H/2) / (2H))

and the inverse "iDFT+shift+crop" matrix is its H x 2H adjoint pattern
(with rfft half-spectrum weights on the last axis).  Each transform
becomes two small dense matmuls on the MXU — half the naive-DFT FLOPs
(the operand is H-wide, not 2H-wide), zero layout ops, fp32 accuracy via
``Precision.HIGHEST``.

Equivalences (exact up to fp32 rounding; tests/test_dft.py):

    spec_rfft2_padded(x)        == rfft2(ifftshift2(pad_double(x)))
    spec_irfft2_cropped(S, hw)  == crop_half(fftshift2(irfft2(S, 2*hw)))

Capability parity: these are drop-in replacements for the spectral
round-trips of the reference's Gaussian-ADMM forward
(``models/unrolled_admm_gaussian.py:85-93,111-115,117-123``); the
reference computes them as literal pad/roll/fftn calls on CUDA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# fp32-accurate MXU passes by default.  GDT_DFT_PRECISION=high selects the
# 3-pass variant: measured only +2% end-to-end (12.00k -> 12.24k gal/s —
# the spectral path is already a small slice post-matmul-DFT) for a ~1e-3
# |g| shift on the fixture stamp, so the fp32-accurate default stands.
_PRECISION = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("GDT_DFT_PRECISION", "highest").lower()]


@functools.lru_cache(maxsize=None)
def _plan(n: int, rfft: bool):
    """Forward-transform matrices for one axis: image length n -> canvas 2n.

    Returns (Ar, Ai): real/imag of A[f, r] = exp(-2i*pi*f*(r - n/2)/(2n)),
    f over the full canvas (2n) or the rfft half (n+1).

    NUMPY on purpose: the cache is shared across jit traces, and a jnp
    array materialized *during* a trace is a trace-local constant
    (DynamicJaxprTracer) — caching one leaks it into the next trace
    (UnexpectedTracerError, observed in the round-5 eval sweep).  numpy
    operands embed as fresh constants per trace.
    """
    canvas = 2 * n
    f = np.arange(n + 1 if rfft else canvas)
    r = np.arange(n)
    ang = -2.0 * np.pi * np.outer(f, (r - n // 2)) / canvas
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _iplan(n: int, rfft: bool):
    """Inverse-transform matrices for one axis: canvas 2n -> image length n.

    Returns (Br, Bi): real/imag of B[r, f] = w_f * exp(2i*pi*f*(r - n/2)/(2n)) / (2n)
    with rfft Hermitian weights w_f (1 at f = 0 and f = n, 2 between) when
    ``rfft``, else w_f = 1 over the full canvas.  numpy for the same
    cross-trace-cache reason as :func:`_plan`.
    """
    canvas = 2 * n
    f = np.arange(n + 1 if rfft else canvas)
    r = np.arange(n)
    ang = 2.0 * np.pi * np.outer(r - n // 2, f) / canvas
    w = np.ones_like(f, np.float64)
    if rfft:
        w[1:n] = 2.0
    scale = w / canvas
    return ((np.cos(ang) * scale).astype(np.float32),
            (np.sin(ang) * scale).astype(np.float32))


def spec_rfft2_padded(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) real -> (..., 2H, W+1) complex half-spectrum.

    Exactly ``rfft2(ifftshift2(pad_double(x)))`` computed as two dense
    MXU matmuls with the pad/shift folded into the DFT matrices.
    """
    h, w = x.shape[-2], x.shape[-1]
    Ahr, Ahi = _plan(h, rfft=False)   # (2H, H)
    Awr, Awi = _plan(w, rfft=True)    # (W+1, W)
    x = x.astype(jnp.float32)
    # rows: U = A_h @ x  (real operand -> 2 matmuls)
    ur = jnp.einsum("fr,...rc->...fc", Ahr, x, precision=_PRECISION)
    ui = jnp.einsum("fr,...rc->...fc", Ahi, x, precision=_PRECISION)
    # cols: S = U @ A_w^T  (complex x complex -> 4 matmuls)
    sr = (jnp.einsum("...fc,gc->...fg", ur, Awr, precision=_PRECISION)
          - jnp.einsum("...fc,gc->...fg", ui, Awi, precision=_PRECISION))
    si = (jnp.einsum("...fc,gc->...fg", ur, Awi, precision=_PRECISION)
          + jnp.einsum("...fc,gc->...fg", ui, Awr, precision=_PRECISION))
    return jax.lax.complex(sr, si)


def spec_irfft2_cropped(S: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """(..., 2H, W+1) complex half-spectrum -> (..., H, W) real.

    Exactly ``crop_half(fftshift2(irfft2(S, (2H, 2W))))`` as dense MXU
    matmuls; ``shape`` is the *output* (H, W).
    """
    h, w = shape
    Bhr, Bhi = _iplan(h, rfft=False)  # (H, 2H)
    Bwr, Bwi = _iplan(w, rfft=True)   # (W, W+1)
    sr, si = jnp.real(S), jnp.imag(S)
    # rows: T = B_h @ S (complex x complex -> 4 matmuls)
    tr = (jnp.einsum("rf,...fg->...rg", Bhr, sr, precision=_PRECISION)
          - jnp.einsum("rf,...fg->...rg", Bhi, si, precision=_PRECISION))
    ti = (jnp.einsum("rf,...fg->...rg", Bhr, si, precision=_PRECISION)
          + jnp.einsum("rf,...fg->...rg", Bhi, sr, precision=_PRECISION))
    # cols with real output: x = Re(T @ B_w^T) -> 2 matmuls
    return (jnp.einsum("...rg,cg->...rc", tr, Bwr, precision=_PRECISION)
            - jnp.einsum("...rg,cg->...rc", ti, Bwi, precision=_PRECISION))
