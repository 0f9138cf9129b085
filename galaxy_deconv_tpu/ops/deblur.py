"""Classical-deblurring utility kernels (L0).

TPU-first coverage of the reference's legacy NumPy toolbox
(reference ``utils/utils_deblur.py``): synthetic blur kernels
(``gauss_kernel``/``disk``), the L1 soft-threshold prox (``shrinkage``),
periodic forward-difference TV gradients (``D``), the gradient-selection
mask (``Mask``), blind kernel estimation from a sharp/blurred pair
(``k_ifft``), and Bayer mosaic helpers (``rgb_to_bayer``/``rggb_to_rgb``).

Everything is pure jnp on static shapes (jit/vmap-safe, runs on TPU or
CPU alike).  The reference versions carry several quirks that are
deliberately *not* reproduced — each is documented on the function it
concerns:

* ``gauss_kernel``/``disk`` build their grid with
  ``linspace(-(size-1)/2, size/2, size)`` (utils_deblur.py:32,40), an
  asymmetric, off-center grid (and ``disk`` omits the point count, so it
  always gets linspace's default 50 samples regardless of ``size``).
  Here the grid is the symmetric pixel-center grid ``arange(size)-(size-1)/2``.
* ``Mask`` calls ``np.max(arr, 0)`` (utils_deblur.py:68-70) which is an
  *axis-0 reduction*, not the intended elementwise ``maximum`` — the
  rectifier the surrounding math calls for.  Here it is ``jnp.maximum``.
* ``k_ifft`` calls ``crop(k0, M, N)`` against a ``crop`` whose two-arg
  form was commented out (utils_deblur.py:21-29), so it crashes as
  shipped.  ``estimate_kernel`` is the working capability.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "gauss_kernel",
    "disk",
    "shrinkage",
    "tv_grad",
    "tv_grad_adjoint",
    "gradient_mask",
    "estimate_kernel",
    "rgb_to_bayer",
    "rggb_to_rgb",
]


def _pixel_grid(size: int):
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    return jnp.meshgrid(ax, ax)


def gauss_kernel(size: int, sigma: float) -> jnp.ndarray:
    """Normalized isotropic Gaussian blur kernel on a ``size``x``size`` grid
    (reference utils_deblur.py:31-38; symmetric-grid fix documented above)."""
    xx, yy = _pixel_grid(size)
    k = jnp.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return k / k.sum()


def disk(size: int, r: float) -> jnp.ndarray:
    """Normalized circular (defocus) kernel of radius ``r`` pixels
    (reference utils_deblur.py:40-45; grid fixes documented above).

    A radius smaller than the nearest grid point would select zero pixels
    (0/0 -> all-NaN); that degenerate case falls back to the nearest-
    to-center pixel, i.e. an (even-size: off-center) delta kernel."""
    xx, yy = _pixel_grid(size)
    r2 = xx**2 + yy**2
    k = (r2 < r**2).astype(jnp.float32)
    delta = (r2 == r2.min()).astype(jnp.float32)
    k = jnp.where(k.sum() > 0, k, delta)
    return k / k.sum()


def shrinkage(z: jnp.ndarray, beta) -> jnp.ndarray:
    """L1 soft-threshold prox: sign(z) * max(|z| - beta, 0)
    (reference utils_deblur.py:15-18, written there as the equivalent
    clip(z-beta, 0, inf) + clip(z+beta, -inf, 0))."""
    return jnp.clip(z - beta, 0.0, None) + jnp.clip(z + beta, None, 0.0)


def tv_grad(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Periodic forward differences (du/dx, du/dy) on the last two axes
    (reference ``D``, utils_deblur.py:49-61: diff with circular wrap in
    the final row/column)."""
    dux = jnp.roll(u, -1, axis=-1) - u
    duy = jnp.roll(u, -1, axis=-2) - u
    return dux, duy


def tv_grad_adjoint(dux: jnp.ndarray, duy: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`tv_grad` (negative periodic divergence): the
    reference never wrote it down (its TV solves go through FFTs instead)
    but any gradient-domain prox needs it; satisfies <D u, p> = <u, D* p>."""
    ddx = jnp.roll(dux, 1, axis=-1) - dux
    ddy = jnp.roll(duy, 1, axis=-2) - duy
    return ddx + ddy


def _box_blur5(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 mean filter with zero padding = the reference's
    ``convolve2d(x, ones(5,5)/25, mode='same')`` (utils_deblur.py:64-67)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(2, 2), (2, 2)]
    xp = jnp.pad(x, pad)
    c = jnp.cumsum(jnp.cumsum(xp, axis=-1), axis=-2)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    H, W = x.shape[-2], x.shape[-1]
    win = (
        c[..., 5:, 5:][..., :H, :W]
        - c[..., 5:, :-5][..., :H, :W]
        - c[..., :-5, 5:][..., :H, :W]
        + c[..., :-5, :-5][..., :H, :W]
    )
    return win / 25.0


def gradient_mask(dx: jnp.ndarray, dy: jnp.ndarray, tau_s: float = 0.1, tau_r: float = 0.1):
    """Select salient, locally-coherent gradients for kernel estimation
    (reference ``Mask``, utils_deblur.py:63-72): R = |box(Dx), box(Dy)| /
    (box(|D|) + 0.5) measures local gradient coherence; gradients are kept
    in proportion to max(max(R - tau_r, 0)·|D| - tau_s, 0).  The
    reference's ``np.max(·, 0)`` axis-reduction quirk is fixed to the
    elementwise rectifier (see module docstring)."""
    dmag = jnp.sqrt(dx**2 + dy**2)
    a, b, c = _box_blur5(dx), _box_blur5(dy), _box_blur5(dmag)
    coherence = jnp.sqrt(a**2 + b**2) / (c + 0.5)
    m = jnp.maximum(coherence - tau_r, 0.0)
    w = jnp.maximum(m * dmag - tau_s, 0.0)
    return dx * w, dy * w, m


def estimate_kernel(
    x_sharp: jnp.ndarray,
    y_blur: jnp.ndarray,
    lambda_l2: float = 1e-2,
    ksize: int = 25,
) -> jnp.ndarray:
    """Estimate the blur kernel relating a sharp/blurred image pair by the
    gradient-domain regularized Wiener solve
    ``argmin_k ||D(x) * k - D(y)||^2 + lambda_l2 ||k||^2``
    (reference ``k_ifft``, utils_deblur.py:74-91 — broken as shipped, see
    module docstring), then center-crop to ``ksize``, rectify, normalize."""
    dx1, dx2 = tv_grad(x_sharp)
    dx1, dx2, _ = gradient_mask(dx1, dx2)
    dy1, dy2 = tv_grad(y_blur)
    dy1, dy2, _ = gradient_mask(dy1, dy2)

    Fx1, Fx2 = jnp.fft.fft2(dx1), jnp.fft.fft2(dx2)
    num = jnp.conj(Fx1) * jnp.fft.fft2(dy1) + jnp.conj(Fx2) * jnp.fft.fft2(dy2)
    den = jnp.abs(Fx1) ** 2 + jnp.abs(Fx2) ** 2 + lambda_l2
    k = jnp.real(jnp.fft.ifftshift(jnp.fft.ifft2(num / den), axes=(-2, -1)))

    # ifftshift puts the zero-lag pixel at index (H//2, W//2); crop so it
    # lands at the stamp center (ksize//2, ksize//2) — the naive
    # (H-ksize)//2 start is off by one pixel for odd ksize on even images
    H, W = k.shape[-2], k.shape[-1]
    i1, j1 = H // 2 - ksize // 2, W // 2 - ksize // 2
    k = k[..., i1 : i1 + ksize, j1 : j1 + ksize]
    k = jnp.maximum(k, 0.0)
    return k / jnp.maximum(k.sum(axis=(-2, -1), keepdims=True), 1e-12)


def rgb_to_bayer(x: jnp.ndarray) -> jnp.ndarray:
    """Mosaic an (H, W, 3) RGB image to a (2H, 2W) RGGB Bayer pattern
    (reference utils_deblur.py:94-104)."""
    H, W, _ = x.shape
    out = jnp.zeros((2 * H, 2 * W), dtype=x.dtype)
    out = out.at[0::2, 0::2].set(x[:, :, 0])
    out = out.at[0::2, 1::2].set(x[:, :, 1])
    out = out.at[1::2, 0::2].set(x[:, :, 1])
    out = out.at[1::2, 1::2].set(x[:, :, 2])
    return out


def rggb_to_rgb(planes, switch_rgb: bool = False) -> jnp.ndarray:
    """Demosaic four (H, W) RGGB planes to (H, W, 3), averaging the two
    greens (reference utils_deblur.py:107-117)."""
    rgb = jnp.stack([planes[0], (planes[1] + planes[2]) * 0.5, planes[3]], axis=-1)
    return jnp.flip(rgb, axis=-1) if switch_rgb else rgb
