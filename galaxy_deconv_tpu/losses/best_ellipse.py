"""Differentiable best-level ellipse-fit loss.

Capability parity: reference ``utils/utils_train.py:24-129`` with the
machinery of ``utils/fit_ellipse.py`` — fit algebraic ellipses (weighted
conic fit via batched SVD) to soft iso-intensity masks at several
intensity levels, score each level's fit on the ground truth with an
inside/outside contrast metric, pick the best level per sample, then
compare (center, angle-cosine, axes) between output and target
symmetrically.

TPU redesign: the reference loops over levels and batch elements in
Python (one SVD per image); here every (level x sample) fit is a single
batched SVD over a (L*B, N, 6) design tensor, and the per-sample level
selection is a gather — no host control flow, fully jit/grad-compatible.
NaN-protection is ``jnp.where`` masking instead of try/except.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


def min_max_normalize(images: jnp.ndarray) -> jnp.ndarray:
    lo = images.min(axis=(-2, -1), keepdims=True)
    hi = images.max(axis=(-2, -1), keepdims=True)
    ok = hi > lo
    return jnp.where(ok, (images - lo) / (hi - lo + 1e-8), images)


def sigmoid_mask(x: jnp.ndarray, peak_pos: float, sharpness: float = 0.1) -> jnp.ndarray:
    """Gaussian bump selecting pixels near the given normalized intensity."""
    return jnp.exp(-(((x - peak_pos) / sharpness) ** 2))


def _grid_points(H: int, W: int) -> jnp.ndarray:
    """(H*W, 2) grid of (row, col) coordinates, float32."""
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.ravel(), xx.ravel()], axis=-1)


def weighted_ellipse_fit(points: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted algebraic conic fit: smallest right singular vector of the
    weighted design matrix [x^2, xy, y^2, x, y, 1].  points: (..., N, 2),
    weights: (..., N) -> coeffs (..., 6), unit-normalized.

    Coordinate convention (matching the reference): the first point
    component (image row) plays the role of 'x' in the conic.
    """
    x = points[..., 0]
    y = points[..., 1]
    D = jnp.stack([x**2, x * y, y**2, x, y, jnp.ones_like(x)], axis=-1)
    Dw = D * weights[..., None]
    _, _, vt = jnp.linalg.svd(Dw, full_matrices=False)
    coeffs = vt[..., -1, :]
    return coeffs / (jnp.linalg.norm(coeffs, axis=-1, keepdims=True) + 1e-8)


def conic_to_params(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Conic coefficients (..., 6) -> ellipse params (..., 5) = (cx, cy, theta, a, b)."""
    A, B, C, D, E, F = jnp.moveaxis(coeffs, -1, 0)
    den = 4 * A * C - B**2
    cx = (B * E - 2 * C * D) / (den + 1e-8)
    cy = (B * D - 2 * A * E) / (den + 1e-8)
    theta = 0.5 * jnp.arctan2(B, A - C)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    expr = A * cx**2 + C * cy**2 + B * cx * cy + D * cx + E * cy + F
    a2 = -2 * expr / (A * ct**2 + B * ct * st + C * st**2 + 1e-8)
    b2 = -2 * expr / (A * st**2 - B * ct * st + C * ct**2 + 1e-8)
    return jnp.stack([cx, cy, theta, jnp.sqrt(jnp.abs(a2)), jnp.sqrt(jnp.abs(b2))], axis=-1)


def ellipse_params(images: jnp.ndarray, peak_pos: float, sharpness: float = 0.1) -> jnp.ndarray:
    """Fit an ellipse to each (B, H, W) image at one intensity level.

    Returns (B, 5) params with NaN/Inf rows replaced by the default
    (W/2, H/2, 0, 10, 10) — the reference's safe fallback.
    """
    B, H, W = images.shape
    mask = sigmoid_mask(images, peak_pos, sharpness).reshape(B, H * W)
    pts = jnp.broadcast_to(_grid_points(H, W)[None], (B, H * W, 2))
    coeffs = weighted_ellipse_fit(pts, mask)
    params = conic_to_params(coeffs)
    bad = ~jnp.isfinite(params).all(axis=-1, keepdims=True)
    default = jnp.asarray([W / 2.0, H / 2.0, 0.0, 10.0, 10.0], jnp.float32)
    return jnp.where(bad, default[None, :], params)


def ellipse_fit_metric(images: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Normalized [0,1] score of how well an ellipse isolates the flux:
    distance-weighted mean intensity inside vs mean intensity outside.
    images: (B, H, W); params: (B, 5) as (cy, cx, theta, a, b) in the
    reference's row/col convention."""
    B, H, W = images.shape
    cy = params[:, 0][:, None, None]
    cx = params[:, 1][:, None, None]
    theta = params[:, 2][:, None, None]
    a = params[:, 3][:, None, None]
    b = params[:, 4][:, None, None]

    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    xt = xs - cx
    yt = ys - cy
    ct, st = jnp.cos(theta), jnp.sin(theta)
    xr = xt * ct + yt * st
    yr = -xt * st + yt * ct
    ellipse_eq = (xr / (a + 1e-8)) ** 2 + (yr / (b + 1e-8)) ** 2

    inside = (ellipse_eq <= 1.0).astype(images.dtype)
    outside = 1.0 - inside
    dist = jnp.sqrt((xt / (a + 1e-8)) ** 2 + (yt / (b + 1e-8)) ** 2)
    w = jnp.clip(1.0 - 0.5 * dist, 0.5, 1.0)

    eps = 1e-8
    n_in = inside.sum(axis=(-2, -1))
    n_out = outside.sum(axis=(-2, -1))
    mean_in = (images * inside * w).sum(axis=(-2, -1)) / (n_in + eps)
    mean_out = (images * outside).sum(axis=(-2, -1)) / (n_out + eps)
    ratio = mean_in / (mean_out + eps)
    ratio = jnp.where(n_out < eps, 10.0, ratio)
    ratio = jnp.where(n_in < eps, 0.0, ratio)
    return ratio / (1.0 + ratio)


@dataclasses.dataclass(frozen=True)
class BestEllipseLoss:
    ellipse_levels: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7)
    center_weight: float = 1.0
    angle_weight: float = 1.0
    axis_weight: float = 1.0
    sharpness: float = 0.1

    def _params_all_levels(self, images: jnp.ndarray) -> jnp.ndarray:
        levels = jnp.asarray(self.ellipse_levels, jnp.float32)
        fit = lambda pp: ellipse_params(images, pp, self.sharpness)
        return jax.vmap(fit)(levels)  # (L, B, 5)

    def _pairwise(self, out_p: jnp.ndarray, tgt_p: jnp.ndarray) -> jnp.ndarray:
        cx_o, cy_o, th_o, a_o, b_o = jnp.moveaxis(out_p, -1, 0)
        cx_t, cy_t, th_t, a_t, b_t = jnp.moveaxis(tgt_p, -1, 0)
        max_o = jnp.maximum(a_o, b_o)
        max_t = jnp.maximum(a_t, b_t)
        scale = jnp.maximum(max_o, max_t) + 1e-8
        center = 0.5 * (((cx_o - cx_t) / scale) ** 2 + ((cy_o - cy_t) / scale) ** 2)
        angle = 1.0 - (jnp.cos(th_o) * jnp.cos(th_t) + jnp.sin(th_o) * jnp.sin(th_t))
        axis = 0.5 * (((a_o - a_t) / scale) ** 2 + ((b_o - b_t) / scale) ** 2)
        return self.center_weight * center + self.angle_weight * angle + self.axis_weight * axis

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        out_n = min_max_normalize(output)
        tgt_n = min_max_normalize(target)

        tgt_params = self._params_all_levels(tgt_n)  # (L, B, 5)
        scores = jax.vmap(lambda p: ellipse_fit_metric(tgt_n, p))(tgt_params)  # (L, B)
        best = jnp.argmax(scores, axis=0)  # (B,)

        out_params = self._params_all_levels(out_n)  # (L, B, 5)
        B = output.shape[0]
        take = lambda arr: arr[best, jnp.arange(B)]  # (B, 5)
        return jnp.mean(self._pairwise(take(out_params), take(tgt_params)))
