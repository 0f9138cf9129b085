"""Moment-based loss: centroid + 2nd + 3rd order central image moments.

Capability parity: reference ``utils/utils_train.py:185-254`` with
``compute_moments`` from ``utils/fit_ellipse.py:467-548`` — but fully
vectorized over the batch (the reference loops per sample in Python).
Images are min-max normalized per sample before moments are taken.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def normalize_images(batch: jnp.ndarray) -> jnp.ndarray:
    """Per-sample min-max normalization of (B, H, W) to [0, 1]."""
    lo = batch.min(axis=(-2, -1), keepdims=True)
    hi = batch.max(axis=(-2, -1), keepdims=True)
    return (batch - lo) / jnp.maximum(hi - lo, 1e-8)


def compute_moments(images: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Batched raw/central moments up to order 3 of (B, H, W) images.

    Returns a dict of (B,) arrays: m00, cx, cy, mu20, mu11, mu02,
    mu30, mu21, mu12, mu03.  Coordinates: x runs along axis -1 (columns),
    y along axis -2 (rows), matching the reference convention.
    """
    images = normalize_images(images)
    B, H, W = images.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    m00 = images.sum(axis=(-2, -1)) + 1e-8
    cx = (images * xs).sum(axis=(-2, -1)) / m00
    cy = (images * ys).sum(axis=(-2, -1)) / m00

    dx = xs - cx[:, None, None]
    dy = ys - cy[:, None, None]

    def cm(px, py):
        return (images * dx**px * dy**py).sum(axis=(-2, -1)) / m00

    return {
        "m00": m00,
        "cx": cx,
        "cy": cy,
        "mu20": cm(2, 0),
        "mu11": cm(1, 1),
        "mu02": cm(0, 2),
        "mu30": cm(3, 0),
        "mu21": cm(2, 1),
        "mu12": cm(1, 2),
        "mu03": cm(0, 3),
    }


def ellipse_params_from_moments(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, 5) ellipse parameters (cy, cx, theta, a, b) from the
    second-moment tensor eigendecomposition (capability parity:
    reference ``utils/fit_ellipse.py:550-601``, vectorized)."""
    m = compute_moments(images)
    delta = m["mu20"] - m["mu02"]
    theta = 0.5 * jnp.arctan2(2 * m["mu11"], delta + 1e-8)
    trace = m["mu20"] + m["mu02"]
    det = m["mu20"] * m["mu02"] - m["mu11"] ** 2
    disc = jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0) + 1e-8)
    lam1 = jnp.maximum(0.5 * (trace + disc), 1e-6)
    lam2 = jnp.maximum(0.5 * (trace - disc), 1e-6)
    return jnp.stack([m["cy"], m["cx"], theta, jnp.sqrt(lam1), jnp.sqrt(lam2)], axis=-1)


@dataclasses.dataclass(frozen=True)
class MomentBasedLoss:
    centroid_weight: float = 1.0
    central_moments_weight: float = 1.0
    third_order_weight: float = 1.0

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        mo = compute_moments(output)
        mt = compute_moments(target)

        def mse_of(keys):
            return jnp.mean(jnp.stack([(mo[k] - mt[k]) ** 2 for k in keys], axis=-1))

        return (
            self.centroid_weight * mse_of(["cy", "cx"])
            + self.central_moments_weight * mse_of(["mu20", "mu11", "mu02"])
            + self.third_order_weight * mse_of(["mu30", "mu21", "mu12", "mu03"])
        )
