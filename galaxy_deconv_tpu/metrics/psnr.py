"""PSNR metric (capability parity: reference ``utils/utils_test.py:7-25``)."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """Batched PSNR over (..., H, W) image pairs; reduces over the last two axes.

    ``normalize=True`` min-max rescales both images first (keeping the
    reference's convention of using img1's min in img2's denominator is a
    known reference bug — ``utils/utils_test.py:17`` — we normalize each
    image by its own range).
    """
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if normalize:
        img1 = (img1 - img1.min(axis=(-2, -1), keepdims=True)) / (
            img1.max(axis=(-2, -1), keepdims=True) - img1.min(axis=(-2, -1), keepdims=True)
        )
        img2 = (img2 - img2.min(axis=(-2, -1), keepdims=True)) / (
            img2.max(axis=(-2, -1), keepdims=True) - img2.min(axis=(-2, -1), keepdims=True)
        )
        pixel_max = 1.0
    else:
        pixel_max = jnp.maximum(
            img1.max(axis=(-2, -1)), img2.max(axis=(-2, -1))
        )
    mse = jnp.mean((img1 - img2) ** 2, axis=(-2, -1))
    return 20.0 * jnp.log10(pixel_max / jnp.sqrt(mse))
