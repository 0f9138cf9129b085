"""Resampling and padding primitives.

Capability parity with reference ``utils/utils_data.py:26-40`` (average
downsampling used throughout the simulation pipeline) and the replication
padding inside ResUNet (reference ``models/ResUNet.py:27-30``), expressed as
reshape/mean and ``jnp.pad(mode='edge')`` so XLA lowers them to cheap
layout/reduce ops instead of explicit convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp


def average_downsample(x: jnp.ndarray, rate: int = 4) -> jnp.ndarray:
    """Average-pool the trailing two axes by ``rate`` (non-overlapping).

    Equivalent to convolving with a ``rate x rate`` box filter of weight
    ``1/rate**2`` and stride ``rate``.
    """
    H, W = x.shape[-2], x.shape[-1]
    if H % rate or W % rate:
        raise ValueError(f"image size ({H},{W}) not divisible by rate {rate}")
    lead = x.shape[:-2]
    x = x.reshape(*lead, H // rate, rate, W // rate, rate)
    return x.mean(axis=(-3, -1))


def pad_to_multiple_edge(x: jnp.ndarray, multiple: int = 8) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Replication-pad bottom/right of (..., H, W, C) so H, W are multiples.

    Returns the padded array and the original (H, W) for cropping back.
    NHWC layout (channels last) — the TPU-native convolution layout.
    """
    H, W = x.shape[-3], x.shape[-2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph == 0 and pw == 0:
        return x, (H, W)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad, mode="edge"), (H, W)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample of (..., H, W, C) by an integer factor."""
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    x = x.reshape(*lead, H, 1, W, 1, C)
    x = jnp.broadcast_to(x, (*lead, H, factor, W, factor, C))
    return x.reshape(*lead, H * factor, W * factor, C)
