"""Reusable conv blocks.

Equivalents of the reference's block factory (``models/resnet_basicblock.py``)
expressed as first-class flax modules instead of a mode-string DSL: the DSL's
only uses in the model zoo are 'C', 'CRC' residual blocks, '2' stride-2
up/down convs, and the BN+ReLU double conv — so those are what we provide,
with static shapes and NHWC layout for the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ResBlock(nn.Module):
    """x + Conv3x3 -> ReLU -> Conv3x3 (no bias), same width in/out.

    Parity: reference ``models/resnet_basicblock.py:59-71`` with mode 'CRC',
    bias=False (the configuration used by ResUNet).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        r = nn.relu(r)
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(r)
        return x + r


class DownConv(nn.Module):
    """Stride-2 2x2 conv downsample (reference ``downsample_strideconv``, mode '2')."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False, dtype=self.dtype)(x)


class UpConvTranspose(nn.Module):
    """Stride-2 2x2 transposed-conv upsample (reference ``upsample_convtranspose``, mode '2')."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False, dtype=self.dtype
        )(x)


class DoubleConv(nn.Module):
    """(Conv3x3 -> BatchNorm -> ReLU) x2.

    Parity: the ``DoubleConv`` used inside SubNet
    (reference ``models/unrolled_admm_gaussian.py:11-27``).
    """

    features: int
    mid_features: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_features or self.features
        x = nn.Conv(mid, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, no bias (reference ``models/XDenseUNet.py:5-16``)."""

    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
