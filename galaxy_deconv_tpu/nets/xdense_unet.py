"""XDenseUNet denoiser — Tikhonet's post-deconvolution network.

Capability parity with reference ``models/XDenseUNet.py``: a DenseNet-style
UNet on 48x48 stamps.  Dense blocks stack BN -> ReLU -> separable conv
(growth 12) with feature concatenation; downs are BN+ReLU+1x1-conv+maxpool,
ups are 1x1-conv + nearest upsample; skip connections are concatenations.
Channel widths follow the reference exactly (112/220/352 encoder,
296->84, 508->72, 352->60 decoder, 220->1 head).

TPU notes: NHWC concatenation keeps channels in the minor-most axis, which
XLA fuses well; BatchNorm runs with explicit ``batch_stats`` state
(``train=True`` uses batch statistics, eval uses running averages — the
reference's ``model.eval()`` distinction).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets.blocks import SeparableConv
from galaxy_deconv_tpu.ops.resize import upsample_nearest


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int = 12
    skip_connection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = x
        for _ in range(self.num_layers):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
            h = nn.relu(h)
            h = SeparableConv(self.growth_rate, dtype=self.dtype)(h)
            y = jnp.concatenate([h, y], axis=-1)
        if self.skip_connection:
            y = jnp.concatenate([x, y], axis=-1)
        return y


class Down(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype)(x)
        return upsample_nearest(x, 2)


class XDenseUNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        # encoder
        x1 = nn.Conv(32, (3, 3), padding="SAME", use_bias=False, dtype=d)(x)
        x1 = DenseBlock(4, skip_connection=True, dtype=d)(x1, train)          # -> 112 ch, 48x48
        x2 = Down(80, dtype=d)(x1, train)
        x2 = DenseBlock(5, skip_connection=True, dtype=d)(x2, train)          # -> 220 ch, 24x24
        x3 = Down(140, dtype=d)(x2, train)
        x3 = DenseBlock(6, skip_connection=True, dtype=d)(x3, train)          # -> 352 ch, 12x12
        # body
        x4 = Down(212, dtype=d)(x3, train)
        x4 = DenseBlock(7, skip_connection=False, dtype=d)(x4, train)         # -> 296 ch, 6x6
        x4 = Up(84, dtype=d)(x4)                                              # -> 84 ch, 12x12
        # decoder
        x5 = DenseBlock(6, skip_connection=False, dtype=d)(jnp.concatenate([x3, x4], -1), train)  # 436 -> 508
        x5 = Up(72, dtype=d)(x5)                                              # -> 72 ch, 24x24
        x6 = DenseBlock(5, skip_connection=False, dtype=d)(jnp.concatenate([x2, x5], -1), train)  # 292 -> 352
        x6 = Up(60, dtype=d)(x6)                                              # -> 60 ch, 48x48
        y = DenseBlock(4, skip_connection=False, dtype=d)(jnp.concatenate([x1, x6], -1), train)   # 172 -> 220
        return nn.Conv(1, (1, 1), use_bias=True, dtype=d)(y)
