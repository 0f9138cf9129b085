"""ResUNet denoiser — the PnP-ADMM z-update network.

Capability parity with reference ``models/ResUNet.py``: a 4-scale residual
UNet (head conv; three [2xResBlock + stride-2 down] stages; 2-ResBlock body;
three [transposed-conv up + 2xResBlock] stages with *additive* skips; tail
conv), no normalization layers, all convs bias-free.  Inputs are
replication-padded to a multiple of 8 and cropped back.

TPU notes: NHWC layout, entirely BN-free so the whole network jits to a
single fused XLA computation with no mutable state; safe to ``lax.scan``
inside the unrolled solver and to run in bf16.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets.blocks import DownConv, ResBlock, UpConvTranspose
from galaxy_deconv_tpu.ops.resize import pad_to_multiple_edge


class ResUNet(nn.Module):
    """4-scale residual UNet.

    Args:
      features: channel widths per scale.  The flagship Gaussian ADMM uses
        ``(32, 64, 128, 256)`` (reference ``models/unrolled_admm_gaussian.py:78``);
        the Poisson solver's standalone denoiser uses ``(64, 128, 256, 512)``.
      num_blocks: residual blocks per stage (reference ``nb=2``).
      out_features: output channels.
    """

    features: Sequence[int] = (64, 128, 256, 512)
    num_blocks: int = 2
    out_features: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x, (h, w) = pad_to_multiple_edge(x, multiple=8)
        f = self.features

        def blocks(z, width):
            for _ in range(self.num_blocks):
                z = ResBlock(width, dtype=self.dtype)(z)
            return z

        x1 = nn.Conv(f[0], (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x2 = DownConv(f[1], dtype=self.dtype)(blocks(x1, f[0]))
        x3 = DownConv(f[2], dtype=self.dtype)(blocks(x2, f[1]))
        x4 = DownConv(f[3], dtype=self.dtype)(blocks(x3, f[2]))
        z = blocks(x4, f[3])
        z = blocks(UpConvTranspose(f[2], dtype=self.dtype)(z + x4), f[2])
        z = blocks(UpConvTranspose(f[1], dtype=self.dtype)(z + x3), f[1])
        z = blocks(UpConvTranspose(f[0], dtype=self.dtype)(z + x2), f[0])
        out = nn.Conv(self.out_features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(z + x1)
        return out[..., :h, :w, :]
