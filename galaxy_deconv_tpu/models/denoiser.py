"""Standalone denoiser model (reference ``train.py:46-47``: --model ResUNet).

Trains/evaluates the ResUNet on the denoising task (obs = gt + noise, no
PSF) under the same ``(obs, psf, alpha) -> rec`` contract — the psf input
is ignored.  The resulting weights are the "separately trained denoiser"
that :class:`ADMMNet` plugs in frozen.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from galaxy_deconv_tpu.nets import ResUNet


class ResUNetDenoiser(nn.Module):
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, psf: jnp.ndarray = None, alpha: jnp.ndarray = None, train: bool = False) -> jnp.ndarray:
        del psf, alpha, train
        return ResUNet(features=self.features, dtype=self.dtype)(obs[..., None])[..., 0]
