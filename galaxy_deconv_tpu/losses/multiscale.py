"""MultiScale and MSE losses.

MultiScale (the default training loss, reference ``utils/utils_train.py:256-284``):
sum over scales s of w_s * L(avgpool_{2^s}(out), avgpool_{2^s}(gt)) with
w_s = 2^-s, L1 or L2 norm, optional auxiliary loss added per scale.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from galaxy_deconv_tpu.ops.resize import average_downsample


def mse_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((output - target) ** 2)


def l1_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(output - target))


@dataclasses.dataclass(frozen=True)
class MultiScaleLoss:
    """``flux_normalize=True`` divides each sample's residual by its
    ground-truth mean flux, so faint (low-SNR) stamps contribute as much to
    the gradient as bright ones — the plain ADU-scale L1 is dominated by
    high-alpha samples.  Call convention is ``loss(gt, rec)`` (the
    reference's ``loss_fn(gt, rec)``, train.py:87): the first argument is
    the ground truth the normalization derives from."""

    scales: int = 3
    norm: str = "L1"
    aux_loss_fn: Optional[Callable] = None
    aux_weight: float = 0.1
    flux_normalize: bool = False

    def __call__(self, gt: jnp.ndarray, rec: jnp.ndarray) -> jnp.ndarray:
        base = l1_loss if self.norm == "L1" else mse_loss
        if self.flux_normalize:
            # Derive the per-sample scale from the ground truth and cut the
            # gradient through it, so even a caller passing (rec, gt) cannot
            # leak gradient into the normalizer.
            axes = tuple(range(1, gt.ndim))
            scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(gt), axis=axes)) + 1e-3
            shape = (-1,) + (1,) * (gt.ndim - 1)
            w = (1.0 / scale).reshape(shape)
            gt = gt * w
            rec = rec * w
        output, target = gt, rec
        total = 0.0
        for s in range(self.scales):
            rate = 2**s
            o = average_downsample(output, rate) if rate > 1 else output
            t = average_downsample(target, rate) if rate > 1 else target
            term = base(o, t)
            if self.aux_loss_fn is not None:
                term = term + self.aux_weight * self.aux_loss_fn(o, t)
            total = total + term / rate
        return total
