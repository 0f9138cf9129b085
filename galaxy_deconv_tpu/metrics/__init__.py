"""Evaluation metrics (L5): PSNR and shear estimation.

Capability parity with reference ``utils/utils_test.py``: ``PSNR`` and an
``estimate_shear`` producing (g1, g2, |g|) per stamp.  The reference calls
the CPU ``fpfs`` package per galaxy (batch size 1); here the estimator is a
batched JAX implementation of the same Fourier-space shapelet measurement
(FPFS; Li et al. 2018/2022), so the whole 10k-galaxy sweep runs as a few
device-side calls.  When the real ``fpfs`` package is installed it can be
used as a CPU cross-check via ``estimate_shear_fpfs_reference``.
"""

from galaxy_deconv_tpu.metrics.adaptive_moments import (
    adaptive_moments,
    estimate_shear_adaptive,
    estimate_shear_ngmix_reference,
)
from galaxy_deconv_tpu.metrics.fpfs_numpy import estimate_shear_numpy
from galaxy_deconv_tpu.metrics.psnr import psnr
from galaxy_deconv_tpu.metrics.shear import (
    delta_psf,
    estimate_shear,
    estimate_shear_fpfs_reference,
    fpfs_moments,
)

__all__ = [
    "adaptive_moments",
    "delta_psf",
    "estimate_shear_adaptive",
    "estimate_shear_ngmix_reference",
    "estimate_shear",
    "estimate_shear_fpfs_reference",
    "estimate_shear_numpy",
    "fpfs_moments",
    "psnr",
]
