"""Fourier-optics kernel layer (L0).

TPU-first rewrites of the reference ops layer (reference:
``utils/utils_torch.py``, ``utils/utils_deblur.py``): real-input FFTs
(rfft2/irfft2) instead of complex fftn, pure functions vmappable over the
galaxy-stamp batch, and static shapes so XLA can fuse the surrounding
pointwise complex algebra into the FFT call sites.
"""

from galaxy_deconv_tpu.ops.fourier import (
    conv_fft,
    conv_fft_full,
    conv_fft_symm,
    crop_half,
    fftshift2,
    ifftshift2,
    laplacian_kernel,
    otf_from_centered_psf,
    pad_double,
    pad_to_size_centered,
    psf_to_otf,
    rfft2,
    irfft2,
)
from galaxy_deconv_tpu.ops.deblur import (
    disk,
    estimate_kernel,
    gauss_kernel,
    gradient_mask,
    rgb_to_bayer,
    rggb_to_rgb,
    shrinkage,
    tv_grad,
    tv_grad_adjoint,
)
from galaxy_deconv_tpu.ops.resize import (
    average_downsample,
    pad_to_multiple_edge,
    upsample_nearest,
)

__all__ = [
    "conv_fft",
    "conv_fft_full",
    "conv_fft_symm",
    "crop_half",
    "fftshift2",
    "ifftshift2",
    "laplacian_kernel",
    "otf_from_centered_psf",
    "pad_double",
    "pad_to_size_centered",
    "psf_to_otf",
    "rfft2",
    "irfft2",
    "average_downsample",
    "pad_to_multiple_edge",
    "upsample_nearest",
    "disk",
    "estimate_kernel",
    "gauss_kernel",
    "gradient_mask",
    "rgb_to_bayer",
    "rggb_to_rgb",
    "shrinkage",
    "tv_grad",
    "tv_grad_adjoint",
]
