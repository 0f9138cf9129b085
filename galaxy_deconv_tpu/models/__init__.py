"""Solver zoo (L1): deconvolution models with a uniform contract.

Every solver is a flax module (parameter-free ones simply have empty params)
with the call contract

    ``rec = model.apply(variables, obs, psf, alpha, train=False)``

where ``obs`` and ``psf`` are ``(B, H, W)`` float32 stamps, ``alpha`` is the
per-sample photon level broadcastable to ``(B,)``, and ``rec`` is
``(B, H, W)`` — the batched TPU-native version of the reference's
``model(obs, psf, alpha)`` contract (reference ``train.py:86``,
``tutorials/deconv.ipynb``).

Zoo: UnrolledADMMGaussian (flagship), UnrolledADMM (Poisson/Gaussian
two-dual), ADMMNet (fixed rho, frozen denoiser), Tikhonet, RichardsonLucy,
Wiener, NoDeconv.
"""

from galaxy_deconv_tpu.models.admmnet import ADMMNet
from galaxy_deconv_tpu.models.denoiser import ResUNetDenoiser
from galaxy_deconv_tpu.models.richardson_lucy import RichardsonLucy
from galaxy_deconv_tpu.models.simple import NoDeconv, Wiener
from galaxy_deconv_tpu.models.tikhonet import Tikhonet
from galaxy_deconv_tpu.models.unrolled_admm import UnrolledADMM
from galaxy_deconv_tpu.models.unrolled_admm_gaussian import UnrolledADMMGaussian
from galaxy_deconv_tpu.models.registry import MODEL_REGISTRY, build_model

__all__ = [
    "ADMMNet",
    "MODEL_REGISTRY",
    "NoDeconv",
    "ResUNetDenoiser",
    "RichardsonLucy",
    "Tikhonet",
    "UnrolledADMM",
    "UnrolledADMMGaussian",
    "Wiener",
    "build_model",
]
