"""Model registry / factory.

Maps the method names used by the evaluation harness and CLI (the same
vocabulary as the reference's ``test.py:209-227`` method matrix) to solver
constructors.  Names with an iteration suffix like ``Richard-Lucy(30)`` or
``Unrolled_ADMM_Gaussian(8)`` are parsed.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import flax.linen as nn

from galaxy_deconv_tpu.models.admmnet import ADMMNet
from galaxy_deconv_tpu.models.denoiser import ResUNetDenoiser
from galaxy_deconv_tpu.models.richardson_lucy import RichardsonLucy
from galaxy_deconv_tpu.models.simple import NoDeconv, Wiener
from galaxy_deconv_tpu.models.tikhonet import Tikhonet
from galaxy_deconv_tpu.models.unrolled_admm import UnrolledADMM
from galaxy_deconv_tpu.models.unrolled_admm_gaussian import UnrolledADMMGaussian

MODEL_REGISTRY: dict[str, Callable[..., nn.Module]] = {
    "No_Deconv": NoDeconv,
    "FPFS": NoDeconv,  # FPFS baseline: shear measured directly on obs with the true PSF
    "Wiener": Wiener,
    "Richard-Lucy": RichardsonLucy,
    "Tikhonet": lambda **kw: Tikhonet(filter=kw.pop("filter", "Identity"), **kw),
    "Tikhonet_Laplacian": lambda **kw: Tikhonet(filter="Laplacian", **kw),
    "ShapeNet": lambda **kw: Tikhonet(filter="Laplacian", **kw),
    "Unrolled_ADMM": UnrolledADMM,
    "Unrolled_ADMM_Gaussian": lambda **kw: UnrolledADMMGaussian(**kw),
    # bounded-rho schedule (every unrolled iteration stays active; see
    # UnrolledADMMGaussian.rho_bounds)
    "Unrolled_ADMM_Gaussian_Bounded": lambda **kw: UnrolledADMMGaussian(
        rho_bounds=kw.pop("rho_bounds", (0.1, 10.0)), **kw
    ),
    "ADMMNet": ADMMNet,
    # scale-matched frozen-denoiser variant (fixes the reference's
    # train/inference input-scale quirk; see models/admmnet.py docstring)
    "ADMMNet_scaled": lambda **kw: ADMMNet(denoiser_scale="adu", **kw),
    # exact Poisson prox (the reference's v-update takes the wrong
    # quadratic root — v_update_poisson docstring); this is the working
    # PnP-with-frozen-denoiser baseline
    "ADMMNet_fixed": lambda **kw: ADMMNet(poisson_prox="exact", **kw),
    "ResUNet": ResUNetDenoiser,
}

_SUFFIX = re.compile(r"^(?P<base>.+)\((?P<n>\d+)\)$")


def build_model(name: str, **kwargs: Any) -> nn.Module:
    """Build a solver by harness name, e.g. ``Unrolled_ADMM_Gaussian(8)``.

    Extra kwargs are forwarded to the module constructor.
    """
    m = _SUFFIX.match(name)
    if m:
        name = m.group("base")
        kwargs.setdefault("n_iters", int(m.group("n")))
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)
