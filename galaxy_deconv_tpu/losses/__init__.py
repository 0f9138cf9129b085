"""Training losses (L4).

All losses are pure callables ``loss(gt, rec) -> scalar`` on ``(B, H, W)``
stamps — the first argument is the ground truth, matching the reference's
``loss_fn(gt, rec)`` call (train.py:87).  Fully batched (the reference's
per-sample Python loops become vmap/vectorized jnp), jit- and
grad-compatible.

- :class:`MultiScaleLoss`   ↔ reference ``utils/utils_train.py:256-284``
- :class:`MomentBasedLoss`  ↔ reference ``utils/utils_train.py:185-254``
- :class:`BestEllipseLoss`  ↔ reference ``utils/utils_train.py:24-129``
- :class:`ShapeConstraint`  ↔ reference ``utils/utils_train.py:286-304``
- :func:`mse_loss`, :func:`get_model_name`
"""

from galaxy_deconv_tpu.losses.multiscale import MultiScaleLoss, mse_loss
from galaxy_deconv_tpu.losses.moments import MomentBasedLoss, compute_moments
from galaxy_deconv_tpu.losses.best_ellipse import BestEllipseLoss
from galaxy_deconv_tpu.losses.shape_constraint import ShapeConstraint
from galaxy_deconv_tpu.losses.naming import get_model_name, build_loss

__all__ = [
    "BestEllipseLoss",
    "MomentBasedLoss",
    "MultiScaleLoss",
    "ShapeConstraint",
    "build_loss",
    "compute_moments",
    "get_model_name",
    "mse_loss",
]
